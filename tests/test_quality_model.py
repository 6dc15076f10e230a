"""Model-based quality scoring (operators/quality_model.py): a
logistic regression trained on labeled good/bad documents separates
held-out examples; save/load round-trips; scoring stays map-only."""

from __future__ import annotations

from pyspark.sql import functions as F

from product_etl_spark.operators import quality_model as QM

GOOD = [
    "The committee published its annual report on the state of the "
    "regional water supply and the measures planned for next year.",
    "Researchers at the institute described a new method for measuring "
    "snow depth from satellite images taken during the winter months.",
    "She walked to the market in the morning and bought fresh bread, "
    "two kinds of cheese, and a small bag of late-season apples.",
    "The library extended its opening hours after a survey showed that "
    "most students preferred to study in the evening.",
]
BAD = [
    "buy now!!! $$$ click click click http://x.example spam spam spam",
    "aaaaaaa bbbbbbb aaaaaaa bbbbbbb aaaaaaa bbbbbbb aaaaaaa bbbbbbb",
    ">>>> ???? !!!! #### >>>> ???? !!!! #### >>>> ???? !!!! ####",
    "w w w w w w w w w w w w w w w w w w w w w w w w w w w w w w",
]


def _labeled(spark):
    rows = [(i, t, 1) for i, t in enumerate(GOOD)] + [
        (100 + i, t, 0) for i, t in enumerate(BAD)
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "label"])


def test_classifier_separates_held_out(spark):
    model = QM.train_quality_classifier(_labeled(spark), "text", "label")
    held_out = spark.createDataFrame(
        [
            (1, "The council voted to repair the old bridge before the "
                "spring floods arrive, citing the engineer's assessment."),
            (2, "zzz zzz zzz !!! zzz zzz zzz !!! zzz zzz zzz !!! zzz zzz"),
        ],
        ["doc_id", "text"],
    )
    scored = {r["doc_id"]: r for r in
              QM.score_quality(model, held_out, "text").collect()}
    assert scored[1]["quality_prob"] > scored[2]["quality_prob"]
    assert scored[1]["quality_pred"] == 1
    assert scored[2]["quality_pred"] == 0
    # original columns preserved, model internals not leaked
    assert set(scored[1].asDict()) == {"doc_id", "text", "quality_prob",
                                       "quality_pred"}


def test_filter_and_model_round_trip(spark, tmp_path):
    labeled = _labeled(spark)
    model = QM.train_quality_classifier(labeled, "text", "label")
    path = str(tmp_path / "quality_model")
    QM.save_model(model, path)
    loaded = QM.load_model(spark, path)

    kept = QM.filter_by_quality(loaded, labeled, "text", min_prob=0.5)
    kept_ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    assert kept_ids == {0, 1, 2, 3}  # training resubstitution: clean split
    assert kept.columns == labeled.columns


def test_scoring_is_map_only(spark):
    model = QM.train_quality_classifier(_labeled(spark), "text", "label")
    docs = spark.range(0, 100).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("plain words repeated "), F.col("id").cast("string"))
        .alias("text"),
    )
    plan = QM.score_quality(model, docs, "text")._jdf.queryExecution() \
             .executedPlan().toString()
    assert "Exchange" not in plan  # featurize + model apply: no shuffle


def test_column_conflict_raises(spark):
    import pytest

    model = QM.train_quality_classifier(_labeled(spark), "text", "label")
    from pyspark.sql import functions as F

    bad = spark.createDataFrame([(1, "some text", 0.5)],
                                ["doc_id", "text", "probability"])
    with pytest.raises(ValueError, match="collide"):
        QM.score_quality(model, bad, "text")


def test_model_scores_after_df_observe_in_same_session(spark, tmp_path):
    """Regression: a freshly-fit PipelineModel used to carry its
    training summary, whose DataFrame pinned session state into the
    transform's task closure — once ANY df.observe had run in the
    session (the observe quality gate), scoring died with
    NotSerializableException: ObservationManager. The trainer now
    returns a save/load round-tripped model (coefficients only), so
    gate-then-train-then-score in one session must work."""
    from pyspark.sql import functions as F

    from product_etl_spark.operators.observed import (
        write_with_quality_gate,
    )

    write_with_quality_gate(
        spark.createDataFrame([(1, "a")], "k int, v string"),
        str(tmp_path / "gated"),
        {"n": (F.count(F.lit(1)), lambda v: v == 1)},
    )
    model = QM.train_quality_classifier(_labeled(spark), "text", "label")
    out = QM.score_quality(
        model,
        spark.createDataFrame([(1, "some plain words here")], ["doc_id", "text"]),
        "text",
    ).collect()
    assert len(out) == 1 and 0.0 <= out[0]["quality_prob"] <= 1.0


def test_tandem_loops_planted(spark):
    """Planted period-2 loops: exact spans/counts, loops at doc start,
    sub-2-period runs excluded, case folding, clean docs zeroed."""
    import pytest

    from product_etl_spark.operators.quality_model import tandem_loops

    rows = [
        # "a b a b a b" -> run of 4 continuing positions, span 6
        (1, "a b a b a b tail words here"),
        # loop at doc start AND a second loop later: "x y x y" (span 4)
        # then "p q p q p q p q" (span 8)
        (2, "x y x y mid p q p q p q p q"),
        # only ONE extra period ("c d c d" needs run>=2: c d c d has
        # run 2 -> span 4 counts; "e f e" run 1 -> excluded)
        (3, "c d c d stop e f e stop2"),
        (4, "all distinct words in this document"),
        # case folding: "A b a B" loops after lower()
        (5, "A b a B a b"),
        (6, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["max_loop_span"], r["n_loops"])
        for r in tandem_loops(df, "text", "doc_id", period=2).collect()
    }
    assert got[1] == (9, 6, 1)
    assert got[2] == (13, 8, 2)
    assert got[3] == (9, 4, 1)
    assert got[4] == (6, 0, 0)
    assert got[5] == (6, 6, 1)
    assert got[6] == (0, 0, 0)
    with pytest.raises(ValueError, match="period >= 1"):
        tandem_loops(df, "text", "doc_id", period=0)


def test_tandem_loops_period_one(spark):
    """period=1 is plain stuttering: 'go go go' spans 3."""
    from product_etl_spark.operators.quality_model import tandem_loops

    df = spark.createDataFrame(
        [(1, "go go go stop"), (2, "no stutter here")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["max_loop_span"], r["n_loops"])
        for r in tandem_loops(df, "text", "doc_id", period=1).collect()
    }
    assert got[1] == (3, 1)
    assert got[2] == (0, 0)
