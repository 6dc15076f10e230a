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
