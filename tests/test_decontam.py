"""Benchmark decontamination (operators/decontam.py): planted
contamination is flagged, clean and short documents survive, and the
plan keeps the benchmark side broadcast."""

from __future__ import annotations

from pyspark.sql import functions as F

from product_etl_spark.operators import decontam as DC


def _frames(spark):
    bench = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog tonight"),
            (2, "four score and seven years ago our fathers brought forth"),
        ],
        ["doc_id", "text"],
    )
    docs = spark.createDataFrame(
        [
            # verbatim copy of bench doc 1 -> every gram hits
            (10, "the quick brown fox jumps over the lazy dog tonight"),
            # contains a long bench span inside fresh text -> partial hits
            (11, "intro words then the quick brown fox jumps over the "
                 "lazy dog tonight and an original closing sentence here"),
            # unrelated -> zero hits
            (12, "completely unrelated content about distributed query "
                 "engines and shuffle partitioning strategies at scale"),
            # shorter than n tokens -> no grams, absent from scores
            (13, "too short"),
        ],
        ["doc_id", "text"],
    )
    return bench, docs


def test_contamination_scores_planted(spark):
    bench, docs = _frames(spark)
    grams = DC.benchmark_ngrams(bench, "text", "doc_id", n=5)
    scores = DC.contamination_scores(
        docs, grams, "text", "doc_id", n=5, threshold_pct=10
    ).collect()
    by_id = {r["doc_id"]: r for r in scores}

    assert set(by_id) == {10, 11, 12}  # 13 has < 5 tokens: no grams
    # verbatim copy: all grams hit
    assert by_id[10]["n_hits"] == by_id[10]["n_grams"] > 0
    assert by_id[10]["contaminated"] == 1
    # embedded span: some but not all grams hit, above 10%
    assert 0 < by_id[11]["n_hits"] < by_id[11]["n_grams"]
    assert by_id[11]["contaminated"] == 1
    # unrelated: nothing hits
    assert by_id[12]["n_hits"] == 0
    assert by_id[12]["contaminated"] == 0


def test_decontaminate_drops_flagged_keeps_short(spark):
    bench, docs = _frames(spark)
    kept = DC.decontaminate(docs, bench, "text", "doc_id", n=5)
    kept_ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    # contaminated 10/11 dropped; clean 12 kept; short 13 kept
    # (no grams -> no evidence, the published recipes keep them)
    assert kept_ids == {12, 13}


def test_threshold_boundary_integer_exact(spark):
    bench, docs = _frames(spark)
    grams = DC.benchmark_ngrams(bench, "text", "doc_id", n=5)
    # at 100% threshold only the verbatim copy is contaminated
    strict = DC.contamination_scores(
        docs, grams, "text", "doc_id", n=5, threshold_pct=100
    )
    flagged = {r["doc_id"] for r in
               strict.filter(F.col("contaminated") == 1).collect()}
    assert flagged == {10}


def test_benchmark_probe_broadcast_and_single_corpus_pass(spark):
    bench, docs = _frames(spark)
    grams = DC.benchmark_ngrams(bench, "text", "doc_id", n=5)
    scores = DC.contamination_scores(docs, grams, "text", "doc_id", n=5)
    plan = scores._jdf.queryExecution().executedPlan().toString()
    # benchmark gram set broadcasts; corpus side never shuffles for it
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # both counts come from ONE aggregation over ONE shingle pass:
    # the corpus text column is read by exactly one scan subtree
    assert plan.count("Scan ExistingRDD") <= 2  # bench + docs, once each


def test_fuzzy_contaminated_ids_planted(spark):
    """A train doc sharing most bigrams with a bench doc collides in
    at least one LSH band; an unrelated doc never appears. The bench
    band frame must broadcast (corpus never shuffles on band keys)."""
    from product_etl_spark.operators.decontam import fuzzy_contaminated_ids

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    bench = spark.createDataFrame(
        [(900, base)], "doc_id long, text string"
    )
    train = spark.createDataFrame(
        [
            (1, base + " extra"),            # near-copy of the bench doc
            (2, "one two three four five six seven eight nine ten"),
        ],
        "doc_id long, text string",
    )
    got = fuzzy_contaminated_ids(train, bench, "text", "doc_id")
    rows = {r["doc_id"]: r["n_bench_matches"] for r in got.collect()}
    assert rows.get(1) == 1
    assert 2 not in rows
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_fold_contamination_audit_planted(spark):
    """Planted split: doc 0 (fold 0) and doc 7 (fold 1) share a
    5-gram -> both contaminated, the shared gram counted once per
    fold it appears in; doc 1 (fold 2) is unique text -> fold 2 is
    clean. Folds are the portable md5 hash (precomputed: 0->0, 7->1,
    1->2)."""
    from product_etl_spark.operators.decontam import (
        fold_contamination_audit,
    )

    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon zeta"),
            (7, "alpha beta gamma delta epsilon eta"),
            (1, "one two three four five six seven"),
        ],
        "doc_id long, text string",
    )
    rows = {
        r["fold"]: r
        for r in fold_contamination_audit(
            docs, "text", "doc_id", n_folds=3, n=5
        ).collect()
    }
    assert set(rows) == {0, 1, 2}
    # 'alpha beta gamma delta epsilon' crosses folds 0 and 1
    assert rows[0]["contaminated_docs"] == 1
    assert rows[1]["contaminated_docs"] == 1
    assert rows[0]["shared_grams"] == 1
    assert rows[1]["shared_grams"] == 1
    assert rows[2]["contaminated_docs"] == 0
    assert rows[2]["shared_grams"] == 0
    assert rows[0]["contamination_rate"] == 1.0
    assert rows[2]["contamination_rate"] == 0.0
    assert rows[2]["n_docs"] == 1
