"""DSIR importance scoring (operators/importance.py), PSI drift
(operators/profile.population_stability_index), privacy audits
(operators/privacy.py), and triangle counting (operators/graph.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from product_etl_spark.operators.graph import triangle_count
from product_etl_spark.operators.importance import (
    bucket_logratio_table,
    importance_scores,
    select_top_fraction,
)
from product_etl_spark.operators.privacy import (
    anonymity_summary,
    k_anonymity_report,
    l_diversity_report,
)
from product_etl_spark.operators.profile import population_stability_index


# ---------------------------------------------------------------- DSIR


def _docs(spark):
    target_like = [
        (i, "the quick brown fox jumps over the lazy dog") for i in range(5)
    ]
    off_domain = [
        (100 + i, "zzz qqq xxx vvv kkk jjj www uuu ppp") for i in range(5)
    ]
    return spark.createDataFrame(
        target_like + off_domain, ["doc_id", "text"]
    )


def test_dsir_target_like_docs_outscore_off_domain(spark):
    corpus = _docs(spark)
    target = corpus.filter(F.col("doc_id") < 5)
    scored = importance_scores(corpus, target, "text", "doc_id")
    rows = {r["doc_id"]: r["score"] for r in scored.collect()}
    assert all(rows[i] > rows[100 + j] for i in range(5) for j in range(5))


def test_dsir_ratio_table_bounded_by_n_buckets(spark):
    corpus = _docs(spark)
    target = corpus.filter(F.col("doc_id") < 5)
    table = bucket_logratio_table(target, corpus, "text", n_buckets=16)
    assert table.count() <= 16
    assert set(table.columns) == {"bucket", "logratio"}


def test_dsir_select_top_fraction_keeps_high_scores(spark):
    corpus = _docs(spark)
    target = corpus.filter(F.col("doc_id") < 5)
    scored = importance_scores(corpus, target, "text", "doc_id")
    # frac=0.3: the 1-frac=0.7 percentile lands inside the target-like
    # score plateau (scores are two-valued here), so exactly the five
    # target-like docs clear the cutoff
    kept = select_top_fraction(scored, 0.3, "doc_id")
    kept_ids = {r["doc_id"] for r in kept.collect()}
    assert kept_ids == {0, 1, 2, 3, 4}


def test_dsir_score_is_length_normalized(spark):
    # doc 2 repeats doc 1's target-like text 3x: same average score
    rows = [(1, "alpha beta gamma"), (2, "alpha beta gamma " * 3)]
    corpus = spark.createDataFrame(rows, ["doc_id", "text"])
    target = corpus.filter(F.col("doc_id") == 1)
    got = {
        r["doc_id"]: r["score"]
        for r in importance_scores(corpus, target, "text", "doc_id").collect()
    }
    assert got[1] == pytest.approx(got[2], abs=1e-4)


# ----------------------------------------------------------------- PSI


def test_psi_identical_distributions_near_zero(spark):
    df = spark.range(1000).select((F.col("id") % 100).alias("v"))
    out = population_stability_index(df, df, "v", n_bins=10)
    total = out.agg(F.sum("psi_term")).collect()[0][0]
    assert abs(total) < 1e-6
    assert out.count() == 10


def test_psi_shifted_distribution_flags(spark):
    base = spark.range(1000).select((F.col("id") % 100).alias("v"))
    shifted = spark.range(1000).select(
        (F.col("id") % 50 + 50).alias("v")  # mass collapses to top half
    )
    total = (
        population_stability_index(base, shifted, "v", 10)
        .agg(F.sum("psi_term"))
        .collect()[0][0]
    )
    assert total > 0.25  # well past the block-the-feed gate


def test_psi_out_of_range_actuals_clamp_to_edge_bins(spark):
    base = spark.range(100).select(F.col("id").alias("v"))  # [0, 99]
    actual = spark.createDataFrame(
        [(-50,), (500,)], ["v"]
    )  # both outside the baseline frame
    out = population_stability_index(base, actual, "v", 10).collect()
    by_bin = {r["bin"]: r["n_actual"] for r in out}
    assert by_bin[0] == 1 and by_bin[9] == 1


# ------------------------------------------------------------- privacy


def _release(spark):
    rows = [
        # (zip, age_band, disease): group A is 3-anonymous and
        # 2-diverse; group B is a singleton; group C has 2 rows but
        # one distinct sensitive value
        ("02139", "30s", "flu"),
        ("02139", "30s", "flu"),
        ("02139", "30s", "cold"),
        ("94105", "40s", "hiv"),
        ("10001", "20s", "flu"),
        ("10001", "20s", "flu"),
    ]
    return spark.createDataFrame(rows, ["zip", "age_band", "disease"])


def test_k_anonymity_report_flags_small_groups(spark):
    df = _release(spark)
    risky = k_anonymity_report(df, ["zip", "age_band"], k=3)
    got = {(r["zip"], r["age_band"]): r["n_rows"] for r in risky.collect()}
    assert got == {("94105", "40s"): 1, ("10001", "20s"): 2}


def test_l_diversity_flags_homogeneous_groups(spark):
    df = _release(spark)
    out = l_diversity_report(df, ["zip", "age_band"], "disease", l=2)
    got = {(r["zip"], r["age_band"]) for r in out.collect()}
    # 02139 has 2 distinct diseases (ok); the others have 1
    assert got == {("94105", "40s"), ("10001", "20s")}


def test_anonymity_summary_gate_numbers(spark):
    df = _release(spark)
    row = anonymity_summary(df, ["zip", "age_band"], k=3).collect()[0]
    assert row["n_groups"] == 3
    assert row["n_risky_groups"] == 2
    assert row["n_risky_rows"] == 3
    assert row["risky_row_pct"] == 50.0


# ----------------------------------------------------------- triangles


def _tri(spark, pairs):
    e = spark.createDataFrame(pairs, ["src", "dst"])
    return triangle_count(e).collect()[0]["n_triangles"]


def test_triangle_count_k4_has_four(spark):
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    assert _tri(spark, k4) == 4


def test_triangle_count_path_has_none(spark):
    assert _tri(spark, [(1, 2), (2, 3), (3, 4)]) == 0


def test_triangle_count_canonicalizes_input(spark):
    # duplicated edges, both directions, self-loops: still one triangle
    messy = [(1, 2), (2, 1), (2, 3), (3, 2), (1, 3), (1, 3), (2, 2)]
    assert _tri(spark, messy) == 1


def test_triangle_count_hub_graph(spark):
    # star (hub 0 with 6 leaves) + one leaf-leaf edge -> exactly 1
    star = [(0, i) for i in range(1, 7)] + [(1, 2)]
    assert _tri(spark, star) == 1


def test_suppress_risky_groups_is_k_anonymous(spark):
    from pyspark.sql import functions as F

    from product_etl_spark.operators.privacy import suppress_risky_groups

    rows = (
        [(i, "US", "AUTO") for i in range(5)]       # big group: kept
        + [(10, "FR", "AUTO"), (11, "FR", "AUTO")]  # size 2 < 3: nulled
        + [(20, "DE", "BIKE")]                      # singleton: nulled
    )
    df = spark.createDataFrame(rows, "ck int, nation string, seg string")
    out = suppress_risky_groups(df, ["nation", "seg"], k=3)
    got = {r["ck"]: (r["nation"], r["seg"], r["suppressed"]) for r in out.collect()}
    assert out.count() == len(rows)  # suppression, not deletion
    for i in range(5):
        assert got[i] == ("US", "AUTO", False)
    for i in (10, 11, 20):
        assert got[i] == (None, None, True)
    # released quasi groups are all >= k (NULL group is its own crowd)
    sizes = (
        out.filter(~F.col("suppressed"))
        .groupBy("nation", "seg")
        .count()
        .collect()
    )
    assert all(r["count"] >= 3 for r in sizes)


def test_suppress_risky_groups_null_quasi_group(spark):
    """NULL quasi values form one group in the count; the join back is
    null-safe, so a small all-NULL group is suppressed like any other
    (a plain equality join would silently keep it)."""
    from product_etl_spark.operators.privacy import suppress_risky_groups

    rows = [(i, "US", "AUTO") for i in range(4)] + [
        (30, None, "AUTO"),  # singleton (NULL, AUTO) group: risky
    ]
    df = spark.createDataFrame(rows, "ck int, nation string, seg string")
    got = {
        r["ck"]: (r["nation"], r["seg"], r["suppressed"])
        for r in suppress_risky_groups(df, ["nation", "seg"], k=3).collect()
    }
    assert got[30] == (None, None, True)
    assert got[0] == ("US", "AUTO", False)


def test_t_closeness_hand_check(spark):
    """Planted release: global sensitive distribution is 50/50 over
    {x, y}. Group 'skew' holds only x -> t = 0.5*(|1-0.5|+|0-0.5|)
    = 0.5; group 'flat' holds one of each -> t = 0. Absent
    (group, value) combos must contribute the full global share."""
    from product_etl_spark.operators.privacy import t_closeness_audit

    df = spark.createDataFrame(
        [
            ("skew", "x"),
            ("skew", "x"),
            ("flat", "x"),
            ("flat", "y"),
            ("skew2", "y"),
            ("skew2", "y"),
        ],
        "grp string, sec string",
    )
    rows = {
        r["grp"]: r
        for r in t_closeness_audit(df, ["grp"], "sec", top_n=10).collect()
    }
    assert rows["skew"]["t"] == 0.5
    assert rows["skew2"]["t"] == 0.5
    assert rows["flat"]["t"] == 0.0
    assert rows["flat"]["n_rows"] == 2
    # worst groups first, ties broken by quasi value ascending
    ordered = t_closeness_audit(df, ["grp"], "sec", top_n=10).collect()
    assert [r["grp"] for r in ordered] == ["skew", "skew2", "flat"]


def test_t_closeness_null_quasi_group(spark):
    """A NULL quasi group (ungeneralized rows) must report its REAL
    distance — null-safe grid join. Here the NULL group's sensitive
    distribution matches the global 50/50 exactly, so its t is 0;
    a null-unsafe join would fabricate t = 0.5."""
    from product_etl_spark.operators.privacy import t_closeness_audit

    df = spark.createDataFrame(
        [
            (None, "x"),
            (None, "y"),
            ("g", "x"),
            ("g", "y"),
        ],
        "grp string, sec string",
    )
    rows = {
        r["grp"]: r
        for r in t_closeness_audit(df, ["grp"], "sec", top_n=10).collect()
    }
    assert rows[None]["t"] == 0.0
    assert rows["g"]["t"] == 0.0
    assert rows[None]["n_rows"] == 2
