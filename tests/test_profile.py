"""profile_columns / snapshot_diff unit tests (cross-engine parity is
q129/q130)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from product_etl_spark.operators.profile import profile_columns, snapshot_diff


def test_profile_counts_nulls_and_distincts(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (2, "b"), (None, "b")],
        "x int, s string",
    )
    got = {r["column"]: r for r in profile_columns(df, ["x", "s"]).collect()}
    assert got["x"]["n_rows"] == 4
    assert got["x"]["n_nulls"] == 1
    assert got["x"]["n_distinct"] == 2
    assert got["x"]["min_str"] == "1" and got["x"]["max_str"] == "2"
    assert got["s"]["n_nulls"] == 1 and got["s"]["n_distinct"] == 2
    with pytest.raises(ValueError, match="at least one"):
        profile_columns(df, [])
    with pytest.raises(ValueError, match="unknown columns"):
        profile_columns(df, ["nope"])
    # two passes (plain stats + distincts), never a scan per column
    plan = profile_columns(df, ["x", "s"])._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Scan ExistingRDD") == 2


def test_snapshot_diff_classifies_and_nulls_differ_from_literal(spark):
    old = spark.createDataFrame(
        [(1, "x", 1.0), (2, None, 2.0), (3, "z", 3.0), (4, "NULL", 4.0)],
        "k int, s string, v double",
    )
    new = spark.createDataFrame(
        [(1, "x", 1.0),      # unchanged -> absent
         (2, "NULL", 2.0),   # NULL -> literal 'NULL' string = CHANGED
         (4, "NULL", 4.5),   # value change
         (5, "new", 5.0)],   # added
        "k int, s string, v double",
    )
    got = {r["k"]: r["change"] for r in snapshot_diff(old, new, ["k"]).collect()}
    assert got == {2: "changed", 3: "removed", 4: "changed", 5: "added"}
    with pytest.raises(ValueError, match="key columns"):
        snapshot_diff(old, new, [])
    with pytest.raises(ValueError, match="no columns"):
        snapshot_diff(old.select("k"), new.select("k"), ["k"])


def test_profile_drift_findings(spark):
    from product_etl_spark.operators.profile import profile_drift

    base_df = spark.createDataFrame(
        [(i, f"v{i}", "seg") for i in range(100)], "k int, s string, seg string"
    )
    # current: s nulled out for 30%, seg collapsed to one value (it
    # already is), k intact; column s2 added, seg removed
    cur_df = spark.createDataFrame(
        [(i, None if i < 30 else f"v{i}", i % 2) for i in range(100)],
        "k int, s string, s2 int",
    )
    b = profile_columns(base_df, ["k", "s", "seg"])
    c = profile_columns(cur_df, ["k", "s", "s2"])
    got = {r["column"]: r["finding"] for r in profile_drift(b, c).collect()}
    assert got == {
        "s": "null_rate_jump",
        "seg": "column_removed",
        "s2": "column_added",
    }
    # distinct collapse: constant-fill bug in k
    bad = spark.createDataFrame([(7, "x") for _ in range(100)], "k int, s string")
    c2 = profile_columns(bad, ["k"])
    got2 = {r["column"]: r["finding"] for r in profile_drift(
        profile_columns(base_df, ["k"]), c2
    ).collect()}
    assert got2 == {"k": "distinct_collapse"}
