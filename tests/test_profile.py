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
    # single pass: exactly one aggregate subtree, no join/union of scans
    plan = profile_columns(df, ["x", "s"])._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Scan ExistingRDD") == 1


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
