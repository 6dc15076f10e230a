"""SCD Type 2 merge: version history, idempotence, as-of reads."""

from __future__ import annotations

from pyspark.sql import functions as F

from product_etl_spark.operators.scd import scd2_as_of, scd2_init, scd2_merge

KEYS = ["sku"]


def _snap(spark, rows):
    return spark.createDataFrame(rows, "sku string, price double, name string")


def test_scd2_version_lifecycle(spark):
    t1 = scd2_init(_snap(spark, [("a", 10.0, "A"), ("b", 20.0, "B")]), "2026-01-01")

    # day 2: a's price changes, c appears, b unchanged
    t2 = scd2_merge(
        t1,
        _snap(spark, [("a", 12.0, "A"), ("b", 20.0, "B"), ("c", 30.0, "C")]),
        KEYS,
        "2026-01-02",
    )
    rows = {(r["sku"], r["price"], r["is_current"]) for r in t2.collect()}
    assert rows == {
        ("a", 10.0, False),  # closed version
        ("a", 12.0, True),
        ("b", 20.0, True),   # untouched
        ("c", 30.0, True),
    }
    closed_a = t2.filter((F.col("sku") == "a") & ~F.col("is_current")).collect()[0]
    assert str(closed_a["valid_to"]).startswith("2026-01-02")

    # day 3: b disappears from the source -> closed
    t3 = scd2_merge(
        t2, _snap(spark, [("a", 12.0, "A"), ("c", 30.0, "C")]), KEYS, "2026-01-03"
    )
    b_rows = t3.filter(F.col("sku") == "b").collect()
    assert len(b_rows) == 1 and not b_rows[0]["is_current"]
    assert str(b_rows[0]["valid_to"]).startswith("2026-01-03")


def test_scd2_rerun_is_noop(spark):
    t1 = scd2_init(_snap(spark, [("a", 10.0, "A"), ("b", 20.0, "B")]), "2026-01-01")
    snap = _snap(spark, [("a", 12.0, "A"), ("b", 20.0, "B")])
    t2 = scd2_merge(t1, snap, KEYS, "2026-01-02")
    t3 = scd2_merge(t2, snap, KEYS, "2026-01-03")
    a = sorted(map(tuple, t2.collect()))
    b = sorted(map(tuple, t3.collect()))
    assert a == b  # identical snapshot re-applied: byte-identical table


def test_scd2_as_of(spark):
    t = scd2_init(_snap(spark, [("a", 10.0, "A")]), "2026-01-01")
    t = scd2_merge(t, _snap(spark, [("a", 12.0, "A")]), KEYS, "2026-02-01")
    t = scd2_merge(t, _snap(spark, [("a", 15.0, "A")]), KEYS, "2026-03-01")

    assert scd2_as_of(t, "2026-01-15").collect()[0]["price"] == 10.0
    assert scd2_as_of(t, "2026-02-15").collect()[0]["price"] == 12.0
    # boundary: the new version is effective AT its valid_from
    assert scd2_as_of(t, "2026-03-01").collect()[0]["price"] == 15.0
    assert scd2_as_of(t, "2025-12-31").count() == 0
    # history depth: 3 versions of 'a', exactly one open
    assert t.count() == 3
    assert t.filter("is_current").count() == 1


def test_scd2_merge_rejects_malformed_snapshots(spark):
    import pytest as _pytest

    t = scd2_init(_snap(spark, [("a", 10.0, "A")]), "2026-01-01")
    with _pytest.raises(ValueError, match="SCD columns"):
        scd2_merge(t, t, KEYS, "2026-01-02")  # SCD table passed as snapshot
    with _pytest.raises(ValueError, match="missing key"):
        scd2_merge(
            t,
            spark.createDataFrame([(1.0,)], "price double"),
            KEYS,
            "2026-01-02",
        )
