"""Deterministic-id tests: uuid5_col must equal Python uuid.uuid5."""

from __future__ import annotations

import uuid

from product_etl_spark import ids


def test_uuid5_matches_python(spark):
    rows = [("963cef",), ("733940343335",), ("品牌:游梨",), ("",)]
    df = spark.createDataFrame(rows, "k string")
    got = df.select(ids.uuid5_col(ids.NS_COLLECTION, "k").alias("u"), "k").collect()
    for r in got:
        assert r["u"] == str(uuid.uuid5(ids.NS_COLLECTION, r["k"]))


def test_uuid5_composite_key_separator(spark):
    # ('a','b') vs ('ab','') must not collide
    df = spark.createDataFrame([("a", "b"), ("ab", "")], "x string, y string")
    got = df.select(ids.uuid5_col(ids.NS_TRANSLATION, "x", "y").alias("u")).collect()
    assert got[0]["u"] != got[1]["u"]


def test_stable_long_positive_and_stable(spark):
    df = spark.createDataFrame([("abc",)], "k string")
    a = df.select(ids.stable_long("k").alias("h")).collect()[0]["h"]
    b = df.select(ids.stable_long("k").alias("h")).collect()[0]["h"]
    assert a == b and a >= 0


def test_natural_keys_exist_in_schemas():
    from product_etl_spark.schemas import NATURAL_KEYS, REGISTRY

    for table, keys in NATURAL_KEYS.items():
        assert table in REGISTRY, table
        cols = {f.name for f in REGISTRY[table].fields}
        for k in keys:
            assert k in cols, f"{table}.{k} missing from schema"


def test_uuid5_null_patterns_do_not_collide(spark):
    """concat_ws drops NULLs; the \x00 sentinel must keep every null
    pattern of a composite key distinct (and match Python uuid5 of the
    sentinel-joined name)."""
    import uuid as _uuid

    from pyspark.sql import functions as F
    from product_etl_spark.ids import NS_PRODUCT, uuid5_col

    df = spark.createDataFrame(
        [("x", None), (None, "x"), ("", "x"), ("x", "")],
        "a string, b string",
    )
    got = [
        r["id"]
        for r in df.select(uuid5_col(NS_PRODUCT, "a", "b").alias("id")).collect()
    ]
    assert len(set(got)) == 4  # all four null/empty patterns distinct
    want = str(_uuid.uuid5(NS_PRODUCT, "x\x1f\x00"))
    assert got[0] == want
    # single-part NULL key -> NULL id
    one = (
        spark.createDataFrame([(None,)], "a string")
        .select(uuid5_col(NS_PRODUCT, "a").alias("id"))
        .collect()[0]["id"]
    )
    assert one is None
