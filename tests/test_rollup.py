"""Incremental rollup: folding batches one at a time must equal the
direct aggregate over everything, with a drift-free state schema."""

from __future__ import annotations

from pyspark.sql import functions as F

from product_etl_spark.operators.rollup import incremental_rollup
from product_etl_spark.session import load_tables


def _measures():
    return {
        "n": F.lit(1).cast("bigint"),
        "total_value": F.col("value").cast("decimal(18,4)"),
    }


def test_batched_folds_equal_direct_aggregate(spark, sf_dir, tmp_path):
    ev = load_tables(spark, sf_dir, ["events"])["events"].withColumn(
        "day", F.to_date("ts")
    )
    path = str(tmp_path / "rollup_state")
    # three disjoint batches by event_id residue (arbitrary split)
    for r in range(3):
        incremental_rollup(
            spark,
            ev.filter(F.col("event_id") % 3 == r),
            path,
            ["day", "event_type"],
            _measures(),
        )
    state = spark.read.parquet(path)
    direct = ev.groupBy("day", "event_type").agg(
        F.sum(F.lit(1).cast("bigint")).alias("n"),
        F.sum(F.col("value").cast("decimal(18,4)")).alias("total_value"),
    )
    got = {
        (r.day, r.event_type): (r.n, str(r.total_value)) for r in state.collect()
    }
    want = {
        (r.day, r.event_type): (r.n, str(r.total_value)) for r in direct.collect()
    }
    assert got == want


def test_state_schema_stable_across_merges(spark, sf_dir, tmp_path):
    ev = load_tables(spark, sf_dir, ["events"])["events"].withColumn(
        "day", F.to_date("ts")
    )
    path = str(tmp_path / "rollup_schema")
    s1 = incremental_rollup(
        spark, ev.limit(100), path, ["event_type"], _measures()
    ).schema
    s2 = incremental_rollup(
        spark, ev.limit(100), path, ["event_type"], _measures()
    ).schema
    assert s1 == s2  # no decimal widening run-over-run
