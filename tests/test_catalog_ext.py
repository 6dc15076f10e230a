"""Catalog-adjacent checks that can't be expressed as an exact DuckDB
oracle row (approximate aggregates with error-bound assertions)."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_approx_distinct_error_bound(spark, sf_dir):
    """approx_count_distinct (HyperLogLog++, rsd=0.01) — the 100 TB form
    of q49's exact COUNT(DISTINCT) — must land within 5*rsd of the exact
    per-type count (HLL++ rsd is a standard deviation, not a hard bound;
    5 sigma makes the test deterministic in practice)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    rows = (
        ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("exact"),
            F.approx_count_distinct("user_id", 0.01).alias("approx"),
        )
        .collect()
    )
    assert rows, "events table must have at least one event_type"
    for r in rows:
        assert r["exact"] > 0
        rel_err = abs(r["approx"] - r["exact"]) / r["exact"]
        assert rel_err <= 0.05, (
            f"{r['event_type']}: approx={r['approx']} exact={r['exact']} "
            f"rel_err={rel_err:.4f} > 0.05"
        )
