"""Bucketed tables for shuffle-free co-located joins.

The reference's answer to repeated point lookups was secondary
indexes (utils/importer/add_inherited_fields.sql:15-16); Spark's
answer at fact-to-fact scale is bucketing: write both tables
bucketed by the join key, and every subsequent join/aggregation on
that key runs with **zero exchange** — the 100 TB version of "don't
shuffle lineitem against orders every query".

Plain parquet files don't carry bucket metadata; bucketed tables
live in the session catalog (``saveAsTable``). Helpers below wrap
that and verify the no-shuffle property (asserted in
tests/test_scale_ops.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 32,
    sort_col: str | None = None,
) -> None:
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.format("parquet").saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key. With equal
    bucket counts Catalyst plans SortMergeJoin with no Exchange on
    either side."""
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)
