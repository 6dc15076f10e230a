"""JDBC round-trip against embedded Derby (the database engine Spark
itself ships for the Hive metastore — org.apache.derby jars are on the
classpath already, so the reference's Postgres interop surface
(S4 partitioned scan / S12 batched insert) is exercised against a real
JDBC database, in-process, no network."""

from __future__ import annotations

import pytest

from product_etl_spark.sources.jdbc import read_jdbc_table, write_jdbc_table

DRIVER = "org.apache.derby.iapi.jdbc.AutoloadedDriver"


def _derby_url(tmp_path):
    return f"jdbc:derby:{tmp_path}/smokedb;create=true"


def test_jdbc_round_trip_partitioned(spark, tmp_path):
    from pyspark.sql import functions as F

    url = _derby_url(tmp_path)
    df = spark.range(100).select(
        F.col("id").cast("long").alias("k"),
        F.concat(F.lit("v"), F.col("id")).alias("v"),
    )
    write_jdbc_table(df, url, "SMOKE", mode="overwrite", batch_size=16, driver=DRIVER)

    # unpartitioned read
    back = read_jdbc_table(spark, url, "SMOKE", driver=DRIVER)
    assert back.count() == 100
    # partitioned read: 4 bounded partitions, same data
    part = read_jdbc_table(
        spark,
        url,
        "SMOKE",
        partition_column="k",
        lower_bound=0,
        upper_bound=100,
        num_partitions=4,
        driver=DRIVER,
    )
    assert part.rdd.getNumPartitions() == 4
    assert sorted(r["k"] for r in part.collect()) == list(range(100))
    vals = {r["k"]: r["v"] for r in part.collect()}
    assert vals[7] == "v7"

    # append mode adds rows (the execute_values bulk-load path)
    write_jdbc_table(df.limit(5), url, "SMOKE", mode="append", driver=DRIVER)
    assert read_jdbc_table(spark, url, "SMOKE", driver=DRIVER).count() == 105
