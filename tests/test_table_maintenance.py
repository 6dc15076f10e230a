"""Small-file compaction and partition retention
(operators/table_maintenance.py)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from product_etl_spark.operators.table_maintenance import (
    compact_partitions,
    expire_partitions,
    partition_file_stats,
)


def _n_parquet(d):
    return len([f for f in os.listdir(d) if f.endswith(".parquet")])


@pytest.fixture()
def fragmented(spark, tmp_path):
    """A dt-partitioned table where each partition was appended in
    many tiny files (the streaming-accretion layout)."""
    path = str(tmp_path / "tbl")
    for batch in range(5):
        df = spark.range(batch * 100, batch * 100 + 100).select(
            F.col("id"),
            (F.col("id") % 3).cast("string").alias("dt"),
        )
        df.repartition(4).write.mode("append").partitionBy("dt").parquet(path)
    return path


def test_stats_listing(fragmented):
    stats = partition_file_stats(fragmented)
    assert [s.rel for s in stats] == ["dt=0", "dt=1", "dt=2"]
    assert all(s.n_files >= 5 for s in stats)
    assert all(s.total_bytes > 0 for s in stats)


def test_compaction_reduces_files_preserves_rows(spark, fragmented):
    before = spark.read.parquet(fragmented)
    rows_before = sorted(r["id"] for r in before.collect())
    done = compact_partitions(spark, fragmented, target_bytes=1 << 30)
    assert len(done) == 3
    for s in partition_file_stats(fragmented):
        assert s.n_files == 1  # everything fits one target-size file
    after = spark.read.parquet(fragmented)
    assert sorted(r["id"] for r in after.collect()) == rows_before
    # second run: nothing left to compact at min_files=2
    assert compact_partitions(spark, fragmented, target_bytes=1 << 30) == []


def test_compaction_skips_untouched_partitions(spark, fragmented):
    # make dt=0 already-compact (single file), leave others fragmented
    compact_partitions(spark, fragmented, target_bytes=1 << 30)
    extra = spark.range(1000, 1100).select(
        F.col("id"), F.lit("1").alias("dt")
    )
    extra.repartition(3).write.mode("append").partitionBy("dt").parquet(
        fragmented
    )
    stats = {s.rel: s for s in partition_file_stats(fragmented)}
    assert stats["dt=0"].n_files == 1 and stats["dt=1"].n_files == 4
    mtime_before = os.path.getmtime(os.path.join(fragmented, "dt=0"))
    done = compact_partitions(spark, fragmented, target_bytes=1 << 30)
    assert [s.rel for s in done] == ["dt=1"]
    assert os.path.getmtime(os.path.join(fragmented, "dt=0")) == mtime_before


def test_expire_partitions_no_data_read(spark, fragmented):
    removed = expire_partitions(fragmented, "dt", keep=lambda v: v >= "1")
    assert removed == ["dt=0"]
    assert not os.path.exists(os.path.join(fragmented, "dt=0"))
    left = spark.read.parquet(fragmented)
    # partition discovery type-infers dt back to int
    assert {
        r["dt"]
        for r in left.select(F.col("dt").cast("string")).distinct().collect()
    } == {"1", "2"}


def test_remote_uri_rejected(spark):
    with pytest.raises(ValueError, match="local"):
        compact_partitions(spark, "s3a://bucket/tbl")
    with pytest.raises(ValueError, match="local"):
        expire_partitions("hdfs://nn/tbl", "dt", keep=lambda v: True)
