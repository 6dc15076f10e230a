"""Scheme-aware filesystem probes (product_etl_spark/fs.py): the
existence checks behind MERGE/resume/rollup must work on any Hadoop
URI, and the local-rename publish paths must refuse remote URIs
loudly instead of silently downgrading MERGE to overwrite."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from product_etl_spark.fs import fs_exists, require_local, table_exists


def test_fs_exists_and_table_exists_local(spark, tmp_path):
    p = str(tmp_path / "t")
    assert not fs_exists(spark, p)
    assert not table_exists(spark, p)
    spark.range(3).write.parquet(p)
    assert fs_exists(spark, p)
    assert table_exists(spark, p)  # _SUCCESS committed
    # a half-written dir (no _SUCCESS) is NOT a table
    half = tmp_path / "half"
    half.mkdir()
    (half / "part-0.parquet").write_bytes(b"not a real file yet")
    assert fs_exists(spark, str(half))
    assert not table_exists(spark, str(half))


def test_require_local_accepts_local_rejects_any_uri():
    require_local("/data/x", "op")
    require_local("relative/path", "op")
    for uri in ("s3://b/x", "s3a://b/x", "hdfs://nn/x", "abfs://c@a/x"):
        with pytest.raises(ValueError, match="Delta/Iceberg"):
            require_local(uri, "op")
    # file:// is ALSO rejected: the publishers use os.path/os.rename
    # on the raw string, which can't resolve URI spellings — letting
    # it through would skip the backup branch and fail mid-swap
    with pytest.raises(ValueError, match="plain local path"):
        require_local("file:///data/x", "op")


def test_upsert_refuses_remote_uri_before_any_io(spark):
    from product_etl_spark.operators.upsert import upsert_parquet

    df = spark.range(1).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="upsert_parquet"):
        upsert_parquet(spark, df, "s3a://bucket/table", keys=["k"])


def test_maintenance_publishers_refuse_remote_uri(spark):
    from product_etl_spark.pipelines.maintenance import (
        add_audit_columns,
        compact_table,
        snapshot_table,
    )

    with pytest.raises(ValueError):
        compact_table(spark, "s3a://bucket/table")
    with pytest.raises(ValueError):
        add_audit_columns(spark, "hdfs://nn/table")
    with pytest.raises(ValueError):
        snapshot_table(spark, "s3://bucket/table")
