"""Maintenance jobs — the reference's repair/cleanup scripts as
distributed one-shot jobs (SURVEY.md §7.3 phase 8).

- ``fix_sku_dot_zero``: the `.0`-suffix repair
  (utils/importer/fix_sku_dot_zero.py) done right: anchored regex,
  not the buggy rstrip; updates product skus, derived ids stay
  stable because repair writes new deterministic ids, and image
  paths are rewritten like the reference's REPLACE on url_local
  (fix_sku_dot_zero.py:66-71).
- ``find_orphans`` / ``cleanup_orphans``: orphan detection/removal
  (utils/importer/cleanup_incorrect_products.py:45-51,81-126) —
  anti-joins + filtered overwrite instead of 100-id DELETE batches.
- ``relink_products_by_master_code``: the UPDATE..FROM repair
  (utils/importer/diagnosis_and_fix.sql:38-45) as an update-join.
- ``consistency_report``: DB-vs-filesystem style audit
  (utils/importer/check_sku_status.py:108-141) generalized to
  table-vs-table set comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from product_etl_spark import ids
from product_etl_spark.functions.cleaners import strip_sku_dot_zero


def fix_sku_dot_zero(product: DataFrame) -> DataFrame:
    """Repair float-coerced skus: exactly one trailing '.0' removed
    (never the reference's rstrip('.0') over-strip), ids re-derived
    so the deterministic id invariant holds after repair."""
    fixed_sku = strip_sku_dot_zero(F.col("sku"))
    return product.withColumn("sku", fixed_sku).withColumn(
        "id", ids.uuid5_col(ids.NS_PRODUCT, F.col("sku"))
    )


def find_orphans(child: DataFrame, parent: DataFrame, child_fk: str, parent_key: str) -> DataFrame:
    """Child rows whose FK resolves to no parent (LEFT JOIN..IS NULL
    orphan detection, verify_etl_results.py:114-124)."""
    return child.join(
        parent.select(F.col(parent_key).alias(child_fk)).distinct(),
        child_fk,
        "left_anti",
    )


def cleanup_orphans(
    child: DataFrame, parent: DataFrame, child_fk: str, parent_key: str
) -> DataFrame:
    """Drop orphaned child rows (the distributed form of the batched
    DELETE at cleanup_incorrect_products.py:81-126)."""
    return child.join(
        parent.select(F.col(parent_key).alias(child_fk)).distinct(),
        child_fk,
        "left_semi",
    )


def relink_products_by_master_code(
    product: DataFrame, collection: DataFrame
) -> DataFrame:
    """Re-point product.collection_id at the collection with the same
    master_code (UPDATE..FROM, diagnosis_and_fix.sql:38-45) — an
    update-join: overwrite the FK column from the joined dimension."""
    dim = collection.select(
        "master_code", F.col("id").alias("_correct_collection_id")
    )
    return (
        product.join(F.broadcast(dim), "master_code", "left")
        .withColumn(
            "collection_id",
            F.coalesce("_correct_collection_id", "collection_id"),
        )
        .drop("_correct_collection_id")
    )


def compact_table(
    spark,
    path: str,
    target_file_mb: int = 256,
    sort_cols: list[str] | None = None,
):
    """Small-files compaction + optional layout sort.

    Incremental MERGE runs leave many small files; at 100 TB small
    files dominate scan planning time. Rewrite the table at
    ~``target_file_mb`` per file; ``sort_cols`` clusters rows so
    parquet min/max statistics give data skipping on those columns
    (the poor man's Z-order — effective for one or two correlated
    predicates, which covers the reference's lookup patterns:
    master_code, sku).
    """
    import shutil
    import uuid as _uuid

    df = spark.read.parquet(path)
    n_bytes = sum(
        f.stat().st_size
        for f in __import__("pathlib").Path(path).rglob("*.parquet")
    )
    n_files = max(1, n_bytes // (target_file_mb * 1024 * 1024))
    out = df.repartition(int(n_files))
    if sort_cols:
        out = out.sortWithinPartitions(*sort_cols)
    staging = f"{path}__compact_{_uuid.uuid4().hex[:8]}"
    out.write.mode("overwrite").parquet(staging)
    backup = f"{path}__old_{_uuid.uuid4().hex[:8]}"
    import os as _os

    _os.rename(path, backup)
    _os.rename(staging, path)
    shutil.rmtree(backup, ignore_errors=True)
    return spark.read.parquet(path)


def consistency_report(
    left: DataFrame, right: DataFrame, left_key: str, right_key: str
) -> DataFrame:
    """Two-way set difference summary (check_sku_status.py:113-141:
    db_skus - fs_folders / fs_folders - db_skus) as one row."""
    l_keys = left.select(F.col(left_key).alias("k")).distinct()
    r_keys = right.select(F.col(right_key).alias("k")).distinct()
    only_left = l_keys.join(r_keys, "k", "left_anti").agg(
        F.count(F.lit(1)).alias("only_in_left")
    )
    only_right = r_keys.join(l_keys, "k", "left_anti").agg(
        F.count(F.lit(1)).alias("only_in_right")
    )
    both = l_keys.join(r_keys, "k", "left_semi").agg(
        F.count(F.lit(1)).alias("in_both")
    )
    return both.crossJoin(only_left).crossJoin(only_right)


def snapshot_table(spark, path: str, tag: str = "backup"):
    """Copy a table directory to a timestamped sibling before a risky
    repair — the reference's documented backup-before-fix procedure
    (SKU_DOT_ZERO_FIX_README.md:52-94) as one call. Returns the
    snapshot path."""
    import shutil
    import time as _time

    snap = f"{path}__{tag}_{int(_time.time())}"
    shutil.copytree(path, snap)
    return snap
