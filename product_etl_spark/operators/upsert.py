"""Idempotent MERGE-by-natural-key writer on plain Parquet.

The reference upserts row-at-a-time: SELECT by natural key, then
INSERT or UPDATE (utils/importer/ETL.py:171-203 collections by
master_code, :559-595 products by sku), with ON CONFLICT DO NOTHING
for idempotent inserts (utils/custom_attributes_parser.py:65-72) and
ON CONFLICT DO UPDATE for overwrites
(utils/details_translator/db_orchestrator.py:331-361).

Spark-first realization without Delta (not available in this
container; the same API maps 1:1 onto ``MERGE INTO`` where Delta /
Iceberg is present — noted per method):

- new table state = updates ∪ (current ⟕anti updates), written to a
  fresh directory, then atomically swapped in. Write-audit-publish —
  atomic per table, task-retry safe because ids are deterministic
  (ids.py).
- ``mode='insert_only'`` reproduces ON CONFLICT DO NOTHING: existing
  keys win; only genuinely new keys are appended.
- audit timestamps (created_on/modified_on) follow the reference's
  trigger semantics (utils/importer/add_timestamps.py:62-126):
  created_on is preserved from the current row on update, modified_on
  is refreshed only for rows actually written.

At 100 TB the swap rewrites only the partitions containing updated
keys when the table is partitioned (``partition_cols``): the current
side is pruned to touched partitions before the merge and only those
partition directories are swapped — untouched partitions are neither
read nor rewritten. Contract: a key's partition values must be stable
across updates (true for all our tables — partitions derive from the
natural key); a moved key would leave its old row behind in the old
partition.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _with_audit(updates: DataFrame, current: DataFrame | None, keys: list[str]):
    """Apply created_on/modified_on trigger semantics
    (add_timestamps.py:62-126): keep created_on of existing rows;
    modified_on refreshes ONLY when the row's payload actually changed
    (null-safe struct compare against the current row) — so a rerun
    over identical input is byte-identical, audit columns included."""
    now = F.current_timestamp()
    payload = [c for c in updates.columns if c not in ("created_on", "modified_on")]
    upd = updates
    if "created_on" not in upd.columns:
        upd = upd.withColumn("created_on", now)
    if "modified_on" not in upd.columns:
        upd = upd.withColumn("modified_on", now)
    upd = upd.withColumn("modified_on", now)
    if current is not None and "created_on" in current.columns:
        detect_change = "modified_on" in current.columns and all(
            c in current.columns for c in payload
        )
        old_cols = [*keys, F.col("created_on").alias("_old_created_on")]
        if detect_change:
            old_cols += [
                F.struct(*[F.col(c) for c in payload]).alias("_old_payload"),
                F.col("modified_on").alias("_old_modified_on"),
            ]
        old = current.select(*old_cols)
        upd = upd.join(old, on=keys, how="left").withColumn(
            "created_on", F.coalesce("_old_created_on", "created_on")
        )
        if detect_change:
            unchanged = F.struct(*[F.col(c) for c in payload]).eqNullSafe(
                F.col("_old_payload")
            )
            upd = upd.withColumn(
                "modified_on",
                F.when(unchanged, F.col("_old_modified_on")).otherwise(
                    F.col("modified_on")
                ),
            ).drop("_old_payload", "_old_modified_on")
        upd = upd.drop("_old_created_on")
    return upd


def upsert_parquet(
    spark: SparkSession,
    updates: DataFrame,
    path: str,
    keys: list[str],
    mode: str = "upsert",
    partition_cols: list[str] | None = None,
    audit: bool = True,
) -> DataFrame:
    """MERGE ``updates`` into the parquet table at ``path`` keyed on
    ``keys``; returns the new table state (lazily re-read).

    mode='upsert'       — whenMatchedUpdate + whenNotMatchedInsert
    mode='insert_only'  — whenNotMatchedInsert only (ON CONFLICT DO
                          NOTHING: existing rows win)

    Contract: the returned DataFrame reads the post-merge state; any
    handle obtained *before* a later merge goes stale (the swap
    replaces the directory) and must be re-read.

    Concurrency: single-writer per table path (concurrent merges to
    *different* tables are safe and used by run_ingest; two writers
    swapping the same path would race on the rename). Multi-writer
    tables are table-format territory — Delta/Iceberg MERGE with
    optimistic concurrency replaces this writer unchanged at the
    call site.

    ``updates`` must be unique per key; we enforce with
    ``dropDuplicates(keys)`` (deterministic inputs make the kept row
    deterministic — ids are uuid5, and callers pre-aggregate).
    """
    from product_etl_spark.fs import require_local, table_exists

    # Loud-and-early on remote URIs: the publish step below renames
    # directories, and os.path probes on s3://... would silently
    # report "absent" and downgrade every MERGE to an initial
    # overwrite. Hadoop-FS probe + local-only publish instead.
    require_local(path, "upsert_parquet")
    current = None
    if table_exists(spark, path):
        current = spark.read.parquet(path)

    # Partition-pruned path: only read/merge/rewrite the partitions
    # the updates actually touch.
    prune = bool(partition_cols) and current is not None
    if prune:
        touched = updates.select(*partition_cols).distinct()
        current = current.join(F.broadcast(touched), partition_cols, "left_semi")

    # Canonical column order, fixed before any join can reorder it:
    # caller's columns first, audit columns last.
    col_order = list(updates.columns)
    if audit:
        col_order += [c for c in ("created_on", "modified_on") if c not in col_order]

    upd = updates.dropDuplicates(keys)
    if audit:
        upd = _with_audit(upd, current, keys)
    upd = upd.select(*col_order)

    if current is None:
        new_state = upd
    elif mode == "insert_only":
        fresh = upd.join(current.select(*keys).distinct(), keys, "left_anti")
        new_state = current.unionByName(fresh, allowMissingColumns=True)
    else:
        kept = current.join(upd.select(*keys).distinct(), keys, "left_anti")
        new_state = kept.unionByName(upd, allowMissingColumns=True)
    # Stable column order across merges (joins move key columns to
    # the front; the table schema must not drift run-to-run).
    order = col_order + [c for c in new_state.columns if c not in col_order]
    new_state = new_state.select(*order)

    # Write-audit-publish: write to a staging dir, then swap — the
    # whole directory for unpartitioned tables, only the touched
    # partition directories for the pruned path.
    staging = f"{path}__staging_{uuid.uuid4().hex[:8]}"
    writer = new_state.write.mode("overwrite")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(staging)

    if prune:
        _swap_touched_partitions(staging, path, len(partition_cols))
    else:
        backup = f"{path}__old_{uuid.uuid4().hex[:8]}"
        if os.path.exists(path):
            os.rename(path, backup)
        os.rename(staging, path)
        if os.path.exists(backup):
            shutil.rmtree(backup, ignore_errors=True)
    # Invalidate any cached file listings for this path: DataFrames
    # created before the swap would otherwise try to read the
    # replaced files on their next action.
    spark.catalog.refreshByPath(path)
    return spark.read.parquet(path)


def _swap_touched_partitions(staging: str, path: str, n_levels: int) -> None:
    """Move every leaf partition directory from ``staging`` over its
    counterpart under ``path``; untouched partition dirs are never
    listed, read, or modified. Per-partition swaps are individually
    atomic (rename); a failure mid-loop leaves a mix of old/new
    partitions that the next idempotent MERGE rerun converges."""
    import glob

    pattern = os.path.join(staging, *(["*=*"] * n_levels))
    for leaf in glob.glob(pattern):
        rel = os.path.relpath(leaf, staging)
        dst = os.path.join(path, rel)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        backup = f"{dst}__old_{uuid.uuid4().hex[:8]}"
        if os.path.exists(dst):
            os.rename(dst, backup)
        os.rename(leaf, dst)
        shutil.rmtree(backup, ignore_errors=True)
    shutil.rmtree(staging, ignore_errors=True)
