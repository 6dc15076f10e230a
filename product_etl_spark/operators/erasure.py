"""Subject erasure (right-to-be-forgotten) across a parquet lake:
delete every row belonging to a set of subject keys from every table
that carries them, and maintain a suppression list so the subjects
cannot silently re-enter through later ingest batches.

The two halves matter equally at scale:

- **Erasure** is a keyed anti-join rewrite per table — read, drop,
  staged write, atomic swap — run under the same single-writer
  advisory lock as the MERGE writer (two concurrent rewriters of one
  table would lose one side's work; an erasure racing an upsert is
  exactly the lost-update case the lock exists for). Tables where no
  subject key matches are NOT rewritten (a semi-join probe first) —
  on a 100 TB lake most tables don't hold a given subject.
- **Suppression** is the half naive implementations forget: ingest is
  continuous, so a deleted subject reappears with the next feed
  unless every ingest anti-joins the suppression list
  (``apply_suppression``). The list is tiny (one row per erased key),
  broadcast-joins against any batch, and is append-only parquet.

Reference parity: the reference has no deletion path at all — rows
only ever accrete (ETL.py upserts). This is the lake-side analog of
a cascading DELETE plus a denylist.

On a transactional table format (Delta/Iceberg) the per-table rewrite
becomes ``DELETE WHERE`` and the swap/lock machinery falls away; the
suppression contract is format-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from product_etl_spark.operators.upsert import _table_write_lock


def erase_subjects(
    spark: SparkSession,
    subject_keys: DataFrame,
    tables: list[dict],
    suppression_path: str | None = None,
) -> dict[str, int]:
    """Delete all rows matching ``subject_keys`` (a 1-column frame)
    from each table in ``tables`` (``[{"path": ..., "key_col": ...},
    ...]``); returns {path: n_deleted}. Idempotent: a rerun deletes 0
    rows. If ``suppression_path`` is given, the erased keys are
    appended there (deduplicated on read) for ``apply_suppression``.
    """
    import os
    import shutil
    import uuid

    from product_etl_spark.fs import require_local, table_exists

    [key_in] = subject_keys.columns
    keys = subject_keys.select(F.col(key_in).alias("_subject")).distinct()
    keys = keys.localCheckpoint(eager=True)  # small; reused per table

    report: dict[str, int] = {}
    for spec in tables:
        path, key_col = spec["path"], spec["key_col"]
        require_local(path, "erase_subjects")
        with _table_write_lock(path):
            if not table_exists(spark, path):
                report[path] = 0
                continue
            current = spark.read.parquet(path)
            cond = current[key_col] == keys["_subject"]
            n_hit = current.join(F.broadcast(keys), cond, "left_semi").count()
            report[path] = n_hit
            if n_hit == 0:
                continue  # no rewrite for untouched tables
            kept = current.join(F.broadcast(keys), cond, "left_anti")
            staging = f"{path}__staging_{uuid.uuid4().hex[:8]}"
            kept.write.mode("overwrite").parquet(staging)
            backup = f"{path}__old_{uuid.uuid4().hex[:8]}"
            os.rename(path, backup)
            os.rename(staging, path)
            shutil.rmtree(backup, ignore_errors=True)
            spark.catalog.refreshByPath(path)

    if suppression_path is not None:
        keys.select(
            F.col("_subject").alias("subject_key"),
            F.current_timestamp().alias("erased_on"),
        ).write.mode("append").parquet(suppression_path)
    return report


def apply_suppression(
    batch: DataFrame, spark: SparkSession, suppression_path: str, key_col: str
) -> DataFrame:
    """Drop rows whose ``key_col`` is on the suppression list — the
    ingest-side half of erasure: without this, the next feed run
    re-creates every deleted subject. No-op if the list doesn't exist
    yet. The list is one row per erased key, so the anti-join
    broadcasts."""
    from product_etl_spark.operators.dedup_incremental import (
        read_signature_store,
    )

    sup = read_signature_store(spark, suppression_path)
    if sup is None:
        return batch
    keys = sup.select(F.col("subject_key").alias("_subject")).distinct()
    return batch.join(
        F.broadcast(keys), batch[key_col] == keys["_subject"], "left_anti"
    )
