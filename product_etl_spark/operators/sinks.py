"""Simple sinks (reference S10/S11/S13/S14).

- ``append_csv``: header-once append CSV (2_ocr_from_images.py:35,64-66).
- ``write_partitioned_by_entity``: one directory per entity
  (3_group...py:41-48 writes one CSV per product_id) — at scale this
  is ``partitionBy``, never a per-entity loop.
- ``render_pdf_stage``: HTML column -> one PDF file per row
  (utils/ai-helper/pupeeter.py:25-54 / html_to_pdf_printer.py:29-43).
  No browser/pdfkit in this container, so the renderer is an
  injectable kernel (deterministic stub in tests); the Spark side —
  foreachPartition fan-out, sanitized deterministic filenames,
  skip-if-exists idempotence — is real.
- ``append_log``: append-only text log
  (product_collection_img_array_processor.py:71-74); executor-side
  logs go to task logs, driver-side to a text sink.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from product_etl_spark.functions.cleaners import sanitize_filename

RenderKernel = Callable[[str], bytes]  # html -> pdf bytes


def append_csv(df: DataFrame, path: str) -> None:
    df.write.mode("append").option("header", True).csv(path)


def write_partitioned_by_entity(
    df: DataFrame, path: str, entity_col: str, fmt: str = "parquet"
) -> None:
    (
        df.write.mode("overwrite")
        .partitionBy(entity_col)
        .format(fmt)
        .save(path)
    )


def render_pdf_stage(
    df: DataFrame,
    out_dir: str,
    kernel: RenderKernel,
    html_col: str = "html",
    name_col: str = "name",
) -> int:
    """Render one PDF per row into ``out_dir``; returns rendered
    count. Filenames are sanitized + truncated exactly like the
    reference (html_to_pdf_printer.py:18-19); existing files are
    skipped (write-idempotent under task retry, SURVEY §7.4c)."""
    prepared = df.select(
        sanitize_filename(F.col(name_col)).alias("_fname"), F.col(html_col)
    )

    def render_partition(rows) -> None:
        os.makedirs(out_dir, exist_ok=True)
        for row in rows:
            target = os.path.join(out_dir, f"{row['_fname']}.pdf")
            if os.path.exists(target):
                continue
            payload = kernel(row[html_col] or "")
            tmp = target + ".tmp"
            with open(tmp, "wb") as fh:
                fh.write(payload)
            os.rename(tmp, target)

    prepared.foreachPartition(render_partition)
    return len(os.listdir(out_dir)) if os.path.isdir(out_dir) else 0


def append_log(df: DataFrame, path: str) -> None:
    df.select(F.col(df.columns[0]).cast("string")).write.mode("append").text(path)
