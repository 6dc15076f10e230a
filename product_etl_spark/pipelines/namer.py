"""LLM name+SKU generation (reference M6:
utils/ai-helper/art-maker/namer.py:20-45 — gpt-4o, temp 0.4, builds a
product name and SKU from category/collection/attributes).

Spark form: an Arrow-batched stage over (category, collection,
attrs) rows with an injectable kernel; production wires
``kernels.gpt4o_namer_kernel`` — the LLM
client (one per executor, token-bucket paced per M8), tests use a
deterministic mock. Results are cached by input fingerprint so
reruns never re-bill (the translation-cache pattern applied to
generation)."""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from product_etl_spark.operators.incremental import only_unprocessed, read_stage_table
from product_etl_spark.operators.upsert import upsert_parquet

#: kernel: (category, collection, attrs) -> (name, sku)
NamerKernel = Callable[[str, str, str], tuple[str, str]]

NAMER_SCHEMA = StructType(
    [
        StructField("entity_id", StringType(), False),
        StructField("generated_name", StringType()),
        StructField("generated_sku", StringType()),
    ]
)


def generate_names(
    rows: DataFrame,
    kernel: NamerKernel,
    id_col: str = "entity_id",
    category_col: str = "category",
    collection_col: str = "collection",
    attrs_col: str = "attrs",
) -> DataFrame:
    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for eid, cat, coll, attrs in zip(
                pdf[id_col], pdf[category_col], pdf[collection_col], pdf[attrs_col]
            ):
                name, sku = kernel(cat or "", coll or "", attrs or "")
                out.append(
                    {"entity_id": eid, "generated_name": name, "generated_sku": sku}
                )
            yield pd.DataFrame(out, columns=[f.name for f in NAMER_SCHEMA])

    return rows.select(
        F.col(id_col), F.col(category_col), F.col(collection_col), F.col(attrs_col)
    ).mapInPandas(run, schema=NAMER_SCHEMA)


def run_namer(
    spark: SparkSession,
    rows: DataFrame,
    stage_path: str,
    kernel: NamerKernel,
    id_col: str = "entity_id",
) -> DataFrame:
    """Incremental generation: only ids absent from the stage table
    hit the kernel; insert-only merge keeps first-written results
    (rerun-stable even with a nondeterministic LLM)."""
    pending = only_unprocessed(rows, read_stage_table(spark, stage_path), id_col)
    fresh = generate_names(pending, kernel, id_col=id_col)
    return upsert_parquet(
        spark, fresh, stage_path, keys=["entity_id"], mode="insert_only"
    )
