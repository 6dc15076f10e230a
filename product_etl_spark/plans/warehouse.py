"""Warehouse-level queries over the product-domain tables — the
reference's own flagship verification query and the language-resolved
views its UI layer would read.

These run over an ingest warehouse (pipelines/ingest.py), not the
driver's TPC-H corpus, so their correctness checks live in pytest
(tests/test_warehouse_queries.py) against the F1 fixture.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def products_per_collection_with_names(
    collections: DataFrame,
    products: DataFrame,
    translations: DataFrame,
    lang_code: str = "zh",
) -> DataFrame:
    """The reference's flagship audit: products per collection with
    resolved names (utils/importer/COMPOSITE_KEY_FIX_README.md:114-123)
    — collection ⟕ products counted, name via the translation sidecar
    at (entity_type='product_collection', lang, field='name').

    No circular FK dance: one broadcast-able join against the
    translations table replaces the reference's 3-step placeholder
    insert (SURVEY.md §7.1.2).
    """
    names = translations.filter(
        (F.col("entity_type") == "product_collection")
        & (F.col("lang_code") == lang_code)
        & (F.col("field_name") == "name")
    ).select(F.col("entity_id").alias("id"), F.col("value").alias("name"))
    counts = products.groupBy("collection_id").agg(
        F.count(F.lit(1)).alias("n_products")
    )
    return (
        collections.join(names, "id", "left")
        .join(
            counts.withColumnRenamed("collection_id", "id"),
            "id",
            "left",
        )
        .select(
            "master_code",
            "name",
            F.coalesce("n_products", F.lit(0)).alias("n_products"),
        )
    )


def resolve_names(
    entities: DataFrame,
    translations: DataFrame,
    entity_type: str,
    lang_code: str,
    field_name: str = "name",
    fallback_lang: str | None = "zh",
) -> DataFrame:
    """Attach a language-resolved field to an entity frame, with
    fallback language (the reference falls back to the source
    language when a translation is missing — universal_translator
    semantics)."""
    def names_for(lang: str, out: str) -> DataFrame:
        return translations.filter(
            (F.col("entity_type") == entity_type)
            & (F.col("lang_code") == lang)
            & (F.col("field_name") == field_name)
        ).select(F.col("entity_id").alias("id"), F.col("value").alias(out))

    out = entities.join(F.broadcast(names_for(lang_code, "_name_primary")), "id", "left")
    if fallback_lang and fallback_lang != lang_code:
        out = out.join(
            F.broadcast(names_for(fallback_lang, "_name_fallback")), "id", "left"
        )
        resolved = F.coalesce("_name_primary", "_name_fallback")
    else:
        resolved = F.col("_name_primary")
    return out.withColumn(field_name, resolved).drop(
        "_name_primary", "_name_fallback"
    )
