"""Bulk product ingest — the reference's ``ETL.main()``
(utils/importer/ETL.py:86-630, lifecycle trace SURVEY.md §3.1)
re-expressed as ~6 declarative DataFrame jobs.

Where the reference runs one giant per-row loop with O(10) SQL
round-trips per product (ETL.py:134-618), this pipeline is:

1. window-split master/variant (operators/split.py),
2. mapping projection + cleaner expressions per target table,
3. deterministic uuid5 ids (no get-or-create read-backs),
4. dimension build via distinct (categories, attribute dictionaries),
5. explode for one-to-many children (images, parsed attributes),
6. idempotent MERGE writes per output table (operators/upsert.py).

Run twice => byte-identical tables, audit timestamps included —
modified_on refreshes only on payload change (tested); the reference
gets the same property from upsert-by-natural-key, one row at a time.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from product_etl_spark import ids
from product_etl_spark.functions import cleaners as C
from product_etl_spark.operators.split import split_master_variants
from product_etl_spark.operators.upsert import upsert_parquet
from product_etl_spark.schemas import NATURAL_KEYS


@dataclass
class IngestResult:
    tables: dict[str, DataFrame] = field(default_factory=dict)


# Raw CSV column names (FIXTURES.md F1, originals at ETL.py map.csv).
COL_MASTER = "Master Code"
COL_SKU = "SKU Code"
COL_NAME = "Product Name"
COL_PRODUCT_IMAGE = "Product Image"
COL_IMG_ARRAY = "Img Array"
COL_CATEGORY = "Category Name"
COL_CUSTOM_ATTRS = "Custom Attributes"
COL_SKU_ATTRS = "Sku Attribute"
COL_DETAILS = "Web Page Details"
COL_VIDEO = "Video"
COL_PRICE = "Price"
COL_INVENTORY = "Inventory"
COL_WEIGHT = "Weight"
COL_LONG = "Long"
COL_WIDTH = "Width"
COL_HIGH = "High"
COL_URL = "Collection URL"
COL_COLLECTION_IMAGE = "Collection Image"
COL_WXWERP = "Master WXWERP"


def _opt(df: DataFrame, name: str) -> F.Column:
    """Column if present in the raw frame, else NULL (exports vary)."""
    return F.col(f"`{name}`") if name in df.columns else F.lit(None).cast("string")


def _fits_broadcast(df: DataFrame, max_bytes: int | None = None) -> bool:
    """True when Catalyst's size estimate for ``df`` is within the
    session broadcast threshold — the gate for *forced* broadcast
    hints on dimensions that are usually-but-not-provably small. On
    any estimation failure, err toward False (Catalyst still
    broadcasts provably-small sides by itself)."""
    try:
        if max_bytes is None:
            max_bytes = int(
                df.sparkSession.conf.get(
                    "spark.sql.autoBroadcastJoinThreshold", str(10 * 1024 * 1024)
                )
            )
        if max_bytes <= 0:
            return False
        est = df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        return int(est) <= max_bytes
    except Exception:
        return False


def build_collections(templates: DataFrame) -> DataFrame:
    """Collection template rows -> product_collection table
    (projection + cleaners per ETL.py:145-163; images via parse_array
    ETL.py:151-152; video NaN-guard ETL.py:473-474)."""
    t = templates
    return t.select(
        ids.uuid5_col(ids.NS_COLLECTION, C.clean_string(_opt(t, COL_MASTER))).alias("id"),
        C.clean_string(_opt(t, COL_WXWERP)).alias("master_wxwerp"),
        C.clean_string(_opt(t, COL_URL)).alias("url"),
        C.clean_string(_opt(t, COL_MASTER)).alias("master_code"),
        C.clean_string(_opt(t, COL_COLLECTION_IMAGE)).alias("image"),
        _opt(t, COL_INVENTORY).try_cast("long").alias("inventory"),
        _opt(t, COL_LONG).try_cast("double").alias("long"),
        _opt(t, COL_WIDTH).try_cast("double").alias("width"),
        _opt(t, COL_HIGH).try_cast("double").alias("high"),
        C.clean_string(_opt(t, COL_SKU)).alias("sku"),
        C.normalize_decimal(_opt(t, COL_WEIGHT), 18, 3).alias("weight"),
        F.when(
            C.clean_string(_opt(t, COL_VIDEO)).isin("NaN", "nan"), F.lit(None)
        )
        .otherwise(C.clean_string(_opt(t, COL_VIDEO)))
        .alias("video"),
        C.parse_img_array(_opt(t, COL_IMG_ARRAY)).alias("images"),
    )


def build_products(variants: DataFrame, collections: DataFrame) -> DataFrame:
    """Variant rows -> product table with collection inheritance.

    Price comma-fix per ETL.py:503-504; url/image/images inherited
    from the collection when absent (ETL.py:540-556,
    utils/importer/migrate_product_inheritance.py:88-100) — a
    broadcast-able join on master_code instead of per-row lookups.
    """
    v = variants
    base = v.select(
        ids.uuid5_col(ids.NS_PRODUCT, C.clean_string(_opt(v, COL_SKU))).alias("id"),
        C.normalize_decimal(_opt(v, COL_PRICE)).alias("selling_price"),
        C.clean_string(_opt(v, COL_PRODUCT_IMAGE)).alias("_own_image"),
        _opt(v, COL_INVENTORY).try_cast("long").alias("inventory"),
        C.clean_string(_opt(v, COL_WEIGHT)).alias("weight"),
        _opt(v, COL_LONG).try_cast("double").alias("long"),
        _opt(v, COL_WIDTH).try_cast("double").alias("width"),
        _opt(v, COL_HIGH).try_cast("double").alias("high"),
        C.clean_string(_opt(v, COL_MASTER)).alias("master_code"),
        F.col("in_collection_index"),
        C.clean_string(_opt(v, COL_SKU)).alias("sku"),
    ).filter(F.col("sku").isNotNull())
    coll = collections.select(
        F.col("master_code"),
        F.col("id").alias("collection_id"),
        F.col("url").alias("_coll_url"),
        F.col("image").alias("_coll_image"),
        F.col("images").alias("_coll_images"),
    )
    # Collections ≪ products in this domain, but a forced broadcast of
    # an unboundedly-growing dimension is a 100 TB foot-gun: hint only
    # while the plan's size estimate says it fits, else let
    # Catalyst/AQE choose (they still broadcast small sides on their
    # own below the threshold).
    if _fits_broadcast(coll):
        coll = F.broadcast(coll)
    return (
        base.join(coll, "master_code", "left")
        .select(
            "id",
            "collection_id",
            "selling_price",
            F.coalesce("_own_image", "_coll_image").alias("image"),
            "inventory",
            "weight",
            "long",
            "width",
            "high",
            "master_code",
            "in_collection_index",
            "sku",
            F.col("_coll_url").alias("url"),
            F.col("_coll_images").alias("images"),
        )
    )


def build_translations(templates: DataFrame, lang_code: str = "zh") -> DataFrame:
    """Source-language translation rows for collection names
    (ETL.py:243-274 writes the zh name into
    product_collection_translations; our unified sidecar keys on
    (entity_type, entity_id, lang_code, field_name))."""
    t = templates
    ent_id = ids.uuid5_col(ids.NS_COLLECTION, C.clean_string(_opt(t, COL_MASTER)))
    value = C.clean_string(_opt(t, COL_NAME))
    row = t.select(
        F.lit("product_collection").alias("entity_type"),
        ent_id.alias("entity_id"),
        F.lit(lang_code).alias("lang_code"),
        F.lit("name").alias("field_name"),
        value.alias("value"),
    ).filter(F.col("value").isNotNull())
    return row.withColumn(
        "id",
        ids.uuid5_col(
            ids.NS_TRANSLATION, "entity_type", "entity_id", "lang_code", "field_name"
        ),
    )


def build_categories(templates: DataFrame, lang_code: str = "zh"):
    """Get-or-create categories (ETL.py:311-353) without the circular
    FK dance: distinct names -> category rows with uuid5 ids + a zh
    translation row + collection->category links. Returns
    (category, translations, links)."""
    t = templates
    named = t.select(
        C.clean_string(_opt(t, COL_MASTER)).alias("master_code"),
        C.clean_string(_opt(t, COL_CATEGORY)).alias("category_name"),
    ).filter(F.col("category_name").isNotNull())

    category = (
        named.select("category_name")
        .distinct()
        .select(
            ids.uuid5_col(ids.NS_CATEGORY, "category_name").alias("id"),
            F.col("category_name").alias("category_key"),
        )
    )
    cat_translations = category.select(
        F.lit("category").alias("entity_type"),
        F.col("id").alias("entity_id"),
        F.lit(lang_code).alias("lang_code"),
        F.lit("name").alias("field_name"),
        F.col("category_key").alias("value"),
    ).withColumn(
        "id",
        ids.uuid5_col(
            ids.NS_TRANSLATION, "entity_type", "entity_id", "lang_code", "field_name"
        ),
    )
    links = named.select(
        ids.uuid5_col(ids.NS_COLLECTION, "master_code").alias("collection_id"),
        ids.uuid5_col(ids.NS_CATEGORY, "category_name").alias("category_id"),
    ).withColumn(
        "id", ids.uuid5_col(ids.NS_ENGINE, "collection_id", "category_id")
    )
    return category, cat_translations, links


def build_raw_attributes(templates: DataFrame):
    """Custom-attribute raw strings + parsed k/v rows
    (ETL.py:374-393 raw storage; utils/custom_attributes_parser.py
    parse+explode). Returns (raw, parsed)."""
    t = templates
    raw = (
        t.select(C.clean_string(_opt(t, COL_CUSTOM_ATTRS)).alias("custom_attributes_raw"))
        .filter(F.col("custom_attributes_raw").isNotNull())
        .distinct()
        .select(
            ids.uuid5_col(ids.NS_RAW_ATTR, "custom_attributes_raw").alias("id"),
            "custom_attributes_raw",
        )
    )
    parsed = (
        raw.select(
            F.col("id").alias("raw_id"),
            F.explode(C.parse_attributes("custom_attributes_raw")).alias("kv"),
        )
        .select("raw_id", F.col("kv.attr_key"), F.col("kv.attr_value"))
        .dropDuplicates(["raw_id", "attr_key"])  # last-wins handled upstream
        .withColumn("id", ids.uuid5_col(ids.NS_ENGINE, "raw_id", "attr_key"))
    )
    return raw, parsed


def build_product_attributes(variants: DataFrame):
    """Per-variant sku-attribute dictionary (product_attribute_keys /
    _values / _product, utils/product_attributes_etl.py:60-87):
    parse -> explode -> dedup dictionaries with deterministic ids ->
    link rows. No read-backs: uuid5(key) and uuid5(key, value) are
    derivable on both sides of every join."""
    v = variants
    kv = (
        v.select(
            C.clean_string(_opt(v, COL_SKU)).alias("sku"),
            F.explode(C.parse_attributes(_opt(v, COL_SKU_ATTRS))).alias("kv"),
        )
        .filter(F.col("sku").isNotNull())
        .select("sku", F.col("kv.attr_key"), F.col("kv.attr_value"))
    )
    keys = (
        kv.select("attr_key")
        .distinct()
        .select(ids.uuid5_col(ids.NS_ATTR_KEY, "attr_key").alias("id"), "attr_key")
    )
    values = (
        kv.select("attr_key", "attr_value")
        .distinct()
        .select(
            ids.uuid5_col(ids.NS_ATTR_VALUE, "attr_key", "attr_value").alias("id"),
            ids.uuid5_col(ids.NS_ATTR_KEY, "attr_key").alias("key_id"),
            "attr_value",
        )
    )
    links = kv.select(
        ids.uuid5_col(ids.NS_PRODUCT, "sku").alias("product_id"),
        ids.uuid5_col(ids.NS_ATTR_VALUE, "attr_key", "attr_value").alias("value_id"),
    ).distinct().withColumn(
        "id", ids.uuid5_col(ids.NS_ENGINE, "product_id", "value_id")
    )
    return keys, values, links


def build_collection_images(collections: DataFrame) -> DataFrame:
    """images[] -> one row per (collection, index) with the
    deterministic local path {sku}_{idx}{ext}
    (utils/product_collection_img_array_processor.py:136-142 incl.
    the enumerate(start=1) index and extension default)."""
    c = collections
    exploded = c.select(
        F.col("sku").alias("collection_sku"),
        "master_code",
        F.posexplode_outer("images").alias("pos", "url_original"),
    ).filter(F.col("url_original").isNotNull())
    img_idx = (F.col("pos") + 1).cast("int")
    return exploded.select(
        "collection_sku",
        "master_code",
        img_idx.alias("image_index"),
        "url_original",
        F.concat(
            F.coalesce(F.col("collection_sku"), F.col("master_code")),
            F.lit("_"),
            img_idx.cast("string"),
            C.file_extension("url_original"),
        ).alias("url_local"),
    ).withColumn(
        "id", ids.uuid5_col(ids.NS_ENGINE, "master_code", F.col("image_index").cast("string"))
    )


#: Seed languages of the reference deployment
#: (backup_before_fix.sql:2316-2321).
SEED_LANGS = ["en", "zh", "ru", "th"]


def seed_lang_table(spark: SparkSession, warehouse: str) -> DataFrame:
    """Idempotent seed of the ``lang`` dimension (the reference
    get-or-creates 'en' at startup, ETL.py:111-124; we insert-only
    merge the full seed set with deterministic ids)."""
    rows = spark.createDataFrame([(c,) for c in SEED_LANGS], "lang_code string")
    langs = rows.select(
        ids.uuid5_col(ids.NS_LANG, "lang_code").alias("id"), "lang_code"
    )
    return upsert_parquet(
        spark, langs, f"{warehouse}/lang", keys=["lang_code"], mode="insert_only"
    )


def run_ingest(
    spark: SparkSession,
    raw: DataFrame,
    warehouse: str,
    write: bool = True,
) -> IngestResult:
    """Full ingest: raw export frame -> all canonical tables.

    ``raw`` comes from sources.read_raw_products (string-typed +
    ``_source_row_idx``). With ``write=True`` each table is MERGEd
    into ``{warehouse}/{table}`` on its natural key — rerunning the
    same input is a no-op by construction.
    """
    templates, variants = split_master_variants(raw)

    collections = build_collections(templates)
    products = build_products(variants, collections)
    translations = build_translations(templates)
    category, cat_tr, cat_links = build_categories(templates)
    attr_raw, attr_parsed = build_raw_attributes(templates)
    pk, pv, plinks = build_product_attributes(variants)
    images = build_collection_images(collections)

    result = IngestResult(
        tables={
            "product_collection": collections,
            "product": products,
            "translations": translations.unionByName(cat_tr),
            "category": category,
            "product_collection_category": cat_links,
            "custom_attributes_raw": attr_raw,
            "custom_attributes_parsed": attr_parsed,
            "product_attribute_keys": pk,
            "product_attribute_values": pv,
            "product_attribute_product": plinks,
            "product_collection_images": images,
        }
    )
    if write:
        from concurrent.futures import ThreadPoolExecutor

        result.tables["lang"] = seed_lang_table(spark, warehouse)

        def merge(item):
            name, df = item
            return name, upsert_parquet(
                spark, df, f"{warehouse}/{name}", keys=NATURAL_KEYS[name]
            )

        # The 11 output tables are independent: submit their MERGE
        # jobs concurrently (Spark's scheduler interleaves them; on a
        # cluster this keeps executors busy instead of draining
        # between small jobs). Thread count bounded — each thread
        # holds a job's driver-side state.
        to_write = [(n, df) for n, df in result.tables.items() if n != "lang"]
        with ThreadPoolExecutor(max_workers=4) as pool:
            for name, merged in pool.map(merge, to_write):
                result.tables[name] = merged
    return result
