"""StructType registry for the product-catalog data model.

One StructType per canonical table, derived from the reference's
CREATE TABLE statements (utils/importer/backup_before_fix.sql:42-525,
table map in SURVEY.md §1.4), with the two deliberate model changes
from SURVEY.md §7.1:

- no circular name->translation FKs: entity tables carry no pointer
  into translation tables; all translated text lives in a single
  ``translations`` sidecar keyed (entity_type, entity_id, lang_code,
  field_name);
- ids are deterministic uuid5 strings (ids.py), so every write is
  idempotent.

SKU / master_code are **always StringType** — the reference's
numeric-coercion `.0` corruption class
(utils/SKU_DOT_ZERO_FIX_README.md:5-13) is excluded by schema.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    DecimalType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def _f(name: str, dtype, nullable: bool = True) -> StructField:
    return StructField(name, dtype, nullable)


AUDIT_FIELDS = [
    # added to every table by the reference's timestamp migration
    # (utils/importer/add_timestamps.py:80-91)
    _f("created_on", TimestampType()),
    _f("modified_on", TimestampType()),
]

LANG = StructType(
    [_f("id", StringType(), False), _f("lang_code", StringType(), False)]
)

# product_collection: backup_before_fix.sql:349-364
PRODUCT_COLLECTION = StructType(
    [
        _f("id", StringType(), False),
        _f("master_wxwerp", StringType()),
        _f("url", StringType()),
        _f("master_code", StringType(), False),
        _f("image", StringType()),
        _f("inventory", LongType()),
        _f("long", DoubleType()),
        _f("width", DoubleType()),
        _f("high", DoubleType()),
        _f("sku", StringType()),
        _f("weight", DecimalType(18, 3)),
        _f("video", StringType()),
        _f("images", ArrayType(StringType())),
        *AUDIT_FIELDS,
    ]
)

# product: backup_before_fix.sql:193-206
PRODUCT = StructType(
    [
        _f("id", StringType(), False),
        _f("collection_id", StringType()),
        _f("selling_price", DecimalType(18, 2)),
        _f("image", StringType()),
        _f("inventory", LongType()),
        _f("weight", StringType()),  # text in the reference schema (:199)
        _f("long", DoubleType()),
        _f("width", DoubleType()),
        _f("high", DoubleType()),
        _f("master_code", StringType()),
        _f("in_collection_index", IntegerType()),
        _f("sku", StringType(), False),
        _f("url", StringType()),
        _f("images", ArrayType(StringType())),
        *AUDIT_FIELDS,
    ]
)

CATEGORY = StructType(
    [_f("id", StringType(), False), _f("category_key", StringType(), False), *AUDIT_FIELDS]
)

# single unified translation sidecar (replaces the per-entity
# *_translations tables + circular FKs; same information)
TRANSLATIONS = StructType(
    [
        _f("id", StringType(), False),
        _f("entity_type", StringType(), False),
        _f("entity_id", StringType(), False),
        _f("lang_code", StringType(), False),
        _f("field_name", StringType(), False),
        _f("value", StringType()),
        *AUDIT_FIELDS,
    ]
)

CUSTOM_ATTRIBUTES_RAW = StructType(
    [
        _f("id", StringType(), False),
        _f("custom_attributes_raw", StringType()),
        *AUDIT_FIELDS,
    ]
)

CUSTOM_ATTRIBUTES_PARSED = StructType(
    [
        _f("id", StringType(), False),
        _f("raw_id", StringType(), False),
        _f("attr_key", StringType()),
        _f("attr_value", StringType()),
        *AUDIT_FIELDS,
    ]
)

PRODUCT_ATTRIBUTE_KEYS = StructType(
    [_f("id", StringType(), False), _f("attr_key", StringType(), False), *AUDIT_FIELDS]
)

PRODUCT_ATTRIBUTE_VALUES = StructType(
    [
        _f("id", StringType(), False),
        _f("key_id", StringType(), False),
        _f("attr_value", StringType(), False),
        *AUDIT_FIELDS,
    ]
)

PRODUCT_ATTRIBUTE_PRODUCT = StructType(
    [
        _f("id", StringType(), False),
        _f("product_id", StringType(), False),
        _f("value_id", StringType(), False),
        *AUDIT_FIELDS,
    ]
)

PRODUCT_COLLECTION_CATEGORY = StructType(
    [
        _f("id", StringType(), False),
        _f("collection_id", StringType(), False),
        _f("category_id", StringType(), False),
        *AUDIT_FIELDS,
    ]
)

PRODUCT_COLLECTION_IMAGES = StructType(
    [
        _f("id", StringType(), False),
        _f("collection_sku", StringType()),
        _f("master_code", StringType()),
        _f("image_index", IntegerType()),
        _f("url_original", StringType()),
        _f("url_local", StringType()),
        _f("created_at", TimestampType()),
        *AUDIT_FIELDS,
    ]
)

REGISTRY: dict[str, StructType] = {
    "lang": LANG,
    "product_collection": PRODUCT_COLLECTION,
    "product": PRODUCT,
    "category": CATEGORY,
    "translations": TRANSLATIONS,
    "custom_attributes_raw": CUSTOM_ATTRIBUTES_RAW,
    "custom_attributes_parsed": CUSTOM_ATTRIBUTES_PARSED,
    "product_attribute_keys": PRODUCT_ATTRIBUTE_KEYS,
    "product_attribute_values": PRODUCT_ATTRIBUTE_VALUES,
    "product_attribute_product": PRODUCT_ATTRIBUTE_PRODUCT,
    "product_collection_category": PRODUCT_COLLECTION_CATEGORY,
    "product_collection_images": PRODUCT_COLLECTION_IMAGES,
}

#: Natural (upsert) key per table — the MERGE key of the idempotent
#: writer (operators/upsert.py), mirroring the reference's
#: check-then-INSERT/UPDATE keys (ETL.py:171-203 master_code,
#: ETL.py:559-595 sku, unique constraints :28806,:28854,:28830).
NATURAL_KEYS: dict[str, list[str]] = {
    "lang": ["lang_code"],
    "product_collection": ["master_code"],
    "product": ["sku"],
    "category": ["category_key"],
    "translations": ["entity_type", "entity_id", "lang_code", "field_name"],
    "custom_attributes_raw": ["custom_attributes_raw"],
    "custom_attributes_parsed": ["raw_id", "attr_key"],
    "product_attribute_keys": ["attr_key"],
    "product_attribute_values": ["key_id", "attr_value"],
    "product_attribute_product": ["product_id", "value_id"],
    "product_collection_category": ["collection_id", "category_id"],
    "product_collection_images": ["master_code", "image_index"],
}
