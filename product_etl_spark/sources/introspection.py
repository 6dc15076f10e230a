"""Catalog introspection (reference S5): the information_schema
scans (sql_query/collect_db_fields.sql, collect_FK.sql) and the
universal translator's dynamic column discovery
(utils/universal_translator.py:75-87), re-expressed over Spark's
catalog and our schema registry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from product_etl_spark.schemas import NATURAL_KEYS, REGISTRY


def collect_fields(spark: SparkSession) -> DataFrame:
    """(table_name, column_name, data_type, ordinal_position) for
    every registered table — the collect_db_fields.sql equivalent."""
    rows = []
    for table, schema in REGISTRY.items():
        for i, f in enumerate(schema.fields, start=1):
            rows.append((table, f.name, f.dataType.simpleString(), i))
    return spark.createDataFrame(
        rows, "table_name string, column_name string, data_type string, ordinal_position int"
    )


def collect_keys(spark: SparkSession) -> DataFrame:
    """(table_name, key_column, key_position) — the engine's natural
    (merge) keys; the moral equivalent of collect_FK.sql's constraint
    listing under deterministic-id design."""
    rows = []
    for table, keys in NATURAL_KEYS.items():
        for i, k in enumerate(keys, start=1):
            rows.append((table, k, i))
    return spark.createDataFrame(
        rows, "table_name string, key_column string, key_position int"
    )


def discover_translatable_fields(df: DataFrame) -> list[str]:
    """String columns that are not ids/keys — the universal
    translator's dynamic field discovery generalized to any frame."""
    out = []
    for f in df.schema.fields:
        if f.dataType.simpleString() != "string":
            continue
        lname = f.name.lower()
        if lname == "id" or lname.endswith("_id") or lname.endswith("_code"):
            continue
        out.append(f.name)
    return out
