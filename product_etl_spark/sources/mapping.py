"""Mapping-driven projection: the schema-as-data layer.

The reference's CSV-to-table/column mapping is itself data — a
``map.csv`` with columns ``raw_input_field, db_table, field`` loaded
into a dict that drives every downstream projection
(utils/importer/ETL.py:91-99; the dict IS the logical plan per
SURVEY.md §3.1). We reproduce that: load the mapping, then build a
``select(...alias...)`` projection per target table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def load_mapping(spark: SparkSession, path: str) -> dict[str, dict[str, str]]:
    """map.csv -> {raw_input_field: {"table": ..., "column": ...}}.

    Rows with an empty ``field`` keep the empty string, as the
    reference does (ETL.py:98) — those columns route to translation
    sidecars whose field_name is derived from the raw column.
    """
    rows = (
        spark.read.option("header", True)
        .csv(path)
        .select("raw_input_field", "db_table", "field")
        .collect()
    )
    return {
        r["raw_input_field"]: {
            "table": r["db_table"],
            "column": r["field"] or "",
        }
        for r in rows
        if r["raw_input_field"]
    }


def projection_for_table(
    mapping: dict[str, dict[str, str]],
    table: str,
    transforms: dict[str, Column] | None = None,
) -> list[Column]:
    """Build the select-list for one target table from the mapping.

    ``transforms`` overrides the plain rename for columns that need
    cleaning (e.g. price comma-normalization, image-array parse) —
    the Spark equivalent of the reference's per-column special cases
    (ETL.py:145-154, 497-505).
    """
    cols: list[Column] = []
    transforms = transforms or {}
    for raw_col, spec in mapping.items():
        if spec["table"] != table or not spec["column"]:
            continue
        dst = spec["column"]
        expr = transforms.get(dst, F.col(raw_col))
        cols.append(expr.alias(dst))
    return cols


def translation_fields(
    mapping: dict[str, dict[str, str]], table: str
) -> list[tuple[str, str]]:
    """(raw_column, field_name) pairs routed to a translation sidecar
    — mapping rows whose ``field`` is empty (ETL.py:244-251 routes
    'Product Name' into product_collection_translations)."""
    out = []
    for raw_col, spec in mapping.items():
        if spec["table"] == table and not spec["column"]:
            field = raw_col.strip().lower().replace(" ", "_")
            out.append((raw_col, field))
    return out


def apply_projection(df: DataFrame, cols: list[Column]) -> DataFrame:
    return df.select(*cols)
