"""Auto-mapping suggestions — the reference's automapper
(utils/importer/automapper.py: reads the raw workbook and proposes
raw-column -> table.field mappings by name similarity), re-expressed
against the schema registry.

Driver-side by nature (mapping files are tiny config artifacts);
output feeds sources/mapping.load_mapping's format.
"""

from __future__ import annotations

import difflib


def _norm(name: str) -> str:
    return "".join(ch for ch in name.lower() if ch.isalnum())


#: Hand-tuned aliases the pure string distance can't discover —
#: mirrors the reference's special-cases (automapper.py keyword maps).
ALIASES: dict[str, tuple[str, str]] = {
    "mastercode": ("product_collection", "master_code"),
    "skucode": ("product", "sku"),
    "price": ("product", "selling_price"),
    "productname": ("product_collection_translations", ""),
    "imgarray": ("product_collection", "images"),
    "categoryname": ("category", ""),
    "customattributes": ("custom_attributes_raw", "custom_attributes_raw"),
    "skuattribute": ("product_attribute_product", ""),
    "inventory": ("product_collection", "inventory"),
    "collectionurl": ("product_collection", "url"),
    "collectionimage": ("product_collection", "image"),
    "masterwxwerp": ("product_collection", "master_wxwerp"),
}


def suggest_mapping(
    raw_columns: list[str], cutoff: float = 0.6
) -> dict[str, dict[str, str]]:
    """raw column names -> {'table', 'column', 'confidence'}.

    Alias table first, then best fuzzy match against every
    (table, column) in the schema registry; below-cutoff columns map
    to '' (routed to translation sidecars or dropped by the operator
    — exactly how the reference leaves unmapped fields blank in
    map.csv).
    """
    from product_etl_spark.schemas import REGISTRY

    candidates: list[tuple[str, str, str]] = []  # (norm, table, column)
    for table, schema in REGISTRY.items():
        for f in schema.fields:
            if f.name in ("id", "created_on", "modified_on"):
                continue
            candidates.append((_norm(f.name), table, f.name))
    cand_norms = [c[0] for c in candidates]

    out: dict[str, dict[str, str]] = {}
    for raw in raw_columns:
        key = _norm(raw)
        if key in ALIASES:
            table, column = ALIASES[key]
            out[raw] = {"table": table, "column": column, "confidence": "alias"}
            continue
        best = difflib.get_close_matches(key, cand_norms, n=1, cutoff=cutoff)
        if best:
            _, table, column = candidates[cand_norms.index(best[0])]
            ratio = difflib.SequenceMatcher(None, key, best[0]).ratio()
            out[raw] = {
                "table": table,
                "column": column,
                "confidence": f"{ratio:.2f}",
            }
        else:
            out[raw] = {"table": "", "column": "", "confidence": "0"}
    return out


def mapping_to_csv(mapping: dict[str, dict[str, str]]) -> str:
    """Serialize suggestions to the map.csv format
    (raw_input_field,db_table,field)."""
    lines = ["raw_input_field,db_table,field"]
    for raw, spec in mapping.items():
        lines.append(f"{raw},{spec['table']},{spec['column']}")
    return "\n".join(lines) + "\n"
