"""Excel ingest (reference S3: utils/importer/importer_etl.py:31,
utils/importer/automapper.py:27 — ``pd.read_excel(path, sheet 0)``).

No Excel engine is baked into this container (openpyxl absent), so the
primary path is a dependency-free reader built on the public OOXML
layout: an ``.xlsx`` is a zip holding ``xl/workbook.xml`` (sheet
list), ``xl/sharedStrings.xml`` (string table) and
``xl/worksheets/sheetN.xml`` (cells). The driver parses those with
``zipfile`` + ``xml.etree`` and parallelizes with ``createDataFrame``
— Excel files are small driver-side artifacts (mapping workbooks, not
fact data; the 100 TB path is CSV/Parquet).

Matches ``pd.read_excel(dtype=str)`` semantics: first row = header,
every value a string, missing cells NULL.
"""

from __future__ import annotations

import zipfile
import xml.etree.ElementTree as ET

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from product_etl_spark.sources.csv_reader import ROW_IDX

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_REL_NS = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
_PKG_REL_NS = "{http://schemas.openxmlformats.org/package/2006/relationships}"


def _col_index(cell_ref: str) -> int:
    """'A1' -> 0, 'AB7' -> 27 (base-26 column letters)."""
    n = 0
    for ch in cell_ref:
        if not ch.isalpha():
            break
        n = n * 26 + (ord(ch.upper()) - ord("A") + 1)
    return n - 1


def _shared_strings(zf: zipfile.ZipFile) -> list[str]:
    try:
        data = zf.read("xl/sharedStrings.xml")
    except KeyError:
        return []
    out = []
    for si in ET.fromstring(data).iter(f"{_NS}si"):
        # plain <t> or rich-text runs <r><t>; concatenate all <t> text
        out.append("".join(t.text or "" for t in si.iter(f"{_NS}t")))
    return out


def _sheet_member(zf: zipfile.ZipFile, sheet: int | str) -> str:
    """Resolve a sheet index/name to its zip member via workbook rels."""
    wb = ET.fromstring(zf.read("xl/workbook.xml"))
    rels = {
        rel.get("Id"): rel.get("Target")
        for rel in ET.fromstring(zf.read("xl/_rels/workbook.xml.rels")).iter(
            f"{_PKG_REL_NS}Relationship"
        )
    }
    sheets = list(wb.iter(f"{_NS}sheet"))
    if isinstance(sheet, str):
        matches = [s for s in sheets if s.get("name") == sheet]
        if not matches:
            raise ValueError(f"sheet {sheet!r} not found")
        el = matches[0]
    else:
        el = sheets[sheet]
    target = rels[el.get(f"{_REL_NS}id")]
    return target if target.startswith("xl/") else f"xl/{target}"


def _cell_value(c: ET.Element, strings: list[str]) -> str | None:
    t = c.get("t", "n")
    if t == "inlineStr":
        is_el = c.find(f"{_NS}is")
        if is_el is None:
            return None
        return "".join(el.text or "" for el in is_el.iter(f"{_NS}t"))
    v = c.find(f"{_NS}v")
    if v is None or v.text is None:
        return None
    if t == "s":
        return strings[int(v.text)]
    if t == "b":
        return "True" if v.text == "1" else "False"
    return v.text  # numeric / formula-string: keep raw text


def read_xlsx_rows(path: str, sheet: int | str = 0) -> list[list[str | None]]:
    """Parse one worksheet into a dense list-of-rows (row/cell gaps
    become None), honoring each cell's ``r=`` reference when present."""
    with zipfile.ZipFile(path) as zf:
        strings = _shared_strings(zf)
        data = zf.read(_sheet_member(zf, sheet))
    rows: list[list[str | None]] = []
    for row in ET.fromstring(data).iter(f"{_NS}row"):
        r_idx = int(row.get("r", len(rows) + 1)) - 1
        while len(rows) <= r_idx:
            rows.append([])
        cells = rows[r_idx]
        for c in row.iter(f"{_NS}c"):
            ref = c.get("r")
            i = _col_index(ref) if ref else len(cells)
            while len(cells) <= i:
                cells.append(None)
            cells[i] = _cell_value(c, strings)
    return rows


def read_excel(
    spark: SparkSession, path: str, sheet: int | str = 0
) -> DataFrame:
    """Workbook -> all-string DataFrame + ``_source_row_idx``, the same
    contract as the CSV reader (header row = column names)."""
    try:
        rows = read_xlsx_rows(path, sheet)
    except (zipfile.BadZipFile, KeyError, ET.ParseError) as e:
        raise ValueError(
            f"{path} is not a readable .xlsx workbook (OOXML zip): {e}"
        ) from e
    if not rows:
        raise ValueError(f"{path}: worksheet is empty")
    header = [
        str(h) if h is not None else f"Unnamed: {i}"
        for i, h in enumerate(rows[0])
    ]
    width = len(header)
    body = [
        tuple((r + [None] * width)[:width]) for r in rows[1:]
    ]
    schema = T.StructType(
        [T.StructField(c, T.StringType(), True) for c in header]
    )
    df = spark.createDataFrame(body, schema)
    return df.withColumn(ROW_IDX, F.monotonically_increasing_id())
