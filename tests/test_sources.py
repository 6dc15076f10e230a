"""Source-layer tests: HTTP fetch stage (retry/backoff/rate limit),
token bucket, mapping loader, excel gate."""

from __future__ import annotations

import pytest

from product_etl_spark.operators.ratelimit import TokenBucket
from product_etl_spark.sources.http_fetch import fetch_urls
from product_etl_spark.sources.mapping import (
    load_mapping,
    projection_for_table,
    translation_fields,
)


def test_token_bucket_paces():
    t = [0.0]
    sleeps = []

    def clock():
        return t[0]

    def sleeper(s):
        sleeps.append(s)
        t[0] += s

    b = TokenBucket(rate=2.0, burst=1.0, clock=clock, sleeper=sleeper)
    for _ in range(5):
        b.acquire()
    # first token free (burst), then 4 waits of ~0.5s at 2/s
    assert len(sleeps) == 4
    assert all(abs(s - 0.5) < 1e-9 for s in sleeps)


def test_fetch_retry_and_failure_recorded(spark):
    urls = spark.createDataFrame(
        [("http://ok/1",), ("http://flaky/2",), ("http://dead/3",)], "url string"
    )

    def fetcher(url: str) -> bytes:
        if "dead" in url:
            raise OSError("always down")
        if "flaky" in url:
            # fails on first attempt of each task run: deterministic by
            # using a file-less trick is impossible across retries, so
            # flaky here means: succeed (the retry loop is covered by
            # the dead URL exhausting attempts)
            return b"flaky-ok"
        return b"payload:" + url.encode()

    out = {
        r["url"]: r
        for r in fetch_urls(
            urls, fetcher, max_attempts=2, backoff_s=0.0, sleeper=lambda s: None
        ).collect()
    }
    assert out["http://ok/1"]["status"] == "ok"
    assert bytes(out["http://ok/1"]["content"]) == b"payload:http://ok/1"
    assert out["http://dead/3"]["status"] == "error"
    assert out["http://dead/3"]["content"] is None
    assert out["http://dead/3"]["n_attempts"] == 2  # retried, then recorded


def test_mapping_loader_and_projection(spark, tmp_path):
    p = tmp_path / "map.csv"
    p.write_text(
        "raw_input_field,db_table,field\n"
        "Master Code,product_collection,master_code\n"
        "SKU Code,product,sku\n"
        "Price,product,selling_price\n"
        "Product Name,product_collection_translations,\n"
    )
    mapping = load_mapping(spark, str(p))
    assert mapping["Master Code"] == {
        "table": "product_collection", "column": "master_code", "type": "text"
    }
    cols = projection_for_table(mapping, "product")
    df = spark.createDataFrame(
        [("963cef", "s1", "10", "名")],
        "`Master Code` string, `SKU Code` string, Price string, `Product Name` string",
    )
    out = df.select(*cols)
    assert set(out.columns) == {"sku", "selling_price"}
    # empty-field rows route to translation sidecars
    assert translation_fields(mapping, "product_collection_translations") == [
        ("Product Name", "product_name")
    ]


def test_excel_rejects_non_workbook(spark, tmp_path):
    from product_etl_spark.sources.excel import read_excel

    fake = tmp_path / "wb.xlsx"
    fake.write_bytes(b"not really an excel file")
    with pytest.raises(ValueError, match="not a readable .xlsx"):
        read_excel(spark, str(fake))


def _write_xlsx(path, sheet_xml, shared=()):
    """Minimal OOXML workbook writer for fixtures (no Excel engine)."""
    import zipfile

    ct = (
        '<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org'
        '/package/2006/content-types"><Default Extension="xml" ContentType='
        '"application/xml"/></Types>'
    )
    wb = (
        '<?xml version="1.0"?><workbook xmlns="http://schemas.openxmlformats'
        '.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats'
        '.org/officeDocument/2006/relationships"><sheets>'
        '<sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets></workbook>'
    )
    rels = (
        '<?xml version="1.0"?><Relationships xmlns="http://schemas.openxml'
        'formats.org/package/2006/relationships"><Relationship Id="rId1" '
        'Type="http://schemas.openxmlformats.org/officeDocument/2006/'
        'relationships/worksheet" Target="worksheets/sheet1.xml"/>'
        "</Relationships>"
    )
    sst = (
        '<?xml version="1.0"?><sst xmlns="http://schemas.openxmlformats.org/'
        'spreadsheetml/2006/main">'
        + "".join(f"<si>{s}</si>" for s in shared)
        + "</sst>"
    )
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("[Content_Types].xml", ct)
        zf.writestr("xl/workbook.xml", wb)
        zf.writestr("xl/_rels/workbook.xml.rels", rels)
        if shared:
            zf.writestr("xl/sharedStrings.xml", sst)
        zf.writestr(
            "xl/worksheets/sheet1.xml",
            '<?xml version="1.0"?><worksheet xmlns="http://schemas.openxml'
            'formats.org/spreadsheetml/2006/main"><sheetData>'
            + sheet_xml
            + "</sheetData></worksheet>",
        )


def test_excel_end_to_end_with_mapping(spark, tmp_path):
    """Dependency-free xlsx read (reference importer_etl.py:31 reads
    the raw workbook with pd.read_excel): shared + rich-text + inline
    strings, raw numerics, booleans, and cell gaps, then the mapping
    projection applied on top — the automapper.py:27 flow."""
    from product_etl_spark.sources.excel import read_excel
    from product_etl_spark.sources.mapping import projection_for_table

    wb = tmp_path / "export.xlsx"
    _write_xlsx(
        wb,
        # header: A=SKU Code  B=Selling Price  C=Note
        '<row r="1">'
        '<c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c>'
        '<c r="C1" t="s"><v>2</v></c></row>'
        # data row: shared string, raw numeric, inline string
        '<row r="2">'
        '<c r="A2" t="s"><v>3</v></c><c r="B2"><v>129.5</v></c>'
        '<c r="C2" t="inlineStr"><is><t>as-is</t></is></c></row>'
        # row 3 skips B entirely (gap -> NULL) + boolean in C
        '<row r="3">'
        '<c r="A3" t="s"><v>4</v></c><c r="C3" t="b"><v>1</v></c></row>',
        shared=[
            "<t>SKU Code</t>",
            "<t>Selling Price</t>",
            "<t>Note</t>",
            "<r><t>SKU-</t></r><r><t>001</t></r>",  # rich text runs
            "<t>SKU-002</t>",
        ],
    )
    df = read_excel(spark, str(wb))
    rows = {r["SKU Code"]: r for r in df.collect()}
    assert set(rows) == {"SKU-001", "SKU-002"}
    assert rows["SKU-001"]["Selling Price"] == "129.5"
    assert rows["SKU-001"]["Note"] == "as-is"
    assert rows["SKU-002"]["Selling Price"] is None
    assert rows["SKU-002"]["Note"] == "True"
    # mapping projection over the workbook, as the automapper does
    mapping = {
        "SKU Code": {"table": "product", "column": "sku"},
        "Selling Price": {"table": "product", "column": "selling_price"},
        "Note": {"table": "", "column": ""},
    }
    out = df.select(*projection_for_table(mapping, "product"))
    assert set(out.columns) == {"sku", "selling_price"}
    assert out.count() == 2


def test_excel_sheet_by_name_and_missing_sheet(spark, tmp_path):
    from product_etl_spark.sources.excel import read_excel

    wb = tmp_path / "one.xlsx"
    _write_xlsx(
        wb,
        '<row r="1"><c r="A1" t="inlineStr"><is><t>h</t></is></c></row>'
        '<row r="2"><c r="A2"><v>7</v></c></row>',
    )
    assert read_excel(spark, str(wb), sheet="Sheet1").collect()[0]["h"] == "7"
    with pytest.raises(ValueError, match="not found"):
        read_excel(spark, str(wb), sheet="Nope")


def test_sentence_split_udtf(spark):
    from pyspark.sql import functions as F

    from product_etl_spark.functions.udtfs import SentenceSplit, register_udtfs

    register_udtfs(spark)
    rows = spark.sql(
        "SELECT * FROM sentence_split('One sentence. Two! Three? ')"
    ).collect()
    assert [(r["sentence"], r["sent_idx"]) for r in rows] == [
        ("One sentence.", 0),
        ("Two!", 1),
        ("Three?", 2),
    ]
    # lateral join usage over a frame
    df = spark.createDataFrame([(1, "A b. C d!")], "id int, text string")
    df.createOrReplaceTempView("udtf_docs")
    out = spark.sql(
        "SELECT d.id, s.sentence FROM udtf_docs d, "
        "LATERAL sentence_split(d.text) s"
    ).collect()
    assert len(out) == 2 and out[0]["id"] == 1


def test_automapper_suggestions(spark, tmp_path):
    from product_etl_spark.sources.automapper import mapping_to_csv, suggest_mapping
    from product_etl_spark.sources.mapping import load_mapping

    raw_cols = [
        "Master Code", "SKU Code", "Price", "Product Name", "Img Array",
        "Inventory", "Collection URL", "Totally Unknown Column",
    ]
    m = suggest_mapping(raw_cols)
    assert m["Master Code"] == {
        "table": "product_collection", "column": "master_code", "confidence": "alias"
    }
    assert m["SKU Code"]["column"] == "sku"
    assert m["Price"]["column"] == "selling_price"
    assert m["Product Name"]["column"] == ""  # routes to translations
    assert m["Totally Unknown Column"]["table"] == ""
    # round-trips through the map.csv loader
    p = tmp_path / "suggested_map.csv"
    p.write_text(mapping_to_csv(m))
    loaded = load_mapping(spark, str(p))
    assert loaded["Master Code"]["column"] == "master_code"


def test_mapping_type_column_dialect(spark, tmp_path):
    """The older 4-column mapping form (importer_etl.py:21-28 /
    automapper.py:17-24): headers `Raw Column,Table,Field,Type`; Type
    drives a try_cast in the projection, defaulting to text."""
    p = tmp_path / "vol - Sheet8.csv"
    p.write_text(
        "Raw Column,Table,Field,Type\n"
        "Master Code,product_collection,master_code,text\n"
        "SKU Code,product,sku,varchar\n"
        "Price,product,selling_price,\"numeric(10,2)\"\n"
        "Stock,product,stock_qty,int\n"
        "Active,product,is_active,boolean\n"
        "Created,product,created_on,date\n"
    )
    mapping = load_mapping(spark, str(p))
    assert mapping["Price"]["type"] == "numeric(10,2)"
    assert mapping["Master Code"]["type"] == "text"

    df = spark.createDataFrame(
        [("s1", "12.50", "7", "true", "2024-03-01"),
         ("s2", "oops", "x", "nope", "not-a-date")],
        "`SKU Code` string, Price string, Stock string, "
        "Active string, Created string",
    )
    out = df.select(*projection_for_table(mapping, "product"))
    types = {f.name: f.dataType.simpleString() for f in out.schema.fields}
    assert types == {
        "sku": "string",
        "selling_price": "decimal(38,12)",
        "stock_qty": "int",
        "is_active": "boolean",
        "created_on": "date",
    }
    rows = {r["sku"]: r for r in out.collect()}
    assert float(rows["s1"]["selling_price"]) == 12.5
    assert rows["s1"]["stock_qty"] == 7 and rows["s1"]["is_active"] is True
    assert str(rows["s1"]["created_on"]) == "2024-03-01"
    # try_cast semantics: bad cells -> NULL, never a job failure
    assert rows["s2"]["selling_price"] is None
    assert rows["s2"]["stock_qty"] is None
    assert rows["s2"]["is_active"] is None
    assert rows["s2"]["created_on"] is None


def test_mapping_type_column_on_new_dialect(spark, tmp_path):
    """A Type column is honored on the 3-column dialect too."""
    p = tmp_path / "map.csv"
    p.write_text(
        "raw_input_field,db_table,field,Type\n"
        "Qty,product,qty,bigint\n"
    )
    mapping = load_mapping(spark, str(p))
    assert mapping["Qty"]["type"] == "bigint"
    df = spark.createDataFrame([("42",)], "Qty string")
    out = df.select(*projection_for_table(mapping, "product"))
    assert out.schema["qty"].dataType.simpleString() == "bigint"
    assert out.collect()[0]["qty"] == 42


def test_mapping_unknown_header_raises(spark, tmp_path):
    p = tmp_path / "bad.csv"
    p.write_text("a,b,c\n1,2,3\n")
    with pytest.raises(ValueError, match="unrecognized mapping header"):
        load_mapping(spark, str(p))
