"""Property-based tests (hypothesis) for the parser expressions —
the reference's bug history (IMG_ARRAY_PARSER_FIX_README,
SKU_DOT_ZERO_FIX_README) is exactly the class these catch.

Strategy note: hypothesis drives a pure-Python model; each property
batch is evaluated through Spark in ONE createDataFrame+collect to
keep runtime sane.
"""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from product_etl_spark.functions import (
    extract_urls,
    normalize_decimal,
    parse_attributes,
    strip_sku_dot_zero,
)

# keep unicode but exclude the separators and exotic unicode
# whitespace: the engine's strip is the Java \s class, Python's strip
# is broader (U+2028 etc.) — a definitional gap, not a behavior bug
_JAVA_WS = " \t\n\r\f\x0b"
_blacklist = ":-;\x00\x85\x1c\x1d\x1e\x1f"
_key = st.text(
    alphabet=st.characters(
        blacklist_characters=_blacklist,
        blacklist_categories=("Cs", "Zs", "Zl", "Zp"),
    ),
    min_size=1,
    max_size=8,
).filter(lambda s: s.strip(_JAVA_WS))
_val = st.text(
    alphabet=st.characters(
        blacklist_characters=_blacklist[1:],
        blacklist_categories=("Cs", "Zs", "Zl", "Zp"),
    ),
    min_size=0,
    max_size=12,
)


def _strip(s: str) -> str:
    return s.strip(_JAVA_WS)


def _spark_eval(spark, expr_fn, values):
    df = spark.createDataFrame([(v,) for v in values], "s string")
    return [r["r"] for r in df.select(expr_fn("s").alias("r")).collect()]


@settings(max_examples=20, deadline=None)
@given(st.lists(st.tuples(_key, _val), min_size=1, max_size=5))
def test_parse_attributes_roundtrip(spark, pairs):
    """implode(k:v with '-') -> parse == the pairs (modulo trim +
    last-wins is NOT applied here: parse keeps duplicates)."""
    s = "-".join(f"{k}:{v}" for k, v in pairs)
    [got] = _spark_eval(spark, parse_attributes, [s])
    expected = [
        (_strip(k), _strip(v)) for k, v in pairs if _strip(k)
    ]
    assert [(r["attr_key"], r["attr_value"]) for r in got] == expected


@settings(max_examples=20, deadline=None)
@given(st.lists(st.integers(min_value=1, max_value=10**13), min_size=1, max_size=5))
def test_url_extraction_finds_all(spark, nums):
    urls = [f"https://img.example.com/{n}.jpg" for n in nums]
    s = "junk [" + ", ".join(urls + ["800", "600"]) + "] tail"
    [got] = _spark_eval(spark, extract_urls, [s])
    assert got == urls


@settings(max_examples=20, deadline=None)
@given(st.decimals(min_value=0, max_value=10**10, places=2))
def test_decimal_comma_roundtrip(spark, d):
    """European formatting (1.234,56) normalizes back to the number."""
    euro = f"{d:,.2f}".replace(",", "_").replace(".", ",").replace("_", ".")
    [got] = _spark_eval(spark, normalize_decimal, [euro])
    assert got == d


@settings(max_examples=20, deadline=None)
@given(st.text(alphabet="0123456789.", min_size=1, max_size=12))
def test_sku_strip_model(spark, s):
    """strip_sku_dot_zero removes exactly one trailing '.0' — matches
    the regex model, never the reference's rstrip over-strip."""
    [got] = _spark_eval(spark, strip_sku_dot_zero, [s])
    assert got == re.sub(r"\.0$", "", s)
