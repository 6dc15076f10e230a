"""Unicode curation normalization (functions/unicode_text.py)."""

from __future__ import annotations

import unicodedata

import pytest
from pyspark.sql import functions as F

from product_etl_spark.functions import unicode_text as UT


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


def test_strip_control_keeps_whitespace(spark):
    got = _one(spark, UT.strip_control_chars(F.lit("a\x01b\tc\nd\x7fe")))
    assert got == "ab\tc\nde"


def test_strip_zero_width(spark):
    got = _one(spark, UT.strip_zero_width(F.lit("a​b‍c﻿d⁠e")))
    assert got == "abcde"


def test_nfc_composes_decomposed_accent(spark):
    got = _one(spark, UT.normalize_unicode(F.lit("café")))
    assert got == "café"
    assert _one(spark, UT.normalize_unicode(F.lit(None).cast("string"))) is None


def test_nfkc_folds_compatibility_forms(spark):
    # ligature fi and fullwidth digit are NFKC-only folds
    got = _one(spark, UT.normalize_unicode(F.lit("ﬁle １"), "NFKC"))
    assert got == "file 1"
    # NFC must NOT fold them
    assert _one(spark, UT.normalize_unicode(F.lit("ﬁ"), "NFC")) == "ﬁ"


def test_unknown_form_rejected():
    with pytest.raises(ValueError):
        UT.normalize_unicode(F.lit("x"), "NFX")


def test_mojibake_fix_and_conservatism(spark):
    mojibake = "cafÃ©"  # 'café' UTF-8 bytes read as latin-1
    assert _one(spark, UT.fix_double_encoded_utf8(F.lit(mojibake))) == "café"
    # clean text without marker bytes is untouched
    assert _one(spark, UT.fix_double_encoded_utf8(F.lit("café"))) == "café"
    # marker present but not valid double-encoding: unchanged
    weird = "Ã☃"  # latin-1-unencodable snowman after marker
    assert _one(spark, UT.fix_double_encoded_utf8(F.lit(weird))) == weird


def test_clean_text_composition_matches_python(spark):
    raw = "He​llo\x01 woŕld"
    expected = unicodedata.normalize(
        "NFC", raw.replace("​", "").replace("\x01", "")
    )
    assert _one(spark, UT.clean_text(F.lit(raw))) == expected


def test_unicode_catalog_matches_oracle(spark, sf_dir):
    from product_etl_spark.plans import CATALOG
    from product_etl_spark.plans.parity import compare

    spec = CATALOG["q135_unicode_clean"]
    ok, msg = compare(spec["fn"](spark, sf_dir), spec["oracle"], sf_dir)
    assert ok, msg
