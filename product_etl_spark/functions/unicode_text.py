"""Unicode text normalization for corpus curation.

Every serious web-text pipeline canonicalizes Unicode before
anything else touches the text (C4, CCNet, Dolma all NFC/NFKC-
normalize): the same visible string otherwise exists in composed and
decomposed forms, which silently breaks exact dedup, shingle hashing,
token counting, and vocabulary building. Scraped HTML additionally
carries zero-width characters, stray C0/C1 controls, and
double-encoded UTF-8 (mojibake).

Reference parity: the reference stores scraped Taobao text verbatim
(`utils/importer/ETL.py` string passthrough) — composed/decomposed
variants of the same product name would be distinct keys there; this
module is the curation-side fix.

Scale shape: the control/zero-width strips are single regexp_replace
expressions (JVM codegen, map-only). Unicode normalization has no
Spark SQL expression (java.text.Normalizer is not exposed), so
``normalize_unicode`` is the documented Arrow-batched pandas-UDF
case — stdlib ``unicodedata`` per batch, no per-row Python overhead
beyond the string op itself. All map-only: cost bounded by the scan.
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

#: C0/C1 control characters except tab/newline/carriage-return.
CONTROL_CLASS = "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]"

#: Zero-width and BOM-ish characters that survive HTML scraping:
#: ZWSP/ZWNJ/ZWJ (200b-200d), word-joiner (2060), BOM/ZWNBSP (feff).
ZERO_WIDTH_CLASS = "[\\u200b-\\u200d\\u2060\\ufeff]"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def strip_control_chars(col: Column | str) -> Column:
    """Remove C0 controls (keeping \\t \\n \\r) and DEL."""
    return F.regexp_replace(_c(col), CONTROL_CLASS, "")


def strip_zero_width(col: Column | str) -> Column:
    """Remove zero-width/joiner/BOM characters."""
    return F.regexp_replace(_c(col), ZERO_WIDTH_CLASS, "")


def normalize_unicode(col: Column | str, form: str = "NFC") -> Column:
    """Unicode-normalize (NFC/NFKC/NFD/NFKD) via an Arrow-batched
    pandas UDF — Spark exposes no normalization expression."""
    if form not in ("NFC", "NFKC", "NFD", "NFKD"):
        raise ValueError(f"unknown normalization form {form!r}")

    @F.pandas_udf("string")
    def _norm(s: pd.Series) -> pd.Series:
        return s.map(
            lambda x: unicodedata.normalize(form, x) if x is not None else None
        )

    return _norm(_c(col))


def fix_double_encoded_utf8(col: Column | str) -> Column:
    """Repair the classic mojibake class where UTF-8 bytes were
    re-decoded as latin-1 ('Ã©' for 'é'): re-encode as latin-1 and
    decode as UTF-8 when that round-trip succeeds, else return the
    input unchanged. Conservative: applied only when the string
    contains a mojibake marker byte (Ã/Â/â), so clean latin-1 text
    ('café') is never touched."""

    @F.pandas_udf("string")
    def _fix(s: pd.Series) -> pd.Series:
        def fix(x):
            if x is None or not any(m in x for m in ("Ã", "Â", "â")):
                return x
            try:
                return x.encode("latin-1").decode("utf-8")
            except (UnicodeEncodeError, UnicodeDecodeError):
                return x

        return s.map(fix)

    return _fix(_c(col))


def clean_text(col: Column | str, form: str = "NFC") -> Column:
    """The standard curation composition: strip controls, strip
    zero-width, Unicode-normalize. (Mojibake repair is opt-in — it
    is heuristic, the rest are exact.)"""
    return normalize_unicode(strip_zero_width(strip_control_chars(col)), form)
