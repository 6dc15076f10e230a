"""URL canonicalization / domain extraction (functions/urls.py) and
bigram-PMI collocations (operators/collocations.py)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from product_etl_spark.functions import urls as U
from product_etl_spark.operators.collocations import bigram_pmi


def _norm(spark, raw: str):
    return (
        spark.range(1)
        .select(U.normalize_url(F.lit(raw)).alias("u"))
        .collect()[0]["u"]
    )


def test_normalize_lowercases_scheme_host_keeps_path_case(spark):
    assert (
        _norm(spark, "HTTPS://WWW.Example.COM/Path/File.JPG")
        == "https://www.example.com/Path/File.JPG"
    )


def test_normalize_strips_default_port_keeps_explicit(spark):
    assert _norm(spark, "https://a.example.com:443/x") == "https://a.example.com/x"
    assert _norm(spark, "http://a.example.com:80/x") == "http://a.example.com/x"
    assert (
        _norm(spark, "https://a.example.com:8443/x")
        == "https://a.example.com:8443/x"
    )
    # :443 is only default for https — an http listener on 443 is real
    assert (
        _norm(spark, "http://a.example.com:443/x")
        == "http://a.example.com:443/x"
    )


def test_normalize_drops_fragment_userinfo_trailing_slash(spark):
    assert (
        _norm(spark, "  https://u:pw@Host.Example.com/dl/#sec?notquery  ")
        == "https://host.example.com/dl"
    )


def test_normalize_strips_tracking_and_sorts_params(spark):
    got = _norm(
        spark,
        "https://shop.example.com/item?spm=a21bo.1&b=2&utm_source=x&a=1&fbclid=y",
    )
    assert got == "https://shop.example.com/item?a=1&b=2"


def test_normalize_non_url_is_null(spark):
    assert _norm(spark, "not a url") is None
    assert _norm(spark, "/relative/path") is None


def test_registered_domain_multi_part_suffix(spark):
    rows = (
        spark.createDataFrame(
            [
                ("www.shop.example.com",),
                ("blog.example.co.uk",),
                ("example.com",),
                ("localhost",),
                ("a.b.c.com.au",),
            ],
            ["h"],
        )
        .select(U.registered_domain("h").alias("d"))
        .collect()
    )
    assert [r["d"] for r in rows] == [
        "example.com",
        "example.co.uk",
        "example.com",
        "localhost",
        "c.com.au",
    ]


def test_domain_filter_iterable_and_dataframe(spark):
    df = spark.createDataFrame(
        [
            (1, "https://spam.example.com/a"),
            (2, "https://ok.example.org/b"),
            (3, "https://www.Example.COM/c"),
        ],
        ["id", "url"],
    )
    kept = U.domain_filter(df, "url", ["example.com"])
    assert sorted(r["id"] for r in kept.collect()) == [2]
    block_df = spark.createDataFrame([("EXAMPLE.ORG",)], ["domain"])
    kept2 = U.domain_filter(df, "url", block_df)
    assert sorted(r["id"] for r in kept2.collect()) == [1, 3]
    assert kept2.columns == df.columns  # helper column dropped


def test_bigram_pmi_hand_check(spark):
    # Corpus: "new york" always adjacent (3x); "the" frequent and
    # promiscuous. N1 = 11 tokens, N2 = 8 bigrams.
    docs = spark.createDataFrame(
        [
            (1, "new york the city"),
            (2, "the new york trip"),
            (3, "new york the"),
        ],
        ["doc_id", "text"],
    )
    out = {
        (r["w1"], r["w2"]): r
        for r in bigram_pmi(docs, min_pair_count=2).collect()
    }
    got = out[("new", "york")]
    assert got["n_pair"] == 3
    expected = round(math.log((3 / 8) / ((3 / 11) * (3 / 11))), 4)
    assert got["pmi"] == expected
    # a pair seen once is floored out
    assert ("the", "city") not in got


def test_bigram_pmi_catalog_matches_oracle(spark, sf_dir):
    from product_etl_spark.plans import CATALOG
    from product_etl_spark.plans.parity import compare

    spec = CATALOG["q133_bigram_pmi"]
    ok, msg = compare(spec["fn"](spark, sf_dir), spec["oracle"], sf_dir)
    assert ok, msg


def test_url_catalog_matches_oracle(spark, sf_dir):
    from product_etl_spark.plans import CATALOG
    from product_etl_spark.plans.parity import compare

    spec = CATALOG["q132_url_canonicalization"]
    ok, msg = compare(spec["fn"](spark, sf_dir), spec["oracle"], sf_dir)
    assert ok, msg
