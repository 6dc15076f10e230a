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


def test_kneser_ney_hand_check(spark):
    """Planted corpus with hand-computed KN values: docs "a b a b"
    and "b a" give pairs (a,b):2 and (b,a):2; each context has
    cw1=2, n_follow=1; each continuation n_cont=1; NB=2, so
    P_kn = (2-0.75)/2 + (0.75*1/2)*(1/2) = 0.8125 for both."""
    from product_etl_spark.operators.collocations import kneser_ney_bigrams

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "b a")], "doc_id long, text string"
    )
    rows = {
        (r["w1"], r["w2"]): r
        for r in kneser_ney_bigrams(docs, top_n=10).collect()
    }
    assert set(rows) == {("a", "b"), ("b", "a")}
    for r in rows.values():
        assert r["pn"] == 2 and r["cw1"] == 2
        assert r["n_follow"] == 1 and r["n_cont"] == 1
        assert r["pkn"] == 0.8125


def test_kneser_ney_probabilities_sum_per_context(spark):
    """For every context w1, sum over OBSERVED w2 of P_kn(w2|w1) must
    be <= 1 (the discount mass withheld funds unseen continuations);
    with every bigram type observed it telescopes to exactly 1."""
    from product_etl_spark.operators.collocations import kneser_ney_bigrams

    # Corpus where both contexts have both continuations observed:
    # aa ab ba bb all present -> interpolated KN sums to 1 exactly.
    docs = spark.createDataFrame(
        [(1, "a a b b a b b a a b")], "doc_id long, text string"
    )
    rows = kneser_ney_bigrams(docs, top_n=10).collect()
    by_ctx: dict[str, float] = {}
    for r in rows:
        by_ctx[r["w1"]] = by_ctx.get(r["w1"], 0.0) + r["pkn"]
    for w1, s in by_ctx.items():
        assert abs(s - 1.0) < 1e-9, (w1, s)


def test_zipf_fit_perfect_curve(spark):
    """freq exactly proportional to 1/rank (6, 3, 2) makes ln-ln OLS
    a perfect line: slope -1, r2 1 (up to the 1e-9 term rounding)."""
    from product_etl_spark.operators.collocations import zipf_fit

    text = " ".join(["aa"] * 6 + ["bb"] * 3 + ["cc"] * 2)
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    row = zipf_fit(docs, top_n=100).collect()[0]
    assert row["n_pts"] == 3 and row["vocab"] == 3
    assert abs(row["slope"] + 1.0) < 1e-6
    assert row["r2"] > 0.999999
    # intercept is ln(6): rank-1 frequency
    import math

    assert abs(row["intercept"] - math.log(6.0)) < 1e-6


def test_zipf_fit_flat_corpus_low_r2(spark):
    """A uniform (templated) vocabulary is NOT Zipfian: slope near 0.
    This is the quality-fingerprint direction the operator exists
    for — flat curves flag machine-generated text."""
    from product_etl_spark.operators.collocations import zipf_fit

    text = " ".join([f"w{i}" for i in range(20)] * 5)
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    row = zipf_fit(docs, top_n=100).collect()[0]
    assert row["n_pts"] == 20
    assert row["slope"] == 0.0  # all counts equal -> zero covariance


def test_heaps_fit_perfect_power_law(spark):
    """Cumulative (tokens, vocab) planted at (2,2),(4,4),(8,8),(16,16)
    -> V = n^1 exactly: beta 1, intercept 0, r2 1."""
    from product_etl_spark.operators.collocations import heaps_fit

    docs = spark.createDataFrame(
        [
            (1, "a1 a2"),
            (2, "b1 b2"),
            (3, "c1 c2 c3 c4"),
            (4, "d1 d2 d3 d4 d5 d6 d7 d8"),
        ],
        "doc_id long, text string",
    )
    row = heaps_fit(docs, n_buckets=4).collect()[0]
    assert row["n_pts"] == 4
    assert row["total_tokens"] == 16 and row["total_vocab"] == 16
    assert abs(row["beta"] - 1.0) < 1e-6
    assert abs(row["intercept"]) < 1e-6
    assert row["r2"] > 0.999999


def test_heaps_fit_saturated_vocab(spark):
    """A closed vocabulary (every word already seen in the first
    prefix) has constant V -> zero variance -> beta 0 by the
    degenerate guard, the signal the fingerprint exists for."""
    from product_etl_spark.operators.collocations import heaps_fit

    docs = spark.createDataFrame(
        [(i, "same words every time") for i in range(1, 9)],
        "doc_id long, text string",
    )
    row = heaps_fit(docs, n_buckets=4).collect()[0]
    assert row["total_vocab"] == 4
    assert row["beta"] == 0.0 and row["r2"] == 0.0


def test_heaps_fit_small_corpus_clamps_buckets(spark):
    """A corpus with fewer documents than n_buckets clamps to one
    bucket per doc with CONTIGUOUS ids (ADVICE r11: the unclamped
    formula produced sparse ids like 1,3,5,... and silently degraded
    the equal-width-prefix contract). Two docs under n_buckets=10
    must behave exactly like n_buckets=2."""
    from product_etl_spark.operators.collocations import heaps_fit

    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a b c d")],
        "doc_id long, text string",
    )
    big = heaps_fit(docs, n_buckets=10).collect()[0]
    two = heaps_fit(docs, n_buckets=2).collect()[0]
    assert big == two
    assert big["n_pts"] == 2
    assert big["total_tokens"] == 6 and big["total_vocab"] == 4


def test_kneser_ney_score_backoff_ladder(spark):
    """All three backoff branches hand-checked on a planted split.
    Train: 'a b' x2 + 'a c' -> pairs (a,b):2,(a,c):1; cw1(a)=3,
    nf(a)=2; ncont(b)=ncont(c)=1; NB=2."""
    import math

    from product_etl_spark.operators.collocations import kneser_ney_score

    train = spark.createDataFrame(
        [(10, "a b"), (11, "a b"), (12, "a c")],
        "doc_id long, text string",
    )
    test = spark.createDataFrame(
        [(1, "a b"), (2, "a z"), (3, "z b")],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in kneser_ney_score(train, test, "text", "doc_id").collect()
    }
    # seen bigram: (2-.75)/3 + ((.75*2)/3)*(1/2)
    p1 = (2 - 0.75) / 3.0 + ((0.75 * 2) / 3.0) * (1 / 2)
    # seen context only: lambda(a) * add-one continuation of z
    p2 = ((0.75 * 2) / 3.0) * ((0 + 1) / (2 + 1))
    # unseen context: add-one continuation of b
    p3 = (1 + 1) / (2 + 1)
    assert rows[1]["avg_nll"] == round(round(-math.log(p1), 9), 4)
    assert rows[2]["avg_nll"] == round(round(-math.log(p2), 9), 4)
    assert rows[3]["avg_nll"] == round(round(-math.log(p3), 9), 4)
    assert all(r["n_bigrams"] == 1 for r in rows.values())


def test_unseen_vocabulary_hand_check(spark):
    """'a a b c': V=3, N=4, f1=2, f2=1 -> chao1 = 3 + 2*1/(2*2) = 3.5,
    Good-Turing p0 = 2/4."""
    from product_etl_spark.operators.collocations import (
        unseen_vocabulary_estimate,
    )

    docs = spark.createDataFrame(
        [(1, "a a b c")], "doc_id long, text string"
    )
    r = unseen_vocabulary_estimate(docs).collect()[0]
    assert r["vocab"] == 3 and r["total_tokens"] == 4
    assert r["f1"] == 2 and r["f2"] == 1
    assert r["chao1"] == 3.5
    assert r["good_turing_p0"] == 0.5


def test_unseen_vocabulary_closed_corpus(spark):
    """No singletons -> nothing unseen: chao1 = V exactly and p0 = 0
    (the f2+1 bias correction keeps the division finite)."""
    from product_etl_spark.operators.collocations import (
        unseen_vocabulary_estimate,
    )

    docs = spark.createDataFrame(
        [(1, "x y x y x y")], "doc_id long, text string"
    )
    r = unseen_vocabulary_estimate(docs).collect()[0]
    assert r["f1"] == 0 and r["chao1"] == 2.0
    assert r["good_turing_p0"] == 0.0
