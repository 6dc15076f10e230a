"""Seventh extension catalog (q132+): web-curation and CDC additions —
URL canonicalization / registrable-domain extraction, bigram-PMI
collocation mining, changelog (CDC) snapshot application, and Unicode
text normalization.

Reference parity note: the reference ETL downloads scraped image and
product URLs verbatim (`1_image_extractor_from_html.py`,
`db_orchestrator.py` download paths) — differently-tracked URLs for
the same resource are re-fetched — and applies change feeds
row-at-a-time through psycopg2 upserts/deletes. q132 is the URL
canonicalizer, q134 the set-based changelog apply, q135 the Unicode
canonicalization its verbatim string storage lacks; q133 extends the
text-analysis family with the Church–Hanks collocation statistic.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from product_etl_spark.functions import unicode_text as UT
from product_etl_spark.functions import urls as U
from product_etl_spark.operators.changelog import apply_changelog
from product_etl_spark.operators.collocations import bigram_pmi
from product_etl_spark.plans.catalog import _t, dec, register


@register(
    "q132_url_canonicalization",
    """
    SELECT p_partkey,
           CASE p_partkey % 4
             WHEN 0 THEN 'https://www.shop.example.com/item/'
                         || p_partkey || '?a=1&b=2'
             WHEN 1 THEN 'http://blog.example.co.uk/post/' || p_partkey
             WHEN 2 THEN 'https://cdn.imghost.net/' || p_partkey || '.jpg'
             ELSE 'https://mirror.example.com:8443/dl?v=' || p_partkey % 7
           END AS canon_url,
           CASE p_partkey % 4
             WHEN 1 THEN 'example.co.uk'
             WHEN 2 THEN 'imghost.net'
             ELSE 'example.com'
           END AS domain
    FROM part WHERE p_partkey < 400
    """,
)
def q132_url_canonicalization(spark, sf_dir):
    """URL canonicalization + registrable domain over messy crawl
    URLs (mixed-case scheme/host, default and non-default ports,
    userinfo, tracking params incl. Alibaba's spm, fragments,
    trailing slashes) synthesized deterministically from part — the
    q22 precedent. The ORACLE does not re-implement the normalizer:
    it CONSTRUCTS the expected canonical string per bucket by hand,
    so the two sides are independent derivations.

    Scale shape: map-only codegen expressions (regexp/split/array),
    no shuffle, no Python — cost bounded by the scan.
    """
    p = _t(spark, sf_dir, "part")
    k = F.col("p_partkey")
    raw = p.filter(k < 400).select(
        "p_partkey",
        F.when(
            k % 4 == 0,
            F.concat(
                F.lit("HTTPS://WWW.Shop.Example.COM:443/item/"),
                k.cast("string"),
                F.lit("/?spm=a21bo.1&b=2&a=1#frag"),
            ),
        )
        .when(
            k % 4 == 1,
            F.concat(
                F.lit("http://Blog.Example.CO.UK:80/post/"),
                k.cast("string"),
                F.lit("/"),
            ),
        )
        .when(
            k % 4 == 2,
            F.concat(
                F.lit("https://cdn.imghost.net/"),
                k.cast("string"),
                F.lit(".jpg?utm_campaign=x&utm_source=feed"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit("https://user:pw@Mirror.Example.com:8443/dl?fbclid=abc&v="),
                (k % 7).cast("string"),
            )
        )
        .alias("raw_url"),
    )
    return raw.select(
        "p_partkey",
        U.normalize_url("raw_url").alias("canon_url"),
        U.url_registered_domain("raw_url").alias("domain"),
    )


@register(
    "q133_bigram_pmi",
    r"""
    WITH tok AS (
      SELECT doc_id,
             list_filter(string_split_regex(LOWER(COALESCE(text,'')), '\s+'),
                         x -> x <> '') AS toks
      FROM documents
    ),
    bb AS (
      SELECT b.w1 AS w1, b.w2 AS w2
      FROM (
        SELECT UNNEST(CASE WHEN LEN(toks) < 2 THEN []
                 ELSE [struct_pack(w1 := toks[i], w2 := toks[i+1])
                       FOR i IN RANGE(1, LEN(toks))] END) AS b
        FROM tok
      )
    ),
    flat AS (SELECT UNNEST(toks) AS tk FROM tok),
    pairs AS (SELECT w1, w2, COUNT(*) AS n_pair FROM bb GROUP BY w1, w2
              HAVING COUNT(*) >= 10),
    uni AS (SELECT tk, COUNT(*) AS n_tok FROM flat GROUP BY tk),
    tot AS (SELECT (SELECT COUNT(*) FROM flat)::DOUBLE AS n1_total,
                   (SELECT COUNT(*) FROM bb)::DOUBLE AS n2_total)
    SELECT p.w1, p.w2, p.n_pair,
           ROUND(LN((p.n_pair::DOUBLE / t.n2_total)
                    / ((ux.n_tok::DOUBLE / t.n1_total)
                       * (uy.n_tok::DOUBLE / t.n1_total))), 4) AS pmi
    FROM pairs p
    JOIN uni ux ON ux.tk = p.w1
    JOIN uni uy ON uy.tk = p.w2
    CROSS JOIN tot t
    ORDER BY pmi DESC, p.w1, p.w2
    LIMIT 30
    """,
)
def q133_bigram_pmi(spark, sf_dir):
    """Top-30 adjacent-word collocations by PMI (Church–Hanks) over
    documents — the phrase-mining pass of a tokenizer/vocabulary
    pipeline (word2vec's phrase detector is thresholded PMI).

    Scale shape in operators/collocations.py: vocabulary-bounded
    count shuffles, min-count floor before the joins, 1-row totals
    broadcast; top-30 is TakeOrderedAndProject. Float policy matches
    q113: fixed double operation order, ROUND(.,4) at the surface,
    ordering on the rounded value with (w1, w2) tie-breaks.
    """
    d = _t(spark, sf_dir, "documents")
    return (
        bigram_pmi(d, "text", "doc_id", min_pair_count=10)
        .orderBy(F.desc("pmi"), "w1", "w2")
        .limit(30)
    )


@register(
    "q134_changelog_snapshot",
    """
    WITH log AS (
      SELECT l_orderkey, l_linenumber AS v,
             CASE WHEN (l_orderkey + l_linenumber) % 17 = 0 THEN 'D'
                  WHEN l_linenumber = 1 THEN 'I' ELSE 'U' END AS op,
             CAST(l_quantity AS DECIMAL(18,2)) AS qty,
             CAST(l_extendedprice AS DECIMAL(18,2)) AS price
      FROM lineitem
    ),
    agg AS (
      -- struct MAX, not arg_max: (l_orderkey, l_linenumber) is NOT
      -- unique in this testdata, and arg_max ties are engine-
      -- arbitrary; lexicographic struct comparison (v, op, qty,
      -- price) is the same total order Spark's max-struct uses.
      SELECT l_orderkey,
             MAX(struct_pack(v := v, op := op, qty := qty,
                             price := price)) AS s
      FROM log GROUP BY l_orderkey
    )
    SELECT l_orderkey, CAST(s.qty AS DOUBLE) AS qty,
           CAST(s.price AS DOUBLE) AS price
    FROM agg WHERE s.op <> 'D'
    """,
)
def q134_changelog_snapshot(spark, sf_dir):
    """CDC changelog application (operators/changelog.py): lineitem
    reinterpreted as a change feed — key l_orderkey, version
    l_linenumber (NOT unique per key in this testdata; ties resolve
    by the struct's lexicographic total order, identical in both
    engines), op derived deterministically from the row (every 17th
    (key+version) is a delete). The snapshot is the highest-version
    payload per key, with keys whose final op is a delete absent —
    the set-based replacement for the reference's row-at-a-time
    psycopg2 upsert/delete loops.

    Scale shape: ONE max-struct groupBy (partial agg map-side), no
    window, no join; the oracle's struct MAX mirrors the same
    lexicographic total order.
    """
    li = _t(spark, sf_dir, "lineitem")
    log = li.select(
        "l_orderkey",
        F.col("l_linenumber").alias("version"),
        F.when((F.col("l_orderkey") + F.col("l_linenumber")) % 17 == 0, "D")
        .when(F.col("l_linenumber") == 1, "I")
        .otherwise("U")
        .alias("op"),
        dec("l_quantity").alias("qty"),
        dec("l_extendedprice").alias("price"),
    )
    snap = apply_changelog(log, ["l_orderkey"])
    # Result-surface boundary: decimals stay exact inside the
    # changelog apply; the comparison surface is DOUBLE so both
    # engines stringify identically (same recipe as q105, r5).
    return snap.select(
        "l_orderkey",
        F.col("qty").cast("double").alias("qty"),
        F.col("price").cast("double").alias("price"),
    )


@register(
    "q135_unicode_clean",
    """
    SELECT p_partkey,
           p_name || ' ' || chr(233) AS cleaned,
           LENGTH(p_name || ' ' || chr(233)) AS n_chars
    FROM part WHERE p_partkey < 500
    """,
)
def q135_unicode_clean(spark, sf_dir):
    """Unicode curation canonicalization (functions/unicode_text.py):
    deterministically messy text built from part — a zero-width space,
    a C0 control, and a DECOMPOSED accent ('e' + U+0301) — cleaned by
    strip-controls + strip-zero-width + NFC. The oracle CONSTRUCTS
    the expected composed string independently (p_name || ' ' ||
    chr(233)) rather than re-running a normalizer, so the two sides
    are independent derivations (the q132 pattern).

    Scale shape: strips are codegen regexp_replace; NFC is the
    documented Arrow-batched pandas UDF (Spark exposes no
    normalization expression). Map-only, bounded by the scan.
    """
    p = _t(spark, sf_dir, "part")
    raw = p.filter(F.col("p_partkey") < 500).select(
        "p_partkey",
        F.concat(
            F.col("p_name"),
            # ZWSP + space + C0 control + DECOMPOSED e-acute
            F.lit("\u200b \x01e\u0301"),
        ).alias("raw"),
    )
    return raw.select(
        "p_partkey",
        UT.clean_text("raw").alias("cleaned"),
        F.length(UT.clean_text("raw")).alias("n_chars"),
    )


@register(
    "q136_within_doc_paragraph_dedup",
    r"""
    WITH tok AS (
      SELECT doc_id,
             list_filter(string_split_regex(COALESCE(text,''), '\s+'),
                         x -> x <> '') AS t
      FROM documents
    ),
    ab AS (
      SELECT doc_id,
             array_to_string(t[1:8], ' ') AS a,
             array_to_string(t[9:16], ' ') AS b
      FROM tok WHERE LEN(t) >= 16
    )
    SELECT doc_id,
           CASE WHEN a = b THEN a
                ELSE a || chr(10) || chr(10) || b END AS text,
           CASE WHEN a = b THEN 1 ELSE 2 END AS n_paragraphs_kept
    FROM ab
    """,
)
def q136_within_doc_paragraph_dedup(spark, sf_dir):
    """Within-document paragraph dedup (Dolma policy; operators/
    dedup.dedup_paragraphs_within_doc): three-paragraph documents
    A\\n\\nB\\n\\nA synthesized deterministically from each doc's
    tokens (first 8 words / next 8 words) — the engine must drop the
    repeated trailing A while preserving order, collapsing further
    to one paragraph when A happens to equal B. The oracle CONSTRUCTS
    the expected text per row (the q132/q135 independent-derivation
    pattern) — it never runs a dedup.

    Scale shape: paragraphs as rows, min(pos) first-occurrence agg
    (no window), one ordered reassembly agg — both shuffles keyed on
    doc(+paragraph), uniform.
    """
    from product_etl_spark.functions import text as T
    from product_etl_spark.operators.dedup import dedup_paragraphs_within_doc

    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", T.tokens("text").alias("t")
    ).filter(F.size("t") >= 16)
    a = F.array_join(F.slice("t", 1, 8), " ")
    b = F.array_join(F.slice("t", 9, 8), " ")
    synth = toks.select(
        "doc_id",
        F.concat(a, F.lit("\n\n"), b, F.lit("\n\n"), a).alias("text"),
    )
    return dedup_paragraphs_within_doc(synth, "text", "doc_id")
