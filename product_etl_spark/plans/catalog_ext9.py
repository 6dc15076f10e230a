"""Ninth extension catalog (q142+): the engine-exact k-means step,
data-integrity checksums, repetition/readability text metrics, and the
2-D skyline.

q142 closes the last rows-only hole in the catalog: q93's trained
k-means can't be ANSI-oracled (iterative float refinement), but ONE
Lloyd iteration with exact-decimal arithmetic can — the update RULE is
now driver-checkable while q93 keeps its pytest recall bound. q143 is
the copy-validation gate a 100 TB migration needs (the reference
re-exports CSVs with no verification — ETL.py's csv dumps). q144/q145
extend the Gopher-style quality family (functions/text.py); q146 adds
the multi-objective shortlist (Pareto frontier) operator.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from product_etl_spark.functions import text as T
from product_etl_spark.operators.integrity import group_checksums
from product_etl_spark.operators.similarity import kmeans_one_iter_exact
from product_etl_spark.operators.skyline import skyline_2d
from product_etl_spark.plans.catalog import _t, register


@register(
    "q142_kmeans_one_iter_lists",
    """
    WITH dims AS (
      SELECT e.vec_id, d.pos, CAST(d.val AS DOUBLE) AS val
      FROM embeddings e,
           LATERAL (SELECT unnest(e.embedding) AS val,
                           generate_subscripts(e.embedding, 1) AS pos) d
    ), seeds AS (
      SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS list_id, vec_id
      FROM embeddings ORDER BY vec_id LIMIT 4
    ), sdims AS (
      SELECT s.list_id, d.pos, d.val AS c
      FROM seeds s JOIN dims d ON d.vec_id = s.vec_id
    ), d0 AS (
      SELECT d.vec_id, s.list_id,
             SUM(CAST(ROUND((d.val - s.c) * (d.val - s.c), 9)
                      AS DECIMAL(18,9))) AS dist
      FROM dims d JOIN sdims s ON s.pos = d.pos
      GROUP BY d.vec_id, s.list_id
    ), a0 AS (
      SELECT vec_id, list_id FROM (
        SELECT vec_id, list_id,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY dist, list_id) AS rn
        FROM d0) WHERE rn = 1
    ), c1 AS (
      SELECT a0.list_id, d.pos,
             ROUND(CAST(SUM(CAST(ROUND(d.val, 6) AS DECIMAL(18,6)))
                        AS DOUBLE) / COUNT(*), 9) AS c
      FROM a0 JOIN dims d ON d.vec_id = a0.vec_id
      GROUP BY a0.list_id, d.pos
    ), d1 AS (
      SELECT d.vec_id, c.list_id,
             SUM(CAST(ROUND((d.val - c.c) * (d.val - c.c), 9)
                      AS DECIMAL(18,9))) AS dist
      FROM dims d JOIN c1 c ON c.pos = d.pos
      GROUP BY d.vec_id, c.list_id
    ), a1 AS (
      SELECT vec_id, list_id FROM (
        SELECT vec_id, list_id,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY dist, list_id) AS rn
        FROM d1) WHERE rn = 1
    )
    SELECT list_id, COUNT(*) AS n_vectors, MIN(vec_id) AS min_vec_id
    FROM a1 GROUP BY list_id
    """,
)
def q142_kmeans_one_iter_lists(spark, sf_dir):
    """One engine-exact Lloyd iteration (operators/similarity.
    kmeans_one_iter_exact): seed with the 4 lowest-id vectors, assign
    by exact-decimal L2, recompute per-dimension means (decimal sum
    -> one double division -> ROUND 1e-9), re-assign; surfaced as
    per-list populations — the driver-checkable twin of q93's trained
    multi-iteration path (pytest recall bound), closing the k-means
    family's rows-only hole. Every assignment is integer-decided
    (decimal comparisons), so the oracle replays the iteration
    bit-for-bit.

    Scale shape: both assignments are PURE MAPS (the k centroids fold
    into one broadcast row; argmin = array_min over a transform) — the
    corpus never shuffles at all; the only exchange is the
    (list,pos)-keyed mean update, partial-combined to k*dim rows per
    map task. A/B-measured against two slower shapes at sf0.1
    (crossJoin+groupBy argmin ~2.0 s — exchanges every corpus row
    with its embedding; unrolled literal centroids ~5.4 s — 256
    chained decimal casts defeat codegen); this one runs ~1.5 s."""
    e = _t(spark, sf_dir, "embeddings")
    return (
        kmeans_one_iter_exact(e, "embedding", "vec_id", n_lists=4)
        .groupBy("list_id")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.min("vec_id").alias("min_vec_id"),
        )
    )


@register(
    "q143_order_partition_checksums",
    r"""
    WITH fp AS (
      SELECT o_orderstatus,
             ('0x' || substr(md5(
                COALESCE(REPLACE(REPLACE(CAST(o_orderkey AS VARCHAR),
                  '\', '\\'), chr(31), '\u'), '\N') || chr(31) ||
                COALESCE(REPLACE(REPLACE(CAST(o_custkey AS VARCHAR),
                  '\', '\\'), chr(31), '\u'), '\N') || chr(31) ||
                COALESCE(REPLACE(REPLACE(o_orderstatus,
                  '\', '\\'), chr(31), '\u'), '\N') || chr(31) ||
                COALESCE(REPLACE(REPLACE(CAST(o_totalprice AS VARCHAR),
                  '\', '\\'), chr(31), '\u'), '\N')), 1, 15))::BIGINT AS h
      FROM orders
    )
    SELECT o_orderstatus, COUNT(*) AS n_rows,
           bit_xor(h) AS xor_fp, MIN(h) AS min_fp, MAX(h) AS max_fp
    FROM fp GROUP BY o_orderstatus
    """,
)
def q143_order_partition_checksums(spark, sf_dir):
    """Order-independent per-partition table checksums (operators/
    integrity.group_checksums): row fingerprint = portable md5-derived
    60-bit hash of the canonical column rendering, reduced per
    o_orderstatus group by COUNT + XOR + MIN/MAX — the copy-validation
    gate for a 100 TB migration (source and destination each compute
    their half in ANY md5-capable engine; the oracle IS the
    other-engine half). The reference exports full CSVs with no
    verification step (ETL.py csv dumps).

    Scale shape: ONE groupBy, all four aggregates combine
    associatively map-side; the shuffle carries one row per
    (partition group x map task)."""
    o = _t(spark, sf_dir, "orders")
    return group_checksums(
        o,
        ["o_orderstatus"],
        ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"],
    )


@register(
    "q144_dup_ngram_fraction",
    r"""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split_regex(LOWER(COALESCE(text,'')), '\s+'),
                         x -> x <> '') AS toks
      FROM documents
    ), g AS (
      SELECT doc_id,
             CASE WHEN LEN(toks) < 3 THEN []
                  ELSE [array_to_string(toks[i:i+2], ' ')
                        FOR i IN RANGE(1, LEN(toks) - 1)] END AS grams
      FROM t
    )
    SELECT doc_id, LEN(grams) AS n_grams,
           CASE WHEN LEN(grams) <= 0 THEN 0.0
                ELSE ROUND(1.0 - LEN(list_distinct(grams))::DOUBLE
                           / LEN(grams)::DOUBLE, 4) END AS dup_frac
    FROM g
    ORDER BY dup_frac DESC, doc_id
    LIMIT 100
    """,
)
def q144_dup_ngram_fraction(spark, sf_dir):
    """Duplicate word-3-gram fraction per document (the Gopher/
    RefinedWeb repetition filter one rung above q65's line
    repetition): flags boilerplate/templated text that survives
    line-level dedup. Top-100 most repetitive.

    Scale shape: the ROW-WISE form — total grams is a map-only count
    (tokens - n + 1); distinct grams come from exploded_shingles
    (explode tokens once + n-1 LEAD windows, codegen throughout),
    NOT the array-HOF expression (functions/text.dup_ngram_fraction,
    kept for filter-expression use): higher-order functions are
    interpreted and don't CSE, and the first (array-form) cut of this
    query re-ran the shingle transform 3x per row — 6.8 s at sf0.1 vs
    ~0.6 s for this shape. One doc-keyed count agg reusing the window
    shuffle's partitioning; final top-k is TakeOrderedAndProject.
    Float policy: one integer division per row, ROUND(.,4)."""
    from product_etl_spark.operators.dedup import exploded_shingles

    d = _t(spark, sf_dir, "documents")
    distinct_counts = (
        exploded_shingles(d, "text", "doc_id", n=3)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("_n_distinct"))
    )
    totals = d.select(
        "doc_id",
        F.greatest(
            T.token_count("text") - F.lit(2), F.lit(0)
        ).alias("n_grams"),
    )
    return (
        totals.join(distinct_counts, "doc_id", "left")
        .select(
            "doc_id",
            "n_grams",
            F.when(F.col("n_grams") <= 0, F.lit(0.0))
            .otherwise(
                F.round(
                    F.lit(1.0)
                    - F.coalesce(F.col("_n_distinct"), F.lit(0)).cast(
                        "double"
                    )
                    / F.col("n_grams").cast("double"),
                    4,
                )
            )
            .alias("dup_frac"),
        )
        .orderBy(F.desc("dup_frac"), "doc_id")
        .limit(100)
    )


@register(
    "q145_flesch_readability",
    r"""
    WITH m AS (
      SELECT doc_id, lang,
             GREATEST(LEN(list_filter(
               string_split_regex(COALESCE(text,''), '\s+'),
               x -> x <> '')), 1)::DOUBLE AS n_words,
             GREATEST(LEN(regexp_extract_all(COALESCE(text,''),
               '[.!?]+')), 1)::DOUBLE AS n_sents,
             LEN(regexp_extract_all(LOWER(COALESCE(text,'')),
               '[aeiouy]+')) AS vg,
             LEN(list_filter(
               string_split_regex(COALESCE(text,''), '\s+'),
               x -> x <> '')) AS nw_raw
      FROM documents
    )
    , s AS (
      SELECT lang,
             CAST(ROUND(206.835 - 1.015 * (n_words / n_sents)
                  - 84.6 * (GREATEST(vg, nw_raw)::DOUBLE / n_words), 4)
                  AS DECIMAL(12,4)) AS score
      FROM m
    )
    SELECT lang, COUNT(*) AS n_docs,
           ROUND(CAST(SUM(score) AS DOUBLE) / COUNT(*), 4) AS avg_flesch
    FROM s GROUP BY lang
    """,
)
def q145_flesch_readability(spark, sf_dir):
    """Flesch reading-ease (functions/text.flesch_reading_ease)
    aggregated per language — the readability rung of the quality-
    heuristic family (q28 quality score, q58 Gopher flags): curation
    recipes band corpora by readability to balance difficulty.

    Float policy: per-row score is integer counts through a FIXED
    IEEE op order, rounded 1e-4 and cast to decimal; the per-lang
    mean is an exact DECIMAL sum (order-insensitive) -> one double
    division -> ROUND(.,4) — the repo's reorderable-sum rule (AVG
    over raw doubles would be partition-order-dependent).

    Scale shape: map-only projection + one lang-keyed aggregate."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.select(
            "lang",
            T.flesch_reading_ease("text")
            .cast("decimal(12,4)")
            .alias("score"),
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(
                F.sum("score").cast("double") / F.count(F.lit(1)), 4
            ).alias("avg_flesch"),
        )
    )


@register(
    "q146_part_price_size_skyline",
    """
    WITH pts AS (
      SELECT DISTINCT CAST(p_retailprice AS DOUBLE) AS price, p_size
      FROM part
    )
    SELECT price, p_size
    FROM pts p
    WHERE NOT EXISTS (
      SELECT 1 FROM pts q
      WHERE q.price <= p.price AND q.p_size >= p.p_size
        AND (q.price < p.price OR q.p_size > p.p_size)
    )
    """,
)
def q146_part_price_size_skyline(spark, sf_dir):
    """2-D skyline (operators/skyline.skyline_2d): the Pareto
    frontier of distinct (retail price, size) part points — cheapest
    part at every size level that no other part beats on both axes
    (multi-objective shortlist). The oracle derives the same set via
    the quadratic NOT-EXISTS dominance definition; the Spark plan is
    the sort + running-max window form — two independent derivations
    of one invariant.

    Scale shape: distinct on the value pair (map-side combine), then
    ONE window over the distinct point set (bounded by the value
    space, not the table); the NOT-EXISTS self-join exists only in
    the oracle."""
    p = _t(spark, sf_dir, "part")
    pts = p.select(
        F.col("p_retailprice").cast("double").alias("price"), "p_size"
    )
    return skyline_2d(pts, "price", "p_size")


@register(
    "q147_crossdoc_dup_span_coverage",
    r"""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split_regex(LOWER(COALESCE(text,'')), '\s+'),
                         x -> x <> '') AS toks
      FROM documents
    ), g AS (
      SELECT doc_id, r.i - 1 AS pos,
             array_to_string(toks[r.i:r.i+4], ' ') AS gram
      FROM t, LATERAL (SELECT UNNEST(range(1, LEN(toks) - 3)) AS i) r
      WHERE LEN(toks) >= 5
    ), dupg AS (
      SELECT gram FROM g GROUP BY gram HAVING COUNT(DISTINCT doc_id) >= 2
    ), dp AS (
      SELECT g.doc_id, g.pos FROM g JOIN dupg USING (gram)
    ), isl AS (
      SELECT doc_id, pos,
             CASE WHEN pos > COALESCE(MAX(pos + 4) OVER (
               PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
             THEN 1 ELSE 0 END AS nw
      FROM dp
    ), isl2 AS (
      SELECT doc_id, pos,
             SUM(nw) OVER (PARTITION BY doc_id ORDER BY pos) AS isl_id
      FROM isl
    ), spans AS (
      SELECT doc_id, isl_id, MAX(pos + 4) - MIN(pos) + 1 AS len
      FROM isl2 GROUP BY doc_id, isl_id
    ), cov AS (
      SELECT doc_id, CAST(SUM(len) AS BIGINT) AS covered
      FROM spans GROUP BY doc_id
    )
    SELECT t.doc_id,
           LEN(t.toks) AS n_tokens,
           COALESCE(cov.covered, 0) AS covered,
           CASE WHEN LEN(t.toks) <= 0 THEN 0.0
                ELSE ROUND(COALESCE(cov.covered, 0)::DOUBLE
                           / LEN(t.toks)::DOUBLE, 4)
           END AS coverage
    FROM t LEFT JOIN cov USING (doc_id)
    """,
)
def q147_crossdoc_dup_span_coverage(spark, sf_dir):
    """Cross-document duplicated-span coverage (operators/dedup.
    crossdoc_dup_span_coverage; Lee et al. 2022 exact-substring
    family): per document, the fraction of tokens inside word
    5-grams that appear in >= 2 documents, with overlapping gram
    intervals MERGED (gaps-and-islands), not double-counted — the
    signal that catches documents which are mostly shared boilerplate
    even when no whole document duplicates. Whole-doc dedup (q29),
    within-doc paragraph dedup (q136) and this cross-doc span metric
    are the three rungs of the verbatim-repetition ladder.

    Scale shape: one gram-keyed count (map-side combine; vocab-shaped
    after combine) -> equi-join back -> ONE doc-partitioned window
    over only the DUPLICATED positions. No self-join. At larger n,
    the gram string swaps for text.hash64 with the identical shape.
    """
    from product_etl_spark.operators.dedup import crossdoc_dup_span_coverage

    d = _t(spark, sf_dir, "documents")
    return crossdoc_dup_span_coverage(d, "text", "doc_id", n=5, min_df=2)


@register(
    "q148_price_ks_drift",
    """
    WITH e AS (SELECT CAST(o_totalprice AS DOUBLE) AS v FROM orders
               WHERE o_orderdate < TIMESTAMP '1997-01-01 00:00:00'),
    a AS (SELECT CAST(o_totalprice AS DOUBLE) AS v FROM orders
          WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'),
    st AS (SELECT MIN(v) AS lo, MAX(v) AS hi FROM e),
    eb AS (SELECT CAST(GREATEST(0, LEAST(19,
             FLOOR((v - lo) / ((hi - lo) / 20.0)))) AS INT) AS bin,
           COUNT(*) AS n_expected FROM e, st GROUP BY 1),
    ab AS (SELECT CAST(GREATEST(0, LEAST(19,
             FLOOR((v - lo) / ((hi - lo) / 20.0)))) AS INT) AS bin,
           COUNT(*) AS n_actual FROM a, st GROUP BY 1),
    j AS (SELECT COALESCE(eb.bin, ab.bin) AS bin,
                 COALESCE(eb.n_expected, 0) AS n_expected,
                 COALESCE(ab.n_actual, 0) AS n_actual
          FROM eb FULL OUTER JOIN ab ON ab.bin = eb.bin),
    tot AS (SELECT (SELECT SUM(n_expected) FROM eb)::DOUBLE AS te,
                   (SELECT SUM(n_actual) FROM ab)::DOUBLE AS ta)
    SELECT bin, n_expected, n_actual,
           ROUND(CAST(SUM(n_expected) OVER w AS DOUBLE) / tot.te, 6)
             AS cdf_expected,
           ROUND(CAST(SUM(n_actual) OVER w AS DOUBLE) / tot.ta, 6)
             AS cdf_actual,
           ROUND(ABS(CAST(SUM(n_expected) OVER w AS DOUBLE) / tot.te
                     - CAST(SUM(n_actual) OVER w AS DOUBLE) / tot.ta), 6)
             AS ks_gap
    FROM j CROSS JOIN tot
    WINDOW w AS (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING
                 AND CURRENT ROW)
    """,
)
def q148_price_ks_drift(spark, sf_dir):
    """Binned two-sample Kolmogorov-Smirnov drift (operators/profile.
    ks_drift) between the pre-1997 and 1997+ order-price
    distributions — the CDF-gap complement to q139's PSI on the same
    split (PSI scores per-bin mass symmetric ratios; KS reacts to
    where the cumulative mass sits, catching location shifts PSI
    understates). KS statistic = MAX(ks_gap).

    Scale shape: identical to the PSI — 1-row baseline min/max
    broadcast, one map-side-combined groupBy(bin) per snapshot, one
    window over <= n_bins rows. Float policy: integer cumulative
    counts, ONE double division per CDF, ROUND(.,6) surface."""
    from product_etl_spark.operators.profile import ks_drift

    o = _t(spark, sf_dir, "orders")
    cut = F.lit("1997-01-01 00:00:00").cast("timestamp")
    expected = o.filter(F.col("o_orderdate") < cut).select("o_totalprice")
    actual = o.filter(F.col("o_orderdate") >= cut).select("o_totalprice")
    return ks_drift(expected, actual, "o_totalprice", n_bins=20)


@register(
    "q149_fd_violations",
    """
    SELECT c_nationkey, COUNT(*) AS n_rows,
           COUNT(DISTINCT c_mktsegment) AS n_values
    FROM customer
    GROUP BY c_nationkey
    HAVING COUNT(DISTINCT c_mktsegment) > 1
    """,
)
def q149_fd_violations(spark, sf_dir):
    """Functional-dependency audit (operators/profile.fd_violations):
    nations whose customers span more than one market segment violate
    the (hypothetical) rule nation -> segment — the relational
    data-quality rule-mining primitive next to q39's completeness
    report and q140's k-anonymity gate. Exact integer counts, no
    float surface.

    Scale shape: ONE determinant-keyed groupBy (two-phase distinct
    aggregate); output bounded by the violating-key space."""
    from product_etl_spark.operators.profile import fd_violations

    cu = _t(spark, sf_dir, "customer")
    return fd_violations(cu, ["c_nationkey"], ["c_mktsegment"])


@register(
    "q150_benford_first_digit",
    """
    WITH d AS (
      SELECT CAST(regexp_extract(CAST(o_totalprice AS VARCHAR), '[1-9]')
                  AS INT) AS digit
      FROM orders
      WHERE regexp_extract(CAST(o_totalprice AS VARCHAR), '[1-9]') <> ''
    ), c AS (
      SELECT digit, COUNT(*) AS n FROM d GROUP BY digit
    ), t AS (SELECT SUM(n)::DOUBLE AS tot FROM c)
    SELECT digit, n,
           ROUND(n::DOUBLE / tot, 6) AS obs_frac,
           ROUND(LOG10(1.0 + 1.0 / digit::DOUBLE), 6) AS benford_frac,
           ROUND(ABS(n::DOUBLE / tot
                     - LOG10(1.0 + 1.0 / digit::DOUBLE)), 6) AS abs_dev
    FROM c CROSS JOIN t
    """,
)
def q150_benford_first_digit(spark, sf_dir):
    """Benford first-digit audit (operators/profile.
    benford_first_digit) over order totals: observed first-significant
    -digit fractions vs log10(1+1/d) — the bulk-amount anomaly screen
    for fabricated/truncated numeric feeds (synthetic uniform prices
    deviate loudly, which is itself the finding on this testdata).

    Float policy: one double division per digit + a fixed libm log10
    chain (q138's LN precedent), ROUND(.,6). Scale shape: one
    9-value groupBy (map-side combine), 1-row total broadcast."""
    from product_etl_spark.operators.profile import benford_first_digit

    o = _t(spark, sf_dir, "orders")
    return benford_first_digit(o, "o_totalprice")


@register(
    "q151_user_event_entropy",
    """
    WITH kc AS (
      SELECT user_id, event_type, COUNT(*) AS n
      FROM events GROUP BY user_id, event_type
    ), tot AS (
      SELECT user_id, CAST(SUM(n) AS BIGINT) AS n_events FROM kc
      GROUP BY user_id
    ), terms AS (
      SELECT kc.user_id,
             CAST(ROUND((kc.n::DOUBLE / tot.n_events::DOUBLE)
                  * LN(kc.n::DOUBLE / tot.n_events::DOUBLE), 9)
                  AS DECIMAL(18,9)) AS term
      FROM kc JOIN tot USING (user_id)
    )
    SELECT t.user_id, tot.n_events,
           ROUND(-CAST(SUM(t.term) AS DOUBLE), 4) AS entropy
    FROM terms t JOIN tot USING (user_id)
    GROUP BY t.user_id, tot.n_events
    """,
)
def q151_user_event_entropy(spark, sf_dir):
    """Per-user Shannon entropy of the event-type mix (operators/
    profile.group_entropy): the behavioral-diversity feature (single-
    type users score 0, uniform over k types ln k) and the
    class-balance audit shape for training-mix curation. Each p*ln(p)
    term is a fixed IEEE+libm chain rounded 1e-9 and summed as
    DECIMAL (the reorderable-sum rule — category order is engine-
    arbitrary), negated, ROUND(.,4).

    Scale shape: one (user,type) groupBy + one user groupBy, both
    map-side combined; the per-user total is a user-partitioned
    window over the TYPE-level counts (bounded by the type space per
    user), not a join."""
    from product_etl_spark.operators.profile import group_entropy

    ev = _t(spark, sf_dir, "events")
    return group_entropy(ev, ["user_id"], "event_type")


@register(
    "q152_segment_balance_gini",
    """
    WITH r AS (
      SELECT c_mktsegment, CAST(c_acctbal AS DECIMAL(18,2)) AS x,
             ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                ORDER BY c_acctbal) AS i
      FROM customer
    )
    SELECT c_mktsegment, COUNT(*) AS n,
           CASE WHEN SUM(x) > 0 THEN
             ROUND((2.0 * CAST(SUM(i * x) AS DOUBLE)
                    - (COUNT(*) + 1)::DOUBLE * CAST(SUM(x) AS DOUBLE))
                   / (COUNT(*)::DOUBLE * CAST(SUM(x) AS DOUBLE)), 6)
           END AS gini
    FROM r GROUP BY c_mktsegment
    """,
)
def q152_segment_balance_gini(spark, sf_dir):
    """Gini coefficient of account balances per market segment
    (operators/profile.group_gini) — the concentration/inequality
    audit (one whale customer = one hot partition downstream; one
    dominant source = a skewed training mix). Rank formula
    G = (2*sum(i*x) - (n+1)*sum(x)) / (n*sum(x)) over ascending
    values. ENGINE-EXACT: decimal value/rank-product sums (tie order
    cannot change the sum — equal x contribute equal i*x under any
    permutation of their ranks), one fixed double chain, ROUND(.,6).

    Scale shape: one key-partitioned window (rank within segment) +
    one segment groupBy reusing its exchange; no join."""
    from product_etl_spark.operators.profile import group_gini

    cu = _t(spark, sf_dir, "customer")
    return group_gini(cu, ["c_mktsegment"], "c_acctbal")


@register(
    "q153_mad_balance_outliers",
    """
    WITH v AS (
      SELECT c_nationkey,
             CAST(CASE WHEN c_custkey % 100 = 0 THEN c_acctbal * 100
                       ELSE c_acctbal END AS DECIMAL(18,2)) AS x
      FROM customer
    ), m AS (
      SELECT c_nationkey, x AS med FROM (
        SELECT c_nationkey, x,
               ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY x)
                 AS rn,
               COUNT(*) OVER (PARTITION BY c_nationkey) AS n
        FROM v) WHERE rn = CAST(CEIL(n / 2.0) AS BIGINT)
    ), d AS (
      SELECT v.c_nationkey, v.x, m.med, ABS(v.x - m.med) AS dd
      FROM v JOIN m USING (c_nationkey)
    ), md AS (
      SELECT c_nationkey, dd AS mad FROM (
        SELECT c_nationkey, dd,
               ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY dd)
                 AS rn,
               COUNT(*) OVER (PARTITION BY c_nationkey) AS n
        FROM d) WHERE rn = CAST(CEIL(n / 2.0) AS BIGINT)
    )
    SELECT d.c_nationkey, CAST(d.x AS DOUBLE) AS value,
           CAST(d.med AS DOUBLE) AS med, CAST(md.mad AS DOUBLE) AS mad
    FROM d JOIN md USING (c_nationkey)
    WHERE d.dd > 5.0 * md.mad
    """,
)
def q153_mad_balance_outliers(spark, sf_dir):
    """Robust MAD outliers per nation (operators/profile.mad_outliers)
    over account balances with deterministically PLANTED corruption
    (every 100th customer's balance x100 — the q132/q135/q137
    synthesis pattern): the heavy-tail-safe complement to q126's
    z-scores, whose mean/stddev the planted whales would drag.
    INTEGER-DECIDED lower medians (value at rank ceil(n/2)) on both
    levels — no interpolation arithmetic to diverge across engines;
    the flag predicate compares exact decimals.

    Scale shape: two key-partitioned window passes + key-keyed joins
    of 1-row-per-key medians; every frame is per-key, no global
    sort."""
    from product_etl_spark.operators.profile import mad_outliers

    cu = _t(spark, sf_dir, "customer")
    planted = cu.select(
        "c_nationkey",
        F.when(
            F.col("c_custkey") % 100 == 0, F.col("c_acctbal") * 100
        )
        .otherwise(F.col("c_acctbal"))
        .alias("bal"),
    )
    return mad_outliers(planted, ["c_nationkey"], "bal", k=5.0)


@register(
    "q154_exact_jaccard_join",
    r"""
    WITH t AS (
      SELECT doc_id,
             list_distinct(list_filter(
               string_split_regex(LOWER(COALESCE(text,'')), '\s+'),
               x -> x <> '')) AS s
      FROM documents WHERE doc_id < 300
    ), pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             LEN(list_intersect(a.s, b.s)) AS n_inter,
             LEN(a.s) + LEN(b.s) - LEN(list_intersect(a.s, b.s))
               AS n_union
      FROM t a JOIN t b ON a.doc_id < b.doc_id
      WHERE LEN(list_intersect(a.s, b.s)) > 0
    )
    SELECT id_a, id_b, n_inter, n_union,
           ROUND(n_inter::DOUBLE / n_union::DOUBLE, 4) AS jaccard
    FROM pairs
    WHERE 5 * n_inter >= 3 * n_union
    """,
)
def q154_exact_jaccard_join(spark, sf_dir):
    """EXACT set-similarity self-join at Jaccard >= 3/5 over
    distinct-token sets (operators/dedup.set_similarity_pairs,
    PPJoin-style prefix filtering) — the deterministic complement to
    the MinHash-LSH near-dup path (q31-q33): LSH is probabilistic and
    can miss threshold-grazing pairs; prefix filtering provably
    cannot. The oracle BRUTE-FORCES all shared-token pairs (bounded
    here by the doc_id < 300 block), so result equality is a
    cross-engine proof that the prefix filter loses no pairs. The
    keep decision is the integer cross-multiplication
    5*inter >= 3*union — no float in the predicate.

    Scale shape: token df counts map-side combine; prefix positions
    are per-doc windows; the candidate join keys on PREFIX tokens
    only (rare-first global order suppresses stop-token blowup
    structurally); verification is array_intersect over candidate
    pairs. Never all-pairs in the Spark plan — the O(n^2) join exists
    only in the oracle."""
    from product_etl_spark.operators.dedup import set_similarity_pairs

    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    return set_similarity_pairs(d, "text", "doc_id", 3, 5)


@register(
    "q155_trigram_substring_search",
    """
    SELECT doc_id,
           CAST(strpos(LOWER(COALESCE(text,'')), 'merge batch') AS INT)
             AS first_pos
    FROM documents
    WHERE strpos(LOWER(COALESCE(text,'')), 'merge batch') > 0
    """,
)
def q155_trigram_substring_search(spark, sf_dir):
    """Exact substring search for 'merge batch' accelerated by the
    character-trigram pre-filter (operators/retrieval.
    trigram_contains_search — the pg_trgm recipe): candidates must
    contain EVERY needle trigram (exploded match + count gate), the
    contains verification runs on candidates only. The oracle is the
    brute LIKE scan, so result equality proves the trigram gate
    loses no document. Replaces the reference's full-table
    LIKE '%...%' scans (check_sku_status.py:36-44) with the
    indexable shape.

    Scale shape: the trigram literal set prunes the exploded rows at
    the scan (isin pushdown); the count gate is a map-side-combined
    groupBy; contains() touches candidates only. The exploded
    (trigram, id) frame is the persistable index for repeated
    queries."""
    from product_etl_spark.operators.retrieval import (
        trigram_contains_search,
    )

    d = _t(spark, sf_dir, "documents")
    return trigram_contains_search(d, "text", "doc_id", "merge batch")
