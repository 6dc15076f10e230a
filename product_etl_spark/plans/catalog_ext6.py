"""Sixth extension catalog (q122+): corpus-curation additions —
quality-aware canonical selection, fuzzy (MinHash-LSH)
decontamination — plus SQL-surface completions (GROUPING SETS,
equi-width histograms, per-group z-score outliers).

Reference parity note: these extend the training-data operator
families (SURVEY §2 LLM-pipeline section); the reference ETL's
analog is its dedup/cleanup passes (utils/importer + maintenance
scripts), re-expressed as declarative Spark plans.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from product_etl_spark.operators import dedup as D
from product_etl_spark.operators.decontam import fuzzy_contaminated_ids
from product_etl_spark.operators.langid import (
    classify_char_ngram,
    langid_confusion_oracle_sql,
    train_char_ngram_profiles,
)
from product_etl_spark.plans.catalog import _t, dec, register

# Prefix-blocking cluster key: md5 of the first 8 normalized tokens.
# The corpus has no byte-exact duplicates (q29's fingerprint groups
# are all singletons), but its planted near-duplicates share
# prefixes — and prefix blocking is itself a standard curation
# clustering key. Tokenization matches the shingle recipe
# (lower, split \\s+, drop empties) so both engines agree.
_PFX_FP_SQL = (
    r"md5(array_to_string((list_filter(string_split_regex("
    r"LOWER(COALESCE(text,'')), '\s+'), x -> x <> ''))[1:8], ' '))"
)


@register(
    "q122_quality_canonical_dedup",
    f"""
    WITH fp AS (
      SELECT doc_id,
             CAST(LENGTH(COALESCE(text, '')) AS BIGINT) AS len,
             {_PFX_FP_SQL} AS fingerprint
      FROM documents
    ),
    ranked AS (
      SELECT fingerprint, doc_id, len,
             ROW_NUMBER() OVER (PARTITION BY fingerprint
                                ORDER BY len DESC, doc_id ASC) AS rn,
             COUNT(*) OVER (PARTITION BY fingerprint) AS n_members
      FROM fp
    )
    SELECT fingerprint, n_members, doc_id AS canonical_id,
           len AS canonical_quality
    FROM ranked WHERE rn = 1 AND n_members >= 2
    """,
)
def q122_quality_canonical_dedup(spark, sf_dir):
    """Quality-aware canonical selection over prefix-blocked
    duplicate clusters (operators/dedup.canonical_by_quality): keep
    the LONGEST member of each 8-token-prefix cluster, not the lowest
    id — the curation rule real pipelines use (the fullest copy
    survives).

    Scale shape: one hash shuffle on the cluster key with a
    min-struct agg (map-side combinable) — no window, no sort; the
    oracle's ROW_NUMBER is the semantic spec, not the plan."""
    d = _t(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(F.lower(F.coalesce(F.col("text"), F.lit(""))), r"\s+"),
        lambda x: x != "",
    )
    fp = d.select(
        "doc_id",
        F.length(F.coalesce(F.col("text"), F.lit(""))).alias("len"),
        F.md5(F.array_join(F.slice(toks, 1, 8), " ")).alias("fingerprint"),
    )
    return D.canonical_by_quality(
        fp, "fingerprint", "doc_id", "len", min_members=2
    )


@register(
    "q123_fuzzy_decontam",
    r"""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split_regex(LOWER(COALESCE(text,'')), '\s+'),
                         x -> x <> '') AS toks
      FROM documents
    ),
    sh_arr AS (
      SELECT doc_id,
             list_distinct(CASE WHEN LEN(toks) < 2 THEN []
                  ELSE [array_to_string(toks[i:i+1], ' ')
                        FOR i IN RANGE(1, LEN(toks))] END) AS sh
      FROM t
    ),
    s AS (
      SELECT doc_id,
             ('0x' || substr(md5(UNNEST(sh)), 1, 15))::BIGINT % 2147483647 AS hv
      FROM sh_arr
    ),
    sig AS (
      SELECT doc_id, {MINHASH_COLS}
      FROM s GROUP BY doc_id
    ),
    bands AS (
      SELECT doc_id, 0 AS band, md5(h0::VARCHAR || '|' || h1::VARCHAR) AS bh FROM sig
      UNION ALL SELECT doc_id, 1, md5(h2::VARCHAR || '|' || h3::VARCHAR) FROM sig
      UNION ALL SELECT doc_id, 2, md5(h4::VARCHAR || '|' || h5::VARCHAR) FROM sig
      UNION ALL SELECT doc_id, 3, md5(h6::VARCHAR || '|' || h7::VARCHAR) FROM sig
    )
    SELECT t.doc_id, COUNT(DISTINCT e.doc_id) AS n_bench_matches
    FROM bands t
    JOIN bands e ON t.band = e.band AND t.bh = e.bh
    JOIN documents dt ON dt.doc_id = t.doc_id AND dt.source <> 'src0'
    JOIN documents de ON de.doc_id = e.doc_id AND de.source = 'src0'
    GROUP BY t.doc_id
    """,
)
def q123_fuzzy_decontam(spark, sf_dir):
    """FUZZY benchmark decontamination
    (operators/decontam.fuzzy_contaminated_ids): train docs (source
    != src0) whose MinHash-LSH bands collide with any benchmark doc
    (source = src0) — catches paraphrased contamination the exact
    5-gram probe (q112) misses. Benchmark bands broadcast; the train
    corpus pays one signature shuffle, never a self-join."""
    d = _t(spark, sf_dir, "documents")
    train = d.filter(F.col("source") != "src0")
    bench = d.filter(F.col("source") == "src0")
    return fuzzy_contaminated_ids(train, bench, "text", "doc_id")


# Patch the minhash columns into the q123 oracle after registration
# (the literal braces in the r-string can't be f-string-interpolated
# without escaping every regex brace).
from product_etl_spark.plans.catalog import CATALOG as _CAT  # noqa: E402

_MINHASH_COLS = ",\n             ".join(
    "MIN((%d * hv + %d) %% 2147483647) AS h%d" % (a, b, i)
    for i, (a, b) in enumerate(D.minhash_params(8))
)
_CAT["q123_fuzzy_decontam"]["oracle"] = _CAT["q123_fuzzy_decontam"][
    "oracle"
].replace("{MINHASH_COLS}", _MINHASH_COLS)


@register(
    "q124_grouping_sets",
    """
    SELECT c_mktsegment, o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS revenue,
           GROUPING(c_mktsegment) AS g_seg,
           GROUPING(o_orderstatus) AS g_status
    FROM orders JOIN customer ON c_custkey = o_custkey
    GROUP BY GROUPING SETS ((c_mktsegment, o_orderstatus),
                            (c_mktsegment), (o_orderstatus))
    """,
)
def q124_grouping_sets(spark, sf_dir):
    """Irregular GROUPING SETS — the multi-granularity aggregate
    rollup (q41) and cube (q42) can't express: (seg,status), (seg),
    (status) but NOT the grand total. Catalyst compiles this to ONE
    Expand + one shuffle (rows replicated per set, partial-aggregated
    map-side) — not three scans — which is the 100 TB shape.
    GROUPING() flags disambiguate real NULLs from aggregate rows on
    both engines."""
    o, c = _t(spark, sf_dir, "orders", "customer")
    _ = o, c  # views registered by _t
    return spark.sql(
        """
        SELECT c_mktsegment, o_orderstatus,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS revenue,
               CAST(GROUPING(c_mktsegment) AS TINYINT) AS g_seg,
               CAST(GROUPING(o_orderstatus) AS TINYINT) AS g_status
        FROM orders JOIN customer ON c_custkey = o_custkey
        GROUP BY GROUPING SETS ((c_mktsegment, o_orderstatus),
                                (c_mktsegment), (o_orderstatus))
        """
    )


@register(
    "q125_price_histogram",
    """
    WITH bounds AS (
      SELECT MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi FROM orders
    )
    SELECT CAST(LEAST(19, FLOOR((o_totalprice - lo) * 20.0
                                / (hi - lo))) AS INT) AS bucket,
           COUNT(*) AS n_orders,
           ROUND(MIN(o_totalprice), 2) AS bucket_min,
           ROUND(MAX(o_totalprice), 2) AS bucket_max
    FROM orders CROSS JOIN bounds
    GROUP BY 1
    """,
)
def q125_price_histogram(spark, sf_dir):
    """Equi-width 20-bucket histogram of order totals. The global
    min/max is a scalar aggregate broadcast back (1-row cross join —
    never a shuffle of the fact side); bucketing is then a pure map
    and the histogram one tiny 20-key aggregation. Each arithmetic
    step ((x-lo), *20, /(hi-lo), floor) is a single correctly-rounded
    IEEE op from identical inputs, so bucket boundaries are
    engine-exact."""
    o = _t(spark, sf_dir, "orders")
    bounds = o.agg(
        F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi")
    )
    return (
        o.crossJoin(F.broadcast(bounds))
        .select(
            F.least(
                F.lit(19),
                F.floor(
                    (F.col("o_totalprice") - F.col("lo"))
                    * F.lit(20.0)
                    / (F.col("hi") - F.col("lo"))
                ),
            )
            .cast("int")
            .alias("bucket"),
            "o_totalprice",
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.min("o_totalprice"), 2).alias("bucket_min"),
            F.round(F.max("o_totalprice"), 2).alias("bucket_max"),
        )
    )


@register(
    "q126_balance_outliers",
    """
    WITH m AS (
      SELECT c_nationkey,
             COUNT(*) AS n,
             SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS sx,
             SUM(CAST(c_acctbal AS DECIMAL(18,2))
                 * CAST(c_acctbal AS DECIMAL(18,2))) AS sxx
      FROM customer GROUP BY c_nationkey
    ),
    stats AS (
      SELECT c_nationkey,
             CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
             SQRT((CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
                     / CAST(n AS DOUBLE))
                  / (CAST(n AS DOUBLE) - 1.0)) AS sd
      FROM m WHERE n > 1
    )
    SELECT c.c_custkey, c.c_nationkey, c.c_acctbal,
           ROUND((c.c_acctbal - s.mean) / s.sd, 6) AS z
    FROM customer c JOIN stats s ON s.c_nationkey = c.c_nationkey
    WHERE ABS(c.c_acctbal - s.mean) > 1.5 * s.sd
    """,
)
def q126_balance_outliers(spark, sf_dir):
    """Per-nation z-score outliers (|z| > 1.5; the balances are
    uniform, where |z| is bounded by sqrt(3)~1.73, so a 2-sigma cut
    would be vacuous) in customer balances —
    the data-quality anomaly-detection family. Moments are EXACT
    decimal sums (the q102 recipe: order-insensitive, engine-exact);
    the mean/sd conversion and the z comparison are identical
    correctly-rounded IEEE ops on both engines, so the outlier SET
    (a boolean on doubles) matches bit-for-bit. Plan: one partial-
    aggregated shuffle for the 25-row stats frame, broadcast back
    onto the fact — the fact side never sorts or windows."""
    c = _t(spark, sf_dir, "customer")
    x = dec("c_acctbal")
    m = c.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(x * x).alias("sxx"),
    )
    nd = F.col("n").cast("double")
    sx, sxx = F.col("sx").cast("double"), F.col("sxx").cast("double")
    stats = m.filter(F.col("n") > 1).select(
        "c_nationkey",
        (sx / nd).alias("mean"),
        F.sqrt((sxx - sx * sx / nd) / (nd - F.lit(1.0))).alias("sd"),
    )
    return (
        c.join(F.broadcast(stats), "c_nationkey")
        .filter(
            F.abs(F.col("c_acctbal") - F.col("mean")) > F.lit(1.5) * F.col("sd")
        )
        .select(
            "c_custkey",
            "c_nationkey",
            "c_acctbal",
            F.round(
                (F.col("c_acctbal") - F.col("mean")) / F.col("sd"), 6
            ).alias("z"),
        )
    )


@register("q127_trained_langid_confusion", langid_confusion_oracle_sql(50))
def q127_trained_langid_confusion(spark, sf_dir):
    """Trained char-trigram language ID (operators/langid.py,
    Cavnar/Trenkle profiles): train top-50 per-language trigram
    profiles on even doc_ids, classify odd doc_ids by distinct-gram
    overlap, emit the (true lang, predicted, n_docs) confusion
    counts. Integer scoring with lexicographic tie-breaks -> the
    oracle matches bit-for-bit. (The synthetic corpus is all-latin,
    so ACCURACY here is near-chance by construction — the planted
    multilingual fixtures in tests/test_langid.py are the accuracy
    check; this row proves the distributed train/classify plumbing.)

    Scale shape: profiles broadcast (n_langs x 50 rows); corpus
    tokenization is map-only; one (doc,lang) agg with map-side
    combine; the train window is per-language and rank-bounded."""
    d = _t(spark, sf_dir, "documents")
    train = d.filter(F.col("doc_id") % 2 == 0)
    test = d.filter(F.col("doc_id") % 2 == 1)
    profiles = train_char_ngram_profiles(train, "text", "lang", "doc_id", 50)
    pred = classify_char_ngram(test, profiles, "text", "doc_id")
    return (
        pred.join(d.select("doc_id", "lang"), "doc_id")
        .groupBy("lang", "predicted")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


@register(
    "q128_percentile_rank_windows",
    """
    SELECT c_custkey, c_nationkey,
           ROUND(PERCENT_RANK() OVER w, 9) AS pct_rank,
           ROUND(CUME_DIST() OVER w, 9) AS cume,
           NTH_VALUE(c_custkey, 3) OVER (
             PARTITION BY c_nationkey ORDER BY c_acctbal ASC, c_custkey ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS third_poorest
    FROM customer
    WHERE c_custkey < 300
    WINDOW w AS (PARTITION BY c_nationkey
                 ORDER BY c_acctbal ASC, c_custkey ASC)
    """,
)
def q128_percentile_rank_windows(spark, sf_dir):
    """percent_rank / cume_dist / nth_value — the last members of the
    ranking-window family (§2.5; lag q52, rank q53, dense_rank q40,
    ntile q76, row_number everywhere, last-ignore-nulls q46). Both
    ratios derive from integer ranks over a TOTAL order (acctbal,
    custkey), so the doubles are single divisions from identical
    integers — engine-exact. Window partitioned by nation: no global
    sort; at scale this is one key-partitioned sort per nation."""
    c = _t(spark, sf_dir, "customer")
    from pyspark.sql import Window as W

    w = W.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").asc(), F.col("c_custkey").asc()
    )
    wf = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return (
        c.filter(F.col("c_custkey") < 300)
        .select(
            "c_custkey",
            "c_nationkey",
            F.round(F.percent_rank().over(w), 9).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 9).alias("cume"),
            F.nth_value("c_custkey", 3).over(wf).alias("third_poorest"),
        )
    )


@register(
    "q129_column_profile",
    """
    WITH s AS (
      SELECT COUNT(*) AS n_rows,
             COUNT(l_quantity) AS nn_q, COUNT(DISTINCT l_quantity) AS nd_q,
             CAST(MIN(l_quantity) AS VARCHAR) AS mn_q,
             CAST(MAX(l_quantity) AS VARCHAR) AS mx_q,
             COUNT(l_returnflag) AS nn_r, COUNT(DISTINCT l_returnflag) AS nd_r,
             CAST(MIN(l_returnflag) AS VARCHAR) AS mn_r,
             CAST(MAX(l_returnflag) AS VARCHAR) AS mx_r,
             COUNT(l_partkey) AS nn_p, COUNT(DISTINCT l_partkey) AS nd_p,
             CAST(MIN(l_partkey) AS VARCHAR) AS mn_p,
             CAST(MAX(l_partkey) AS VARCHAR) AS mx_p
      FROM lineitem
    )
    SELECT 'l_quantity' AS column, n_rows, n_rows - nn_q AS n_nulls,
           nd_q AS n_distinct, mn_q AS min_str, mx_q AS max_str FROM s
    UNION ALL
    SELECT 'l_returnflag', n_rows, n_rows - nn_r, nd_r, mn_r, mx_r FROM s
    UNION ALL
    SELECT 'l_partkey', n_rows, n_rows - nn_p, nd_p, mn_p, mx_p FROM s
    """,
)
def q129_column_profile(spark, sf_dir):
    """ANALYZE-style column profile (operators/profile.profile_columns):
    null counts, exact distincts, min/max for three lineitem columns
    in two aggregation passes — plain stats and distincts split on
    purpose: one combined agg Expands every row per distinct group
    with all payload columns riding along (measured 2.6x slower).
    Each pass covers all columns; the wide row pivots to one row per
    column via stack(), executor-side."""
    li = _t(spark, sf_dir, "lineitem")
    from product_etl_spark.operators.profile import profile_columns

    return profile_columns(li, ["l_quantity", "l_returnflag", "l_partkey"])


@register(
    "q130_snapshot_diff",
    """
    WITH old AS (
      SELECT c_custkey, c_acctbal, c_mktsegment FROM customer
    ),
    new AS (
      SELECT c_custkey,
             CASE WHEN c_custkey % 13 = 0 THEN c_acctbal + 100.0
                  ELSE c_acctbal END AS c_acctbal,
             c_mktsegment
      FROM customer WHERE c_custkey % 97 <> 0
      UNION ALL
      SELECT c_custkey + 1000000, c_acctbal, c_mktsegment
      FROM customer WHERE c_custkey < 50
    ),
    d AS (
      SELECT COALESCE(o.c_custkey, n.c_custkey) AS c_custkey,
             CASE WHEN o.c_custkey IS NULL THEN 'added'
                  WHEN n.c_custkey IS NULL THEN 'removed'
                  WHEN o.c_acctbal <> n.c_acctbal
                       OR o.c_mktsegment <> n.c_mktsegment THEN 'changed'
             END AS change
      FROM old o FULL OUTER JOIN new n ON o.c_custkey = n.c_custkey
    )
    SELECT change, COUNT(*) AS n_rows, MIN(c_custkey) AS min_key
    FROM d WHERE change IS NOT NULL GROUP BY change
    """,
)
def q130_snapshot_diff(spark, sf_dir):
    """Snapshot diff (operators/profile.snapshot_diff) — the audit
    complement of the upsert sink: old = customers as-is; new =
    customers minus every 97th (removed), with every 13th balance
    bumped (changed), plus re-keyed copies of the first 50 (added).
    One full-outer join on the key; each side's compared columns
    collapse to ONE md5 so the join payload stays two strings wide
    regardless of table width. Aggregated to (change, n, min_key)
    for a compact deterministic check."""
    c = _t(spark, sf_dir, "customer")
    from product_etl_spark.operators.profile import snapshot_diff

    old = c.select("c_custkey", "c_acctbal", "c_mktsegment")
    new = (
        c.filter(F.col("c_custkey") % 97 != 0)
        .select(
            "c_custkey",
            F.when(
                F.col("c_custkey") % 13 == 0, F.col("c_acctbal") + 100.0
            )
            .otherwise(F.col("c_acctbal"))
            .alias("c_acctbal"),
            "c_mktsegment",
        )
        .unionByName(
            c.filter(F.col("c_custkey") < 50).select(
                (F.col("c_custkey") + 1000000).alias("c_custkey"),
                "c_acctbal",
                "c_mktsegment",
            )
        )
    )
    d = snapshot_diff(old, new, ["c_custkey"])
    return d.groupBy("change").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("c_custkey").alias("min_key"),
    )


@register(
    "q131_daily_gapfill_interpolate",
    """
    WITH daily AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             SUM(CAST(value AS DECIMAL(18,4))) AS day_value
      FROM events WHERE event_type = 'purchase' AND user_id < 40
      GROUP BY 1, 2
    ),
    spans AS (
      SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM daily GROUP BY user_id
    ),
    grid AS (
      SELECT s.user_id, CAST(g.d AS DATE) AS day
      FROM spans s CROSS JOIN UNNEST(generate_series(
        CAST(s.d0 AS TIMESTAMP), CAST(s.d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS g(d)
    ),
    ctx AS (
      SELECT g.user_id, g.day,
             CAST(d.day_value AS DOUBLE) AS v,
             last_value(CAST(d.day_value AS DOUBLE) IGNORE NULLS) OVER (
               PARTITION BY g.user_id ORDER BY g.day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
             last_value(CASE WHEN d.day_value IS NOT NULL THEN g.day END
                        IGNORE NULLS) OVER (
               PARTITION BY g.user_id ORDER BY g.day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
             first_value(CAST(d.day_value AS DOUBLE) IGNORE NULLS) OVER (
               PARTITION BY g.user_id ORDER BY g.day
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
             first_value(CASE WHEN d.day_value IS NOT NULL THEN g.day END
                         IGNORE NULLS) OVER (
               PARTITION BY g.user_id ORDER BY g.day
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
      FROM grid g LEFT JOIN daily d ON d.user_id = g.user_id AND d.day = g.day
    )
    SELECT user_id,
           CAST(day - DATE '1970-01-01' AS BIGINT) AS day_epoch,
           ROUND(CASE WHEN v IS NOT NULL THEN v
                 WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
                   pv + (nv - pv) * (CAST(day - pd AS BIGINT)::DOUBLE
                                     / CAST(nd - pd AS BIGINT)::DOUBLE)
                 WHEN pv IS NOT NULL THEN pv
                 ELSE nv END, 6) AS day_value_filled,
           CASE WHEN v IS NULL THEN 1 ELSE 0 END AS is_gap
    FROM ctx
    """,
)
def q131_daily_gapfill_interpolate(spark, sf_dir):
    """Linear-interpolation gap-fill (timeseries.gapfill_interpolate)
    — the interpolation twin of q96's LOCF: interior gaps take the
    line between surrounding observations, edges backfill/carry.
    Same scale shape (executor-side day grid; two frames over one
    key-partitioned sort — one Exchange feeds both Window nodes);
    the arithmetic is a fixed IEEE sequence from int day deltas and
    doubles, so the oracle matches exactly."""
    from product_etl_spark.operators import timeseries as TS2

    ev = _t(spark, sf_dir, "events")
    daily = (
        ev.filter((F.col("event_type") == "purchase") & (F.col("user_id") < 40))
        .groupBy("user_id", F.to_date("ts").alias("day"))
        .agg(F.sum(dec("value", 18, 4)).alias("day_value"))
    )
    filled = TS2.gapfill_interpolate(daily, "user_id", "day", "day_value")
    return filled.select(
        "user_id",
        F.datediff(F.col("day"), F.lit("1970-01-01").cast("date")).cast(
            "bigint"
        ).alias("day_epoch"),
        F.round("day_value_filled", 6).alias("day_value_filled"),
        "is_gap",
    )
