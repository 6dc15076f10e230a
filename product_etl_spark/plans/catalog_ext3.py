"""Third extension catalog (q96+): time-series analytics (calendar
gap-fill + LOCF, trailing time-range frames), sequence analytics
(funnel, cohort retention, transition bigrams), relevance ranking
(TF-IDF top terms), weighted deterministic sampling, and
exact-moment statistics.

Same determinism contract as catalog.py: exact decimal arithmetic
before any reorderable sum, integer-space membership tests (the
weighted sample's keep test is a DECIMAL(38,0) inequality — no float
division anywhere near a boundary), total-order tiebreaks on every
rank, and date/epoch integer projections for all calendar output.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from product_etl_spark.functions.text import TERM_RE, index_terms
from product_etl_spark.operators import sampling as SA
from product_etl_spark.operators import timeseries as TS
from product_etl_spark.plans.catalog import _t, dec, register

_DAY0 = "1970-01-01"


@register(
    "q96_daily_gapfill_locf",
    """
    WITH daily AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             SUM(CAST(value AS DECIMAL(18,4))) AS day_value
      FROM events WHERE event_type = 'purchase'
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
    filled AS (
      SELECT g.user_id, g.day, d.day_value,
             last_value(d.day_value IGNORE NULLS) OVER (
               PARTITION BY g.user_id ORDER BY g.day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf
      FROM grid g LEFT JOIN daily d ON d.user_id = g.user_id AND d.day = g.day
    )
    SELECT user_id, CAST(day - DATE '1970-01-01' AS BIGINT) AS day_epoch,
           CAST(locf AS DOUBLE) AS day_value_filled,
           CASE WHEN day_value IS NULL THEN 1 ELSE 0 END AS is_gap
    FROM filled
    """,
)
def q96_daily_gapfill_locf(spark, sf_dir):
    """Hypertable-style continuous aggregate: per-user daily purchase
    totals, gap-filled to a dense calendar with last-observation-
    carried-forward. The timeseries.gapfill_locf operator builds the
    day grid executor-side (sequence+explode over per-key min/max
    spans) and fills via a key-partitioned window — no global sort,
    no driver loop; grid size is bounded by the calendar span."""
    ev = _t(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", F.to_date("ts").alias("day"))
        .agg(F.sum(dec("value", 18, 4)).alias("day_value"))
    )
    filled = TS.gapfill_locf(daily, "user_id", "day", "day_value")
    return filled.select(
        "user_id",
        F.datediff("day", F.lit(_DAY0).cast("date")).cast("bigint").alias("day_epoch"),
        F.col("day_value_filled").cast("double").alias("day_value_filled"),
        "is_gap",
    )


@register(
    "q97_event_funnel",
    """
    WITH s AS (
      SELECT user_id, MIN(ts) AS t0 FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    ),
    v AS (
      SELECT e.user_id, MIN(e.ts) AS t1
      FROM events e JOIN s ON e.user_id = s.user_id
      WHERE e.event_type = 'view' AND e.ts > s.t0 GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'purchase' AND e.ts > v.t1 GROUP BY e.user_id
    )
    SELECT 'signup' AS stage, 1 AS stage_idx, COUNT(*) AS n_users FROM s
    UNION ALL SELECT 'view', 2, COUNT(*) FROM v
    UNION ALL SELECT 'purchase', 3, COUNT(*) FROM p
    """,
)
def q97_event_funnel(spark, sf_dir):
    """Ordered funnel signup -> view -> purchase: each stage counts
    users whose stage event strictly follows their previous stage's
    first occurrence. Three aggregates + two equi-joins, all shuffled
    on user_id — AQE reuses the exchange; no windows, no collect."""
    ev = _t(spark, sf_dir, "events")
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
    )
    v = (
        ev.filter(F.col("event_type") == "view")
        .join(s, "user_id")
        .filter(F.col("ts") > F.col("t0"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )

    def stage(df, name, idx):
        return df.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(name).alias("stage"),
            F.lit(idx).alias("stage_idx"),
            "n_users",
        )

    return stage(s, "signup", 1).unionAll(stage(v, "view", 2)).unionAll(
        stage(p, "purchase", 3)
    )


@register(
    "q98_cohort_retention",
    """
    WITH first_seen AS (
      SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS week
      FROM events
    )
    SELECT CAST(cohort_week - DATE '1970-01-01' AS BIGINT) AS cohort_week_epoch,
           CAST((week - cohort_week) // 7 AS BIGINT) AS week_offset,
           COUNT(*) AS n_users
    FROM activity a JOIN first_seen f ON a.user_id = f.user_id
    GROUP BY 1, 2
    """,
)
def q98_cohort_retention(spark, sf_dir):
    """Cohort retention triangle: users bucketed by first-activity
    week, counted per (cohort, week-offset). Two user_id-keyed
    aggregates + one join + one small-key aggregate; week arithmetic
    stays in integer day space (both engines truncate weeks to
    Monday), so no calendar float math exists."""
    ev = _t(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.to_date(F.date_trunc("week", F.min("ts"))).alias("cohort_week")
    )
    activity = ev.select(
        "user_id", F.to_date(F.date_trunc("week", "ts")).alias("week")
    ).distinct()
    return (
        activity.join(first_seen, "user_id")
        .groupBy(
            F.datediff("cohort_week", F.lit(_DAY0).cast("date"))
            .cast("bigint")
            .alias("cohort_week_epoch"),
            F.floor(F.datediff("week", "cohort_week") / 7)
            .cast("bigint")
            .alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@register(
    "q99_tfidf_top_terms",
    f"""
    WITH toks AS (
      SELECT doc_id, UNNEST(regexp_extract_all(lower(text), '{TERM_RE}')) AS term
      FROM documents
    ),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
    dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    ranked AS (
      SELECT t.doc_id, t.term, t.tf, d.df,
             ROW_NUMBER() OVER (PARTITION BY t.doc_id
               ORDER BY t.tf DESC, d.df ASC, t.term ASC) AS rnk
      FROM tf t JOIN dfreq d ON t.term = d.term
    )
    SELECT doc_id, term, tf, df, CAST(rnk AS INTEGER) AS rnk,
           ROUND(tf * (ln((n_docs + 1.0) / (df + 1.0)) + 1.0), 4) AS tfidf
    FROM ranked, n WHERE rnk <= 3
    """,
)
def q99_tfidf_top_terms(spark, sf_dir):
    """TF-IDF relevance: top-3 terms per document. Rank order is the
    fully-integer key (tf DESC, df ASC, term ASC) — higher frequency,
    rarer corpus-wide, lexicographic tiebreak — so no float boundary
    decides membership; the float tfidf score is output-only
    (smoothed idf, rounded both sides). Scale shape: tf is a
    (doc,term) aggregate, df a term aggregate, their join shuffles on
    term (count rows only), the rank window partitions by doc_id, and
    the corpus size joins as a broadcast scalar."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(index_terms("text")).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("_n_docs"))
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tf").desc(), F.col("df").asc(), F.col("term").asc()
    )
    return (
        tf.join(dfreq, "term")
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            "rnk",
            F.round(
                F.col("tf")
                * (F.log((F.col("_n_docs") + 1.0) / (F.col("df") + 1.0)) + 1.0),
                4,
            ).alias("tfidf"),
        )
    )


@register(
    "q100_trailing_7d_spend",
    """
    SELECT user_id, event_id, epoch_us(ts) AS ts_us,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE) AS trail_sum,
           COUNT(*) OVER w AS trail_n
    FROM events WHERE event_type = 'purchase'
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW)
    """,
)
def q100_trailing_7d_spend(spark, sf_dir):
    """Trailing 7-day spend per purchase event: a RANGE frame over
    epoch microseconds (value-based, so duplicate timestamps are
    peers in both engines — a ROWS frame would be layout-dependent).
    Sums are exact decimals inside the frame; the window is
    partitioned by user_id (timeseries.trailing_range_agg), never
    global."""
    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase")
    out = TS.trailing_range_agg(
        purchases, "user_id", "ts", dec("value", 18, 4), 7 * 24 * 3600 * 1_000_000
    )
    return out.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        F.col("trail_sum").cast("double").alias("trail_sum"),
        "trail_n",
    )


@register(
    "q101_weighted_doc_sample",
    """
    WITH totals AS (
      SELECT CAST(SUM(n_chars) AS HUGEINT) AS sum_w,
             CAST(COUNT(*) AS HUGEINT) AS n_rows
      FROM documents
    )
    SELECT doc_id, source, n_chars
    FROM documents, totals
    WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS HUGEINT)
            * 5 * sum_w
        < CAST(1152921504606846976 AS HUGEINT)
            * CAST(n_chars AS HUGEINT) * n_rows
    """,
)
def q101_weighted_doc_sample(spark, sf_dir):
    """Size-weighted deterministic sample: keep probability
    proportional to n_chars, expected fraction 1/5. The keep test is
    the exact integer inequality u·den·Σw < 2^60·num·w·N evaluated in
    DECIMAL(38,0)/HUGEINT (sampling.weighted_sample) — identical
    membership in Spark and the oracle, stable under repartitioning.
    One scalar-aggregate job collapses Σw and N to gcd-reduced
    literals; the sampling plan itself is scan+filter (plan-asserted
    join-free and exchange-free)."""
    docs = _t(spark, sf_dir, "documents")
    return SA.weighted_sample(docs, "doc_id", "n_chars", 1, 5).select(
        "doc_id", "source", "n_chars"
    )


@register(
    "q102_lineitem_moment_stats",
    """
    WITH m AS (
      SELECT l_returnflag,
             COUNT(*) AS n,
             SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sx,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS sy,
             SUM(CAST(l_quantity AS DECIMAL(18,2))
                 * CAST(l_quantity AS DECIMAL(18,2))) AS sxx,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * CAST(l_extendedprice AS DECIMAL(18,2))) AS syy,
             SUM(CAST(l_quantity AS DECIMAL(18,2))
                 * CAST(l_extendedprice AS DECIMAL(18,2))) AS sxy
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           ROUND(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mean_qty,
           ROUND((CAST(sxx AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
                 / (CAST(n AS DOUBLE) - 1.0), 6) AS var_qty,
           ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (SQRT(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * SQRT(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
             AS corr_qty_price
    FROM m
    """,
)
def q102_lineitem_moment_stats(spark, sf_dir):
    """Exact-moment statistics (mean / sample variance / Pearson
    corr) per return flag. Native corr()/var_samp() are
    summation-order-dependent doubles; here the five moment sums are
    exact decimals (one partial-aggregated shuffle), converted to
    double once, then combined with the identical IEEE formula on
    both engines — division, multiply and sqrt are correctly rounded,
    so the outputs agree bit-for-bit before the cosmetic round."""
    li = _t(spark, sf_dir, "lineitem")
    x, y = dec("l_quantity"), dec("l_extendedprice")
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
        F.sum(x * y).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxx, syy = F.col("sxx").cast("double"), F.col("syy").cast("double")
    sxy = F.col("sxy").cast("double")
    return m.select(
        "l_returnflag",
        "n",
        F.round(sx / nd, 6).alias("mean_qty"),
        F.round((sxx - sx * sx / nd) / (nd - F.lit(1.0)), 6).alias("var_qty"),
        F.round(
            (nd * sxy - sx * sy)
            / (F.sqrt(nd * sxx - sx * sx) * F.sqrt(nd * syy - sy * sy)),
            6,
        ).alias("corr_qty_price"),
    )


@register(
    "q103_event_transitions",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
      FROM events
    )
    SELECT prev_type, event_type AS next_type, COUNT(*) AS n
    FROM seq WHERE prev_type IS NOT NULL
    GROUP BY 1, 2
    """,
)
def q103_event_transitions(spark, sf_dir):
    """Event-type transition bigrams (clickstream Markov counts):
    lag over a per-user totally-ordered window (ts, event_id
    tiebreak), then a 25-cell aggregate. The sequence-mining shape of
    timeseries.transition_counts — partitioned window only."""
    ev = _t(spark, sf_dir, "events")
    return TS.transition_counts(ev, "user_id", "event_type", ["ts", "event_id"])


@register(
    "q104_event_type_overlap",
    """
    WITH tu AS (SELECT DISTINCT event_type, user_id FROM events)
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           COUNT(*) AS n_users
    FROM tu a JOIN tu b
      ON a.user_id = b.user_id AND a.event_type < b.event_type
    GROUP BY 1, 2
    """,
)
def q104_event_type_overlap(spark, sf_dir):
    """Pairwise audience overlap: users active in both of every
    event-type pair — the EXACT twin of the mergeable theta-sketch
    overlap (operators/sketches.theta_overlap), the same way q49's
    exact distinct twins the HLL path. One dedup shuffle on
    (type, user), a self-equi-join on user_id (per-user fanout is
    bounded by the type vocabulary), and a 10-cell aggregate."""
    ev = _t(spark, sf_dir, "events")
    tu = ev.select("event_type", "user_id").distinct()
    a = tu.select(F.col("event_type").alias("type_a"), "user_id")
    b = tu.select(F.col("event_type").alias("type_b"), "user_id")
    return (
        a.join(b, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
