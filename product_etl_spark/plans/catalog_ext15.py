"""Fifteenth extension catalog (q217+): round-13 additions — the
doubling-construction twin of the suffix duplicated-span surface
(q217: same semantics as q212, method='doubling' — the
document-length-agnostic path a real 100 TB run needs gets its own
driver hash instead of riding the pytest pin to 'blocked'), and the
incremental suffix-span PROBE (q218, operators/
dedup_incremental.probe_suffix_spans — a new batch's spans against a
frozen history index, never rescanning accepted text; the r12
verdict's missing incremental rung for the suffix family).

Reference parity note: the reference (pandas+psycopg2 row loops,
ETL.py / main.py) computes none of this; these rows extend the
training-data-pipeline surface per the build brief.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from product_etl_spark.plans.catalog import _t, register

# q212's oracle, verbatim: both constructions promise the SAME rows,
# so they must answer the same SQL (the gram-cover-equality contract,
# catalog_ext14 docstring).
_SUFFIX_SPANS_ORACLE = r"""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split_regex(LOWER(COALESCE(text,'')), '\s+'),
                         x -> x <> '') AS toks
      FROM documents
    ), g AS (
      SELECT doc_id, r.i - 1 AS pos,
             array_to_string(toks[r.i:r.i+7], ' ') AS gram
      FROM t, LATERAL (SELECT UNNEST(range(1, LEN(toks) - 6)) AS i) r
      WHERE LEN(toks) >= 8
    ), dupg AS (
      SELECT gram FROM g GROUP BY gram HAVING COUNT(DISTINCT doc_id) >= 2
    ), dp AS (
      SELECT g.doc_id, g.pos FROM g JOIN dupg USING (gram)
    ), isl AS (
      SELECT doc_id, pos,
             CASE WHEN pos > COALESCE(MAX(pos + 8) OVER (
               PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
             THEN 1 ELSE 0 END AS nw
      FROM dp
    ), isl2 AS (
      SELECT doc_id, pos,
             SUM(nw) OVER (PARTITION BY doc_id ORDER BY pos) AS isl_id
      FROM isl
    )
    SELECT doc_id,
           CAST(MIN(pos) AS BIGINT) AS span_start,
           CAST(MAX(pos + 7) - MIN(pos) + 1 AS BIGINT) AS span_len
    FROM isl2 GROUP BY doc_id, isl_id
    ORDER BY doc_id, span_start
    """


@register("q217_suffix_doubling_spans", _SUFFIX_SPANS_ORACLE)
def q217_suffix_doubling_spans(spark, sf_dir):
    """q212's surface — MAXIMAL cross-document duplicated spans with
    true arbitrary lengths — computed by the PREFIX-DOUBLING suffix
    construction (suffixes._position_dup_lengths_doubling) instead
    of the blocked per-document arrays: O(log repeat) linear rounds
    of rank refinement + binary-lifting LCP, with NO per-document
    quadratic blow-up and therefore no max_doc_tokens guard. This is
    the construction a 100 TB corpus with UNBOUNDED documents runs;
    both methods are pytest-pinned identical (tests/
    test_suffixes.py) and this row gives the doubling path its own
    driver hash (r12 verdict item 3) against the same gram-cover
    oracle as q212.

    Scale shape: every round is (shuffle-rank, self-join on shifted
    position) — linear in corpus positions, log in the longest
    REPEAT (not document) length; binary-lifting LCP adds log-depth
    doc-bounded lookups. No corpus^2; no single-task stage
    (suffixes.py module docstring)."""
    from product_etl_spark.operators.suffixes import (
        suffix_duplicated_spans,
    )

    d = _t(spark, sf_dir, "documents")
    return suffix_duplicated_spans(
        d, "text", "doc_id", min_len=8, method="doubling"
    )


@register(
    "q218_suffix_probe_spans",
    r"""
    WITH t AS (
      SELECT doc_id,
             CASE WHEN doc_id % 2 = 0 THEN 'hist' ELSE 'batch' END AS src,
             list_filter(string_split_regex(LOWER(COALESCE(text,'')), '\s+'),
                         x -> x <> '') AS toks
      FROM documents
    ), g AS (
      SELECT doc_id, src, r.i - 1 AS pos,
             array_to_string(toks[r.i:r.i+7], ' ') AS gram
      FROM t, LATERAL (SELECT UNNEST(range(1, LEN(toks) - 6)) AS i) r
      WHERE LEN(toks) >= 8
    ), hg AS (
      SELECT DISTINCT gram FROM g WHERE src = 'hist'
    ), bdup AS (
      SELECT gram FROM g WHERE src = 'batch'
      GROUP BY gram HAVING COUNT(DISTINCT doc_id) >= 2
    ), dupg AS (
      SELECT gram FROM hg UNION SELECT gram FROM bdup
    ), dp AS (
      SELECT g.doc_id, g.pos FROM g JOIN dupg USING (gram)
      WHERE g.src = 'batch'
    ), isl AS (
      SELECT doc_id, pos,
             CASE WHEN pos > COALESCE(MAX(pos + 8) OVER (
               PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
             THEN 1 ELSE 0 END AS nw
      FROM dp
    ), isl2 AS (
      SELECT doc_id, pos,
             SUM(nw) OVER (PARTITION BY doc_id ORDER BY pos) AS isl_id
      FROM isl
    )
    SELECT doc_id,
           CAST(MIN(pos) AS BIGINT) AS span_start,
           CAST(MAX(pos + 7) - MIN(pos) + 1 AS BIGINT) AS span_len
    FROM isl2 GROUP BY doc_id, isl_id
    ORDER BY doc_id, span_start
    """,
)
def q218_suffix_probe_spans(spark, sf_dir):
    """INCREMENTAL suffix-span probe
    (dedup_incremental.probe_suffix_spans): a NEW batch's maximal
    verbatim spans (>= 8 tokens) against a frozen history index —
    even doc_ids play the accepted history, odd doc_ids the
    arriving batch. The store is the history's distinct-gram
    inventory (the fixed-min_len sufficient statistic of the suffix
    rank store by the module's cover-equality contract), so the
    probe never rescans accepted text; pytest pins the ascending-
    ingest contract: probe output == suffix_duplicated_spans over
    the union RESTRICTED to batch docs. The removal twin
    (probe_suffix_excision), the store-appending ingest
    (ingest_suffix_spans, idempotent on replay via first-seen gram
    owners) and the streaming wrapper (stream_suffix_span_probe)
    ride the same position frame.

    Scale shape: one batch gram groupBy (map-side combine), ONE
    equi-join on the gram key against a vocabulary-sized store,
    doc-bounded island windows. History cost per batch = the store
    join, not a corpus scan — the same posture as the q156/q164
    component stores and the q177 gram->keeper store."""
    from product_etl_spark.operators.dedup_incremental import (
        build_suffix_span_index,
        probe_suffix_spans,
    )

    d = _t(spark, sf_dir, "documents")
    hist = d.filter(F.col("doc_id") % 2 == 0)
    batch = d.filter(F.col("doc_id") % 2 == 1)
    idx = build_suffix_span_index(hist, "text", "doc_id", min_len=8)
    return probe_suffix_spans(idx, batch, "text", "doc_id", min_len=8)


@register(
    "q219_suffix_probe_excision",
    r"""
    WITH t AS (
      SELECT doc_id,
             CASE WHEN doc_id % 2 = 0 THEN 'hist' ELSE 'batch' END AS src,
             list_filter(string_split_regex(LOWER(COALESCE(text,'')), '\s+'),
                         x -> x <> '') AS ltoks,
             list_filter(string_split_regex(COALESCE(text,''), '\s+'),
                         x -> x <> '') AS otoks
      FROM documents
    ), g AS (
      SELECT doc_id, src, r.i - 1 AS pos,
             array_to_string(ltoks[r.i:r.i+7], ' ') AS gram
      FROM t, LATERAL (SELECT UNNEST(range(1, LEN(ltoks) - 6)) AS i) r
      WHERE LEN(ltoks) >= 8
    ), hg AS (
      SELECT DISTINCT gram FROM g WHERE src = 'hist'
    ), bdup AS (
      SELECT gram FROM g WHERE src = 'batch'
      GROUP BY gram HAVING COUNT(DISTINCT doc_id) >= 2
    ), dupg AS (
      SELECT gram FROM hg UNION SELECT gram FROM bdup
    ), rem AS (
      SELECT DISTINCT g.doc_id, g.pos + d.o AS pos
      FROM g JOIN dupg USING (gram),
           LATERAL (SELECT UNNEST(range(0, 8)) AS o) d
      WHERE g.src = 'batch'
    ), tokpos AS (
      SELECT doc_id, r.i - 1 AS pos, otoks[r.i] AS tok
      FROM t, LATERAL (SELECT UNNEST(range(1, LEN(otoks) + 1)) AS i) r
      WHERE src = 'batch'
    ), kept AS (
      SELECT tp.doc_id, tp.pos, tp.tok
      FROM tokpos tp LEFT JOIN rem
        ON tp.doc_id = rem.doc_id AND tp.pos = rem.pos
      WHERE rem.pos IS NULL
    ), reb AS (
      SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS text_clean,
             COUNT(*) AS n_kept
      FROM kept GROUP BY doc_id
    )
    SELECT t.doc_id,
           COALESCE(reb.text_clean, '') AS text_clean,
           LEN(t.otoks) AS n_tokens,
           CAST(LEN(t.otoks) - COALESCE(reb.n_kept, 0) AS BIGINT)
             AS n_removed
    FROM t LEFT JOIN reb USING (doc_id)
    WHERE t.src = 'batch'
    """,
)
def q219_suffix_probe_excision(spark, sf_dir):
    """INCREMENTAL suffix-exact strip
    (dedup_incremental.probe_suffix_excision): every token of the
    arriving batch (odd doc_ids) inside a verbatim span of >= 8
    tokens shared with the frozen history index (even doc_ids) or a
    same-batch sibling is excised, with the q177/q214 original-case
    reconstruction tail — the removal twin of the q218 probe,
    completing the incremental suffix ladder (q218 names the spans,
    this removes them; pytest pins both equal to the batch rebuild
    restricted to the batch).

    The oracle replays the removed set as the 8-gram cover of the
    probe's dup grams (history union batch-internal) — the
    color-generalized cover-equality contract.

    Scale shape: the q218 position frame plus one bounded interval
    explode, one (id, pos) anti-join, one doc-sized reconstruction
    groupBy (dedup._excise_positions)."""
    from product_etl_spark.operators.dedup_incremental import (
        build_suffix_span_index,
        probe_suffix_excision,
    )

    d = _t(spark, sf_dir, "documents")
    hist = d.filter(F.col("doc_id") % 2 == 0)
    batch = d.filter(F.col("doc_id") % 2 == 1)
    idx = build_suffix_span_index(hist, "text", "doc_id", min_len=8)
    return probe_suffix_excision(idx, batch, "text", "doc_id", min_len=8)


_SHARD_RANK_SQL = r"""
    WITH t AS (
      SELECT doc_id,
             LEN(list_filter(string_split_regex(COALESCE(text,''), '\s+'),
                             x -> x <> '')) AS n_tokens
      FROM documents
    ), r AS (
      SELECT doc_id, n_tokens,
             ROW_NUMBER() OVER (ORDER BY n_tokens DESC, doc_id) AS rn,
             COUNT(*) OVER () AS nr
      FROM t
    ), s AS (
      -- trailing PARTIAL pass deals forward (the _snake_slot rule)
      SELECT doc_id, n_tokens,
             CAST(CASE WHEN rn > (nr // 8) * 8 THEN (rn - 1) % 8
                       WHEN ((rn - 1) // 8) % 2 = 0 THEN (rn - 1) % 8
                       ELSE 7 - ((rn - 1) % 8)
                  END AS INT) AS shard
      FROM r
    )
"""


@register(
    "q220_balanced_shards",
    _SHARD_RANK_SQL
    + """
    SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, shard
    FROM s ORDER BY doc_id
    """,
)
def q220_balanced_shards(spark, sf_dir):
    """Balanced training-shard manifest
    (sampling.balanced_shards): every document dealt to one of 8
    shards in SNAKE order over the global token-count-descending
    rank — the distributable greedy approximation of
    longest-processing-time bin packing, keeping the shard token
    spread within twice one max-document (the tested adversarial
    bound; far tighter on realistic corpora) where naive modulo
    round-robin systematically overloads shard 0. The manifest step
    every multi-host training run needs between curation (q94) and
    packing (q66/q118).

    Engine-exact: ranks are integer-decided (n_tokens desc, doc_id),
    the snake rule is pure integer arithmetic.

    Scale shape: ONE two-level global rank
    (linkage.global_sort_ranks — repartitionByRange + per-partition
    windows + #partitions-bounded offset collect; NEVER the
    single-task row_number() OVER (ORDER BY) cliff the oracle is
    allowed to use) plus pure expressions."""
    from product_etl_spark.functions import text as T_
    from product_etl_spark.operators.sampling import balanced_shards

    d = _t(spark, sf_dir, "documents")
    sized = d.select(
        "doc_id", T_.token_count(F.col("text")).alias("n_tokens")
    )
    return (
        balanced_shards(sized, "n_tokens", "doc_id", n_shards=8)
        .select(
            "doc_id",
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
            "shard",
        )
        .orderBy("doc_id")
    )


@register(
    "q221_shard_balance",
    _SHARD_RANK_SQL
    + """
    SELECT shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS shard_tokens
    FROM s GROUP BY shard ORDER BY shard
    """,
)
def q221_shard_balance(spark, sf_dir):
    """The balance AUDIT over q220's manifest: per-shard document
    and token totals — the assertion a pipeline runs before shipping
    shards to trainers (max/min shard_tokens spread is the
    snake-deal guarantee made visible). Same operator, aggregate
    surface; integer-exact."""
    from product_etl_spark.functions import text as T_
    from product_etl_spark.operators.sampling import balanced_shards

    d = _t(spark, sf_dir, "documents")
    sized = d.select(
        "doc_id", T_.token_count(F.col("text")).alias("n_tokens")
    )
    return (
        balanced_shards(sized, "n_tokens", "doc_id", n_shards=8)
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("shard_tokens"),
        )
        .orderBy("shard")
    )


@register(
    "q222_tandem_loops",
    r"""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split_regex(LOWER(COALESCE(text,'')), '\s+'),
                         x -> x <> '') AS toks
      FROM documents
    ), tok AS (
      SELECT doc_id, r.i - 1 AS pos, toks[r.i] AS tk
      FROM t, LATERAL (SELECT UNNEST(range(1, LEN(toks) + 1)) AS i) r
    ), f AS (
      SELECT doc_id, pos,
             CASE WHEN tk = LAG(tk, 2) OVER (
               PARTITION BY doc_id ORDER BY pos) THEN 1 ELSE 0 END AS cont
      FROM tok
    ), b AS (
      SELECT doc_id, pos, cont,
             CASE WHEN cont = 1 AND COALESCE(LAG(cont) OVER (
               PARTITION BY doc_id ORDER BY pos), 0) = 0
             THEN 1 ELSE 0 END AS brk
      FROM f
    ), i AS (
      SELECT doc_id, pos, cont,
             SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS isl
      FROM b
    ), runs AS (
      SELECT doc_id, isl, COUNT(*) AS len
      FROM i WHERE cont = 1 GROUP BY doc_id, isl
      HAVING COUNT(*) >= 2
    ), agg AS (
      SELECT doc_id, MAX(len + 2) AS max_loop_span,
             COUNT(*) AS n_loops
      FROM runs GROUP BY doc_id
    )
    SELECT t.doc_id,
           CAST(LEN(t.toks) AS BIGINT) AS n_tokens,
           CAST(COALESCE(agg.max_loop_span, 0) AS BIGINT) AS max_loop_span,
           CAST(COALESCE(agg.n_loops, 0) AS BIGINT) AS n_loops
    FROM t LEFT JOIN agg USING (doc_id)
    ORDER BY t.doc_id
    """,
)
def q222_tandem_loops(spark, sf_dir):
    """Degenerate-repetition detector (quality_model.tandem_loops,
    period=2): per document, the longest back-to-back repeat of a
    2-token pattern ("the cat the cat ...") and how many such loop
    regions exist — the generation-failure / low-quality signal the
    existing repetition family doesn't isolate
    (line_repetition_ratio wants duplicate LINES, q144's
    dup_ngram_fraction counts re-occurrence anywhere). A position
    continues a loop when its token equals the token ``period``
    back; maximal runs of length L >= period cover L + period
    repeated tokens.

    Engine-exact: integer counts from the same case-folded
    whitespace tokens both engines split.

    Scale shape: one posexplode + per-doc lag window +
    gaps-and-islands + per-doc groupBy — all doc-bounded
    partitions, nothing cross-document."""
    from product_etl_spark.operators.quality_model import tandem_loops

    d = _t(spark, sf_dir, "documents")
    return tandem_loops(d, "text", "doc_id", period=2)


@register(
    "q223_mann_whitney_acctbal",
    r"""
    WITH s AS (
      SELECT c_acctbal AS v,
             CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS a
      FROM customer
      WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
    ), g AS (
      SELECT v, COUNT(*) AS cnt, SUM(a) AS cnt_a FROM s GROUP BY v
    ), c AS (
      SELECT v, cnt, cnt_a, SUM(cnt) OVER (ORDER BY v) AS cum FROM g
    ), agg AS (
      SELECT SUM(cnt_a * (2 * cum - cnt + 1)) AS r2_a,
             SUM(cnt_a) AS n_a,
             SUM(cnt - cnt_a) AS n_b,
             SUM(cnt * cnt * cnt - cnt) AS ties,
             SUM(cnt) AS n
      FROM c
    ), v AS (
      -- degenerate-corpus contract, engine-identical (ADVICE r13):
      -- NULLIF keeps n = 1 from dividing by zero; the CASE guards
      -- below emit NULL for a missing group or zero variance instead
      -- of engine-specific NaN/inf
      SELECT agg.*,
             CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 12.0
             * (CAST(n + 1 AS DOUBLE)
                - CAST(ties AS DOUBLE)
                  / NULLIF(CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE),
                           0.0)) AS var
      FROM agg
    )
    SELECT CAST(n_a AS BIGINT) AS n_a,
           CAST(n_b AS BIGINT) AS n_b,
           CAST(r2_a AS BIGINT) AS r2_a,
           CAST(r2_a - n_a * (n_a + 1) AS BIGINT) AS u2_a,
           CAST(2 * n_a * n_b - (r2_a - n_a * (n_a + 1)) AS BIGINT)
             AS u2_b,
           CASE WHEN n_a > 0 AND n_b > 0 AND var > 0 THEN
             ROUND(
               (CAST(r2_a - n_a * (n_a + 1) AS DOUBLE)
                - CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))
               / (2.0 * SQRT(var)),
               6) END AS z,
           CASE WHEN n_a > 0 AND n_b > 0 THEN
             ROUND(
               CAST(r2_a - n_a * (n_a + 1) AS DOUBLE)
               / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)) - 1.0,
               6) END AS cliffs_delta
    FROM v
    """,
)
def q223_mann_whitney_acctbal(spark, sf_dir):
    """Mann-Whitney U rank-sum drift (profile.rank_sum_test):
    BUILDING vs MACHINERY customers' account balances — the
    nonparametric two-sample rung beside the binned KS (q148), PSI
    (q139) and chi-square (q210): no bins, no distributional
    assumption, ties handled exactly by midranks.

    Engine-exact: 2*midrank = 2*cum - cnt + 1 keeps the rank sums
    INTEGER (n_a/n_b/r2_a/u2_a/u2_b are BIGINTs); z and
    cliffs_delta are single deterministic float trees ROUND(.,6)ed
    (the q148/q161 float policy).

    Scale shape: ties collapse in one map-side-combined groupBy on
    the value BEFORE any ordering; the distinct-value prefix sum is
    the two-level distributed scan (suffixes._prefix_sum), never a
    single-task window even on an all-distinct column; one 1-row
    aggregate tail."""
    from product_etl_spark.operators.profile import rank_sum_test

    c = _t(spark, sf_dir, "customer")
    return rank_sum_test(
        c, "c_acctbal", "c_mktsegment", "BUILDING", "MACHINERY"
    )


@register(
    "q224_spearman_size_price",
    r"""
    WITH gx AS (
      SELECT p_brand AS g, p_size AS v, COUNT(*) AS c
      FROM part GROUP BY 1, 2
    ), cx AS (
      SELECT g, v,
             2 * SUM(c) OVER (PARTITION BY g ORDER BY v) - c + 1 AS r2
      FROM gx
    ), gy AS (
      SELECT p_brand AS g, p_retailprice AS v, COUNT(*) AS c
      FROM part GROUP BY 1, 2
    ), cy AS (
      SELECT g, v,
             2 * SUM(c) OVER (PARTITION BY g ORDER BY v) - c + 1 AS r2
      FROM gy
    ), j AS (
      SELECT p.p_brand AS g,
             CAST(cx.r2 AS DECIMAL(18,0)) AS rx,
             CAST(cy.r2 AS DECIMAL(18,0)) AS ry
      FROM part p
      JOIN cx ON cx.g = p.p_brand AND cx.v = p.p_size
      JOIN cy ON cy.g = p.p_brand AND cy.v = p.p_retailprice
    ), m AS (
      SELECT g, COUNT(*) AS n,
             SUM(rx) AS sx, SUM(ry) AS sy,
             SUM(rx * rx) AS sxx, SUM(ry * ry) AS syy,
             SUM(rx * ry) AS sxy
      FROM j GROUP BY g
    ), d AS (
      SELECT g, n, sx, sy, sxy,
             (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
             * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) AS den
      FROM m
    )
    SELECT g AS p_brand, CAST(n AS BIGINT) AS n,
           -- zero-rank-variance contract, engine-identical (ADVICE
           -- r13): NULL rho by explicit guard, not by 0/0 semantics
           CASE WHEN den > 0 THEN
             ROUND(
               (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
               / SQRT(den),
               6) END AS rho
    FROM d ORDER BY p_brand
    """,
)
def q224_spearman_size_price(spark, sf_dir):
    """Grouped Spearman rank correlation (profile.spearman_corr):
    p_size vs p_retailprice per brand — monotone association
    without a linearity assumption, the effect-size companion to
    the rank-sum test (q223) beside the parametric OLS (q161). Ties
    exact via doubled midranks (integers); six exact-decimal moment
    sums per group; rho is one double tree ROUND(.,6) — the
    q102/q161 float policy on rank transforms.

    Scale shape: ties collapse in (group, value) map-side-combined
    groupBys BEFORE any ordering; cumulative windows run over the
    DISTINCT-VALUE frames (value-cardinality-bounded); two
    (group, value) equi-join-backs; one mergeable-moment aggregate.
    The oracle's window is allowed to be naive — the Spark side
    never orders corpus-sized partitions."""
    from product_etl_spark.operators.profile import spearman_corr

    p = _t(spark, sf_dir, "part")
    return spearman_corr(p, "p_size", "p_retailprice", "p_brand")


@register(
    "q225_seasonal_decomposition",
    r"""
    WITH observed AS (
      SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY CAST(ts AS DATE)
    ), span AS (
      SELECT MIN(day) AS lo, MAX(day) AS hi FROM observed
    ), daily AS (
      SELECT a.day, CAST(COALESCE(o.n, 0) AS BIGINT) AS n_events
      FROM (SELECT CAST(UNNEST(generate_series(lo, hi, INTERVAL 1 DAY))
                        AS DATE) AS day FROM span) a
      LEFT JOIN observed o ON o.day = a.day
    ), win AS (
      SELECT day, n_events,
             SUM(n_events) OVER (ORDER BY day
               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS s,
             COUNT(*) OVER (ORDER BY day
               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS w,
             CAST(isodow(day) - 1 AS BIGINT) AS dow
      FROM daily
    ), seas AS (
      SELECT dow,
             SUM(420 * n_events - (420 // w) * s) AS sc,
             COUNT(*) AS cd
      FROM win GROUP BY dow
    )
    SELECT win.day,
           CAST(win.n_events AS BIGINT) AS n_events,
           ROUND(CAST(win.s AS DOUBLE) / win.w, 6) AS trend,
           ROUND(CAST(seas.sc AS DOUBLE) / (420.0 * seas.cd), 6)
             AS seasonal,
           ROUND(CAST(win.n_events AS DOUBLE)
                 - CAST(win.s AS DOUBLE) / win.w
                 - CAST(seas.sc AS DOUBLE) / (420.0 * seas.cd), 6)
             AS residual
    FROM win JOIN seas USING (dow)
    ORDER BY win.day
    """,
)
def q225_seasonal_decomposition(spark, sf_dir):
    """Classical additive seasonal decomposition of the daily event
    curve (timeseries.seasonal_decompose, +-3-day trend window):
    trend / weekday-seasonal / residual per densified calendar day —
    the diagnostic separating weekday shape from level shifts
    before the anomaly gates (q209 MAD days, q205 CUSUM) fire, and
    the structural complement of the seasonal-naive backtest
    (q211).

    Exactness: every window width w in [4,7] divides 420, so the
    scaled detrended value 420*n - (420//w)*S stays INTEGER and the
    weekday sums are exact; trend/seasonal/residual are single
    double trees ROUND(.,6) (the q161 float policy).

    Scale shape: one day-keyed map-side-combined groupBy is the
    only corpus-sized work; windows, the 7-row weekday aggregate
    and the join-back run over #days-bounded frames (the q211
    posture)."""
    from product_etl_spark.operators.timeseries import seasonal_decompose

    ev = _t(spark, sf_dir, "events")
    return seasonal_decompose(ev, "ts", half_window=3)
