"""Seventeenth extension catalog (q233+): round-15 additions — the
contingency/parametric statistics rungs next to the rank-test family
(chi-squared independence + Cramer's V, Welch's t) and the C4
line-filter battery downstream of the new HTML->text extraction.

Reference parity note: the reference (pandas+psycopg2 row loops,
ETL.py / main.py) computes none of this; these rows extend the
training-data-pipeline surface per the build brief.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from product_etl_spark.plans.catalog import _t, register


@register(
    "q233_chi_square_priority_status",
    r"""
    WITH obs AS (
      SELECT o_orderpriority AS a, o_orderstatus AS b FROM orders
      WHERE o_orderpriority IS NOT NULL AND o_orderstatus IS NOT NULL
    ), cells AS (
      SELECT a, b, COUNT(*) AS o FROM obs GROUP BY a, b
    ), rm AS (
      SELECT a, COUNT(*) AS rr FROM obs GROUP BY a
    ), cm AS (
      SELECT b, COUNT(*) AS cc FROM obs GROUP BY b
    ), tot AS (
      SELECT COUNT(*) AS n FROM obs
    ), grid AS (
      SELECT rm.a, cm.b, rm.rr, cm.cc, COALESCE(cells.o, 0) AS o, tot.n
      FROM rm CROSS JOIN cm
      LEFT JOIN cells ON cells.a = rm.a AND cells.b = cm.b
      CROSS JOIN tot
    ), terms AS (
      SELECT n,
             CAST(ROUND(
               (CAST(o AS DOUBLE) * CAST(n AS DOUBLE)
                  - CAST(rr AS DOUBLE) * CAST(cc AS DOUBLE))
               * (CAST(o AS DOUBLE) * CAST(n AS DOUBLE)
                  - CAST(rr AS DOUBLE) * CAST(cc AS DOUBLE))
               / (CAST(n AS DOUBLE) * CAST(rr AS DOUBLE)
                  * CAST(cc AS DOUBLE)), 6) AS DECIMAL(38,6)) AS t
      FROM grid
    ), agg AS (
      SELECT n, SUM(t) AS chi2 FROM terms GROUP BY n
    ), d AS (
      SELECT (SELECT COUNT(*) FROM rm) AS ra,
             (SELECT COUNT(*) FROM cm) AS cb
    )
    SELECT CAST(n AS BIGINT) AS n,
           CAST((ra - 1) * (cb - 1) AS BIGINT) AS dof,
           CAST(chi2 AS DOUBLE) AS chi2,
           CASE WHEN (ra - 1) * (cb - 1) > 0 THEN
             ROUND(SQRT(CAST(chi2 AS DOUBLE)
               / (CAST(n AS DOUBLE)
                  * CAST(LEAST(ra - 1, cb - 1) AS DOUBLE))), 6)
           END AS cramers_v
    FROM agg CROSS JOIN d
    """,
)
def q233_chi_square_priority_status(spark, sf_dir):
    """Chi-squared independence of order priority vs order status
    (profile.chi_square_independence) with Cramer's V — the
    contingency rung next to the rank tests: "are these two corpus
    labelings associated?". Engine-exact by the kruskal float
    policy: integer counts decide everything, each cell's
    (oN - rc)^2/(Nrc) term is ONE double tree ROUND(.,6)ed
    (operands cast to double BEFORE the multiplies — no integer
    overflow at any scale), chi2 is the DECIMAL(38,6) sum of
    rounded terms; zero cells contribute their expected count via
    the margin grid, not nothing.

    Scale shape: three map-side groupBys + a 1-row total; the grid
    is vocabulary x vocabulary (category-bounded); every grid join
    is broadcast-sized. One output row."""
    from product_etl_spark.operators.profile import chi_square_independence

    o = _t(spark, sf_dir, "orders")
    return chi_square_independence(o, "o_orderpriority", "o_orderstatus")


@register(
    "q234_c4_line_filters",
    r"""
    WITH tok AS (
      SELECT doc_id,
             list_filter(string_split_regex(COALESCE(text,''), '\s+'),
                         x -> x <> '') AS t
      FROM documents
    ), f AS (
      SELECT doc_id,
             array_to_string(t[1:6], ' ') AS a,
             array_to_string(t[4:7], ' ') AS e
      FROM tok WHERE LEN(t) >= 21
    )
    SELECT doc_id,
           a || '.' || chr(10) || e || '!' AS text,
           CAST(2 AS BIGINT) AS n_lines_kept,
           CAST(5 AS BIGINT) AS n_lines
    FROM f ORDER BY doc_id
    """,
)
def q234_c4_line_filters(spark, sf_dir):
    """C4 line-level cleaning (functions/text.c4_line_filters;
    Raffel et al. 2020 §2.2) on deterministic five-line documents
    built from each doc's tokens: a terminal-punctuated 6-word line
    (kept), a 2-word line (dropped: min_words), a 5-word line
    poisoned with ' javascript.' (dropped: marker), an 8-word line
    with no terminal punctuation (dropped), and an indented 4-word
    '!' line (kept, trimmed). The oracle CONSTRUCTS the expected
    kept text and counts independently from the same tokens (the
    q231/q135 pattern) — it never runs the filter.

    Scale shape: pure higher-order array expressions per row —
    map-only, zero shuffles; composes with html_to_text into one
    map stage."""
    from product_etl_spark.functions import text as T_
    from product_etl_spark.functions.text import c4_line_filters

    d = _t(spark, sf_dir, "documents")
    toks = d.select("doc_id", T_.tokens("text").alias("t")).filter(
        F.size("t") >= 21
    )
    a = F.array_join(F.slice("t", 1, 6), " ")
    b = F.array_join(F.slice("t", 7, 2), " ")
    c = F.array_join(F.slice("t", 9, 5), " ")
    d4 = F.array_join(F.slice("t", 14, 8), " ")
    e = F.array_join(F.slice("t", 4, 4), " ")
    built = F.concat_ws(
        "\n",
        F.concat(a, F.lit(".")),
        b,
        F.concat(c, F.lit(" javascript.")),
        d4,
        F.concat(F.lit("  "), e, F.lit("!")),
    )
    out = toks.select("doc_id", c4_line_filters(built).alias("_s"))
    return out.select(
        "doc_id",
        F.col("_s.text").alias("text"),
        F.col("_s.n_lines_kept").alias("n_lines_kept"),
        F.col("_s.n_lines").alias("n_lines"),
    ).orderBy("doc_id")


@register(
    "q235_welch_t_acctbal",
    r"""
    WITH obs AS (
      SELECT c_mktsegment AS g, CAST(c_acctbal AS DECIMAL(28,6)) AS v
      FROM customer
      WHERE c_acctbal IS NOT NULL
        AND c_mktsegment IN ('BUILDING', 'MACHINERY')
    ), m AS (
      SELECT g, COUNT(*) AS n, SUM(v) AS s, SUM(v * v) AS ss
      FROM obs GROUP BY g
    ), sides AS (
      SELECT
        (SELECT n FROM m WHERE g = 'BUILDING') AS na,
        (SELECT CAST(s AS DOUBLE) FROM m WHERE g = 'BUILDING') AS sa,
        (SELECT CAST(ss AS DOUBLE) FROM m WHERE g = 'BUILDING') AS ssa,
        (SELECT n FROM m WHERE g = 'MACHINERY') AS nb,
        (SELECT CAST(s AS DOUBLE) FROM m WHERE g = 'MACHINERY') AS sb,
        (SELECT CAST(ss AS DOUBLE) FROM m WHERE g = 'MACHINERY') AS ssb
    ), trees AS (
      SELECT na, nb,
             sa / CAST(na AS DOUBLE) AS ma,
             sb / CAST(nb AS DOUBLE) AS mb,
             (ssa - sa * sa / CAST(na AS DOUBLE))
               / (CAST(na AS DOUBLE) - 1.0) AS va,
             (ssb - sb * sb / CAST(nb AS DOUBLE))
               / (CAST(nb AS DOUBLE) - 1.0) AS vb
      FROM sides
    ), se AS (
      SELECT na, nb, ma, mb, va, vb,
             va / CAST(na AS DOUBLE) + vb / CAST(nb AS DOUBLE) AS se2
      FROM trees
    )
    SELECT CAST(COALESCE(na, 0) AS BIGINT) AS n_a,
           CAST(COALESCE(nb, 0) AS BIGINT) AS n_b,
           ROUND(ma, 6) AS mean_a,
           ROUND(mb, 6) AS mean_b,
           CASE WHEN na >= 2 AND nb >= 2 AND se2 > 0.0 THEN
             ROUND((ma - mb) / SQRT(se2), 6) END AS t,
           CASE WHEN na >= 2 AND nb >= 2 AND se2 > 0.0 THEN
             ROUND((se2 * se2) / (
               (va / CAST(na AS DOUBLE)) * (va / CAST(na AS DOUBLE))
                 / (CAST(na AS DOUBLE) - 1.0)
               + (vb / CAST(nb AS DOUBLE)) * (vb / CAST(nb AS DOUBLE))
                 / (CAST(nb AS DOUBLE) - 1.0)), 6) END AS df_welch
    FROM se
    """,
)
def q235_welch_t_acctbal(spark, sf_dir):
    """Welch's unequal-variance t-test on account balances between
    the BUILDING and MACHINERY segments (profile.welch_t_test) —
    the parametric mean-comparison rung next to the q223/q230 rank
    tests. Engine-exact by the q102/q161 moment recipe: per-group
    (n, SUM(v), SUM(v*v)) aggregate as exact decimals; mean, var,
    t and the Welch-Satterthwaite df are single deterministic IEEE
    double trees over those decided sums, ROUND(.,6)ed — the oracle
    spells out the SAME trees, so no float-summation order enters
    the hash on either side.

    Scale shape: ONE map-side-combined groupBy, two 1-row broadcast
    sides. One output row."""
    from product_etl_spark.operators.profile import welch_t_test

    c = _t(spark, sf_dir, "customer")
    return welch_t_test(c, "c_acctbal", "c_mktsegment", "BUILDING", "MACHINERY")


@register(
    "q236_c4_document_filters",
    r"""
    WITH tok AS (
      SELECT doc_id,
             list_filter(string_split_regex(COALESCE(text,''), '\s+'),
                         x -> x <> '') AS t
      FROM documents
    )
    SELECT doc_id,
           CAST(CASE doc_id % 3 WHEN 2 THEN 1 ELSE 3 END AS BIGINT)
             AS n_sentences,
           doc_id % 3 = 1 AS has_lorem_ipsum,
           FALSE AS has_curly_brace,
           doc_id % 3 = 0 AS keep
    FROM tok WHERE LEN(t) >= 12
    ORDER BY doc_id
    """,
)
def q236_c4_document_filters(spark, sf_dir):
    """C4 document-level flags (functions/text.c4_document_filters)
    on three deterministic per-doc variants: doc_id % 3 = 0 builds a
    clean three-sentence document (kept), % 3 = 1 injects the
    'lorem ipsum' placeholder between sentences (three sentences,
    still dropped), % 3 = 2 keeps a single sentence (dropped:
    sentence minimum). The oracle derives every flag from the
    doc_id arithmetic alone (independent derivation — it never
    counts sentences or searches placeholders).

    Scale shape: pure expressions per row — map-only, zero
    shuffles; the last rung of the html_to_text -> c4_line_filters
    -> c4_document_filters single-stage cleaning chain."""
    from product_etl_spark.functions import text as T_
    from product_etl_spark.functions.text import c4_document_filters

    d = _t(spark, sf_dir, "documents")
    toks = d.select("doc_id", T_.tokens("text").alias("t")).filter(
        F.size("t") >= 12
    )
    s1 = F.concat(F.array_join(F.slice("t", 1, 4), " "), F.lit("."))
    s2 = F.concat(F.array_join(F.slice("t", 5, 4), " "), F.lit("."))
    s3 = F.concat(F.array_join(F.slice("t", 9, 4), " "), F.lit("."))
    built = (
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat_ws(" ", s1, s2, s3),
        )
        .when(
            F.col("doc_id") % 3 == 1,
            F.concat_ws(" ", s1, F.lit("lorem ipsum"), s2, s3),
        )
        .otherwise(s1)
    )
    out = toks.select("doc_id", c4_document_filters(built).alias("_s"))
    return out.select(
        "doc_id",
        F.col("_s.n_sentences").alias("n_sentences"),
        F.col("_s.has_lorem_ipsum").alias("has_lorem_ipsum"),
        F.col("_s.has_curly_brace").alias("has_curly_brace"),
        F.col("_s.keep").alias("keep"),
    ).orderBy("doc_id")
