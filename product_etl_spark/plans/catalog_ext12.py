"""Twelfth extension catalog (q177+): round-10 additions — the
exact-substring dedup REMOVAL rung (q177, completing the q29 whole-doc
/ q136 within-doc / q147 cross-doc-flag ladder with actual excision),
plus the edit-distance and sorted-neighborhood blocking families.

Every entry keeps the repo invariants: identical column names/aliases
between the Spark plan and the DuckDB oracle, integer-decided ranks,
decimal sums surfaced as DOUBLE/BIGINT only (never Decimal), and a
`Scale shape:` audit in each docstring.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from product_etl_spark.plans.catalog import _t, register


@register(
    "q177_duplicate_span_excision",
    r"""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split_regex(LOWER(COALESCE(text,'')), '\s+'),
                         x -> x <> '') AS ltoks,
             list_filter(string_split_regex(COALESCE(text,''), '\s+'),
                         x -> x <> '') AS otoks
      FROM documents
    ), g AS (
      SELECT doc_id, r.i - 1 AS pos,
             array_to_string(ltoks[r.i:r.i+4], ' ') AS gram
      FROM t, LATERAL (SELECT UNNEST(range(1, LEN(ltoks) - 3)) AS i) r
      WHERE LEN(ltoks) >= 5
    ), dupg AS (
      SELECT gram, MIN(doc_id) AS keep
      FROM g GROUP BY gram HAVING COUNT(DISTINCT doc_id) >= 2
    ), rem AS (
      SELECT DISTINCT g.doc_id, g.pos + d.o AS pos
      FROM g JOIN dupg ON g.gram = dupg.gram AND g.doc_id <> dupg.keep,
           LATERAL (SELECT UNNEST(range(0, 5)) AS o) d
    ), tokpos AS (
      SELECT doc_id, r.i - 1 AS pos, otoks[r.i] AS tok
      FROM t, LATERAL (SELECT UNNEST(range(1, LEN(otoks) + 1)) AS i) r
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
    """,
)
def q177_duplicate_span_excision(spark, sf_dir):
    """Exact-substring dedup END-TO-END (operators/dedup.
    remove_duplicate_spans; Lee et al. 2022): excise every maximal
    cross-document duplicated 5-gram span, keeping the lowest-id
    document's copy canonical — the REMOVAL rung completing the
    verbatim-repetition ladder (q29 whole-doc, q136 within-doc
    paragraphs, q147 flags coverage, this excises). Token positions
    covered by a duplicated non-keeper gram are dropped; text_clean
    is the surviving original-case tokens (whitespace normalizes,
    token count exact).

    Scale shape: one gram-keyed groupBy (map-side combine,
    vocab-shaped after), equi-join back that only duplicated
    occurrences survive, n-bounded sequence explode, one
    (id,pos)-keyed anti-join, one doc-sized per-doc groupBy. No
    self-join, no corpus-wide window; pytest pins equivalence with a
    brute-force reference on seeded random corpora
    (tests/test_span_excision.py)."""
    from product_etl_spark.operators.dedup import remove_duplicate_spans

    d = _t(spark, sf_dir, "documents")
    return remove_duplicate_spans(d, "text", "doc_id", n=5, min_df=2)


@register(
    "q178_selfrep_span_excision",
    r"""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split_regex(LOWER(COALESCE(text,'')), '\s+'),
                         x -> x <> '') AS ltoks,
             list_filter(string_split_regex(COALESCE(text,''), '\s+'),
                         x -> x <> '') AS otoks
      FROM documents
    ), g AS (
      SELECT doc_id, r.i - 1 AS pos,
             array_to_string(ltoks[r.i:r.i+4], ' ') AS gram
      FROM t, LATERAL (SELECT UNNEST(range(1, LEN(ltoks) - 3)) AS i) r
      WHERE LEN(ltoks) >= 5
    ), rep AS (
      SELECT doc_id, gram, MIN(pos) AS first
      FROM g GROUP BY doc_id, gram HAVING COUNT(*) >= 2
    ), occ AS (
      SELECT g.doc_id, g.pos, rep.first
      FROM g JOIN rep ON g.doc_id = rep.doc_id AND g.gram = rep.gram
    ), ca AS (
      SELECT DISTINCT doc_id, pos + d.o AS pos
      FROM occ, LATERAL (SELECT UNNEST(range(0, 5)) AS o) d
    ), cf AS (
      SELECT DISTINCT doc_id, pos + d.o AS pos
      FROM occ, LATERAL (SELECT UNNEST(range(0, 5)) AS o) d
      WHERE occ.pos = occ.first
    ), rem AS (
      SELECT ca.doc_id, ca.pos
      FROM ca LEFT JOIN cf ON ca.doc_id = cf.doc_id AND ca.pos = cf.pos
      WHERE cf.pos IS NULL
    ), tokpos AS (
      SELECT doc_id, r.i - 1 AS pos, otoks[r.i] AS tok
      FROM t, LATERAL (SELECT UNNEST(range(1, LEN(otoks) + 1)) AS i) r
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
    """,
)
def q178_selfrep_span_excision(spark, sf_dir):
    """WITHIN-document repeated-span excision (operators/dedup.
    remove_repeated_spans_within_doc): for every 5-gram a document
    repeats, the FIRST occurrence survives and later occurrences are
    excised (a token goes iff covered only by non-first occurrences —
    so an overlapping run collapses to exactly one canonical copy).
    The removal rung for q144's dup_ngram_fraction flag; catches
    sub-paragraph self-repetition q136's paragraph dedup misses.

    Scale shape: everything keyed by doc id — one (id, gram) groupBy
    (map-side combine), join back on (id, gram), n-bounded explodes,
    (id,pos) anti-joins, doc-sized reconstruction. NO cross-document
    shuffle; pytest pins equivalence with a brute-force reference
    (tests/test_span_excision.py)."""
    from product_etl_spark.operators.dedup import (
        remove_repeated_spans_within_doc,
    )

    d = _t(spark, sf_dir, "documents")
    return remove_repeated_spans_within_doc(d, "text", "doc_id", n=5)


@register(
    "q179_l_diversity_audit",
    """
    SELECT c_nationkey, c_mktsegment,
           COUNT(*) AS n_rows,
           COUNT(DISTINCT CAST(FLOOR(CAST(c_acctbal AS DOUBLE) / 1000.0)
                               AS INT)) AS n_sensitive
    FROM customer
    GROUP BY 1, 2
    HAVING COUNT(DISTINCT CAST(FLOOR(CAST(c_acctbal AS DOUBLE) / 1000.0)
                               AS INT)) < 8
    """,
)
def q179_l_diversity_audit(spark, sf_dir):
    """l-diversity audit (operators/privacy.l_diversity_report) —
    the companion gate to q140's k-anonymity: a quasi-identifier
    group can be large (k-anonymous) yet still leak if everyone in
    it shares the same sensitive value. Here: (nation, segment)
    groups whose members' balance bands take fewer than l=8 distinct
    values — homogeneous groups an attacker can infer a member's
    band from. Empty result == the release is l-diverse.

    Scale shape: ONE groupBy over the quasi-identifiers with a
    distinct-count (partial aggregation map-side); the report is
    quasi-space-bounded, never corpus-bounded."""
    from product_etl_spark.operators.privacy import l_diversity_report

    cu = _t(spark, sf_dir, "customer").withColumn(
        "acctbal_band",
        F.floor(F.col("c_acctbal").cast("double") / F.lit(1000.0)).cast(
            "int"
        ),
    )
    return l_diversity_report(
        cu, ["c_nationkey", "c_mktsegment"], "acctbal_band", l=8
    )
