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
             CASE WHEN pos > COALESCE(MAX(pos + 7) OVER (
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
             CASE WHEN pos > COALESCE(MAX(pos + 7) OVER (
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
