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
from product_etl_spark.plans.catalog import _t, register

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
