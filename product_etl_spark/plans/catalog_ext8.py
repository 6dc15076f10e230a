"""Eighth extension catalog (q137+): entity resolution, importance-
weighted data selection, distribution drift, privacy auditing, and
graph triangle counting.

Reference parity note: the reference links records by EXACT natural
key only (SKU/master_code equality in the importer upsert and the
products_all split) and publishes per-product CSV/PDF exports with no
release gate — q137 generalizes the linkage to noisy keys
(Fellegi–Sunter blocking + edit-distance match), q140 adds the
k-anonymity audit a user-data export needs. q138 (DSIR importance
scores) and q139 (PSI drift) extend the training-data curation and
feed-monitoring families.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from product_etl_spark.operators.graph import triangle_count
from product_etl_spark.operators.importance import importance_scores
from product_etl_spark.operators.linkage import edit_distance_pairs
from product_etl_spark.operators.privacy import k_anonymity_report
from product_etl_spark.operators.profile import population_stability_index
from product_etl_spark.plans.catalog import _t, register

_TS = lambda s: F.lit(s).cast("timestamp")  # noqa: E731


@register(
    "q137_entity_resolution_pairs",
    """
    WITH base AS (
      SELECT p_partkey AS k, p_name AS name, p_partkey % 10 AS blk
      FROM part WHERE p_partkey < 300
    ),
    recs AS (
      SELECT k * 2 AS rid, name, blk FROM base
      UNION ALL
      SELECT k * 2 + 1 AS rid,
             substr(name, 1, 2) || substr(name, 4) AS name, blk
      FROM base
    )
    SELECT a.rid AS id_a, b.rid AS id_b,
           levenshtein(a.name, b.name) AS dist
    FROM recs a JOIN recs b ON a.blk = b.blk AND a.rid < b.rid
    WHERE levenshtein(a.name, b.name) <= 2
    """,
)
def q137_entity_resolution_pairs(spark, sf_dir):
    """Record linkage (operators/linkage.py): two records per part —
    the original name and a one-character-deleted variant (the
    q132/q135 deterministic-synthesis pattern) — blocked on a
    10-bucket key shared by each variant pair, matched by Levenshtein
    distance <= 2. The planted pairs surface at distance 1; any
    accidental near-matches between different parts match identically
    in both engines because edit distance is exact and integer.

    Full transitive clustering (resolve_entities: connected
    components over the match pairs) is iterative — pytest-verified
    with planted multi-record clusters in tests/test_linkage.py.

    Scale shape: the pair join is bounded by the BLOCK (O(sum
    block^2), never corpus^2); levenshtein is JVM codegen evaluated
    only on candidates; multi-key blocking unions pair sets.
    """
    p = _t(spark, sf_dir, "part")
    base = p.filter(F.col("p_partkey") < 300).select(
        F.col("p_partkey").alias("k"),
        F.col("p_name").alias("name"),
        (F.col("p_partkey") % 10).alias("blk"),
    )
    recs = base.select(
        (F.col("k") * 2).alias("rid"), "name", "blk"
    ).unionByName(
        base.select(
            (F.col("k") * 2 + 1).alias("rid"),
            F.concat(
                F.substring("name", 1, 2), F.expr("substring(name, 4)")
            ).alias("name"),
            F.col("blk"),
        )
    )
    return edit_distance_pairs(
        recs, "rid", "name", ["blk"], max_dist=2
    ).select("id_a", "id_b", "dist")


@register(
    "q138_dsir_importance",
    r"""
    WITH tok AS (
      SELECT doc_id, lang, UNNEST(
        list_filter(string_split_regex(LOWER(COALESCE(text,'')), '\s+'),
                    x -> x <> '')) AS tok
      FROM documents
    ),
    tb AS (
      SELECT doc_id, lang,
             ('0x' || substr(md5(tok), 1, 15))::BIGINT % 1024 AS bucket
      FROM tok
    ),
    doc AS (SELECT doc_id, bucket, COUNT(*) AS n FROM tb GROUP BY 1, 2),
    tcnt AS (SELECT bucket, COUNT(*) AS n_t FROM tb WHERE lang = 'en'
             GROUP BY 1),
    rcnt AS (SELECT bucket, COUNT(*) AS n_r FROM tb GROUP BY 1),
    tot AS (SELECT (SELECT COUNT(*) FROM tb WHERE lang = 'en')::DOUBLE AS nt,
                   (SELECT COUNT(*) FROM tb)::DOUBLE AS nr),
    ratio AS (
      SELECT r.bucket,
             LN((COALESCE(t.n_t, 0) + 1)::DOUBLE / (tot.nt + 1024))
               - LN((r.n_r + 1)::DOUBLE / (tot.nr + 1024)) AS logratio
      FROM rcnt r LEFT JOIN tcnt t USING (bucket) CROSS JOIN tot
    )
    SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_tokens,
           ROUND(SUM(n::DOUBLE * logratio) / SUM(n)::DOUBLE, 4) AS score
    FROM doc JOIN ratio USING (bucket)
    GROUP BY doc_id
    ORDER BY score DESC, doc_id
    LIMIT 50
    """,
)
def q138_dsir_importance(spark, sf_dir):
    """DSIR importance-weighted data selection (operators/
    importance.py; Xie et al., NeurIPS 2023): every document scored
    by the token-averaged log importance weight of its hashed-unigram
    features under TARGET (the English slice — the q113 train-slice
    precedent) vs RAW (the whole pool); top-50 most target-like
    returned. Bucket ids are portable md5 hashes (text.hash64), so
    the oracle reproduces them bit-for-bit.

    Scale shape: feature tables bounded by n_buckets=1024 rows
    (map-side-combined counts), ratio table broadcast, two corpus
    passes total, zero Python. Float policy: per-doc AVG of doubles,
    ROUND(.,4) at the surface, ordering on the rounded value with
    doc_id tie-break (q113/q133).
    """
    d = _t(spark, sf_dir, "documents")
    target = d.filter(F.col("lang") == "en")
    return (
        importance_scores(d, target, "text", "doc_id", n_buckets=1024)
        .orderBy(F.desc("score"), "doc_id")
        .limit(50)
    )


@register(
    "q139_price_psi_drift",
    """
    WITH e AS (SELECT CAST(o_totalprice AS DOUBLE) AS v FROM orders
               WHERE o_orderdate < TIMESTAMP '1997-01-01 00:00:00'),
    a AS (SELECT CAST(o_totalprice AS DOUBLE) AS v FROM orders
          WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'),
    st AS (SELECT MIN(v) AS lo, MAX(v) AS hi FROM e),
    eb AS (SELECT CAST(GREATEST(0, LEAST(9,
             FLOOR((v - lo) / ((hi - lo) / 10.0)))) AS INT) AS bin,
           COUNT(*) AS n_expected FROM e, st GROUP BY 1),
    ab AS (SELECT CAST(GREATEST(0, LEAST(9,
             FLOOR((v - lo) / ((hi - lo) / 10.0)))) AS INT) AS bin,
           COUNT(*) AS n_actual FROM a, st GROUP BY 1),
    tot AS (SELECT (SELECT SUM(n_expected) FROM eb)::DOUBLE AS te,
                   (SELECT SUM(n_actual) FROM ab)::DOUBLE AS ta)
    SELECT COALESCE(eb.bin, ab.bin) AS bin,
           COALESCE(eb.n_expected, 0) AS n_expected,
           COALESCE(ab.n_actual, 0) AS n_actual,
           ROUND(((COALESCE(ab.n_actual, 0) + 1)::DOUBLE / (tot.ta + 10.0)
                  - (COALESCE(eb.n_expected, 0) + 1)::DOUBLE / (tot.te + 10.0))
                 * (LN((COALESCE(ab.n_actual, 0) + 1)::DOUBLE / (tot.ta + 10.0))
                    - LN((COALESCE(eb.n_expected, 0) + 1)::DOUBLE
                         / (tot.te + 10.0))), 6) AS psi_term
    FROM eb FULL OUTER JOIN ab ON ab.bin = eb.bin CROSS JOIN tot
    """,
)
def q139_price_psi_drift(spark, sf_dir):
    """Population Stability Index between the pre-1997 order-price
    distribution (baseline) and 1997+ (current) — the
    distribution-shaped drift gate next to q130's keyed snapshot diff
    and profile_drift's summary stats (a mean can hold still while
    the shape migrates). Per-bin PSI contributions; total PSI =
    SUM(psi_term), gated at the usual 0.1/0.25 thresholds.

    Scale shape (operators/profile.population_stability_index): one
    1-row min/max over the baseline (broadcast), one map-side-
    combined groupBy(bin) per snapshot — at most n_bins rows ever
    shuffle. Laplace-smoothed fractions keep empty bins finite. Float
    policy: fixed IEEE op order per row, ROUND(.,6) at the surface.
    """
    o = _t(spark, sf_dir, "orders")
    cut = _TS("1997-01-01 00:00:00")
    expected = o.filter(F.col("o_orderdate") < cut).select("o_totalprice")
    actual = o.filter(F.col("o_orderdate") >= cut).select("o_totalprice")
    return population_stability_index(expected, actual, "o_totalprice", 10)


@register(
    "q140_k_anonymity_audit",
    """
    SELECT c_nationkey, c_mktsegment,
           CAST(FLOOR(CAST(c_acctbal AS DOUBLE) / 2000.0) AS INT)
             AS acctbal_band,
           COUNT(*) AS n_rows,
           COUNT(DISTINCT c_custkey) AS n_sensitive
    FROM customer
    GROUP BY 1, 2, 3
    HAVING COUNT(*) < 3
    """,
)
def q140_k_anonymity_audit(spark, sf_dir):
    """k-anonymity audit (operators/privacy.py) over the customer
    release surface: quasi-identifiers (nation, market segment,
    coarse balance band) — every combination shared by fewer than
    k=3 rows is a re-identification risk the publish job must
    generalize or suppress before export. The reference exports
    per-entity CSV/PDF fan-outs with no such gate.

    Scale shape: ONE groupBy over the quasi-identifiers (map-side
    partial agg); the report is bounded by the quasi-space, not the
    corpus.
    """
    cu = _t(spark, sf_dir, "customer")
    banded = cu.withColumn(
        "acctbal_band",
        F.floor(F.col("c_acctbal").cast("double") / F.lit(2000.0)).cast("int"),
    )
    return k_anonymity_report(
        banded,
        ["c_nationkey", "c_mktsegment", "acctbal_band"],
        k=3,
        sensitive_col="c_custkey",
    )


@register(
    "q141_copurchase_triangles",
    """
    WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
                FROM lineitem),
    e AS (SELECT x.p AS a, y.p AS b, COUNT(*) AS w
          FROM op x JOIN op y USING (o) WHERE x.p < y.p
          GROUP BY 1, 2),
    e2 AS (SELECT a, b FROM e WHERE w >= 2)
    SELECT COUNT(*) AS n_triangles
    FROM e2 e1
    JOIN e2 x2 ON x2.a = e1.b
    JOIN e2 x3 ON x3.a = e1.a AND x3.b = x2.b
    """,
)
def q141_copurchase_triangles(spark, sf_dir):
    """Triangle count of the co-purchase graph: parts are nodes,
    edges join parts bought together in >= 2 distinct orders (the
    weight floor keeps the graph non-trivial), and the triangle count
    is the standard clustering/community signal (bundle detection).

    Scale shape (operators/graph.triangle_count): degree-ordered
    node-iterator — every edge oriented low-(degree,id) ->
    high-(degree,id), so wedge fan-out is O(sqrt(m)) even on
    power-law co-purchase graphs (a bestseller part contributes
    wedges at its out-degree, not its raw degree); the oracle's
    id-ordered 3-way join counts the same triangles (each once) —
    two independent derivations of one invariant. Edge building is
    bounded by the per-order basket size (O(sum basket^2)), the
    blocked-pairs contract.
    """
    li = _t(spark, sf_dir, "lineitem")
    # Basket pairs by collect-and-explode (r15, guide §2.3/§2.4) —
    # the q203 shape: ONE groupBy(order) with map-side collect_set
    # dedup replaces distinct + order-keyed self-join (three shuffles
    # of the item rows); the sorted array yields each a < b pair
    # positionally, identical counts.
    arr = (
        li.filter(F.col("l_orderkey").isNotNull())
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .groupBy("o")
        .agg(F.sort_array(F.collect_set("p")).alias("_arr"))
    )
    # posexplode-then-slice (r16, ADVICE r15): anchor index first,
    # O(basket) successor slice per row — never the whole O(basket^2)
    # pair array in one row (the basket.py shape, applied here too)
    edges = (
        arr.select(F.posexplode("_arr").alias("_i", "a"), F.col("_arr"))
        .select(
            "a",
            F.explode(F.expr("slice(_arr, _i + 2, size(_arr))")).alias("b"),
        )
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= 2)
    )
    return triangle_count(edges, "a", "b")
