"""Similarity search over embedding columns (array<float>).

- ``knn_bruteforce``: exact cosine top-k — broadcast the query set
  against the fully-partitioned corpus; per-query top-k via window.
  The corpus side never shuffles: at 100 TB this is a map + window
  over query-id partitions (queries are small by construction).
- ``lsh_assign_buckets`` / ``knn_lsh``: random-hyperplane LSH — the
  scale path. Vectors hash to 2^planes buckets by dot-product sign
  against deterministic hyperplanes; queries probe only their bucket,
  cutting the candidate set ~2^planes-fold with the usual recall
  trade-off (probe neighboring buckets for higher recall).

Hyperplanes are md5-derived constants (portable + reproducible in
the DuckDB oracle); vector math is zip_with/aggregate — JVM-side,
no UDF.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from product_etl_spark.functions import vectors as V


def hyperplanes(n_planes: int = 4, dim: int = 64) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes in [-1,1]^dim, derived
    from md5 so any engine/language reproduces them exactly."""
    planes = []
    for p in range(n_planes):
        row = []
        for j in range(dim):
            h = int(hashlib.md5(f"plane{p},{j}".encode()).hexdigest()[:8], 16)
            row.append(round((h % 2001) / 1000.0 - 1.0, 3))
        planes.append(row)
    return planes


def bucket_expr(emb_col: str, planes: list[list[float]]):
    bucket = None
    for p, row in enumerate(planes):
        w = F.array(*[F.lit(v) for v in row])
        term = F.when(V.dot(emb_col, w) > 0, F.lit(2**p)).otherwise(F.lit(0))
        bucket = term if bucket is None else bucket + term
    return bucket.cast("int")


def lsh_assign_buckets(
    df: DataFrame, emb_col: str, n_planes: int = 4, dim: int = 64
) -> DataFrame:
    return df.withColumn("bucket", bucket_expr(emb_col, hyperplanes(n_planes, dim)))


def knn_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    emb_col: str,
    id_col: str,
    query_id_col: str = "query_id",
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, cos_sim).

    ``queries`` must be small (it is broadcast); ``corpus`` scale is
    unbounded. Ties broken by neighbor id for determinism.
    """
    # Norms hoisted to the per-row projections (1x per vector) so the
    # interpreted aggregate runs once per PAIR (the dot), not three
    # times — identical IEEE ops, ~3x less expression work.
    q = queries.select(
        F.col(id_col).alias(query_id_col),
        F.col(emb_col).alias("_q_emb"),
        V.norm(emb_col).alias("_q_norm"),
    )
    sims = corpus.withColumn("_c_norm", V.norm(emb_col)).join(
        F.broadcast(q), F.col(id_col) != F.col(query_id_col)
    ).select(
        query_id_col,
        F.col(id_col).alias("neighbor_id"),
        (V.dot("_q_emb", emb_col) / (F.col("_q_norm") * F.col("_c_norm"))).alias("sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        sims.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(query_id_col, "neighbor_id", F.round("sim", 4).alias("cos_sim"))
    )


def ivf_centroids(corpus: DataFrame, emb_col: str, id_col: str, n_lists: int = 4):
    """Deterministic IVF coarse centroids: the ``n_lists``
    lowest-id vectors act as seed centroids (a real deployment runs
    k-means; the assignment/probe machinery is identical and the
    deterministic seed keeps the oracle reproducible).

    Scale shape: ``orderBy(id).limit(n)`` plans as
    TakeOrderedAndProject (parallel per-partition top-k, no total
    sort); the row_number window that assigns list_id then runs over
    the ≤ n_lists surviving rows — dimension-sized at any corpus
    scale, never over the corpus itself."""
    seeds = corpus.orderBy(F.col(id_col)).limit(n_lists)
    w = Window.orderBy(F.col(id_col))
    return seeds.select(
        (F.row_number().over(w) - 1).alias("list_id"),
        F.col(emb_col).alias("centroid"),
    )


def ivf_centroids_kmeans(
    corpus: DataFrame,
    emb_col: str,
    id_col: str,
    n_lists: int = 4,
    n_iters: int = 5,
) -> DataFrame:
    """Distributed Lloyd's k-means for real IVF coarse centroids
    (``ivf_centroids`` is the deterministic-seed variant the oracle
    uses; this is the quality path a deployment trains with).

    Per iteration: assign = broadcast-centroids crossJoin +
    min-struct argmin (map-shaped over the corpus); recompute = posexplode ->
    groupBy(list, dim) avg -> reassemble (one shuffle keyed on
    (n_lists × dim) groups). Centroids — k·dim doubles — are
    legitimately driver-state (dimension-sized), collected each
    round so the plan doesn't grow with iterations; empty clusters
    keep their previous centroid. Deterministic: seeds are the
    lowest-id vectors and every step is order-insensitive."""
    spark = corpus.sparkSession
    # One projection, cached across Lloyd's iterations — every round
    # re-reads the full corpus twice (assign + mean), so at any real
    # scale the iteration loop runs over the cached columnar form,
    # not n_iters fresh source scans.
    corpus = corpus.select(id_col, emb_col).persist()
    cents = ivf_centroids(corpus, emb_col, id_col, n_lists)
    # prev mirrors cents driver-side (k·dim floats) so each iteration
    # costs exactly ONE action (means.collect) — cents never needs
    # re-collecting since it was built from prev.
    prev = {r["list_id"]: r["centroid"] for r in cents.collect()}
    for _ in range(n_iters):
        assigned = ivf_assign(corpus, cents, emb_col, id_col).select(
            id_col, "list_id"
        )
        means = (
            corpus.join(assigned, id_col)
            .select("list_id", F.posexplode(emb_col).alias("pos", "val"))
            .groupBy("list_id", "pos")
            .agg(F.avg("val").alias("m"))
            .groupBy("list_id")
            .agg(
                F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("s")
            )
            .select(
                "list_id",
                F.expr("transform(s, x -> cast(x.m as float))").alias("centroid"),
            )
        )
        # materialize k rows on the driver: constant-size, cuts lineage
        for r in means.collect():
            prev[r["list_id"]] = r["centroid"]
        cents = spark.createDataFrame(
            sorted(prev.items()), "list_id int, centroid array<float>"
        )
    corpus.unpersist()
    return cents


def ivf_assign(
    corpus: DataFrame, centroids: DataFrame, emb_col: str, id_col: str
) -> DataFrame:
    """Assign every vector to its nearest (L2) centroid — the IVF
    inverted-list build. Broadcast the centroids, then argmin as a
    ``min(struct(dist, list_id))`` aggregation — ties break toward
    the lower list_id exactly like the former window form, but the
    k-rows-per-vector reduction happens map-side (partial combine)
    instead of in a per-key window sort."""
    joined = corpus.crossJoin(F.broadcast(centroids)).select(
        F.col(id_col),
        "list_id",
        V.l2_distance(emb_col, "centroid").alias("dist"),
    )
    return (
        joined.groupBy(id_col)
        .agg(F.min(F.struct("dist", "list_id")).alias("_best"))
        .select(
            id_col,
            F.col("_best.list_id").alias("list_id"),
            F.round("_best.dist", 4).alias("centroid_dist"),
        )
    )


def knn_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    emb_col: str,
    id_col: str,
    k: int = 5,
    n_lists: int = 4,
) -> DataFrame:
    """IVF-style approximate top-k: probe only the query's nearest
    inverted list (nprobe=1). Candidate set ~|corpus|/n_lists; same
    output schema as knn_bruteforce."""
    cents = ivf_centroids(corpus, emb_col, id_col, n_lists)
    assigned = corpus.join(
        ivf_assign(corpus, cents, emb_col, id_col).select(id_col, "list_id"),
        id_col,
    )
    q_assigned = queries.join(
        ivf_assign(queries, cents, emb_col, id_col).select(id_col, "list_id"),
        id_col,
    ).select(
        F.col(id_col).alias("query_id"),
        F.col(emb_col).alias("_q_emb"),
        V.norm(emb_col).alias("_q_norm"),
        F.col("list_id").alias("_q_list"),
    )
    sims = assigned.withColumn("_c_norm", V.norm(emb_col)).join(
        F.broadcast(q_assigned),
        (F.col("list_id") == F.col("_q_list")) & (F.col(id_col) != F.col("query_id")),
    ).select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        (V.dot("_q_emb", emb_col) / (F.col("_q_norm") * F.col("_c_norm"))).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        sims.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", F.round("sim", 4).alias("cos_sim"))
    )


def knn_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    emb_col: str,
    id_col: str,
    k: int = 5,
    n_planes: int = 4,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: brute-force cosine *within the query's LSH
    bucket only*. Same output schema as knn_bruteforce; recall < 1.0
    by construction, candidate set ~|corpus| / 2^n_planes."""
    planes = hyperplanes(n_planes, dim)
    c = corpus.withColumn("bucket", bucket_expr(emb_col, planes))
    q = queries.withColumn("_q_bucket", bucket_expr(emb_col, planes)).select(
        F.col(id_col).alias("query_id"),
        F.col(emb_col).alias("_q_emb"),
        V.norm(emb_col).alias("_q_norm"),
        "_q_bucket",
    )
    sims = c.withColumn("_c_norm", V.norm(emb_col)).join(
        F.broadcast(q),
        (F.col("bucket") == F.col("_q_bucket"))
        & (F.col(id_col) != F.col("query_id")),
    ).select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        (V.dot("_q_emb", emb_col) / (F.col("_q_norm") * F.col("_c_norm"))).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        sims.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", F.round("sim", 4).alias("cos_sim"))
    )


def cosine_near_dup_pairs(
    corpus: DataFrame,
    emb_col: str,
    id_col: str,
    block_col: str,
    threshold: float = 0.9,
    n_salts: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (SemDeDup-style, at
    fixed blocking granularity): all (id_a < id_b) pairs within the
    same ``block_col`` value whose cosine similarity clears
    ``threshold``.

    Scale shape: the self-join is keyed on the blocking column, so
    work is O(sum of block_size^2), never corpus^2 — the blocking
    key is the semantic contract (cluster id from k-means / LSH
    bucket / source shard), exactly how SemDeDup restricts cosine
    comparisons to within-cluster pairs. For unblocked approximate
    variants use ``knn_lsh`` (hyperplane buckets) instead. The join
    shuffles both sides by the block key once; skewed giant blocks
    should be pre-split upstream (see operators/skew.py).
    """
    # Norms are computed ONCE per vector before the self-join (the
    # higher-order aggregate is interpreted — evaluating it 3× per
    # *pair* instead of 1× per *vector* measured ~3× slower), leaving
    # one dot product per pair. sim = dot/(norm_a*norm_b) performs
    # the exact same IEEE ops as the inline cosine, so oracle parity
    # is unaffected.
    a = corpus.select(
        F.col(block_col).alias("_blk"),
        F.col(id_col).alias("id_a"),
        F.col(emb_col).alias("_emb_a"),
        V.norm(emb_col).alias("_na"),
    )
    b = corpus.select(
        F.col(block_col).alias("_blk"),
        F.col(id_col).alias("id_b"),
        F.col(emb_col).alias("_emb_b"),
        V.norm(emb_col).alias("_nb"),
    )
    return (
        a.join(b, ["_blk"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            F.col("_blk").alias(block_col),
            "id_a",
            "id_b",
            (V.dot("_emb_a", "_emb_b") / (F.col("_na") * F.col("_nb"))).alias(
                "sim"
            ),
        )
        .filter(F.col("sim") >= threshold)
        .select(
            block_col, "id_a", "id_b", F.round("sim", 4).alias("cos_sim")
        )
    )


def write_ivf_index(
    corpus: DataFrame,
    emb_col: str,
    id_col: str,
    path: str,
    n_lists: int = 4,
    kmeans_iters: int = 0,
) -> None:
    """Build and persist an IVF index: ``<path>/centroids`` (k rows)
    and ``<path>/lists`` — the corpus with its list assignment,
    written ``partitionBy(list_id)``.

    The partition layout is the index: each inverted list is its own
    parquet directory, so a probe reads ONLY its nprobe lists via
    partition pruning (PartitionFilters on list_id — asserted in
    tests). Build once, serve many: at 100 TB the build is one
    broadcast-assign pass + a partitioned write, and every subsequent
    query batch touches ~nprobe/n_lists of the bytes.

    ``kmeans_iters > 0`` trains real Lloyd's centroids
    (ivf_centroids_kmeans); 0 keeps the deterministic lowest-id seeds
    the oracle can reproduce.
    """
    if kmeans_iters > 0:
        cents = ivf_centroids_kmeans(
            corpus, emb_col, id_col, n_lists=n_lists, n_iters=kmeans_iters
        )
    else:
        cents = ivf_centroids(corpus, emb_col, id_col, n_lists=n_lists)
    assigned = corpus.join(
        ivf_assign(corpus, cents, emb_col, id_col).select(id_col, "list_id"),
        id_col,
    )
    assigned.write.mode("overwrite").partitionBy("list_id").parquet(
        f"{path}/lists"
    )
    cents.write.mode("overwrite").parquet(f"{path}/centroids")


def knn_ivf_index(
    spark,
    index_path: str,
    queries: DataFrame,
    emb_col: str,
    id_col: str,
    k: int = 5,
    nprobe: int = 1,
) -> DataFrame:
    """Approximate top-k against a persisted IVF index, reading only
    the probed inverted lists.

    Per query: rank the (broadcast, k-row) centroid table by L2
    distance and keep the ``nprobe`` nearest lists; the union of
    probed list ids — at most n_lists values, collected driver-side
    like any partition-pruning predicate — becomes an ``isin`` filter
    on the lists directory's partition column, so the scan's
    PartitionFilters skip every unprobed list's files entirely.
    Then exact cosine within the candidate set and a per-query
    top-k window, same output schema as knn_bruteforce/knn_ivf.
    """
    cents = spark.read.parquet(f"{index_path}/centroids")
    ranked = (
        queries.crossJoin(F.broadcast(cents))
        .select(
            F.col(id_col).alias("query_id"),
            F.col(emb_col).alias("_q_emb"),
            V.norm(emb_col).alias("_q_norm"),
            "list_id",
            V.l2_distance(emb_col, "centroid").alias("_dist"),
        )
    )
    w = Window.partitionBy("query_id").orderBy("_dist", "list_id")
    q_probe = (
        ranked.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= nprobe)
        .select("query_id", "_q_emb", "_q_norm", F.col("list_id").alias("_q_list"))
    )
    probe_lists = [
        r["_q_list"] for r in q_probe.select("_q_list").distinct().collect()
    ]
    lists = spark.read.parquet(f"{index_path}/lists").filter(
        F.col("list_id").isin(probe_lists)
    )
    sims = lists.withColumn("_c_norm", V.norm(emb_col)).join(
        F.broadcast(q_probe),
        (F.col("list_id") == F.col("_q_list"))
        & (F.col(id_col) != F.col("query_id")),
    ).select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        (V.dot("_q_emb", emb_col) / (F.col("_q_norm") * F.col("_c_norm")))
        .alias("sim"),
    )
    wk = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        sims.withColumn("rn", F.row_number().over(wk))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", F.round("sim", 4).alias("cos_sim"))
    )
