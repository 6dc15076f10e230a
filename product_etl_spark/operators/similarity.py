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

import pandas as pd
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
    bucket = bucket_expr(emb_col, hyperplanes(n_planes, dim))
    if df.isStreaming:
        # _check_dim's eager probe is illegal on streams; guard per
        # row instead — a silent dim mismatch would put every vector
        # in bucket 0 (full cross join downstream)
        bucket = F.when(F.size(F.col(emb_col)) == dim, bucket).otherwise(
            F.raise_error(
                F.concat(
                    F.lit("lsh_assign_buckets: embedding dim "),
                    F.size(F.col(emb_col)).cast("string"),
                    F.lit(f" != expected dim {dim}"),
                )
            ).cast("int")
        )
    else:
        _check_dim(df, emb_col, dim)
    return df.withColumn("bucket", bucket)


def _check_dim(df: DataFrame, emb_col: str, dim: int) -> None:
    """Fail loudly when the embedding dimension disagrees with the
    hyperplane dim: zip_with pads the shorter side with NULLs, the
    dot becomes NULL, and every vector lands in bucket 0 — the LSH
    silently degrades to a full cross join. One first() on a
    column-pruned scan; cheap next to the bucketed join it guards.
    Streaming frames skip the probe (an eager first() is illegal on
    them); streaming callers (pq_encode, lsh_assign_buckets) attach a
    per-row raise_error guard instead, so a mis-dimensioned stream
    fails the batch rather than committing garbage."""
    if df.isStreaming:
        return
    row = df.select(F.size(F.col(emb_col)).alias("_d")).first()
    if row is not None and row["_d"] != dim:
        raise ValueError(
            f"embedding dim {row['_d']} != expected dim {dim}; pass "
            f"dim={row['_d']} so vector ops (LSH buckets, PQ codes) "
            "line up with the data"
        )


def _with_list_id(df: DataFrame, centroids: DataFrame, emb_col: str) -> DataFrame:
    """Attach the nearest-centroid list_id as a PURE MAP (fused
    literal argmin — centroids are k·dim driver state by contract).
    Falls back to the broadcast crossJoin assignment only above the
    expression-size guard."""
    cent_rows = sorted(
        (r["list_id"], list(r["centroid"])) for r in centroids.collect()
    )
    if not cent_rows:
        return df.withColumn("list_id", F.lit(None).cast("int")).filter(
            F.lit(False)
        )
    if len(cent_rows) * len(cent_rows[0][1]) > _FUSED_ASSIGN_MAX_LITERALS:
        spark = df.sparkSession
        cents = spark.createDataFrame(
            cent_rows, "list_id int, centroid array<float>"
        )
        nearest = (
            df.crossJoin(F.broadcast(cents))
            .groupBy(*df.columns)
            .agg(
                F.min(
                    F.struct(
                        V.l2_distance(emb_col, "centroid").alias("dist"),
                        F.col("list_id").alias("list_id"),
                    )
                ).alias("_best")
            )
            .withColumn("list_id", F.col("_best.list_id"))
            .drop("_best")
        )
        return nearest
    return df.withColumn(
        "list_id", _argmin_literal_expr(cent_rows, emb_col)["list_id"]
    )


def topk_per_key(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list,
    k: int,
    rank_col: str = "rank",
    n_salt: int = 1,
) -> DataFrame:
    """Top-k rows per key via ``row_number() OVER (PARTITION BY
    key)``, with an optional SALTED two-phase variant.

    On Spark 3.5+/4 the single window is already scale-safe for the
    broadcast-query kNN contract (few keys, unbounded corpus):
    the rank filter plants a ``WindowGroupLimit(Partial)`` BEFORE the
    exchange, so each map task ships at most k rows per key and the
    per-key reducer sees <= k * n_map_tasks rows, not the corpus
    [observed in the executed plan; the shuffle is bounded, not the
    full candidate set]. ``n_salt>1`` adds a (key, salt) pre-rank —
    n_salt*nq reducers, each keeping k — for engines without
    WindowGroupLimit or k*tasks volumes that still overwhelm one
    reducer. Correct for ANY bucket assignment because each bucket's
    top-k is a superset of the global top-k members that hashed into
    it — REQUIRES ``order_cols`` to be a total order (tie-break to a
    unique id), which also makes the result deterministic
    (equivalence asserted for n_salt in {1,2,16,64})."""
    if n_salt and n_salt > 1 and ("_salt" in df.columns or "_r1" in df.columns):
        # withColumn would silently REPLACE and then drop a caller
        # column of the same name — destroyed data, no error
        raise ValueError(
            "topk_per_key uses internal columns _salt/_r1; rename the "
            "input columns or pass n_salt=1"
        )
    if rank_col in df.columns:
        # Same silent-replace hazard for the OUTPUT column, on every
        # path (not just the salted one): withColumn(rank_col, ...)
        # would overwrite caller data with row numbers.
        raise ValueError(
            f"topk_per_key writes rank column {rank_col!r}, which "
            "already exists in the input; rename it or pass a "
            "different rank_col"
        )
    w_final = Window.partitionBy(*key_cols).orderBy(*order_cols)
    if n_salt and n_salt > 1:
        w1 = Window.partitionBy(*key_cols, "_salt").orderBy(*order_cols)
        df = (
            df.withColumn("_salt", F.spark_partition_id() % F.lit(n_salt))
            .withColumn("_r1", F.row_number().over(w1))
            .filter(F.col("_r1") <= k)
            .drop("_salt", "_r1")
        )
    return df.withColumn(rank_col, F.row_number().over(w_final)).filter(
        F.col(rank_col) <= k
    )


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
        V.safe_cosine(_dot64_exact_udf()(F.col("_q_emb"), F.col(emb_col)), F.col("_q_norm"), F.col("_c_norm")).alias("sim"),
    )
    return topk_per_key(
        sims,
        [query_id_col],
        [F.desc("sim"), F.asc("neighbor_id")],
        k,
        rank_col="rn",
    ).select(query_id_col, "neighbor_id", F.round("sim", 4).alias("cos_sim"))


def ivf_centroids(
    corpus: DataFrame,
    emb_col: str,
    id_col: str,
    n_lists: int = 4,
    seed_mode: str = "lowest_id",
    seed: int = 0,
):
    """Deterministic IVF coarse centroids — ``n_lists`` seed vectors.

    ``seed_mode``:

    * ``"lowest_id"`` (default): the ``n_lists`` lowest-id vectors —
      the oracle-reproducible contract (DuckDB can mirror it).
    * ``"hash"``: k-means||-style two-step. Draw ``8 * n_lists``
      candidates by lowest ``xxhash64(id, seed)`` (an unbiased,
      deterministic uniform sample DECORRELATED from id order — the
      cure for data written cluster-sorted, where the lowest-id seeds
      all land in one cluster), then greedily keep the ``n_lists``
      candidates maximizing pairwise min-distance (the k-means++
      farthest-point rule) driver-side over the candidate set only.

    Scale shape: both modes plan the corpus scan as
    TakeOrderedAndProject (parallel per-partition top-k, no total
    sort). ``"hash"``'s farthest-point pass runs on the driver over
    8·n_lists vectors — k·dim-sized, never corpus-sized."""
    if seed_mode == "lowest_id":
        seeds = corpus.orderBy(F.col(id_col).asc()).limit(n_lists)
        w = Window.orderBy(F.col(id_col))
        return seeds.select(
            (F.row_number().over(w) - 1).alias("list_id"),
            F.col(emb_col).alias("centroid"),
        )
    if seed_mode != "hash":
        raise ValueError(f"unknown seed_mode {seed_mode!r}")
    cand = (
        corpus.select(
            F.col(id_col).alias("_id"), F.col(emb_col).alias("_emb")
        )
        .orderBy(
            F.xxhash64(F.col("_id"), F.lit(seed)).asc(), F.col("_id").asc()
        )
        .limit(8 * n_lists)
        .collect()
    )
    vecs = [list(r["_emb"]) for r in cand]
    if not vecs:
        # empty corpus: empty centroid frame, matching lowest_id mode
        return corpus.sparkSession.createDataFrame(
            [], "list_id int, centroid array<float>"
        )

    def _d2(a: list[float], b: list[float]) -> float:
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    chosen = [0]  # lowest-hash candidate anchors the selection
    while len(chosen) < min(n_lists, len(vecs)):
        best_i, best_d = -1, -1.0
        for i in range(len(vecs)):
            if i in chosen:
                continue
            d = min(_d2(vecs[i], vecs[j]) for j in chosen)
            if d > best_d:
                best_i, best_d = i, d
        chosen.append(best_i)
    picked = sorted((cand[i]["_id"], vecs[i]) for i in chosen)
    return corpus.sparkSession.createDataFrame(
        [(lid, v) for lid, (_, v) in enumerate(picked)],
        "list_id int, centroid array<float>",
    )


#: expression-size guard for the fused literal-centroid argmin: above
#: this many (n_lists x dim) literals the expression tree gets big
#: enough that the crossJoin+agg assignment is the better plan.
_FUSED_ASSIGN_MAX_LITERALS = 32768


def _argmin_literal_expr(
    centroids: list[tuple[int, list[float]]], emb_col: str
) -> F.Column:
    """struct(dist, list_id) of the nearest centroid, as a PURE MAP
    expression over literal centroid arrays — no join, no shuffle.
    ``array_min`` over structs orders by (dist, list_id), so ties
    break toward the lower list_id exactly like the
    ``min(struct(dist, list_id))`` aggregate in ``ivf_assign``.

    Generated as ONE Spark SQL string rather than k·dim Column
    objects: py4j tree construction cost seconds per call (it runs
    once per Lloyd's iteration), and the zip_with/aggregate lambdas
    it replaces were interpreted row-at-a-time. The arithmetic is
    bit-identical to the former HOF form: per-element terms in array
    order, left-folded from 0.0, sqrt on top, literals parsed from
    the same repr strings."""
    structs = []
    for lid, vec in centroids:
        acc = "CAST(0.0 AS DOUBLE)"
        for j, v in enumerate(vec):
            t = (
                f"(CAST(element_at({emb_col}, {j + 1}) AS DOUBLE)"
                f" - {float(v)!r}D)"
            )
            acc = f"({acc} + {t} * {t})"
        structs.append(
            f"named_struct('dist', SQRT({acc}), 'list_id', {int(lid)})"
        )
    return F.expr(f"array_min(array({', '.join(structs)}))")


def _argmin_literal_hof(
    centroids: list[tuple[int, list[float]]], emb_col: str
) -> F.Column:
    """The higher-order-function form of ``_argmin_literal_expr``,
    bit-identical values. Interpreted row-at-a-time — but it skips
    whole-stage-codegen COMPILATION, which is the right trade inside
    Lloyd's iterations: the centroid literals change every round, so
    each round's generated-SQL plan is a fresh janino compile
    (~0.2 s/round) serving one pass over the (sampled, small)
    training frame. Production assignment paths keep the codegen'd
    generated-SQL form — fixed literals, compiled once, amortized
    over the full corpus scan."""
    return F.array_min(
        F.array(
            *[
                F.struct(
                    V.l2_distance(
                        emb_col, F.array(*[F.lit(float(v)) for v in vec])
                    ).alias("dist"),
                    F.lit(int(lid)).alias("list_id"),
                )
                for lid, vec in centroids
            ]
        )
    )


def ivf_centroids_kmeans(
    corpus: DataFrame,
    emb_col: str,
    id_col: str,
    n_lists: int = 4,
    n_iters: int = 5,
    seed_mode: str = "lowest_id",
    seed: int = 0,
) -> DataFrame:
    """Distributed Lloyd's k-means for real IVF coarse centroids
    (``ivf_centroids`` is the deterministic-seed variant the oracle
    uses; this is the quality path a deployment trains with).

    FUSED iteration: one corpus pass per round. The argmin runs as a
    pure map expression against the round's centroids inlined as
    literals (``_argmin_literal_expr`` — the k·dim doubles are
    driver-state anyway, so "broadcast" degenerates to constant
    folding), then per-list means come straight off the assigned rows:
    posexplode -> groupBy(list, dim) avg (ONE shuffle keyed on
    n_lists×dim groups, map-side combined) -> reassemble. No
    assignment join-back, no groupBy(id) shuffle. Above
    ``_FUSED_ASSIGN_MAX_LITERALS`` (huge k·dim) it falls back to the
    crossJoin+agg assignment with a join-back, which shuffles but
    never inflates the expression tree. Empty clusters keep their
    previous centroid; everything is order-insensitive, so results
    are deterministic for either ``seed_mode``."""
    spark = corpus.sparkSession
    # One projection, cached across Lloyd's iterations — at any real
    # scale the loop runs over the cached columnar form, not n_iters
    # fresh source scans.
    corpus = corpus.select(id_col, emb_col).persist()
    cents = ivf_centroids(
        corpus, emb_col, id_col, n_lists, seed_mode=seed_mode, seed=seed
    )
    # prev mirrors cents driver-side (k·dim floats) so each iteration
    # costs exactly ONE action (means.collect).
    prev = {r["list_id"]: r["centroid"] for r in cents.collect()}
    if not prev:
        # empty corpus: empty centroid frame, matching ivf_centroids
        corpus.unpersist()
        return spark.createDataFrame([], "list_id int, centroid array<float>")
    dim = len(next(iter(prev.values())))
    fused = n_lists * dim <= _FUSED_ASSIGN_MAX_LITERALS
    for _ in range(n_iters):
        if fused:
            # HOF form on purpose: per-round literals never amortize a
            # codegen compile (see _argmin_literal_hof docstring)
            assigned = corpus.select(
                F.col(emb_col),
                _argmin_literal_hof(sorted(prev.items()), emb_col)[
                    "list_id"
                ].alias("list_id"),
            )
        else:
            cents = spark.createDataFrame(
                sorted(prev.items()), "list_id int, centroid array<float>"
            )
            assigned = corpus.join(
                ivf_assign(corpus, cents, emb_col, id_col).select(
                    id_col, "list_id"
                ),
                id_col,
            )
        # ONE shuffle per iteration: collect the k*dim per-dimension
        # means directly (constant-size, driver-bounded) and assemble
        # the centroid arrays driver-side — the old second
        # groupBy(list_id)/array_sort/transform pass re-shuffled the
        # k*dim frame just to reshape it (guide §2.4). float32
        # rounding matches the old `cast(x.m as float)` exactly, so
        # the next round's argmin literals are bit-identical.
        import numpy as np  # noqa: PLC0415 — driver-side reshape only

        dims: dict[int, dict[int, float]] = {}
        for r in (
            assigned.select(
                "list_id", F.posexplode(emb_col).alias("pos", "val")
            )
            .groupBy("list_id", "pos")
            .agg(F.avg("val").alias("m"))
            .collect()
        ):
            dims.setdefault(r["list_id"], {})[r["pos"]] = r["m"]
        for lid, by_pos in dims.items():
            prev[lid] = [
                float(np.float32(by_pos[p])) for p in range(len(by_pos))
            ]
    corpus.unpersist()
    return spark.createDataFrame(
        sorted(prev.items()), "list_id int, centroid array<float>"
    )


def ivf_assign(
    corpus: DataFrame,
    centroids: DataFrame,
    emb_col: str,
    id_col: str,
    fused: bool = False,
) -> DataFrame:
    """Assign every vector to its nearest (L2) centroid — the IVF
    inverted-list build.

    Default: broadcast the centroids, then argmin as a
    ``min(struct(dist, list_id))`` aggregation — ties break toward
    the lower list_id exactly like the former window form, but the
    k-rows-per-vector reduction happens map-side (partial combine)
    instead of in a per-key window sort.

    ``fused=True``: collect the (k·dim-sized) centroids and inline
    them as literals, making the whole assignment a SINGLE MAP over
    the corpus — zero shuffle, zero extra exchange. Identical values
    (same zip_with/aggregate IEEE double ops, same lower-list
    tiebreak; parity-asserted in tests). Use when the centroid frame
    is the output of ``ivf_centroids*`` (always k rows); keep the
    default for lazily-planned oracle paths."""
    if fused:
        cent_rows = sorted(
            (r["list_id"], list(r["centroid"])) for r in centroids.collect()
        )
        if not cent_rows:
            # no centroids -> no assignments (the crossJoin path's
            # empty result), not an INVALID_EXTRACT_BASE_FIELD_TYPE
            # crash on array_min(array())
            return corpus.select(
                F.col(id_col),
                F.lit(None).cast("int").alias("list_id"),
                F.lit(None).cast("double").alias("centroid_dist"),
            ).filter(F.lit(False))
        best = _argmin_literal_expr(cent_rows, emb_col)
        return corpus.select(
            F.col(id_col),
            best["list_id"].alias("list_id"),
            F.round(best["dist"], 4).alias("centroid_dist"),
        )
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
    # map-only list attach (fused literal argmin): the former
    # ivf_assign + join-back on id shuffled the corpus twice for what
    # is a pure per-row computation against k centroids
    assigned = _with_list_id(corpus, cents, emb_col)
    q_assigned = _with_list_id(queries, cents, emb_col).select(
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
        V.safe_cosine(_dot64_exact_udf()(F.col("_q_emb"), F.col(emb_col)), F.col("_q_norm"), F.col("_c_norm")).alias("sim"),
    )
    return topk_per_key(
        sims,
        ["query_id"],
        [F.desc("sim"), F.asc("neighbor_id")],
        k,
        rank_col="rn",
    ).select("query_id", "neighbor_id", F.round("sim", 4).alias("cos_sim"))


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
        V.safe_cosine(_dot64_exact_udf()(F.col("_q_emb"), F.col(emb_col)), F.col("_q_norm"), F.col("_c_norm")).alias("sim"),
    )
    return topk_per_key(
        sims,
        ["query_id"],
        [F.desc("sim"), F.asc("neighbor_id")],
        k,
        rank_col="rn",
    ).select("query_id", "neighbor_id", F.round("sim", 4).alias("cos_sim"))


def _dot64_exact_udf(nondeterministic: bool = False):
    """Arrow-batched dot product BIT-IDENTICAL to ``V.dot``'s
    interpreted fold (guide §4.2: hand whole batches to vectorized
    native code; here without giving up the exact-hash contract).
    ``V.dot`` casts each float to double, multiplies in double, and
    folds left with ``acc + x`` from 0.0 — ``np.cumsum`` over the
    elementwise product row is the SAME left-to-right IEEE addition
    chain (cumsum must emit every prefix, so it cannot reassociate),
    so the last prefix equals the fold bit-for-bit (verified: 0
    mismatches over 41k real pairs + all norms at sf0.1). Defined as
    a closure so cloudpickle ships it BY VALUE — Python workers need
    no importable product_etl_spark on their path (driver contract).

    Mirrors ``zip_with`` length semantics: unequal lengths pad with
    NULL, which poisons the fold — return NULL; empty arrays fold to
    the 0.0 seed. NULL contract caveat (r15 ADVICE): a NULL *element*
    inside an equal-length pair reaches the vectorized path as NaN
    (Arrow has no per-element null lane in the numpy conversion), so
    the kernel yields NaN where ``V.dot``'s fold yields NULL. Every
    current caller consumes the dot through ``safe_cosine`` whose
    ``V.norm`` leg nulls the same rows, so the difference is
    unobservable; a future caller filtering on the RAW dot must not
    rely on NULL-vs-NaN distinction for in-array nulls (the row-exact
    fallback below does return NULL for them). ``nondeterministic=True``
    marks the UDF so a
    FILTER directly on its output is not duplicated below the Python
    node (guide §4.4) — pass it ONLY at such sites: the marker also
    blocks subtree deduplication/exchange reuse, which quadrupled the
    recall audits' broadcast-join legs when applied blanket
    (measured: q202 2.4s -> 10s)."""
    @F.pandas_udf("double")
    def _dot(xa: pd.Series, xb: pd.Series) -> pd.Series:
        import numpy as np

        va, vb = xa.values, xb.values
        try:
            A = np.stack(va).astype(np.float64, copy=False)
            B = np.stack(vb).astype(np.float64, copy=False)
            if A.shape != B.shape:
                raise ValueError("ragged")
            if A.shape[1] == 0:
                return pd.Series(np.zeros(len(va)))
            return pd.Series(np.cumsum(A * B, axis=1)[:, -1])
        except Exception:  # noqa: BLE001 — ragged/None rows: row-exact path
            out = []
            for a, b in zip(va, vb):
                if a is None or b is None or len(a) != len(b):
                    out.append(None)
                    continue
                acc = 0.0
                for x, y in zip(a, b):
                    if x is None or y is None:
                        # a NULL element poisons V.dot's fold to NULL;
                        # float(None) would instead kill the task — at
                        # 100 TB one corrupt row must not fail the
                        # stage (r15 verdict item 2)
                        acc = None
                        break
                    acc += float(x) * float(y)
                out.append(acc)
            return pd.Series(out, dtype="float64")

    return _dot.asNondeterministic() if nondeterministic else _dot


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
    # Per-PAIR dot via the Arrow-batched bit-exact kernel: the
    # interpreted zip_with/aggregate fold was the block's O(cell^2)
    # hot loop (guide §4.2); sim values are unchanged bit-for-bit
    # (see _dot64_exact_udf), so oracle parity is unaffected.
    dot64 = _dot64_exact_udf(nondeterministic=True)
    return (
        a.join(b, ["_blk"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            F.col("_blk").alias(block_col),
            "id_a",
            "id_b",
            V.safe_cosine(
                dot64("_emb_a", "_emb_b"), F.col("_na"), F.col("_nb")
            ).alias("sim"),
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
    # map-only fused assignment: the index build is ONE pass over the
    # corpus + the partitioned write — no assignment join-back shuffle
    assigned = _with_list_id(corpus, cents, emb_col)
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
        V.safe_cosine(
            _dot64_exact_udf()(F.col("_q_emb"), F.col(emb_col)),
            F.col("_q_norm"),
            F.col("_c_norm"),
        ).alias("sim"),
    )
    return topk_per_key(
        sims,
        ["query_id"],
        [F.desc("sim"), F.asc("neighbor_id")],
        k,
        rank_col="rn",
    ).select("query_id", "neighbor_id", F.round("sim", 4).alias("cos_sim"))


def cosine_near_dup_pairs_fast(
    corpus: DataFrame,
    emb_col: str,
    id_col: str,
    block_col: str,
    threshold: float = 0.9,
    max_block_rows: int = 8192,
    chunk_rows: int = 1024,
) -> DataFrame:
    """Arrow-batched numpy twin of ``cosine_near_dup_pairs`` — the
    BULK-THROUGHPUT path for SemDeDup sweeps (the pq_encode_fast
    pattern): one normalized matmul per block instead of an
    interpreted zip_with per pair. Measured 4.6x on q92's workload
    (1.37 s -> 0.30 s at sf0.1, 2k vectors / ~5 label blocks — Arrow
    transfer dominates at this size; the gap widens with block size
    since BLAS matmul replaces a per-pair interpreted lambda).

    Same semantics: (id_a < id_b) within-block pairs with cosine >=
    threshold, zero-norm embeddings score 0 (the safe_cosine rule).
    numpy's pairwise-summed dot differs from the expression path in
    the last ulp, so sims can disagree below ~1e-12 — use the
    expression path where bit-parity with an oracle is the contract,
    this one everywhere else.

    Scale contract: one pandas group per block value; a block larger
    than ``max_block_rows`` RAISES (pre-split skewed blocks upstream,
    operators/skew.py) — memory per group is bounded by
    ``chunk_rows x block`` sims, O(chunk * n) not O(n^2), via
    row-chunked matmuls."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import DoubleType, StructField, StructType

    src = corpus.select(block_col, id_col, emb_col)
    out_schema = StructType(
        [
            src.schema[block_col],
            StructField("id_a", src.schema[id_col].dataType),
            StructField("id_b", src.schema[id_col].dataType),
            StructField("cos_sim", DoubleType()),
        ]
    )

    def per_block(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        if n > max_block_rows:
            raise ValueError(
                f"cosine_near_dup_pairs_fast: block "
                f"{pdf[block_col].iloc[0]!r} has {n} rows > "
                f"max_block_rows={max_block_rows}; pre-split skewed "
                "blocks (operators/skew.py) before the sweep"
            )
        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        X = np.array(
            [np.asarray(v, dtype=np.float64) for v in pdf[emb_col]]
        )
        norms = np.linalg.norm(X, axis=1)
        safe = norms.copy()
        safe[safe == 0.0] = 1.0
        U = X / safe[:, None]
        U[norms == 0.0] = 0.0  # zero-norm rows -> sim 0 with everything
        ids = pdf[id_col].to_numpy()
        blk = pdf[block_col].iloc[0]
        out_a, out_b, out_s = [], [], []
        for lo in range(0, n, chunk_rows):
            hi = min(lo + chunk_rows, n)
            S = U[lo:hi] @ U.T  # (hi-lo, n)
            for r in range(hi - lo):
                i = lo + r
                row = S[r, i + 1 :]  # ids sorted -> j > i means id_b > id_a
                hits = np.nonzero(row >= threshold)[0]
                if hits.size:
                    out_a.extend([ids[i]] * hits.size)
                    out_b.extend(ids[i + 1 :][hits])
                    out_s.extend(row[hits])
        return pd.DataFrame(
            {
                block_col: [blk] * len(out_a),
                "id_a": np.asarray(out_a),
                "id_b": np.asarray(out_b),
                "cos_sim": np.round(np.asarray(out_s, dtype=np.float64), 4),
            }
        ) if out_a else pd.DataFrame(
            {block_col: [], "id_a": [], "id_b": [], "cos_sim": []}
        )

    return src.groupBy(block_col).applyInPandas(per_block, out_schema)


def knn_bruteforce_fast(
    corpus: DataFrame,
    queries: DataFrame,
    emb_col: str,
    id_col: str,
    query_id_col: str = "query_id",
    k: int = 5,
    max_queries: int = 4096,
) -> DataFrame:
    """Arrow-batched numpy twin of ``knn_bruteforce`` (the
    cosine_near_dup_pairs_fast pattern): queries collect to the
    driver (BOUNDED — ``max_queries`` raises on violation, the same
    small-query contract the expression path broadcasts under), the
    corpus streams through mapInPandas computing a per-batch partial
    top-k, and one final bounded window merges partials. The shuffle
    carries at most ``k x n_batches x n_queries`` candidate rows —
    never the corpus.

    numpy's pairwise dot differs from the interpreted fold in the
    last ulp, so a tie at the 4th decimal can order differently; use
    the expression path where oracle bit-parity is the contract, this
    one for bulk sweeps."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import DoubleType, StructField, StructType

    q_rows = queries.select(id_col, emb_col).collect()
    if len(q_rows) > max_queries:
        raise ValueError(
            f"knn_bruteforce_fast: {len(q_rows)} queries exceed the "
            f"small-query contract ({max_queries}); batch them or use "
            "an index (knn_ivf / knn_ivf_pq)"
        )
    if not q_rows:
        raise ValueError("knn_bruteforce_fast: empty query set")
    q_ids = np.array([r[id_col] for r in q_rows])
    Q = np.array([np.asarray(r[emb_col], dtype=np.float64) for r in q_rows])
    qn = np.linalg.norm(Q, axis=1)
    qn_safe = np.where(qn == 0.0, 1.0, qn)
    UQ = Q / qn_safe[:, None]
    UQ[qn == 0.0] = 0.0

    src = corpus.select(id_col, emb_col)
    out_schema = StructType(
        [
            StructField(query_id_col, src.schema[id_col].dataType),
            StructField("neighbor_id", src.schema[id_col].dataType),
            StructField("sim", DoubleType()),
        ]
    )

    def partial_topk(batches):
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            X = np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf[emb_col]]
            )
            norms = np.linalg.norm(X, axis=1)
            safe = np.where(norms == 0.0, 1.0, norms)
            U = X / safe[:, None]
            U[norms == 0.0] = 0.0
            ids = pdf[id_col].to_numpy()
            S = UQ @ U.T  # (n_q, n)
            # self-matches excluded like the expression path
            out_q, out_n, out_s = [], [], []
            for qi in range(len(q_ids)):
                row = S[qi]
                mask = ids != q_ids[qi]
                cand_idx = np.nonzero(mask)[0]
                if cand_idx.size == 0:
                    continue
                take = min(k, cand_idx.size)
                # top-k by (sim desc, id asc): argsort on (-sim, id)
                order = np.lexsort((ids[cand_idx], -row[cand_idx]))[:take]
                sel = cand_idx[order]
                out_q.extend([q_ids[qi]] * take)
                out_n.extend(ids[sel])
                out_s.extend(row[sel])
            if out_q:
                yield pd.DataFrame(
                    {
                        query_id_col: np.asarray(out_q),
                        "neighbor_id": np.asarray(out_n),
                        "sim": np.asarray(out_s, dtype=np.float64),
                    }
                )

    partials = src.mapInPandas(partial_topk, out_schema)
    return topk_per_key(
        partials,
        [query_id_col],
        [F.desc("sim"), F.asc("neighbor_id")],
        k,
        rank_col="rn",
    ).select(query_id_col, "neighbor_id", F.round("sim", 4).alias("cos_sim"))


# ------------------------------------------------------- exact Lloyd step


def _l2_dec(a_col: str, b_col: str) -> F.Column:
    """Engine-exact squared L2 between two array columns: each
    (x-y) and its square are SINGLE IEEE-754 double ops, each term is
    rounded to 1e-9 and summed as DECIMAL (order-insensitive) — the
    retrieval._l2_dec_expr recipe, repeated here so the k-means family
    carries its own exactness contract."""
    return F.expr(
        f"aggregate(zip_with({a_col}, {b_col}, (x, y) -> "
        "CAST(ROUND((CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) "
        "* (CAST(x AS DOUBLE) - CAST(y AS DOUBLE)), 9) AS DECIMAL(18,9))), "
        "CAST(0 AS DECIMAL(28,9)), "
        "(acc, v) -> CAST(acc + v AS DECIMAL(28,9)))"
    )


def _assign_exact(
    corpus: DataFrame, cents: DataFrame, emb_col: str, id_col: str
) -> DataFrame:
    """(id, list_id) by exact-decimal L2 argmin; ties -> lowest list."""
    joined = corpus.crossJoin(F.broadcast(cents)).select(
        F.col(id_col),
        F.col(emb_col),
        "list_id",
        _l2_dec("_cent", emb_col).alias("_d"),
    )
    return (
        joined.groupBy(id_col)
        .agg(
            F.min(F.struct("_d", "list_id")).alias("_best"),
            F.first(emb_col).alias(emb_col),
        )
        .select(id_col, emb_col, F.col("_best.list_id").alias("list_id"))
    )


def _assign_exact_map(
    corpus: DataFrame,
    cents: DataFrame,
    emb_col: str,
    id_col: str,
    keep_emb: bool,
) -> DataFrame:
    """(id[, emb], list_id) by exact-decimal L2 argmin as a PURE MAP:
    the k centroids fold into one broadcast row and the argmin is
    array_min over a transform — no corpus shuffle (the
    crossJoin+groupBy twin `_assign_exact` exchanges every corpus
    row). Bit-identical values: same zip_with/aggregate term order
    and decimal fold; array_min's struct order == min(struct)."""
    one = cents.agg(
        F.collect_list(F.struct(F.col("list_id"), F.col("_cent"))).alias(
            "_cs"
        )
    )
    dist = (
        f"aggregate(zip_with(c._cent, {emb_col}, (x, y) -> "
        "CAST(ROUND((CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) "
        "* (CAST(x AS DOUBLE) - CAST(y AS DOUBLE)), 9) AS DECIMAL(18,9))), "
        "CAST(0 AS DECIMAL(28,9)), "
        "(acc, v) -> CAST(acc + v AS DECIMAL(28,9)))"
    )
    best = F.expr(
        f"array_min(transform(_cs, c -> "
        f"struct({dist} AS _d, c.list_id AS list_id)))"
    )
    cols = [F.col(id_col)] + ([F.col(emb_col)] if keep_emb else [])
    return corpus.crossJoin(F.broadcast(one)).select(
        *cols, best["list_id"].alias("list_id")
    )


def kmeans_one_iter_exact(
    corpus: DataFrame,
    emb_col: str,
    id_col: str,
    n_lists: int = 4,
    fused: bool = True,
) -> DataFrame:
    """One ENGINE-EXACT Lloyd iteration: seed with the ``n_lists``
    lowest-id vectors, assign by exact-decimal L2, recompute each
    centroid as the per-dimension mean, re-assign. Returns
    (id, list_id) after the refinement step.

    This is the driver-checkable twin of ``ivf_centroids_kmeans``
    (q93): every arithmetic step is reproducible bit-for-bit in ANSI
    SQL — distances are per-term-rounded decimal sums; the mean is an
    exact decimal sum (elements rounded to 1e-6) cast to double
    (exact: the unscaled value stays under 2^53) divided by the
    bigint count in ONE IEEE op, rounded to 1e-9 — so the assignments
    are integer-decided and a DuckDB oracle can replay the iteration
    exactly. The trained multi-iteration float path (q93) keeps its
    pytest recall bound; this pins the update RULE cross-engine.

    Scale shape: seeds/centroids are k-row broadcasts; the update is
    one (list,pos)-keyed aggregate bounded by k*dim output rows; the
    corpus shuffles once in the assignment argmin (partial map-side
    combine) and never self-joins."""
    if fused:
        # Broadcast-array argmin: the k centroids fold into ONE row
        # (collect_list of structs), broadcast-crossJoined, and the
        # argmin runs as array_min(transform(...)) — a PURE MAP over
        # the corpus. Zero corpus shuffle for either assignment (vs
        # the reference path's groupBy(id) argmin, which exchanges
        # every corpus row WITH its embedding payload); only the
        # (list,pos)-keyed mean update exchanges, and its partial
        # combine reduces each map task to k*dim rows first. Values
        # are bit-identical to the crossJoin+groupBy path: same
        # zip_with/aggregate term order, same decimal fold, array_min
        # over structs == min(struct) tie-break (parity-asserted in
        # tests/test_integrity_skyline.py). An unrolled
        # literal-centroid variant measured 3x SLOWER than either
        # (256 chained decimal casts defeat codegen), hence the
        # HOF-over-broadcast shape.
        w = Window.orderBy(F.col(id_col))
        seeds = (
            corpus.orderBy(F.col(id_col).asc())
            .limit(n_lists)
            .select(
                (F.row_number().over(w) - 1).alias("list_id"),
                F.col(emb_col).alias("_cent"),
            )
        )
        a0 = _assign_exact_map(corpus, seeds, emb_col, id_col, keep_emb=True)
        cdims = (
            a0.select("list_id", F.posexplode(emb_col).alias("pos", "_val"))
            .groupBy("list_id", "pos")
            .agg(
                F.round(
                    F.sum(
                        F.round(F.col("_val").cast("double"), 6).cast(
                            "decimal(18,6)"
                        )
                    ).cast("double")
                    / F.count(F.lit(1)),
                    9,
                ).alias("_c")
            )
        )
        cents1 = cdims.groupBy("list_id").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "_c"))),
                lambda s: s["_c"],
            ).alias("_cent")
        )
        return _assign_exact_map(
            corpus, cents1, emb_col, id_col, keep_emb=False
        )

    w = Window.orderBy(F.col(id_col))
    seeds = (
        corpus.orderBy(F.col(id_col).asc())
        .limit(n_lists)
        .select(
            (F.row_number().over(w) - 1).alias("list_id"),
            F.col(emb_col).alias("_cent"),
        )
    )
    a0 = _assign_exact(corpus, seeds, emb_col, id_col)
    dims = a0.select(
        "list_id", F.posexplode(emb_col).alias("pos", "_val")
    )
    cdims = dims.groupBy("list_id", "pos").agg(
        F.round(
            F.sum(
                F.round(F.col("_val").cast("double"), 6).cast("decimal(18,6)")
            ).cast("double")
            / F.count(F.lit(1)),
            9,
        ).alias("_c")
    )
    cents1 = cdims.groupBy("list_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "_c"))),
            lambda s: s["_c"],
        ).alias("_cent")
    )
    return _assign_exact(corpus, cents1, emb_col, id_col).select(
        id_col, "list_id"
    )


def semdedup_exact(
    corpus: DataFrame,
    emb_col: str,
    id_col: str,
    n_cells: int = 8,
    threshold: float = 0.3,
    max_cell_size: int = 200_000,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient
    learning at web-scale through semantic deduplication"):
    embedding-level semantic dedup as a composition of two
    driver-green operators — IVF cell assignment (exact-decimal L2
    argmin against the ``n_cells`` lowest-id seed vectors, the q142
    seeding rule) then WITHIN-CELL exact cosine
    (``cosine_near_dup_pairs`` blocked on the cell id). A vector is
    pruned when any LOWER-id vector in ITS OWN cell clears
    ``threshold``; cross-cell pairs are never compared — that is the
    algorithm's entire scale contract (pytest-asserted on a planted
    fixture where a cross-cell near-duplicate exists and must
    survive).

    Returns (id, list_id, kept 0/1) — one row per corpus vector.

    Scale shape: the assignment is a PURE MAP (k seed centroids fold
    into one broadcast row); the cosine self-join is keyed on the
    cell id, so work is O(sum cell_size^2), never corpus^2 — at
    100 TB, cells come from a trained ``ivf_centroids_kmeans`` (q93)
    instead of the engine-exact seed rule, and giant cells pre-split
    via operators/skew.py. One shuffle for the pair join, one
    distinct on the pruned side, one left join back.

    Degenerate-input guard: a degenerate cell (e.g. all-zero or
    constant embeddings collapsing the argmin onto one list_id)
    silently turns the within-cell join into corpus^2. Any cell
    holding more than ``max_cell_size`` vectors therefore FAILS the
    job loudly (assert_true on a per-cell window count riding the
    same list_id shuffle the pair join pays, the
    interval_overlap_pairs convention) — re-train centroids or
    pre-split the hot cell via operators/skew.py deliberately, don't
    discover it as an executor OOM.
    """
    w = Window.orderBy(F.col(id_col))
    seeds = (
        corpus.orderBy(F.col(id_col).asc())
        .limit(n_cells)
        .select(
            (F.row_number().over(w) - 1).alias("list_id"),
            F.col(emb_col).alias("_cent"),
        )
    )
    assigned = _assign_exact_map(corpus, seeds, emb_col, id_col, keep_emb=True)
    # materialize the assignment ONCE: it feeds both sides of the
    # pair self-join AND the output join-back — unpinned, the
    # decimal-argmin map re-executes 3x (measured: q189 at sf0.1
    # dropped 7.1 s -> 3.6 s; the remainder is the within-cell pair
    # join itself, the same cost band as q92's label-blocked cosine)
    assigned = assigned.localCheckpoint(eager=True)
    csz = F.count(F.lit(1)).over(Window.partitionBy("list_id"))
    cell_guard = F.assert_true(
        csz <= F.lit(max_cell_size),
        F.concat(
            F.lit("semdedup_exact: cell holds > "
                  f"{max_cell_size} vectors (list_id="),
            F.col("list_id").cast("string"),
            F.lit("); the within-cell join is O(cell^2) — re-train "
                  "centroids or pre-split the hot cell "
                  "(operators/skew.py), or raise max_cell_size"),
        ),
    )
    # fold the guard into the embedding column of the JOIN input only
    # (NULL-on-success keeps values intact; a free-standing column
    # would be pruned and never run) — the quadratic branch is the
    # one that must not start on a degenerate cell
    guarded = assigned.withColumn(
        emb_col, F.when(cell_guard.isNull(), F.col(emb_col))
    )
    pairs = cosine_near_dup_pairs(
        guarded, emb_col, id_col, "list_id", threshold=threshold
    )
    removed = (
        pairs.select(F.col("id_b").alias(id_col))
        .distinct()
        .withColumn("_rm", F.lit(1))
    )
    return (
        assigned.select(id_col, "list_id")
        .join(removed, id_col, "left")
        .select(
            id_col,
            "list_id",
            F.when(F.col("_rm").isNull(), F.lit(1))
            .otherwise(F.lit(0))
            .alias("kept"),
        )
    )


def incremental_semdedup(
    spark,
    batch: DataFrame,
    store_path: str,
    centroids: DataFrame,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.3,
) -> tuple[DataFrame, DataFrame]:
    """Continuous-ingest twin of ``semdedup_exact``: split ``batch``
    into (accepted, rejected) against the accepted-vector store at
    ``store_path`` AND within itself — comparing ONLY within IVF
    cells — then append the accepted rows (idempotently: ids already
    stored are never re-appended). The vector-space sibling of
    ``dedup_incremental.incremental_span_excision``'s gram store and
    ``embdedup``'s signature store, for the exact-cosine regime.

    ``centroids`` (list_id, _cent) must be the SAME frame every batch
    — the cell geometry is the store's partition contract (train once
    on a bootstrap sample via ``ivf_centroids_kmeans``, or use the
    ``semdedup_exact`` seed rule on the first batch). A batch row is
    REJECTED when some stored vector, or an accepted batch vector
    with a smaller id, in ITS OWN cell clears ``threshold``; rejected
    rows carry (id, list_id, matched_id, cos_sim) of their nearest
    offender (highest similarity, ties -> lowest id). Cross-cell
    near-duplicates are never compared — the SemDeDup contract.

    Ingesting batches in ascending id order reproduces the batch
    operator exactly: accepted ids == semdedup_exact(union).kept
    (pytest-pinned; same centroid frame, same IEEE cosine order).
    Replay-safe: a re-ingested row collides with its OWN stored copy
    (cos = 1.0 >= any threshold) and appends nothing. RTBF:
    ``erase_from_stores(..., id_col, partition_by=["list_id"])``
    forgets a subject while preserving the cell layout; a later
    near-dup of the erased vector is accepted again (pytest).

    Scale shape: the store holds one (id, cell, embedding, norm) row
    per ACCEPTED vector, partitioned by list_id — each batch reads
    only the cells the batch touches (partition pruning); candidates
    join on the cell id (never all-pairs, never cross-cell); history
    embeddings are touched only for same-cell candidates. Norms are
    stored, not recomputed per comparison."""
    from product_etl_spark.fs import table_exists

    assigned = _assign_exact_map(
        batch, centroids, emb_col, id_col, keep_emb=True
    ).localCheckpoint(eager=True)
    a = assigned.select(
        F.col(id_col),
        "list_id",
        F.col(emb_col).alias("_emb"),
        V.norm(emb_col).alias("_nrm"),
    ).localCheckpoint(eager=True)

    cells = [r["list_id"] for r in a.select("list_id").distinct().collect()]
    cand = None
    if table_exists(spark, store_path):
        stored = (
            spark.read.parquet(store_path)
            # touch only the cells this batch occupies
            .filter(F.col("list_id").isin(cells))
            .select(
                F.col(id_col).alias("_mid"),
                "list_id",
                F.col(emb_col).alias("_memb"),
                F.col("norm").alias("_mnrm"),
            )
        )
        cand = a.join(stored, "list_id")
    peers = a.select(
        F.col(id_col).alias("_mid"),
        "list_id",
        F.col("_emb").alias("_memb"),
        F.col("_nrm").alias("_mnrm"),
    )
    c2 = a.join(peers, "list_id").filter(F.col("_mid") < F.col(id_col))
    cand = c2 if cand is None else cand.unionByName(c2)
    scored = cand.select(
        F.col(id_col),
        "list_id",
        F.col("_mid"),
        V.safe_cosine(
            _dot64_exact_udf()(F.col("_emb"), F.col("_memb")),
            F.col("_nrm"),
            F.col("_mnrm"),
        ).alias("_sim"),
    ).filter(F.col("_sim") >= threshold)
    nearest = (
        scored.groupBy(id_col)
        .agg(
            F.min(
                F.struct(
                    (-F.col("_sim")).alias("ns"),
                    F.col("_mid").alias("m"),
                )
            ).alias("_n"),
            F.first("list_id").alias("list_id"),
        )
        .select(
            id_col,
            "list_id",
            F.col("_n.m").alias("matched_id"),
            F.round(-F.col("_n.ns"), 4).alias("cos_sim"),
        )
    )
    rejected = batch.drop("list_id").join(nearest, id_col)
    keep_ids = a.select(id_col).join(
        nearest.select(id_col), id_col, "left_anti"
    )
    accepted = batch.join(keep_ids, id_col, "left_semi")

    to_append = (
        a.join(keep_ids, id_col, "left_semi")
        .select(
            F.col(id_col),
            "list_id",
            F.col("_emb").alias(emb_col),
            F.col("_nrm").alias("norm"),
        )
    )
    if table_exists(spark, store_path):
        existing = spark.read.parquet(store_path).select(F.col(id_col))
        to_append = to_append.join(existing, id_col, "left_anti")
    if to_append.limit(1).count():
        to_append.write.mode("append").partitionBy("list_id").parquet(
            store_path
        )
    return accepted, rejected


def signbit_bands(
    df: DataFrame,
    emb_col: str,
    id_col: str,
    n_bands: int = 8,
    band_bits: int = 8,
) -> DataFrame:
    """Sign-bit banded signatures: (id, band, band_val) rows where
    ``band_val`` packs the sign bits of ``band_bits`` consecutive
    embedding dimensions into one BIGINT (bit j set iff
    emb[band*band_bits + j] >= 0). Two vectors are ANN candidates when
    they share any (band, band_val) — the SimHash banding trick of
    Charikar 2002 applied to COORDINATE hyperplanes, which makes the
    signature a pure deterministic function of the vector and hence
    replayable by any engine (the oracle-portability twin of
    ``lsh_assign_buckets``'s pseudo-random hyperplanes, which a
    production index would use for isotropy).

    Requires ``len(emb) >= n_bands * band_bits`` (shorter vectors get
    NULL band values, which never match a join).

    Scale shape: PURE MAP — the signature is one higher-order
    expression per row, then a posexplode to n_bands rows/vector; no
    shuffle, no state. The candidate join downstream is keyed on
    (band, band_val), the classic LSH-join shape."""
    weights = ", ".join(f"{1 << j}L" for j in range(band_bits))
    # Missing dims (slice past the embedding's end) surface as NULL in
    # zip_with and must POISON the band to NULL — a bare IF(v >= 0,..)
    # would treat them as negative and hand an undersized vector a
    # valid (joinable) signature.
    expr = (
        f"transform(sequence(0, {n_bands - 1}), b -> "
        f"aggregate(zip_with(slice({emb_col}, b * {band_bits} + 1, "
        f"{band_bits}), array({weights}), "
        f"(v, w) -> IF(v IS NULL, CAST(NULL AS BIGINT), "
        f"IF(v >= 0, w, 0L))), 0L, (acc, x) -> acc + x))"
    )
    return df.select(
        F.col(id_col), F.posexplode(F.expr(expr)).alias("band", "band_val")
    )


def ann_recall_audit(
    corpus: DataFrame,
    emb_col: str,
    id_col: str,
    n_queries: int = 20,
    k: int = 10,
    n_bands: int = 8,
    band_bits: int = 8,
) -> DataFrame:
    """ANN quality EVALUATION: recall@k of the sign-bit banded
    candidate search (``signbit_bands``) against the exact cosine
    ground truth (``knn_bruteforce``), per query — the audit a
    pipeline runs before trusting an approximate index for
    retrieval-based dedup or similarity search (the repo has the
    searchers — LSH/IVF/PQ/Hamming — but until this operator, no
    measurement of what they give up).

    Queries are the ``n_queries`` lowest-id vectors (deterministic).
    Output: (query_id, n_candidates, hits, recall) — candidate-set
    size, overlap with the exact top-k, and hits/k.

    Scale shape: ground truth is a broadcast of the Q queries against
    the corpus (Q*N pairs, map-only then per-query top-k — exact
    ground truth is ALWAYS paid only on a bounded query sample);
    candidates come from the (band, band_val)-keyed join of the
    broadcast Q*n_bands query signatures, so the corpus is scanned
    twice and shuffled never. At 100 TB both legs stay map-side."""
    queries = (
        corpus.orderBy(F.col(id_col).asc())
        .limit(n_queries)
        .select(id_col, emb_col)
    )
    exact = knn_bruteforce(
        corpus, queries, emb_col, id_col, query_id_col="query_id", k=k
    ).select("query_id", "neighbor_id")
    qb = signbit_bands(queries, emb_col, id_col, n_bands, band_bits).select(
        F.col(id_col).alias("query_id"),
        F.col("band").alias("_qband"),
        F.col("band_val").alias("_qval"),
    )
    cb = signbit_bands(corpus, emb_col, id_col, n_bands, band_bits)
    cand = (
        cb.join(
            F.broadcast(qb),
            (F.col("band") == F.col("_qband"))
            & (F.col("band_val") == F.col("_qval"))
            & (F.col(id_col) != F.col("query_id")),
        )
        .select("query_id", F.col(id_col).alias("neighbor_id"))
        .distinct()
    )
    ncand = cand.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_candidates")
    )
    hits = (
        cand.join(exact, ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("hits"))
    )
    # recall@k divides by the ACTUAL ground-truth size min(k, N-1) —
    # a fixed k would understate recall on corpora smaller than k+1;
    # a query with no ground truth at all is vacuously 1.0.
    truthn = exact.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("_ntruth")
    )
    return (
        queries.select(F.col(id_col).alias("query_id"))
        .join(ncand, "query_id", "left")
        .join(hits, "query_id", "left")
        .join(truthn, "query_id", "left")
        .select(
            "query_id",
            F.coalesce(F.col("n_candidates"), F.lit(0))
            .cast("long")
            .alias("n_candidates"),
            F.coalesce(F.col("hits"), F.lit(0)).cast("long").alias("hits"),
            F.when(F.coalesce(F.col("_ntruth"), F.lit(0)) == 0, F.lit(1.0))
            .otherwise(
                F.round(
                    F.coalesce(F.col("hits"), F.lit(0)).cast("double")
                    / F.col("_ntruth").cast("double"),
                    6,
                )
            )
            .alias("recall"),
        )
    )


def ivf_recall_audit(
    corpus: DataFrame,
    emb_col: str,
    id_col: str,
    n_cells: int = 8,
    n_queries: int = 20,
    k: int = 10,
) -> DataFrame:
    """IVF (nprobe=1) quality EVALUATION — the cell-probe leg of the
    ANN audit triple (q194 sign-bit banding, q201 text MinHash-LSH,
    this): for the ``n_queries`` lowest-id vectors, how much of the
    exact cosine top-``k`` lives in the query's OWN IVF cell — the
    recall an index search pays when it probes a single list, the
    number that picks nprobe before a corpus run.

    Cells are the exact-decimal L2 argmin against the ``n_cells``
    lowest-id seeds (the q142/q189 engine-exact seeding rule, so any
    engine replays the assignment bit-for-bit; a production index
    swaps in trained k-means centroids, same shapes).

    Output: (query_id, list_id, n_candidates, hits, recall) — one
    row per query; candidates exclude the query itself.

    Scale shape: assignment is a PURE MAP (seeds fold into one
    broadcast row), checkpointed ONCE because it feeds both the
    query-side and the candidate-side of the cell join; ground truth
    is paid only on the bounded query sample (broadcast Q x N,
    map-only + per-query top-k); the candidate count is one
    cell-keyed aggregate joined to the Q-row query frame."""
    w = Window.orderBy(F.col(id_col))
    seeds = (
        corpus.orderBy(F.col(id_col).asc())
        .limit(n_cells)
        .select(
            (F.row_number().over(w) - 1).alias("list_id"),
            F.col(emb_col).alias("_cent"),
        )
    )
    assigned = _assign_exact_map(
        corpus, seeds, emb_col, id_col, keep_emb=False
    ).localCheckpoint(eager=True)
    queries = (
        corpus.orderBy(F.col(id_col).asc())
        .limit(n_queries)
        .select(id_col, emb_col)
    )
    q_assigned = assigned.join(
        queries.select(id_col), id_col, "left_semi"
    ).select(F.col(id_col).alias("query_id"), "list_id")
    exact = knn_bruteforce(
        corpus, queries, emb_col, id_col, query_id_col="query_id", k=k
    ).select("query_id", "neighbor_id")
    cell_sizes = assigned.groupBy("list_id").agg(
        F.count(F.lit(1)).alias("_csz")
    )
    # hits: exact top-k neighbors that share the query's cell
    nbr = assigned.select(
        F.col(id_col).alias("neighbor_id"),
        F.col("list_id").alias("_nlist"),
    )
    hits = (
        exact.join(F.broadcast(q_assigned), "query_id")
        .join(nbr, "neighbor_id")
        .filter(F.col("list_id") == F.col("_nlist"))
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("hits"))
    )
    truthn = exact.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("_ntruth")
    )
    return (
        q_assigned.join(F.broadcast(cell_sizes), "list_id")
        .join(hits, "query_id", "left")
        .join(truthn, "query_id", "left")
        .select(
            "query_id",
            "list_id",
            # own cell minus the query itself
            (F.col("_csz") - F.lit(1)).cast("long").alias("n_candidates"),
            F.coalesce(F.col("hits"), F.lit(0))
            .cast("long")
            .alias("hits"),
            # recall@k over the ACTUAL truth size min(k, N-1), the
            # same rule as ann_recall_audit; vacuous 1.0 on no truth
            F.when(F.coalesce(F.col("_ntruth"), F.lit(0)) == 0, F.lit(1.0))
            .otherwise(
                F.round(
                    F.coalesce(F.col("hits"), F.lit(0)).cast("double")
                    / F.col("_ntruth").cast("double"),
                    6,
                )
            )
            .alias("recall"),
        )
    )
