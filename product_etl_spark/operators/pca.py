"""PCA over embedding columns — train by distributed sufficient
statistics, project as a pure map.

Why in a training-data engine: PCA (or its rotation cousin OPQ) is
the standard preprocessing step before product quantization — axis-
aligned subspace splits (pq.py) quantize better after decorrelating
dimensions — and the cheap dimensionality reducer for similarity
sweeps (SemDeDup runs on PCA-reduced embeddings).

Scale shape (the sufficient-statistics pattern): each Arrow batch
reduces to (count, sum_vec[d], outer_sum[d*d]) — one numpy matmul per
batch — and those partials SUM (order-insensitive float addition is
the only nondeterminism; at d=64 a partial is 33 KB, so a 1000-
executor tree-reduce moves megabytes, not data). The d x d eigen-
decomposition happens once on the driver (d is bounded by contract —
the same k·dim driver-state contract as IVF centroids/codebooks).
Projection inlines mean + components as literal arrays: map-only,
no shuffle, streaming-transparent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pca_train(
    corpus: DataFrame,
    emb_col: str,
    k: int,
    dim: int = 64,
) -> tuple[list[float], list[list[float]], list[float]]:
    """Fit PCA: returns (mean[dim], components[k][dim], explained[k])
    with components = top-k eigenvectors of the sample covariance
    (unit length, sign fixed so each component's largest-|coord|
    entry is positive — eigenvector sign is otherwise arbitrary and
    would flip between runs), explained = their eigenvalue share.
    """
    import numpy as np

    if not (0 < k <= dim):
        raise ValueError(f"pca_train: need 0 < k <= dim, got k={k} dim={dim}")
    from product_etl_spark.operators.similarity import _check_dim

    _check_dim(corpus, emb_col, dim)

    from pyspark.sql.types import ArrayType, DoubleType, LongType, StructField, StructType

    part_schema = StructType(
        [
            StructField("n", LongType()),
            StructField("s", ArrayType(DoubleType())),
            StructField("ss", ArrayType(DoubleType())),
        ]
    )

    def partials(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf[emb_col]]
            )
            if X.shape[1] != dim:
                raise ValueError(
                    f"pca_train: embedding dim {X.shape[1]} != {dim}"
                )
            yield pd.DataFrame(
                {
                    "n": [len(pdf)],
                    "s": [X.sum(axis=0)],
                    "ss": [(X.T @ X).reshape(-1)],
                }
            )

    agg = (
        corpus.select(emb_col)
        .mapInPandas(partials, part_schema)
        .agg(
            F.sum("n").alias("n"),
            F.array(
                *[F.sum(F.col("s")[i]) for i in range(dim)]
            ).alias("s"),
            F.array(
                *[F.sum(F.col("ss")[i]) for i in range(dim * dim)]
            ).alias("ss"),
        )
        .collect()[0]
    )
    n = agg["n"] or 0
    if n < 2:
        raise ValueError(f"pca_train: need >= 2 vectors, got {n}")
    s = np.asarray(agg["s"], dtype=np.float64)
    ss = np.asarray(agg["ss"], dtype=np.float64).reshape(dim, dim)
    mean = s / n
    cov = (ss - n * np.outer(mean, mean)) / (n - 1)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T  # (k, dim)
    for i in range(k):  # deterministic sign
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i][j] < 0:
            comps[i] = -comps[i]
    total = float(evals.sum()) or 1.0
    explained = [float(evals[o]) / total for o in order]
    return mean.tolist(), comps.tolist(), explained


def pca_moments(
    corpus: DataFrame,
    emb_col: str,
    dim: int = 64,
) -> DataFrame:
    """ENGINE-EXACT sufficient statistics for PCA: one row per
    upper-triangle dimension pair (i <= j) with
    (i, j, n, s_i, s_j, gram) where s_i = SUM(round(x_i, 6)) and
    gram = SUM(round(x_i, 6) * round(x_j, 6)) as EXACT decimal sums
    (the q102/q161 moment recipe lifted to the Gram matrix), cast to
    double once at the surface. mean and covariance — everything
    ``pca_train``'s eigendecomposition consumes — reconstruct from
    this frame alone: mean_i = s_i/n (from the (i,i) row), cov_ij =
    (gram_ij - n*mean_i*mean_j)/(n-1). The eigensolve itself is not
    ANSI-expressible, but its entire input is — this query is the
    driver-hashable pin for the PCA family (the q142 seeding-rule
    pattern applied to q90's trainer).

    Scale shape: PURE MAP + one map-side-combined groupBy on
    dim*(dim+1)/2 keys — each row expands to its own upper-triangle
    pair structs inside one higher-order expression (no self-join,
    no explode-then-join); the output is dim-bounded (2080 rows at
    d=64), never corpus-sized. The decimal partials are mergeable,
    so a 100 TB fit is one aggregate — the same contract as the
    integrity checksums (q143).

    Row-level NULL/short-vector policy: a pair term with EITHER
    dimension missing is dropped before aggregation, so that pair's
    n, sums and gram all come from the same well-formed row set —
    malformed vectors cannot silently skew the fit (same poisoning
    stance as signbit_bands)."""
    # round+cast each dimension ONCE per row (dim ops), then scale the
    # exact DECIMAL(18,6) to an INTEGER count of 1e-6 units — decimal
    # * integer literal is exact decimal arithmetic, so the bigint
    # carries the identical rational value the old decimal pipeline
    # aggregated. NULL elements / NULL rows stay NULL.
    scaled = F.expr(
        f"transform({emb_col}, v -> CAST("
        "CAST(ROUND(CAST(v AS DOUBLE), 6) AS DECIMAL(18,6)) * 1000000"
        " AS BIGINT))"
    )

    # Per-task exact Gram partials via one Arrow-batched integer
    # matmul (r15, guide §4.2/§1.2): the old shape exploded dim*(dim+1)/2
    # pair structs PER ROW and pushed ~n*dim^2/2 rows of BigDecimal
    # multiplies through a hash aggregate — measured at sf0.1 the
    # explode alone cost more than half the query. Here each task
    # builds (rows x dim) int64 value/mask matrices per Arrow batch and
    # takes four matmuls (M'M = pairwise counts, V'M / M'V = per-pair
    # coordinate sums over the SAME well-formed row set, V'V = gram);
    # int64 exactness is guarded by chunking each batch so that
    # max|v|^2 * chunk_rows < 2^62, and cross-batch accumulation is
    # arbitrary-precision Python int. One 2080-row partial leaves each
    # task (shuffle is pair-count x tasks, never corpus-sized) and the
    # final decimal sums are exact — bit-identical doubles at the
    # surface (oracle hash unchanged; pinned by the parity tests).
    n_dim = dim

    def _gram_partials(batches):
        from decimal import Decimal

        import numpy as np
        import pyarrow as pa

        tot_n = np.zeros((n_dim, n_dim), dtype=np.int64)
        tot_s = np.zeros((n_dim, n_dim), dtype=object)  # Python ints
        tot_sj = np.zeros((n_dim, n_dim), dtype=object)
        tot_g = np.zeros((n_dim, n_dim), dtype=object)
        tot_s[:], tot_sj[:], tot_g[:] = 0, 0, 0
        seen = False
        for batch in batches:
            rows = batch.column(0).to_pylist()
            k = len(rows)
            if not k:
                continue
            seen = True
            V = np.zeros((k, n_dim), dtype=np.int64)
            M = np.zeros((k, n_dim), dtype=np.int64)
            for r, lst in enumerate(rows):
                if lst is None:
                    continue
                if len(lst) > n_dim:
                    # LOUD guard (r12 ADVICE): silently truncating a
                    # too-long embedding would surface as an opaque
                    # parity failure; fail like pca_train does.
                    raise ValueError(
                        f"pca_moments: embedding has {len(lst)} dims"
                        f" > dim={n_dim} — reading only 0..{n_dim - 1}"
                        " would silently truncate the vector; pass the"
                        " true dim (pca_train raises on the same"
                        " mismatch)"
                    )
                for i, x in enumerate(lst):
                    if x is not None:
                        V[r, i] = x
                        M[r, i] = 1
            amax = int(np.abs(V).max()) if k else 0
            # int64-exact chunk size: products are <= amax^2, so a
            # chunk of c rows keeps every matmul cell under c*amax^2.
            c = k if amax == 0 else max(1, min(k, (1 << 62) // (amax * amax)))
            for lo in range(0, k, c):
                Vc, Mc = V[lo : lo + c], M[lo : lo + c]
                tot_n += Mc.T @ Mc
                tot_s += Vc.T @ Mc
                tot_sj += Mc.T @ Vc
                tot_g += Vc.T @ Vc
        if not seen:
            return
        ii, jj = np.triu_indices(n_dim)
        keep = tot_n[ii, jj] > 0
        ii, jj = ii[keep], jj[keep]
        six = Decimal(10) ** -6
        twelve = Decimal(10) ** -12
        yield pa.record_batch(
            [
                pa.array(ii, type=pa.int32()),
                pa.array(jj, type=pa.int32()),
                pa.array(tot_n[ii, jj], type=pa.int64()),
                pa.array(
                    [Decimal(int(tot_s[i, j])) * six for i, j in zip(ii, jj)],
                    type=pa.decimal128(38, 6),
                ),
                pa.array(
                    [Decimal(int(tot_sj[i, j])) * six for i, j in zip(ii, jj)],
                    type=pa.decimal128(38, 6),
                ),
                pa.array(
                    [
                        Decimal(int(tot_g[i, j])) * twelve
                        for i, j in zip(ii, jj)
                    ],
                    type=pa.decimal128(38, 12),
                ),
            ],
            names=["i", "j", "n", "s_i", "s_j", "gram"],
        )

    parts = corpus.select(scaled.alias("_sc")).mapInArrow(
        _gram_partials,
        "i int, j int, n bigint, s_i decimal(38,6), s_j decimal(38,6),"
        " gram decimal(38,12)",
    )
    return (
        parts.groupBy("i", "j")
        .agg(
            F.sum("n").alias("n"),
            F.sum("s_i").alias("s_i"),
            F.sum("s_j").alias("s_j"),
            F.sum("gram").alias("gram"),
        )
        .select(
            F.col("i").cast("int").alias("i"),
            F.col("j").cast("int").alias("j"),
            F.col("n").cast("long").alias("n"),
            F.col("s_i").cast("double").alias("s_i"),
            F.col("s_j").cast("double").alias("s_j"),
            F.col("gram").cast("double").alias("gram"),
        )
        .orderBy("i", "j")
    )


def pca_train_from_moments(
    moments: list,
    k: int,
    dim: int = 64,
) -> tuple[list[float], list[list[float]], list[float]]:
    """The eigensolve half of ``pca_train``, consuming EXACTLY the
    ``pca_moments`` surface (collected rows): rebuilds mean and
    sample covariance from (i, j, n, s_i, s_j, gram) and runs the
    identical eigh + deterministic-sign + explained-share tail. The
    parity test asserts this path reproduces ``pca_train``'s
    projection on the same corpus up to the 1e-6 input rounding the
    moment surface commits to."""
    import numpy as np

    if not (0 < k <= dim):
        raise ValueError(
            f"pca_train_from_moments: need 0 < k <= dim, got k={k} dim={dim}"
        )
    s = np.zeros(dim)
    gram = np.zeros((dim, dim))
    seen = 0
    n_by_diag: dict[int, int] = {}
    for r in moments:
        i, j = int(r["i"]), int(r["j"])
        gram[i][j] = gram[j][i] = float(r["gram"])
        if i == j:
            s[i] = float(r["s_i"])
            n_by_diag[i] = int(r["n"])
        seen += 1
    # r12 ADVICE: pca_moments drops null/short-vector terms PER PAIR,
    # so on a malformed corpus the per-dimension row counts diverge
    # and mean_i = s_i/n built from any single n silently skews the
    # fit. Require every diagonal to agree (a corpus whose malformed
    # vectors are entirely-null drops them uniformly and still
    # passes); anything else must be cleaned upstream, matching
    # pca_train's raise-on-mismatch policy.
    if len(set(n_by_diag.values())) > 1:
        lo, hi = min(n_by_diag.values()), max(n_by_diag.values())
        raise ValueError(
            "pca_train_from_moments: per-dimension row counts disagree "
            f"(min n={lo}, max n={hi}) — the corpus has partially-null "
            "or short vectors; drop/repair them before fitting"
        )
    n = next(iter(n_by_diag.values()), None)
    if seen != dim * (dim + 1) // 2 or n is None or n < 2:
        raise ValueError(
            "pca_train_from_moments: incomplete moment frame "
            f"({seen} rows, n={n})"
        )
    mean = s / n
    cov = (gram - n * np.outer(mean, mean)) / (n - 1)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T
    for i in range(k):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i][j] < 0:
            comps[i] = -comps[i]
    total = float(evals.sum()) or 1.0
    explained = [float(evals[o]) / total for o in order]
    return mean.tolist(), comps.tolist(), explained


def pca_project(
    df: DataFrame,
    mean: list[float],
    components: list[list[float]],
    emb_col: str = "embedding",
    out_col: str = "pca_emb",
) -> DataFrame:
    """Project embeddings onto the fitted components: ``out_col`` is
    array<double> of length k. Pure map — mean and components inline
    as literal arrays (k*dim driver state), one zip_with/aggregate
    dot per component, no UDF, no shuffle; works on batch AND
    streaming frames."""
    dim = len(mean)
    mean_arr = "array(" + ", ".join(f"{float(v)!r}D" for v in mean) + ")"
    dots = []
    for comp in components:
        if len(comp) != dim:
            raise ValueError("pca_project: component/mean length mismatch")
        comp_arr = "array(" + ", ".join(f"{float(v)!r}D" for v in comp) + ")"
        dots.append(
            f"aggregate(zip_with(zip_with({emb_col}, {mean_arr}, "
            "(x, mu) -> CAST(x AS DOUBLE) - mu), "
            f"{comp_arr}, (c, w) -> c * w), 0.0D, (acc, v) -> acc + v)"
        )
    return df.withColumn(out_col, F.expr("array(" + ", ".join(dots) + ")"))
