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
