"""Fourteenth extension catalog (q212+): round-12 additions — the
exact-decimal PCA Gram-moment pin (q213, operators/pca.pca_moments —
the driver-hashable sufficient-statistics surface the r11 verdict
asked for so the one remaining pytest-only numeric family gets a
hash row) and the suffix-automaton-free exact duplicated-substring
surface (q212, operators/suffixes — arbitrary-length cross-document
duplicated spans from distributed suffix ranking, upgrading the
fixed-n gram approximation of q147/q177 to the exact Lee et al. 2022
semantics).

Reference parity note: the reference (pandas+psycopg2 row loops,
ETL.py / main.py) computes none of this; these rows extend the
training-data-pipeline surface per the build brief.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from product_etl_spark.plans.catalog import _t, register


@register(
    "q213_pca_gram_moments",
    """
    WITH d AS (
      SELECT e.vec_id, u.pos - 1 AS pos,
             CAST(ROUND(CAST(u.val AS DOUBLE), 6) AS DECIMAL(18,6))
               AS val
      FROM embeddings e,
           LATERAL (SELECT unnest(e.embedding) AS val,
                           generate_subscripts(e.embedding, 1) AS pos) u
    )
    SELECT CAST(a.pos AS INT) AS i, CAST(b.pos AS INT) AS j,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(a.val) AS DOUBLE) AS s_i,
           CAST(SUM(b.val) AS DOUBLE) AS s_j,
           CAST(SUM(a.val * b.val) AS DOUBLE) AS gram
    FROM d a
    JOIN d b ON a.vec_id = b.vec_id AND a.pos <= b.pos
    WHERE a.val IS NOT NULL AND b.val IS NOT NULL
    GROUP BY a.pos, b.pos
    ORDER BY i, j
    """,
)
def q213_pca_gram_moments(spark, sf_dir):
    """PCA sufficient statistics as exact decimal Gram moments
    (pca.pca_moments): one row per upper-triangle dim pair with
    (n, s_i, s_j, gram) — mean and covariance, the ENTIRE input of
    pca_train's eigendecomposition, reconstruct from this frame
    alone (pca.pca_train_from_moments; parity pytest asserts the
    moment-trained projection matches the direct trainer). The
    eigensolve isn't ANSI-expressible; its sufficient statistics are
    — the q102/q161 exact-moment recipe lifted to the Gram matrix.

    Engine-exact: inputs round to 6 dp then DECIMAL(18,6); products
    and sums stay exact decimals (order-free), one double cast at
    the surface; ordering integer-decided.

    Scale shape: PURE MAP (each vector expands its own 2080
    upper-triangle pair structs in one higher-order expression — no
    self-join) + one map-side-combined groupBy on dim(dim+1)/2 keys;
    output is dim-bounded, partials mergeable, so a 100 TB fit is
    one aggregate."""
    from product_etl_spark.operators.pca import pca_moments

    e = _t(spark, sf_dir, "embeddings")
    return pca_moments(e, "embedding", dim=64)
