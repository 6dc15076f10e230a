"""Scale-safe equal-frequency bucketing (the NTILE swap).

Exact ``NTILE(n) OVER (ORDER BY ...)`` is inherently a total order —
one task owns the whole sort at corpus scale (q76 keeps that form
because its oracle is exact). The 100 TB form computed here:
approximate quantile boundaries via Greenwald-Khanna
(``approxQuantile`` — distributed, one pass), broadcast the n-1
cutpoints as literals, and assign each row its bucket with a pure
expression — map-only, no window, no shuffle beyond the sketch
aggregation. Same output contract as NTILE modulo rows tied exactly
on a boundary value.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quantile_cutpoints(
    df: DataFrame, value_col: str, n_buckets: int, rel_err: float = 0.001
) -> list[float]:
    """The n-1 interior quantile boundaries (driver-side list —
    dimension-sized: n_buckets-1 doubles)."""
    probs = [i / n_buckets for i in range(1, n_buckets)]
    return df.approxQuantile(value_col, probs, rel_err)


def quantile_cutpoints_multi(
    df: DataFrame, value_cols: list[str], n_buckets: int, rel_err: float = 0.001
) -> dict[str, list[float]]:
    """Cutpoints for several columns from ONE distributed sketch pass
    (approxQuantile accepts a column list) — n columns must not mean
    n full scans of a 100 TB table."""
    probs = [i / n_buckets for i in range(1, n_buckets)]
    cuts = df.approxQuantile(value_cols, probs, rel_err)
    return dict(zip(value_cols, cuts))


def bucket_expr(value_col: str, cuts: list[float]) -> Column:
    """1-based bucket id as a pure expression:
    1 + number of cutpoints strictly below the value."""
    b: Column = F.lit(1)
    for c in cuts:
        b = b + F.when(F.col(value_col) > F.lit(c), 1).otherwise(0)
    return b


def approx_quantile_buckets(
    df: DataFrame,
    value_col: str,
    n_buckets: int = 4,
    rel_err: float = 0.001,
    bucket_col: str = "bucket",
) -> DataFrame:
    """df + ``bucket_col`` in 1..n_buckets with ~equal frequencies.
    Map-only after a one-pass distributed quantile sketch."""
    cuts = quantile_cutpoints(df, value_col, n_buckets, rel_err)
    return df.withColumn(bucket_col, bucket_expr(value_col, cuts))
