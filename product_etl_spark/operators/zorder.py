"""Z-order (Morton) data layout for multi-dimensional data skipping.

Predicate pushdown only pays off if the file/row-group min-max ranges
are tight on the filtered column. A sort on ONE column clusters that
column and scrambles the others; interleaving the bits of several
bucketed columns clusters ALL of them at once, so selective filters
on any of the z-ordered dimensions skip most files. This is the
write-side twin of the read-side pushdown assertions in
tests/test_plans.py — at 100 TB the scan you avoid is the cheapest
scan there is.

Everything is pure Catalyst expressions (shift/and/or terms unrolled
per bit — whole-stage codegen folds them), one range repartition by
the z-key, and a within-partition sort; no UDF, no driver data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from product_etl_spark.operators.quantiles import (
    bucket_expr,
    quantile_cutpoints_multi,
)


def interleave_bits(cols: list[Column], bits: int = 8) -> Column:
    """Morton code of already-bucketed non-negative ints in
    [0, 2^bits): bit i of column j lands at position i*len(cols)+j.
    Unrolled shift/or expression — stays inside codegen."""
    z: Column = F.lit(0).cast("long")
    n = len(cols)
    for i in range(bits):
        for j, c in enumerate(cols):
            bit = F.shiftright(c.cast("long"), i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * n + j))
    return z


def zorder_key(
    df: DataFrame, value_cols: list[str], bits: int = 8, key_col: str = "_zkey"
) -> DataFrame:
    """df + a Morton key over ``value_cols``: each column is first
    equal-frequency bucketed into 2^bits buckets via the distributed
    Greenwald-Khanna sketch (robust to skew — min/max scaling would
    collapse under outliers), then bit-interleaved. ONE sketch pass
    covers every column (multi-column approxQuantile); the key itself
    is map-only."""
    all_cuts = quantile_cutpoints_multi(df, value_cols, 2**bits)
    buckets = []
    out = df
    for c in value_cols:
        out = out.withColumn(f"_zb_{c}", bucket_expr(c, all_cuts[c]) - 1)
        buckets.append(F.col(f"_zb_{c}"))
    out = out.withColumn(key_col, interleave_bits(buckets, bits))
    return out.drop(*[f"_zb_{c}" for c in value_cols])


def write_zordered(
    df: DataFrame,
    path: str,
    value_cols: list[str],
    n_files: int,
    bits: int = 8,
) -> None:
    """Write parquet clustered on the Morton key: range-partition into
    ``n_files`` key ranges (so files own contiguous z-curve segments)
    and sort within each — every output file covers a small hyper-box
    of the value space, making its min-max stats selective on every
    z-ordered column."""
    keyed = zorder_key(df, value_cols, bits)
    (
        keyed.repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
