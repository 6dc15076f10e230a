"""Vector math over array<float|double> embedding columns.

Pure Catalyst higher-order functions (``zip_with`` + ``aggregate``)
— no UDF, so similarity search scans stay inside codegen and
column-prune down to (id, embedding) at the parquet reader.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column | str, b: Column | str) -> Column:
    return F.aggregate(
        F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column | str) -> Column:
    return F.sqrt(
        F.aggregate(
            _c(a),
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )


def cosine(a: Column | str, b: Column | str) -> Column:
    return safe_cosine(dot(a, b), norm(a), norm(b))


def safe_cosine(dot_col: Column, norm_a: Column, norm_b: Column) -> Column:
    """dot/(na*nb) with a zero-norm guard: an all-zero embedding (the
    common placeholder for a missing embedding) yields similarity 0.0
    instead of throwing DIVIDE_BY_ZERO under ANSI mode (the Spark 4
    default) or silently producing NULL with ANSI off."""
    denom = norm_a * norm_b
    return F.when(denom == F.lit(0.0), F.lit(0.0)).otherwise(dot_col / denom)


def l2_distance(a: Column | str, b: Column | str) -> Column:
    return F.sqrt(
        F.aggregate(
            F.zip_with(
                _c(a),
                _c(b),
                lambda x, y: (x.cast("double") - y.cast("double"))
                * (x.cast("double") - y.cast("double")),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
