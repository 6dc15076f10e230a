"""Skew handling for joins and aggregations at scale.

AQE's skew-join splitting (enabled in session defaults) covers
sort-merge joins; explicit salting covers the cases AQE cannot —
skewed aggregation keys and skewed broadcast-ineligible joins where
one hot key would pin a single task at 100 TB.

``salted_join``: replicate the small side R times, salt the big side
with ``hash(row) % R`` — every hot key spreads over R tasks.
``two_phase_agg``: aggregate on (key, salt) first, then merge — the
manual map-side-combine for aggregations whose combiner state is too
big for hash-agg fallback.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT = "_salt"


def salt_column(n: int) -> Column:
    """Uniform salt in [0, n) — random-like but derived from rand()
    seeded per-task; for deterministic pipelines pass an explicit
    expression instead (e.g. pmod(xxhash64(pk), n))."""
    return (F.rand() * n).cast("int")


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join a skewed big side against a small (but not broadcast-able)
    side: big gets a salt, small is exploded across all salts, join on
    (key, salt). Output columns = usual join output (salt dropped).
    """
    salted_big = big.withColumn(SALT, salt_column(n_salts))
    exploded_small = small.withColumn(
        SALT, F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return salted_big.join(exploded_small, on=[on, SALT], how=how).drop(SALT)


def two_phase_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple],
    n_salts: int = 8,
) -> DataFrame:
    """Salted two-phase aggregation for skewed group keys.

    ``aggs`` maps output column -> (partial_fn, merge_fn) where both
    are pyspark.sql.functions aggregators, e.g.
    ``{"n": (F.count, F.sum), "total": (F.sum, F.sum)}`` applied to
    the column named by the output (pre-aliased upstream).
    """
    salted = df.withColumn(SALT, salt_column(n_salts))
    partial = salted.groupBy(*keys, SALT).agg(
        *[fn(F.col(out)).alias(out) for out, (fn, _) in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[merge(F.col(out)).alias(out) for out, (_, merge) in aggs.items()]
    )
