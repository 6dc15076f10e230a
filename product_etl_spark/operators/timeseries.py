"""Time-series operators: calendar gap-fill with LOCF, trailing
time-range aggregates, and event-sequence transition counts.

The reference repo has no time-series module; these cover the
"hypertable rollup / continuous aggregate" family a training-data
analytics engine needs (SURVEY §2 extensions). Scale contract: every
window here is partitioned by an entity key — there are NO global
windows — and the per-key day grid is generated executor-side with
``sequence`` + ``explode`` (no driver loops, no cross joins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gapfill_locf(
    df: DataFrame, key_col: str, day_col: str, value_col: str
) -> DataFrame:
    """Fill missing calendar days per key and carry the last observed
    value forward (LOCF).

    Input: one row per (key, day) observation. Output: one row per
    (key, day) for EVERY day between the key's first and last
    observation, with ``<value>_filled`` (LOCF) and ``is_gap`` (1 for
    synthesized days).

    Scale shape: the day grid is built from a per-key min/max span
    aggregate (one shuffle on the key) and exploded executor-side —
    span length is bounded by the calendar, not the data. The LOCF
    window is partitioned by key, so no global sort exists anywhere.
    """
    spans = df.groupBy(key_col).agg(
        F.min(day_col).alias("_d0"), F.max(day_col).alias("_d1")
    )
    grid = spans.select(
        key_col, F.explode(F.sequence("_d0", "_d1")).alias(day_col)
    )
    joined = grid.join(df, [key_col, day_col], "left")
    w = (
        Window.partitionBy(key_col)
        .orderBy(day_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.withColumn(
        f"{value_col}_filled", F.last(value_col, ignorenulls=True).over(w)
    ).withColumn("is_gap", F.col(value_col).isNull().cast("int"))


def trailing_range_agg(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col,
    trailing_us: int,
    sum_alias: str = "trail_sum",
    count_alias: str = "trail_n",
) -> DataFrame:
    """Per-row trailing time-window aggregate: for each event, the sum
    and count of ``value_col`` over the same key within the preceding
    ``trailing_us`` microseconds (inclusive of the current row).

    Uses a RANGE frame over ``unix_micros(ts)`` — value-based, so
    duplicate timestamps are peers in both Spark and any SQL oracle.
    Window is partitioned by key: scale-safe.
    """
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.unix_micros(F.col(ts_col)))
        .rangeBetween(-trailing_us, 0)
    )
    return df.withColumn(sum_alias, F.sum(v).over(w)).withColumn(
        count_alias, F.count(F.lit(1)).over(w)
    )


def transition_counts(
    df: DataFrame, key_col: str, type_col: str, order_cols: list[str]
) -> DataFrame:
    """Markov transition counts over per-key event sequences:
    (prev_type, next_type) -> n. The lag window is partitioned by the
    key and totally ordered by ``order_cols`` (include a unique id as
    the final tiebreak for determinism)."""
    w = Window.partitionBy(key_col).orderBy(*order_cols)
    return (
        df.withColumn("_prev", F.lag(type_col).over(w))
        .filter(F.col("_prev").isNotNull())
        .groupBy(F.col("_prev").alias("prev_type"), F.col(type_col).alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
