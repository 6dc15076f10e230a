"""2-D skyline (Pareto frontier) — the multi-objective shortlist
operator: keep every point not dominated by another (dominator is <=
on the minimized axis, >= on the maximized axis, strictly better on at
least one).

Shape choice: the classic formulation is a NOT-EXISTS self-join
(quadratic); the 2-D case collapses to ONE sort + ONE running-max
window — sort by (min_col asc, max_col desc), keep a point iff its
max_col strictly exceeds every earlier point's. Distinct (x, y) points
first, so duplicate points collapse and the price-tie case is decided
inside the sort order (same x, smaller y is dominated and follows its
dominator in the ordering).

Scale shape: a point can only be on the frontier if it has the best
(max) y among all points sharing its x — same x, lower y is dominated
— so the plan pre-aggregates groupBy(x).agg(max(y)) FIRST (map-side
combined), and the single-partition running-max window sees exactly
one row per DISTINCT x value, not one per distinct (x, y) pair. The
global stage is bounded by the x value space. (A truly huge distinct
x set would use the standard two-phase split: per-partition local
skyline first — local skyline is a superset filter that never drops a
global skyline point — then the global pass over the shrunken set.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def skyline_2d(df: DataFrame, min_col: str, max_col: str) -> DataFrame:
    """Distinct Pareto-optimal (min_col, max_col) points: minimize
    ``min_col``, maximize ``max_col``. Returns the two columns,
    distinct."""
    # one row per distinct x: only the max-y point at each x can be
    # Pareto-optimal (same x, lower y is dominated)
    pts = df.groupBy(min_col).agg(F.max(max_col).alias(max_col))
    w = (
        Window.orderBy(F.col(min_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        pts.withColumn("_prev_max", F.max(max_col).over(w))
        .filter(
            F.col("_prev_max").isNull()
            | (F.col(max_col) > F.col("_prev_max"))
        )
        .drop("_prev_max")
    )
