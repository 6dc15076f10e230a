"""Table profiler — the reference's completeness/count audits
(verify_collections.py:33-66) generalized into a one-pass column
profile, the ANALYZE-style statistics surface.

One aggregation job per table regardless of column count: every
per-column statistic is an aggregate expression in a single
``agg(...)``, so at 100 TB this is one scan with map-side partials —
never a per-column loop of jobs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_NUMERIC = {"int", "bigint", "double", "float", "smallint", "tinyint"}


def profile_table(df: DataFrame, approx_rsd: float = 0.05) -> DataFrame:
    """One row per column: n_rows, null count/pct, approx distinct,
    min/max (orderable types only). Runs as a single job."""
    exprs = [F.count(F.lit(1)).alias("__n_rows")]
    cols = []
    for f in df.schema.fields:
        name, dtype = f.name, f.dataType.simpleString()
        cols.append((name, dtype))
        exprs.append(F.count(F.col(name)).alias(f"__nn__{name}"))
        if dtype.startswith(("array", "map", "struct", "binary")):
            exprs.append(F.lit(None).cast("bigint").alias(f"__ad__{name}"))
            exprs.append(F.lit(None).cast("string").alias(f"__min__{name}"))
            exprs.append(F.lit(None).cast("string").alias(f"__max__{name}"))
        else:
            exprs.append(
                F.approx_count_distinct(name, approx_rsd).alias(f"__ad__{name}")
            )
            exprs.append(F.min(name).cast("string").alias(f"__min__{name}"))
            exprs.append(F.max(name).cast("string").alias(f"__max__{name}"))
    row = df.agg(*exprs).collect()[0]

    n = row["__n_rows"]
    out = []
    for name, dtype in cols:
        nn = row[f"__nn__{name}"]
        out.append(
            (
                name,
                dtype,
                n,
                n - nn,
                round(100.0 * (n - nn) / n, 2) if n else 0.0,
                row[f"__ad__{name}"],
                row[f"__min__{name}"],
                row[f"__max__{name}"],
            )
        )
    return df.sparkSession.createDataFrame(
        out,
        "column string, dtype string, n_rows long, n_nulls long, "
        "null_pct double, approx_distinct long, min_value string, max_value string",
    )
