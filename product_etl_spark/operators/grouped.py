"""Grouped-map operators (``applyInPandas``) — for per-group logic
that genuinely needs a dataframe view of the whole group and can't be
expressed with window/agg expressions.

Rule of thumb encoded here: reach for applyInPandas only when the
per-group computation is (a) iterative/numeric over the full group
(fitting, normalization with robust statistics) or (b) calling a
Python-only library per group. Everything else in this repo stays in
Catalyst expressions — these are the sanctioned exceptions.

Scale contract: one group must fit in one task's memory (Arrow batch
per group). Group by keys with bounded fan-in (language, source,
label) — never by an unbounded key.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    StructField,
    StructType,
)


def groupwise_zscore(
    df: DataFrame, group_cols: list[str], value_col: str, out_col: str = "zscore"
) -> DataFrame:
    """Per-group z-score of a metric (e.g. quality calibrated per
    language so thresholds are comparable across groups). Degenerate
    groups (constant value) get z=0.
    """
    fields = [df.schema[c] for c in df.columns]
    out_schema = StructType(fields + [StructField(out_col, DoubleType())])

    def _zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        std = pdf[value_col].std(ddof=0)
        mean = pdf[value_col].mean()
        if std and std > 0:
            pdf[out_col] = (pdf[value_col] - mean) / std
        else:
            pdf[out_col] = 0.0
        return pdf

    return df.groupBy(*group_cols).applyInPandas(_zscore, schema=out_schema)


def groupwise_minmax_scale(
    df: DataFrame, group_cols: list[str], value_col: str, out_col: str = "scaled"
) -> DataFrame:
    """Per-group min-max scaling to [0, 1]; constant groups map to 0.5."""
    fields = [df.schema[c] for c in df.columns]
    out_schema = StructType(fields + [StructField(out_col, DoubleType())])

    def scale(pdf: pd.DataFrame) -> pd.DataFrame:
        lo, hi = pdf[value_col].min(), pdf[value_col].max()
        if hi > lo:
            pdf[out_col] = (pdf[value_col] - lo) / (hi - lo)
        else:
            pdf[out_col] = 0.5
        return pdf

    return df.groupBy(*group_cols).applyInPandas(scale, schema=out_schema)
