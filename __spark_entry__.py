"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pricing-summary query at sf0.001.
``queries()`` / ``oracle_sql()`` expose the full catalog from
``product_etl_spark.plans`` — one entry per operator family in
SURVEY.md §2 plus the training-data operators (dedup, similarity
search, text analysis). Each oracle is ANSI SQL DuckDB runs over the
same parquet tables; column names are aligned on both sides.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from product_etl_spark import plans  # noqa: E402
from product_etl_spark.session import configure_session  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    configure_session(spark)
    return plans.CATALOG["q01_pricing_summary"]["fn"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name, spec in plans.CATALOG.items():
        fn = spec["fn"]

        def wrapped(spark, sf_dir, _fn=fn):
            configure_session(spark)
            return _fn(spark, sf_dir)

        out[name] = wrapped
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each query."""
    return plans.oracle_sql()
