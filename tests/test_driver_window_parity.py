"""The 50 driver-window queries must pass the EXACT (driver-faithful)
compare at the driver's own scale factor (sf0.01).

Why this exists: the tolerant sf0.001 parity leg (plans/parity.compare)
coerces Decimal->float and allows 1e-6 — it stayed green while the
driver hash-mismatched q68/q105 (r5) and q120/q134 (r6) on pure
result-SURFACE type differences (Decimal vs float stringification,
DuckDB HUGEINT->float64 vs Spark BIGINT). compare_exact reproduces the
driver's pandas canonicalization + stringify-hash semantics so that
class can never pass locally again.
"""

from __future__ import annotations

import os

import pytest

from product_etl_spark import plans
from product_etl_spark.plans.parity import compare_exact

DRIVER_SF_DIR = os.environ.get(
    "SPARK_GRAFT_DRIVER_SF_DIR", "/root/testdata/sf0.01"
)


@pytest.mark.parametrize(
    "name", [*plans._DRIVER_WINDOW, *plans._NEXT_WINDOW_QUEUE]
)
def test_window_query_exact_at_driver_sf(spark, name):
    """Window entries AND registered-after-freeze queue entries: the
    queue leads the next round's window, so it must clear the exact
    harness from registration day (q166 hid a HUGEINT-surface oracle
    bug for a round because only the tolerant leg covered it)."""
    spec = plans.CATALOG[name]
    df = spec["fn"](spark, DRIVER_SF_DIR)
    assert df is not None
    if spec["oracle"] is None:
        assert df.count() >= 0  # rows-only, like the driver
        return
    ok, msg = compare_exact(df, spec["oracle"], DRIVER_SF_DIR)
    assert ok, f"{name}: {msg}"


def test_exact_mode_catches_decimal_surface(spark):
    """A deliberately Decimal-surfaced result must FAIL exact mode even
    though the values are numerically equal — the exact failure class
    of q105 (r5) and q134 (r6)."""
    df = spark.sql("SELECT CAST(1.50 AS DECIMAL(18,2)) AS v")
    ok, msg = compare_exact(df, "SELECT CAST(1.50 AS DOUBLE) AS v", DRIVER_SF_DIR)
    assert not ok, "exact mode must not coerce Decimal to float"
    # duckdb's .df() fetches even a DECIMAL oracle as float64, so a
    # Spark-side Decimal surface can NEVER hash-match — the recipe is
    # always CAST(... AS DOUBLE) on the Spark side:
    ok, msg = compare_exact(
        df, "SELECT CAST(1.50 AS DECIMAL(18,2)) AS v", DRIVER_SF_DIR
    )
    assert not ok, "Spark Decimal surface must fail even vs a DECIMAL oracle"
    ok, msg = compare_exact(
        spark.sql("SELECT CAST(CAST(1.50 AS DECIMAL(18,2)) AS DOUBLE) AS v"),
        "SELECT CAST(1.50 AS DECIMAL(18,2)) AS v",
        DRIVER_SF_DIR,
    )
    assert ok, msg


def test_exact_mode_catches_hugeint_surface(spark):
    """DuckDB SUM(int) yields HUGEINT which pandas fetches as float64
    ('370.0') while Spark surfaces BIGINT ('370') — the q120 (r6)
    class. An uncast oracle SUM must fail against a Spark BIGINT."""
    df = spark.sql("SELECT CAST(370 AS BIGINT) AS s")
    ok, _ = compare_exact(
        df, "SELECT SUM(x) AS s FROM (SELECT 370 AS x)", DRIVER_SF_DIR
    )
    assert not ok, "exact mode must surface the HUGEINT->float64 coercion"
    ok, _ = compare_exact(
        df,
        "SELECT CAST(SUM(x) AS BIGINT) AS s FROM (SELECT 370 AS x)",
        DRIVER_SF_DIR,
    )
    assert ok


def test_exact_mode_rejects_array_cells(spark):
    """Raw array columns are unhashable in the driver's pandas
    canonicalization (q68, r5) — exact mode must refuse them."""
    df = spark.sql("SELECT array(1, 2) AS v")
    ok, msg = compare_exact(df, "SELECT '1,2' AS v", DRIVER_SF_DIR)
    assert not ok and "hashable" in msg


def test_exact_mode_tolerates_date_vs_midnight_timestamp(spark):
    """duckdb .df() materializes DATE as midnight datetime64 while
    Spark surfaces datetime.date; date-surfacing queries are
    driver-green (q07 r6) so the canonicalization must agree."""
    df = spark.sql("SELECT DATE'1995-03-05' AS d")
    ok, msg = compare_exact(df, "SELECT DATE '1995-03-05' AS d", DRIVER_SF_DIR)
    assert ok, msg
