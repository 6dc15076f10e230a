"""Every catalog query must match its DuckDB oracle at sf0.001 —
the local mirror of the driver's correctness gate."""

from __future__ import annotations

import pytest

from product_etl_spark.plans import CATALOG
from product_etl_spark.plans.parity import compare


@pytest.mark.parametrize("name", sorted(CATALOG))
def test_query_matches_oracle(spark, sf_dir, name):
    spec = CATALOG[name]
    df = spec["fn"](spark, sf_dir)
    assert df is not None
    if spec["oracle"] is None:
        assert df.count() >= 0  # rows-only check, like the driver
        return
    ok, msg = compare(df, spec["oracle"], sf_dir)
    assert ok, f"{name}: {msg}"


def test_parity_harness_catches_mismatches(spark, sf_dir):
    """The compare itself must fail on wrong values/columns/counts —
    otherwise a broken oracle silently passes everything."""
    from product_etl_spark.plans.parity import compare

    df = CATALOG["q10_topk_brands"]["fn"](spark, sf_dir)
    ok, msg = compare(df, "SELECT 1 AS n_parts, 'x' AS p_brand", sf_dir)
    assert not ok and "row counts differ" in msg
    ok, msg = compare(df, "SELECT p_brand FROM part LIMIT 5", sf_dir)
    assert not ok and "columns differ" in msg
    wrong_vals = """
        SELECT p_brand, COUNT(*) + 1 AS n_parts
        FROM part GROUP BY p_brand
        ORDER BY n_parts DESC, p_brand ASC LIMIT 5
    """
    ok, msg = compare(df, wrong_vals, sf_dir)
    assert not ok
