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
