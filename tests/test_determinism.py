"""Every catalog query must produce identical results across two
executions in the same session — the driver's value-hash gate fails
on any hidden nondeterminism (rand, unordered limits, map iteration),
so catch it here first. Representative sample across families."""

from __future__ import annotations

import pytest

from product_etl_spark.plans import CATALOG

SAMPLE = [
    "q01_pricing_summary",
    "q02_top_revenue_orders",  # top-k with tiebreaks
    "q14_first_order_per_customer",  # window
    "q24_sessionization",
    "q31_minhash_signatures",
    "q32_lsh_near_dup_pairs",
    "q35_knn_bruteforce",  # float ordering
    "q36_lsh_bucket_histogram",
    "q47_event_pivot",
    "q60_deterministic_sample",
    "q66_context_packing",
    "q72_tpch_q3_shipping_priority",
]


@pytest.mark.parametrize("name", SAMPLE)
def test_two_runs_identical(spark, sf_dir, name):
    fn = CATALOG[name]["fn"]
    a = sorted(map(str, fn(spark, sf_dir).collect()))
    b = sorted(map(str, fn(spark, sf_dir).collect()))
    assert a == b
