"""The driver checks only the first 50 entries of queries() — these
invariants keep that window family-complete and fully oracle-backed."""

from __future__ import annotations

from product_etl_spark import plans


def test_window_is_exactly_50_and_leads_catalog():
    assert len(plans._DRIVER_WINDOW) == 50
    assert list(plans.queries())[:50] == plans._DRIVER_WINDOW


def test_window_queries_all_have_oracles():
    oracles = plans.oracle_sql()
    missing = [n for n in plans._DRIVER_WINDOW if n not in oracles]
    assert not missing, f"driver-window queries without an oracle: {missing}"


def test_no_query_lost_in_reorder():
    names = list(plans.queries())
    assert len(names) == len(set(names)) == 114
