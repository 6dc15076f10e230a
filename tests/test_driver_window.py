"""The driver checks only the first 50 entries of queries() — these
invariants keep that window family-complete and fully oracle-backed."""

from __future__ import annotations

from product_etl_spark import plans


def test_window_is_exactly_50_and_leads_catalog():
    assert len(plans._DRIVER_WINDOW) == 50
    assert list(plans.queries())[:50] == plans._DRIVER_WINDOW


def test_window_queries_all_have_oracles():
    """Every window query has a DuckDB oracle except the documented
    rows-only set (iterative ops with no ANSI equivalent)."""
    oracles = plans.oracle_sql()
    missing = [
        n for n in plans._DRIVER_WINDOW
        if n not in oracles and n not in plans._ROWS_ONLY
    ]
    assert not missing, f"driver-window queries without an oracle: {missing}"
    assert plans._ROWS_ONLY == {"q93_kmeans_ivf_lists"}


def test_rows_only_set_matches_catalog():
    """_ROWS_ONLY must be exactly the catalog entries registered with
    oracle=None — anything else means the constant drifted from the
    actual rows-only behavior the driver sees."""
    from product_etl_spark.plans.catalog import CATALOG

    no_oracle = {n for n, spec in CATALOG.items() if spec["oracle"] is None}
    assert no_oracle == plans._ROWS_ONLY


def test_window_covers_all_never_driver_checked():
    """Round-5 rotation invariant: every query that had no driver row in
    rounds 1-4 (per COVERAGE.md) is in this round's window."""
    never_checked_prefixes = {
        "q52", "q53", "q55", "q61", "q62", "q63", "q65", "q67", "q68",
        "q72", "q74", "q76", "q77", "q78", "q79", "q80", "q81", "q82",
        "q83", "q84", "q85", "q86", "q87", "q88", "q89", "q90", "q93",
        "q95", "q98", "q100", "q101", "q103", "q104", "q105", "q106",
        "q107", "q108", "q109", "q110", "q111", "q113",
    }
    window_prefixes = {n.split("_")[0] for n in plans._DRIVER_WINDOW}
    missing = never_checked_prefixes - window_prefixes
    assert not missing, f"never-driver-checked queries left out: {missing}"


def test_no_query_lost_in_reorder():
    names = list(plans.queries())
    assert len(names) == len(set(names)) == 120
