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


def test_window_covers_all_never_driver_green():
    """Round-9 rotation invariant: every query with no GREEN driver
    row through r8 (the five registered after the r8 window froze and
    the five new-in-r9 entries; per COVERAGE.md) is in this round's
    window, plus every r5-stale entry the r8 verdict's item 4 names."""
    never_green_prefixes = {
        # registered after the r8 window froze
        "q164", "q165", "q166", "q167", "q168",
        # new in r9
        "q169", "q170", "q171", "q172", "q173",
    }
    r5_stale_prefixes = {
        "q53", "q55", "q65", "q67", "q76", "q77", "q78", "q80",
        "q82", "q83", "q84", "q85", "q86", "q88", "q89", "q90",
        "q93", "q100", "q101", "q103", "q104", "q106", "q107",
        "q108", "q109", "q110", "q111",
    }
    window_prefixes = {n.split("_")[0] for n in plans._DRIVER_WINDOW}
    missing = (never_green_prefixes | r5_stale_prefixes) - window_prefixes
    assert not missing, f"never-driver-green queries left out: {missing}"


def test_no_query_lost_in_reorder():
    names = list(plans.queries())
    assert len(names) == len(set(names)) == 176


def test_coverage_doc_matches_window():
    """COVERAGE.md is the rotation ledger: exactly the queries stamped
    `r9*` must be in _DRIVER_WINDOW, and every catalog query must have
    a ledger row — a drifted doc would misreport driver coverage to
    the next round."""
    import os
    import re

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rows = {}
    with open(os.path.join(root, "COVERAGE.md")) as f:
        for ln in f:
            m = re.match(r"\| (q\d+\S*) \| (.*) \|$", ln.strip())
            if m:
                rows[m.group(1)] = m.group(2)
    from product_etl_spark.plans.catalog import CATALOG

    assert set(rows) == set(CATALOG), (
        set(rows) ^ set(CATALOG)
    )
    scheduled = {n for n, stamps in rows.items() if "r9*" in stamps}
    assert scheduled == set(plans._DRIVER_WINDOW)


def test_next_window_queue_valid():
    """Queue entries must exist, carry oracles, and not already be in
    the window (they lead the NEXT round's rotation)."""
    oracles = plans.oracle_sql()
    for n in plans._NEXT_WINDOW_QUEUE:
        assert n in plans.CATALOG, n
        assert n in oracles or n in plans._ROWS_ONLY, n
        assert n not in plans._DRIVER_WINDOW, n
