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
    """Round-14 rotation invariant (r13 verdict item 1 + the written
    plan): every query with no GREEN driver row — the 7-entry
    post-r13-freeze queue q219-q225 — is in this round's window,
    plus the ENTIRE 24-entry r9-last-green remainder per the
    COVERAGE.md ledger, q93~ rows-only, and 18 oldest-r10 fill reps
    (q174-q176 cohort first, then r10-stamped family reps in
    registration order; new-in-r14 registrations displace the fill
    tail). The six standing anchors are r12-fresh and sit out."""
    never_green_prefixes = {f"q{n}" for n in range(219, 231)}
    r9_stale_prefixes = {
        "q82", "q83", "q84", "q85", "q86", "q88", "q89", "q90", "q93",
        "q100", "q101", "q103", "q104", "q105", "q106", "q107", "q108",
        "q109", "q110", "q111", "q169", "q170", "q171", "q172", "q173",
    }
    r10_fill_prefixes = {
        "q174", "q175", "q176", "q03", "q04", "q05", "q06", "q07",
        "q08", "q09", "q10", "q11", "q14",
    }
    window_prefixes = {n.split("_")[0] for n in plans._DRIVER_WINDOW}
    expect = never_green_prefixes | r9_stale_prefixes | r10_fill_prefixes
    missing = expect - window_prefixes
    assert not missing, f"never-driver-green queries left out: {missing}"
    # the plan fills exactly 50 slots — nothing else slips in
    assert window_prefixes == expect


def test_no_query_lost_in_reorder():
    names = list(plans.queries())
    assert len(names) == len(set(names)) == 230


def test_coverage_doc_matches_window():
    """COVERAGE.md is the rotation ledger: exactly the queries stamped
    with THIS round's `rN*` must be in _DRIVER_WINDOW, and every
    catalog query must have a ledger row — a drifted doc would
    misreport driver coverage to the next round."""
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
    scheduled = {n for n, stamps in rows.items() if "r14*" in stamps}
    assert scheduled == set(plans._DRIVER_WINDOW)


def test_next_window_queue_valid():
    """Queue entries must exist, carry oracles, and not already be in
    the window (they lead the NEXT round's rotation)."""
    oracles = plans.oracle_sql()
    for n in plans._NEXT_WINDOW_QUEUE:
        assert n in plans.CATALOG, n
        assert n in oracles or n in plans._ROWS_ONLY, n
        assert n not in plans._DRIVER_WINDOW, n
