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
    """Round-15 rotation invariant (r14 verdict item 1 + the written
    plan): the post-freeze queue is EMPTY, so the ENTIRE 31-entry
    r10-last-green tier per the COVERAGE.md ledger leads, followed
    by the 19 oldest r11-last-green reps in registration order
    (new-in-r15 registrations displace the fill tail). The six
    standing anchors are r12-fresh and sit out once more."""
    r10_tier_prefixes = {
        "q15", "q17", "q19", "q22", "q25", "q28", "q37", "q39", "q42",
        "q48", "q50", "q118", "q119", "q121", "q122", "q123", "q124",
        "q125", "q126", "q127", "q128", "q129", "q130", "q131", "q132",
        "q133", "q135", "q136", "q177", "q178", "q179",
    }
    r11_fill_prefixes = {
        "q12", "q16", "q18", "q20", "q21", "q23", "q24", "q26", "q27",
        "q29", "q30", "q31", "q33", "q38", "q40", "q41", "q45", "q47",
        "q49",
    }
    window_prefixes = {n.split("_")[0] for n in plans._DRIVER_WINDOW}
    missing = r10_tier_prefixes - window_prefixes
    assert not missing, f"stale r10-tier queries left out: {missing}"
    # the plan fills exactly 50 slots — nothing else slips in; the
    # r11 fill tail may be displaced by new-in-r15 registrations
    extras = window_prefixes - r10_tier_prefixes - r11_fill_prefixes
    new_regs = {p for p in extras if int(p[1:]) >= 231}
    assert extras == new_regs, f"unexpected non-r15-reg entries: {extras - new_regs}"


def test_no_query_lost_in_reorder():
    names = list(plans.queries())
    assert len(names) == len(set(names)) == 236


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
    scheduled = {n for n, stamps in rows.items() if "r15*" in stamps}
    assert scheduled == set(plans._DRIVER_WINDOW)


def test_next_window_queue_valid():
    """Queue entries must exist, carry oracles, and not already be in
    the window (they lead the NEXT round's rotation)."""
    oracles = plans.oracle_sql()
    for n in plans._NEXT_WINDOW_QUEUE:
        assert n in plans.CATALOG, n
        assert n in oracles or n in plans._ROWS_ONLY, n
        assert n not in plans._DRIVER_WINDOW, n
