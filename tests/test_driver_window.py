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
    """Round-16 rotation invariant (r15 verdict item 9 + the written
    plan): the post-freeze queue is EMPTY, so the ENTIRE 37-entry
    r11-last-green tier per the COVERAGE.md ledger leads, followed
    by the six standing anchors (last green r12 — three rotations
    out, must not reach r13-stale) and the seven oldest r12 reps in
    registration order (new-in-r16 registrations displace the
    r12-rep tail, never the anchors)."""
    r11_tier_prefixes = {
        "q38", "q40", "q41", "q45", "q47", "q49", "q51", "q56", "q57",
        "q58", "q64", "q69", "q92", "q99", "q120", "q134", "q137",
        "q138", "q139", "q140", "q141", "q142", "q143", "q144", "q145",
        "q146", "q147", "q148", "q180", "q181", "q182", "q183", "q184",
        "q185", "q186", "q187", "q188",
    }
    anchor_prefixes = {"q01", "q02", "q32", "q94", "q112", "q114"}
    r12_fill_prefixes = {
        "q149", "q150", "q151", "q152", "q153", "q154", "q155",
    }
    window_prefixes = {n.split("_")[0] for n in plans._DRIVER_WINDOW}
    missing = r11_tier_prefixes - window_prefixes
    assert not missing, f"stale r11-tier queries left out: {missing}"
    missing_anchors = anchor_prefixes - window_prefixes
    assert not missing_anchors, f"anchors left out: {missing_anchors}"
    # the plan fills exactly 50 slots — nothing else slips in; the
    # r12 fill tail may be displaced by new-in-r16 registrations
    extras = (
        window_prefixes - r11_tier_prefixes - anchor_prefixes
        - r12_fill_prefixes
    )
    new_regs = {p for p in extras if int(p[1:]) >= 237}
    assert extras == new_regs, f"unexpected non-r16-reg entries: {extras - new_regs}"


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
    scheduled = {n for n, stamps in rows.items() if "r16*" in stamps}
    assert scheduled == set(plans._DRIVER_WINDOW)


def test_next_window_queue_valid():
    """Queue entries must exist, carry oracles, and not already be in
    the window (they lead the NEXT round's rotation)."""
    oracles = plans.oracle_sql()
    for n in plans._NEXT_WINDOW_QUEUE:
        assert n in plans.CATALOG, n
        assert n in oracles or n in plans._ROWS_ONLY, n
        assert n not in plans._DRIVER_WINDOW, n
