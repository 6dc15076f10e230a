"""PLANS.md drift gate: the committed plan artifact must match what
tools/gen_plans.py generates from current source. Any plan-shape
change must regenerate PLANS.md in the same commit (VERDICT r4 #9).

Runs gen_plans in a subprocess (its own JVM/session — the generator's
session config differs from the test fixture's) and diffs normalized
text: AQE Statistics annotations (sizeInBytes varies with layout
noise) and codegen-id NUMBERS (assigned in AQE stage-completion
order, nondeterministic) are stripped; the operator TREE, scan
details, and which nodes are codegen'd at all are the contract.
"""

from __future__ import annotations

import os
import re
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_STATS = re.compile(r", Statistics\([^)]*\)")
_CODEGEN_ID = re.compile(r"\[codegen id : \d+\]")

#: Sections whose TREE is legitimately nondeterministic under AQE:
#: when two near-equal-size intermediate stages both qualify for
#: broadcast, AQE broadcasts whichever shuffle stage completes first —
#: flipping BuildLeft/BuildRight (q95's SCD2 null-rejected branches,
#: q99's tf-vs-df aggregates over the same corpus) or even eliding an
#: Exchange entirely when the broadcast decision lands before the
#: other side's shuffle materializes (q105's groupwise-min join-back).
#: Stage completion order depends on CPU contention, so these race
#: only under load (e.g. the full pytest run). Neither side broadcasts
#: at production scale, so pinning a hint would falsify the scale
#: shape. For these we still require the SCAN lines
#: (PushedFilters/ReadSchema) to match exactly AND the bag of
#: non-AQE-plumbing operator types (joins, aggregates, filters,
#: generates, sorts, windows) to be identical — only the AQE stage
#: plumbing (Exchange/QueryStage/AQEShuffleRead wrapping and the tree
#: layout it induces) is exempt.
AQE_RACY_SECTIONS = {
    "q95_scd2_customer_history",
    "q99_tfidf_top_terms",
    "q105_tpch_q2_min_cost_supplier",
    # r9: five more sections whose multi-stage trees re-wrap under
    # load (idle vs full-pytest regeneration flips which near-equal
    # shuffle stage AQE materializes first — verified same operator
    # bag, same scan lines, only plumbing layout moved):
    "q113_bigram_lm_perplexity",
    "q121_hybrid_rrf_search",
    "q139_price_psi_drift",
    "q141_copurchase_triangles",
    "q147_crossdoc_dup_span_coverage",
    "q163_segment_balance_divergence",
}

#: AQE runtime plumbing node types excluded from the racy-section bag:
#: their count/placement is exactly what the race perturbs.
_AQE_PLUMBING = {
    "Exchange",
    "BroadcastExchange",
    "ShuffleQueryStage",
    "BroadcastQueryStage",
    "AQEShuffleRead",
    "ResultQueryStage",
}

_NODE = re.compile(r"(?:\+\-|\:\-)\s*\*?\s*([A-Za-z][A-Za-z ]*[A-Za-z])")


def _node_bag(section: str) -> dict[str, int]:
    """Multiset of operator types in a plan tree, build-side and AQE
    plumbing stripped — the contention-invariant structural content."""
    bag: dict[str, int] = {}
    for line in section.splitlines():
        m = _NODE.search(line)
        if not m:
            continue
        node = m.group(1).split(" Build")[0].strip()
        if node in _AQE_PLUMBING:
            continue
        bag[node] = bag.get(node, 0) + 1
    return bag


_NODE_ID = re.compile(r"\((\d+)\)")


def _normalize(text: str) -> str:
    """Strip the nondeterministic decorations before comparing:
    Statistics (layout noise), codegen ids (stage-completion order),
    NODE ids (pure positional renumbering — any plumbing change
    anywhere renumbers every node after it), and each section's
    '== Initial Plan ==' suffix (AQE re-prints it after finalization,
    and whether an exchange shows as planned or reused races with
    stage completion). The contract that remains: the FINAL plan's
    operator tree — join strategies, build sides, aggregate pairing,
    window placement — plus the scan detail lines."""
    out = []
    skipping = False
    for line in text.strip().splitlines():
        if line.startswith("+- == Initial Plan =="):
            skipping = True
        if line.startswith(("```", "## ")):
            skipping = False
        if skipping:
            continue
        line = _CODEGEN_ID.sub("[codegen]", _STATS.sub("", line))
        out.append(_NODE_ID.sub("(n)", line).rstrip())
    return "\n".join(out)


def _split_sections(text: str) -> dict[str, str]:
    """{query_name: section body} from the '## qNN_... — why' headers."""
    out: dict[str, str] = {}
    name = None
    buf: list[str] = []
    for line in text.splitlines():
        if line.startswith("## "):
            if name is not None:
                out[name] = "\n".join(buf)
            name = line[3:].split(" — ")[0].strip()
            buf = []
        else:
            buf.append(line)
    if name is not None:
        out[name] = "\n".join(buf)
    return out


def _scan_lines(section: str) -> list[str]:
    # SORTED: within racy sections AQE re-orders subtrees, permuting
    # the order scan details print in — the set of scans is the
    # contract, their print order is the race (q141, r9)
    return sorted(
        line for line in section.splitlines()
        if line.startswith(("PushedFilters", "ReadSchema"))
    )


def _regenerate(tmp_path, tag: str) -> dict[str, str]:
    env = dict(os.environ)
    env["SPARK_GRAFT_PLANS_OUT"] = str(tmp_path / f"PLANS_{tag}.md")
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "gen_plans.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=540,
        cwd=ROOT,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    return _split_sections(
        _normalize(open(env["SPARK_GRAFT_PLANS_OUT"]).read())
    )


def _stale_sections(lsec, rsec) -> list[str]:
    stale = []
    for name in rsec:
        if name in AQE_RACY_SECTIONS:
            if _scan_lines(lsec[name]) != _scan_lines(rsec[name]) or (
                _node_bag(lsec[name]) != _node_bag(rsec[name])
            ):
                stale.append(name)
        elif lsec[name] != rsec[name]:
            stale.append(name)
    return stale


def test_plans_md_matches_generator(tmp_path):
    committed = open(os.path.join(ROOT, "PLANS.md")).read()
    lsec = _split_sections(_normalize(committed))
    rsec = _regenerate(tmp_path, "a")
    assert set(lsec) == set(rsec), (
        f"headliner set changed: committed-only={sorted(set(lsec)-set(rsec))} "
        f"regenerated-only={sorted(set(rsec)-set(lsec))} — rerun gen_plans.py"
    )
    stale = _stale_sections(lsec, rsec)
    if stale:
        # A REAL plan change reproduces; an AQE stage-completion race
        # (under full-suite CPU contention) does not — regenerate once
        # more and fail only on sections stale BOTH times. This is a
        # race filter, not a tolerance: deterministic drift still
        # fails every run.
        rsec2 = _regenerate(tmp_path, "b")
        stale2 = set(_stale_sections(lsec, rsec2))
        cleared = [n for n in stale if n not in stale2]
        if cleared:
            # visible trace: a real-but-flaky regression that the
            # retry happens to clear should not vanish silently
            import warnings

            warnings.warn(
                "plans-drift retry cleared first-pass stale sections "
                f"{cleared} — AQE stage race assumed; if a section "
                "recurs here across runs, treat it as real drift",
                stacklevel=1,
            )
        stale = [n for n in stale if n in stale2]
    if stale:
        import difflib

        detail = []
        for name in stale[:3]:
            detail.append(
                "\n".join(
                    difflib.unified_diff(
                        lsec[name].splitlines(), rsec[name].splitlines(),
                        f"{name} (committed)", f"{name} (regenerated)",
                        lineterm="",
                    )
                )
            )
        raise AssertionError(
            f"PLANS.md is stale for {stale} — rerun `python tools/"
            "gen_plans.py` and commit it with the plan change:\n"
            + "\n\n".join(detail)[:8000]
        )
