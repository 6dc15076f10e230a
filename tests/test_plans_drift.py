"""PLANS.md drift gate: the committed plan artifact must match what
tools/gen_plans.py generates from current source. Any plan-shape
change must regenerate PLANS.md in the same commit (VERDICT r4 #9).

Runs gen_plans in a subprocess (its own JVM/session — the generator's
session config differs from the test fixture's) and diffs normalized
text: AQE Statistics annotations (sizeInBytes varies with layout
noise) and codegen-id NUMBERS (assigned in AQE stage-completion
order, nondeterministic) are stripped; the operator TREE, scan
details, and which nodes are codegen'd at all are the contract.

r13: sections are now split from the RAW text and normalized
per-section, because the racy-section node bag needs the node ids
(which normalization strips) to expand `ReusedExchange [Reuses
operator id: N]` back into the referenced subtree. Whether AQE reuses
an exchange or re-plans an identical subtree is a stage-completion
race (the r12 q141 flake: a ReusedExchange one run, a fresh
BroadcastQueryStage subtree the next, so the bag counted the subtree
once vs twice); after expansion both forms bag identically, so the
comparison is reuse-invariant instead of retry-and-hope.
"""

from __future__ import annotations

import os
import re
import subprocess
import sys
import pytest

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
#: ReusedExchange is NOT here — it is expanded to the referenced
#: subtree by _node_bag, which is what makes reuse-vs-replan flips
#: invisible to the bag.
_AQE_PLUMBING = {
    "Exchange",
    "BroadcastExchange",
    "ShuffleQueryStage",
    "BroadcastQueryStage",
    "AQEShuffleRead",
    "ResultQueryStage",
    "AdaptiveSparkPlan",
}

#: A tree line: optional `:`/space rails, a `+-`/`:-` branch marker
#: (absent on roots), optional `* ` codegen star, the node name, and
#: the FIRST parenthesized integer after the name is its node id.
_TREE_LINE = re.compile(
    r"^(?P<indent>[\s:]*)(?:(?P<branch>[+:]\-)\s*)?\*?\s*"
    r"(?P<name>[A-Za-z][A-Za-z ]*[A-Za-z])[^(\n]*\((?P<id>\d+)\)"
)
_REUSE_REF = re.compile(
    r"^\((\d+)\) ReusedExchange(?: \[Reuses operator id: (\d+)\])?", re.M
)


def _final_tree_lines(section: str) -> list[str]:
    """The FINAL plan's tree lines: from `== Physical Plan ==` (or the
    `== Final Plan ==` marker when AQE prints both) to the Initial
    Plan echo or the `(n) Node` detail list, whichever comes first."""
    lines = section.splitlines()
    start = 0
    for i, line in enumerate(lines):
        if "== Final Plan ==" in line:
            start = i + 1
            break
        if line.startswith("== Physical Plan =="):
            start = i + 1  # keep scanning: Final Plan marker may follow
    out = []
    for line in lines[start:]:
        if "== Initial Plan ==" in line or re.match(r"^\(\d+\) ", line):
            break
        if line.strip():
            out.append(line)
    return out


def _strip_build_side(name: str) -> str:
    # "BroadcastHashJoin Inner BuildRight" -> "BroadcastHashJoin Inner"
    # (build side is exactly what the AQE race flips; the join TYPE
    # stays in the bag contract).
    return name.split(" Build")[0].strip()


def _node_bag(section: str) -> dict[str, int]:
    """Multiset of operator types in the FINAL plan tree, with AQE
    plumbing stripped and every ReusedExchange expanded to the subtree
    it references — the contention-invariant structural content.

    Operates on the RAW section (node ids intact): expansion needs the
    `[Reuses operator id: N]` pointer from the detail list plus the
    tree position of node N.
    """
    tree = _final_tree_lines(section)
    nodes: list[tuple[int, str, int]] = []  # (depth, name, id)
    for line in tree:
        m = _TREE_LINE.match(line)
        if not m:
            continue
        # a child's branch marker sits at the same column as a
        # marker-less root's name — +1 keeps children strictly deeper
        depth = (
            m.start("branch") + 1 if m.group("branch") else len(m.group("indent"))
        )
        nodes.append((depth, _strip_build_side(m.group("name")), int(m.group("id"))))

    # subtree extent per node index: children are subsequent nodes
    # with strictly greater depth, up to the next node at <= depth
    by_id: dict[int, int] = {}
    for idx, (_, _, nid) in enumerate(nodes):
        by_id.setdefault(nid, idx)

    reuse_of: dict[int, int] = {}
    for m in _REUSE_REF.finditer(section):
        if m.group(2) is not None:
            reuse_of[int(m.group(1))] = int(m.group(2))

    def subtree(idx: int) -> list[int]:
        d0 = nodes[idx][0]
        out = [idx]
        for j in range(idx + 1, len(nodes)):
            if nodes[j][0] <= d0:
                break
            out.append(j)
        return out

    bag: dict[str, int] = {}

    def add(idx: int, seen: frozenset[int]) -> None:
        _, name, nid = nodes[idx]
        if name == "ReusedExchange":
            ref = reuse_of.get(nid)
            tgt = by_id.get(ref) if ref is not None else None
            if tgt is not None and nid not in seen:
                for j in subtree(tgt):
                    add(j, seen | {nid})
            return
        if name in _AQE_PLUMBING:
            return
        bag[name] = bag.get(name, 0) + 1

    for i in range(len(nodes)):
        # top-level walk: every tree line once (subtrees of reused
        # exchanges are added again via expansion, matching what a
        # fresh re-plan would print)
        add(i, frozenset())
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
    """{query_name: RAW section body} from the '## qNN_... — why'
    headers. Raw (un-normalized) so the racy-section bag can resolve
    ReusedExchange node-id references; exact compares normalize
    per-section."""
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
        line.rstrip() for line in section.splitlines()
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
    return _split_sections(open(env["SPARK_GRAFT_PLANS_OUT"]).read())


def _section_differs(name: str, lraw: str, rraw: str) -> bool:
    if name in AQE_RACY_SECTIONS:
        return _scan_lines(lraw) != _scan_lines(rraw) or (
            _node_bag(lraw) != _node_bag(rraw)
        )
    return _normalize(lraw) != _normalize(rraw)


def _stale_sections(lsec, rsec) -> list[str]:
    return [n for n in rsec if _section_differs(n, lsec[n], rsec[n])]


def test_node_bag_reuse_expansion():
    """The r12 flake, pinned: a plan that reuses an exchange and a
    plan that re-plans the identical subtree must bag the same."""
    reused = """\
== Physical Plan ==
AdaptiveSparkPlan (9)
+- == Final Plan ==
   * HashAggregate (8)
   +- * BroadcastHashJoin Inner BuildRight (7)
      :- * Filter (3)
      :  +- Exchange (2)
      :     +- Scan parquet  (1)
      +- BroadcastQueryStage (6)
         +- BroadcastExchange (5)
            +- ReusedExchange (4)

(1) Scan parquet
(4) ReusedExchange [Reuses operator id: 2]
"""
    replanned = """\
== Physical Plan ==
AdaptiveSparkPlan (9)
+- == Final Plan ==
   * HashAggregate (8)
   +- * BroadcastHashJoin Inner BuildLeft (7)
      :- * Filter (3)
      :  +- Exchange (2)
      :     +- Scan parquet  (1)
      +- BroadcastQueryStage (6)
         +- BroadcastExchange (5)
            +- Scan parquet  (4)

(1) Scan parquet
"""
    assert _node_bag(reused) == _node_bag(replanned) == {
        "HashAggregate": 1,
        "BroadcastHashJoin Inner": 1,
        "Filter": 1,
        "Scan parquet": 2,
    }


@pytest.mark.drift
def test_plans_md_matches_generator(tmp_path):
    committed = open(os.path.join(ROOT, "PLANS.md")).read()
    lsec = _split_sections(committed)
    rsec = _regenerate(tmp_path, "a")
    assert set(lsec) == set(rsec), (
        f"headliner set changed: committed-only={sorted(set(lsec)-set(rsec))} "
        f"regenerated-only={sorted(set(rsec)-set(lsec))} — rerun gen_plans.py"
    )
    stale = _stale_sections(lsec, rsec)
    if stale:
        # A REAL plan change is deterministic: it reproduces in every
        # regeneration AND consecutive regenerations agree with each
        # other. An AQE stage-completion race (under full-suite CPU
        # contention) flips between regenerations. Regenerate up to
        # two more times; fail only on sections that stay stale in
        # every pass and whose last two regenerations agree.
        import warnings

        prev = rsec
        for tag in ("b", "c"):
            cur = _regenerate(tmp_path, tag)
            still = [n for n in stale if _section_differs(n, lsec[n], cur[n])]
            cleared = [n for n in stale if n not in still]
            if cleared:
                # visible trace: a real-but-flaky regression that the
                # retry happens to clear should not vanish silently
                warnings.warn(
                    "plans-drift retry cleared first-pass stale sections "
                    f"{cleared} — AQE stage race assumed; if a section "
                    "recurs here across runs, treat it as real drift",
                    stacklevel=1,
                )
            unstable = [
                n for n in still if _section_differs(n, prev[n], cur[n])
            ]
            if unstable:
                warnings.warn(
                    "plans-drift: sections nondeterministic between "
                    f"consecutive regenerations {unstable} — AQE race, "
                    "candidates for AQE_RACY_SECTIONS if they persist",
                    stacklevel=1,
                )
            stale = [n for n in still if n not in unstable]
            prev = cur
            if not stale:
                break
        rsec = prev
    if stale:
        import difflib

        detail = []
        for name in stale[:3]:
            detail.append(
                "\n".join(
                    difflib.unified_diff(
                        _normalize(lsec[name]).splitlines(),
                        _normalize(rsec[name]).splitlines(),
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
