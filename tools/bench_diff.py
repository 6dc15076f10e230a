#!/usr/bin/env python3
"""Per-query regression diff between two bench.py JSON outputs.

Usage: python tools/bench_diff.py BENCH_r01.json BENCH_r02.json
       [--threshold 0.3]

Prints queries whose median moved more than ``threshold`` (relative)
in either direction, plus totals — the per-round feedback loop the
driver's single BENCH number doesn't give. Queries present in only
one file (catalog grew/shrank) are listed separately so a larger
catalog isn't misread as a regression of the total.
"""

from __future__ import annotations

import argparse
import json
import sys


def load(path: str) -> dict:
    """Accept bench.py's raw JSON line, or the driver's BENCH_r{N}
    wrapper ({"parsed": {...}} when complete, a truncated "tail"
    string when not — recover whatever per-query pairs survive)."""
    with open(path) as f:
        text = f.read()
    try:
        doc = json.loads(text)
    except json.JSONDecodeError:
        doc = None
        for line in reversed(text.strip().splitlines()):
            try:
                doc = json.loads(line)
                break
            except json.JSONDecodeError:
                continue
    if doc is None:
        raise SystemExit(f"{path}: no JSON found")
    if isinstance(doc.get("queries"), dict):
        return doc
    if isinstance(doc.get("parsed"), dict) and "queries" in doc["parsed"]:
        return doc["parsed"]
    if isinstance(doc.get("tail"), str):
        import re

        pairs = re.findall(r'"(q\w+)":\s*([0-9.]+)', doc["tail"])
        # the first extracted name may itself be truncated mid-key
        queries = {n: float(v) for n, v in pairs}
        if queries:
            return {"queries": queries, "partial": True}
    raise SystemExit(f"{path}: no per-query timings found")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=0.3)
    args = ap.parse_args()

    old, new = load(args.old), load(args.new)
    oq, nq = old.get("queries", {}), new.get("queries", {})
    shared = sorted(set(oq) & set(nq))
    added = sorted(set(nq) - set(oq))
    removed = sorted(set(oq) - set(nq))

    regressions, improvements = [], []
    for name in shared:
        a, b = oq[name], nq[name]
        if a <= 0:
            continue
        rel = (b - a) / a
        if rel > args.threshold:
            regressions.append((name, a, b, rel))
        elif rel < -args.threshold:
            improvements.append((name, a, b, rel))

    regressions.sort(key=lambda r: -r[3])
    improvements.sort(key=lambda r: r[3])

    shared_old = sum(oq[n] for n in shared)
    shared_new = sum(nq[n] for n in shared)
    print(f"shared queries: {len(shared)}  "
          f"total {shared_old:.1f}s -> {shared_new:.1f}s "
          f"({(shared_new - shared_old) / shared_old * 100:+.1f}%)")
    if added:
        print(f"added ({len(added)}): {', '.join(added)} "
              f"(+{sum(nq[n] for n in added):.1f}s not comparable)")
    if removed:
        print(f"removed ({len(removed)}): {', '.join(removed)}")
    for title, rows in (("REGRESSIONS", regressions), ("improvements", improvements)):
        if rows:
            print(f"\n{title} (>{args.threshold:.0%}):")
            for name, a, b, rel in rows:
                print(f"  {name}: {a:.3f}s -> {b:.3f}s ({rel:+.0%})")
    if not regressions:
        print("\nno per-query regressions above threshold")
    sys.exit(1 if regressions else 0)


if __name__ == "__main__":
    main()
