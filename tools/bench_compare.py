#!/usr/bin/env python3
"""Diff two BENCH_DETAIL.json files and print per-query regressions.

Usage: python tools/bench_compare.py OLD.json NEW.json [threshold]

Prints queries whose median wall changed by more than ``threshold``
(default 1.3x) in either direction, plus totals and the median ratio
across common queries (the machine-speed normalizer: if the median
ratio is 1.15, the box is 15% slower overall and only queries beyond
that baseline are real regressions).
"""

from __future__ import annotations

import json
import statistics
import sys


def main() -> None:
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    old = json.load(open(sys.argv[1]))
    new = json.load(open(sys.argv[2]))
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3
    oq, nq = old["queries"], new["queries"]
    common = sorted(set(oq) & set(nq))
    if not common:
        sys.exit("no common queries")
    ratios = {n: nq[n] / oq[n] for n in common if oq[n] > 0}
    med = statistics.median(ratios.values())
    print(
        f"old total {old['value']}s ({len(oq)} q)   "
        f"new total {new['value']}s ({len(nq)} q)   "
        f"median ratio {med:.3f} (machine-speed baseline)"
    )
    flagged = [
        (r / med, n)
        for n, r in ratios.items()
        if r / med > thr or r / med < 1 / thr
    ]
    for r, n in sorted(flagged, reverse=True):
        print(f"{r:6.2f}x  {oq[n]:7.3f} -> {nq[n]:7.3f}  {n}")
    if not flagged:
        print(f"no query beyond {thr}x of the machine-speed baseline")
    only_new = sorted(set(nq) - set(oq))
    if only_new:
        print("new queries:", ", ".join(f"{n} ({nq[n]}s)" for n in only_new))


if __name__ == "__main__":
    main()
