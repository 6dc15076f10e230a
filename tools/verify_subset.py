#!/usr/bin/env python3
"""Targeted oracle parity: run the driver-faithful exact compare
(rows + schema + stringify-hash, plans/parity.compare_exact) for a
NAMED subset of catalog queries at sf0.001 AND sf0.01 — the
per-change verification loop of an optimization round, without
paying for the full-catalog sweep.

Usage: python tools/verify_subset.py q156 q164 q170 ...
Query names may be prefixes. Exit 1 on any failure.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from product_etl_spark import plans  # noqa: E402
from product_etl_spark.plans.parity import compare_exact  # noqa: E402
from product_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    if not args:
        sys.exit(__doc__)
    selected = {}
    for pat in args:
        hits = [n for n in plans.CATALOG if n == pat or n.startswith(pat)]
        if not hits:
            sys.exit(f"no catalog entry matches {pat!r}")
        for h in hits:
            selected[h] = plans.CATALOG[h]

    spark = get_spark("verify-subset", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    oracles = plans.oracle_sql()
    fail = 0
    t0 = time.time()
    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        for name, spec in selected.items():
            oracle = oracles.get(name)
            if oracle is None:
                print(f"SKIP {name} @ {sf_dir}: rows-only (no oracle)")
                continue
            try:
                good, msg = compare_exact(spec["fn"](spark, sf_dir), oracle, sf_dir)
            except Exception as e:  # noqa: BLE001
                good, msg = False, f"EXC {type(e).__name__}: {e}"
            tag = "OK  " if good else "FAIL"
            print(f"{tag} {name} @ {os.path.basename(sf_dir)}: {str(msg)[:200]}",
                  flush=True)
            fail += 0 if good else 1
    print(f"done: {len(selected)} queries x 2 sfs, {fail} failures, "
          f"wall={time.time() - t0:.1f}s")
    sys.exit(1 if fail else 0)


if __name__ == "__main__":
    main()
