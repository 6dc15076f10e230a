#!/usr/bin/env python3
"""Frozen-HEAD certification sweep: run EVERY oracle-backed catalog
entry through the driver-faithful exact compare (rows + schema +
stringify-hash) at the driver's own sf0.01, print one line per
failure and a final tally. The end-of-round ritual's step 2 (the
window/queue subset runs in every pytest via
tests/test_driver_window_parity.py; this is the all-catalog pass).

Run: python tools/sweep_exact.py   [SPARK_GRAFT_SWEEP_SF overrides]
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
    sf_dir = os.environ.get("SPARK_GRAFT_SWEEP_SF", "/root/testdata/sf0.01")
    spark = get_spark("sweep-exact", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    qs, oracles = plans.queries(), plans.oracle_sql()
    t0 = time.time()
    ok = fail = skipped = 0
    for name, fn in qs.items():
        oracle = oracles.get(name)
        if oracle is None:
            skipped += 1
            continue
        try:
            good, msg = compare_exact(fn(spark, sf_dir), oracle, sf_dir)
        except Exception as e:  # noqa: BLE001 — a sweep must finish
            good, msg = False, f"EXC {type(e).__name__}: {e}"
        if good:
            ok += 1
        else:
            fail += 1
            print(f"FAIL {name}: {str(msg)[:300]}", flush=True)
    print(
        f"SWEEP ok={ok} fail={fail} rows_only_skipped={skipped} "
        f"total={len(qs)} sf={sf_dir} wall={time.time() - t0:.1f}s"
    )
    sys.exit(1 if fail else 0)


if __name__ == "__main__":
    main()
