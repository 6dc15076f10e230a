#!/usr/bin/env python3
"""Capture .explain("formatted") for named catalog queries WITHOUT
executing them (driver-only planning) — the cheap half of
tools/measure_query.py --explain, for before/after plan evidence.

Usage: python tools/explain_query.py plans/r16 _before q217 q214 ...
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from product_etl_spark import plans  # noqa: E402
from product_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    if len(sys.argv) < 4:
        sys.exit(__doc__)
    out_dir, suffix, pats = sys.argv[1], sys.argv[2], sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    selected = {}
    for pat in pats:
        hits = [n for n in plans.CATALOG if n == pat or n.startswith(pat)]
        if not hits:
            sys.exit(f"no catalog entry matches {pat!r}")
        for h in hits:
            selected[h] = plans.CATALOG[h]
    spark = get_spark("explain-query")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out_dir, exist_ok=True)
    for name, spec in selected.items():
        df = spec["fn"](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        short = name.split("_")[0]
        path = os.path.join(out_dir, f"{short}{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
