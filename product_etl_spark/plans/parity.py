"""Local mirror of the driver's oracle comparison.

For each catalog entry: run the Spark DataFrame and the DuckDB oracle
over the same parquet directory, canonicalize (columns sorted by
name, rows sorted), and compare. Used by tests/test_oracle_parity.py
and by bench sanity checks — failures here predict failures in the
driver's CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import math
import os
from decimal import Decimal

import duckdb


def run_oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    try:
        for name in [
            "region",
            "nation",
            "customer",
            "supplier",
            "part",
            "orders",
            "lineitem",
            "events",
            "documents",
            "embeddings",
        ]:
            path = os.path.join(sf_dir, f"{name}.parquet")
            if os.path.exists(path):
                con.execute(
                    f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
                )
        cur = con.execute(sql)
        cols = [d[0] for d in cur.description]
        rows = cur.fetchall()
        return cols, rows
    finally:
        con.close()


def _canon_cell(v):
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float):
        return v
    if hasattr(v, "isoformat"):  # date/datetime
        return v.isoformat()
    return v


def canonicalize(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon_cell(r[i]) for i in order) for r in rows]
    key = [tuple((x is None, str(x)) for x in r) for r in out]
    return [r for _, r in sorted(zip(key, out))], [cols[i] for i in order]


def compare(spark_df, oracle_sql: str, sf_dir: str, float_tol: float = 1e-6):
    """Return (ok, message). Row counts, column names, and values must
    match; floats within relative tolerance."""
    s_rows = [tuple(r) for r in spark_df.collect()]
    s_cols = spark_df.columns
    o_cols, o_rows = run_oracle(oracle_sql, sf_dir)
    if sorted(s_cols) != sorted(o_cols):
        return False, f"columns differ: spark={sorted(s_cols)} oracle={sorted(o_cols)}"
    if len(s_rows) != len(o_rows):
        return False, f"row counts differ: spark={len(s_rows)} oracle={len(o_rows)}"
    s_canon, cols = canonicalize(s_cols, s_rows)
    o_canon, _ = canonicalize(o_cols, o_rows)
    for i, (sr, orow) in enumerate(zip(s_canon, o_canon)):
        for c, (sv, ov) in zip(cols, zip(sr, orow)):
            if sv is None and ov is None:
                continue
            if isinstance(sv, float) or isinstance(ov, float):
                if sv is None or ov is None:
                    return False, f"row {i} col {c}: {sv!r} != {ov!r}"
                if not math.isclose(float(sv), float(ov), rel_tol=float_tol, abs_tol=float_tol):
                    return False, f"row {i} col {c}: {sv!r} != {ov!r}"
            elif sv != ov:
                return False, f"row {i} col {c}: {sv!r} != {ov!r}"
    return True, f"ok ({len(s_rows)} rows)"
