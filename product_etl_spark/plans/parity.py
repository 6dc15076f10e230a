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


_TABLES = [
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
]


def run_oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    try:
        for name in _TABLES:
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


def run_oracle_pandas(sql: str, sf_dir: str):
    """Like :func:`run_oracle` but fetches the result as a pandas
    DataFrame — the way the DRIVER fetches it. The dtype coercions
    pandas applies here are part of the comparison surface: DuckDB
    HUGEINT (the type of SUM over integers) becomes float64, so a
    Spark BIGINT 370 vs an uncast oracle SUM 370 stringify as
    '370' vs '370.0' and hash-mismatch (q120, r6)."""
    con = duckdb.connect()
    try:
        for name in _TABLES:
            path = os.path.join(sf_dir, f"{name}.parquet")
            if os.path.exists(path):
                con.execute(
                    f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
                )
        return con.execute(sql).df()
    finally:
        con.close()


def _exact_cell(v):
    """Driver-faithful stringification: NO Decimal->float coercion, NO
    tolerance. The driver canonicalizes both result sets to pandas and
    hashes the stringified values, so ``Decimal('10.00')`` and the
    float ``10.0`` are DIFFERENT even though they are value-equal —
    exactly the class that produced the q68/q105 (r5) and q120/q134
    (r6) driver-red rows while the tolerant :func:`compare` stayed
    green locally."""
    if v is None:
        return "<NULL>"
    if isinstance(v, float) and math.isnan(v):
        return "<NULL>"
    if isinstance(v, bytes):
        return v.hex()
    tname = type(v).__name__
    if isinstance(v, (list, tuple, set, dict)) or tname == "ndarray":
        # The driver's pandas canonicalization cannot hash arrays at
        # all (q68, r5): surfacing one is an immediate failure.
        raise TypeError(
            f"non-scalar result cell {tname}: the driver cannot hash "
            "this — serialize arrays to strings at the result boundary"
        )
    if tname == "NaTType":
        return "<NULL>"
    if hasattr(v, "isoformat"):
        # duckdb's .df() materializes DATE as a midnight datetime64
        # while Spark surfaces datetime.date; date-surfacing queries
        # are driver-green (q07 r6), so midnight timestamps and dates
        # must canonicalize identically here too.
        if (
            getattr(v, "hour", 0) == 0
            and getattr(v, "minute", 0) == 0
            and getattr(v, "second", 0) == 0
            and getattr(v, "microsecond", 0) == 0
            and getattr(v, "tzinfo", None) is None
        ):
            return v.isoformat()[:10]
        return str(v)
    return str(v)


def _canon_exact_pdf(pdf):
    cols = sorted(pdf.columns)
    rows = [
        tuple(_exact_cell(row[c]) for c in cols)
        for row in pdf.to_dict("records")
    ]
    return sorted(rows), cols


def compare_exact(spark_df, oracle_sql: str, sf_dir: str):
    """Strict mirror of the driver's value-hash compare: BOTH results
    go through pandas (``toPandas`` / duckdb ``.df()``), columns are
    sorted by name, rows sorted by stringified values, then compared
    cell-by-cell by string equality — no numeric coercion, no
    tolerance. A query that passes this at the driver's sf (0.01)
    will hash-match in CORRECTNESS_r{N}.json; a Decimal/float or
    BIGINT/HUGEINT surface mismatch that the tolerant :func:`compare`
    hides fails here."""
    s_pdf = spark_df.toPandas()
    o_pdf = run_oracle_pandas(oracle_sql, sf_dir)
    if sorted(s_pdf.columns) != sorted(o_pdf.columns):
        return False, (
            f"columns differ: spark={sorted(s_pdf.columns)} "
            f"oracle={sorted(o_pdf.columns)}"
        )
    if len(s_pdf) != len(o_pdf):
        return False, f"row counts differ: spark={len(s_pdf)} oracle={len(o_pdf)}"
    try:
        s_canon, cols = _canon_exact_pdf(s_pdf)
    except TypeError as e:
        return False, f"spark result not driver-hashable: {e}"
    try:
        o_canon, _ = _canon_exact_pdf(o_pdf)
    except TypeError as e:
        return False, f"oracle result not driver-hashable: {e}"
    for i, (sr, orow) in enumerate(zip(s_canon, o_canon)):
        for c, (sv, ov) in zip(cols, zip(sr, orow)):
            if sv != ov:
                return False, f"row {i} col {c}: spark {sv!r} != oracle {ov!r}"
    return True, f"ok ({len(s_pdf)} rows, exact)"


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
