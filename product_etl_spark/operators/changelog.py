"""Changelog (CDC) application: materialize the latest snapshot from
a stream of keyed insert/update/delete records.

The Debezium/Flink-changelog shape: each record carries a key, a
monotonically increasing version (LSN / commit ts / offset), an op in
{'I','U','D'}, and the row payload. The current table state is, per
key, the payload of the highest-version record — unless that record
is a delete, in which case the key is absent.

Reference parity: the reference applies its change feeds row-at-a-time
through psycopg2 upserts/deletes (`utils/importer` and the maintenance
scripts); this is the set-based replacement that produces the same
final table in one pass.

Scale shape: ONE max-struct aggregation keyed by the natural key —
(version, op, payload...) packed into a struct, `max` picks the
highest version, a filter drops keys whose last op is a delete. No
window; one key shuffle with map-side partial aggregation (Spark
plans struct-max as SortAggregate — a streaming per-partition sort,
not a per-key history materialization, asserted in
tests/test_changelog.py). Ties on version are broken
deterministically by op then payload so replays are stable. Composes with upsert_parquet:
`apply_changelog(batch)` collapses a multi-event batch to one row per
key BEFORE the MERGE touches the store.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def apply_changelog(
    log: DataFrame,
    keys: list[str],
    version_col: str = "version",
    op_col: str = "op",
) -> DataFrame:
    """Latest surviving row per key. Output columns: keys + payload
    columns (version/op dropped) — the materialized table.

    Ops are case-insensitive; any op other than D/d ('I','U','c','r',
    Debezium's create/read snapshots…) counts as an upsert carrying a
    payload. Deletes only need the key."""
    payload = [
        c for c in log.columns if c not in (*keys, version_col, op_col)
    ]
    packed = F.struct(
        F.col(version_col).alias("_v"),
        F.upper(F.col(op_col)).alias("_op"),
        *[F.col(c).alias(c) for c in payload],
    )
    latest = log.groupBy(*keys).agg(F.max(packed).alias("_last"))
    return (
        latest.filter(F.col("_last._op") != "D")
        .select(*keys, *[F.col(f"_last.{c}").alias(c) for c in payload])
    )
