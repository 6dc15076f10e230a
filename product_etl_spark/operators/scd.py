"""Slowly-changing-dimension Type 2: history-preserving upsert.

The reference keeps only current state plus audit timestamps
(created_on/modified_on triggers, utils/importer/add_timestamps.py) —
an update overwrites the old values. SCD2 is the history-preserving
extension a warehouse needs for "price at the time of the order"
joins: instead of overwriting, the old version is *closed*
(``valid_to`` stamped, ``is_current`` false) and a new open version
inserted.

Scale shape: one equi-join per merge, keyed on the business key —
the same shuffle every downstream join uses. Change detection is a
null-safe struct comparison (no per-column plan blowup), history
rows pass through untouched by a cheap ``is_current`` filter, and
nothing windows or sorts. On Delta/Iceberg the identical frame maps
onto ``MERGE INTO`` with whenMatched-close/whenNotMatched-insert.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCD_COLS = ("valid_from", "valid_to", "is_current")


def scd2_init(snapshot: DataFrame, effective_ts) -> DataFrame:
    """Open an initial SCD2 table from a first snapshot: every row
    current from ``effective_ts``, open-ended."""
    return snapshot.select(
        "*",
        F.lit(effective_ts).cast("timestamp").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )


def scd2_merge(
    table: DataFrame,
    snapshot: DataFrame,
    keys: list[str],
    effective_ts,
) -> DataFrame:
    """Merge a new full snapshot into an SCD2 table; returns the new
    table state.

    - key present with identical payload -> row untouched (rerunning
      the same snapshot is a no-op);
    - key present with changed payload -> the open row is closed at
      ``effective_ts`` and a new open version inserted;
    - new key -> new open version inserted;
    - key absent from the snapshot -> the open row is closed
      (the entity disappeared from the source) — pass a pre-filtered
      snapshot if absence should NOT close (partial feeds).

    ``snapshot`` must carry exactly the payload columns (business key
    + tracked attributes), no SCD columns.
    """
    bad = [c for c in SCD_COLS if c in snapshot.columns]
    if bad:
        raise ValueError(
            f"snapshot must carry only payload columns, found SCD columns {bad}"
        )
    missing = [k for k in keys if k not in snapshot.columns]
    if missing:
        raise ValueError(f"snapshot missing key columns {missing}")
    eff = F.lit(effective_ts).cast("timestamp")
    payload = [c for c in snapshot.columns if c not in keys]
    history = table.filter(~F.col("is_current"))
    open_rows = table.filter(F.col("is_current"))

    snap = snapshot.select(
        *keys,
        F.struct(*payload).alias("_new_payload"),
    )
    joined = open_rows.join(snap, keys, "full_outer")

    in_both = F.col("_new_payload").isNotNull() & F.col("valid_from").isNotNull()
    unchanged = in_both & (
        F.struct(*payload).eqNullSafe(F.col("_new_payload"))
    )
    changed = in_both & ~unchanged
    vanished = F.col("_new_payload").isNull() & F.col("valid_from").isNotNull()

    # surviving open rows: unchanged keys keep their version
    keep_open = joined.filter(unchanged).select(open_rows.columns)
    # closed versions: changed or vanished keys get valid_to stamped
    closed = (
        joined.filter(changed | vanished)
        .select(open_rows.columns)
        .withColumn("valid_to", eff)
        .withColumn("is_current", F.lit(False))
    )
    # new open versions: changed keys (new payload) + brand-new keys
    new_keys = F.col("valid_from").isNull() & F.col("_new_payload").isNotNull()
    biz_cols = [c for c in open_rows.columns if c not in SCD_COLS]
    inserted = (
        joined.filter(changed | new_keys)
        .select(
            *keys,
            *[F.col(f"_new_payload.{c}").alias(c) for c in payload],
        )
        .select(
            *biz_cols,
            eff.alias("valid_from"),
            F.lit(None).cast("timestamp").alias("valid_to"),
            F.lit(True).alias("is_current"),
        )
    )
    return history.unionByName(keep_open).unionByName(closed).unionByName(inserted)


def scd2_as_of(table: DataFrame, ts) -> DataFrame:
    """Point-in-time snapshot: the version of each key valid at
    ``ts`` (valid_from <= ts < valid_to, open-ended rows included).
    Map-only — at scale this predicate prunes on valid_from/valid_to
    min/max statistics per file."""
    t = F.lit(ts).cast("timestamp")
    return table.filter(
        (F.col("valid_from") <= t)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > t))
    ).drop(*SCD_COLS)
