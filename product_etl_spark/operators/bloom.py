"""Bloom-filter membership pre-filter for cross-batch dedup.

``dedup_incremental.incremental_dedup`` decides new-vs-seen with an
exact join against the persisted signature store. Correct — but at
100 TB of accepted history the store has O(accepted docs) rows, and
every incoming batch pays a join whose store side, even bucketed,
scales with history. The standard production fix (the shape Dolma's
dedup runs) is a BLOOM FILTER sidecar: a bounded-size summary of
every accepted key that answers "definitely new" with zero false
negatives, so only the (few) "maybe seen" rows pay the exact check.

Representation: bloom-as-table. An m-bit filter with k hashes is the
SET of set bit positions — stored as a single-column DataFrame of
distinct ints. That keeps it a plain mergeable parquet artifact
(merge = union/distinct, idempotent under replay), whose DISTINCT
set is bounded at min(k * distinct_keys, m) rows <= m regardless of
history size (append-mode partials can hold duplicates between
compactions; the probe dedupes before broadcasting), and probing is
a broadcast join of JVM-side xxhash64 buckets — no Python, no
driver-side bitmap, no UDF.

False-positive math is the textbook one: fpr ~= (1 - e^{-kn/m})^k;
with m = 16n bits and k = 4, under 1%. False positives only cost a
redundant exact check — NEVER a wrong dedup decision; false negatives
are impossible (every accepted key's buckets are in the table), so
composing with the exact store preserves exactness (asserted in
tests/test_cms_bloom.py).

Reference parity anchor: the reference's row-level skip is an
existence check per row (utils/details_translator/
db_orchestrator.py:70-72, utils/importer/ETL.py:226-234); this is
that same skip made sublinear in history size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bucket_array(key_col: str, m_bits: int, k: int, seed: int):
    return F.array(
        *[
            F.pmod(
                F.xxhash64(F.col(key_col).cast("string"), F.lit(seed), F.lit(j)),
                F.lit(m_bits),
            )
            for j in range(k)
        ]
    )


def bloom_partials(
    df: DataFrame,
    key_col: str,
    m_bits: int = 1 << 22,
    k: int = 4,
    seed: int = 0,
) -> DataFrame:
    """Keys -> their set bit positions (single column ``bucket``,
    distinct). Union partials from any number of batches and
    ``dropDuplicates`` to merge; re-adding already-present keys is a
    no-op (replay-idempotent, like the signature store)."""
    return (
        df.select(F.explode(_bucket_array(key_col, m_bits, k, seed)).alias("bucket"))
        .distinct()
    )


def bloom_union(*partials: DataFrame) -> DataFrame:
    """Merge bloom partials: bitwise OR == union of set positions."""
    out = partials[0]
    for p in partials[1:]:
        out = out.unionByName(p)
    return out.distinct()


def split_by_bloom(
    batch: DataFrame,
    bloom: DataFrame,
    key_col: str,
    m_bits: int = 1 << 22,
    k: int = 4,
    seed: int = 0,
    flag_col: str = "_maybe_seen",
) -> DataFrame:
    """Tag each batch row: ``flag_col`` = True iff ALL k of the key's
    buckets are set in ``bloom`` (maybe seen before -> needs the exact
    store check), False = DEFINITELY new (skip the store join).

    m_bits/k/seed must match the build call. Probing is per DISTINCT
    key (duplicate keys within the batch hash identically), and the
    bloom side is deduped then broadcast — the distinct bucket set is
    bounded at m_bits rows no matter how many append-mode partials
    the sidecar has accumulated — so the batch side never shuffles
    and duplicate partial rows can't multiply the probe join."""
    keys = batch.select(key_col).distinct()
    probes = keys.select(
        F.col(key_col),
        F.explode(_bucket_array(key_col, m_bits, k, seed)).alias("bucket"),
    )
    hit = probes.join(
        F.broadcast(
            bloom.select("bucket").distinct().withColumn("_hit", F.lit(1))
        ),
        on="bucket",
        how="left",
    )
    flags = hit.groupBy(key_col).agg(
        (F.min(F.coalesce(F.col("_hit"), F.lit(0))) == 1).alias(flag_col)
    )
    return batch.join(flags, on=key_col, how="left")
