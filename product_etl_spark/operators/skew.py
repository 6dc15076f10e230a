"""Skew handling for joins and aggregations at scale.

AQE's skew-join splitting (enabled in session defaults) covers
sort-merge joins; explicit salting covers the cases AQE cannot —
skewed aggregation keys and skewed broadcast-ineligible joins where
one hot key would pin a single task at 100 TB.

``salted_join``: replicate the small side R times, salt the big side
with ``hash(row) % R`` — every hot key spreads over R tasks.
``two_phase_agg``: aggregate on (key, salt) first, then merge — the
manual map-side-combine for aggregations whose combiner state is too
big for hash-agg fallback.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT = "_salt"


def salt_column(n: int) -> Column:
    """Uniform salt in [0, n) — random-like but derived from rand()
    seeded per-task; for deterministic pipelines pass an explicit
    expression instead (e.g. pmod(xxhash64(pk), n))."""
    return (F.rand() * n).cast("int")


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join a skewed big side against a small (but not broadcast-able)
    side: big gets a salt, small is exploded across all salts, join on
    (key, salt). Output columns = usual join output (salt dropped).
    """
    salted_big = big.withColumn(SALT, salt_column(n_salts))
    exploded_small = small.withColumn(
        SALT, F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return salted_big.join(exploded_small, on=[on, SALT], how=how).drop(SALT)


def two_phase_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple],
    n_salts: int = 8,
) -> DataFrame:
    """Salted two-phase aggregation for skewed group keys.

    ``aggs`` maps output column -> (partial_fn, merge_fn) where both
    are pyspark.sql.functions aggregators, e.g.
    ``{"n": (F.count, F.sum), "total": (F.sum, F.sum)}`` applied to
    the column named by the output (pre-aliased upstream).
    """
    salted = df.withColumn(SALT, salt_column(n_salts))
    partial = salted.groupBy(*keys, SALT).agg(
        *[fn(F.col(out)).alias(out) for out, (fn, _) in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[merge(F.col(out)).alias(out) for out, (_, merge) in aggs.items()]
    )


def salted_self_pairs(
    df: DataFrame,
    block_col: str,
    id_col: str,
    n_salts: int = 4,
) -> DataFrame:
    """All intra-block pairs (id_a < id_b) with the work for a single
    giant block spread over n(n+1)/2 tasks instead of one.

    The plain formulation — self-join keyed on ``block_col`` — puts
    every pair of a hot block in ONE shuffle partition: a 10M-row
    block is 5·10^13 comparisons on a single task. Here each row gets
    a deterministic salt s = pmod(xxhash64(id), n) and each side is
    exploded with a partner tag: row (salt s, tag t) lands in the
    unordered sub-bucket (min(s,t), max(s,t)), and the join keys on
    the full (block, lo, hi) tuple — a SIDE-LOCAL expression, so it
    IS the shuffle key and a hot block spreads over n(n+1)/2
    partitions. Pair (a,b) matches exactly where A's tag = b's salt
    and B's tag = a's salt; the diagonal (equal salts) would match
    for every tag, so it is restricted to tag == salt. Cost: each
    side replicated n times (n stays small, 4-8) — the standard
    fan-out/skew trade.

    Returns columns: block_col, id_a, id_b, plus ``_a``/``_b``
    suffixed copies of every other column of ``df``.
    """
    others = [c for c in df.columns if c not in (block_col, id_col)]
    tags = F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))

    def side(suffix: str) -> DataFrame:
        salt = F.pmod(
            F.xxhash64(F.col(id_col).cast("string")), F.lit(n_salts)
        ).cast("int")
        return (
            df.select(
                F.col(block_col).alias(f"_blk{suffix}"),
                F.col(id_col).alias(f"id{suffix}"),
                *[F.col(c).alias(f"{c}{suffix}") for c in others],
                salt.alias(f"_s{suffix}"),
            )
            .withColumn(f"_t{suffix}", tags)
            .withColumn(
                f"_lo{suffix}", F.least(f"_s{suffix}", f"_t{suffix}")
            )
            .withColumn(
                f"_hi{suffix}", F.greatest(f"_s{suffix}", f"_t{suffix}")
            )
        )

    a, b = side("_a"), side("_b")
    return (
        a.join(
            b,
            (F.col("_blk_a") == F.col("_blk_b"))
            & (F.col("_lo_a") == F.col("_lo_b"))
            & (F.col("_hi_a") == F.col("_hi_b")),
        )
        # the bucket tuple matches iff A.tag == B.salt and B.tag ==
        # A.salt (unordered-pair equality); enforce the orientation so
        # off-diagonal pairs appear once, and pin the diagonal bucket
        # (equal salts match for every tag value) to tag == salt.
        .filter(
            (F.col("_t_a") == F.col("_s_b"))
            & (F.col("_t_b") == F.col("_s_a"))
            & (
                (F.col("_s_a") != F.col("_s_b"))
                | (F.col("_t_a") == F.col("_s_a"))
            )
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            F.col("_blk_a").alias(block_col),
            "id_a",
            "id_b",
            *[F.col(f"{c}_a") for c in others],
            *[F.col(f"{c}_b") for c in others],
        )
    )


def key_skew_profile(
    df: DataFrame,
    key_cols: list[str],
    top_n: int = 10,
    target_rows_per_task: int = 1_000_000,
) -> DataFrame:
    """Pre-shuffle skew diagnostic — the report to read BEFORE
    choosing between a plain join, ``salted_join``, or
    ``two_phase_agg``: the ``top_n`` heaviest join/agg keys with
    their row counts, share of the table, multiple of the mean key
    load, and a deterministic recommended salt factor
    ``ceil(n_rows / target_rows_per_task)`` (1 = no salting needed —
    the key fits one task at the target batch size).

    All integer/decimal arithmetic (shares are one double division of
    exact bigints, rounded 1e-6), so the report is driver-hashable
    (q192). Ties rank lexicographically by key for determinism.

    Scale shape: ONE groupBy over the key (map-side combined — the
    same shuffle the join/agg under diagnosis would pay, so running
    the profile costs what one aggregation costs), one broadcast
    1-row total, one TakeOrdered(top_n). No collect; the report is
    top_n rows.
    """
    key = [F.col(c) for c in key_cols]
    counts = df.groupBy(*key).agg(F.count(F.lit(1)).alias("n_rows"))
    tot = counts.agg(
        F.sum("n_rows").alias("_total"),
        F.count(F.lit(1)).alias("_n_keys"),
    )
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            *key,
            "n_rows",
            F.round(
                F.col("n_rows").cast("double") / F.col("_total").cast("double"),
                6,
            ).alias("share"),
            F.round(
                F.col("n_rows").cast("double")
                * F.col("_n_keys").cast("double")
                / F.col("_total").cast("double"),
                4,
            ).alias("x_mean"),
            F.ceil(
                F.col("n_rows").cast("double") / F.lit(float(target_rows_per_task))
            )
            .cast("bigint")
            .alias("salt_factor"),
        )
        .orderBy(F.col("n_rows").desc(), *key)
        .limit(top_n)
    )
