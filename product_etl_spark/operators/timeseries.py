"""Time-series operators: calendar gap-fill with LOCF, trailing
time-range aggregates, and event-sequence transition counts.

The reference repo has no time-series module; these cover the
"hypertable rollup / continuous aggregate" family a training-data
analytics engine needs (SURVEY §2 extensions). Scale contract: every
window here is partitioned by an entity key — there are NO global
windows — and the per-key day grid is generated executor-side with
``sequence`` + ``explode`` (no driver loops, no cross joins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gapfill_locf(
    df: DataFrame, key_col: str, day_col: str, value_col: str
) -> DataFrame:
    """Fill missing calendar days per key and carry the last observed
    value forward (LOCF).

    Input: one row per (key, day) observation. Output: one row per
    (key, day) for EVERY day between the key's first and last
    observation, with ``<value>_filled`` (LOCF) and ``is_gap`` (1 for
    synthesized days).

    Scale shape: the day grid is built from a per-key min/max span
    aggregate (one shuffle on the key) and exploded executor-side —
    span length is bounded by the calendar, not the data. The LOCF
    window is partitioned by key, so no global sort exists anywhere.
    """
    spans = df.groupBy(key_col).agg(
        F.min(day_col).alias("_d0"), F.max(day_col).alias("_d1")
    )
    grid = spans.select(
        key_col, F.explode(F.sequence("_d0", "_d1")).alias(day_col)
    )
    joined = grid.join(df, [key_col, day_col], "left")
    w = (
        Window.partitionBy(key_col)
        .orderBy(day_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.withColumn(
        f"{value_col}_filled", F.last(value_col, ignorenulls=True).over(w)
    ).withColumn("is_gap", F.col(value_col).isNull().cast("int"))


def trailing_range_agg(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col,
    trailing_us: int,
    sum_alias: str = "trail_sum",
    count_alias: str = "trail_n",
) -> DataFrame:
    """Per-row trailing time-window aggregate: for each event, the sum
    and count of ``value_col`` over the same key within the preceding
    ``trailing_us`` microseconds (inclusive of the current row).

    Uses a RANGE frame over ``unix_micros(ts)`` — value-based, so
    duplicate timestamps are peers in both Spark and any SQL oracle.
    Window is partitioned by key: scale-safe.
    """
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.unix_micros(F.col(ts_col)))
        .rangeBetween(-trailing_us, 0)
    )
    return df.withColumn(sum_alias, F.sum(v).over(w)).withColumn(
        count_alias, F.count(F.lit(1)).over(w)
    )


def transition_counts(
    df: DataFrame, key_col: str, type_col: str, order_cols: list[str]
) -> DataFrame:
    """Markov transition counts over per-key event sequences:
    (prev_type, next_type) -> n. The lag window is partitioned by the
    key and totally ordered by ``order_cols`` (include a unique id as
    the final tiebreak for determinism)."""
    w = Window.partitionBy(key_col).orderBy(*order_cols)
    return (
        df.withColumn("_prev", F.lag(type_col).over(w))
        .filter(F.col("_prev").isNotNull())
        .groupBy(F.col("_prev").alias("prev_type"), F.col(type_col).alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    ts_col: str,
    value_cols: list[str],
    direction: str = "backward",
    tolerance=None,
    strict: bool = False,
) -> DataFrame:
    """pandas.merge_asof semantics as ONE partitioned window — the
    q46 union-window formulation generalized: every left row gets the
    nearest preceding (``backward``) or following (``forward``) right
    row within the same ``by`` key, each right ``value_cols`` entry
    surfaced as ``<name>_asof`` plus the matched ``<ts_col>_asof``.

    ``tolerance`` (a Column-compatible interval/number matching the
    ts type's difference, e.g. ``F.expr("INTERVAL 7 DAYS")``) NULLs
    matches farther than the bound. ``strict=True`` excludes
    same-instant right rows (pandas ``allow_exact_matches=False``).

    Scale shape: NO range join and NO per-row subquery — left and
    right union into one frame, one window partitioned by ``by``
    ordered by (ts, side) carries the last/first right values, then
    left rows filter back out. Exactly one shuffle on the key; ties
    at the same timestamp resolve right-row-first (backward) /
    left-row-first (forward), matching merge_asof's inclusive
    default. At 100 TB this is the canonical Spark as-of shape:
    hash-partition by entity, sort within partition, single pass.

    Determinism contract: the right side must have at most ONE row
    per (by, ts) — with duplicates, WHICH duplicate's values surface
    depends on partition-internal order (pandas.merge_asof picks the
    last in input order; a distributed frame has no input order).
    Pre-aggregate the right side to one row per instant first.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction!r}")
    clash = sorted(
        c for c in left.columns
        if c in ("_side", "_asof_ts") or c.startswith(("_v_", "_m_"))
    )
    if clash:
        raise ValueError(f"asof_join reserved columns in left: {clash}")
    # side ordering: the right row must sort BEFORE the left row at an
    # equal timestamp for inclusive backward matches (and after it for
    # strict), mirrored for forward.
    right_first = (direction == "backward") != strict
    r = right.select(
        F.col(by),
        F.col(ts_col),
        F.lit(0 if right_first else 2).alias("_side"),
        F.col(ts_col).alias("_asof_ts"),
        *[F.col(c).alias(f"_v_{c}") for c in value_cols],
    )
    l = left.select(
        "*",
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_asof_ts"].dataType).alias("_asof_ts"),
        *[
            F.lit(None).cast(r.schema[f"_v_{c}"].dataType).alias(f"_v_{c}")
            for c in value_cols
        ],
    )
    unioned = l.unionByName(r, allowMissingColumns=True)
    if direction == "backward":
        w = (
            Window.partitionBy(by)
            .orderBy(F.col(ts_col).asc(), F.col("_side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        pick = lambda c: F.last(c, ignorenulls=True).over(w)  # noqa: E731
    else:
        w = (
            Window.partitionBy(by)
            .orderBy(F.col(ts_col).asc(), F.col("_side").asc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        pick = lambda c: F.first(c, ignorenulls=True).over(w)  # noqa: E731
    matched = unioned.select(
        "*",
        pick("_asof_ts").alias("_m_ts"),
        *[pick(f"_v_{c}").alias(f"_m_{c}") for c in value_cols],
    ).filter(F.col("_side") == 1)
    in_tol = F.lit(True)
    if tolerance is not None:
        gap = (
            F.col("_m_ts") - F.col(ts_col)
            if direction == "forward"
            else F.col(ts_col) - F.col("_m_ts")
        )
        in_tol = gap <= tolerance
    keep = F.col("_m_ts").isNotNull() & in_tol
    out_cols = [c for c in left.columns]
    return matched.select(
        *out_cols,
        F.when(keep, F.col("_m_ts")).alias(f"{ts_col}_asof"),
        *[
            F.when(keep, F.col(f"_m_{c}")).alias(f"{c}_asof")
            for c in value_cols
        ],
    )


def gapfill_interpolate(
    df: DataFrame, key_col: str, day_col: str, value_col: str
) -> DataFrame:
    """Linear-interpolation twin of ``gapfill_locf``: interior gaps
    take the straight line between the surrounding observations,
    leading gaps backfill from the first observation, trailing gaps
    carry the last forward. Output adds ``<value>_filled`` and
    ``is_gap``.

    Scale shape: identical to LOCF — executor-side day grid, then
    TWO frames over ONE key-partitioned sort (preceding for the
    previous observation, following for the next; same partition +
    ordering, so Catalyst plans one Exchange + one Sort feeding both
    Window nodes). The interpolation arithmetic is a fixed sequence
    of IEEE ops from identical inputs (int day deltas, double
    values), so results are engine-exact."""
    spans = df.groupBy(key_col).agg(
        F.min(day_col).alias("_d0"), F.max(day_col).alias("_d1")
    )
    grid = spans.select(
        key_col, F.explode(F.sequence("_d0", "_d1")).alias(day_col)
    )
    joined = grid.join(df, [key_col, day_col], "left")
    v = F.col(value_col).cast("double")
    w_back = (
        Window.partitionBy(key_col)
        .orderBy(day_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy(key_col)
        .orderBy(day_col)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_day = F.when(F.col(value_col).isNotNull(), F.col(day_col))
    prev_v = F.last(v, ignorenulls=True).over(w_back)
    prev_d = F.last(obs_day, ignorenulls=True).over(w_back)
    next_v = F.first(v, ignorenulls=True).over(w_fwd)
    next_d = F.first(obs_day, ignorenulls=True).over(w_fwd)
    interp = prev_v + (next_v - prev_v) * (
        F.datediff(F.col(day_col), prev_d).cast("double")
        / F.datediff(next_d, prev_d).cast("double")
    )
    filled = (
        F.when(F.col(value_col).isNotNull(), v)
        .when(prev_v.isNotNull() & next_v.isNotNull(), interp)
        .when(prev_v.isNotNull(), prev_v)
        .otherwise(next_v)
    )
    return joined.withColumn(f"{value_col}_filled", filled).withColumn(
        "is_gap", F.col(value_col).isNull().cast("int")
    )


def interval_overlap_pairs(
    df: DataFrame,
    key_col: str,
    id_col: str,
    start_col: str,
    end_col: str,
    cell: int = 900,
    max_cells_per_interval: int = 10_000,
) -> DataFrame:
    """All overlapping interval pairs per key — the interval-overlap
    join (visit/session alignment, meeting conflicts, downtime
    windows): pairs (id_a < id_b, same key) whose half-open integer
    intervals [start, end) intersect, with the intersection bounds.

    Scale shape: the naive formulation is a per-key self-join with a
    RANGE predicate — a single hot key degenerates to all-pairs and
    no equi-key exists for the shuffle. Here every interval explodes
    into the fixed grid cells it spans (sequence(floor(s/cell),
    floor(e/cell)) — bounded by duration/cell + 1 rows), candidates
    join on the EQUI key (key, cell) — any intersecting pair shares
    the cell of any point in their overlap — then exact verification
    (s_a < e_b AND s_b < e_a) and a distinct drop the grid artifacts.
    Pick ``cell`` near the typical interval length: smaller cells
    fan out long intervals, larger cells group unrelated ones. A
    degenerate interval (a years-long span against a minutes-sized
    cell) would silently explode into millions of grid rows on one
    task; any interval spanning more than ``max_cells_per_interval``
    cells therefore FAILS the job loudly (assert_true) — raise the
    bound or the cell size deliberately, don't discover it as an
    executor OOM.

    Empty and reversed intervals (end <= start) are DROPPED before the
    grid explode: a half-open [s, e) with e <= s contains no points,
    so it overlaps nothing by definition — but the verification
    predicate (s_a < e_b AND s_b < e_a) alone would still emit a
    spurious pair (with ov_start >= ov_end) when another interval
    spans a reversed one, and Spark's sequence() auto-descends on a
    reversed span, silently exploding its cells.

    Output: key_col, id_a, id_b, ov_start, ov_end.
    """
    iv = df.select(
        F.col(key_col),
        F.col(id_col).alias("_iid"),
        F.col(start_col).cast("long").alias("_s"),
        F.col(end_col).cast("long").alias("_e"),
    ).filter(F.col("_e") > F.col("_s"))
    span_cells = F.floor(F.col("_e") / cell) - F.floor(F.col("_s") / cell)
    guard = F.assert_true(
        span_cells <= F.lit(max_cells_per_interval),
        F.concat(
            F.lit("interval_overlap_pairs: interval spans > "
                  f"{max_cells_per_interval} grid cells (id="),
            F.col("_iid").cast("string"),
            F.lit(f", cell={cell}); raise max_cells_per_interval or cell"),
        ),
    )
    # assert_true returns NULL on success; folding it into the start
    # column keeps it in the evaluated plan (a free-standing guard
    # column would be pruned as unused and never run)
    iv = iv.withColumn("_s", F.when(guard.isNull(), F.col("_s")))
    cells = iv.select(
        key_col,
        "_iid",
        "_s",
        "_e",
        F.explode(
            F.sequence(
                F.floor(F.col("_s") / cell), F.floor(F.col("_e") / cell)
            )
        ).alias("_cell"),
    )
    a = cells.select(
        F.col(key_col),
        F.col("_cell"),
        F.col("_iid").alias("id_a"),
        F.col("_s").alias("_s_a"),
        F.col("_e").alias("_e_a"),
    )
    b = cells.select(
        F.col(key_col).alias("_k_b"),
        F.col("_cell").alias("_cell_b"),
        F.col("_iid").alias("id_b"),
        F.col("_s").alias("_s_b"),
        F.col("_e").alias("_e_b"),
    )
    return (
        a.join(
            b,
            (F.col(key_col) == F.col("_k_b"))
            & (F.col("_cell") == F.col("_cell_b"))
            & (F.col("id_a") < F.col("id_b")),
        )
        .filter(
            (F.col("_s_a") < F.col("_e_b")) & (F.col("_s_b") < F.col("_e_a"))
        )
        .select(
            key_col,
            "id_a",
            "id_b",
            F.greatest("_s_a", "_s_b").alias("ov_start"),
            F.least("_e_a", "_e_b").alias("ov_end"),
        )
        .distinct()
    )


def user_burstiness(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    event_id_col: str = "event_id",
    min_events: int = 3,
) -> DataFrame:
    """Inter-arrival burstiness per user — the bot/spam signal a
    training-data curation pass uses to down-weight machine-generated
    activity: a human's event gaps are irregular (CV ~ 1, bursty > 1),
    a scripted poller's are metronomic (CV ~ 0). Computed EXACTLY from
    integer microsecond gaps via moment sums (count / sum / sum-of-
    squares are whole numbers; the only floats are the two divisions
    and one sqrt at the ROUND(.,6) surface, evaluated in a fixed
    order both engines share).

    Output: (user, n_events, mean_gap_s, cv_gap) for users with at
    least ``min_events`` events (>= 2 gaps, so variance is defined).
    cv_gap = population-stddev(gaps) / mean(gaps). Gaps are measured
    in whole SECONDS (integer-floored from microseconds): second
    granularity keeps the exact integer moment sums inside bigint —
    a single 50-minute gap SQUARED in microseconds already overflows
    int64, and ANSI Spark would throw, not wrap.

    Scale shape: ONE user-partitioned LAG window (the q24/q52 shape —
    never global), then one map-side-combined groupBy(user) carrying
    three integer aggregates. The variance uses the fixed-order IEEE
    form s2/n - mean^2 (each operand an exact integer), so two
    engines compute bit-identical doubles.
    """
    # order by full microsecond precision (ties by event_id_col);
    # gaps floor to seconds only for the moment sums
    w = Window.partitionBy(user_col).orderBy(
        F.col("_us").asc(), F.col(event_id_col).asc()
    )
    gaps = (
        events.select(
            F.col(user_col),
            F.col(event_id_col),
            F.unix_micros(F.col(ts_col)).alias("_us"),
        )
        .withColumn("_s_ts", F.expr("_us div 1000000"))
        .withColumn("_gap", F.col("_s_ts") - F.lag("_s_ts").over(w))
        .filter(F.col("_gap").isNotNull())
    )
    agg = gaps.groupBy(user_col).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("_gap").alias("_s"),
        F.sum(F.col("_gap") * F.col("_gap")).alias("_s2"),
    )
    n, s, s2 = F.col("_n"), F.col("_s"), F.col("_s2")
    mean = s.cast("double") / n.cast("double")
    var = s2.cast("double") / n.cast("double") - mean * mean
    return (
        agg.filter(n >= F.lit(min_events - 1))
        .select(
            F.col(user_col),
            (n + F.lit(1)).alias("n_events"),
            F.round(mean, 6).alias("mean_gap_s"),
            F.round(
                F.when(s == 0, F.lit(0.0)).otherwise(
                    F.sqrt(F.greatest(var, F.lit(0.0))) / mean
                ),
                6,
            ).alias("cv_gap"),
        )
    )


def cusum_changepoint(
    df: DataFrame, ts_col: str = "ts", id_alias: str = "day"
) -> DataFrame:
    """CUSUM changepoint localization over the daily event-count
    series (Page 1954): S_t = sum_{i<=t} (D*n_i - N), the
    integer-scaled cumulative deviation from the mean daily rate
    (D = days observed, N = total events — multiplying through by D
    keeps every statistic an exact BIGINT, no float mean anywhere).
    |S| peaks at the most likely level-shift point; a drift monitor
    (PSI q139 / KS q148) says THAT the distribution moved — this
    says WHEN the rate moved, which is what gets bisected.

    Output: the full daily curve (day, n_events, cusum, is_peak) —
    is_peak marks the argmax |S| (earliest day on ties,
    integer-decided).

    Scale shape: ONE day-keyed map-side-combined groupBy (the only
    corpus-sized work); the series then DENSIFIES to the full
    calendar span (zero-event days walk S_t down — an outage must
    peak, not vanish); totals fold as a broadcast 1-row aggregate;
    the cumulative window and the peak rank run over the
    #days-bounded curve."""
    observed = df.groupBy(F.to_date(F.col(ts_col)).alias(id_alias)).agg(
        F.count(F.lit(1)).alias("_obs")
    )
    # DENSIFY to the full calendar span: a zero-event day must walk
    # S_t down like any other below-mean day — building the series
    # from observed days only would make a total outage invisible to
    # the statistic (no rows, no deviation).
    span = observed.agg(
        F.min(id_alias).alias("_lo"), F.max(id_alias).alias("_hi")
    )
    alldays = span.select(
        F.explode(F.sequence(F.col("_lo"), F.col("_hi"))).alias(id_alias)
    )
    daily = alldays.join(observed, id_alias, "left").select(
        id_alias,
        F.coalesce(F.col("_obs"), F.lit(0)).alias("n_events"),
    )
    tot = daily.agg(
        F.count(F.lit(1)).alias("_d"), F.sum("n_events").alias("_n")
    )
    w = (
        Window.orderBy(id_alias)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cur = daily.crossJoin(F.broadcast(tot)).select(
        id_alias,
        F.col("n_events").cast("long").alias("n_events"),
        F.sum(F.col("_d") * F.col("n_events") - F.col("_n"))
        .over(w)
        .cast("long")
        .alias("cusum"),
    )
    rk = F.row_number().over(
        Window.orderBy(F.abs(F.col("cusum")).desc(), F.col(id_alias).asc())
    )
    return (
        cur.select(
            id_alias,
            "n_events",
            "cusum",
            F.when(rk == 1, F.lit(1)).otherwise(F.lit(0))
            .cast("int")
            .alias("is_peak"),
        )
        .orderBy(id_alias)
    )


def kaplan_meier(
    df: DataFrame,
    user_col: str,
    ts_col: str = "ts",
    censor_last_days: int = 3,
) -> DataFrame:
    """Kaplan-Meier survival estimate of user lifetime (Kaplan &
    Meier 1958) — churn analysis with CENSORING, the step q98's
    cohort-retention grid cannot take: a user whose last activity
    falls within ``censor_last_days`` of the observation end is not
    churned, just unobserved, and treating them as dead biases every
    retention number downward. Lifetime t = days between a user's
    first and last event; events (churns) at t are uncensored users;
    the risk set n_t counts every user with lifetime >= t.

        S(t) = prod_{t_i <= t, d_i > 0} (1 - d_i / n_i)

    Output: one row per distinct lifetime (t, n_at_risk, n_events,
    n_censored, survival), ordered by t.

    Float policy: d/n is one division of exact-integer doubles; each
    ln(1 - d/n) term is ROUND(.,9) -> DECIMAL so the cumulative sum
    is ORDER-FREE and exact; survival = exp of that exact sum, once,
    ROUND(.,6); the d = n extinction row (only possible at max t) is
    an integer-decided flag forcing survival 0.

    Scale shape: one (user) groupBy over the events is the only
    corpus-sized work; the lifetime table is bounded by the
    observation window in DAYS, so the risk-set cumulative windows
    run over a handful of rows at any corpus size."""
    days = df.select(
        F.col(user_col).alias("_u"), F.to_date(F.col(ts_col)).alias("_d")
    )
    per_user = days.groupBy("_u").agg(
        F.min("_d").alias("_first"), F.max("_d").alias("_last")
    )
    end = per_user.agg(F.max("_last").alias("_end"))
    lf = per_user.crossJoin(F.broadcast(end)).select(
        F.datediff(F.col("_last"), F.col("_first")).alias("t"),
        F.when(
            F.datediff(F.col("_end"), F.col("_last"))
            >= F.lit(censor_last_days),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("_event"),
    )
    g = lf.groupBy("t").agg(
        F.count(F.lit(1)).alias("_m"), F.sum("_event").alias("_d_evt")
    )
    tot = g.agg(F.sum("_m").alias("_tot"))
    w = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cur = g.crossJoin(F.broadcast(tot)).select(
        "t",
        "_m",
        "_d_evt",
        (F.col("_tot") - F.sum("_m").over(w) + F.col("_m")).alias("_n"),
    )
    nd = F.col("_n").cast("double")
    dd = F.col("_d_evt").cast("double")
    term = F.when(
        F.col("_d_evt") < F.col("_n"),
        F.round(F.log(F.lit(1.0) - dd / nd), 9).cast("decimal(18,9)"),
    )
    cur = cur.select(
        "t",
        "_m",
        "_d_evt",
        "_n",
        F.sum(term).over(w).alias("_lnsum"),
        F.max(
            F.when(F.col("_d_evt") >= F.col("_n"), F.lit(1)).otherwise(
                F.lit(0)
            )
        )
        .over(w)
        .alias("_dead"),
    )
    return cur.select(
        F.col("t").cast("long").alias("t"),
        F.col("_n").cast("long").alias("n_at_risk"),
        F.col("_d_evt").cast("long").alias("n_events"),
        (F.col("_m") - F.col("_d_evt")).cast("long").alias("n_censored"),
        F.when(F.col("_dead") == 1, F.lit(0.0))
        .otherwise(
            F.round(
                F.exp(
                    F.coalesce(
                        F.col("_lnsum").cast("double"), F.lit(0.0)
                    )
                ),
                6,
            )
        )
        .alias("survival"),
    ).orderBy("t")


def mad_anomaly_days(
    df: DataFrame,
    ts_col: str = "ts",
    k: int = 3,
) -> DataFrame:
    """Robust POINT-anomaly flags on the daily event-count series:
    flag days where |n - median| > k * MAD (the median absolute
    deviation rule, the outlier test that a single crazy day cannot
    poison, unlike mean/stddev z-scores) — the point-anomaly
    companion to q205's CUSUM level-shift localization and the
    time-series sibling of q153's per-group MAD outliers.

    Entirely INTEGER-decided: with doubled order statistics
    (med2 = lower+upper middle of n, so always an exact integer even
    for even-length series), the deviation dev = |2n - med2| is an
    integer, the doubled MAD med2dev = lower+upper middle of dev is
    an integer, and the flag is the cross-multiplication
    2*dev > k*med2dev — no float appears anywhere.

    Output: the full daily curve (day, n_events, dev2, is_anomaly),
    dev2 = |2n - med2| for the report's own audit trail.

    Scale shape: the day-keyed groupBy is the only corpus-sized
    work; the series densifies to the calendar span (a zero-event
    day must be flaggable); medians come from row_number windows
    over the #days-bounded curve."""
    observed = df.groupBy(F.to_date(F.col(ts_col)).alias("day")).agg(
        F.count(F.lit(1)).alias("_obs")
    )
    span = observed.agg(
        F.min("day").alias("_lo"), F.max("day").alias("_hi")
    )
    daily = (
        span.select(
            F.explode(F.sequence(F.col("_lo"), F.col("_hi"))).alias("day")
        )
        .join(observed, "day", "left")
        .select(
            "day", F.coalesce(F.col("_obs"), F.lit(0)).alias("n_events")
        )
    )

    def _med2(frame: DataFrame, col: str) -> DataFrame:
        """1-row frame with med2 = (lower middle + upper middle) of
        ``col`` — 2x the median, always an exact integer."""
        w = Window.orderBy(F.col(col).asc(), F.col("day").asc())
        ranked = frame.select(
            F.col(col), F.row_number().over(w).alias("_r")
        ).crossJoin(
            F.broadcast(frame.agg(F.count(F.lit(1)).alias("_cnt")))
        )
        return ranked.filter(
            (F.col("_r") * 2 == F.col("_cnt"))
            | (F.col("_r") * 2 == F.col("_cnt") + 1)
            | (F.col("_r") * 2 == F.col("_cnt") + 2)
        ).agg(
            F.when(
                F.max("_cnt") % 2 == 1, F.max(F.col(col)) * 2
            )
            .otherwise(F.sum(F.col(col)))
            .alias("med2")
        )

    m1 = _med2(daily, "n_events").withColumnRenamed("med2", "_med2n")
    devs = daily.crossJoin(F.broadcast(m1)).select(
        "day",
        "n_events",
        F.abs(F.lit(2) * F.col("n_events") - F.col("_med2n")).alias(
            "dev2"
        ),
    )
    m2 = _med2(devs, "dev2").withColumnRenamed("med2", "_med2d")
    return (
        devs.crossJoin(F.broadcast(m2))
        .select(
            "day",
            F.col("n_events").cast("long").alias("n_events"),
            F.col("dev2").cast("long").alias("dev2"),
            F.when(
                F.lit(2) * F.col("dev2") > F.lit(k) * F.col("_med2d"),
                F.lit(1),
            )
            .otherwise(F.lit(0))
            .cast("int")
            .alias("is_anomaly"),
        )
        .orderBy("day")
    )


def weekday_uniformity(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Day-of-week load profile with the chi-square uniformity
    statistic — the capacity-planning audit (is traffic flat across
    weekdays, or does the pipeline need weekday-aware partitioning
    and autoscaling?) and a drift input like q139/q148 but over the
    CALENDAR margin.

    chi2 against the uniform null folds to exact integers:

        chi2 = sum((o_d - N/7)^2 / (N/7)) = sum((7*o_d - N)^2) / (7N)

    so the only float is the final single division. All 7 weekday
    bins are present even at count 0 (a missing bin must contribute
    its full deviation). Weekday is ISO Monday=0 on both engines
    (Spark weekday(); DuckDB isodow - 1).

    Output: 7 rows (weekday, n_events, dev_sq, chi2) — chi2 repeated
    per row (the q192 broadcast-total pattern).

    Scale shape: one weekday-keyed map-side-combined groupBy is the
    only corpus-sized work; the grid is 7 literal rows; the
    statistic folds as a broadcast 1-row aggregate."""
    counts = df.groupBy(
        F.weekday(F.to_date(F.col(ts_col))).alias("weekday")
    ).agg(F.count(F.lit(1)).alias("_o"))
    grid = (
        df.sparkSession.range(7)
        .select(F.col("id").cast("int").alias("weekday"))
        .join(counts, "weekday", "left")
        .select(
            "weekday",
            F.coalesce(F.col("_o"), F.lit(0)).alias("n_events"),
        )
    )
    tot = grid.agg(F.sum("n_events").alias("_n"))
    withdev = grid.crossJoin(F.broadcast(tot)).select(
        "weekday",
        F.col("n_events").cast("long").alias("n_events"),
        (
            (F.lit(7) * F.col("n_events") - F.col("_n"))
            * (F.lit(7) * F.col("n_events") - F.col("_n"))
        )
        .cast("long")
        .alias("dev_sq"),
        F.col("_n"),
    )
    m = withdev.agg(
        F.sum("dev_sq").alias("_s"), F.max("_n").alias("_nn")
    )
    return (
        withdev.select("weekday", "n_events", "dev_sq")
        .crossJoin(F.broadcast(m))
        .select(
            "weekday",
            "n_events",
            "dev_sq",
            F.round(
                F.col("_s").cast("double")
                / (F.lit(7) * F.col("_nn")).cast("double"),
                6,
            ).alias("chi2"),
        )
        .orderBy("weekday")
    )


def seasonal_naive_backtest(
    df: DataFrame, ts_col: str = "ts", period: int = 7
) -> DataFrame:
    """Backtest of the SEASONAL-NAIVE forecast (predict day d with
    day d-period) on the daily event-count series — the baseline
    every forecasting effort must beat (Hyndman's forecasting
    folklore: if your model can't beat seasonal naive, ship seasonal
    naive), and the capacity-planning sanity number next to the
    weekday profile (q210).

    Output: ONE row (n_days, total_abs_err, total_err, mae, bias,
    rmse) over every day with a d-period predecessor in the
    densified calendar (zero-event days forecast and score like any
    other).

    Float policy: errors and their sums are exact integers (counts);
    mae and bias are single divisions; rmse is one division + one
    correctly-rounded sqrt; ROUND(.,6).

    Scale shape: one day-keyed groupBy is the only corpus-sized
    work; the lag and the fold run over the #days-bounded dense
    curve."""
    observed = df.groupBy(F.to_date(F.col(ts_col)).alias("day")).agg(
        F.count(F.lit(1)).alias("_obs")
    )
    span = observed.agg(
        F.min("day").alias("_lo"), F.max("day").alias("_hi")
    )
    daily = (
        span.select(
            F.explode(F.sequence(F.col("_lo"), F.col("_hi"))).alias("day")
        )
        .join(observed, "day", "left")
        .select(
            "day", F.coalesce(F.col("_obs"), F.lit(0)).alias("n_events")
        )
    )
    w = Window.orderBy("day")
    scored = daily.select(
        "n_events",
        F.lag("n_events", period).over(w).alias("_pred"),
    ).filter(F.col("_pred").isNotNull())
    err = F.col("n_events") - F.col("_pred")
    m = scored.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum(F.abs(err)).alias("total_abs_err"),
        F.sum(err).alias("total_err"),
        F.sum(err * err).alias("_sq"),
    )
    nd = F.col("n_days").cast("double")
    return m.select(
        F.col("n_days").cast("long").alias("n_days"),
        F.col("total_abs_err").cast("long").alias("total_abs_err"),
        F.col("total_err").cast("long").alias("total_err"),
        F.round(F.col("total_abs_err").cast("double") / nd, 6).alias(
            "mae"
        ),
        F.round(F.col("total_err").cast("double") / nd, 6).alias("bias"),
        F.round(F.sqrt(F.col("_sq").cast("double") / nd), 6).alias(
            "rmse"
        ),
    )


def seasonal_decompose(
    df: DataFrame, ts_col: str = "ts", half_window: int = 3
) -> DataFrame:
    """Additive seasonal decomposition of the daily event-count curve
    (the classical-decomposition half of STL, without the iterative
    loess passes): per densified calendar day, ``trend`` = centered
    moving average over the +-``half_window``-day window (narrower at
    the series edges), ``seasonal`` = the weekday mean of the
    detrended values, ``residual`` = the rest. The diagnostic that
    separates "weekday shape" from "level shift" before anomaly
    gates like q209's MAD days fire.

    Exactness: counts are integers; every window width w in
    [half_window+1, 2*half_window+1] divides L = lcm(...), so the
    per-day scaled detrended value L*n - (L/w)*S is an INTEGER and
    the weekday sums stay exact; trend, seasonal and residual are
    single double trees ROUND(.,6)ed (the q161 float policy). The
    seasonal means are NOT re-centered to sum zero — the residual
    absorbs the constant (documented classical-decomposition
    variant).

    Scale shape: one day-keyed map-side-combined groupBy is the only
    corpus-sized work (the q211 posture); the dense-calendar
    windows, the 7-row weekday aggregate and the join-back all run
    over #days-bounded frames."""
    import math

    if half_window < 1:
        raise ValueError(
            f"seasonal_decompose: need half_window >= 1, got {half_window}"
        )
    lcm = math.lcm(*range(half_window + 1, 2 * half_window + 2))
    observed = df.groupBy(F.to_date(F.col(ts_col)).alias("day")).agg(
        F.count(F.lit(1)).alias("_obs")
    )
    span = observed.agg(F.min("day").alias("_lo"), F.max("day").alias("_hi"))
    daily = (
        span.select(
            F.explode(F.sequence(F.col("_lo"), F.col("_hi"))).alias("day")
        )
        .join(observed, "day", "left")
        .select("day", F.coalesce(F.col("_obs"), F.lit(0)).alias("n_events"))
    )
    wwin = Window.orderBy("day").rowsBetween(-half_window, half_window)
    win = daily.select(
        "day",
        "n_events",
        F.sum("n_events").over(wwin).alias("_s"),
        F.count(F.lit(1)).over(wwin).alias("_w"),
        F.weekday(F.col("day")).cast("long").alias("_dow"),
    )
    seas = win.groupBy("_dow").agg(
        F.sum(
            F.lit(lcm) * F.col("n_events")
            - (F.lit(lcm) / F.col("_w")).cast("long") * F.col("_s")
        ).alias("_sc"),
        F.count(F.lit(1)).alias("_cd"),
    )
    nd = F.col("n_events").cast("double")
    sd = F.col("_s").cast("double")
    scd = F.col("_sc").cast("double")
    trend = sd / F.col("_w")
    seasonal = scd / (F.lit(float(lcm)) * F.col("_cd"))
    return (
        win.join(seas, "_dow")
        .select(
            "day",
            F.col("n_events").cast("bigint").alias("n_events"),
            F.round(trend, 6).alias("trend"),
            F.round(seasonal, 6).alias("seasonal"),
            F.round(nd - trend - seasonal, 6).alias("residual"),
        )
        .orderBy("day")
    )
