"""Sampling-operator invariants: stability, disjointness, caps."""

from __future__ import annotations

from pyspark.sql import functions as F

from product_etl_spark.operators.sampling import (
    deterministic_sample,
    mix_sources,
    stratified_cap,
    train_test_split,
)


def _df(spark, n=2000):
    return spark.range(n).select(
        F.col("id").alias("key"),
        (F.col("id") % 4).cast("string").alias("cls"),
    )


def test_sample_stable_and_repartition_invariant(spark):
    df = _df(spark)
    s1 = {r["key"] for r in deterministic_sample(df, "key", 0.2).collect()}
    s2 = {r["key"] for r in deterministic_sample(df.repartition(13), "key", 0.2).collect()}
    assert s1 == s2  # same rows regardless of layout
    assert 0.15 < len(s1) / 2000 < 0.25  # ~fraction


def test_sample_nested_fractions(spark):
    # a 10% sample is a subset of the 20% sample (threshold semantics)
    df = _df(spark)
    s10 = {r["key"] for r in deterministic_sample(df, "key", 0.1).collect()}
    s20 = {r["key"] for r in deterministic_sample(df, "key", 0.2).collect()}
    assert s10 <= s20


def test_split_disjoint_exhaustive(spark):
    df = _df(spark)
    train, test = train_test_split(df, "key", 0.25)
    n_train, n_test = train.count(), test.count()
    assert n_train + n_test == 2000
    assert train.join(test, "key", "left_semi").count() == 0
    assert 0.2 < n_test / 2000 < 0.3


def test_stratified_cap(spark):
    capped = stratified_cap(_df(spark), ["cls"], 50, "key")
    per = {r["cls"]: r["n"] for r in capped.groupBy("cls").agg(F.count("*").alias("n")).collect()}
    assert all(v == 50 for v in per.values())
    # deterministic picks: lowest keys per class
    first = capped.filter(F.col("cls") == "0").agg(F.min("key"), F.max("key")).collect()[0]
    assert first[0] == 0 and first[1] == 196  # keys 0,4,...,196


def test_mix_sources(spark):
    df = _df(spark).withColumn("source", F.concat(F.lit("s"), F.col("cls")))
    mixed = mix_sources(df, "source", "key", {"s0": 1.0, "s1": 0.5})
    per = {r["source"]: r["n"] for r in mixed.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert per["s0"] == 500  # all of s0
    assert 200 < per["s1"] < 300  # ~half of s1
    assert "s2" not in per and "s3" not in per  # unlisted dropped


def test_temperature_weights_mixing(spark):
    from product_etl_spark.operators.sampling import (
        mix_sources,
        temperature_weights,
    )

    rows = [(i, "big" if i < 900 else "rare") for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")

    # alpha=1: natural distribution — every source keeps the target fraction
    w1 = temperature_weights(df, "source", alpha=1.0, target_fraction=0.4)
    assert abs(w1["big"] - 0.4) < 1e-9 and abs(w1["rare"] - 0.4) < 1e-9

    # alpha<1 up-weights the rare source, down-weights the dominant one
    w = temperature_weights(df, "source", alpha=0.3, target_fraction=0.4)
    assert w["rare"] > w1["rare"] and w["big"] < 0.4
    assert 0.0 < w["big"] <= 1.0 and 0.0 < w["rare"] <= 1.0

    mixed = mix_sources(df, "source", "doc_id", w)
    got = {
        r["source"]: r["n"]
        for r in mixed.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    # realized fractions track the derived weights (hash-bucket variance)
    assert abs(got["big"] / 900 - w["big"]) < 0.05
    assert abs(got["rare"] / 100 - w["rare"]) < 0.1
    # deterministic: rerun identical
    again = mix_sources(df, "source", "doc_id", w)
    assert {r["doc_id"] for r in again.collect()} == {
        r["doc_id"] for r in mixed.collect()
    }


def test_weighted_sample_overflow_guard_and_gcd_headroom(spark):
    from pyspark.sql import functions as F
    from product_etl_spark.operators.sampling import weighted_sample

    df = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") % 97 + 1).alias("w")
    )
    # den*sum_w pushed past the decimal(38,0) envelope and NOT
    # reducible by gcd: must raise loudly, never drop rows silently
    import pytest

    huge = df.withColumn("w", F.col("w") * (10**15 // 97 * 97 + 7))
    with pytest.raises(ValueError, match="DECIMAL"):
        weighted_sample(huge, "k", "w", 1, 10**7)
    # power-of-two den reduces against 2^60: same request succeeds
    kept = weighted_sample(df, "k", "w", 1, 2**6)
    assert 0 < kept.count() < 1000


def test_shuffle_deterministic_total_order_invariants(spark):
    from pyspark.sql import functions as F

    from product_etl_spark.operators.sampling import shuffle_deterministic

    df = spark.range(0, 2000).withColumn("key", F.col("id").cast("string"))
    a = [r["id"] for r in shuffle_deterministic(df, "key", seed=1,
                                                num_partitions=4).collect()]
    # same total order regardless of the input layout (file boundaries
    # may differ; the read-back order may not)
    b = [r["id"] for r in shuffle_deterministic(df.repartition(7), "key",
                                                seed=1,
                                                num_partitions=4).collect()]
    assert a == b
    assert sorted(a) == list(range(2000))  # a permutation, nothing lost
    assert a != list(range(2000))          # actually shuffled
    # another seed (epoch) gives a different order
    c = [r["id"] for r in shuffle_deterministic(df, "key", seed=2,
                                                num_partitions=4).collect()]
    assert a != c


def test_shuffle_deterministic_no_single_task_sort(spark):
    from pyspark.sql import functions as F

    from product_etl_spark.operators.sampling import shuffle_deterministic

    df = spark.range(0, 2000).withColumn("key", F.col("id").cast("string"))
    out = shuffle_deterministic(df, "key", seed=1, num_partitions=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # range Exchange + within-partition sort; no global sort (a global
    # Sort prints as "], true, 0", partition-local as "], false, 0")
    assert "rangepartitioning" in plan
    assert "], false, 0" in plan
    assert "], true, 0" not in plan


def test_leakage_safe_split_drops_train_near_dups_of_test(spark):
    from pyspark.sql import functions as F

    from product_etl_spark.operators.sampling import (
        leakage_safe_split,
        train_test_split,
    )

    base = ("the quick brown fox jumps over the lazy dog while the "
            "committee reviews the annual water report in detail")
    # 200 distinct docs + for each test doc (hash-determined) a planted
    # near-copy under a different id
    docs = spark.createDataFrame(
        [(i, f"{base} variant {i} " + " ".join(f"w{i}x{j}" for j in range(10)))
         for i in range(200)],
        ["doc_id", "text"],
    )
    train0, test0 = train_test_split(docs, "doc_id", 0.2)
    test_rows = test0.collect()
    assert test_rows
    clones = spark.createDataFrame(
        [(10_000 + r["doc_id"], r["text"] + " tail") for r in test_rows],
        ["doc_id", "text"],
    )
    corpus = docs.unionByName(clones)

    train, test = leakage_safe_split(corpus, "text", "doc_id",
                                     test_fraction=0.2,
                                     jaccard_threshold=0.5)
    test_ids = {r["doc_id"] for r in test.select("doc_id").collect()}
    train_ids = {r["doc_id"] for r in train.select("doc_id").collect()}
    # test membership is still the pure hash split
    base_test_ids = {r["doc_id"] for r in test_rows}
    assert base_test_ids <= test_ids
    # every clone of a test doc that landed in train was dropped
    leaked_clones = {10_000 + i for i in base_test_ids} & train_ids
    assert leaked_clones == set()
    # non-leaking train docs survive
    assert len(train_ids) > 0
    assert train_ids.isdisjoint(test_ids)


def test_split_exhaustive_with_null_keys(spark):
    """NULL keys must land in exactly one split (train), not vanish
    from both — the _bucket sentinel keeps membership exhaustive."""
    from product_etl_spark.operators.sampling import train_test_split

    df = spark.createDataFrame(
        [(1, "a"), (None, "b"), (None, "c"), (4, "d")], "k long, v string"
    )
    train, test = train_test_split(df, "k", 0.5)
    assert train.count() + test.count() == 4


def test_seed_decorrelates_composed_samplers(spark):
    """Two seed-0 threshold samplers on one key NEST (the composition
    trap); distinct seeds give ~independent selections."""
    from product_etl_spark.operators.sampling import (
        deterministic_sample,
        train_test_split,
    )

    df = spark.range(10_000).withColumnRenamed("id", "k")
    train, _ = train_test_split(df, "k", 0.5)  # keeps bucket >= 5000
    # seed 0: nested -> train's sample is empty at fraction <= 0.5
    nested = deterministic_sample(train, "k", 0.5)
    assert nested.count() == 0
    # distinct seed: ~half of train kept
    indep = deterministic_sample(train, "k", 0.5, seed=7)
    assert abs(indep.count() / train.count() - 0.5) < 0.05


def test_temperature_weights_zero_and_null_sources(spark):
    from product_etl_spark.operators.sampling import temperature_weights

    df = spark.createDataFrame(
        [("web", 10), ("web", 20), ("empty", 0), ("nullw", None)],
        "src string, n_tokens long",
    )
    w = temperature_weights(df, "src", alpha=0.5, weight_col="n_tokens")
    assert w["empty"] == 0.0 and w["nullw"] == 0.0 and w["web"] > 0


def test_mix_sources_none_key_addresses_null_group(spark):
    from product_etl_spark.operators.sampling import mix_sources

    df = spark.createDataFrame(
        [(None, i) for i in range(100)] + [("web", i) for i in range(100, 200)],
        "src string, k long",
    )
    out = mix_sources(df, "src", "k", {None: 1.0, "web": 1.0})
    assert out.count() == 200  # NULL-source rows addressable via None


def test_bucketed_cumsum_null_order_rows_survive(spark):
    from pyspark.sql import functions as F

    from product_etl_spark.operators.packing import bucketed_cumsum

    df = spark.createDataFrame(
        [(None, 5), (1, 10), (2, 20)], "ord long, v long"
    )
    out = bucketed_cumsum(df, "ord", "v")
    rows = {r["ord"]: r["cum_before"] for r in out.collect()}
    # NULL bucket sorts first: its rows precede ord=1
    assert set(rows) == {None, 1, 2}
    assert rows[1] == 5 and rows[2] == 15 and rows[None] == 0


def test_balanced_shards_snake_deal_and_balance(spark):
    """Snake order: pass 0 deals 0..n-1 by weight desc, pass 1 deals
    n-1..0 — and on a heavy-tailed fixture the shard totals beat the
    modulo deal's systematic shard-0 overload."""
    import pytest

    from product_etl_spark.operators.sampling import balanced_shards

    rows = [(i, 100 - i) for i in range(12)]  # weights 100..89, ids 0..11
    df = spark.createDataFrame(rows, "doc_id long, w long")
    got = {
        r["doc_id"]: r["shard"]
        for r in balanced_shards(df, "w", "doc_id", 4).collect()
    }
    # weight-desc order IS id order here; snake: 0123 3210 0123
    assert got == {
        0: 0, 1: 1, 2: 2, 3: 3,
        4: 3, 5: 2, 6: 1, 7: 0,
        8: 0, 9: 1, 10: 2, 11: 3,
    }
    # heavy-tailed weights: snake's max/min shard-total spread must
    # not exceed the largest single item (the LPT-ish guarantee);
    # plain modulo would pile every pass's largest onto shard 0
    heavy = [(i, 2 ** (12 - i // 4)) for i in range(24)]
    hdf = spark.createDataFrame(heavy, "doc_id long, w long")
    out = balanced_shards(hdf, "w", "doc_id", 4)
    from pyspark.sql import functions as F

    totals = [
        r["t"]
        for r in out.groupBy("shard").agg(F.sum("w").alias("t")).collect()
    ]
    assert max(totals) - min(totals) <= max(w for _, w in heavy)
    with pytest.raises(ValueError, match="n_shards >= 1"):
        balanced_shards(df, "w", "doc_id", 0)


def test_balanced_shards_deterministic_ties(spark):
    """Equal weights tie-break on doc_id, so the assignment is stable
    across partitionings (the global_sort_ranks total-order rule)."""
    from product_etl_spark.operators.sampling import balanced_shards

    rows = [(i, 7) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    a = {r["doc_id"]: r["shard"] for r in balanced_shards(df, "w", "doc_id", 3).collect()}
    b = {
        r["doc_id"]: r["shard"]
        for r in balanced_shards(
            df.repartition(7), "w", "doc_id", 3
        ).collect()
    }
    assert a == b
    # snake over ids 0..9: 012 210 012, then the PARTIAL pass deals
    # forward (the _snake_slot rule): rank 10 -> slot 0
    assert a == {0: 0, 1: 1, 2: 2, 3: 2, 4: 1, 5: 0, 6: 0, 7: 1, 8: 2, 9: 0}


def test_append_balanced_shards_empty_state_equals_batch(spark):
    """First append (no totals) IS balanced_shards: the lightest-first
    permutation of zero totals is the identity."""
    from product_etl_spark.operators.sampling import (
        append_balanced_shards,
        balanced_shards,
    )

    rows = [(i, (i * 37) % 100 + 1) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    a = {r["doc_id"]: r["shard"]
         for r in balanced_shards(df, "w", "doc_id", 4).collect()}
    b = {r["doc_id"]: r["shard"]
         for r in append_balanced_shards(df, "w", "doc_id", 4).collect()}
    assert a == b


def test_append_balanced_shards_deals_lightest_first(spark):
    """The heaviest document of a new batch must land on the CURRENT
    lightest shard, and K adversarial appends keep the spread within
    2x the largest single weight seen so far (the batch operator's
    tested bound)."""
    from pyspark.sql import functions as F

    from product_etl_spark.operators.sampling import (
        append_balanced_shards,
        shard_weight_totals,
    )

    n = 4
    # skewed initial totals: shard 2 is lightest
    totals = spark.createDataFrame(
        [(0, 50.0), (1, 30.0), (2, 5.0), (3, 40.0)],
        "shard int, total_weight double",
    )
    batch = spark.createDataFrame(
        [(100, 9), (101, 7), (102, 5), (103, 3)], "doc_id long, w long"
    )
    got = {r["doc_id"]: r["shard"]
           for r in append_balanced_shards(
               batch, "w", "doc_id", n, totals).collect()}
    # lightest-first order of totals: 2,1,3,0 — heaviest doc -> shard 2
    assert got == {100: 2, 101: 1, 102: 3, 103: 0}

    # K appends over adversarial shapes: spread bound holds per append
    shapes = [
        [1000] + [1] * 15,
        [2 ** (i % 9) for i in range(32)],
        [7] * 12,
        [5, 5, 1000, 1000, 1, 1],
    ]
    state = None
    max_w, next_id = 0, 0
    for shape in shapes:
        max_w = max(max_w, max(shape))
        bdf = spark.createDataFrame(
            [(next_id + i, w) for i, w in enumerate(shape)],
            "doc_id long, w long",
        )
        next_id += len(shape)
        assigned = append_balanced_shards(bdf, "w", "doc_id", n, state)
        part = shard_weight_totals(assigned, "w")
        state = (
            part if state is None
            else state.unionByName(part)
            .groupBy("shard")
            .agg(F.sum("total_weight").alias("total_weight"))
        ).localCheckpoint(eager=True)
        totals_now = {r["shard"]: r["total_weight"] for r in state.collect()}
        vals = [totals_now.get(s, 0.0) for s in range(n)]
        assert max(vals) - min(vals) <= 2 * max_w, (shape, vals)


def test_append_balanced_shards_guards(spark):
    import pytest

    from product_etl_spark.operators.sampling import append_balanced_shards

    df = spark.createDataFrame([(1, 2)], "doc_id long, w long")
    with pytest.raises(ValueError, match="n_shards >= 1"):
        append_balanced_shards(df, "w", "doc_id", 0)
    bad = spark.createDataFrame(
        [(9, 1.0)], "shard int, total_weight double"
    )
    with pytest.raises(ValueError, match="outside"):
        append_balanced_shards(df, "w", "doc_id", 4, bad)


def test_curriculum_interleave_matches_pandas(spark):
    """Per-source easy-first ranks x round-robin source cycling,
    pinned against a pandas replay on data that SPANS range
    partitions; the key is strictly increasing along the intended
    order and sorting by it cycles sources until one exhausts."""
    import hashlib

    import pandas as pd

    from product_etl_spark.operators.sampling import curriculum_interleave

    rows = []
    for i in range(600):
        src = ["web", "code", "books"][i % 3] if i % 7 else "tiny"
        d = int(hashlib.md5(str(i).encode()).hexdigest()[:6], 16) % 251
        rows.append((i, src, d))
    df = spark.createDataFrame(rows, "doc_id long, src string, diff long")
    got = {
        r["doc_id"]: r["curriculum_key"]
        for r in curriculum_interleave(df, "src", "diff", "doc_id").collect()
    }
    pdf = pd.DataFrame(rows, columns=["doc_id", "src", "diff"])
    sidx = {s: i for i, s in enumerate(sorted(pdf["src"].unique()))}
    ns = len(sidx)
    pdf = pdf.sort_values(["src", "diff", "doc_id"])
    pdf["srank"] = pdf.groupby("src").cumcount()
    want = {
        int(r.doc_id): int(r.srank) * ns + sidx[r.src]
        for r in pdf.itertuples()
    }
    assert got == want
    # keys are unique (a total order) and round-robin at the head
    assert len(set(got.values())) == len(got)
    head = sorted(got.items(), key=lambda kv: kv[1])[:ns]
    assert {pdf.set_index("doc_id").loc[d, "src"] for d, _ in head} == set(sidx)


def test_curriculum_interleave_no_per_source_data_window(spark):
    """The per-source rank must come from the segmented two-level
    scan: every window in the executed plan carries _pid."""
    import re

    from product_etl_spark.operators.sampling import curriculum_interleave

    df = spark.createDataFrame(
        [(i, "s" + str(i % 2), i % 13) for i in range(80)],
        "doc_id long, src string, diff long",
    )
    plan = (
        curriculum_interleave(df, "src", "diff", "doc_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    specs = re.findall(r"windowspecdefinition\([^)]*\)", plan)
    bad = [s for s in specs if "_pid" not in s]
    assert not bad, f"window without _pid: {bad}"


def test_token_budget_select_greedy_prefix(spark):
    """Inclusive-cum membership pinned by hand: the boundary doc that
    would overflow is dropped; budget 0 keeps nothing; the cum_weight
    column is the running total in selection order."""
    import pytest

    from product_etl_spark.operators.sampling import token_budget_select

    rows = [(1, 40, 9), (2, 30, 9), (3, 25, 7), (4, 20, 5), (5, 10, 1)]
    # order: quality desc -> _negq asc; ids 1,2 (q=9) then 3,4,5
    df = spark.createDataFrame(rows, "doc_id long, w long, q long")
    base = df.withColumn("_negq", -F.col("q"))
    got = {
        r["doc_id"]: r["cum_weight"]
        for r in token_budget_select(
            base, "w", ["_negq", "doc_id"], budget=100
        ).collect()
    }
    # cums: 40, 70, 95, 115(drop), 125(drop)
    assert got == {1: 40, 2: 70, 3: 95}
    assert token_budget_select(base, "w", ["_negq", "doc_id"], 0).count() == 0
    with pytest.raises(ValueError, match="budget"):
        token_budget_select(base, "w", ["_negq", "doc_id"], -1)


def test_token_budget_select_spans_partitions(spark):
    """Membership == pandas greedy prefix on 500 rows spanning range
    partitions (the cross-partition carry fixture class)."""
    import hashlib

    import pandas as pd

    from product_etl_spark.operators.sampling import token_budget_select

    rows = [
        (i, int(hashlib.md5(str(i).encode()).hexdigest()[:4], 16) % 50 + 1)
        for i in range(500)
    ]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    budget = 3000
    got = {r["doc_id"] for r in token_budget_select(
        df, "w", ["doc_id"], budget).collect()}
    pdf = pd.DataFrame(rows, columns=["doc_id", "w"]).sort_values("doc_id")
    pdf["cum"] = pdf["w"].cumsum()
    want = set(pdf[pdf["cum"] <= budget]["doc_id"])
    assert got == want and len(got) > 0


def test_stratified_quota_backfill_hand_pinned(spark):
    """Unused quota flows to over-full groups: floor share + remainder
    one-each in group-key order; under-full groups keep everything;
    kept total = min(n_rows, cap * n_groups)."""
    import pytest

    from product_etl_spark.operators.sampling import (
        stratified_quota_backfill,
    )

    rows = (
        [(i, "A") for i in range(10)]
        + [(100 + i, "B") for i in range(8)]
        + [(200, "C")]
    )
    df = spark.createDataFrame(rows, "doc_id long, g string")
    out = stratified_quota_backfill(df, "g", ["doc_id"], cap=4)
    kept = {}
    for r in out.collect():
        kept.setdefault(r["g"], set()).add(r["doc_id"])
    # unused = (4-1) from C = 3; over = {A, B}; extra = 1 each,
    # remainder 1 -> A (first in key order) gets +1
    assert len(kept["A"]) == 6 and kept["A"] == set(range(6))
    assert len(kept["B"]) == 5 and kept["B"] == {100, 101, 102, 103, 104}
    assert kept["C"] == {200}
    assert out.count() == min(len(rows), 4 * 3) == 12
    # no over-full group: plain cap, nothing redistributed, no 0/0
    small = spark.createDataFrame(
        [(1, "A"), (2, "B")], "doc_id long, g string"
    )
    assert stratified_quota_backfill(small, "g", ["doc_id"], 5).count() == 2
    with pytest.raises(ValueError, match="cap"):
        stratified_quota_backfill(small, "g", ["doc_id"], -1)


def test_stratified_quota_backfill_spans_partitions(spark):
    """Membership == a pandas replay on groups that SPAN range
    partitions (the segmented-scan carry fixture class)."""
    import hashlib

    import pandas as pd

    from product_etl_spark.operators.sampling import (
        stratified_quota_backfill,
    )

    rows = []
    for i in range(700):
        g = "G" + str(i % 4 if i % 11 else 9)  # G9 tiny, G0-G3 big
        k = int(hashlib.md5(str(i).encode()).hexdigest()[:6], 16) % 1000
        rows.append((i, g, k))
    df = spark.createDataFrame(rows, "doc_id long, g string, k long")
    cap = 150
    got = {r["doc_id"] for r in stratified_quota_backfill(
        df, "g", ["k", "doc_id"], cap).collect()}
    pdf = pd.DataFrame(rows, columns=["doc_id", "g", "k"])
    counts = pdf.groupby("g").size()
    unused = int(sum(max(0, cap - n) for n in counts))
    over = sorted(g for g, n in counts.items() if n > cap)
    extra = unused // len(over)
    rem = unused % len(over)
    want = set()
    for g, sub in pdf.groupby("g"):
        allowed = cap if g not in over else (
            cap + extra + (1 if over.index(g) + 1 <= rem else 0)
        )
        sub = sub.sort_values(["k", "doc_id"]).head(allowed)
        want |= set(sub["doc_id"])
    assert got == want and len(got) > 0


def test_append_balanced_shards_odd_tail_no_drift(spark):
    """Regression (r14 review finding 1): repeated appends of
    odd-tail batches must NOT drift. With a reversed partial pass,
    n_shards=2 and batches of 3 equal-weight docs, the heavier shard
    gained 2W per batch vs the lighter's W — spread kW after k
    batches. The forward-partial rule keeps it within one W."""
    from pyspark.sql import functions as F

    from product_etl_spark.operators.sampling import (
        append_balanced_shards,
        shard_weight_totals,
    )

    state = None
    for k in range(6):
        batch = spark.createDataFrame(
            [(k * 10 + i, 7) for i in range(3)], "doc_id long, w long"
        )
        assigned = append_balanced_shards(batch, "w", "doc_id", 2, state)
        part = shard_weight_totals(assigned, "w")
        state = (
            part if state is None
            else state.unionByName(part)
            .groupBy("shard")
            .agg(F.sum("total_weight").alias("total_weight"))
        ).localCheckpoint(eager=True)
        totals = {r["shard"]: r["total_weight"] for r in state.collect()}
        vals = [totals.get(s, 0.0) for s in range(2)]
        assert max(vals) - min(vals) <= 7.0, (k, vals)


def test_token_budget_select_fractional_weights(spark):
    """Regression (r14 review finding 3): fractional weights must
    accumulate exactly — a bigint cum would truncate 0.6/1.2/1.8 to
    0/1/1 and keep 1.8 weight against a budget of 1."""
    from decimal import Decimal

    from product_etl_spark.operators.sampling import token_budget_select

    df = spark.createDataFrame(
        [(1, 0.6), (2, 0.6), (3, 0.6)], "doc_id long, w double"
    )
    got = {r["doc_id"]: r["cum_weight"] for r in token_budget_select(
        df, "w", ["doc_id"], budget=1).collect()}
    assert got == {1: Decimal("0.600000")}


def test_null_group_keys_dropped_explicitly(spark):
    """Regression (r14 ADVICE): curriculum_interleave and
    stratified_quota_backfill DROP NULL-keyed rows up front — and the
    NULL presence no longer perturbs the survivors (before the fix a
    NULL source inflated n_sources, shifting every curriculum_key;
    a NULL group entered the quota pool arithmetic)."""
    from product_etl_spark.operators.sampling import (
        curriculum_interleave,
        stratified_quota_backfill,
    )

    rows = [(i, ["a", "b", None][i % 3], i % 7) for i in range(90)]
    df = spark.createDataFrame(rows, "doc_id long, grp string, diff long")
    clean = df.filter(F.col("grp").isNotNull())

    ci = curriculum_interleave(df, "grp", "diff", "doc_id")
    assert ci.filter(F.col("grp").isNull()).count() == 0
    got = {r["doc_id"]: r["curriculum_key"] for r in ci.collect()}
    want = {
        r["doc_id"]: r["curriculum_key"]
        for r in curriculum_interleave(clean, "grp", "diff", "doc_id").collect()
    }
    assert got == want  # NULL rows dropped, survivors byte-identical

    qb = stratified_quota_backfill(df, "grp", ["diff", "doc_id"], 5)
    assert qb.filter(F.col("grp").isNull()).count() == 0
    # kept total reads over non-NULL rows/groups: min(60, 5*2) = 10
    assert qb.count() == 10
    got_q = {r["doc_id"] for r in qb.collect()}
    want_q = {
        r["doc_id"]
        for r in stratified_quota_backfill(
            clean, "grp", ["diff", "doc_id"], 5
        ).collect()
    }
    assert got_q == want_q


def test_append_token_budget_select_folds_to_one_shot(spark):
    """Incremental budget selection (r14 verdict item 6): folding
    order-aligned batches through append_token_budget_select equals
    token_budget_select on the union EXACTLY — membership AND the
    global cum_weight surface, fractional weights included — with
    the budget boundary landing mid-fold; out-of-order batches
    raise; the empty batch is the fold identity."""
    import decimal

    import pytest

    from product_etl_spark.operators.sampling import (
        append_token_budget_select,
        token_budget_select,
    )

    rows = [
        (i, float(i % 7) + 0.5, i)  # (doc_id, weight, score)
        for i in range(30)
    ]
    schema = "doc_id long, w double, score long"
    full = spark.createDataFrame(rows, schema)
    budget = 55  # cuts inside the second batch (sum of all = 100.0)
    one = {
        (r["doc_id"], r["cum_weight"])
        for r in token_budget_select(
            full, "w", ["score", "doc_id"], budget
        ).collect()
    }

    state, got = None, set()
    for lo, hi in ((0, 10), (10, 20), (20, 30)):
        batch = spark.createDataFrame(rows[lo:hi], schema)
        sel, state = append_token_budget_select(
            batch, "w", ["score", "doc_id"], budget, state
        )
        got |= {(r["doc_id"], r["cum_weight"]) for r in sel.collect()}
    assert got == one
    assert state[0] == decimal.Decimal("100.0")  # ALL weight counted
    assert tuple(state[1]) == (29, 29)

    # empty batch: identity
    empty = spark.createDataFrame([], schema)
    sel, state2 = append_token_budget_select(
        empty, "w", ["score", "doc_id"], budget, state
    )
    assert sel.count() == 0 and state2 == state

    # out-of-order batch (key at/below the high-water mark) raises
    with pytest.raises(ValueError, match="order-aligned"):
        append_token_budget_select(
            spark.createDataFrame([(99, 1.0, 5)], schema),
            "w",
            ["score", "doc_id"],
            budget,
            state,
        )

    # None state == one-shot on the batch
    sel0, _ = append_token_budget_select(
        full, "w", ["score", "doc_id"], budget, None
    )
    assert {
        (r["doc_id"], r["cum_weight"]) for r in sel0.collect()
    } == one
