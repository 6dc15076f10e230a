"""applyInPandasWithState: running totals persist across drains."""

from __future__ import annotations

import datetime as dt
import pytest

from product_etl_spark.streaming.pipeline import (
    stream_user_running_totals,
)

SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double"
BASE = dt.datetime(2024, 1, 1, 10, 0, 0)


def _write(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).write.mode("append").parquet(path)


def _drain(spark, src, out, ckpt):
    stream = spark.readStream.schema(SCHEMA).parquet(src)

    def sink(batch_df, batch_id):
        # update-mode output -> parquet via foreachBatch (file sinks
        # are append-only)
        batch_df.write.mode("append").parquet(out)

    q = (
        stream_user_running_totals(stream)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_state_survives_across_batches(spark, tmp_path):
    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
    _write(spark, src, [
        (1, BASE, 1, "click", 10.0),
        (2, BASE, 1, "view", 5.0),
        (3, BASE, 2, "click", 1.0),
    ])
    _drain(spark, src, out, ckpt)
    rows = {r["user_id"]: r for r in spark.read.parquet(out).collect()}
    assert rows[1]["n_events"] == 2 and rows[1]["total_value"] == 15.0
    assert rows[2]["n_events"] == 1

    # second batch: totals continue from persisted state
    _write(spark, src, [(4, BASE + dt.timedelta(minutes=1), 1, "click", 2.5)])
    _drain(spark, src, out, ckpt)
    latest = [
        r
        for r in spark.read.parquet(out).collect()
        if r["user_id"] == 1 and r["n_events"] == 3
    ]
    assert latest and latest[0]["total_value"] == 17.5


def test_stream_dedup_within_watermark(spark, tmp_path):
    from product_etl_spark.streaming.pipeline import (
        run_available_now,
        stream_dedup_events,
    )

    src, out, ckpt = (str(tmp_path / d) for d in ("dsrc", "dout", "dckpt"))
    _write(spark, src, [
        (1, BASE, 1, "click", 1.0),
        (1, BASE, 1, "click", 1.0),  # duplicate delivery
        (2, BASE, 2, "view", 2.0),
        (1, BASE + dt.timedelta(minutes=5), 1, "click", 1.0),  # dup within horizon
    ])
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    run_available_now(stream_dedup_events(stream), out, ckpt)
    rows = spark.read.parquet(out).collect()
    assert sorted(r["event_id"] for r in rows) == [1, 2]


def test_stream_static_dimension_join(spark, tmp_path):
    from product_etl_spark.streaming.pipeline import (
        run_available_now,
        stream_enrich_with_dimension,
    )

    src, out, ckpt = (str(tmp_path / d) for d in ("jsrc", "jout", "jckpt"))
    _write(spark, src, [(1, BASE, 1, "click", 1.0), (2, BASE, 99, "view", 2.0)])
    dim = spark.createDataFrame([(1, "alice")], "user_id long, user_name string")
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    run_available_now(
        stream_enrich_with_dimension(stream, dim, "user_id"), out, ckpt
    )
    rows = {r["event_id"]: r["user_name"] for r in spark.read.parquet(out).collect()}
    assert rows == {1: "alice", 2: None}


def test_stream_distinct_sketch_rollup_matches_exact(spark, tmp_path):
    import json

    from pyspark.sql import functions as F

    from product_etl_spark.streaming.pipeline import (
        read_distinct_sketch_state,
        stream_distinct_sketch_rollup,
    )

    inp = tmp_path / "in"
    inp.mkdir()
    state = str(tmp_path / "state")
    # two files -> (likely) separate batches; users overlap across
    # files so naive per-batch-count summing would overcount
    with open(inp / "a.jsonl", "w") as f:
        for u in range(0, 400):
            f.write(json.dumps({"event_type": f"t{u % 2}", "user_id": u}) + "\n")
    with open(inp / "b.jsonl", "w") as f:
        for u in range(200, 600):
            f.write(json.dumps({"event_type": f"t{u % 2}", "user_id": u}) + "\n")

    stream = spark.readStream.schema("event_type string, user_id long") \
        .option("maxFilesPerTrigger", 1).json(str(inp))
    stream_distinct_sketch_rollup(stream, state, ["event_type"], "user_id",
                                  str(tmp_path / "ckpt"))
    got = {r["event_type"]: r["n_distinct"] for r in
           read_distinct_sketch_state(spark, state, ["event_type"]).collect()}
    # exact distinct is 300 per type; HLL at lg_k=12 is ~1% error
    assert set(got) == {"t0", "t1"}
    for v in got.values():
        assert abs(v - 300) / 300 < 0.05

    # replaying everything with a fresh checkpoint must NOT overcount:
    # sketch union is idempotent (the additive-sum fold would double)
    stream2 = spark.readStream.schema("event_type string, user_id long") \
        .option("maxFilesPerTrigger", 1).json(str(inp))
    stream_distinct_sketch_rollup(stream2, state, ["event_type"], "user_id",
                                  str(tmp_path / "ckpt2"))
    again = {r["event_type"]: r["n_distinct"] for r in
             read_distinct_sketch_state(spark, state, ["event_type"]).collect()}
    for t in got:
        assert abs(again[t] - got[t]) / got[t] < 0.02


def test_sketch_state_compaction_preserves_estimates(spark, tmp_path):
    import json
    import os

    from product_etl_spark.streaming.pipeline import (
        compact_distinct_sketch_state,
        read_distinct_sketch_state,
        stream_distinct_sketch_rollup,
    )

    inp = tmp_path / "in"
    inp.mkdir()
    state = str(tmp_path / "state")
    for fn, lo, hi in [("a.jsonl", 0, 300), ("b.jsonl", 150, 450)]:
        with open(inp / fn, "w") as f:
            for u in range(lo, hi):
                f.write(json.dumps({"event_type": "t", "user_id": u}) + "\n")
    stream = spark.readStream.schema("event_type string, user_id long") \
        .option("maxFilesPerTrigger", 1).json(str(inp))
    stream_distinct_sketch_rollup(stream, state, ["event_type"], "user_id",
                                  str(tmp_path / "ckpt"))
    before = read_distinct_sketch_state(spark, state, ["event_type"]).collect()

    compact_distinct_sketch_state(spark, state, ["event_type"])
    # batch dirs folded away, single base remains
    assert sorted(d for d in os.listdir(state) if not d.startswith(".")) \
        == ["base"]
    after = read_distinct_sketch_state(spark, state, ["event_type"]).collect()
    assert [tuple(r) for r in after] == [tuple(r) for r in before]

    # a batch replayed AFTER compaction re-merges idempotently: rerun
    # the whole stream against the compacted state
    stream2 = spark.readStream.schema("event_type string, user_id long") \
        .option("maxFilesPerTrigger", 1).json(str(inp))
    stream_distinct_sketch_rollup(stream2, state, ["event_type"], "user_id",
                                  str(tmp_path / "ckpt2"))
    [final] = read_distinct_sketch_state(spark, state, ["event_type"]).collect()
    # set-idempotent: re-merging already-absorbed keys cannot DOUBLE
    # the estimate; re-serializing the union sketch may move it within
    # the HLL error bound (observed ~1%), so assert accuracy vs the
    # exact count, not bit-equality
    assert abs(final["n_distinct"] - 450) / 450 < 0.05


def test_sketch_state_empty_and_remote_guard(spark, tmp_path):
    """ADVICE fixes: reading sketch state before any fold returns an
    empty typed frame (not a confusing zero-path read error), and a
    remote state_dir raises up front (the helpers are driver-local)."""
    import pytest
    from product_etl_spark.streaming.pipeline import (
        read_distinct_sketch_state,
    )

    out = read_distinct_sketch_state(
        spark, str(tmp_path / "never-written"), ["event_type"]
    )
    assert out.columns == ["event_type", "n_distinct"]
    assert out.schema["n_distinct"].dataType.simpleString() == "bigint"
    assert out.count() == 0

    with pytest.raises(ValueError, match="local filesystem"):
        read_distinct_sketch_state(
            spark, "s3://bucket/state", ["event_type"]
        )


def test_stream_cms_rollup_frequencies(spark, tmp_path):
    """Streaming CMS fold: after draining two micro-batches, the
    merged state answers point-frequency probes with the one-sided
    CMS guarantee (>= exact, bounded overshoot); a failed-batch
    replay under the SAME checkpoint (simulated by rewriting the
    same batch dir) leaves the state unchanged."""
    import json

    from product_etl_spark.operators.cms import cms_estimate
    from product_etl_spark.streaming.pipeline import (
        read_cms_state,
        stream_cms_rollup,
    )

    inp = tmp_path / "in_cms"
    inp.mkdir()
    state = str(tmp_path / "cms_state")
    # token frequencies split across two files: "hot" appears 300x
    # total (200 + 100 across batches), "warm" 60x, "cold" 3x
    with open(inp / "a.jsonl", "w") as f:
        for _ in range(200):
            f.write(json.dumps({"tok": "hot"}) + "\n")
        for _ in range(50):
            f.write(json.dumps({"tok": "warm"}) + "\n")
    with open(inp / "b.jsonl", "w") as f:
        for _ in range(100):
            f.write(json.dumps({"tok": "hot"}) + "\n")
        for _ in range(10):
            f.write(json.dumps({"tok": "warm"}) + "\n")
        for _ in range(3):
            f.write(json.dumps({"tok": "cold"}) + "\n")

    stream = spark.readStream.schema("tok string") \
        .option("maxFilesPerTrigger", 1).json(str(inp))
    stream_cms_rollup(stream, state, [], "tok", str(tmp_path / "cms_ckpt"),
                      depth=3, width=512)
    sk = read_cms_state(spark, state, [])
    probes = spark.createDataFrame([("hot",), ("warm",), ("cold",), ("never",)],
                                   "tok string")
    est = {r["tok"]: r["est_count"] for r in
           cms_estimate(sk, probes, "tok", depth=3, width=512).collect()}
    exact = {"hot": 300, "warm": 60, "cold": 3, "never": 0}
    n_total = 363
    for t, e in exact.items():
        assert est[t] >= e
        assert est[t] - e <= 3 * 2.72 * n_total / 512

    # same-checkpoint replay rewrites batch dirs with identical
    # content: overwrite-mode makes the fold idempotent per batch id
    import os
    batch_dirs = sorted(d for d in os.listdir(state) if d.startswith("batch="))
    assert len(batch_dirs) == 2  # maxFilesPerTrigger=1 -> one per file
    stream2 = spark.readStream.schema("tok string") \
        .option("maxFilesPerTrigger", 1).json(str(inp))
    stream_cms_rollup(stream2, state, [], "tok", str(tmp_path / "cms_ckpt3"),
                      depth=3, width=512)
    # NOTE fresh checkpoint here re-batches the same files with the
    # same per-file batching, so the same batch ids are overwritten
    # with the same content — state must be unchanged
    est2 = {r["tok"]: r["est_count"] for r in
            cms_estimate(read_cms_state(spark, state, []), probes, "tok",
                         depth=3, width=512).collect()}
    assert est2 == est


def test_state_readers_empty_fallbacks_and_uri_guard(spark, tmp_path):
    """Before the first fold both state readers return empty frames
    with usable schemas (key_schema pins non-string key types); any
    URI-spelled state_dir — including file:// — raises instead of
    silently reading nothing."""
    import pytest

    from product_etl_spark.streaming.pipeline import (
        read_cms_state,
        read_distinct_sketch_state,
    )

    missing = str(tmp_path / "never_written")
    hll = read_distinct_sketch_state(spark, missing, ["user_id"],
                                     key_schema="user_id long")
    assert hll.count() == 0
    assert dict(hll.dtypes) == {"user_id": "bigint", "n_distinct": "bigint"}

    cms = read_cms_state(spark, missing, [])
    assert cms.count() == 0
    assert [c for c, _ in cms.dtypes] == ["row_idx", "bucket", "n"]

    for bad in ("file:///x/state", "s3a://b/state"):
        with pytest.raises(ValueError, match="PLAIN local"):
            read_distinct_sketch_state(spark, bad, ["k"])
        with pytest.raises(ValueError, match="PLAIN local"):
            read_cms_state(spark, bad, ["k"])


def test_stream_balanced_shard_append_end_to_end(spark, tmp_path):
    """Streaming twin of the incremental shard deal: (id, weight)
    json-lines drops are dealt into the growing shard totals
    lightest-first; the per-batch manifests match a hand-replayed
    append_balanced_shards fold, totals stay within the tested 2x
    max-weight spread, and a same-checkpoint replay (no new files)
    changes nothing."""
    import json as _json
    import os

    from product_etl_spark.operators.sampling import (
        append_balanced_shards,
        shard_weight_totals,
    )
    from product_etl_spark.streaming.pipeline import (
        read_shard_totals,
        stream_balanced_shard_append,
    )

    src, man, state, ck = (
        str(tmp_path / d) for d in ("in", "manifest", "totals", "ck")
    )
    os.makedirs(src)
    n = 4

    def drop(fname, rows):
        with open(f"{src}/{fname}", "w") as f:
            for rid, w in rows:
                f.write(_json.dumps({"doc_id": rid, "n_tokens": w}) + "\n")

    def run():
        q = stream_balanced_shard_append(
            spark, src, man, state, ck, "n_tokens", "doc_id", n
        )
        q.awaitTermination()

    b1 = [(1, 100), (2, 60), (3, 40), (4, 10), (5, 5)]
    b2 = [(11, 90), (12, 8), (13, 3)]
    drop("b1.jsonl", b1)
    run()
    drop("b2.jsonl", b2)
    run()

    got = {
        r["doc_id"]: r["shard"]
        for r in spark.read.option("basePath", man)
        .parquet(f"{man}/batch=*").collect()
    }
    # hand fold: batch 1 from empty state, batch 2 from batch 1 totals
    d1 = append_balanced_shards(
        spark.createDataFrame(b1, "doc_id long, n_tokens long"),
        "n_tokens", "doc_id", n,
    )
    t1 = shard_weight_totals(d1, "n_tokens")
    d2 = append_balanced_shards(
        spark.createDataFrame(b2, "doc_id long, n_tokens long"),
        "n_tokens", "doc_id", n, t1,
    )
    want = {
        r["doc_id"]: r["shard"]
        for r in d1.unionByName(d2).select("doc_id", "shard").collect()
    }
    assert got == want
    totals = {
        r["shard"]: r["total_weight"]
        for r in read_shard_totals(spark, state).collect()
    }
    vals = [totals.get(s, 0.0) for s in range(n)]
    assert max(vals) - min(vals) <= 2 * 100
    assert sum(vals) == sum(w for _, w in b1 + b2)

    # same-checkpoint replay with no new files: nothing changes
    before = sorted(
        (r["doc_id"], r["shard"])
        for r in spark.read.option("basePath", man)
        .parquet(f"{man}/batch=*").collect()
    )
    run()
    after = sorted(
        (r["doc_id"], r["shard"])
        for r in spark.read.option("basePath", man)
        .parquet(f"{man}/batch=*").collect()
    )
    assert before == after
    # read_shard_totals: None on an empty dir, and before_batch=0
    # (nothing strictly lower) is also None
    assert read_shard_totals(spark, str(tmp_path / "nope")) is None
    assert read_shard_totals(spark, state, before_batch=0) is None


def test_read_shard_totals_uri_guard_and_stale_count(spark, tmp_path):
    """Regression (r14 review findings 2/6): URI-spelled state dirs
    raise instead of silently reading an empty state, and state
    written under a different n_shards refuses the deal loudly."""
    import pytest

    from product_etl_spark.operators.sampling import shard_weight_totals
    from product_etl_spark.streaming.pipeline import read_shard_totals

    with pytest.raises(ValueError, match="PLAIN local"):
        read_shard_totals(spark, f"file://{tmp_path}/state")
    state = str(tmp_path / "totals")
    part = spark.createDataFrame(
        [(7, 10.0)], "shard int, total_weight double"
    )
    part.write.parquet(f"{state}/batch=0")
    # shard 7 is fine for an 8-shard deal, stale for a 4-shard one
    assert read_shard_totals(spark, state, n_shards=8).count() == 1
    with pytest.raises(ValueError, match="different n_shards"):
        read_shard_totals(spark, state, n_shards=4)


def test_n_shards_marker_catches_smaller_stale_count(spark, tmp_path):
    """Regression (r14 ADVICE): the id-range check alone passes state
    written under a SMALLER previous count (4 then reconfigured to
    8 — every id in range, shards 4-7 silently 'empty'); the
    persisted _n_shards marker catches it directly, and the writer
    refuses to append under a mismatching count."""
    import pytest

    from product_etl_spark.streaming.pipeline import (
        _write_n_shards_marker,
        read_shard_totals,
    )

    state = str(tmp_path / "totals")
    spark.createDataFrame(
        [(0, 5.0), (3, 7.0)], "shard int, total_weight double"
    ).write.parquet(f"{state}/batch=0")
    _write_n_shards_marker(state, 4)
    # correct count reads fine; ids alone would also pass n_shards=8,
    # but the marker refuses it
    assert read_shard_totals(spark, state, n_shards=4).count() == 2
    with pytest.raises(ValueError, match="written under\\s+n_shards=4"):
        read_shard_totals(spark, state, n_shards=8)
    # writer-side guard: a misconfigured restart fails at batch one
    with pytest.raises(ValueError, match="refusing to append"):
        _write_n_shards_marker(state, 8)
    _write_n_shards_marker(state, 4)  # idempotent under the true count


@pytest.mark.slow
def test_shard_store_erasure_and_compaction_lifecycle(spark, tmp_path):
    """Lifecycle pins for the shard-manifest/state store (r14 verdict
    item 5), mirroring the gram-store pins: (1) erase_from_stores +
    rebuild_shard_totals_state leaves NO trace of the subjects —
    manifests drop their rows and the per-batch partials re-derive
    so future deals stop balancing against erased weight; (2) the
    folded state is EXACTLY the totals derived from the remaining
    manifest rows; (3) post-erasure appends deal against the EXACT
    erased totals and never worsen the spread beyond the
    post-erasure imbalance plus the 2x-max-weight append band (the
    snake's alternation cancels within-pass bias by design, so
    appends do NOT heal a large erasure hole — the documented
    heavy-erasure recipe is a full re-deal, pinned below to restore
    the batch bound); (4) compact_partitions on the manifests is
    row-identical and state-invariant."""
    import hashlib

    from product_etl_spark.operators.erasure import erase_from_stores
    from product_etl_spark.operators.sampling import (
        append_balanced_shards,
        shard_weight_totals,
    )
    from product_etl_spark.operators.table_maintenance import (
        compact_partitions,
    )
    from product_etl_spark.streaming.pipeline import (
        _write_n_shards_marker,
        read_shard_totals,
        rebuild_shard_totals_state,
    )

    n_shards = 4
    man, state = str(tmp_path / "man"), str(tmp_path / "state")

    def batch(bid, n):
        rows = [
            (
                bid * 1000 + i,
                1
                + int(
                    hashlib.md5(f"{bid}-{i}".encode()).hexdigest()[:4], 16
                )
                % 50,
            )
            for i in range(n)
        ]
        return spark.createDataFrame(rows, "doc_id long, w long")

    def deal(bid, df):
        totals = read_shard_totals(spark, state, n_shards=n_shards)
        a = append_balanced_shards(
            df, "w", "doc_id", n_shards, totals
        ).localCheckpoint(eager=True)
        a.write.mode("overwrite").parquet(f"{man}/batch={bid}")
        shard_weight_totals(a, "w").write.mode("overwrite").parquet(
            f"{state}/batch={bid}"
        )
        _write_n_shards_marker(state, n_shards)

    for b in range(3):
        deal(b, batch(b, 80))

    subjects = spark.createDataFrame(
        [(i,) for i in range(0, 3000) if i % 3 == 0], "doc_id long"
    )
    erase_from_stores(
        spark,
        subjects,
        [{"path": man, "id_col": "doc_id", "partition_by": ["batch"]}],
    )
    rebuilt = rebuild_shard_totals_state(spark, man, state, "w")
    assert rebuilt == [0, 1, 2]

    remaining = spark.read.option("basePath", man).parquet(f"{man}/batch=*")
    assert remaining.join(subjects, "doc_id").count() == 0  # no resurface
    got = {
        r["shard"]: r["total_weight"]
        for r in read_shard_totals(spark, state, n_shards=n_shards).collect()
    }
    want = {
        r["shard"]: r["total_weight"]
        for r in shard_weight_totals(remaining, "w").collect()
    }
    assert got == want  # state EXACTLY re-derived

    # post-erasure appends: spread never exceeds the post-erasure
    # imbalance plus the append band
    t0 = sorted(want.values())
    spread_post = t0[-1] - t0[0]
    for b in (3, 4):
        deal(b, batch(b, 300))
    totals = sorted(
        r["total_weight"]
        for r in read_shard_totals(spark, state, n_shards=n_shards).collect()
    )
    spread = totals[-1] - totals[0]
    assert spread <= spread_post + 2 * 50, (spread, spread_post)

    # heavy-erasure recipe: a full re-deal of the REMAINING corpus
    # restores the batch operator's 2x-max-weight bound
    from pyspark.sql import functions as F

    from product_etl_spark.operators.sampling import balanced_shards

    alldocs = spark.read.option("basePath", man).parquet(f"{man}/batch=*")
    redeal = balanced_shards(
        alldocs.select("doc_id", "w"), "w", "doc_id", n_shards
    )
    rt = sorted(
        r["t"]
        for r in redeal.groupBy("shard").agg(F.sum("w").alias("t")).collect()
    )
    assert rt[-1] - rt[0] <= 2 * 50

    # compaction: row-identical manifests, state read unchanged
    pre = sorted(
        map(tuple, spark.read.option("basePath", man)
            .parquet(f"{man}/batch=*").collect())
    )
    compact_partitions(spark, man, target_bytes=1 << 30, min_files=1)
    post = sorted(
        map(tuple, spark.read.option("basePath", man)
            .parquet(f"{man}/batch=*").collect())
    )
    assert pre == post
    got2 = {
        r["shard"]: r["total_weight"]
        for r in read_shard_totals(spark, state, n_shards=n_shards).collect()
    }
    totals_now = sorted(got2.values())
    assert totals_now[-1] - totals_now[0] == spread


def test_stream_token_budget_select_end_to_end(spark, tmp_path):
    """The q228 operator's incremental streaming posture: three
    order-aligned json batches fold into exactly the one-shot
    selection on the union (global cum_weight included); replaying
    the whole stream against a fresh checkpoint is byte-identical
    (strictly-lower state partials)."""
    import json

    from pyspark.sql import functions as F

    from product_etl_spark.operators.sampling import token_budget_select
    from product_etl_spark.streaming.pipeline import (
        read_budget_state,
        stream_token_budget_select,
    )

    inp = tmp_path / "in"
    inp.mkdir()
    rows = [(i, float(i % 7) + 0.5, i) for i in range(30)]
    sel_dir, state, ckpt = (str(tmp_path / d) for d in ("sel", "state", "ck"))

    def drop_and_run(fn, lo, hi, ck):
        with open(inp / fn, "w") as f:
            for i, w, s in rows[lo:hi]:
                f.write(json.dumps({"doc_id": i, "weight": w, "score": s}) + "\n")
        q = stream_token_budget_select(
            spark, str(inp) + "/*.jsonl", sel_dir, state, ck, budget=55
        )
        q.awaitTermination()

    # one availableNow run per drop: three REAL micro-batches, each
    # folding the strictly-lower state partials
    drop_and_run("a.jsonl", 0, 10, ckpt)
    drop_and_run("b.jsonl", 10, 20, ckpt)
    drop_and_run("c.jsonl", 20, 30, ckpt)
    import os

    assert sorted(
        d for d in os.listdir(state) if d.startswith("batch=")
    ) == ["batch=0", "batch=1", "batch=2"]

    one = {
        (r["doc_id"], r["cum_weight"])
        for r in token_budget_select(
            spark.createDataFrame(rows, "doc_id long, weight double, score long"),
            "weight",
            ["score", "doc_id"],
            55,
        ).collect()
    }
    got = {
        (r["doc_id"], r["cum_weight"])
        for r in spark.read.option("basePath", sel_dir)
        .parquet(f"{sel_dir}/batch=*")
        .collect()
    }
    assert got == one
    spent, hwm = read_budget_state(spark, state)
    assert float(spent) == 100.0 and tuple(hwm) == (29, 29)

    # fresh-checkpoint replay: byte-identical outcome
    q2 = stream_token_budget_select(
        spark, str(inp) + "/*.jsonl", sel_dir, state,
        str(tmp_path / "ck2"), budget=55,
    )
    q2.awaitTermination()
    again = {
        (r["doc_id"], r["cum_weight"])
        for r in spark.read.option("basePath", sel_dir)
        .parquet(f"{sel_dir}/batch=*")
        .collect()
    }
    assert again == one


def test_rebuild_drops_orphaned_state_partial(spark, tmp_path):
    """r15 self-review regression: erasing EVERY row of a batch drops
    its manifest partition in the rewrite — the rebuild must remove
    that batch's state partial too, or read_shard_totals keeps
    balancing against the erased weight forever."""
    import os

    from product_etl_spark.operators.erasure import erase_from_stores
    from product_etl_spark.operators.sampling import (
        append_balanced_shards,
        shard_weight_totals,
    )
    from product_etl_spark.streaming.pipeline import (
        read_shard_totals,
        rebuild_shard_totals_state,
    )

    man, state = str(tmp_path / "man"), str(tmp_path / "state")
    for bid, rows in enumerate(
        ([(1, 10), (2, 20), (3, 5)], [(11, 7), (12, 9)])
    ):
        df = spark.createDataFrame(rows, "doc_id long, w long")
        totals = read_shard_totals(spark, state, n_shards=2)
        a = append_balanced_shards(df, "w", "doc_id", 2, totals)
        a.write.parquet(f"{man}/batch={bid}")
        shard_weight_totals(a, "w").write.parquet(f"{state}/batch={bid}")

    # erase EVERY document of batch 1
    erase_from_stores(
        spark,
        spark.createDataFrame([(11,), (12,)], "doc_id long"),
        [{"path": man, "id_col": "doc_id", "partition_by": ["batch"]}],
    )
    rebuilt = rebuild_shard_totals_state(spark, man, state, "w")
    assert rebuilt == [0]
    assert not os.path.exists(f"{state}/batch=1")  # orphan removed
    got = {
        r["shard"]: r["total_weight"]
        for r in read_shard_totals(spark, state, n_shards=2).collect()
    }
    assert sum(got.values()) == 35.0  # batch-0 weight only
