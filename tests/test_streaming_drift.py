"""Streaming PSI drift monitor: frozen baseline, replay-safe
micro-batch partials, batch-identical scoring."""

from __future__ import annotations

from pyspark.sql import functions as F

from product_etl_spark.operators.profile import population_stability_index
from product_etl_spark.streaming.pipeline import (
    prepare_psi_baseline,
    read_psi_drift,
    stream_psi_monitor,
)


def _write_vals(spark, path, vals):
    spark.createDataFrame([(float(v),) for v in vals], "v double").coalesce(
        1
    ).write.mode("append").parquet(path)


def test_stream_psi_matches_batch_operator(spark, tmp_path):
    base_vals = [float(i % 100) for i in range(1000)]
    cur_vals = [float(i % 50 + 50) for i in range(600)]  # shifted up
    expected = spark.createDataFrame([(v,) for v in base_vals], "v double")
    actual = spark.createDataFrame([(v,) for v in cur_vals], "v double")
    batch_terms = {
        r["bin"]: r["psi_term"]
        for r in population_stability_index(expected, actual, "v", 10).collect()
    }

    bp = str(tmp_path / "baseline")
    prepare_psi_baseline(expected, "v", 10, bp)
    src = str(tmp_path / "in")
    # two arrivals -> two micro-batches folded into one observed dist
    _write_vals(spark, src, cur_vals[:200])
    stream = spark.readStream.schema("v double").parquet(src)
    st = str(tmp_path / "state")
    ck = str(tmp_path / "ck")
    stream_psi_monitor(stream, "v", bp, st, ck)
    _write_vals(spark, src, cur_vals[200:])
    stream2 = spark.readStream.schema("v double").parquet(src)
    stream_psi_monitor(stream2, "v", bp, st, ck)

    stream_terms = {
        r["bin"]: r["psi_term"]
        for r in read_psi_drift(spark, st, bp, 10).collect()
    }
    assert stream_terms == batch_terms
    total = sum(stream_terms.values())
    assert total > 0.25  # the planted shift trips the gate


def test_stream_psi_replay_is_idempotent(spark, tmp_path):
    expected = spark.range(500).select((F.col("id") % 100).alias("v"))
    bp = str(tmp_path / "baseline")
    prepare_psi_baseline(expected, "v", 10, bp)
    src = str(tmp_path / "in")
    _write_vals(spark, src, [float(i % 100) for i in range(300)])

    def run():
        stream = spark.readStream.schema("v double").parquet(src)
        stream_psi_monitor(
            stream, "v", bp, str(tmp_path / "state"), str(tmp_path / "ck2")
        )

    run()
    first = read_psi_drift(spark, str(tmp_path / "state"), bp, 10).collect()
    # replay from a FRESH checkpoint (simulates redelivery): partials
    # land in the same batch=N dirs with the same content
    import shutil

    shutil.rmtree(str(tmp_path / "ck2"))
    run()
    second = read_psi_drift(spark, str(tmp_path / "state"), bp, 10).collect()
    assert sorted(map(tuple, first)) == sorted(map(tuple, second))
    # same distribution as baseline -> no drift
    assert abs(sum(r["psi_term"] for r in second)) < 1e-6


def test_stream_ks_matches_batch_operator(spark, tmp_path):
    """The SAME monitor state that feeds read_psi_drift serves KS:
    gaps must equal the batch ks_drift on the identical split."""
    from product_etl_spark.operators.profile import ks_drift
    from product_etl_spark.streaming.pipeline import read_ks_drift

    base_vals = [float(i % 100) for i in range(1000)]
    cur_vals = [float(i % 50 + 50) for i in range(600)]
    expected = spark.createDataFrame([(v,) for v in base_vals], "v double")
    actual = spark.createDataFrame([(v,) for v in cur_vals], "v double")
    batch = {
        r["bin"]: (r["cdf_expected"], r["cdf_actual"], r["ks_gap"])
        for r in ks_drift(expected, actual, "v", 10).collect()
    }

    bp = str(tmp_path / "baseline")
    prepare_psi_baseline(expected, "v", 10, bp)
    src = str(tmp_path / "in")
    _write_vals(spark, src, cur_vals[:250])
    stream = spark.readStream.schema("v double").parquet(src)
    st, ck = str(tmp_path / "state"), str(tmp_path / "ck")
    stream_psi_monitor(stream, "v", bp, st, ck)
    _write_vals(spark, src, cur_vals[250:])
    stream2 = spark.readStream.schema("v double").parquet(src)
    stream_psi_monitor(stream2, "v", bp, st, ck)

    streamed = {
        r["bin"]: (r["cdf_expected"], r["cdf_actual"], r["ks_gap"])
        for r in read_ks_drift(spark, st, bp).collect()
    }
    assert streamed == batch
    assert max(g for _, _, g in streamed.values()) > 0.4  # planted shift


def test_stream_checksums_match_batch(spark, tmp_path):
    """Streamed per-batch checksum partials fold to EXACTLY the batch
    operator's output over all rows ingested so far."""
    from product_etl_spark.operators.integrity import group_checksums
    from product_etl_spark.streaming.pipeline import (
        read_table_checksums,
        stream_checksum_monitor,
    )

    rows = [(i % 3, f"v{i}") for i in range(60)]
    src = str(tmp_path / "in")

    def write_rows(rs):
        spark.createDataFrame(rs, "g int, v string").coalesce(1).write.mode(
            "append"
        ).parquet(src)

    st, ck = str(tmp_path / "state"), str(tmp_path / "ck")
    write_rows(rows[:25])
    stream_checksum_monitor(
        spark.readStream.schema("g int, v string").parquet(src),
        ["g"], ["g", "v"], st, ck,
    )
    write_rows(rows[25:])
    stream_checksum_monitor(
        spark.readStream.schema("g int, v string").parquet(src),
        ["g"], ["g", "v"], st, ck,
    )
    streamed = {
        r["g"]: tuple(r)
        for r in read_table_checksums(spark, st, ["g"]).collect()
    }
    whole = {
        r["g"]: tuple(r)
        for r in group_checksums(
            spark.createDataFrame(rows, "g int, v string"), ["g"], ["g", "v"]
        ).collect()
    }
    assert streamed == whole


def _write_docs(spark, path, rows):
    spark.createDataFrame(rows, "doc_id int, text string").coalesce(
        1
    ).write.mode("append").parquet(path)


def test_stream_jaccard_index_matches_batch_builder(spark, tmp_path):
    """Folded per-micro-batch token rows must reconstruct EXACTLY the
    index build_jaccard_index computes over the concatenated corpus —
    df counts, set sizes, and prefix flags included — and the probe
    over the streamed index must equal the probe over the batch one."""
    from product_etl_spark.operators.dedup_incremental import (
        build_jaccard_index,
        probe_jaccard_index,
    )
    from product_etl_spark.streaming.pipeline import (
        read_jaccard_index,
        stream_jaccard_token_rows,
    )

    wave1 = [(1, "alpha beta gamma delta epsilon"),
             (2, "one two three four five six")]
    wave2 = [(3, "unrelated totally different words here"),
             (4, "alpha beta gamma other tokens")]
    src, st, ck = (str(tmp_path / d) for d in ("in", "state", "ck"))
    _write_docs(spark, src, wave1)
    stream_jaccard_token_rows(
        spark.readStream.schema("doc_id int, text string").parquet(src),
        "text", "doc_id", st, ck)
    _write_docs(spark, src, wave2)
    stream_jaccard_token_rows(
        spark.readStream.schema("doc_id int, text string").parquet(src),
        "text", "doc_id", st, ck)

    combined = spark.createDataFrame(wave1 + wave2, "doc_id int, text string")
    want = sorted(map(tuple, build_jaccard_index(
        combined, "text", "doc_id", 3, 5).collect()))
    got = sorted(map(tuple, read_jaccard_index(spark, st, 3, 5).collect()))
    assert got == want

    batch = spark.createDataFrame(
        [(101, "alpha beta gamma delta zeta"),
         (102, "nothing shared at all")], "doc_id int, text string")
    p_stream = sorted(map(tuple, probe_jaccard_index(
        read_jaccard_index(spark, st, 3, 5), batch, "text", "doc_id", 3, 5
    ).collect()))
    p_batch = sorted(map(tuple, probe_jaccard_index(
        build_jaccard_index(combined, "text", "doc_id", 3, 5),
        batch, "text", "doc_id", 3, 5).collect()))
    assert p_stream == p_batch and len(p_stream) == 1


def test_stream_jaccard_index_replay_is_idempotent(spark, tmp_path):
    from product_etl_spark.streaming.pipeline import (
        read_jaccard_index,
        stream_jaccard_token_rows,
    )

    src, st = str(tmp_path / "in"), str(tmp_path / "state")
    _write_docs(spark, src, [(1, "alpha beta gamma"), (2, "one two three")])

    def run(ck):
        stream_jaccard_token_rows(
            spark.readStream.schema("doc_id int, text string").parquet(src),
            "text", "doc_id", st, ck)

    run(str(tmp_path / "ck1"))
    first = sorted(map(tuple, read_jaccard_index(spark, st).collect()))
    # redelivery from a fresh checkpoint: same batch dirs, same content
    run(str(tmp_path / "ck2"))
    second = sorted(map(tuple, read_jaccard_index(spark, st).collect()))
    assert first == second


def _write_seg_vals(spark, path, rows):
    spark.createDataFrame(rows, "seg string, v double").coalesce(
        1
    ).write.mode("append").parquet(path)


def test_stream_segment_divergence_matches_batch_operator(spark, tmp_path):
    """Folded (seg, bin) micro-batch partials must reproduce the
    batch segment_divergence arithmetic exactly — given the same bin
    frame. The baseline freezes [min, max] over ALL the data here, so
    batch (running min/max) and stream (frozen frame) bin
    identically."""
    from product_etl_spark.operators.profile import segment_divergence
    from product_etl_spark.streaming.pipeline import (
        prepare_psi_baseline,
        read_segment_divergence,
        stream_segment_divergence_monitor,
    )

    rows = [
        ("A", float(i % 100)) for i in range(400)
    ] + [
        ("B", float(i % 50 + 50)) for i in range(300)   # shifted segment
    ]
    all_df = spark.createDataFrame(rows, "seg string, v double")
    batch_terms = {
        (r["seg"], r["bin"]): (r["n_global"], r["n_seg"], r["psi_term"])
        for r in segment_divergence(all_df, "seg", "v", 10).collect()
    }

    bp = str(tmp_path / "baseline")
    prepare_psi_baseline(all_df, "v", 10, bp)
    src, st, ck = (str(tmp_path / d) for d in ("in", "state", "ck"))
    _write_seg_vals(spark, src, rows[:250])
    stream_segment_divergence_monitor(
        spark.readStream.schema("seg string, v double").parquet(src),
        "seg", "v", bp, st, ck, 10)
    _write_seg_vals(spark, src, rows[250:])
    stream_segment_divergence_monitor(
        spark.readStream.schema("seg string, v double").parquet(src),
        "seg", "v", bp, st, ck, 10)

    stream_terms = {
        (r["seg"], r["bin"]): (r["n_global"], r["n_seg"], r["psi_term"])
        for r in read_segment_divergence(spark, st, 10).collect()
    }
    assert stream_terms == batch_terms
    # the shifted segment diverges, the majority segment barely does
    tot = {}
    for (seg, _), (_, _, t) in stream_terms.items():
        tot[seg] = tot.get(seg, 0.0) + t
    assert tot["B"] > 0.25 and tot["B"] > tot["A"]


def _write_qs_vals(spark, path, rows):
    spark.createDataFrame(rows, "g string, x double, rk string").coalesce(
        1
    ).write.mode("append").parquet(path)


def test_stream_quantile_sample_matches_batch_and_replays(spark, tmp_path):
    """Folded per-micro-batch bottom-k samples must reconstruct
    EXACTLY the single-pass quantile_sample_partials over the
    concatenated stream (the KMV merge property: bottom-k of a union
    == union of bottom-ks re-cut to k), estimates included; replay
    from a fresh checkpoint is a no-op (pure hash predicate, no
    randomness)."""
    from product_etl_spark.operators.sketches import (
        quantile_sample_estimate,
        quantile_sample_partials,
    )
    from product_etl_spark.streaming.pipeline import (
        read_quantile_sample,
        stream_quantile_sample,
    )

    wave1 = [("g", float(v), f"a{v}") for v in range(100)]
    wave2 = [("g", float(v), f"b{v}") for v in range(100, 300)]
    src, st = str(tmp_path / "in"), str(tmp_path / "state")

    def run(ck):
        stream_quantile_sample(
            spark.readStream.schema("g string, x double, rk string").parquet(src),
            ["g"], "x", "rk", st, ck, k=64,
        )

    _write_qs_vals(spark, src, wave1)
    run(str(tmp_path / "ck1"))
    _write_qs_vals(spark, src, wave2)
    run(str(tmp_path / "ck1"))

    combined = spark.createDataFrame(
        wave1 + wave2, "g string, x double, rk string"
    )
    want = sorted(map(tuple, quantile_sample_partials(
        combined, ["g"], "x", "rk", k=64).collect()))
    got = sorted(map(tuple, read_quantile_sample(
        spark, st, ["g"], k=64).collect()))
    assert got == want

    est_s = quantile_sample_estimate(
        read_quantile_sample(spark, st, ["g"], k=64), ["g"], [0.5]
    ).collect()
    est_b = quantile_sample_estimate(
        quantile_sample_partials(combined, ["g"], "x", "rk", k=64),
        ["g"], [0.5],
    ).collect()
    assert sorted(map(tuple, est_s)) == sorted(map(tuple, est_b))

    # replay: fresh checkpoint over the same source, state unchanged
    run(str(tmp_path / "ck2"))
    again = sorted(map(tuple, read_quantile_sample(
        spark, st, ["g"], k=64).collect()))
    assert again == want


def test_stream_weighted_median_matches_batch(spark, tmp_path):
    """The (group, value)->weight table is additive mergeable state:
    folding per-micro-batch SUM partials through the continuous
    rollup scaffold and reading them out with
    weighted_median_from_counts must equal grouped_weighted_median
    over the concatenated stream."""
    from product_etl_spark.operators.profile import (
        grouped_weighted_median,
        weighted_median_from_counts,
    )
    from product_etl_spark.streaming.pipeline import (
        read_rollup_state,
        stream_continuous_rollup,
    )

    wave1 = [("a", 10.0, 3), ("a", 20.0, 1), ("b", 5.0, 2)]
    wave2 = [("a", 10.0, 2), ("a", 30.0, 1), ("b", 7.0, 5)]
    src, st, ck = (str(tmp_path / d) for d in ("in", "state", "ck"))

    def write(rows):
        spark.createDataFrame(rows, "g string, v double, w long").coalesce(
            1
        ).write.mode("append").parquet(src)

    def run():
        stream_continuous_rollup(
            spark.readStream.schema("g string, v double, w long").parquet(src),
            st, ["g", "v"], {"_w": F.col("w").cast("long")}, ck,
        )

    write(wave1); run()
    write(wave2); run()

    folded = read_rollup_state(spark, st, ["g", "v"], ["_w"]).select(
        "g", F.col("v").alias("_v"), "_w"
    )
    got = sorted(map(tuple, weighted_median_from_counts(
        folded, ["g"]).collect()))
    combined = spark.createDataFrame(
        wave1 + wave2, "g string, v double, w long"
    )
    want = sorted(map(tuple, grouped_weighted_median(
        combined, ["g"], "v", "w").collect()))
    assert got == want
    # and the "a" median moved by the second wave's weight: 10.0
    # carries 5 of 7 total weight
    assert dict((g, (m, t)) for g, m, t in got)["a"] == (10.0, 7)
