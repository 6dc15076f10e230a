"""Translation engine tests: candidate anti-join, distinct-dedup,
cache consultation, fallback semantics, sweep idempotence.

Translator mocks are defined inside the tests (cloudpickle serializes
nested functions by value — module-level ones would need the tests
package importable on executors) and record their calls through the
filesystem (executors are separate processes; driver lists can't see
their appends even in local mode).
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import functions as F

from product_etl_spark.operators.upsert import upsert_parquet
from product_etl_spark.pipelines.translation import (
    run_translation_sweep,
    translate_pending,
    untranslated_candidates,
)


def make_tracking_translator(track_dir: str):
    os.makedirs(track_dir, exist_ok=True)

    def translator(batch: list[str]) -> list[str]:
        for v in batch:
            with open(
                os.path.join(track_dir, f"{uuid.uuid4().hex}.txt"), "w"
            ) as fh:
                fh.write(v)
        return [f"EN({v})" for v in batch]

    return translator


def calls_seen(track_dir: str) -> list[str]:
    out = []
    for name in os.listdir(track_dir):
        with open(os.path.join(track_dir, name)) as fh:
            out.append(fh.read())
    return out


def _translations_df(spark):
    rows = [
        ("product_collection", "e1", "zh", "name", "沙发"),
        ("product_collection", "e2", "zh", "name", "地毯"),
        ("product_collection", "e3", "zh", "name", "沙发"),  # duplicate value
        ("product_collection", "e1", "en", "name", "sofa"),  # already translated
        ("category", "c1", "zh", "name", "吧椅"),
    ]
    return spark.createDataFrame(
        [(f"id{i}", *r) for i, r in enumerate(rows)],
        "id string, entity_type string, entity_id string, lang_code string, "
        "field_name string, value string",
    )


def test_candidates_self_anti_join(spark):
    tr = _translations_df(spark)
    cand = untranslated_candidates(tr, "zh", "en")
    got = {(r["entity_type"], r["entity_id"]) for r in cand.collect()}
    # e1 already has an en row -> excluded
    assert got == {
        ("product_collection", "e2"),
        ("product_collection", "e3"),
        ("category", "c1"),
    }


def test_distinct_strings_translated_once(spark, tmp_path):
    track = str(tmp_path / "calls")
    tr = _translations_df(spark)
    out = translate_pending(
        spark, tr, make_tracking_translator(track), "zh", "en"
    ).collect()
    translated = {r["entity_id"]: r["value"] for r in out}
    assert translated == {"e2": "EN(地毯)", "e3": "EN(沙发)", "c1": "EN(吧椅)"}
    # 3 candidate rows but only distinct values hit the translator
    assert sorted(calls_seen(track)) == sorted(["沙发", "地毯", "吧椅"])


def test_cache_skips_translated_values(spark, tmp_path):
    cache_path = str(tmp_path / "cache")
    seed = spark.createDataFrame(
        [("沙发", "CACHED-sofa", "zh", "en")],
        "value string, translated string, src_lang string, dst_lang string",
    )
    upsert_parquet(spark, seed, cache_path, keys=["src_lang", "dst_lang", "value"])
    track = str(tmp_path / "calls")
    tr = _translations_df(spark)
    out = translate_pending(
        spark, tr, make_tracking_translator(track), "zh", "en", cache_path=cache_path
    ).collect()
    translated = {r["entity_id"]: r["value"] for r in out}
    assert translated["e3"] == "CACHED-sofa"  # cache hit wins
    seen = calls_seen(track)
    assert "沙发" not in seen  # cached value never re-translated
    assert sorted(seen) == sorted(["地毯", "吧椅"])


def test_sweep_insert_only_idempotent(spark, tmp_path):
    path = str(tmp_path / "translations")
    upsert_parquet(
        spark,
        _translations_df(spark),
        path,
        keys=["entity_type", "entity_id", "lang_code", "field_name"],
    )
    track1 = str(tmp_path / "calls1")
    state1 = run_translation_sweep(
        spark, path, make_tracking_translator(track1), "zh", "en"
    )
    n1 = state1.count()
    assert (
        untranslated_candidates(spark.read.parquet(path), "zh", "en").count() == 0
    )
    track2 = str(tmp_path / "calls2")
    state2 = run_translation_sweep(
        spark, path, make_tracking_translator(track2), "zh", "en"
    )
    assert state2.count() == n1
    assert calls_seen(track2) == []  # nothing pending -> translator untouched
    # existing en row for e1 not overwritten (insert-only)
    e1 = state2.filter(
        (F.col("entity_id") == "e1") & (F.col("lang_code") == "en")
    ).collect()
    assert e1[0]["value"] == "sofa"
