"""The complete reference user journey in one test — everything a
spec-vova/product-etl user runs today, executed against this engine
(SURVEY.md §3 lifecycles chained):

raw CSV export
  -> bulk ingest (ETL.main)               [pipelines/ingest]
  -> zh->en translation sweep             [pipelines/translation]
  -> details enrichment w/ OCR+logistics  [pipelines/enrichment]
  -> integrity audit                      [pipelines/verification]
  -> flagship query w/ resolved names     [plans/warehouse]
"""

from __future__ import annotations

from pyspark.sql import functions as F

from product_etl_spark.pipelines.enrichment import run_enrichment
from product_etl_spark.pipelines.ingest import run_ingest
from product_etl_spark.pipelines.translation import run_translation_sweep
from product_etl_spark.pipelines.verification import assert_all, run_warehouse_checks
from product_etl_spark.plans.warehouse import (
    products_per_collection_with_names,
    resolve_names,
)
from product_etl_spark.sources.csv_reader import read_raw_products
import pytest


@pytest.mark.slow
def test_full_reference_journey(spark, tmp_path):
    import test_ingest as TI

    csv = tmp_path / "raw.csv"
    csv.write_text(TI.HEADER + "\n" + "\n".join(TI.ROWS), encoding="utf-8")
    wh = str(tmp_path / "wh")

    # 1. bulk ingest
    result = run_ingest(spark, read_raw_products(spark, str(csv)), wh)
    assert result.tables["product"].count() == 4

    # 2. translation sweep (mock MT, cached)
    translations = run_translation_sweep(
        spark,
        f"{wh}/translations",
        lambda batch: [f"EN({v})" for v in batch],
        "zh",
        "en",
        cache_path=str(tmp_path / "mt_cache"),
    )
    assert translations.filter(F.col("lang_code") == "en").count() > 0

    # 3. enrichment over details HTML (mock OCR/LLM kernels)
    products_with_html = spark.createDataFrame(
        [("p-963cef", '<img src="https://x/d1.jpg"><img src="https://x/d2.jpg">')],
        "product_id string, details_html string",
    )
    stages = run_enrichment(
        spark,
        products_with_html,
        str(tmp_path / "stages"),
        ocr_kernel=lambda url: f"text-from-{url.rsplit('/', 1)[-1]}",
        translate_kernel=lambda batch: [f"T[{t}]" for t in batch],
        logistics_kernel=lambda text: {
            "packaging_features": "boxed",
            "dimensions_cm": "40x40x10",
            "volumetric_weight_kg": "1.2",
            "actual_weight_kg": "0.9",
            "logistics_notes": text[:20],
        },
    )
    log = stages["logistics"].collect()
    assert len(log) == 1 and log[0]["packaging_features"] == "boxed"

    # 4. integrity audit over the full warehouse — with the
    # post-sweep translations state (the sweep's merge swapped the
    # table; pre-merge handles are stale per the upsert contract)
    audited = dict(result.tables)
    audited["translations"] = translations
    assert_all(run_warehouse_checks(audited))

    # 5. flagship query with en names resolved (zh fallback)
    named = resolve_names(
        result.tables["product_collection"], translations, "product_collection", "en"
    )
    by_code = {r["master_code"]: r["name"] for r in named.collect()}
    assert by_code["963cef"] == "EN(奶油色抱枕套)"

    flagship = {
        r["master_code"]: r["n_products"]
        for r in products_per_collection_with_names(
            result.tables["product_collection"],
            result.tables["product"],
            translations,
            lang_code="en",
        ).collect()
    }
    assert flagship == {"963cef": 3, "aa11bb": 1, "cc22dd": 0}
