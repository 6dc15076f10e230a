"""Enrichment pipeline — the reference's orchestrator
(utils/details_translator/db_orchestrator.py:183-397) and its
file-staged twin (scripts 1_..5_) as one DataFrame pipeline with
persisted stage tables.

Reference per-product serial loop (SURVEY.md §3.2):
  HTML -> img URLs -> download -> OCR -> group-concat -> translate
  -> logistics extraction -> store

Spark shape: each arrow is a DataFrame transform; external systems
(HTTP, tesseract, LLM) are injectable kernels wrapped in Arrow-batched
UDF stages — production defaults (tesseract OCR, OpenAI translate /
logistics, import-gated) live in ``product_etl_spark.kernels``. Each stage persists to ``{stage_root}/{stage}`` and reruns
anti-join against existing output — the same resumability the
reference gets from skip flags + read-back (db_orchestrator.py:240-258).
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from product_etl_spark.operators.incremental import only_unprocessed, read_stage_table
from product_etl_spark.operators.upsert import upsert_parquet

#: <img src=...> extraction — the BeautifulSoup img[src] scan
#: (db_orchestrator.py:65-68) as a pure regex over the HTML text,
#: matching html.parser's TOLERANT attribute grammar (CPython
#: html/parser.py attrfind_tolerant): double-quoted, single-quoted, or
#: UNQUOTED values (unquoted = up to whitespace or '>'), optional
#: whitespace around '=', case-insensitive tag/attr names, and any
#: attribute order. Scraped Taobao HTML routinely carries unquoted
#: src= — the old quoted-only regex silently dropped those URLs.
#: Group 1 keeps surrounding quotes (stripped below) so one capture
#: covers all three value forms.
IMG_SRC_PATTERN = (
    r"""(?i)<img\b[^>]*?[\s/'"]src\s*=\s*("[^"]*"|'[^']*'|[^>\s]*)"""
)


def _img_urls(html_col_expr: F.Column) -> F.Column:
    """array<string> of img src values in document order; quotes
    stripped, empty src dropped (the reference filters falsy src:
    1_image_extractor_from_html.py:23)."""
    raw = F.regexp_extract_all(html_col_expr, F.lit(IMG_SRC_PATTERN), 1)
    unquoted = F.transform(
        raw,
        lambda x: F.regexp_replace(x, r"""^"(.*)"$|^'(.*)'$""", r"$1$2"),
    )
    return F.filter(unquoted, lambda x: x != "")


def extract_image_urls(products: DataFrame, html_col: str = "details_html") -> DataFrame:
    """product_id, image_index, image_url — one row per <img src>.

    Driving-set predicate preserved: HTML non-null and non-empty
    (db_orchestrator.py:151)."""
    with_urls = products.filter(
        F.col(html_col).isNotNull() & (F.col(html_col) != "")
    ).select(
        "product_id",
        F.posexplode(_img_urls(F.col(html_col))).alias("pos", "image_url"),
    )
    return with_urls.select(
        "product_id",
        (F.col("pos") + 1).cast("int").alias("image_index"),
        "image_url",
    )


#: OCR kernel: (image_url) -> raw text. Stubbed deterministically in
#: tests (no tesseract in this container); production swaps in
#: pytesseract image_to_data token extraction (db_orchestrator.py:87-102).
OcrKernel = Callable[[str], str]

#: LLM kernels: batch of texts -> batch of outputs.
TranslateKernel = Callable[[list[str]], list[str]]

LOGISTICS_FIELDS = [
    # exact field set of the reference's structured extraction
    # (db_orchestrator.py:49-55)
    "packaging_features",
    "dimensions_cm",
    "volumetric_weight_kg",
    "actual_weight_kg",
    "logistics_notes",
]

_LOGISTICS_SCHEMA = StructType(
    [StructField("product_id", StringType(), False)]
    + [StructField(f, StringType()) for f in LOGISTICS_FIELDS]
)


def ocr_stage(images: DataFrame, kernel: OcrKernel) -> DataFrame:
    """(product_id, image_index, image_url) -> + ocr_text via an
    Arrow-batched pandas UDF (one kernel instance per executor
    process, called per value — tesseract is per-image anyway)."""
    @F.pandas_udf(StringType())
    def ocr_udf(urls: pd.Series) -> pd.Series:
        return urls.map(lambda u: kernel(u) if u else "")

    return images.withColumn("ocr_text", ocr_udf(F.col("image_url")))


def group_ocr_text(ocr: DataFrame) -> DataFrame:
    """Per-product document: space-join OCR fragments ordered by
    image_index (3_group_ocr_results_by_img_&_collection.py:31-33 —
    order preserved via sorted struct collect, SURVEY §2.4 A8),
    empty fragments dropped."""
    return (
        ocr.filter(F.col("ocr_text") != "")
        .groupBy("product_id")
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.sort_array(F.collect_list(F.struct("image_index", "ocr_text"))),
                    lambda s: s["ocr_text"],
                ),
            ).alias("ocr_document")
        )
    )


def translate_stage(
    docs: DataFrame, kernel: TranslateKernel, text_col: str, out_col: str
) -> DataFrame:
    @F.pandas_udf(StringType())
    def tr_udf(s: pd.Series) -> pd.Series:
        vals = s.fillna("").tolist()
        return pd.Series(kernel(vals))

    return docs.withColumn(out_col, tr_udf(F.col(text_col)))


def logistics_stage(
    docs: DataFrame,
    kernel: Callable[[str], dict],
    text_col: str = "translated_text",
) -> DataFrame:
    """Structured extraction -> 5 logistics fields
    (db_orchestrator.py:122-140 parses the LLM reply line-by-line on
    ':'; the kernel owns that parse, the pipeline owns the schema)."""
    def batches(it):
        for pdf in it:
            out = []
            for pid, text in zip(pdf["product_id"], pdf[text_col]):
                d = kernel(text or "")
                row = {"product_id": pid}
                for f_ in LOGISTICS_FIELDS:
                    row[f_] = d.get(f_)
                out.append(row)
            yield pd.DataFrame(out, columns=["product_id"] + LOGISTICS_FIELDS)

    return docs.select("product_id", text_col).mapInPandas(
        batches, schema=_LOGISTICS_SCHEMA
    )


def run_enrichment(
    spark: SparkSession,
    products: DataFrame,
    stage_root: str,
    ocr_kernel: OcrKernel,
    translate_kernel: TranslateKernel,
    logistics_kernel: Callable[[str], dict],
    html_col: str = "details_html",
    product_ids: list[str] | None = None,
    limit: int | None = None,
) -> dict[str, DataFrame]:
    """Full pipeline with per-stage persistence + incremental rerun.

    ``products`` needs (product_id, details_html). Each stage
    processes only products absent from its stage table, then MERGEs
    — so a rerun after a mid-pipeline failure redoes only the missing
    tail, per-stage, exactly like the reference's skip flags.

    ``product_ids`` / ``limit`` are the reference's dynamic driving-
    set predicates (P8: db_orchestrator.py:157-174 appends id /
    LIMIT filters from env/CLI) — applied to the driving frame before
    stage 1, so a bounded test run touches only that slice.
    """
    if product_ids:
        products = products.filter(F.col("product_id").isin(*product_ids))
    if limit is not None:
        products = products.limit(limit)
    stages: dict[str, DataFrame] = {}

    # Stage 1: image URL extraction
    urls_path = f"{stage_root}/image_urls"
    pending = only_unprocessed(
        products, read_stage_table(spark, urls_path), "product_id"
    )
    fresh_urls = extract_image_urls(pending, html_col)
    stages["image_urls"] = upsert_parquet(
        spark, fresh_urls, urls_path, keys=["product_id", "image_index"],
        mode="insert_only",
    )

    # Stage 2: OCR per image
    ocr_path = f"{stage_root}/ocr"
    pending = only_unprocessed(
        stages["image_urls"], read_stage_table(spark, ocr_path),
        ["product_id", "image_index"],
    )
    stages["ocr"] = upsert_parquet(
        spark, ocr_stage(pending, ocr_kernel), ocr_path,
        keys=["product_id", "image_index"], mode="insert_only",
    )

    # Stage 3: per-product grouped document
    grouped_path = f"{stage_root}/ocr_grouped"
    grouped = group_ocr_text(stages["ocr"])
    stages["ocr_grouped"] = upsert_parquet(
        spark, grouped, grouped_path, keys=["product_id"]
    )

    # Stage 4: translation
    translated_path = f"{stage_root}/translated"
    pending = only_unprocessed(
        stages["ocr_grouped"], read_stage_table(spark, translated_path), "product_id"
    )
    translated = translate_stage(
        pending, translate_kernel, "ocr_document", "translated_text"
    )
    stages["translated"] = upsert_parquet(
        spark, translated, translated_path, keys=["product_id"], mode="insert_only"
    )

    # Stage 5: logistics extraction
    logistics_path = f"{stage_root}/logistics"
    pending = only_unprocessed(
        stages["translated"], read_stage_table(spark, logistics_path), "product_id"
    )
    stages["logistics"] = upsert_parquet(
        spark, logistics_stage(pending, logistics_kernel), logistics_path,
        keys=["product_id"], mode="insert_only",
    )
    return stages
