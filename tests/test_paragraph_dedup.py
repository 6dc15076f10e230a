"""Within-document paragraph dedup (dedup_paragraphs_within_doc) and
the domain-grouped split composition."""

from __future__ import annotations

from pyspark.sql import functions as F

from product_etl_spark.operators.dedup import dedup_paragraphs_within_doc


def test_first_occurrence_wins_order_preserved(spark):
    docs = spark.createDataFrame(
        [
            (1, "A\n\nB\n\nA\n\nC\n\nB"),
            (2, "X"),
            (3, "Y\n\n\n\nY"),  # repeated separator -> empty para dropped
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r
        for r in dedup_paragraphs_within_doc(docs, "text", "doc_id").collect()
    }
    assert out[1]["text"] == "A\n\nB\n\nC"
    assert out[1]["n_paragraphs_kept"] == 3
    assert out[2]["text"] == "X"
    assert out[3]["text"] == "Y"
    assert out[3]["n_paragraphs_kept"] == 1


def test_cross_doc_duplicates_untouched(spark):
    """Same paragraph in DIFFERENT docs survives in both — this is
    within-doc dedup only."""
    docs = spark.createDataFrame(
        [(1, "SAME\n\nother"), (2, "SAME")], ["doc_id", "text"]
    )
    out = {
        r["doc_id"]: r["text"]
        for r in dedup_paragraphs_within_doc(docs, "text", "doc_id").collect()
    }
    assert out == {1: "SAME\n\nother", 2: "SAME"}


def test_no_window_in_plan(spark):
    docs = spark.createDataFrame([(1, "A\n\nA")], ["doc_id", "text"])
    plan = (
        dedup_paragraphs_within_doc(docs, "text", "doc_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan


def test_paragraph_catalog_matches_oracle(spark, sf_dir):
    from product_etl_spark.plans import CATALOG
    from product_etl_spark.plans.parity import compare

    spec = CATALOG["q136_within_doc_paragraph_dedup"]
    ok, msg = compare(spec["fn"](spark, sf_dir), spec["oracle"], sf_dir)
    assert ok, msg


def test_domain_grouped_split_no_straddle(spark):
    """Composition: train/test split keyed on the registered domain —
    all documents of one domain land on the same side, so domain-level
    near-duplicates cannot straddle the boundary (the GitHub
    split-by-repo / web split-by-domain practice)."""
    from product_etl_spark.functions.urls import url_registered_domain
    from product_etl_spark.operators.sampling import train_test_split

    rows = [
        (i, f"https://sub{i % 7}.site{i % 23}.example{i % 11}.com/p/{i}")
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "url"]).withColumn(
        "domain", url_registered_domain("url")
    )
    train, test = train_test_split(df, "domain", test_fraction=0.3)
    tr = {r["domain"] for r in train.select("domain").distinct().collect()}
    te = {r["domain"] for r in test.select("domain").distinct().collect()}
    assert tr and te
    assert not (tr & te)
    assert train.count() + test.count() == 400
