"""Persisted inverted index (retrieval.build_inverted_index /
bm25_topk_indexed) — the lexical twin of the persisted IVF index."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from product_etl_spark.operators.retrieval import (
    _term_bucket_py,
    bm25_topk,
    bm25_topk_indexed,
    build_inverted_index,
)
from product_etl_spark.session import load_tables


@pytest.fixture(scope="module")
def index(spark, sf_dir, tmp_path_factory):
    docs = load_tables(spark, sf_dir)["documents"]
    path = str(tmp_path_factory.mktemp("invidx") / "idx")
    build_inverted_index(docs, path, n_buckets=16)
    return docs, path


TERMS = ["spark", "hash", "window"]


def test_python_bucket_mirrors_spark_hash(spark):
    from product_etl_spark.functions.text import hash64

    rows = (
        spark.createDataFrame([(t,) for t in TERMS], ["term"])
        .select("term", (hash64(F.col("term")) % 16).alias("b"))
        .collect()
    )
    for r in rows:
        assert _term_bucket_py(r["term"], 16) == r["b"]


def test_indexed_scores_match_corpus_scan(spark, index):
    docs, path = index
    scan = bm25_topk(docs, TERMS, top_n=10).collect()
    idx = bm25_topk_indexed(spark, path, TERMS, top_n=10, n_buckets=16).collect()
    assert [tuple(r) for r in idx] == [tuple(r) for r in scan]


def test_postings_read_is_partition_pruned(spark, index):
    _, path = index
    df = bm25_topk_indexed(spark, path, TERMS, top_n=10, n_buckets=16)
    plan = df._jdf.queryExecution().executedPlan().toString()
    scan_line = next(
        ln for ln in plan.splitlines() if "postings" in ln and "Scan" in ln
    )
    assert "PartitionFilters" in plan
    # the pruned scan must mention term_bucket in its partition filters
    assert "term_bucket" in plan
    assert scan_line  # postings scanned exactly via the file source


def test_bucket_layout_bounded(spark, index):
    """Bucketing keeps directory count fixed at n_buckets, not
    vocabulary-sized."""
    import os

    _, path = index
    parts = [
        d
        for d in os.listdir(os.path.join(path, "postings"))
        if d.startswith("term_bucket=")
    ]
    assert 0 < len(parts) <= 16


@pytest.fixture(scope="module")
def tri_index(spark, sf_dir, tmp_path_factory):
    from product_etl_spark.operators.retrieval import build_trigram_index

    docs = load_tables(spark, sf_dir)["documents"]
    path = str(tmp_path_factory.mktemp("triidx") / "idx")
    build_trigram_index(docs, "text", "doc_id", path, n_buckets=16)
    return docs, path


def test_trigram_indexed_matches_inline(spark, tri_index):
    from product_etl_spark.operators.retrieval import (
        trigram_contains_search,
        trigram_search_indexed,
    )

    docs, path = tri_index
    for needle in ["merge batch", "spark", "zz-not-there"]:
        inline = sorted(
            tuple(r)
            for r in trigram_contains_search(
                docs, "text", "doc_id", needle
            ).collect()
        )
        indexed = sorted(
            tuple(r)
            for r in trigram_search_indexed(
                spark, path, docs, "text", "doc_id", needle, n_buckets=16
            ).collect()
        )
        assert indexed == inline, needle
    assert inline == []  # the absent needle really returns nothing


def test_trigram_short_needle_falls_back_to_scan(spark, tri_index):
    from product_etl_spark.operators.retrieval import (
        trigram_contains_search,
        trigram_search_indexed,
    )

    docs, path = tri_index
    inline = sorted(
        tuple(r)
        for r in trigram_contains_search(docs, "text", "doc_id", "sp").collect()
    )
    indexed = sorted(
        tuple(r)
        for r in trigram_search_indexed(
            spark, path, docs, "text", "doc_id", "sp", n_buckets=16
        ).collect()
    )
    assert indexed == inline and len(inline) > 0


def test_trigram_postings_read_is_partition_pruned(spark, tri_index):
    from product_etl_spark.operators.retrieval import trigram_search_indexed

    docs, path = tri_index
    df = trigram_search_indexed(
        spark, path, docs, "text", "doc_id", "merge batch", n_buckets=16
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    scan_line = next(
        ln for ln in plan.splitlines() if "postings" in ln and "Scan" in ln
    )
    assert "PartitionFilters" in plan and "gram_bucket" in plan
    assert scan_line
