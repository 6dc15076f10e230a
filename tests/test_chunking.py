"""Sliding-window document chunking: coverage/overlap invariants,
map-only plan, edge docs (cross-engine parity via q118 in
tests/test_oracle_parity.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from product_etl_spark.operators.packing import chunk_documents


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, " ".join(f"t{i}" for i in range(100))),  # long: many chunks
        (1, " ".join(f"s{i}" for i in range(5))),    # shorter than window
        (2, ""),                                     # empty -> no chunks
        (3, None),                                   # NULL  -> no chunks
        (4, "one"),                                  # single token
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string").persist()
    df.count()
    yield df
    df.unpersist()


def test_coverage_and_overlap(docs):
    got = chunk_documents(docs, max_tokens=30, overlap=10).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == {0, 1, 4}  # empty/NULL docs chunk to nothing
    c0 = sorted(by_doc[0], key=lambda r: r["chunk_id"])
    # step = 20 -> starts 0,20,40,60,80 on a 100-token doc
    assert [r["chunk_id"] for r in c0] == [0, 1, 2, 3, 4]
    assert [r["n_tokens"] for r in c0] == [30, 30, 30, 30, 20]
    # consecutive chunks share exactly `overlap` tokens
    for a, b in zip(c0, c0[1:]):
        ta, tb = a["chunk_text"].split(" "), b["chunk_text"].split(" ")
        assert ta[-10:] == tb[:10]
    # every source token appears in order when dropping the overlap
    rebuilt = c0[0]["chunk_text"].split(" ")
    for r in c0[1:]:
        rebuilt += r["chunk_text"].split(" ")[10:]
    assert rebuilt == [f"t{i}" for i in range(100)]
    assert by_doc[1][0]["n_tokens"] == 5
    assert by_doc[4][0]["chunk_text"] == "one"


def test_chunking_is_map_only(docs):
    plan = (
        chunk_documents(docs, max_tokens=30, overlap=10)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_bad_overlap_raises(docs):
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(docs, max_tokens=10, overlap=10)
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(docs, max_tokens=10, overlap=-1)


def test_no_degenerate_trailing_chunk(spark):
    """A start inside the final overlap region would emit a chunk
    fully contained in its predecessor (pure duplicate text): a
    33-token doc at (max=40, overlap=8, step=32) must yield ONE
    chunk, not a second 1-token chunk of already-covered text."""
    df = spark.createDataFrame(
        [(0, " ".join(f"t{i}" for i in range(33)))], "doc_id int, text string"
    )
    got = chunk_documents(df, max_tokens=40, overlap=8).collect()
    assert len(got) == 1 and got[0]["n_tokens"] == 33
    # boundary: 41 tokens -> second chunk carries new token t40
    df2 = spark.createDataFrame(
        [(0, " ".join(f"t{i}" for i in range(41)))], "doc_id int, text string"
    )
    got2 = sorted(
        chunk_documents(df2, max_tokens=40, overlap=8).collect(),
        key=lambda r: r["chunk_id"],
    )
    assert [r["n_tokens"] for r in got2] == [40, 9]
    assert got2[1]["chunk_text"].split(" ")[-1] == "t40"


def test_oracle_sql_validates_params():
    from product_etl_spark.operators.packing import chunk_documents_oracle_sql

    with pytest.raises(ValueError, match="overlap"):
        chunk_documents_oracle_sql(10, 10)
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents_oracle_sql(10, -1)
