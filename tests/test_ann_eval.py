"""ANN recall audit (similarity.signbit_bands / ann_recall_audit):
planted-fixture semantics — an identical vector MUST be a candidate
and a hit; a fully sign-flipped vector can NEVER be a candidate — and
the bit-packing contract of the signature itself."""

from __future__ import annotations

from product_etl_spark.operators.similarity import (
    ann_recall_audit,
    signbit_bands,
)


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_signbit_band_packing(spark):
    """Hand-checked packing: bit j of band b is set iff
    emb[b*band_bits + j] >= 0 (zero counts as positive)."""
    df = _emb(spark, [(7, [1.0, -1.0, 0.0, 1.0, -2.0, -3.0, -4.0, 5.0])])
    rows = {
        r["band"]: r["band_val"]
        for r in signbit_bands(
            df, "embedding", "vec_id", n_bands=2, band_bits=4
        ).collect()
    }
    # band 0: [+, -, +(zero), +] -> 1 + 4 + 8 = 13
    # band 1: [-, -, -, +]       -> 8
    assert rows == {0: 13, 1: 8}


def test_recall_audit_planted(spark):
    """Query 0 has an exact duplicate (id 1: same signs -> candidate in
    every band; cosine 1.0 -> exact top-1) and a sign-flipped twin
    (id 2: NO band can match -> never a candidate even though its
    |cosine| is 1). Fillers 3/4 share no band with the query."""
    df = _emb(
        spark,
        [
            (0, [1.0, -1.0, 1.0, 1.0, -1.0, 1.0, -1.0, -1.0]),
            (1, [2.0, -2.0, 2.0, 2.0, -2.0, 2.0, -2.0, -2.0]),
            (2, [-1.0, 1.0, -1.0, -1.0, 1.0, -1.0, 1.0, 1.0]),
            (3, [-1.0, -1.0, -1.0, -1.0, -1.0, -1.0, -1.0, -1.0]),
            (4, [-1.0, 1.0, 1.0, -1.0, 1.0, 1.0, 1.0, -1.0]),
        ],
    )
    out = ann_recall_audit(
        df,
        "embedding",
        "vec_id",
        n_queries=1,
        k=2,
        n_bands=2,
        band_bits=4,
    ).collect()
    assert len(out) == 1
    row = out[0]
    assert row["query_id"] == 0
    # id 1 is the only sign-identical vector -> the only candidate
    assert row["n_candidates"] == 1
    # exact top-2 of query 0 is {1 (cos=1.0), then the best filler};
    # the candidate set {1} intersects it in exactly one vector
    assert row["hits"] == 1
    assert row["recall"] == 0.5


def test_recall_audit_zero_candidates_row_survives(spark):
    """A query whose signature matches nothing still gets its audit
    row (n_candidates = hits = 0) — silent row loss would overstate
    average recall."""
    df = _emb(
        spark,
        [
            (0, [1.0, 1.0, 1.0, 1.0]),
            (1, [-1.0, -1.0, -1.0, -1.0]),
            (2, [-1.0, -1.0, -1.0, 1.0]),
        ],
    )
    out = {
        r["query_id"]: r
        for r in ann_recall_audit(
            df, "embedding", "vec_id",
            n_queries=2, k=1, n_bands=1, band_bits=4,
        ).collect()
    }
    assert out[0]["n_candidates"] == 0
    assert out[0]["hits"] == 0
    assert out[0]["recall"] == 0.0
    # query 1 shares band [-,-,-,+]=8? no: id1 packs to 0, id2 packs
    # to 8 -> no match either; both rows must exist regardless
    assert set(out) == {0, 1}


def test_ivf_recall_audit_cross_cell_miss(spark):
    """q189's planted geometry: query 0 ([1,0]) sits in cell 0 with
    vecs 2 and 4; its exact top-2 is {1 (cos=1.0, but in CELL 1 —
    L2 puts the scaled twin with the far seed), 4}. Single-probe
    recall is therefore 0.5 with 2 candidates — the exact trade the
    audit exists to expose."""
    from product_etl_spark.operators.similarity import ivf_recall_audit

    df = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (1, [10.0, 0.0]),
            (2, [0.6, 0.8]),
            (3, [6.0, 8.0]),
            (4, [1.2, 0.01]),
        ],
        "vec_id long, embedding array<float>",
    )
    row = ivf_recall_audit(
        df, "embedding", "vec_id", n_cells=2, n_queries=1, k=2
    ).collect()[0]
    assert row["query_id"] == 0 and row["list_id"] == 0
    assert row["n_candidates"] == 2  # cell 0 = {0, 2, 4} minus self
    assert row["hits"] == 1  # vec 4 in-cell; vec 1 (top-1!) missed
    assert row["recall"] == 0.5


def test_signbit_band_null_poisoning_short_and_long_vectors(spark):
    """Pins the documented malformed-vector contract (ADVICE r11):
    any band touching a missing dimension is NULL-POISONED (a NULL
    band value never matches an equi-join, so an undersized vector
    can never be a candidate via that band), a PARTIAL band is poisoned
    as a whole (not sign-packed from the surviving prefix), and extra
    dimensions beyond n_bands*band_bits are ignored."""
    rows = [
        (0, [1.0, -1.0, 1.0, 1.0]),          # exact fit: 2 bands x 2 bits
        (1, [1.0, -1.0, 1.0]),               # band 1 partial -> NULL
        (2, [1.0]),                          # band 0 partial, band 1 empty
        (3, [1.0, -1.0, 1.0, 1.0, -9.0]),    # extra dim ignored
        (4, []),                             # no dims at all
    ]
    out = {
        (r["vec_id"], r["band"]): r["band_val"]
        for r in signbit_bands(
            _emb(spark, rows), "embedding", "vec_id",
            n_bands=2, band_bits=2,
        ).collect()
    }
    # every vector emits exactly n_bands rows, NULL or not
    assert len(out) == 10
    assert out[(0, 0)] == 1 and out[(0, 1)] == 3
    assert out[(1, 0)] == 1 and out[(1, 1)] is None
    assert out[(2, 0)] is None and out[(2, 1)] is None
    assert out[(3, 0)] == 1 and out[(3, 1)] == 3  # == vec 0, extra ignored
    assert out[(4, 0)] is None and out[(4, 1)] is None
