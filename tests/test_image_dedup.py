"""Perceptual image hashing (codecs.phash_dct) and banded image
near-dup (multimodal.image_phash / image_near_dup_pairs)."""

from __future__ import annotations

import numpy as np
import pytest

from product_etl_spark.functions import codecs
from product_etl_spark.operators.multimodal import (
    image_near_dup_pairs,
    image_phash,
)


def _img(seed: int, w: int = 64, h: int = 48) -> np.ndarray:
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    # smooth it so the image has real low-frequency structure
    # (pure white noise has no perceptual identity to hash)
    f = base.astype(np.float64)
    for _ in range(3):
        f = (
            f
            + np.roll(f, 1, 0)
            + np.roll(f, -1, 0)
            + np.roll(f, 1, 1)
            + np.roll(f, -1, 1)
        ) / 5.0
    return f.astype(np.uint8)


def _dist(h1: str, h2: str) -> int:
    return bin(int(h1, 16) ^ int(h2, 16)).count("1")


def test_phash_is_64_bit_hex():
    h = codecs.phash_dct(_img(1))
    assert len(h) == 16
    int(h, 16)  # parses


def test_phash_stable_under_resize_and_brightness():
    px = _img(2)
    h = codecs.phash_dct(px)
    up = codecs.resize_bilinear(px, 128, 96)
    assert _dist(h, codecs.phash_dct(up)) <= 6
    brighter = np.clip(px.astype(np.int16) + 25, 0, 255).astype(np.uint8)
    assert _dist(h, codecs.phash_dct(brighter)) <= 6


def test_phash_separates_distinct_images():
    hs = [codecs.phash_dct(_img(s)) for s in range(3, 9)]
    for i in range(len(hs)):
        for j in range(i + 1, len(hs)):
            assert _dist(hs[i], hs[j]) > 10, (i, j)


def _media_rows(spark, items):
    return spark.createDataFrame(
        [(mid, codecs.encode_png(px)) for mid, px in items],
        "media_id string, content binary",
    )


def test_image_phash_stage_and_null_quarantine(spark):
    px = _img(10)
    rows = _media_rows(spark, [("a", px)]).unionByName(
        spark.createDataFrame(
            [("bad", b"not an image"), ("empty", None)],
            "media_id string, content binary",
        )
    )
    got = {r["media_id"]: r["phash"] for r in image_phash(rows).collect()}
    assert got["a"] == codecs.phash_dct(px)
    assert got["bad"] is None and got["empty"] is None


def test_image_near_dup_pairs_finds_planted_variants(spark):
    px = _img(20)
    resized = codecs.resize_bilinear(px, 96, 72)
    media = _media_rows(
        spark,
        [("orig", px), ("resized", resized), ("other", _img(21)),
         ("other2", _img(22))],
    )
    pairs = image_near_dup_pairs(media, max_hamming=6).collect()
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs}
    assert ("orig", "resized") in got
    assert got[("orig", "resized")] <= 6
    assert all({a, b} == {"orig", "resized"} for a, b in got)


def test_image_near_dup_pigeonhole_guard(spark):
    media = _media_rows(spark, [("a", _img(30))])
    with pytest.raises(ValueError, match="pigeonhole"):
        image_near_dup_pairs(media, max_hamming=8, band_bits=8)
