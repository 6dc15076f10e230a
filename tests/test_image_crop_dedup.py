"""Crop-resistant image dedup: tile-lattice pHash catches aligned
crops that whole-image pHash structurally misses."""

from __future__ import annotations

import numpy as np

from product_etl_spark.functions import codecs
from product_etl_spark.operators.multimodal import (
    image_crop_dup_pairs,
    image_near_dup_pairs,
)


def _img(seed: int, h: int = 64, w: int = 64) -> np.ndarray:
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:h, 0:w]
    fx, fy = rng.uniform(0.5, 3.0, 2)
    ph = rng.uniform(0, 6, 3)
    px = np.stack(
        [
            127.5 * (1 + np.sin(2 * np.pi * (fx * x / w + fy * y / h) + ph[c]))
            for c in range(3)
        ],
        axis=-1,
    )
    return px.astype(np.uint8)


def test_aligned_crop_found_by_tiles_missed_by_whole_image(spark):
    base = _img(7)
    crop = base[:32, :32]          # exact top-left quadrant
    other = _img(99)
    rows = [
        ("base", codecs.encode_png(base)),
        ("crop", codecs.encode_png(crop)),
        ("other", codecs.encode_png(other)),
    ]
    media = spark.createDataFrame(rows, "media_id string, content binary")

    whole = {
        (r["id_a"], r["id_b"])
        for r in image_near_dup_pairs(media, max_hamming=6).collect()
    }
    assert ("base", "crop") not in whole  # whole-image hash can't see it

    tiled = {
        (r["id_a"], r["id_b"]): r
        for r in image_crop_dup_pairs(media, grid=2, max_hamming=6).collect()
    }
    assert ("base", "crop") in tiled
    assert tiled[("base", "crop")]["min_hamming"] == 0  # pixel-exact tile
    assert not any("other" in k for k in tiled)


def test_full_duplicates_still_found_and_corrupt_quarantined(spark):
    base = _img(11)
    noised = np.clip(
        base.astype(np.int16)
        + np.random.default_rng(3).integers(-3, 4, base.shape),
        0, 255,
    ).astype(np.uint8)
    rows = [
        ("a", codecs.encode_png(base)),
        ("b", codecs.encode_png(noised)),
        ("junk", b"\x00\x01not-an-image"),
    ]
    media = spark.createDataFrame(rows, "media_id string, content binary")
    got = {
        (r["id_a"], r["id_b"]): r["n_tile_matches"]
        for r in image_crop_dup_pairs(media, grid=2, max_hamming=6).collect()
    }
    # full image + at least one region survive the noise within 6 bits
    assert ("a", "b") in got and got[("a", "b")] >= 2
    assert not any("junk" in k for k in got)
