"""Video near-dup: sampled-frame pHash matching — re-encoded/noised
copies of one clip pair up across most frames; videos sharing only a
single common frame stay below the min_shared_frames floor."""

from __future__ import annotations

import numpy as np

from product_etl_spark.functions import codecs
from product_etl_spark.operators.multimodal import video_near_dup_pairs


def _clip(seed: int, n_frames: int = 12, h: int = 32, w: int = 32) -> np.ndarray:
    """Smooth gradient frames with per-frame drift: structured enough
    for a stable DCT hash, different per seed."""
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:h, 0:w]
    fx, fy = rng.uniform(0.5, 2.0, 2)
    ph = rng.uniform(0, 6, 3)
    frames = []
    for i in range(n_frames):
        px = np.stack(
            [
                127.5
                * (
                    1
                    + np.sin(
                        2 * np.pi * (fx * x / w + fy * y / h)
                        + ph[c]
                        + 0.3 * i
                    )
                )
                for c in range(3)
            ],
            axis=-1,
        )
        frames.append(px)
    return np.asarray(frames, dtype=np.uint8)


def test_video_near_dup_planted_copy(spark):
    base = _clip(3)
    noised = np.clip(
        base.astype(np.int16)
        + np.random.default_rng(5).integers(-4, 5, base.shape),
        0,
        255,
    ).astype(np.uint8)
    rows = [
        ("orig", codecs.encode_rawv(base, fps=5)),
        ("noised", codecs.encode_rawv(noised, fps=5)),  # re-encode noise
        ("other", codecs.encode_rawv(_clip(77), fps=5)),
    ]
    media = spark.createDataFrame(rows, "media_id string, content binary")
    pairs = {
        (r["vid_a"], r["vid_b"]): r
        for r in video_near_dup_pairs(
            media, every_n=4, min_shared_frames=2
        ).collect()
    }
    assert ("noised", "orig") in pairs
    assert pairs[("noised", "orig")]["n_frame_matches"] >= 2
    assert not any("other" in k for k in pairs)
