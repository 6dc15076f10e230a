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


def test_static_video_single_shared_frame_not_inflated(spark):
    """A static video (one frame content repeated at every sampled
    index) colliding with one matching frame of another video used to
    reach min_shared_frames on frame-PAIR multiplicity (5 pairs from
    1x5 index combinations). n_frame_matches now counts distinct
    matched frame indices on the sparser side, so this pair reports 1
    and stays below the floor."""
    base = _clip(11)
    static = np.repeat(base[:1], 12, axis=0)  # 12 identical frames
    # 'mixed' shares exactly ONE sampled frame's content with 'static'
    mixed = _clip(55)
    mixed[4] = base[0]  # sampled at every_n=4 -> frame_idx 4
    rows = [
        ("static", codecs.encode_rawv(static, fps=5)),
        ("mixed", codecs.encode_rawv(mixed, fps=5)),
    ]
    media = spark.createDataFrame(rows, "media_id string, content binary")
    got = video_near_dup_pairs(media, every_n=4, min_shared_frames=2).collect()
    assert got == []  # old pair-count shape reported 3 "shared frames"

    # and the pair IS reported once the floor admits single-frame overlap,
    # with the honest count of 1
    one = video_near_dup_pairs(media, every_n=4, min_shared_frames=1).collect()
    assert len(one) == 1 and one[0]["n_frame_matches"] == 1
