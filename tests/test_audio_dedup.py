"""Audio fingerprint + banded near-dup: the audio twin of the image
pHash dedup (tests/test_image_dedup.py). Planted variants of one
recording (amplitude-scaled, lightly noised) must pair up; unrelated
audio must not; corrupt payloads quarantine to NULL."""

from __future__ import annotations

import numpy as np

from product_etl_spark.functions import codecs
from product_etl_spark.operators.multimodal import (
    audio_fingerprint,
    audio_near_dup_pairs,
)


def _broadband(seed: int, rate: int = 8000, secs: float = 2.0) -> np.ndarray:
    """Amplitude-modulated broadband noise: energy in EVERY band (the
    realistic speech/music-like case — the fingerprint's sign bits
    are only as stable as the energy they summarize; a narrowband
    chirp leaves most bands noise-dominated and was measured
    non-separable, which the operator docstring records)."""
    rng = np.random.default_rng(seed)
    x = rng.normal(0, 0.2, int(rate * secs))
    env = 0.5 + 0.5 * np.sin(
        2 * np.pi * rng.uniform(0.5, 2.0) * np.arange(x.size) / rate
        + rng.uniform(0, 6)
    )
    return np.clip(x * env, -0.9, 0.9)


def test_audio_near_dup_planted_variants(spark):
    rate = 8000
    base = _broadband(7)
    noised = np.clip(
        base + np.random.default_rng(11).normal(0, 0.01, base.size), -1, 1
    )
    rows = [
        ("orig", codecs.encode_wav(base, rate)),
        ("scaled", codecs.encode_wav(0.5 * base, rate)),   # volume change
        ("noised", codecs.encode_wav(noised, rate)),       # light noise
        ("other", codecs.encode_wav(_broadband(99), rate)),  # unrelated
        ("corrupt", b"notawav"),
    ]
    media = spark.createDataFrame(rows, "media_id string, content binary")

    fps = {r["media_id"]: r["afp_words"] for r in audio_fingerprint(media).collect()}
    assert fps["corrupt"] is None
    assert fps["orig"] == fps["scaled"]  # pure gain: every sign invariant

    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in audio_near_dup_pairs(media, max_hamming=6).collect()
    }
    flat = set()
    for a, b in pairs:
        flat.add(frozenset((a, b)))
    assert frozenset(("orig", "scaled")) in flat
    assert frozenset(("noised", "orig")) in flat
    assert not any("other" in p for p in flat)
    assert not any("corrupt" in p for p in flat)
