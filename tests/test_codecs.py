"""Pure-stdlib media codecs + the multimodal stages running REAL
decodes end-to-end (PNG round-trip incl. all five filter types, BMP,
PPM, WAV, average-hash invariance, Spark mapInPandas stages)."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from product_etl_spark.functions import codecs


def _gradient(h, w, ch=3):
    y, x = np.mgrid[0:h, 0:w]
    px = np.stack(
        [(x * 255 // max(w - 1, 1))] * ch, axis=2
    ).astype(np.uint8)
    px[:, :, ch - 1] = (y * 255 // max(h - 1, 1)).astype(np.uint8)
    return px


def test_png_round_trip_rgb_rgba_gray():
    for ch in (1, 2, 3, 4):
        px = _gradient(13, 17, ch)
        assert np.array_equal(codecs.decode_png(codecs.encode_png(px)), px)


def test_png_all_filter_types_reconstruct():
    """Hand-build a PNG using every filter type (0..4) and check the
    reconstruction against the reference algorithm."""
    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(5, 8, 3), dtype=np.uint8)
    ch, stride = 3, 8 * 3

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if pa <= pb and pa <= pc else (b if pb <= pc else c)

    # filter each scanline y with type y%5
    prior = np.zeros(stride, dtype=np.int32)
    filtered = b""
    for y in range(5):
        line = px[y].reshape(-1).astype(np.int32)
        f = y % 5
        out = np.empty(stride, dtype=np.int32)
        for x in range(stride):
            left = int(line[x - ch]) if x >= ch else 0
            up = int(prior[x])
            ul = int(prior[x - ch]) if x >= ch else 0
            pred = {0: 0, 1: left, 2: up, 3: (left + up) // 2, 4: paeth(left, up, ul)}[f]
            out[x] = (int(line[x]) - pred) % 256
        filtered += bytes([f]) + bytes(out.astype(np.uint8))
        prior = line

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    data = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 8, 5, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(filtered))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(codecs.decode_png(data), px)


def test_png_palette():
    plte = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8)
    idx = np.array([[0, 1], [2, 0]], dtype=np.uint8)

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    data = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0))
        + chunk(b"PLTE", plte.tobytes())
        + chunk(b"IDAT", zlib.compress(b"\x00" + idx[0].tobytes() + b"\x00" + idx[1].tobytes()))
        + chunk(b"IEND", b"")
    )
    out = codecs.decode_png(data)
    assert out.shape == (2, 2, 3) and tuple(out[1, 0]) == (0, 0, 255)


def _bmp_bytes(px):  # 24-bit bottom-up BMP writer for fixtures
    h, w = px.shape[:2]
    row = (w * 3 + 3) & ~3
    body = b""
    for y in range(h - 1, -1, -1):
        line = px[y][:, ::-1].tobytes()  # RGB -> BGR
        body += line + b"\x00" * (row - len(line))
    header = (
        b"BM" + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    )
    return header + body


def test_bmp_and_ppm_decode():
    px = _gradient(6, 5)
    assert np.array_equal(codecs.decode_bmp(_bmp_bytes(px)), px)
    ppm = b"P6\n# comment\n5 6\n255\n" + px.tobytes()
    assert np.array_equal(codecs.decode_ppm(ppm), px)


def test_average_hash_invariance_and_sensitivity():
    px = _gradient(64, 64)
    h1 = codecs.average_hash(px)
    # resize-invariant (same structure at half size)
    h2 = codecs.average_hash(codecs.resize_nearest(px, 32, 32))
    assert h1 == h2
    # inverted image: different hash
    assert h1 != codecs.average_hash(255 - px)
    assert len(h1) == 16


def test_wav_round_trip():
    t = np.linspace(0, 1, 16000, endpoint=False)
    wav = codecs.encode_wav(0.5 * np.sin(2 * np.pi * 440 * t), 16000)
    feats = codecs.decode_wav(wav)
    assert feats["sample_rate"] == 16000 and feats["n_channels"] == 1
    assert abs(feats["duration_s"] - 1.0) < 1e-6
    assert abs(feats["rms"] - 0.5 / np.sqrt(2)) < 1e-3  # sine RMS = A/sqrt2


def test_jpeg_now_decodes_but_truncated_raises():
    # baseline JPEG is a real decode path now (functions/jpeg.py,
    # tests/test_jpeg.py); garbage after the magic still fails loudly
    # rather than returning pixels
    with pytest.raises((ValueError, EOFError)):
        codecs.decode_image(b"\xff\xd8\xff\xe0fakejpeg")


def test_spark_stages_real_decode(spark, tmp_path):
    """binaryFile scan -> real_image_decode features -> resize stage,
    and the audio feature stage — the whole multimodal path on real
    PNG/WAV payloads, no stub."""
    from pyspark.sql import functions as F
    from product_etl_spark.operators.multimodal import (
        extract_audio_features,
        extract_image_features,
        real_image_decode,
        resize_images,
    )

    d = tmp_path / "media"
    d.mkdir()
    (d / "a.png").write_bytes(codecs.encode_png(_gradient(40, 30)))
    (d / "b.png").write_bytes(codecs.encode_png(_gradient(8, 8)))
    media = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.png")
        .load(str(d))
        .select(
            F.md5("content").alias("media_id"),
            F.col("path").alias("uri"),
            F.lit("image/png").alias("media_type"),
            "content",
        )
    )
    feats = {r["width"]: r for r in extract_image_features(media, real_image_decode).collect()}
    assert set(feats) == {30, 8}
    assert feats[30]["height"] == 40 and len(feats[30]["phash"]) == 16

    resized = resize_images(media, 16, 16)
    rfeats = extract_image_features(resized, real_image_decode).collect()
    assert all(r["width"] == 16 and r["height"] == 16 for r in rfeats)

    wav = codecs.encode_wav(np.zeros(8000), 8000)
    audio = spark.createDataFrame([("w1", wav)], "media_id string, content binary")
    a = extract_audio_features(audio).collect()[0]
    assert a["sample_rate"] == 8000 and abs(a["duration_s"] - 1.0) < 1e-6


def test_rawv_roundtrip_and_random_access():
    import numpy as np
    from product_etl_spark.functions import codecs

    rng = np.random.default_rng(7)
    frames = rng.integers(0, 256, size=(10, 4, 6, 3), dtype=np.uint8)
    data = codecs.encode_rawv(frames, fps=5)
    info = codecs.rawv_info(data)
    assert (info["width"], info["height"], info["fps"], info["n_frames"]) == (6, 4, 5, 10)
    for idx in (0, 3, 9):
        assert (codecs.decode_rawv_frame(data, idx) == frames[idx]).all()
    try:
        codecs.rawv_info(b"\x00\x00\x00\x00" + data[4:])
        raise AssertionError("non-RAWV payload must hit the gate")
    except NotImplementedError:
        pass


def test_sample_video_frames_stage(spark):
    import numpy as np
    from product_etl_spark.functions import codecs
    from product_etl_spark.operators.multimodal import sample_video_frames

    f1 = np.zeros((7, 4, 4, 3), dtype=np.uint8)
    for i in range(7):
        f1[i, :, :, 0] = i * 30  # distinct per-frame red level
    media = spark.createDataFrame(
        [
            ("vid1", codecs.encode_rawv(f1, fps=2)),
            ("bad", b"mp4 payload needing ffmpeg"),
        ],
        "media_id string, content binary",
    )
    out = sample_video_frames(media, every_n=3).collect()
    by_idx = {r.frame_idx: r for r in out if r.media_id == "vid1"}
    assert sorted(by_idx) == [0, 3, 6]
    assert by_idx[3].ts_s == 1.5 and by_idx[3].width == 4
    # frames round-trip: PNG re-encode preserves exact pixels
    px = codecs.decode_png(bytes(by_idx[6].frame_png))
    assert (px[:, :, 0] == 180).all()
    # the entropy-coded payload is gated out, not a task failure
    assert not [r for r in out if r.media_id == "bad"]


def test_sample_video_frames_truncated_payload_keeps_existing_frames(spark):
    import numpy as np
    from product_etl_spark.functions import codecs
    from product_etl_spark.operators.multimodal import sample_video_frames

    frames = np.full((6, 2, 2, 3), 9, dtype=np.uint8)
    data = codecs.encode_rawv(frames, fps=1)
    # cut mid-frame-2: frames 0-1 intact, 2 partial, 3-5 missing
    truncated = data[: len(data) - 3 * 2 * 2 * 3 - 2]
    media = spark.createDataFrame(
        [("trunc", truncated)], "media_id string, content binary"
    )
    out = sample_video_frames(media, every_n=1).collect()
    # header claims 6 frames; only the intact prefix decodes, task survives
    assert [r.frame_idx for r in sorted(out, key=lambda r: r.frame_idx)] == [0, 1]


def test_resize_bilinear_exact_on_linear_gradient():
    """Bilinear interpolation of a linear ramp reproduces the ramp:
    upscaling a float gradient gives exactly the linear values at the
    sampled center coordinates (interior points)."""
    h, w = 8, 8
    y, x = np.mgrid[0:h, 0:w]
    px = x.astype(np.float64)  # value == column index
    out = codecs.resize_bilinear(px, 16, 16)
    # output column j samples source coordinate (j+0.5)*w/16 - 0.5
    sx = np.clip((np.arange(16) + 0.5) * w / 16 - 0.5, 0, w - 1)
    assert np.allclose(out[4], sx)
    # shape + dtype preservation on uint8 3-channel
    rgb = _gradient(10, 12)
    out8 = codecs.resize_bilinear(rgb, 24, 20)
    assert out8.shape == (20, 24, 3) and out8.dtype == np.uint8


def test_resize_bilinear_constant_and_identity():
    const = np.full((5, 7, 3), 123, dtype=np.uint8)
    assert np.array_equal(
        codecs.resize_bilinear(const, 14, 10), np.full((10, 14, 3), 123, np.uint8)
    )
    px = _gradient(9, 9)
    assert np.array_equal(codecs.resize_bilinear(px, 9, 9), px)


def test_wav_samples_mono_downmix_and_rate():
    t = np.arange(8000) / 8000.0
    left = np.sin(2 * np.pi * 440 * t)
    stereo = np.stack([left, -left], axis=1).reshape(-1)
    data = codecs.encode_wav(stereo, 8000, n_channels=2)
    rate, mono = codecs.wav_samples(data)
    assert rate == 8000 and mono.size == 8000
    # L and R cancel -> silence after downmix
    assert np.abs(mono).max() < 1e-3


def test_spark_audio_spectral_features(spark):
    """A pure 1 kHz sine: spectral centroid ~ 1 kHz, rolloff ~ 1 kHz,
    band energy concentrated in the band containing 1 kHz, ZCR ~
    2*f/rate. A corrupt payload yields a null-feature row."""
    from product_etl_spark.operators.multimodal import extract_audio_spectral

    rate, f = 8000, 1000.0
    t = np.arange(rate) / rate
    wav = codecs.encode_wav(0.5 * np.sin(2 * np.pi * f * t), rate)
    media = spark.createDataFrame(
        [("s1", wav), ("bad", b"notawav")], "media_id string, content binary"
    )
    rows = {r["media_id"]: r for r in extract_audio_spectral(media, n_bands=8).collect()}
    s = rows["s1"]
    assert abs(s["spectral_centroid_hz"] - f) < 30
    assert abs(s["rolloff_hz"] - f) < 30
    assert abs(s["zcr"] - 2 * f / rate) < 0.02
    band = s["band_energy"]
    assert len(band) == 8
    assert band[2] > 0.95  # 1 kHz falls in [1000, 1500) of 8 bands to 4 kHz
    assert abs(sum(band) - 1.0) < 1e-6
    assert rows["bad"]["spectral_centroid_hz"] is None


def test_spark_resize_bilinear_stage(spark):
    from pyspark.sql import functions as F
    from product_etl_spark.operators.multimodal import (
        extract_image_features,
        real_image_decode,
        resize_images,
    )

    media = spark.createDataFrame(
        [("m1", "mem://a", "image/png", codecs.encode_png(_gradient(32, 48)))],
        "media_id string, uri string, media_type string, content binary",
    )
    out = resize_images(media, 12, 10, method="bilinear")
    feats = extract_image_features(out, real_image_decode).collect()[0]
    assert feats["width"] == 12 and feats["height"] == 10
    with pytest.raises(ValueError):
        resize_images(media, 4, 4, method="bicubic")


def test_spark_audio_spectral_nyquist_band(spark):
    """A tone AT Nyquist (rate/2) with an even sample count: its rfft
    bin frequency equals rate/2 exactly and must land in the LAST
    band (index binning), not fall out of every half-open interval."""
    from product_etl_spark.operators.multimodal import extract_audio_spectral

    rate = 8000
    t = np.arange(rate)
    nyq = 0.5 * np.cos(np.pi * t)  # alternating +/-: pure rate/2 tone
    media = spark.createDataFrame(
        [("n1", codecs.encode_wav(nyq, rate))], "media_id string, content binary"
    )
    s = extract_audio_spectral(media, n_bands=4).collect()[0]
    assert abs(sum(s["band_energy"]) - 1.0) < 1e-6
    assert s["band_energy"][3] > 0.95
