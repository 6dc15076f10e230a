"""Baseline JPEG codec (functions/jpeg.py): round-trips, third-party
interop (a committed OpenJDK-ImageIO-encoded fixture with 4:2:0
subsampling), honest gates for progressive, and the decode_image
dispatch."""

from __future__ import annotations

import os

import numpy as np
import pytest

from product_etl_spark.functions import codecs
from product_etl_spark.functions.jpeg import decode_jpeg, encode_jpeg

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def _gradient(h, w):
    x = np.linspace(0, 255, w)[None, :].repeat(h, axis=0)
    y = np.linspace(0, 255, h)[:, None].repeat(w, axis=1)
    return np.stack([x, y, 255 - (x + y) / 2], axis=-1).astype(np.uint8)


def _psnr(a, b):
    mse = np.mean((a.astype(float) - b.astype(float)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse)


def test_color_round_trip_high_quality():
    img = _gradient(40, 56)
    data = encode_jpeg(img, quality=90)
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    dec = decode_jpeg(data)
    assert dec.shape == img.shape
    assert _psnr(dec, img) > 40


def test_gray_round_trip_and_odd_dimensions():
    h, w = 17, 23  # non-multiple-of-8: exercises edge padding
    g = _gradient(h, w)[:, :, 0]
    dec = decode_jpeg(encode_jpeg(g, quality=90))
    assert dec.shape == (h, w, 1)
    assert _psnr(dec[:, :, 0], g) > 35


def test_quality_degrades_monotonically():
    img = _gradient(32, 32)
    p90 = _psnr(decode_jpeg(encode_jpeg(img, quality=90)), img)
    p20 = _psnr(decode_jpeg(encode_jpeg(img, quality=20)), img)
    assert p90 > p20
    assert len(encode_jpeg(img, quality=90)) > len(encode_jpeg(img, quality=20))


def test_decodes_openjdk_imageio_fixture_with_subsampling():
    """The fixture was produced by OpenJDK ImageIO (a third-party
    encoder that emits 4:2:0 chroma subsampling) from the same
    gradient formula — real-world-encoder interop, not just our own
    round-trip."""
    data = open(os.path.join(FIXTURES,
                             "imageio_gradient_48x64_q90.jpg"), "rb").read()
    dec = decode_jpeg(data)
    assert dec.shape == (48, 64, 3)
    assert _psnr(dec, _gradient(48, 64)) > 35


def test_progressive_raises_named_gate():
    data = bytearray(encode_jpeg(_gradient(16, 16)))
    idx = data.find(b"\xff\xc0")
    data[idx + 1] = 0xC2  # rewrite SOF0 -> SOF2 (progressive)
    with pytest.raises(NotImplementedError, match="progressive"):
        decode_jpeg(bytes(data))


def test_decode_image_dispatches_jpeg():
    img = _gradient(24, 24)
    data = encode_jpeg(img, quality=85)
    assert codecs.sniff_media_type(data) == "image/jpeg"
    px = codecs.decode_image(data)
    assert px.shape == (24, 24, 3)
    # feature stages compose on top
    assert len(codecs.average_hash(px)) == 16
