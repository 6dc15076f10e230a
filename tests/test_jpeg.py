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


def test_restart_intervals_decode_correctly():
    """DRI/RSTn path: craft a stream with restart interval 1 by
    re-encoding with markers inserted — a left-half/right-half image
    whose halves must BOTH survive (the pre-fix bug zeroed everything
    after the first RST)."""
    import struct

    from product_etl_spark.functions import jpeg as J

    # two horizontally adjacent 8x8 blocks, distinct flat values
    img = np.zeros((8, 16), dtype=np.uint8)
    img[:, :8] = 50
    img[:, 8:] = 200
    base = J.encode_jpeg(img, quality=95)

    # rebuild the entropy stream with DRI=1: re-encode each MCU
    # independently (DC pred resets) and join with RST markers
    qt = J._scale_qt(J._QT_LUMA, 95)
    dc = J._canonical_codes(*J._DC_LUMA)
    ac = J._canonical_codes(*J._AC_LUMA)

    def mcu_bits(block):
        bw = J._BitWriter()
        coef = J._T @ (block - 128.0) @ J._T.T
        q = np.round(coef / qt).astype(int)
        zz = q.flat[J._ZIGZAG]
        cat, bits_v = J._magnitude(int(zz[0]))
        ln, code = dc[cat]
        bw.write(ln, code)
        if cat:
            bw.write(cat, bits_v)
        ln, code = ac[0x00]
        bw.write(ln, code)  # EOB (flat blocks: no AC)
        bw.flush()
        return bytes(bw.out)

    b0 = mcu_bits(img[:, :8].astype(float))
    b1 = mcu_bits(img[:, 8:].astype(float))
    sos_end = base.find(b"\xFF\xDA")
    sos_len = struct.unpack(">H", base[sos_end + 2:sos_end + 4])[0]
    header = bytearray(base[:sos_end])
    # inject DRI=1 before SOS
    header += b"\xFF\xDD" + struct.pack(">H", 4) + struct.pack(">H", 1)
    header += base[sos_end:sos_end + 2 + sos_len]
    data = bytes(header) + b0 + b"\xFF\xD0" + b1 + b"\xFF\xD9"

    dec = J.decode_jpeg(data)
    assert abs(float(dec[:, :8].mean()) - 50) < 3
    assert abs(float(dec[:, 8:].mean()) - 200) < 3


def test_fill_bytes_before_marker_are_skipped():
    from product_etl_spark.functions.jpeg import decode_jpeg, encode_jpeg

    img = _gradient(16, 16)
    data = bytearray(encode_jpeg(img, quality=90))
    idx = data.find(b"\xff\xc4")  # first DHT
    data[idx:idx] = b"\xff"  # one legal fill byte before the marker
    dec = decode_jpeg(bytes(data))
    assert _psnr(dec, img) > 40


def test_four_component_jpeg_gates_cleanly():
    import struct

    from product_etl_spark.functions.jpeg import decode_jpeg, encode_jpeg

    data = bytearray(encode_jpeg(_gradient(8, 8), quality=90))
    # rewrite SOF0 to claim 4 components (Adobe CMYK shape); the
    # decoder must name the gate, not crash unpacking
    idx = data.find(b"\xff\xc0")
    ln = struct.unpack(">H", data[idx + 2:idx + 4])[0]
    seg = data[idx + 4:idx + 2 + ln]
    seg = bytes(seg[:5]) + b"\x04" + bytes(seg[6:]) + b"\x04\x11\x01"
    data[idx + 2:idx + 2 + ln] = struct.pack(">H", len(seg) + 2) + seg
    with pytest.raises((NotImplementedError, ValueError, KeyError, EOFError)):
        decode_jpeg(bytes(data))


def test_ac_run_overflow_raises_codec_error():
    """A corrupt run/size stream that drives k past 63 must raise a
    catchable ValueError, not IndexError (ADVICE r4)."""
    import struct

    import pytest

    from product_etl_spark.functions import jpeg as J

    base = J.encode_jpeg(np.full((8, 8), 128, dtype=np.uint8), quality=90)
    sos_end = base.find(b"\xFF\xDA")
    sos_len = struct.unpack(">H", base[sos_end + 2:sos_end + 4])[0]
    header = base[:sos_end + 2 + sos_len]

    dc = J._canonical_codes(*J._DC_LUMA)
    ac = J._canonical_codes(*J._AC_LUMA)
    bw = J._BitWriter()
    ln, code = dc[0]
    bw.write(ln, code)  # DC cat 0
    for _ in range(4):  # each 0xF1: run 15 + size 1 -> k = 1+16n -> 65
        ln, code = ac[0xF1]
        bw.write(ln, code)
        bw.write(1, 1)
    bw.flush()

    with pytest.raises(ValueError, match="AC run overflows block"):
        J.decode_jpeg(header + bytes(bw.out) + b"\xFF\xD9")


def test_missing_huffman_table_raises_codec_error():
    """A scan referencing an undefined DHT raises ValueError before
    entropy decode, not KeyError mid-MCU (ADVICE r4)."""
    import struct

    import pytest

    from product_etl_spark.functions import jpeg as J

    base = J.encode_jpeg(np.full((8, 8), 90, dtype=np.uint8), quality=90)
    # strip every DHT segment
    data = bytearray()
    pos = 0
    while pos < len(base):
        if base[pos:pos + 2] == b"\xFF\xC4":
            seg_len = struct.unpack(">H", base[pos + 2:pos + 4])[0]
            pos += 2 + seg_len
            continue
        data.append(base[pos])
        pos += 1
    with pytest.raises(ValueError, match="missing Huffman table"):
        J.decode_jpeg(bytes(data))


def test_non_divisible_sampling_factors_upsample():
    """Legal but non-divisible h/v combinations (3x1 luma with 2x1
    chroma) must reconstruct via index-mapped nearest-neighbor — the
    old integer-division np.repeat produced a 16px-wide chroma plane
    for a 24px image (shape mismatch / silent misreconstruction)."""
    import struct

    from product_etl_spark.functions import jpeg as J

    h, w = 8, 24
    out = bytearray(b"\xFF\xD8")
    qt = J._scale_qt(J._QT_LUMA, 90)
    out += b"\xFF\xDB" + struct.pack(">H", 67) + bytes([0]) \
        + bytes(int(qt.flat[z]) for z in J._ZIGZAG)
    # SOF0: comp1 h=3 v=1, comp2 h=2 v=1, comp3 h=2 v=1, all qt 0
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for cid, hv in ((1, 0x31), (2, 0x21), (3, 0x21)):
        sof += bytes([cid, hv, 0])
    out += b"\xFF\xC0" + struct.pack(">H", 2 + len(sof)) + sof
    for tc_th, (bits, vals) in ((0x00, J._DC_LUMA), (0x10, J._AC_LUMA)):
        seg = bytes([tc_th]) + bytes(bits) + bytes(vals)
        out += b"\xFF\xC4" + struct.pack(">H", 2 + len(seg)) + seg
    sos = bytes([3])
    for cid in (1, 2, 3):
        sos += bytes([cid, 0x00])
    sos += b"\x00\x3F\x00"
    out += b"\xFF\xDA" + struct.pack(">H", 2 + len(sos)) + sos

    dc = J._canonical_codes(*J._DC_LUMA)
    ac = J._canonical_codes(*J._AC_LUMA)
    bw = J._BitWriter()
    for _ in range(3 + 2 + 2):  # one MCU: 3 luma + 2 cb + 2 cr blocks
        ln, code = dc[0]
        bw.write(ln, code)   # DC cat 0 (flat 128)
        ln, code = ac[0x00]
        bw.write(ln, code)   # EOB
    bw.flush()
    out += bytes(bw.out) + b"\xFF\xD9"

    dec = J.decode_jpeg(bytes(out))
    assert dec.shape == (8, 24, 3)
    # flat mid-gray everywhere (Y=128, Cb=Cr=128 -> RGB 128)
    assert abs(float(dec.mean()) - 128.0) < 2.0
