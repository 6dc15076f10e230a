"""Pure-stdlib media codecs for the multimodal stages.

This container has no PIL/opencv/ffmpeg, but several real formats are
decodable with nothing beyond the standard library + numpy:

- **PNG**: zlib (stdlib) inflate + per-scanline filter reconstruction
  (None/Sub/Up/Average/Paeth, RFC 2083 §6), 8-bit gray / gray+alpha /
  RGB / RGBA / palette;
- **BMP**: BITMAPINFOHEADER uncompressed 24/32-bit;
- **PPM**: P6 binary;
- **WAV**: stdlib ``wave`` for PCM (rate/channels/duration + RMS).

- **JPEG**: baseline sequential DCT (``functions/jpeg.py`` — Annex K
  tables, canonical Huffman, any chroma subsampling, DRI/RSTn), both
  encode and decode, validated against OpenJDK ImageIO in both
  directions.

So the multimodal decode is REAL for these formats; only
entropy-coded formats that genuinely need a codec library
(progressive/arithmetic JPEG, h264/mp4 video) stay behind a
clearly-marked ``NotImplementedError``
(reference scope: the image pipeline at
utils/product_collection_img_array_processor.py:55-68 moves bytes, it
never decodes — decoding here is training-data-pipeline surface, not
reference parity).

Everything returns numpy arrays (H, W, C) uint8 so the feature /
resize / hash stages compose; all pure functions, safe inside
Arrow-batched ``mapInPandas`` kernels.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

# color type -> raw channels per pixel (palette expands to 3 later)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def sniff_media_type(data: bytes) -> str:
    """Magic-byte detection for the dispatcher."""
    if data[:8] == _PNG_MAGIC:
        return "image/png"
    if data[:2] == b"BM":
        return "image/bmp"
    if data[:2] == b"P6":
        return "image/ppm"
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "audio/wav"
    if data[:3] == b"\xff\xd8\xff":
        return "image/jpeg"
    return "application/octet-stream"


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> np.ndarray:
    """PNG -> (H, W, C) uint8. Supports bit depth 8, color types
    0/2/3/4/6, no interlace (Adam7 raises)."""
    if data[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG")
    pos, idat, plte = 8, [], None
    width = height = color_type = None
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # len + type + crc
        if ctype == b"IHDR":
            width, height, depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
            if depth != 8:
                raise NotImplementedError(f"PNG bit depth {depth} (only 8)")
            if interlace:
                raise NotImplementedError("Adam7 interlaced PNG")
            if color_type not in _PNG_CHANNELS:
                raise NotImplementedError(f"PNG color type {color_type}")
        elif ctype == b"PLTE":
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
    raw = zlib.decompress(b"".join(idat))
    ch = _PNG_CHANNELS[color_type]
    stride = width * ch
    out = np.empty((height, stride), dtype=np.uint8)
    prior = np.zeros(stride, dtype=np.uint8)
    pos = 0
    for y in range(height):
        ftype = raw[pos]
        line = np.frombuffer(raw[pos + 1 : pos + 1 + stride], dtype=np.uint8)
        pos += 1 + stride
        if ftype == 0:
            recon = line.copy()
        elif ftype == 2:  # Up — vectorizable
            recon = line + prior
        else:  # Sub / Average / Paeth need the running reconstruction
            recon = np.empty(stride, dtype=np.uint8)
            for x in range(stride):
                left = int(recon[x - ch]) if x >= ch else 0
                up = int(prior[x])
                ul = int(prior[x - ch]) if x >= ch else 0
                if ftype == 1:
                    pred = left
                elif ftype == 3:
                    pred = (left + up) // 2
                elif ftype == 4:
                    pred = _paeth(left, up, ul)
                else:
                    raise ValueError(f"PNG filter {ftype}")
                recon[x] = (int(line[x]) + pred) & 0xFF
        out[y] = recon
        prior = recon
    px = out.reshape(height, width, ch)
    if color_type == 3:
        if plte is None:
            raise ValueError("palette PNG without PLTE")
        px = plte[px[:, :, 0]]
    return px


def encode_png(px: np.ndarray) -> bytes:
    """Minimal PNG writer (filter 0, one IDAT) — fixture/sink side of
    the codec; round-trips with decode_png."""
    px = np.ascontiguousarray(px, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, ch = px.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    scanlines = b"".join(b"\x00" + px[y].tobytes() for y in range(h))
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(scanlines))
        + chunk(b"IEND", b"")
    )


def decode_bmp(data: bytes) -> np.ndarray:
    """Uncompressed 24/32-bit BMP -> (H, W, 3|4) uint8 (BGR->RGB,
    bottom-up honored)."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    (offset,) = struct.unpack_from("<I", data, 10)
    (hdr_size,) = struct.unpack_from("<I", data, 14)
    if hdr_size < 40:
        raise NotImplementedError("BITMAPCOREHEADER BMP")
    width, height = struct.unpack_from("<ii", data, 18)
    (bpp,) = struct.unpack_from("<H", data, 28)
    (compression,) = struct.unpack_from("<I", data, 30)
    if compression != 0 or bpp not in (24, 32):
        raise NotImplementedError(f"BMP bpp={bpp} compression={compression}")
    ch = bpp // 8
    flipped = height > 0
    height = abs(height)
    row_size = (width * ch + 3) & ~3  # rows pad to 4 bytes
    px = np.zeros((height, width, ch), dtype=np.uint8)
    for y in range(height):
        row = np.frombuffer(
            data, dtype=np.uint8, count=width * ch, offset=offset + y * row_size
        ).reshape(width, ch)
        px[height - 1 - y if flipped else y] = row
    bgr = px[:, :, :3][:, :, ::-1]  # BGR(A) -> RGB
    return np.concatenate([bgr, px[:, :, 3:]], axis=2) if ch == 4 else bgr


def decode_ppm(data: bytes) -> np.ndarray:
    """Binary P6 PPM -> (H, W, 3) uint8."""
    if data[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    fields: list[int] = []
    pos = 2
    while len(fields) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":  # comment to EOL
            while data[pos : pos + 1] not in (b"\n", b""):
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(data[start:pos]))
    pos += 1  # single whitespace after maxval
    width, height, maxval = fields
    if maxval > 255:
        raise NotImplementedError("16-bit PPM")
    return (
        np.frombuffer(data, dtype=np.uint8, count=width * height * 3, offset=pos)
        .reshape(height, width, 3)
        .copy()
    )


def decode_image(data: bytes) -> np.ndarray:
    """Dispatch on magic bytes; formats needing a real codec library
    raise NotImplementedError with the format named."""
    kind = sniff_media_type(data)
    if kind == "image/png":
        return decode_png(data)
    if kind == "image/bmp":
        return decode_bmp(data)
    if kind == "image/ppm":
        return decode_ppm(data)
    if kind == "image/jpeg":
        from product_etl_spark.functions.jpeg import decode_jpeg

        return decode_jpeg(data)
    raise NotImplementedError(
        f"decoding {kind} requires a codec library (PIL/opencv) not "
        "present in this environment"
    )


def to_gray(px: np.ndarray) -> np.ndarray:
    """(H, W, C) -> (H, W) float luma (Rec. 601 for color)."""
    if px.ndim == 2:
        return px.astype(np.float64)
    if px.shape[2] == 1:
        return px[:, :, 0].astype(np.float64)
    rgb = px[:, :, :3].astype(np.float64)
    return rgb @ np.array([0.299, 0.587, 0.114])


def resize_nearest(px: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Deterministic nearest-neighbor resize via index mapping."""
    h, w = px.shape[:2]
    ys = (np.arange(out_h) * h) // out_h
    xs = (np.arange(out_w) * w) // out_w
    return px[ys][:, xs]


def resize_bilinear(px: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Bilinear resize via vectorized index/weight maps (align-corners
    =False, the OpenCV/PIL convention: sample at pixel centers). Exact
    on linear gradients — asserted in tests/test_codecs.py. Output
    dtype matches input (uint8 rounds half away from zero)."""
    h, w = px.shape[:2]
    # source center coordinate for each output pixel
    sy = np.clip((np.arange(out_h) + 0.5) * h / out_h - 0.5, 0, h - 1)
    sx = np.clip((np.arange(out_w) + 0.5) * w / out_w - 0.5, 0, w - 1)
    y0 = np.floor(sy).astype(int)
    x0 = np.floor(sx).astype(int)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = (sy - y0)[:, None]
    wx = (sx - x0)[None, :]
    if px.ndim == 3:
        wy = wy[..., None]
        wx = wx[..., None]
    p = px.astype(np.float64)
    top = p[y0][:, x0] * (1 - wx) + p[y0][:, x1] * wx
    bot = p[y1][:, x0] * (1 - wx) + p[y1][:, x1] * wx
    out = top * (1 - wy) + bot * wy
    if np.issubdtype(px.dtype, np.integer):
        info = np.iinfo(px.dtype)
        return np.clip(np.rint(out), info.min, info.max).astype(px.dtype)
    return out.astype(px.dtype)


def wav_samples(data: bytes) -> tuple[int, np.ndarray]:
    """WAV (PCM) -> (sample_rate, mono float64 samples in [-1, 1]).
    Channels are averaged to mono. The raw-signal companion to
    ``decode_wav``'s summary stats, feeding spectral analysis."""
    with wave.open(io.BytesIO(data)) as w:
        rate, nch, sampwidth = w.getframerate(), w.getnchannels(), w.getsampwidth()
        raw = w.readframes(w.getnframes())
    if sampwidth == 2:
        samples = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif sampwidth == 1:
        samples = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128) / 128.0
    else:
        raise NotImplementedError(f"WAV sample width {sampwidth}")
    if nch > 1:
        samples = samples.reshape(-1, nch).mean(axis=1)
    return rate, samples


def phash_dct(px: np.ndarray, hash_size: int = 8, highfreq_factor: int = 4) -> str:
    """DCT perceptual hash (the classic pHash recipe): gray ->
    (hash_size*highfreq_factor)² bilinear downsample -> 2-D
    orthonormal DCT-II -> keep the top-left hash_size² low-frequency
    block -> threshold each coefficient at the block median -> hex
    (16 chars / 64 bits at the defaults).

    More robust than ``average_hash`` to global brightness/contrast
    shifts (those concentrate in the DC coefficient; the median
    threshold over the low block barely moves) and to re-encoding
    noise (high frequencies are discarded before thresholding). The
    DCT is two small matrix multiplies (numpy, no scipy)."""
    n = hash_size * highfreq_factor
    g = to_gray(resize_bilinear(px, n, n)).astype(np.float64)
    k = np.arange(n)
    basis = np.sqrt(2.0 / n) * np.cos(
        np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * n)
    )
    basis[0] /= np.sqrt(2.0)
    low = (basis @ g @ basis.T)[:hash_size, :hash_size].flatten()
    bits = low > np.median(low)
    val = 0
    for b in bits:
        val = (val << 1) | int(b)
    return format(val, f"0{hash_size * hash_size // 4}x")


def average_hash(px: np.ndarray, hash_size: int = 8) -> str:
    """Real perceptual average-hash: gray -> hash_size² downsample ->
    threshold at the mean -> hex (16 chars for the 64-bit default)."""
    g = to_gray(resize_nearest(px, hash_size, hash_size))
    bits = (g > g.mean()).flatten()
    val = 0
    for b in bits:
        val = (val << 1) | int(b)
    return format(val, f"0{hash_size * hash_size // 4}x")


def decode_wav(data: bytes) -> dict:
    """WAV (PCM) -> rate/channels/frames/duration + RMS per the
    stdlib ``wave`` reader; 16-bit and 8-bit PCM supported."""
    with wave.open(io.BytesIO(data)) as w:
        rate, nch, sampwidth = w.getframerate(), w.getnchannels(), w.getsampwidth()
        n_frames = w.getnframes()
        raw = w.readframes(n_frames)
    if sampwidth == 2:
        samples = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif sampwidth == 1:
        samples = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128) / 128.0
    else:
        raise NotImplementedError(f"WAV sample width {sampwidth}")
    rms = float(np.sqrt(np.mean(samples**2))) if samples.size else 0.0
    return {
        "sample_rate": rate,
        "n_channels": nch,
        "n_frames": n_frames,
        "duration_s": n_frames / rate if rate else 0.0,
        "rms": rms,
    }


def encode_wav(
    samples: np.ndarray, sample_rate: int = 16_000, n_channels: int = 1
) -> bytes:
    """float[-1,1] -> 16-bit PCM WAV bytes (fixture/sink side)."""
    pcm = (np.clip(samples, -1.0, 1.0) * 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_channels)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


# --------------------------------------------------------------------------
# RAWV: a trivial uncompressed video container (the video analogue of
# PPM) so frame sampling runs with REAL decode in a stdlib-only
# environment. Layout: b"RAWV" + <HHHH little-endian: width, height,
# fps, n_frames> + n_frames raw RGB24 frames. Entropy-coded video
# (mp4/h264/vp9) needs ffmpeg/opencv and stays behind the same
# NotImplementedError gate as JPEG.

RAWV_MAGIC = b"RAWV"
_RAWV_HDR = struct.Struct("<4sHHHH")


def encode_rawv(frames: np.ndarray, fps: int = 25) -> bytes:
    """(n, h, w, 3) uint8 -> RAWV bytes (fixture/sink side)."""
    n, h, w, c = frames.shape
    if c != 3:
        raise ValueError("RAWV frames must be RGB24")
    return _RAWV_HDR.pack(RAWV_MAGIC, w, h, fps, n) + frames.astype(
        np.uint8
    ).tobytes()


def rawv_info(data: bytes) -> dict:
    """Header-only read: (width, height, fps, n_frames)."""
    magic, w, h, fps, n = _RAWV_HDR.unpack_from(data, 0)
    if magic != RAWV_MAGIC:
        raise NotImplementedError(
            "not a RAWV payload — entropy-coded video needs an ffmpeg/"
            "opencv kernel injected at the decode seam"
        )
    return {"width": w, "height": h, "fps": fps, "n_frames": n}


def decode_rawv_frame(data: bytes, idx: int) -> np.ndarray:
    """Random-access single-frame decode: seek straight to frame
    ``idx`` (no full-video materialization — the property that keeps
    per-frame memory flat however long the clip is)."""
    info = rawv_info(data)
    w, h, n = info["width"], info["height"], info["n_frames"]
    if not 0 <= idx < n:
        raise IndexError(f"frame {idx} out of range 0..{n - 1}")
    frame_bytes = w * h * 3
    off = _RAWV_HDR.size + idx * frame_bytes
    if off + frame_bytes > len(data):
        raise ValueError(
            f"truncated RAWV payload: frame {idx} needs bytes "
            f"[{off}, {off + frame_bytes}) but payload has {len(data)}"
        )
    return (
        np.frombuffer(data[off : off + frame_bytes], dtype=np.uint8)
        .reshape(h, w, 3)
        .copy()
    )
