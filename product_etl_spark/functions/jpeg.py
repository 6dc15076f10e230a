"""Baseline JPEG (ITU-T T.81, JFIF) codec — stdlib + numpy only.

Un-gates the last entropy-coded image format in the multimodal
pipeline: baseline sequential DCT with Huffman coding, the format
>99% of real-world .jpg files use. Everything here is from the public
spec: Annex K quantization/Huffman tables, the IJG quality scaling,
canonical Huffman code construction from (lengths, symbols), the
zigzag order, and the orthonormal 8x8 DCT pair.

Encoder: 4:4:4 (no subsampling — simplest valid JFIF), standard
tables scaled by quality, DC differential + AC run-length/EOB/ZRL,
0xFF byte stuffing. Decoder: baseline SOF0, 1-3 components, ANY
h/v subsampling factors (nearest-neighbor chroma upsample), DRI/RSTn
restart intervals, grayscale and YCbCr.

Progressive (SOF2) and arithmetic coding remain out of scope and
raise with the format named. Pure functions over bytes/ndarrays —
safe inside Arrow-batched mapInPandas kernels.
"""

from __future__ import annotations

import struct

import numpy as np

# Annex K.1/K.2 quantization tables (luminance, chrominance), natural order
_QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32).reshape(8, 8)
_QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32).reshape(8, 8)

# Annex K.3-K.6 Huffman specs: (bits[1..16], huffval)
_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
            list(range(12)))
_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
              list(range(12)))
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
     0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
     0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
     0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
     0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
     0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)

_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])

# orthonormal 8x8 DCT matrix
_T = np.zeros((8, 8))
_T[0, :] = 1.0 / np.sqrt(8.0)
for _i in range(1, 8):
    for _j in range(8):
        _T[_i, _j] = 0.5 * np.cos((2 * _j + 1) * _i * np.pi / 16.0)


def _scale_qt(qt: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling: 50 = tables as-is."""
    quality = min(100, max(1, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    out = (qt * s + 50) // 100
    return np.clip(out, 1, 255).astype(np.int32)


def _canonical_codes(bits, huffval):
    """(length, code) per symbol from the T.81 canonical recipe."""
    codes, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[huffval[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return codes


def _magnitude(v: int) -> tuple[int, int]:
    """(category, bits) for a DC diff / AC coefficient (T.81 F.1.2)."""
    if v == 0:
        return 0, 0
    a = abs(v)
    cat = a.bit_length()
    bits = v if v > 0 else v + (1 << cat) - 1
    return cat, bits


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, length: int, value: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc, self.n = 0, 0

    def flush(self) -> None:
        while self.n:
            self.write(1, 1)  # pad with 1s per spec


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    px = px.astype(np.float64)
    r, g, b = px[..., 0], px[..., 1], px[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def encode_jpeg(px: np.ndarray, quality: int = 75) -> bytes:
    """Encode (H,W,3) RGB or (H,W)/(H,W,1) gray uint8 as baseline
    JFIF (4:4:4, standard tables scaled by ``quality``)."""
    if px.ndim == 2:
        px = px[:, :, None]
    gray = px.shape[2] == 1
    h, w = px.shape[:2]
    planes = (
        [px[:, :, 0].astype(np.float64)]
        if gray
        else list(np.moveaxis(_rgb_to_ycbcr(px[:, :, :3]), -1, 0))
    )
    qts = [_scale_qt(_QT_LUMA, quality)] + (
        [] if gray else [_scale_qt(_QT_CHROMA, quality)]
    )
    n_comp = 1 if gray else 3

    out = bytearray(b"\xFF\xD8")  # SOI
    out += b"\xFF\xE0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HH", 1, 1) + b"\x00\x00"
    for tq, qt in enumerate(qts):
        out += b"\xFF\xDB" + struct.pack(">H", 67) + bytes([tq]) \
            + bytes(int(qt.flat[z]) for z in _ZIGZAG)
    # SOF0
    sof = struct.pack(">BHHB", 8, h, w, n_comp)
    for c in range(n_comp):
        sof += bytes([c + 1, 0x11, 0 if c == 0 else 1])
    out += b"\xFF\xC0" + struct.pack(">H", 2 + len(sof)) + sof
    # DHT
    specs = [(0x00, _DC_LUMA), (0x10, _AC_LUMA)] + (
        [] if gray else [(0x01, _DC_CHROMA), (0x11, _AC_CHROMA)]
    )
    for tc_th, (bits, vals) in specs:
        seg = bytes([tc_th]) + bytes(bits) + bytes(vals)
        out += b"\xFF\xC4" + struct.pack(">H", 2 + len(seg)) + seg
    # SOS
    sos = bytes([n_comp])
    for c in range(n_comp):
        sos += bytes([c + 1, 0x00 if c == 0 else 0x11])
    sos += b"\x00\x3F\x00"
    out += b"\xFF\xDA" + struct.pack(">H", 2 + len(sos)) + sos

    dc_codes = [_canonical_codes(*_DC_LUMA)] + (
        [] if gray else [_canonical_codes(*_DC_CHROMA)] * 2
    )
    ac_codes = [_canonical_codes(*_AC_LUMA)] + (
        [] if gray else [_canonical_codes(*_AC_CHROMA)] * 2
    )
    if not gray:
        dc_codes = [dc_codes[0], dc_codes[1], dc_codes[1]]
        ac_codes = [ac_codes[0], ac_codes[1], ac_codes[1]]

    bw = _BitWriter()
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = [
        np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge") for p in planes
    ]
    pred = [0] * n_comp
    for by in range(ph // 8):
        for bx in range(pw // 8):
            for c in range(n_comp):
                qt = qts[0 if c == 0 else 1]
                block = padded[c][by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] - 128.0
                coef = _T @ block @ _T.T
                q = np.round(coef / qt).astype(np.int32)
                zz = q.flat[_ZIGZAG]
                diff = int(zz[0]) - pred[c]
                pred[c] = int(zz[0])
                cat, bits_v = _magnitude(diff)
                ln, code = dc_codes[c][cat]
                bw.write(ln, code)
                if cat:
                    bw.write(cat, bits_v)
                run = 0
                last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
                for k in range(1, 64):
                    v = int(zz[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        ln, code = ac_codes[c][0xF0]  # ZRL
                        bw.write(ln, code)
                        run -= 16
                    cat, bits_v = _magnitude(v)
                    ln, code = ac_codes[c][(run << 4) | cat]
                    bw.write(ln, code)
                    bw.write(cat, bits_v)
                    run = 0
                if last_nz < 63:
                    ln, code = ac_codes[c][0x00]  # EOB
                    bw.write(ln, code)
    bw.flush()
    out += bw.out
    out += b"\xFF\xD9"  # EOI
    return bytes(out)


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def _next_byte(self) -> int:
        while True:
            if self.pos >= len(self.data):
                raise EOFError("truncated JPEG entropy stream")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else 0
                if nxt == 0x00:
                    self.pos += 1  # stuffed data byte
                    return 0xFF
                if nxt == 0xFF:
                    continue  # fill byte (T.81 B.1.1.2): keep scanning
                self.pos += 1  # CONSUME the marker byte too
                raise _RestartMarker(nxt)
            return b

    def expect_restart(self) -> int:
        """Consume an aligned RSTn marker (skipping fill bytes);
        returns the marker. Raises ValueError if something else is
        next — callers only ask at restart-interval boundaries."""
        self.align()
        try:
            self._next_byte()
        except _RestartMarker as rm:
            if 0xD0 <= rm.marker <= 0xD7:
                return rm.marker
            raise ValueError(
                f"expected RSTn at restart boundary, got 0x{rm.marker:02X}"
            ) from None
        raise ValueError("expected RSTn marker, found entropy data")

    def bit(self) -> int:
        if self.n == 0:
            self.acc = self._next_byte()
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def align(self) -> None:
        self.n = 0


class _RestartMarker(Exception):
    def __init__(self, marker: int):
        self.marker = marker


def _receive_extend(br: _BitReader, cat: int) -> int:
    if cat == 0:
        return 0
    v = br.bits(cat)
    return v if v >= (1 << (cat - 1)) else v - (1 << cat) + 1


def _decode_symbol(br: _BitReader, table: dict) -> int:
    length, code = 0, 0
    for _ in range(16):
        code = (code << 1) | br.bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in JPEG stream")


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode baseline JFIF bytes to (H,W,3) RGB (or (H,W,1) gray)
    uint8. Supports SOF0, any h/v sampling factors, DRI/RSTn."""
    if data[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    comps = []  # (id, h, v, tq)
    h = w = 0
    restart_interval = 0
    scan_data = None
    scan_comps = []
    while pos < len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        if marker == 0xFF:  # fill byte (T.81 B.1.1.2)
            pos += 1
            continue
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        seg_len = struct.unpack(">H", data[pos:pos + 2])[0]
        seg = data[pos + 2:pos + seg_len]
        if marker == 0xDB:
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0xF
                i += 1
                if pq:
                    vals = np.frombuffer(seg[i:i + 128], dtype=">u2")
                    i += 128
                else:
                    vals = np.frombuffer(seg[i:i + 64], dtype=np.uint8)
                    i += 64
                qt = np.zeros(64, dtype=np.int32)
                qt[_ZIGZAG] = vals
                qts[tq] = qt.reshape(8, 8)
        elif marker == 0xC0 or marker == 0xC1:
            _prec, h, w, n_comp = struct.unpack(">BHHB", seg[:6])
            comps = []
            for c in range(n_comp):
                cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0xF, tq))
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF marker 0x{marker:02X} (progressive/arithmetic) "
                "— only baseline sequential is implemented"
            )
        elif marker == 0xC4:
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0xF
                bits = list(seg[i + 1:i + 17])
                nsym = sum(bits)
                vals = list(seg[i + 17:i + 17 + nsym])
                codes = _canonical_codes(bits, vals)
                huff[(tc, th)] = {(ln, code): s for s, (ln, code) in codes.items()}
                i += 17 + nsym
        elif marker == 0xDD:
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:
            ns = seg[0]
            scan_comps = []
            for c in range(ns):
                cs, tdta = seg[1 + 2 * c], seg[2 + 2 * c]
                scan_comps.append((cs, tdta >> 4, tdta & 0xF))
            scan_data = data[pos + seg_len:]
            break
        pos += seg_len
    if scan_data is None or not comps:
        raise ValueError("JPEG missing SOS/SOF")

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = {
        cid: np.zeros((mcuy * v * 8, mcux * hh * 8)) for cid, hh, v, _ in comps
    }
    comp_by_id = {cid: (hh, v, tq) for cid, hh, v, tq in comps}

    # validate table references BEFORE entropy decode: a scan that
    # names an undefined component / Huffman table / quant table is a
    # malformed file — raise a catchable codec ValueError, not a bare
    # KeyError deep in the MCU loop (kernels catch ValueError per row)
    for cs, td, ta in scan_comps:
        if cs not in comp_by_id:
            raise ValueError(f"JPEG scan references undefined component {cs}")
        if (0, td) not in huff or (1, ta) not in huff:
            raise ValueError(
                f"JPEG scan references missing Huffman table dc={td} ac={ta}"
            )
        if comp_by_id[cs][2] not in qts:
            raise ValueError(
                f"JPEG component {cs} references missing quant table "
                f"{comp_by_id[cs][2]}"
            )

    br = _BitReader(scan_data)
    pred = {cid: 0 for cid, *_ in comps}
    mcu = 0
    total_mcus = mcux * mcuy
    while mcu < total_mcus:
        try:
            my, mx = divmod(mcu, mcux)
            for cs, td, ta in scan_comps:
                hh, v, tq = comp_by_id[cs]
                for by in range(v):
                    for bx in range(hh):
                        cat = _decode_symbol(br, huff[(0, td)])
                        diff = _receive_extend(br, cat)
                        pred[cs] += diff
                        zz = np.zeros(64, dtype=np.int32)
                        zz[0] = pred[cs]
                        k = 1
                        while k < 64:
                            rs = _decode_symbol(br, huff[(1, ta)])
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                # corrupt run/size pair — surface a
                                # catchable codec error, not IndexError
                                raise ValueError(
                                    "JPEG AC run overflows block "
                                    f"(k={k})"
                                )
                            zz[k] = _receive_extend(br, s)
                            k += 1
                        block = np.zeros(64, dtype=np.float64)
                        block[_ZIGZAG] = zz * qts[tq].flat[_ZIGZAG]
                        px_block = _T.T @ block.reshape(8, 8) @ _T + 128.0
                        y0 = (my * v + by) * 8
                        x0 = (mx * hh + bx) * 8
                        planes[cs][y0:y0 + 8, x0:x0 + 8] = px_block
            mcu += 1
            if restart_interval and mcu % restart_interval == 0 \
                    and mcu < total_mcus:
                br.expect_restart()  # consumes BOTH marker bytes
                pred = {cid: 0 for cid, *_ in comps}
        except _RestartMarker:
            # a marker mid-MCU means corrupt/truncated entropy data
            # (EOI ends decode cleanly; anything else stops too)
            break
        except EOFError:
            break

    out_planes = []
    for cid, hh, v, _tq in comps:
        p = planes[cid]
        if hh != hmax or v != vmax:
            # nearest-neighbor upsample by INDEX MAPPING, not
            # np.repeat with integer division — repeat silently
            # misreconstructs legal non-divisible sampling-factor
            # combinations (e.g. 3x3 luma with 2x2 chroma). For
            # divisible factors rows[y] = y // (vmax//v), identical to
            # the repeat form.
            rows = (np.arange(p.shape[0] * vmax // v) * v) // vmax
            cols = (np.arange(p.shape[1] * hmax // hh) * hh) // hmax
            p = p[rows[:, None], cols]
        out_planes.append(p[:h, :w])
    if len(out_planes) == 1:
        y = np.clip(out_planes[0], 0, 255).astype(np.uint8)
        return y[:, :, None]
    if len(out_planes) != 3:
        raise NotImplementedError(
            f"JPEG with {len(out_planes)} components (CMYK/YCCK) — only "
            "grayscale and YCbCr are implemented"
        )
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)
