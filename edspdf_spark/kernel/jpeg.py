"""Baseline JPEG codec — pure stdlib + NumPy, no imaging library.

Why this exists: the multimodal decode stage
(``functions/multimodal.decode_image_pixels``) routed JPEG through an
import-gated PIL path — a declared stub in a sandbox without PIL. JPEG
is the dominant image codec of any web crawl, so the decode half of the
image-text pipeline (LAION-style pair harvest → pixel decode → dHash /
feature extraction) was only exercisable on PNG. This module implements
the baseline sequential DCT process of the public JPEG standard
(ITU-T T.81): enough to decode the overwhelming majority of crawl
JPEGs (baseline Huffman, grayscale or YCbCr, any sampling factors up
to 2×2, restart markers) and to encode deterministic fixtures for
round-trip tests.

Decoder scope (``decode_jpeg``): SOI / APPn / COM / DQT / DHT / DRI /
SOF0 / SOS / RSTn / EOI; 8-bit precision; 1 or 3 components; sampling
factors ∈ {1, 2}; 0xFF00 byte unstuffing. Progressive (SOF2),
arithmetic coding, 12-bit, and CMYK raise ``ValueError`` — the Arrow
decode stage treats that as a routing signal (codec tag + NULL pixels),
never a partition killer.

Encoder scope (``encode_jpeg``): baseline JFIF, 4:4:4 (no chroma
subsampling — keeps the fixture path simple and the loss source purely
the quantizer), standard Annex-K quantization tables scaled by the
libjpeg quality formula, standard Huffman tables, optional restart
interval (to exercise the decoder's RST path). The tables ride in the
file's own DQT/DHT segments, so round-trip correctness is
self-contained — the decoder reads tables from the stream, never from
this module's constants.

Performance note: Huffman (de)coding is a per-symbol Python loop — fine
for fixtures and the routing stage's poison-pill tests; the batch IDCT /
DCT run vectorized over all blocks (one ``einsum`` per plane). At crawl
scale a production deployment would swap this kernel for a native codec
behind the same Arrow stage; the Spark-side contract (schema, batching,
routing) is identical either way.
"""

from __future__ import annotations

import struct
from typing import Optional

import numpy as np

# --------------------------------------------------------------------------
# constants (ITU-T T.81 Annex K — carried in the stream, see module note)
# --------------------------------------------------------------------------

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

#: base luminance / chrominance quantization tables (quality 50)
QT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
QT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)

# standard Huffman tables: (bits[1..16], values)
_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0], list(range(12)))
_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0], list(range(12)))
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)


def _dct_basis() -> np.ndarray:
    """8×8 DCT-II basis C with C[u, x] = a(u)·cos((2x+1)uπ/16);
    block DCT = C @ b @ C.T, IDCT = C.T @ B @ C."""
    x = np.arange(8, dtype=np.float64)
    u = x[:, None]
    c = np.cos((2.0 * x[None, :] + 1.0) * u * np.pi / 16.0)
    c *= np.where(u == 0, np.sqrt(1.0 / 8.0), np.sqrt(2.0 / 8.0))
    return c


_C = _dct_basis()


# --------------------------------------------------------------------------
# canonical Huffman code assignment (T.81 Annex C)
# --------------------------------------------------------------------------


def _huff_codes(bits, values) -> dict:
    """symbol → (code, length) in canonical order."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _huff_lut(bits, values) -> dict:
    """(length, code) → symbol — decode-side lookup."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return out


# --------------------------------------------------------------------------
# encoder
# --------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)

    def flush(self) -> None:
        """Pad to a byte boundary with 1-bits (T.81 F.1.2.3)."""
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)


def _scaled_qt(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg quality scaling: 5000/q below 50, 200−2q at or above."""
    q = min(100, max(1, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    qt = (base * scale + 50) // 100
    return np.clip(qt, 1, 255)


def _magnitude(v: int):
    """(category, value-bits) per T.81 F.1.2.1/F.1.2.2."""
    if v == 0:
        return 0, 0
    a = abs(v)
    s = a.bit_length()
    bits = v if v > 0 else v + (1 << s) - 1
    return s, bits


def _encode_plane_blocks(
    plane: np.ndarray, qt: np.ndarray
) -> np.ndarray:
    """Level-shift → batch DCT → quantize → zigzag. plane is (H8, W8)
    float64 with H8, W8 multiples of 8; returns (n_blocks, 64) int32 in
    raster block order."""
    h8, w8 = plane.shape
    blocks = (
        plane.reshape(h8 // 8, 8, w8 // 8, 8).transpose(0, 2, 1, 3) - 128.0
    )
    coefs = np.einsum("ux,nmxy,vy->nmuv", _C, blocks, _C, optimize=True)
    q = np.round(coefs / qt.reshape(8, 8)).astype(np.int32)
    return q.reshape(-1, 64)[:, ZIGZAG]


def encode_jpeg(
    arr: np.ndarray, quality: int = 85, restart_interval: int = 0
) -> bytes:
    """uint8 (H, W) grayscale or (H, W, 3) RGB → baseline JFIF bytes
    (4:4:4, standard tables at ``quality``). ``restart_interval`` > 0
    emits DRI + RSTn markers every that many MCUs (exercises the
    decoder's restart path)."""
    a = np.asarray(arr)
    if a.dtype != np.uint8 or a.ndim not in (2, 3):
        raise ValueError("encode_jpeg needs a uint8 (H,W) or (H,W,3) array")
    if a.ndim == 3 and a.shape[2] != 3:
        raise ValueError(f"encode_jpeg supports 1 or 3 channels, got {a.shape[2]}")
    h, w = a.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    gray = a.ndim == 2

    # color transform (JFIF YCbCr) and edge-replicate padding to 8×8 tiles
    if gray:
        planes = [a.astype(np.float64)]
    else:
        r = a[:, :, 0].astype(np.float64)
        g = a[:, :, 1].astype(np.float64)
        b = a[:, :, 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y, cb, cr]
    h8 = (h + 7) // 8 * 8
    w8 = (w + 7) // 8 * 8
    planes = [
        np.pad(p, ((0, h8 - h), (0, w8 - w)), mode="edge") for p in planes
    ]

    qts = [_scaled_qt(QT_LUMA, quality)]
    if not gray:
        qts.append(_scaled_qt(QT_CHROMA, quality))
    coefs = [
        _encode_plane_blocks(p, qts[0 if i == 0 else 1])
        for i, p in enumerate(planes)
    ]

    dc_tabs = [_huff_codes(*_DC_LUMA)]
    ac_tabs = [_huff_codes(*_AC_LUMA)]
    if not gray:
        dc_tabs.append(_huff_codes(*_DC_CHROMA))
        ac_tabs.append(_huff_codes(*_AC_CHROMA))

    # entropy-coded segment: 4:4:4 MCU = one block per component
    bw = _BitWriter()
    n_mcu = (h8 // 8) * (w8 // 8)
    pred = [0] * len(planes)
    rst = 0
    for m in range(n_mcu):
        if restart_interval and m and m % restart_interval == 0:
            bw.flush()
            bw.out += bytes([0xFF, 0xD0 + (rst % 8)])
            rst += 1
            pred = [0] * len(planes)
        for ci in range(len(planes)):
            ti = 0 if ci == 0 else 1
            dc_tab, ac_tab = dc_tabs[ti], ac_tabs[ti]
            blk = coefs[ci][m]
            diff = int(blk[0]) - pred[ci]
            pred[ci] = int(blk[0])
            s, bits = _magnitude(diff)
            code, length = dc_tab[s]
            bw.write(code, length)
            if s:
                bw.write(bits, s)
            run = 0
            last_nz = int(np.max(np.nonzero(blk)[0])) if np.any(blk) else 0
            for k in range(1, 64):
                v = int(blk[k])
                if v == 0:
                    if k > last_nz:
                        code, length = ac_tab[0x00]  # EOB
                        bw.write(code, length)
                        break
                    run += 1
                    continue
                while run > 15:
                    code, length = ac_tab[0xF0]  # ZRL
                    bw.write(code, length)
                    run -= 16
                s, bits = _magnitude(v)
                code, length = ac_tab[(run << 4) | s]
                bw.write(code, length)
                bw.write(bits, s)
                run = 0
    bw.flush()

    # ---- assemble segments -------------------------------------------------
    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")  # APP0
    for ti, qt in enumerate(qts):
        out += seg(0xDB, bytes([ti]) + bytes(int(v) for v in qt[ZIGZAG]))
    # SOF0
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])  # id, 1×1, qt
    out += seg(0xC0, sof)
    # DHT — class 0 = DC, class 1 = AC; table ids match SOS below
    tabs = [(0x00, _DC_LUMA), (0x10, _AC_LUMA)]
    if not gray:
        tabs += [(0x01, _DC_CHROMA), (0x11, _AC_CHROMA)]
    for tc, (bits_, vals) in tabs:
        out += seg(0xC4, bytes([tc]) + bytes(bits_) + bytes(vals))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --------------------------------------------------------------------------
# decoder
# --------------------------------------------------------------------------


class _BitReader:
    """Reads the entropy-coded segment with 0xFF00 unstuffing; stops at
    any non-RST marker. ``restart()`` aligns to and consumes one RSTn."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        while self.nbits <= 24:
            if self.pos >= len(d):
                raise ValueError("truncated JPEG entropy data")
            byte = d[self.pos]
            if byte == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:
                    break  # restart marker: handled by restart()
                else:
                    break  # EOI / next segment
                self.acc = (self.acc << 8) | byte
                self.nbits += 8
                continue
            self.pos += 1
            self.acc = (self.acc << 8) | byte
            self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
            if self.nbits == 0:
                raise ValueError("bit read past marker")
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, lut: dict) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = lut.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code")

    def restart(self) -> None:
        """Byte-align and consume one RSTn marker."""
        self.nbits = 0
        self.acc = 0
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise ValueError("expected restart marker")


def _extend(v: int, s: int) -> int:
    """T.81 F.2.2.1 EXTEND: value bits → signed coefficient."""
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def decode_jpeg(data: bytes):
    """Baseline JPEG bytes → uint8 ndarray (H, W) or (H, W, 3).

    Supports SOF0 (baseline sequential Huffman), 8-bit, 1 or 3
    components, sampling factors 1–2, DRI/RSTn, 0xFF00 stuffing.
    Everything else (progressive SOF2, arithmetic, 12-bit, CMYK)
    raises ``ValueError``.
    """
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    qts: dict = {}
    huff: dict = {}
    frame = None
    restart_interval = 0
    out = None

    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("bad marker alignment")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        body = data[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(body):
                if p + 65 > len(body):
                    raise ValueError("truncated DQT segment")
                pq, tq = body[p] >> 4, body[p] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                tab = np.zeros(64, dtype=np.int64)
                tab[ZIGZAG] = np.frombuffer(
                    body[p + 1 : p + 65], dtype=np.uint8
                ).astype(np.int64)
                qts[tq] = tab
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(body):
                if p + 17 > len(body):
                    raise ValueError("truncated DHT segment")
                tc, th = body[p] >> 4, body[p] & 0x0F
                bits = list(body[p + 1 : p + 17])
                n = sum(bits)
                if p + 17 + n > len(body):
                    raise ValueError("truncated DHT segment")
                vals = list(body[p + 17 : p + 17 + n])
                huff[(tc, th)] = _huff_lut(bits, vals)
                p += 17 + n
        elif marker == 0xDD:  # DRI
            if len(body) < 2:
                raise ValueError("truncated DRI segment")
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 (both baseline-ish)
            if len(body) < 6:
                raise ValueError("truncated SOF segment")
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise ValueError(f"{prec}-bit precision unsupported")
            if nc not in (1, 3):
                raise ValueError(f"{nc}-component JPEG unsupported")
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                hs, vs = hv >> 4, hv & 0x0F
                if not (1 <= hs <= 2 and 1 <= vs <= 2):
                    raise ValueError(f"sampling factors {hs}x{vs} unsupported")
                comps.append({"id": cid, "h": hs, "v": vs, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("only baseline sequential JPEG is supported")
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            if len(body) < 1 or len(body) < 1 + 2 * body[0]:
                raise ValueError("truncated SOS segment")
            ns = body[0]
            scan = []
            for i in range(ns):
                cs, tt = body[1 + 2 * i : 3 + 2 * i]
                comp = next(
                    (c for c in frame["comps"] if c["id"] == cs), None
                )
                if comp is None:
                    raise ValueError(f"SOS references unknown component {cs}")
                scan.append((comp, tt >> 4, tt & 0x0F))
            if len(scan) != len(frame["comps"]):
                # legal baseline JPEGs may ship one component per scan
                # (non-interleaved, multiple SOS); decoding only the
                # first scan would silently return the Y plane as
                # grayscale — route such files to the fallback instead
                raise ValueError(
                    "multi-scan (non-interleaved) baseline JPEG unsupported"
                )
            out = _decode_scan(
                data, pos + 2 + seglen, frame, scan, qts, huff, restart_interval
            )
            break
        pos += 2 + seglen

    if out is None:
        raise ValueError("no scan decoded")
    return out


#: Reject frames above this pixel count before allocating coefficient
#: stores — a crafted few-hundred-byte header can otherwise declare
#: 65535x65535x3 and OOM an executor processing untrusted crawl bytes.
MAX_DECODE_PIXELS = 64_000_000  # 8192x8192-ish, ~1.5 GB of f64 stores


def _decode_scan(data, pos, frame, scan, qts, huff, restart_interval):
    h, w = frame["h"], frame["w"]
    comps = frame["comps"]
    if h * w > MAX_DECODE_PIXELS:
        raise ValueError(f"frame {w}x{h} exceeds decode pixel cap")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (w + mcu_w - 1) // mcu_w
    mcus_y = (h + mcu_h - 1) // mcu_h

    # plausibility: every block costs >= 2 entropy bits (a DC symbol and
    # an AC EOB); a frame whose implied block count cannot fit in the
    # remaining bytes is a forged header, not a decodable image
    n_blocks_total = sum(
        mcus_x * c["h"] * mcus_y * c["v"] for c, _, _ in scan
    )
    if n_blocks_total * 2 > (len(data) - pos) * 8 + 8:
        raise ValueError("entropy data too short for declared frame size")

    # per-component coefficient stores (blocks in raster order)
    stores = []
    for comp, _, _ in scan:
        bx = mcus_x * comp["h"]
        by = mcus_y * comp["v"]
        stores.append(np.zeros((by * bx, 64), dtype=np.float64))

    br = _BitReader(data, pos)
    pred = [0] * len(scan)
    n_mcu = mcus_x * mcus_y
    for m in range(n_mcu):
        if restart_interval and m and m % restart_interval == 0:
            br.restart()
            pred = [0] * len(scan)
        my, mx = divmod(m, mcus_x)
        for si, (comp, td, ta) in enumerate(scan):
            dc_lut = huff.get((0, td))
            ac_lut = huff.get((1, ta))
            if dc_lut is None or ac_lut is None:
                raise ValueError("missing Huffman table")
            bx = mcus_x * comp["h"]
            for v in range(comp["v"]):
                for hh in range(comp["h"]):
                    blk = np.zeros(64, dtype=np.float64)
                    s = br.decode_symbol(dc_lut)
                    diff = _extend(br.receive(s), s) if s else 0
                    pred[si] += diff
                    blk[0] = pred[si]
                    k = 1
                    while k < 64:
                        rs = br.decode_symbol(ac_lut)
                        r, s = rs >> 4, rs & 0x0F
                        if s == 0:
                            if r == 15:
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("AC run past block end")
                        blk[k] = _extend(br.receive(s), s)
                        k += 1
                    row = my * comp["v"] + v
                    col = mx * comp["h"] + hh
                    stores[si][row * bx + col] = blk

    # dequantize + batch IDCT + reassemble + upsample
    planes = []
    for si, (comp, _, _) in enumerate(scan):
        qt = qts.get(comp["tq"])
        if qt is None:
            raise ValueError("missing quant table")
        bx = mcus_x * comp["h"]
        by = mcus_y * comp["v"]
        de = np.zeros((len(stores[si]), 64), dtype=np.float64)
        de[:, ZIGZAG] = stores[si] * qt[ZIGZAG]
        blocks = de.reshape(-1, 8, 8)
        pix = np.einsum("xu,nuv,vy->nxy", _C.T, blocks, _C, optimize=True) + 128.0
        plane = (
            pix.reshape(by, bx, 8, 8).transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
        )
        # upsample to full MCU grid resolution, then crop to (h, w)
        ry, rx = vmax // comp["v"], hmax // comp["h"]
        if ry > 1:
            plane = np.repeat(plane, ry, axis=0)
        if rx > 1:
            plane = np.repeat(plane, rx, axis=1)
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
