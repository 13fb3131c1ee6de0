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
SOF0/1 / SOF2 (progressive) / SOS / RSTn / EOI; 8-bit precision; 1 or 3
components; sampling factors ∈ {1, 2}; 0xFF00 byte unstuffing.
Progressive covers the full T.81 Annex G Huffman process: spectral
selection (any band split), successive approximation (DC and AC first +
refinement scans), interleaved DC scans, non-interleaved AC scans,
EOB-run batching, and restart markers inside any scan — roughly half of
real crawl JPEGs are progressive, so this path is first-class, not
PIL-gated. Arithmetic coding, 12-bit, hierarchical, and CMYK raise
``ValueError`` — the Arrow decode stage treats that as a routing signal
(codec tag + NULL pixels), never a partition killer.

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
# progressive encoder (fixture generator for the Annex-G decode path)
# --------------------------------------------------------------------------

#: Flat fixture Huffman tables: every symbol the progressive processes can
#: emit, at a uniform canonical length (12 DC categories at 4 bits; AC
#: symbols 0x00–0xFE at 8 bits — 255 codes, the all-ones code unused).
#: Deliberately non-optimal: the fixtures test the DECODER, and a flat
#: table can express any EOB-run length, unlike the Annex-K tables which
#: lack the (r<<4|0) EOBn symbols for r ∈ 1..14.
_DC_PROG = ([0, 0, 0, 12] + [0] * 12, list(range(12)))
_AC_PROG = ([0, 0, 0, 0, 0, 0, 0, 255] + [0] * 8, list(range(255)))

#: libjpeg-style default progression: approximated DC first, then each
#: component's AC in two spectral bands at Al=1, then full refinement.
#: Entries: (comp_indices, Ss, Se, Ah, Al).
_DEFAULT_SCRIPT = (
    ("all", 0, 0, 0, 1),
    ("each", 1, 5, 0, 2),
    ("each", 6, 63, 0, 2),
    ("each", 1, 63, 2, 1),
    ("all", 0, 0, 1, 0),
    ("each", 1, 63, 1, 0),
)


class _ProgACEncoder:
    """Per-scan AC entropy state: EOB-run batching plus the buffered
    correction bits of refinement scans (T.81 G.1.2.2/G.1.2.3 encode)."""

    def __init__(self, bw: "_BitWriter", tab: dict):
        self.bw = bw
        self.tab = tab
        self.eobrun = 0
        self.ebits: list = []  # correction bits owned by the pending EOB run

    def _sym(self, sym: int) -> None:
        code, length = self.tab[sym]
        self.bw.write(code, length)

    def flush_eobrun(self) -> None:
        if self.eobrun > 0:
            nbits = self.eobrun.bit_length() - 1
            self._sym(nbits << 4)
            if nbits:
                self.bw.write(self.eobrun - (1 << nbits), nbits)
            for b in self.ebits:
                self.bw.write(b, 1)
            self.eobrun = 0
            self.ebits = []

    def first_block(self, band, al: int) -> None:
        """AC first scan (Ah=0): code v = coef/2^Al (truncate toward 0)."""
        r = 0
        for c in band:
            a = abs(int(c)) >> al
            if a == 0:
                r += 1
                continue
            self.flush_eobrun()
            while r > 15:
                self._sym(0xF0)
                r -= 16
            v = a if int(c) > 0 else -a
            s, bits = _magnitude(v)
            self._sym((r << 4) | s)
            self.bw.write(bits, s)
            r = 0
        if r > 0:
            self.eobrun += 1
            if self.eobrun == 0x7FFF:
                self.flush_eobrun()

    def refine_block(self, band, al: int) -> None:
        """AC refinement scan (Ah=Al+1): ±1 for newly-visible
        coefficients, one buffered correction bit per old-nonzero."""
        absval = [abs(int(c)) >> al for c in band]
        eob = -1
        for i, a in enumerate(absval):
            if a == 1:
                eob = i
        r = 0
        br_bits: list = []
        for i, a in enumerate(absval):
            if a == 0:
                r += 1
                continue
            while r > 15 and i <= eob:
                self.flush_eobrun()
                self._sym(0xF0)
                r -= 16
                for b in br_bits:
                    self.bw.write(b, 1)
                br_bits = []
            if a > 1:
                br_bits.append(a & 1)
                continue
            self.flush_eobrun()
            self._sym((r << 4) | 1)
            self.bw.write(1 if int(band[i]) > 0 else 0, 1)
            for b in br_bits:
                self.bw.write(b, 1)
            br_bits = []
            r = 0
        if r > 0 or br_bits:
            self.eobrun += 1
            self.ebits.extend(br_bits)
            if self.eobrun == 0x7FFF:
                self.flush_eobrun()


def encode_jpeg_progressive(
    arr: np.ndarray,
    quality: int = 85,
    script=None,
    restart_interval: int = 0,
    subsample: bool = False,
) -> bytes:
    """uint8 (H, W) grayscale or (H, W, 3) RGB → progressive (SOF2) JFIF
    bytes. Quantizes exactly like :func:`encode_jpeg` (same tables, 4:4:4
    by default), so a progressive file decodes to the SAME pixels as its
    baseline twin — the round-trip identity the tests assert.
    ``subsample=True`` emits 4:2:0 (Y 2×2, box-filtered chroma),
    exercising the decoder's non-interleaved grid-stride path.
    ``script`` overrides the default progression: a list of
    ``(comps, Ss, Se, Ah, Al)`` with ``comps`` = "all" | "each" | a tuple
    of component indices."""
    a = np.asarray(arr)
    if a.dtype != np.uint8 or a.ndim not in (2, 3):
        raise ValueError("encode_jpeg_progressive needs uint8 (H,W) or (H,W,3)")
    if a.ndim == 3 and a.shape[2] != 3:
        raise ValueError(f"1 or 3 channels required, got {a.shape[2]}")
    h, w = a.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    gray = a.ndim == 2
    if subsample and gray:
        raise ValueError("subsample requires a color image")

    if gray:
        planes = [a.astype(np.float64)]
        samp = [(1, 1)]
    else:
        r = a[:, :, 0].astype(np.float64)
        g = a[:, :, 1].astype(np.float64)
        b = a[:, :, 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample:
            # box-filter chroma 2×2 (pad odd dims by edge replication)
            def down(p):
                hp = np.pad(p, ((0, h % 2), (0, w % 2)), mode="edge")
                return (
                    hp.reshape(hp.shape[0] // 2, 2, hp.shape[1] // 2, 2)
                    .mean(axis=(1, 3))
                )

            planes = [y, down(cb), down(cr)]
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [y, cb, cr]
            samp = [(1, 1)] * 3
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)

    qts = [_scaled_qt(QT_LUMA, quality)]
    if not gray:
        qts.append(_scaled_qt(QT_CHROMA, quality))

    # quantized zigzag coefs per component, blocks in the PADDED grid
    coefs = []
    grid = []  # (bx_pad, by_pad, cbx, cby) per component
    for ci, (p, (hs, vs)) in enumerate(zip(planes, samp)):
        bxp, byp = mcus_x * hs, mcus_y * vs
        pad = np.pad(
            p,
            ((0, byp * 8 - p.shape[0]), (0, bxp * 8 - p.shape[1])),
            mode="edge",
        )
        coefs.append(
            _encode_plane_blocks(pad, qts[0 if ci == 0 else 1]).astype(np.int64)
        )
        cbx, cby = _block_dims(w, h, hs, vs, hmax, vmax)
        grid.append((bxp, byp, cbx, cby))

    dc_tab = _huff_codes(*_DC_PROG)
    ac_tab = _huff_codes(*_AC_PROG)
    script = list(script) if script is not None else list(_DEFAULT_SCRIPT)

    # ---- entropy-code every scan ------------------------------------------
    scan_payloads = []
    n_comp = len(planes)
    for comps_spec, ss, se, ahh, all_ in script:
        if comps_spec == "all":
            comp_lists = [tuple(range(n_comp))]
        elif comps_spec == "each":
            comp_lists = [(i,) for i in range(n_comp)]
        else:
            comp_lists = [tuple(comps_spec)]
        for comp_idx in comp_lists:
            if ss > 0 and len(comp_idx) != 1:
                raise ValueError("AC scans must be single-component")
            bw = _BitWriter()
            rst = 0
            pred = [0] * len(comp_idx)
            ac = _ProgACEncoder(bw, ac_tab)

            def restart_now():
                nonlocal rst
                ac.flush_eobrun()
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + (rst % 8)])
                rst += 1
                pred[:] = [0] * len(comp_idx)

            if ss == 0 and len(comp_idx) > 1:
                for m in range(mcus_x * mcus_y):
                    if restart_interval and m and m % restart_interval == 0:
                        restart_now()
                    my, mx = divmod(m, mcus_x)
                    for si, ci in enumerate(comp_idx):
                        hs, vs = samp[ci]
                        bxp = grid[ci][0]
                        for v in range(vs):
                            for hh in range(hs):
                                blk = coefs[ci][(my * vs + v) * bxp + mx * hs + hh]
                                _encode_dc_unit(bw, dc_tab, blk, ahh, all_, pred, si)
            else:
                (ci,) = comp_idx if len(comp_idx) == 1 else (comp_idx[0],)
                bxp, _, cbx, cby = grid[ci]
                unit = 0
                for bi in range(cby):
                    for bj in range(cbx):
                        if restart_interval and unit and unit % restart_interval == 0:
                            restart_now()
                        unit += 1
                        blk = coefs[ci][bi * bxp + bj]
                        if ss == 0:
                            _encode_dc_unit(bw, dc_tab, blk, ahh, all_, pred, 0)
                        elif ahh == 0:
                            ac.first_block(blk[ss : se + 1], all_)
                        else:
                            ac.refine_block(blk[ss : se + 1], all_)
            ac.flush_eobrun()
            bw.flush()
            scan_payloads.append((comp_idx, ss, se, ahh, all_, bytes(bw.out)))

    # ---- assemble segments -------------------------------------------------
    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for ti, qt in enumerate(qts):
        out += seg(0xDB, bytes([ti]) + bytes(int(v) for v in qt[ZIGZAG]))
    sof = struct.pack(">BHHB", 8, h, w, n_comp)
    for ci in range(n_comp):
        hs, vs = samp[ci]
        sof += bytes([ci + 1, (hs << 4) | vs, 0 if ci == 0 else 1])
    out += seg(0xC2, sof)
    out += seg(0xC4, bytes([0x00]) + bytes(_DC_PROG[0]) + bytes(_DC_PROG[1]))
    out += seg(0xC4, bytes([0x10]) + bytes(_AC_PROG[0]) + bytes(_AC_PROG[1]))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    for comp_idx, ss, se, ahh, all_, payload in scan_payloads:
        sos = bytes([len(comp_idx)])
        for ci in comp_idx:
            sos += bytes([ci + 1, 0x00])  # DC table 0, AC table 0
        sos += bytes([ss, se, (ahh << 4) | all_])
        out += seg(0xDA, sos)
        out += payload
    out += b"\xff\xd9"
    return bytes(out)


def _encode_dc_unit(bw, dc_tab, blk, ah, al, pred, si) -> None:
    if ah == 0:
        v = int(blk[0]) >> al  # arithmetic shift, same as the decoder
        diff = v - pred[si]
        pred[si] = v
        s, bits = _magnitude(diff)
        code, length = dc_tab[s]
        bw.write(code, length)
        if s:
            bw.write(bits, s)
    else:
        bw.write((int(blk[0]) >> al) & 1, 1)


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
    """JPEG bytes → uint8 ndarray (H, W) or (H, W, 3).

    Supports SOF0/1 (baseline sequential Huffman) AND SOF2 (progressive
    Huffman, full Annex G: spectral selection, successive approximation,
    EOB runs), 8-bit, 1 or 3 components, sampling factors 1–2, DRI/RSTn,
    fill bytes, 0xFF00 stuffing. Everything else (arithmetic coding,
    lossless/hierarchical, 12-bit, CMYK) raises ``ValueError``.
    """
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    qts: dict = {}
    huff: dict = {}
    frame = None
    restart_interval = 0
    out = None
    prog = None  # progressive coefficient state across scans

    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("bad marker alignment")
        marker = data[pos + 1]
        if marker == 0xFF:  # fill byte before a marker (T.81 B.1.1.2)
            pos += 1
            continue
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
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
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
            frame = {"h": h, "w": w, "comps": comps, "progressive": marker == 0xC2}
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                "only baseline and progressive Huffman JPEG are supported"
            )
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            if len(body) < 4 or len(body) < 4 + 2 * body[0]:
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
            if frame.get("progressive"):
                ss, se, ahal = body[1 + 2 * ns : 4 + 2 * ns]
                if prog is None:
                    prog = _prog_state(frame)
                end = _progressive_scan(
                    data, pos + 2 + seglen, frame, scan,
                    ss, se, ahal >> 4, ahal & 0x0F,
                    huff, restart_interval, prog,
                )
                pos = _next_marker_pos(data, end)
                continue
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

    if out is None and prog is not None and prog["n_scans"] > 0:
        out = _reassemble(
            prog["stores"], frame["comps"], frame, qts,
            prog["mcus_x"], prog["mcus_y"],
        )
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

    return _reassemble(
        stores, [c for c, _, _ in scan], frame, qts, mcus_x, mcus_y
    )


def _reassemble(stores, comps, frame, qts, mcus_x, mcus_y):
    """Dequantize + batch IDCT + upsample + color transform. ``stores``
    is one ``(n_blocks, 64)`` zigzag-order coefficient array per entry of
    ``comps`` (blocks in the MCU-padded raster grid). Shared by the
    sequential and progressive paths — a progressive file's accumulated
    coefficients reassemble exactly like a sequential scan's."""
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    planes = []
    for si, comp in enumerate(comps):
        qt = qts.get(comp["tq"])
        if qt is None:
            raise ValueError("missing quant table")
        bx = mcus_x * comp["h"]
        by = mcus_y * comp["v"]
        de = np.zeros((len(stores[si]), 64), dtype=np.float64)
        de[:, ZIGZAG] = stores[si].astype(np.float64) * qt[ZIGZAG]
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


# --------------------------------------------------------------------------
# progressive decoding (T.81 Annex G, Huffman)
# --------------------------------------------------------------------------


def _prog_state(frame) -> dict:
    """Allocate the cross-scan coefficient stores for a progressive frame
    (one int32 ``(n_blocks, 64)`` zigzag array per component, blocks in
    the MCU-padded raster grid), with the same hostile-header caps as the
    sequential path."""
    h, w = frame["h"], frame["w"]
    if h * w > MAX_DECODE_PIXELS:
        raise ValueError(f"frame {w}x{h} exceeds decode pixel cap")
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    stores = [
        np.zeros((mcus_y * c["v"] * mcus_x * c["h"], 64), dtype=np.int32)
        for c in frame["comps"]
    ]
    return {
        "stores": stores,
        "mcus_x": mcus_x,
        "mcus_y": mcus_y,
        "n_scans": 0,
        "dc_done": set(),  # component ids whose DC-first scan has decoded
    }


#: Scan-count ceiling for progressive files (libjpeg allows 100; real
#: encoders emit ~10). Bounds the per-scan block loops a crafted file
#: with cheap EOB-run-only scans could otherwise drive.
MAX_PROGRESSIVE_SCANS = 128


def _next_marker_pos(data: bytes, p: int) -> int:
    """First position at/after ``p`` holding a non-stuffing, non-restart
    marker (the segment walker resumes there after a progressive scan).
    Runs of 0xFF are legal fill bytes before a marker (T.81 B.1.1.2);
    the position returned points at the LAST 0xFF of the run so the
    walker reads the true marker byte, never a fill 0xFF as a marker."""
    while p + 1 < len(data):
        if (
            data[p] == 0xFF
            and data[p + 1] != 0x00
            and data[p + 1] != 0xFF
            and not (0xD0 <= data[p + 1] <= 0xD7)
        ):
            return p
        p += 1
    return len(data)


def _block_dims(w: int, h: int, hs: int, vs: int, hmax: int, vmax: int) -> tuple:
    """(cbx, cby): a component's REAL block dimensions per T.81 A.1.1 —
    what a non-interleaved scan covers (padding blocks of the MCU grid
    are only coded in interleaved scans, T.81 A.2.2/A.2.3). Shared by
    encoder and decoder: the two sides must agree bit-for-bit."""
    cw = -(-w * hs // hmax)
    ch = -(-h * vs // vmax)
    return -(-cw // 8), -(-ch // 8)


def _comp_block_dims(frame, comp) -> tuple:
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    return _block_dims(
        frame["w"], frame["h"], comp["h"], comp["v"], hmax, vmax
    )


def _dc_first_unit(br, blk, dc_lut, al, pred, si):
    s = br.decode_symbol(dc_lut)
    diff = _extend(br.receive(s), s) if s else 0
    pred[si] += diff
    blk[0] = pred[si] << al


def _dc_refine_unit(br, blk, al):
    if br.read_bit():
        blk[0] = int(blk[0]) | (1 << al)


def _ac_first_unit(br, blk, ac_lut, ss, se, al, eobrun) -> int:
    """One block of an AC first scan (Ah=0). Returns the updated EOB run
    (count of FURTHER all-zero-band blocks this entry covers)."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = br.decode_symbol(ac_lut)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:
                k += 16
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += br.receive(r)
            break
        k += r
        if k > se:
            raise ValueError("AC run past band end")
        blk[k] = _extend(br.receive(s), s) << al
        k += 1
    return eobrun


def _ac_refine_unit(br, blk, ac_lut, ss, se, al, eobrun) -> int:
    """One block of an AC refinement scan (Ah=Al+1) — T.81 G.1.2.3
    decode side: newly-nonzero coefficients arrive as ±1·2^Al; every
    already-nonzero coefficient in the band costs one correction bit."""
    p1 = 1 << al

    def correct(c: int) -> int:
        if br.read_bit() and (abs(c) & p1) == 0:
            return c + (p1 if c > 0 else -p1)
        return c

    if eobrun > 0:
        # fast path: a block with an all-zero band costs no bits under an
        # EOB run — skip the per-coefficient Python loop (bounds hostile
        # EOBn-heavy streams to numpy-check cost per block)
        band = blk[ss : se + 1]
        if not band.any():
            return eobrun - 1
        for k in range(ss, se + 1):
            c = int(blk[k])
            if c != 0:
                blk[k] = correct(c)
        return eobrun - 1

    k = ss
    while k <= se:
        rs = br.decode_symbol(ac_lut)
        r, s = rs >> 4, rs & 0x0F
        val = 0
        if s == 0:
            if r < 15:
                eobrun = (1 << r) - 1
                if r:
                    eobrun += br.receive(r)
                # the EOB run starts here: finish THIS block's band with
                # correction bits; the run count covers later blocks
                while k <= se:
                    c = int(blk[k])
                    if c != 0:
                        blk[k] = correct(c)
                    k += 1
                return eobrun
            # r == 15: ZRL — skip 16 zero-history positions
        else:
            if s != 1:
                raise ValueError("refinement scan symbol must have size 1")
            val = p1 if br.read_bit() else -p1
        # advance over r zero-history positions, paying a correction bit
        # at every nonzero-history coefficient passed over
        while k <= se:
            c = int(blk[k])
            if c != 0:
                blk[k] = correct(c)
            else:
                if r == 0:
                    break
                r -= 1
            k += 1
        if val:
            if k > se:
                raise ValueError("refinement run past band end")
            blk[k] = val
        k += 1
    return eobrun


def _progressive_scan(
    data, pos, frame, scan, ss, se, ah, al, huff, restart_interval, prog
) -> int:
    """Decode one progressive SOS into the cross-scan coefficient stores.
    Returns the byte position where entropy data ended (marker search
    resumes there)."""
    if ss == 0:
        if se != 0:
            raise ValueError("progressive DC scan must have Se=0")
    else:
        if len(scan) != 1:
            raise ValueError("progressive AC scan must be single-component")
        if not (ss <= se <= 63):
            raise ValueError("bad spectral band")
    if ah not in (0, al + 1):
        raise ValueError("bad successive approximation (Ah must be 0 or Al+1)")
    if al > 13:
        raise ValueError("bad successive approximation bit position")
    if prog["n_scans"] >= MAX_PROGRESSIVE_SCANS:
        raise ValueError("too many progressive scans")

    comps = frame["comps"]
    stores = prog["stores"]
    mcus_x, mcus_y = prog["mcus_x"], prog["mcus_y"]

    # hostile-header plausibility (the sequential path's analogue in
    # _decode_scan): T.81 G.1.1.1.1 requires a component's DC-first scan
    # before any of its other scans, and a DC-first scan has no EOB-run
    # batching — every block costs at least one entropy bit. So a forged
    # header's declared block count must be backed by real bytes before
    # any per-block Python loop starts; AC scans then only run on
    # components that already paid that cost.
    if ss == 0 and ah == 0:
        n_scan_blocks = 0
        for comp, _, _ in scan:
            if len(scan) > 1:  # interleaved: the padded MCU grid is coded
                n_scan_blocks += mcus_x * comp["h"] * mcus_y * comp["v"]
            else:
                cbx, cby = _comp_block_dims(frame, comp)
                n_scan_blocks += cbx * cby
        if n_scan_blocks > (len(data) - pos) * 8 + 8:
            raise ValueError("entropy data too short for declared frame size")
        prog["dc_done"].update(c["id"] for c, _, _ in scan)
    else:
        missing = [c["id"] for c, _, _ in scan if c["id"] not in prog["dc_done"]]
        if missing:
            raise ValueError(
                "progressive scan before the component's DC-first scan"
            )
    br = _BitReader(data, pos)
    pred = [0] * len(scan)
    eobrun = 0

    def at_restart(unit: int) -> None:
        nonlocal eobrun
        if restart_interval and unit and unit % restart_interval == 0:
            br.restart()
            pred[:] = [0] * len(scan)
            eobrun = 0

    if ss == 0 and len(scan) > 1:
        # interleaved DC scan over MCUs (the only multi-component kind)
        plan = []  # (store, stride, comp_h, comp_v, si)
        for si, (comp, td, _) in enumerate(scan):
            ci = next(
                i for i, c in enumerate(comps) if c["id"] == comp["id"]
            )
            lut = huff.get((0, td)) if ah == 0 else None
            if ah == 0 and lut is None:
                raise ValueError("missing Huffman table")
            plan.append((stores[ci], mcus_x * comp["h"], comp, lut, si))
        for m in range(mcus_x * mcus_y):
            at_restart(m)
            my, mx = divmod(m, mcus_x)
            for store, bx, comp, lut, si in plan:
                for v in range(comp["v"]):
                    for hh in range(comp["h"]):
                        blk = store[(my * comp["v"] + v) * bx + mx * comp["h"] + hh]
                        if ah == 0:
                            _dc_first_unit(br, blk, lut, al, pred, si)
                        else:
                            _dc_refine_unit(br, blk, al)
    else:
        comp, td, ta = scan[0]
        ci = next(i for i, c in enumerate(comps) if c["id"] == comp["id"])
        store = stores[ci]
        bx = mcus_x * comp["h"]  # padded grid row stride
        cbx, cby = _comp_block_dims(frame, comp)
        if ss == 0:
            lut = huff.get((0, td))
            if ah == 0 and lut is None:
                raise ValueError("missing Huffman table")
        else:
            lut = huff.get((1, ta))
            if lut is None:
                raise ValueError("missing Huffman table")
        unit = 0
        for bi in range(cby):
            for bj in range(cbx):
                at_restart(unit)
                unit += 1
                blk = store[bi * bx + bj]
                if ss == 0:
                    if ah == 0:
                        _dc_first_unit(br, blk, lut, al, pred, 0)
                    else:
                        _dc_refine_unit(br, blk, al)
                elif ah == 0:
                    eobrun = _ac_first_unit(br, blk, lut, ss, se, al, eobrun)
                else:
                    eobrun = _ac_refine_unit(br, blk, lut, ss, se, al, eobrun)
    prog["n_scans"] += 1
    return br.pos
