"""Baseline JPEG (ITU-T T.81) codec — pure numpy + stdlib, no PIL/opencv.

Public-knowledge implementation from the JPEG specification (ITU-T T.81 /
ISO 10918-1, public) and the JFIF convention:

- :func:`encode_jpeg` — baseline sequential DCT, 8-bit, YCbCr, 4:4:4 or
  4:2:0 subsampling, IJG-style quality-scaled Annex-K quantization tables,
  Annex-K-structure Huffman tables (emitted in DHT, so the stream is fully
  self-describing).
- :func:`decode_jpeg` — baseline/extended-sequential (SOF0/SOF1) AND
  progressive (SOF2: spectral selection + successive approximation)
  Huffman decode honouring the stream's own DQT/DHT, 1- or 3-component,
  per-component sampling factors up to 2x2, DRI/RSTn restart handling.
  Arithmetic-coded and hierarchical frames raise NotImplementedError —
  in the multimodal pipeline that routes those payloads to the
  deterministic keyed-hash fallback.

Vectorization: the forward/inverse DCT run as two matmuls over ALL blocks
of a component at once (the compute-heavy part); dequantize/level-shift/
clip are whole-array ops. The per-symbol Huffman loop is inherently
sequential (each code's length is only known once decoded) and stays a
Python loop over symbols — the same split as the Gorilla codec, and fine
for the mapInArrow per-payload decode path where parallelism comes from
Arrow batches across partitions, not from within one payload.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# constant tables (JPEG Annex K — public spec)
# ---------------------------------------------------------------------------

# K.1 / K.2 example quantization tables (raster order)
_QUANT_LUMA = np.array(
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
_QUANT_CHROMA = np.array(
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


def _zigzag() -> np.ndarray:
    """zz[k] = raster index of the k-th zigzag coefficient (derived, not
    hardcoded: diagonals d=i+j in order; odd diagonals run i-ascending,
    even diagonals i-descending — the T.81 Figure 5 traversal)."""
    coords = sorted(
        ((i, j) for i in range(8) for j in range(8)),
        key=lambda t: (t[0] + t[1], t[0] if (t[0] + t[1]) % 2 else -t[0]),
    )
    return np.array([i * 8 + j for i, j in coords], dtype=np.int64)


_ZZ = _zigzag()
_UNZZ = np.argsort(_ZZ)  # raster index -> zigzag position

# K.3 typical Huffman tables: (bits[1..16], values). Emitted in DHT and
# parsed back from DHT, so encode/decode share one self-consistent source.
_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))

_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = [
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
]
_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROMA_VALS = [
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
]

# every AC table must cover EOB, ZRL and all (run 0-15, size 1-10): an
# import-time guard against a mistyped value list (codes would be
# self-consistent either way, but an emitted symbol must be encodable)
_AC_SYMBOLS = {0x00, 0xF0} | {(r << 4) | s for r in range(16) for s in range(1, 11)}
assert set(_AC_LUMA_VALS) == _AC_SYMBOLS and len(_AC_LUMA_VALS) == 162
assert set(_AC_CHROMA_VALS) == _AC_SYMBOLS and len(_AC_CHROMA_VALS) == 162
assert sum(_AC_LUMA_BITS) == 162 and sum(_AC_CHROMA_BITS) == 162


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix: forward F = C X C^T, inverse
    X = C^T F C (T.81 Annex A.3.3 in matrix form)."""
    C = np.zeros((8, 8))
    for k in range(8):
        s = np.sqrt(1.0 / 8.0) if k == 0 else 0.5
        for n in range(8):
            C[k, n] = s * np.cos(np.pi * (2 * n + 1) * k / 16.0)
    return C


_DCT = _dct_matrix()


def _quality_scale(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling (public libjpeg convention): 50 = base tables,
    higher = finer quantization."""
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - quality * 2
    q = (base * scale + 50) // 100
    return np.clip(q, 1, 255)


def _huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman: symbol -> (code, length) (T.81 Annex C)."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _huff_decode_map(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, the decoder's view of the same canon."""
    return {(ln, code): sym for sym, (code, ln) in _huff_codes(bits, vals).items()}


# ---------------------------------------------------------------------------
# bit I/O
# ---------------------------------------------------------------------------


class _BitWriter:
    """MSB-first bit accumulator with JPEG 0xFF byte stuffing."""

    def __init__(self):
        self.acc = 0
        self.n = 0
        self.out = bytearray()

    def write(self, code: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:
            self.write((1 << (8 - self.n)) - 1, 8 - self.n)  # pad with 1s


class _BitReader:
    """MSB-first reader over unstuffed entropy-coded bytes."""

    def __init__(self, data: bytes):
        self.bits = np.unpackbits(np.frombuffer(bytes(data), np.uint8))
        self.pos = 0

    def read_bit(self) -> int:
        if self.pos >= self.bits.size:
            raise ValueError("truncated entropy-coded data")
        b = int(self.bits[self.pos])
        self.pos += 1
        return b

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        if self.pos + n > self.bits.size:
            raise ValueError("truncated entropy-coded data")
        chunk = self.bits[self.pos : self.pos + n]
        self.pos += n
        v = 0
        for b in chunk:
            v = (v << 1) | int(b)
        return v


def _extend(v: int, s: int) -> int:
    """T.81 F.2.2.1 EXTEND: map the s received bits to a signed value."""
    if s and v < (1 << (s - 1)):
        return v - ((1 << s) - 1)
    return v


def _magnitude(v: int) -> tuple[int, int]:
    """signed value -> (size category s, s-bit code)."""
    if v == 0:
        return 0, 0
    s = int(abs(v)).bit_length()
    return s, (v if v > 0 else v + (1 << s) - 1)


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


def _rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    x = img.astype(np.float64)
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _pad_replicate(plane: np.ndarray, mh: int, mw: int) -> np.ndarray:
    """Pad to multiples of (mh, mw) by edge replication (the spec's
    recommended extension: constant-extended blocks compress best)."""
    h, w = plane.shape
    ph, pw = -h % mh, -w % mw
    return np.pad(plane, ((0, ph), (0, pw)), mode="edge")


def _blocks_of(plane: np.ndarray) -> np.ndarray:
    """(H, W) -> (H//8, W//8, 8, 8) block view (H, W multiples of 8)."""
    h, w = plane.shape
    return plane.reshape(h // 8, 8, w // 8, 8).swapaxes(1, 2)


def _fdct_quant(blocks: np.ndarray, qtable: np.ndarray) -> np.ndarray:
    """Vectorized forward DCT + quantization over an (n, 8, 8) stack."""
    shifted = blocks.astype(np.float64) - 128.0
    coef = np.einsum("kn,bnm,lm->bkl", _DCT, shifted, _DCT, optimize=True)
    q = qtable.reshape(8, 8).astype(np.float64)
    return np.round(coef / q).astype(np.int64)


def _encode_block(
    bw: _BitWriter, coef: np.ndarray, pred: int, dc_tab: dict, ac_tab: dict
) -> int:
    """Huffman-encode one quantized block (raster (8,8)); returns new DC
    predictor."""
    zz = coef.reshape(64)[_ZZ]
    dc = int(zz[0])
    s, code = _magnitude(dc - pred)
    hc, hl = dc_tab[s]
    bw.write(hc, hl)
    bw.write(code, s)
    run = 0
    nz = np.nonzero(zz[1:])[0]
    last = int(nz[-1]) + 1 if nz.size else 0
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run >= 16:
            hc, hl = ac_tab[0xF0]  # ZRL
            bw.write(hc, hl)
            run -= 16
        s, code = _magnitude(v)
        hc, hl = ac_tab[(run << 4) | s]
        bw.write(hc, hl)
        bw.write(code, s)
        run = 0
    if last < 63:
        hc, hl = ac_tab[0x00]  # EOB
        bw.write(hc, hl)
    return dc


def _prepare_components(
    img: np.ndarray, quality: int, subsampling: str
) -> tuple[int, int, int, np.ndarray, np.ndarray, list[np.ndarray]]:
    """Shared encoder front end: color-convert, subsample, FDCT+quantize.

    Returns (h, w, luma_factor, qy, qc, [yq, cbq, crq]) where each *q is a
    (blocks_y, blocks_x, 8, 8) stack of quantized coefficients — identical
    for the baseline and progressive encoders, which differ only in how
    these coefficients are entropy-coded."""
    assert img.ndim == 3 and img.shape[2] == 3 and img.dtype == np.uint8
    if subsampling not in ("4:2:0", "4:4:4"):
        raise ValueError(f"subsampling {subsampling!r} (4:2:0 or 4:4:4)")
    h, w = img.shape[:2]
    sub = subsampling == "4:2:0"
    hy = 2 if sub else 1  # luma sampling factor (h == v)

    qy = _quality_scale(_QUANT_LUMA, quality)
    qc = _quality_scale(_QUANT_CHROMA, quality)

    ycc = _rgb_to_ycbcr(img)
    mcu = 8 * hy
    yp = _pad_replicate(ycc[..., 0], mcu, mcu)
    cb = _pad_replicate(ycc[..., 1], mcu, mcu)
    cr = _pad_replicate(ycc[..., 2], mcu, mcu)
    if sub:  # 2x2 box average, the standard JFIF downsample
        cb = cb.reshape(cb.shape[0] // 2, 2, cb.shape[1] // 2, 2).mean(axis=(1, 3))
        cr = cr.reshape(cr.shape[0] // 2, 2, cr.shape[1] // 2, 2).mean(axis=(1, 3))

    quant = []
    for plane, qt in ((yp, qy), (cb, qc), (cr, qc)):
        b = _blocks_of(plane)
        quant.append(
            _fdct_quant(b.reshape(-1, 8, 8), qt).reshape(b.shape[0], b.shape[1], 8, 8)
        )
    return h, w, hy, qy, qc, quant


def encode_jpeg(
    img: np.ndarray, quality: int = 85, subsampling: str = "4:2:0"
) -> bytes:
    """Baseline sequential JFIF JPEG from an (h, w, 3) uint8 RGB array."""
    h, w, hy, qy, qc, (yq, cbq, crq) = _prepare_components(img, quality, subsampling)
    vy = hy

    dc_y = _huff_codes(_DC_LUMA_BITS, _DC_LUMA_VALS)
    ac_y = _huff_codes(_AC_LUMA_BITS, _AC_LUMA_VALS)
    dc_c = _huff_codes(_DC_CHROMA_BITS, _DC_CHROMA_VALS)
    ac_c = _huff_codes(_AC_CHROMA_BITS, _AC_CHROMA_VALS)

    bw = _BitWriter()
    preds = [0, 0, 0]
    mcus_y, mcus_x = cbq.shape[0], cbq.shape[1]
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for by in range(vy):  # interleaved: Y blocks, then Cb, Cr
                for bx in range(hy):
                    preds[0] = _encode_block(
                        bw, yq[my * vy + by, mx * hy + bx], preds[0], dc_y, ac_y
                    )
            preds[1] = _encode_block(bw, cbq[my, mx], preds[1], dc_c, ac_c)
            preds[2] = _encode_block(bw, crq[my, mx], preds[2], dc_c, ac_c)
    bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    def dht(cls: int, tid: int, bits: list[int], vals: list[int]) -> bytes:
        return bytes([cls << 4 | tid]) + bytes(bits) + bytes(vals)

    out = bytearray()
    out += struct.pack(">H", 0xFFD8)  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")  # APP0
    out += seg(0xFFDB, b"\x00" + bytes(qy[_ZZ].astype(np.uint8)))
    out += seg(0xFFDB, b"\x01" + bytes(qc[_ZZ].astype(np.uint8)))
    sof = struct.pack(">BHHB", 8, h, w, 3)
    sof += bytes([1, hy << 4 | vy, 0])  # Y
    sof += bytes([2, 0x11, 1])  # Cb
    sof += bytes([3, 0x11, 1])  # Cr
    out += seg(0xFFC0, sof)
    out += seg(
        0xFFC4,
        dht(0, 0, _DC_LUMA_BITS, _DC_LUMA_VALS)
        + dht(1, 0, _AC_LUMA_BITS, _AC_LUMA_VALS)
        + dht(0, 1, _DC_CHROMA_BITS, _DC_CHROMA_VALS)
        + dht(1, 1, _AC_CHROMA_BITS, _AC_CHROMA_VALS),
    )
    sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    out += seg(0xFFDA, sos)
    out += bw.out
    out += struct.pack(">H", 0xFFD9)  # EOI
    return bytes(out)


# progressive encoder: a flat 8-bit AC Huffman table. Annex K's sequential
# AC tables lack the EOBn symbols (0x10..0xE0) progressive AC scans need, so
# the test-fixture encoder emits its own self-describing table: all 176
# symbols a progressive AC scan can produce (EOB0..EOB14, ZRL, and
# run/size for size 1..10) at code length 8 — Kraft-feasible (176 < 256)
# and the all-ones code stays unassigned as T.81 requires.
_AC_PROG_VALS = sorted({r << 4 for r in range(15)} | {0xF0}
                       | {(r << 4) | s for r in range(16) for s in range(1, 11)})
_AC_PROG_BITS = [0, 0, 0, 0, 0, 0, 0, len(_AC_PROG_VALS), 0, 0, 0, 0, 0, 0, 0, 0]


class _EobState:
    """Scan-level EOB-run bookkeeping for progressive AC scans: the run
    count plus the correction bits of run blocks (refinement scans), both
    flushed together — EOBn symbol, its extra bits, then the buffered
    bits — exactly where the decoder's advance loop will consume them."""

    def __init__(self, bw: _BitWriter, ac_tab: dict):
        self.bw = bw
        self.ac_tab = ac_tab
        self.run = 0
        self.bits: list[int] = []

    def flush(self) -> None:
        if self.run > 0:
            r = self.run.bit_length() - 1
            hc, hl = self.ac_tab[r << 4]
            self.bw.write(hc, hl)
            self.bw.write(self.run & ((1 << r) - 1), r)
            self.run = 0
        for b in self.bits:
            self.bw.write(b, 1)
        self.bits = []

    def add_block(self, bits: list[int]) -> None:
        self.run += 1
        self.bits.extend(bits)
        if self.run == 0x7FFF or len(self.bits) > 900:
            self.flush()


def _encode_ac_first(
    bw: _BitWriter, zz: np.ndarray, ss: int, se: int, al: int,
    ac_tab: dict, st: _EobState,
) -> None:
    """AC first scan, one block (T.81 G.1.2.2): point-transformed band with
    EOB-run coding across blocks."""
    band = zz[ss : se + 1]
    v = np.sign(band) * (np.abs(band) >> al)
    nz = np.nonzero(v)[0]
    if nz.size == 0:
        st.add_block([])
        return
    st.flush()
    run = 0
    last = int(nz[-1])
    for i in range(last + 1):
        x = int(v[i])
        if x == 0:
            run += 1
            continue
        while run >= 16:
            hc, hl = ac_tab[0xF0]
            bw.write(hc, hl)
            run -= 16
        s, code = _magnitude(x)
        hc, hl = ac_tab[(run << 4) | s]
        bw.write(hc, hl)
        bw.write(code, s)
        run = 0
    if last < se - ss:
        st.add_block([])


def _encode_ac_refine(
    bw: _BitWriter, zz: np.ndarray, ss: int, se: int, al: int,
    ac_tab: dict, st: _EobState,
) -> None:
    """AC refinement scan, one block (T.81 G.1.2.3): newly-significant
    coefficients as run/1 symbols; already-nonzero coefficients contribute
    one correction bit each, buffered and emitted directly after the next
    symbol so the decoder's advance loop consumes them in stream order."""
    band = zz[ss : se + 1]
    t = np.abs(band) >> al
    newly = np.nonzero(t == 1)[0]
    eob = int(newly[-1]) if newly.size else -1
    br_bits: list[int] = []
    run = 0
    for i in range(band.size):
        ti = int(t[i])
        if ti == 0:
            run += 1
            continue
        while run > 15 and i <= eob:
            st.flush()
            hc, hl = ac_tab[0xF0]
            bw.write(hc, hl)
            run -= 16
            for b in br_bits:
                bw.write(b, 1)
            br_bits = []
        if ti > 1:  # history coefficient: correction bit only
            br_bits.append(ti & 1)
            continue
        st.flush()
        hc, hl = ac_tab[(run << 4) | 1]
        bw.write(hc, hl)
        bw.write(1 if band[i] > 0 else 0, 1)
        for b in br_bits:
            bw.write(b, 1)
        br_bits = []
        run = 0
    if run > 0 or br_bits:
        st.add_block(br_bits)


def encode_jpeg_progressive(
    img: np.ndarray, quality: int = 85, subsampling: str = "4:2:0"
) -> bytes:
    """Progressive (SOF2) JFIF JPEG from an (h, w, 3) uint8 RGB array.

    Same quantized coefficients as :func:`encode_jpeg` (shared front end),
    entropy-coded as a 20-scan script exercising every progressive scan
    kind: interleaved DC first at Al=1, per-component AC first scans in two
    spectral bands at Al=2, a DC refinement, and two successive AC
    refinement rounds per band (Al 2->1->0). Decoding therefore yields
    pixels bit-identical to decoding the baseline encoding."""
    h, w, hy, qy, qc, quant = _prepare_components(img, quality, subsampling)
    vy = hy
    yq, cbq, crq = quant
    mcus_y, mcus_x = cbq.shape[0], cbq.shape[1]

    # zigzag views: comp -> (blocks_y, blocks_x, 64)
    zzv = [q.reshape(q.shape[0], q.shape[1], 64)[..., _ZZ] for q in quant]
    factors = [(hy, vy), (1, 1), (1, 1)]

    dc_tabs = [
        _huff_codes(_DC_LUMA_BITS, _DC_LUMA_VALS),
        _huff_codes(_DC_CHROMA_BITS, _DC_CHROMA_VALS),
    ]
    ac_tab = _huff_codes(_AC_PROG_BITS, _AC_PROG_VALS)

    def nonintl_grid(ci: int) -> tuple[int, int]:
        fh, fv = factors[ci]
        cw = -(-(w * fh) // hy)
        ch = -(-(h * fv) // vy)
        return -(-ch // 8), -(-cw // 8)

    def dc_scan(al: int, refine: bool) -> bytes:
        bw = _BitWriter()
        preds = [0, 0, 0]
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for ci in range(3):
                    fh, fv = factors[ci]
                    for by in range(fv):
                        for bx in range(fh):
                            dc = int(zzv[ci][my * fv + by, mx * fh + bx, 0])
                            if refine:
                                bw.write((dc >> al) & 1, 1)
                            else:
                                v = dc >> al  # arithmetic shift, per G.1.2.1
                                s, code = _magnitude(v - preds[ci])
                                tab = dc_tabs[0 if ci == 0 else 1]
                                hc, hl = tab[s]
                                bw.write(hc, hl)
                                bw.write(code, s)
                                preds[ci] = v
        bw.flush()
        return bytes(bw.out)

    def ac_scan(ci: int, ss: int, se: int, al: int, refine: bool) -> bytes:
        bw = _BitWriter()
        st = _EobState(bw, ac_tab)
        nby, nbx = nonintl_grid(ci)
        fn = _encode_ac_refine if refine else _encode_ac_first
        for by in range(nby):
            for bx in range(nbx):
                fn(bw, zzv[ci][by, bx], ss, se, al, ac_tab, st)
        st.flush()
        bw.flush()
        return bytes(bw.out)

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    def dht(cls: int, tid: int, bits: list[int], vals: list[int]) -> bytes:
        return bytes([cls << 4 | tid]) + bytes(bits) + bytes(vals)

    def sos(comp_sel: list[tuple[int, int, int]], ss: int, se: int,
            ah: int, al: int) -> bytes:
        p = bytes([len(comp_sel)])
        for cid, td, ta in comp_sel:
            p += bytes([cid, td << 4 | ta])
        return seg(0xFFDA, p + bytes([ss, se, ah << 4 | al]))

    out = bytearray()
    out += struct.pack(">H", 0xFFD8)  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xFFDB, b"\x00" + bytes(qy[_ZZ].astype(np.uint8)))
    out += seg(0xFFDB, b"\x01" + bytes(qc[_ZZ].astype(np.uint8)))
    sof = struct.pack(">BHHB", 8, h, w, 3)
    sof += bytes([1, hy << 4 | vy, 0])
    sof += bytes([2, 0x11, 1])
    sof += bytes([3, 0x11, 1])
    out += seg(0xFFC2, sof)  # SOF2: progressive DCT
    out += seg(
        0xFFC4,
        dht(0, 0, _DC_LUMA_BITS, _DC_LUMA_VALS)
        + dht(0, 1, _DC_CHROMA_BITS, _DC_CHROMA_VALS)
        + dht(1, 0, _AC_PROG_BITS, _AC_PROG_VALS),
    )

    all_dc = [(1, 0, 0), (2, 1, 0), (3, 1, 0)]
    # scan script: DC first (Al=1); AC first low band then high band (Al=2);
    # DC refine; AC refine Al=2->1 then Al=1->0, both bands, per component
    out += sos(all_dc, 0, 0, 0, 1) + dc_scan(1, refine=False)
    for ss, se in ((1, 5), (6, 63)):
        for ci, cid in ((0, 1), (1, 2), (2, 3)):
            out += sos([(cid, 0, 0)], ss, se, 0, 2) + ac_scan(ci, ss, se, 2, False)
    out += sos(all_dc, 0, 0, 1, 0) + dc_scan(0, refine=True)
    for ah, al in ((2, 1), (1, 0)):
        for ss, se in ((1, 5), (6, 63)):
            for ci, cid in ((0, 1), (1, 2), (2, 3)):
                out += sos([(cid, 0, 0)], ss, se, ah, al) + ac_scan(
                    ci, ss, se, al, refine=True
                )
    out += struct.pack(">H", 0xFFD9)  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def _entropy_segments(data: bytes, pos: int) -> tuple[list[bytes], int]:
    """Split the entropy-coded stream starting at ``pos`` into restart
    segments, unstuffing 0xFF00. Returns (segments, position of the next
    marker's 0xFF byte). A restart marker byte-aligns and resets DC
    predictors (and, in progressive AC scans, the EOB run)."""
    segments: list[bytearray] = [bytearray()]
    i = pos
    while i < len(data):
        b = data[i]
        if b == 0xFF:
            nxt = data[i + 1] if i + 1 < len(data) else 0xD9
            if nxt == 0x00:
                segments[-1].append(0xFF)
                i += 2
                continue
            if 0xD0 <= nxt <= 0xD7:  # RSTn
                segments.append(bytearray())
                i += 2
                continue
            break  # EOI or next marker
        segments[-1].append(b)
        i += 1
    return [bytes(s) for s in segments], i


def _reconstruct(
    comps: list[dict], qtables: dict[int, np.ndarray], h: int, w: int,
    hmax: int, vmax: int,
) -> np.ndarray:
    """Dequantize + IDCT (vectorized per component), upsample, color
    convert — shared by the baseline and progressive decode paths (both
    leave zigzag-order quantized coefficients in ``c["coef"]``)."""
    planes = []
    for c in comps:
        q = qtables[c["tq"]]
        nby, nbx = c["coef"].shape[:2]
        # coef holds zigzag-order coefficients; dequantize in zigzag order
        # (q reindexed to zigzag), then scatter to raster for the IDCT
        deq = c["coef"].reshape(-1, 64) * q[_ZZ][None, :]
        raster = np.zeros_like(deq)
        raster[:, _ZZ] = deq
        blocks = raster.reshape(-1, 8, 8).astype(np.float64)
        pix = np.einsum("nk,bkl,lm->bnm", _DCT.T, blocks, _DCT, optimize=True)
        pix = np.clip(np.round(pix + 128.0), 0, 255).astype(np.uint8)
        plane = (
            pix.reshape(nby, nbx, 8, 8)
            .swapaxes(1, 2)
            .reshape(nby * 8, nbx * 8)
        )
        # upsample to full MCU-grid resolution by sample replication
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = plane.repeat(ry, axis=0).repeat(rx, axis=1)
        planes.append(plane[:h, :w].astype(np.float64))

    if len(planes) == 1:  # grayscale
        g = planes[0].astype(np.uint8)
        return np.ascontiguousarray(np.stack([g, g, g], axis=-1))
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def _decode_sym(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in entropy stream")


def _decode_block(
    br: _BitReader, pred: int, dc_tab: dict, ac_tab: dict
) -> tuple[np.ndarray, int]:
    """One block of quantized coefficients in ZIGZAG order + new DC pred."""
    zz = np.zeros(64, np.int64)
    s = _decode_sym(br, dc_tab)
    dc = pred + _extend(br.read(s), s)
    zz[0] = dc
    k = 1
    while k < 64:
        sym = _decode_sym(br, ac_tab)
        r, s = sym >> 4, sym & 0x0F
        if s == 0:
            if r == 15:  # ZRL: 16 zeros
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("AC run past end of block")
        zz[k] = _extend(br.read(s), s)
        k += 1
    return zz, dc


def _nonintl_grid(c: dict, h: int, w: int, hmax: int, vmax: int) -> tuple[int, int]:
    """Block grid of one component in a NON-interleaved scan (T.81 A.2.2:
    ceil of the component's sample dimensions over 8). May be smaller than
    the MCU-padded grid — trailing pad blocks are simply never coded."""
    cw = -(-(w * c["h"]) // hmax)
    ch = -(-(h * c["v"]) // vmax)
    return -(-ch // 8), -(-cw // 8)


def _decode_scan_progressive(
    segments: list[bytes], scan: list[dict], by_id: dict, comps: list[dict],
    band: tuple[int, int], approx: tuple[int, int], restart_interval: int,
    mcus_x: int, mcus_y: int, hmax: int, vmax: int, h: int, w: int,
    dc_tabs: dict, ac_tabs: dict,
) -> None:
    """One progressive scan (T.81 Annex G.2) into the components' zigzag
    coefficient planes. Four scan kinds: DC first (Ss=0, Ah=0; the only
    kind that may interleave several components), DC refinement (Ss=0,
    Ah>0; one raw bit per block), AC first (Ss>0, Ah=0; spectral band with
    EOB-run coding), AC refinement (Ss>0, Ah>0; newly-significant co
    efficients plus correction bits for already-nonzero ones)."""
    ss, se = band
    ah, al = approx
    p1 = 1 << al

    if ss == 0 and se != 0:
        raise ValueError("progressive scan mixes DC and AC (Ss=0, Se>0)")
    if ss > 0 and len(scan) != 1:
        raise ValueError("progressive AC scan must be single-component")

    def refine_nonzero(br: _BitReader, zz: np.ndarray, k: int) -> None:
        # correction bit for an already-nonzero coefficient (G.1.2.3)
        if br.read_bit() and (abs(int(zz[k])) & p1) == 0:
            zz[k] += p1 if zz[k] > 0 else -p1

    def ac_first_block(br: _BitReader, zz: np.ndarray, state: dict) -> None:
        if state["eobrun"] > 0:
            state["eobrun"] -= 1
            return
        ac_tab = state["ac_tab"]
        k = ss
        while k <= se:
            sym = _decode_sym(br, ac_tab)
            r, s = sym >> 4, sym & 0x0F
            if s == 0:
                if r == 15:  # ZRL
                    k += 16
                    continue
                state["eobrun"] = (1 << r) + (br.read(r) if r else 0) - 1
                break
            k += r
            if k > se:
                raise ValueError("AC run past end of spectral band")
            zz[k] = _extend(br.read(s), s) << al
            k += 1

    def ac_refine_block(br: _BitReader, zz: np.ndarray, state: dict) -> None:
        ac_tab = state["ac_tab"]
        k = ss
        if state["eobrun"] == 0:
            while k <= se:
                sym = _decode_sym(br, ac_tab)
                r, s = sym >> 4, sym & 0x0F
                newval = 0
                if s == 0:
                    if r != 15:
                        state["eobrun"] = (1 << r) + (br.read(r) if r else 0)
                        break
                    # ZRL: skip 16 zero-history coefficients below
                elif s == 1:
                    newval = p1 if br.read_bit() else -p1
                else:
                    raise ValueError("AC refinement size > 1")
                # advance past r zero coefficients, refining nonzeros en route
                while k <= se:
                    if zz[k] != 0:
                        refine_nonzero(br, zz, k)
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if newval and k <= se:
                    zz[k] = newval
                k += 1
        if state["eobrun"] > 0:
            while k <= se:  # correction bits only, to the end of the band
                if zz[k] != 0:
                    refine_nonzero(br, zz, k)
                k += 1
            state["eobrun"] -= 1

    for sc in scan:
        c = by_id[sc["id"]]
        if ss == 0 and ah == 0:
            c["dc_tab"] = dc_tabs[sc["dc"]]
        if ss > 0 and ah == 0:
            c["ac_tab"] = ac_tabs[sc["ac"]]

    if ss == 0:  # DC scan: MCU-interleaved when several components
        if len(scan) > 1:
            units = [("mcu", None)] * (mcus_x * mcus_y)
        else:
            c = by_id[scan[0]["id"]]
            nby, nbx = _nonintl_grid(c, h, w, hmax, vmax)
            units = [("blk", divmod(u, nbx)) for u in range(nby * nbx)]
        unit = 0
        for segment in segments:
            if unit >= len(units):
                break
            br = _BitReader(segment)
            preds = {sc["id"]: 0 for sc in scan}
            end = (
                min(unit + restart_interval, len(units))
                if restart_interval
                else len(units)
            )
            while unit < end:
                kind, at = units[unit]
                for sc in scan:
                    c = by_id[sc["id"]]
                    if kind == "mcu":
                        my, mx = divmod(unit, mcus_x)
                        blocks = [
                            (my * c["v"] + by, mx * c["h"] + bx)
                            for by in range(c["v"])
                            for bx in range(c["h"])
                        ]
                    else:
                        blocks = [at]
                    for by, bx in blocks:
                        zz = c["coef"][by, bx]
                        if ah == 0:
                            s = _decode_sym(br, c["dc_tab"])
                            preds[sc["id"]] += _extend(br.read(s), s)
                            zz[0] = preds[sc["id"]] << al
                        elif br.read_bit():
                            zz[0] |= p1
                unit += 1
        if unit < len(units):
            raise ValueError(f"progressive DC scan truncated at {unit}/{len(units)}")
        return

    # AC scan: single component, non-interleaved block order
    sc = scan[0]
    c = by_id[sc["id"]]
    nby, nbx = _nonintl_grid(c, h, w, hmax, vmax)
    state = {"eobrun": 0, "ac_tab": ac_tabs[sc["ac"]]}
    block_fn = ac_first_block if ah == 0 else ac_refine_block
    blk = 0
    total = nby * nbx
    for segment in segments:
        if blk >= total:
            break
        br = _BitReader(segment)
        state["eobrun"] = 0
        end = min(blk + restart_interval, total) if restart_interval else total
        while blk < end:
            by, bx = divmod(blk, nbx)
            block_fn(br, c["coef"][by, bx], state)
            blk += 1
    if blk < total:
        raise ValueError(f"progressive AC scan truncated at {blk}/{total}")


def decode_jpeg(payload: bytes) -> np.ndarray:
    """(h, w, 3) uint8 RGB from a JFIF/JPEG stream.

    Baseline/extended sequential (SOF0/SOF1) and progressive (SOF2) frames,
    honouring the stream's own DQT and DHT tables; grayscale or YCbCr,
    sampling factors up to 2x2, restart intervals, spectral selection and
    successive approximation. Arithmetic-coded frames (SOF9+) raise
    NotImplementedError."""
    data = bytes(payload)
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, dict] = {}
    ac_tabs: dict[int, dict] = {}
    frame = None  # (h, w, components)
    progressive = False
    allocated = False
    any_scan = False
    restart_interval = 0
    scan = None

    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        seg = data[pos + 4 : pos + 2 + seglen]
        pos += 2 + seglen
        if marker == 0xDB:  # DQT (possibly several tables)
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                if pq:  # 16-bit precision
                    tab = np.frombuffer(seg[p : p + 128], ">u2").astype(np.int64)
                    p += 128
                else:
                    tab = np.frombuffer(seg[p : p + 64], np.uint8).astype(np.int64)
                    p += 64
                raster = np.zeros(64, np.int64)
                raster[_ZZ] = tab  # DQT is in zigzag order
                qtables[tq] = raster
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/SOF1/SOF2 (progressive)
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise NotImplementedError(f"JPEG precision {prec} (only 8-bit)")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            frame = (h, w, comps)
            progressive = marker == 0xC2
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(f"JPEG frame type SOF{marker - 0xC0}")
        elif marker == 0xC4:  # DHT (possibly several tables)
            p = 0
            while p < len(seg):
                cls, tid = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1 : p + 17])
                n = sum(bits)
                vals = list(seg[p + 17 : p + 17 + n])
                p += 17 + n
                (ac_tabs if cls else dc_tabs)[tid] = _huff_decode_map(bits, vals)
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS — entropy data follows the header
            ns = seg[0]
            scomps = []
            for i in range(ns):
                cs, tt = seg[1 + 2 * i : 3 + 2 * i]
                scomps.append({"id": cs, "dc": tt >> 4, "ac": tt & 0x0F})
            if not progressive:
                scan = scomps
                break
            # progressive: decode this scan now, keep walking markers
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            h, w, comps = frame
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            mcus_x = -(-w // (8 * hmax))
            mcus_y = -(-h // (8 * vmax))
            if not allocated:
                for c in comps:
                    c["coef"] = np.zeros(
                        (mcus_y * c["v"], mcus_x * c["h"], 64), np.int64
                    )
                allocated = True
            by_id = {c["id"]: c for c in comps}
            segments, pos = _entropy_segments(data, pos)
            _decode_scan_progressive(
                segments, scomps, by_id, comps, (ss, se),
                (ahal >> 4, ahal & 0x0F), restart_interval,
                mcus_x, mcus_y, hmax, vmax, h, w, dc_tabs, ac_tabs,
            )
            any_scan = True
        # APPn / COM / anything else: skipped

    if progressive:
        if frame is None or not any_scan:
            raise ValueError("progressive JPEG missing SOF/SOS")
        h, w, comps = frame
        hmax = max(c["h"] for c in comps)
        vmax = max(c["v"] for c in comps)
        return _reconstruct(comps, qtables, h, w, hmax, vmax)

    if frame is None or scan is None:
        raise ValueError("JPEG missing SOF/SOS")

    segments, _ = _entropy_segments(data, pos)

    h, w, comps = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    by_id = {c["id"]: c for c in comps}
    for sc in scan:
        c = by_id[sc["id"]]
        c["dc_tab"], c["ac_tab"] = dc_tabs[sc["dc"]], ac_tabs[sc["ac"]]
    # quantized coefficient planes, one (blocks_y, blocks_x, 64) per comp
    for c in comps:
        c["coef"] = np.zeros((mcus_y * c["v"], mcus_x * c["h"], 64), np.int64)

    n_mcus = mcus_x * mcus_y
    mcu = 0
    for segment in segments:
        if mcu >= n_mcus:
            break
        br = _BitReader(segment)
        preds = {c["id"]: 0 for c in comps}
        seg_end = (
            min(mcu + restart_interval, n_mcus) if restart_interval else n_mcus
        )
        while mcu < seg_end:
            my, mx = divmod(mcu, mcus_x)
            for sc in scan:
                c = by_id[sc["id"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz, preds[c["id"]] = _decode_block(
                            br, preds[c["id"]], c["dc_tab"], c["ac_tab"]
                        )
                        c["coef"][my * c["v"] + by, mx * c["h"] + bx] = zz
            mcu += 1
    if mcu < n_mcus:
        raise ValueError(f"JPEG truncated: {mcu}/{n_mcus} MCUs decoded")

    return _reconstruct(comps, qtables, h, w, hmax, vmax)
