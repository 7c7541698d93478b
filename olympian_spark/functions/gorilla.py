"""Gorilla-style time-series block codec (Pelkonen et al., VLDB 2015).

Per-block encoding of one conversation-bucket's turns:

- **timestamps** (int64 microseconds): delta-of-delta with Gorilla bit
  classes — '0' for dod==0, '10'+7b for [-63,64], '110'+9b for [-255,256],
  '1110'+12b for [-2047,2048], '1111'+64b otherwise (widened from the
  paper's 32b because these are µs-resolution streams, not per-second).
- **float32 stat streams** (turn_gap_s, text_len, ...): XOR with the
  previous value; '0' if identical, '10' + meaningful bits if the XOR fits
  the previous leading/length window, '11' + 5b leading-zero count +
  5b (meaningful length - 1) + bits otherwise. First value raw 32 bits.
  NULL/gap is carried as f32 NaN (bit pattern 0x7fc00000) — the quantile
  kernel drops non-finite values exactly like the reference
  (sct.rs:71-75), so blocks are directly the exact-p95 source.

Layout (little-endian lengths, byte-aligned sections so each stream packs /
unpacks independently):

    magic 'OG1' | u8 n_streams | u32 n_points
    u32 ts_nbytes  | ts bitstream
    per stream: u32 nbytes | bitstream

Encoding is fully vectorized numpy (code/length arrays -> one packbits);
decoding walks the bitstream with an index cursor (variable-length codes are
inherently sequential) — both run inside Arrow-batched applyInPandas,
never per-row Python UDFs.

Lossless roundtrip is property-tested (hypothesis) for arbitrary
non-decreasing int64 timestamps and arbitrary f32 payloads incl. NaN/Inf.
"""

from __future__ import annotations

import struct

import numpy as np

MAGIC = b"OG1"
_NAN_BITS = np.uint32(0x7FC00000)


def _pack(codes: np.ndarray, lens: np.ndarray) -> bytes:
    """MSB-first concatenation of variable-length codes -> packed bytes.

    Scatter per bit position j (one masked numpy op each): total work is
    sum(lens) element writes, independent of the 64-bit max code width.
    """
    codes = codes.astype(np.uint64, copy=False)
    lens = lens.astype(np.int64, copy=False)
    keep = lens > 0
    if not keep.all():
        codes, lens = codes[keep], lens[keep]
    if codes.size == 0:
        return b""
    starts = np.cumsum(lens) - lens
    total = int(starts[-1] + lens[-1])
    out = np.zeros(total, dtype=np.uint8)
    maxlen = int(lens.max())
    for j in range(maxlen):
        m = lens > j
        if m.all():
            sh = (lens - 1 - j).astype(np.uint64)
            out[starts + j] = (codes >> sh) & np.uint64(1)
        else:
            c, l_, s = codes[m], lens[m], starts[m]
            out[s + j] = (c >> (l_ - 1 - j).astype(np.uint64)) & np.uint64(1)
    return np.packbits(out).tobytes()


class _BitReader:
    """Sequential MSB-first bit reader over 64-bit words (O(1) per read)."""

    __slots__ = ("words", "pos")

    def __init__(self, buf: bytes):
        pad = (-len(buf)) % 8 + 8  # extra word so cross-boundary reads are safe
        # plain Python ints: scalar bit ops are ~3x faster than numpy scalars
        self.words = np.frombuffer(buf + b"\x00" * pad, dtype=">u8").astype(np.uint64).tolist()
        self.pos = 0

    def read(self, k: int) -> int:
        pos = self.pos
        i, off = pos >> 6, pos & 63
        w = self.words[i] << off & 0xFFFFFFFFFFFFFFFF
        if off:
            w |= self.words[i + 1] >> (64 - off)
        self.pos = pos + k
        return w >> (64 - k)


_SMALL_N = 256  # below this, Python-int packing beats numpy fixed overhead


def _pack_py(codes: list[int], lens: list[int]) -> bytes:
    """Small-block packer: accumulate into one Python int (MSB-first)."""
    acc = 1  # sentinel top bit so leading zeros survive to_bytes
    for c, l_ in zip(codes, lens):
        acc = (acc << l_) | c
    nbits = acc.bit_length() - 1
    pad = (-nbits) % 8
    acc = (acc << pad) & ((1 << (nbits + pad)) - 1)  # drop sentinel, byte-align
    return acc.to_bytes((nbits + pad) // 8, "big")


def _encode_ts_small(ts: np.ndarray) -> bytes:
    n = ts.size
    t = ts.tolist()
    codes = [(t[0] >> 32) & 0xFFFFFFFF, t[0] & 0xFFFFFFFF]
    lens = [32, 32]
    if n >= 2:
        d = (t[1] - t[0]) & 0xFFFFFFFFFFFFFFFF
        codes += [d >> 32, d & 0xFFFFFFFF]
        lens += [32, 32]
    prev_delta = t[1] - t[0] if n >= 2 else 0
    for i in range(2, n):
        delta = t[i] - t[i - 1]
        dod = delta - prev_delta
        prev_delta = delta
        if dod == 0:
            codes.append(0)
            lens.append(1)
        elif -63 <= dod <= 64:
            codes.append((0b10 << 7) | (dod + 63))
            lens.append(9)
        elif -255 <= dod <= 256:
            codes.append((0b110 << 9) | (dod + 255))
            lens.append(12)
        elif -2047 <= dod <= 2048:
            codes.append((0b1110 << 12) | (dod + 2047))
            lens.append(16)
        else:
            codes.append(0b1111)
            lens.append(4)
            codes.append(dod & 0xFFFFFFFFFFFFFFFF)
            lens.append(64)
    return _pack_py(codes, lens)


def _encode_floats_small(vals: np.ndarray) -> bytes:
    """Small-stream XOR encoder (Python ints, with window reuse)."""
    bits = vals.view(np.uint32).tolist()
    codes = [bits[0]]
    lens = [32]
    prev = bits[0]
    lead_w = len_w = -1
    for cur in bits[1:]:
        x = prev ^ cur
        prev = cur
        if x == 0:
            codes.append(0)
            lens.append(1)
            continue
        lead = 32 - x.bit_length()
        trail = (x & -x).bit_length() - 1
        if lead_w >= 0 and lead >= lead_w and (32 - lead_w - len_w) <= trail:
            codes.append((0b10 << len_w) | (x >> (32 - lead_w - len_w)))
            lens.append(2 + len_w)
        else:
            lead_w, len_w = lead, 32 - lead - trail
            codes.append((((0b11 << 5 | lead) << 5 | (len_w - 1)) << len_w) | (x >> trail))
            lens.append(12 + len_w)
    return _pack_py(codes, lens)


def _encode_ts(ts: np.ndarray) -> bytes:
    n = ts.size
    codes = []
    lens = []
    # first timestamp raw 64b (split into two 32b codes to stay in uint64 math)
    t0 = np.uint64(ts[0].astype(np.uint64))
    codes += [int(t0 >> np.uint64(32)), int(t0 & np.uint64(0xFFFFFFFF))]
    lens += [32, 32]
    if n >= 2:
        d0 = np.uint64(np.int64(ts[1] - ts[0]).astype(np.uint64))
        codes += [int(d0 >> np.uint64(32)), int(d0 & np.uint64(0xFFFFFFFF))]
        lens += [32, 32]
    head = _pack(np.array(codes, dtype=np.uint64), np.array(lens, dtype=np.int64))
    if n < 3:
        return head

    deltas = np.diff(ts)
    dod = np.diff(deltas)  # n-2 values
    m = dod.size
    c1 = np.zeros(m, dtype=np.uint64)
    l1 = np.zeros(m, dtype=np.int64)
    c2 = np.zeros(m, dtype=np.uint64)
    l2 = np.zeros(m, dtype=np.int64)

    zero = dod == 0
    s7 = ~zero & (dod >= -63) & (dod <= 64)
    s9 = ~zero & ~s7 & (dod >= -255) & (dod <= 256)
    s12 = ~zero & ~s7 & ~s9 & (dod >= -2047) & (dod <= 2048)
    big = ~(zero | s7 | s9 | s12)

    l1[zero] = 1  # code '0'
    c1[s7] = (np.uint64(0b10) << np.uint64(7)) | (dod[s7] + 63).astype(np.uint64)
    l1[s7] = 9
    c1[s9] = (np.uint64(0b110) << np.uint64(9)) | (dod[s9] + 255).astype(np.uint64)
    l1[s9] = 12
    c1[s12] = (np.uint64(0b1110) << np.uint64(12)) | (dod[s12] + 2047).astype(np.uint64)
    l1[s12] = 16
    c1[big] = np.uint64(0b1111)
    l1[big] = 4
    c2[big] = dod[big].astype(np.int64).astype(np.uint64)  # two's complement 64b
    l2[big] = 64

    codes_all = np.empty(2 * m, dtype=np.uint64)
    lens_all = np.empty(2 * m, dtype=np.int64)
    codes_all[0::2], codes_all[1::2] = c1, c2
    lens_all[0::2], lens_all[1::2] = l1, l2
    return head + _pack(codes_all, lens_all)


def _decode_ts(buf: bytes, n: int) -> np.ndarray:
    out = np.empty(n, dtype=np.int64)
    if n == 0:
        return out
    r = _BitReader(buf)
    t0 = (r.read(32) << 32) | r.read(32)
    out[0] = np.uint64(t0).astype(np.int64)
    if n == 1:
        return out
    d = np.uint64((r.read(32) << 32) | r.read(32)).astype(np.int64)
    out[1] = out[0] + d
    prev_delta = int(d)
    for i in range(2, n):
        if r.read(1) == 0:
            dod = 0
        elif r.read(1) == 0:
            dod = r.read(7) - 63
        elif r.read(1) == 0:
            dod = r.read(9) - 255
        elif r.read(1) == 0:
            dod = r.read(12) - 2047
        else:
            dod = np.uint64(r.read(64)).astype(np.int64)
        prev_delta += int(dod)
        out[i] = out[i - 1] + prev_delta
    return out


def _encode_floats(vals: np.ndarray) -> bytes:
    """XOR-encode a float32 stream — fully vectorized.

    This encoder always emits the explicit-window form ('11' + 5b lead +
    5b len-1 + bits) for a non-zero XOR; the decoder additionally accepts
    the '10' window-reuse form, so the format stays Gorilla-compatible.
    Trading ~10 bits/point of reuse opportunity buys a numpy-only encode
    path (no per-element Python), which is the right trade inside an
    Arrow-batched kernel.
    """
    bits = vals.view(np.uint32).astype(np.uint64)
    n = bits.size
    x = np.empty(n, dtype=np.uint64)
    x[0] = bits[0]
    x[1:] = bits[1:] ^ bits[:-1]

    nz = x != 0
    xf = x.astype(np.float64)
    # exact for ints < 2^53: bit_length = floor(log2(x)) + 1
    blen = np.zeros(n, dtype=np.int64)
    np.floor(np.log2(xf, where=nz, out=np.zeros(n)), where=nz, out=xf)
    blen[nz] = xf[nz].astype(np.int64) + 1
    lead = np.where(nz, 32 - blen, 0).astype(np.uint64)
    low = (x & (~x + np.uint64(1))).astype(np.float64)  # x & -x
    trail = np.zeros(n, dtype=np.int64)
    np.floor(np.log2(low, where=nz, out=np.zeros(n)), where=nz, out=low)
    trail[nz] = low[nz].astype(np.int64)
    trail = trail.astype(np.uint64)
    mlen = np.uint64(32) - lead - trail

    codes = np.zeros(n, dtype=np.uint64)
    lens = np.ones(n, dtype=np.int64)  # '0' for x==0
    payload = x >> trail
    header = (np.uint64(0b11) << np.uint64(5) | lead) << np.uint64(5) | (
        mlen - np.uint64(1)
    )
    codes[nz] = ((header << mlen) | payload)[nz]
    lens[nz] = (12 + mlen[nz]).astype(np.int64)
    # first value: raw 32 bits
    codes[0] = bits[0]
    lens[0] = 32
    return _pack(codes, lens)


def _decode_floats(buf: bytes, n: int) -> np.ndarray:
    out = np.empty(n, dtype=np.uint32)
    if n == 0:
        return out.view(np.float32)
    r = _BitReader(buf)
    prev = r.read(32)
    out[0] = prev
    lead_w, len_w = -1, -1
    for i in range(1, n):
        if r.read(1) == 0:
            out[i] = prev
            continue
        if r.read(1) == 0:
            x = r.read(len_w) << (32 - lead_w - len_w)
        else:
            lead_w = r.read(5)
            len_w = r.read(5) + 1
            x = r.read(len_w) << (32 - lead_w - len_w)
        prev ^= x
        out[i] = prev
    return out.view(np.float32)


def encode_singleton_blocks(
    ts_us: np.ndarray, stream_a: np.ndarray, stream_b: np.ndarray
) -> list[bytes]:
    """Vectorized encoder for n==1 two-stream blocks (the dominant shape of
    a 1-minute tier over sparse conversations). A singleton block has a
    fixed 36-byte layout: header(8) | len(4)+ts_be(8) | len(4)+f32_be(4) |
    len(4)+f32_be(4) — assembled as one numpy byte matrix. Byte-identical
    to ``encode_block(ts[i:i+1], [a[i:i+1], b[i:i+1]])`` (property-tested).
    """
    m = ts_us.size
    buf = np.empty((m, 36), dtype=np.uint8)
    buf[:, 0:3] = np.frombuffer(MAGIC, dtype=np.uint8)
    buf[:, 3] = 2  # n_streams
    buf[:, 4:8] = np.frombuffer(struct.pack("<I", 1), dtype=np.uint8)  # n=1
    buf[:, 8:12] = np.frombuffer(struct.pack("<I", 8), dtype=np.uint8)
    buf[:, 12:20] = (
        np.ascontiguousarray(ts_us, dtype=np.int64)
        .astype(">i8")
        .view(np.uint8)
        .reshape(m, 8)
    )
    four = np.frombuffer(struct.pack("<I", 4), dtype=np.uint8)
    buf[:, 20:24] = four
    buf[:, 24:28] = (
        np.ascontiguousarray(stream_a, dtype=np.float32)
        .view(np.uint32)
        .astype(">u4")
        .view(np.uint8)
        .reshape(m, 4)
    )
    buf[:, 28:32] = four
    buf[:, 32:36] = (
        np.ascontiguousarray(stream_b, dtype=np.float32)
        .view(np.uint32)
        .astype(">u4")
        .view(np.uint8)
        .reshape(m, 4)
    )
    return [row.tobytes() for row in buf]


def encode_block(ts_us: np.ndarray, streams: list[np.ndarray]) -> bytes:
    """Encode one block: int64 µs timestamps + k float32 stat streams
    (NaN = gap). All streams must have len(ts_us)."""
    ts = np.ascontiguousarray(ts_us, dtype=np.int64)
    n = ts.size
    small = n < _SMALL_N
    parts = [MAGIC, struct.pack("<BI", len(streams), n)]
    tsb = (_encode_ts_small(ts) if small else _encode_ts(ts)) if n else b""
    parts.append(struct.pack("<I", len(tsb)))
    parts.append(tsb)
    for s in streams:
        s = np.ascontiguousarray(s, dtype=np.float32)
        if s.size != n:
            raise ValueError("stream length mismatch")
        sb = (_encode_floats_small(s) if small else _encode_floats(s)) if n else b""
        parts.append(struct.pack("<I", len(sb)))
        parts.append(sb)
    return b"".join(parts)


def decode_block(buf: bytes) -> tuple[np.ndarray, list[np.ndarray]]:
    if buf[:3] != MAGIC:
        raise ValueError("bad block magic")
    k, n = struct.unpack_from("<BI", buf, 3)
    off = 3 + 5
    (ts_len,) = struct.unpack_from("<I", buf, off)
    off += 4
    ts = _decode_ts(buf[off : off + ts_len], n)
    off += ts_len
    streams = []
    for _ in range(k):
        (sl,) = struct.unpack_from("<I", buf, off)
        off += 4
        streams.append(_decode_floats(buf[off : off + sl], n))
        off += sl
    return ts, streams
