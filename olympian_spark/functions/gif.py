"""Pure-numpy + stdlib GIF codec (GIF89a, public spec).

Reference parity: the reference engine has no media decode at all — this
module extends the engine's training-data multimodal surface
(operators/multimodal.py) with one more REAL container format, the same
way jpeg.py / flac.py / mjpeg.py do, so feature extraction at scale runs
against genuine bytes instead of a keyed-hash fallback.

Scope: 8-bit palettized RGB, global or local color table, optional
interlacing (all four passes), full variable-width LZW with the
"early change" code-size convention and 4096-entry dictionary reset —
i.e. the format every real-world still GIF uses. Animated GIFs decode as
their first frame (video-shaped media routes through MJPEG-AVI instead).

Encoding is exact for images with <=256 distinct colors; richer images
are first quantized to the fixed 3-3-2 palette (``quantize_332``), which
callers use to derive ground truth ahead of encoding (decode is then
bit-exact, same contract as the PPM/BMP/PNG paths).

The LZW layout is from the public GIF89a specification, Appendix F
(CompuServe, 1990): LSB-first bit packing, clear/EOI codes at
2^min and 2^min+1, code width grows the moment entry (1<<width)-1 is
defined, dictionary resets via an explicit clear code at 4096 entries.
"""

from __future__ import annotations

import struct

import numpy as np

_GIF_SIGS = (b"GIF87a", b"GIF89a")


# ---------------------------------------------------------------------------
# LZW (GIF variant)
# ---------------------------------------------------------------------------

def _lzw_encode(indices: np.ndarray, min_code_size: int = 8) -> bytes:
    """GIF-variant LZW over a flat uint8 index array."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0
    code_size = min_code_size + 1

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += code_size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[tuple[int, int], int] = {}
    next_code = eoi + 1
    emit(clear)
    prefix = -1
    for k in indices.tolist():
        if prefix < 0:
            prefix = k
            continue
        key = (prefix, k)
        hit = table.get(key)
        if hit is not None:
            prefix = hit
            continue
        emit(prefix)
        if next_code < 4096:
            table[key] = next_code
            # early change: entry (1<<w)-1 widens codes emitted after it
            if next_code == (1 << code_size) - 1 and code_size < 12:
                code_size += 1
            next_code += 1
        else:
            emit(clear)
            table.clear()
            code_size = min_code_size + 1
            next_code = eoi + 1
        prefix = k
    if prefix >= 0:
        emit(prefix)
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, min_code_size: int) -> np.ndarray:
    """Inverse of :func:`_lzw_encode`; returns flat uint8 indices."""
    clear = 1 << min_code_size
    eoi = clear + 1
    base = [bytes([i]) for i in range(clear)]
    table: list[bytes] = []
    width = min_code_size + 1
    out = bytearray()
    prev: bytes | None = None
    acc = 0
    nbits = 0
    pos = 0
    n = len(data)
    while True:
        while nbits < width:
            if pos >= n:
                # missing EOI: tolerate (some writers truncate) and stop
                return np.frombuffer(bytes(out), np.uint8)
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = []
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if code < clear:
            entry = base[code]
        elif code - eoi - 1 < len(table):
            entry = table[code - eoi - 1]
        elif code == eoi + 1 + len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError(f"corrupt LZW stream: code {code} out of range")
        out += entry
        if prev is not None and eoi + 1 + len(table) < 4096:
            table.append(prev + entry[:1])
            # early change, one entry EARLIER than the encoder's own bump:
            # the decoder defines each entry one code later than the
            # encoder did, so when its highest code is (1<<w)-2 the
            # encoder already holds (1<<w)-1 and the next code on the wire
            # is w+1 bits (the classic giflib >-vs->= asymmetry)
            if eoi + len(table) == (1 << width) - 2 and width < 12:
                width += 1
        prev = entry
    return np.frombuffer(bytes(out), np.uint8)


# ---------------------------------------------------------------------------
# palette
# ---------------------------------------------------------------------------

def quantize_332(img: np.ndarray) -> np.ndarray:
    """Quantize uint8 RGB to the fixed 3-3-2 palette's representable
    values (8/8/4 rounded levels). Idempotent; callers derive ground
    truth from the quantized image so GIF encode->decode is bit-exact."""
    r = (img[..., 0].astype(np.int32) * 7 + 127) // 255
    g = (img[..., 1].astype(np.int32) * 7 + 127) // 255
    b = (img[..., 2].astype(np.int32) * 3 + 127) // 255
    return np.stack(
        [r * 255 // 7, g * 255 // 7, b * 255 // 3], axis=-1
    ).astype(np.uint8)


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _interlace_order(h: int) -> np.ndarray:
    return np.concatenate(
        [np.arange(start, h, step) for start, step in _INTERLACE_PASSES]
    )


# ---------------------------------------------------------------------------
# container
# ---------------------------------------------------------------------------

def encode_gif(img: np.ndarray, interlace: bool = False) -> bytes:
    """uint8 RGB (h, w, 3) -> single-image GIF89a with a 256-entry global
    color table. Exact palette when the image has <=256 distinct colors,
    else 3-3-2 quantized first (see :func:`quantize_332`)."""
    assert img.ndim == 3 and img.shape[2] == 3 and img.dtype == np.uint8
    h, w, _ = img.shape
    flat = img.reshape(-1, 3).astype(np.int32)
    packed = (flat[:, 0] << 16) | (flat[:, 1] << 8) | flat[:, 2]
    colors, inverse = np.unique(packed, return_inverse=True)
    if colors.size > 256:
        img = quantize_332(img)
        flat = img.reshape(-1, 3).astype(np.int32)
        packed = (flat[:, 0] << 16) | (flat[:, 1] << 8) | flat[:, 2]
        colors, inverse = np.unique(packed, return_inverse=True)
    pal = np.zeros((256, 3), np.uint8)
    pal[: colors.size, 0] = (colors >> 16) & 0xFF
    pal[: colors.size, 1] = (colors >> 8) & 0xFF
    pal[: colors.size, 2] = colors & 0xFF
    indices = inverse.astype(np.uint8).reshape(h, w)
    if interlace:
        indices = indices[_interlace_order(h)]
    # logical screen descriptor: GCT present, color res 8, 256 entries
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0xF7, 0, 0])
    out += pal.tobytes()
    out += b"\x2C" + struct.pack("<HHHH", 0, 0, w, h)
    out += bytes([0x40 if interlace else 0x00])
    out += bytes([8])  # LZW minimum code size
    comp = _lzw_encode(indices.reshape(-1))
    for i in range(0, len(comp), 255):
        chunk = comp[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3B"
    return bytes(out)


def decode_gif(payload: bytes) -> np.ndarray:
    """GIF87a/89a -> uint8 RGB (h, w, 3) of the first image block.
    Handles global and local color tables, interlacing, and skips
    extension blocks (graphic control, comment, application). Truncated
    or corrupt payloads raise ValueError (same contract as the other
    pure-numpy decoders)."""
    try:
        return _decode_gif(payload)
    except (IndexError, struct.error) as e:
        raise ValueError(f"corrupt GIF: {e}") from e


def _decode_gif(payload: bytes) -> np.ndarray:
    if payload[:6] not in _GIF_SIGS:
        raise ValueError("not a GIF file")
    sw, sh, flags, _bg, _aspect = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        size = 2 << (flags & 0x07)
        gct = np.frombuffer(payload, np.uint8, size * 3, pos).reshape(-1, 3)
        pos += size * 3
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks
            pos += 1
            while payload[pos]:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        _left, _top, w, h, iflags = struct.unpack_from("<HHHHB", payload, pos)
        pos += 9
        pal = gct
        if iflags & 0x80:
            size = 2 << (iflags & 0x07)
            pal = np.frombuffer(payload, np.uint8, size * 3, pos).reshape(-1, 3)
            pos += size * 3
        if pal is None:
            raise ValueError("GIF image with no color table")
        min_code = payload[pos]
        pos += 1
        comp = bytearray()
        while payload[pos]:
            ln = payload[pos]
            comp += payload[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        idx = _lzw_decode(bytes(comp), min_code)
        if idx.size < h * w:
            raise ValueError("truncated GIF pixel data")
        idx = idx[: h * w].reshape(h, w)
        if iflags & 0x40:
            rows = np.empty_like(idx)
            rows[_interlace_order(h)] = idx
            idx = rows
        if int(idx.max(initial=0)) >= pal.shape[0]:
            raise ValueError("palette index out of range")
        return pal[idx]
    raise ValueError("GIF contains no image block")
