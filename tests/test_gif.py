"""GIF codec (functions/gif.py): LZW, palettes, interlace — numpy-only."""

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from olympian_spark.functions.gif import (
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    encode_gif,
    quantize_332,
)


def test_lzw_roundtrip_small():
    rng = np.random.default_rng(0)
    for n in (1, 2, 17, 300):
        data = rng.integers(0, 256, n).astype(np.uint8)
        assert (_lzw_decode(_lzw_encode(data), 8) == data).all()


def test_lzw_roundtrip_forces_dict_reset():
    """>3838 new dictionary entries forces the 4096-entry clear/reset path
    (and every code width 9..12) — random bytes add ~1 entry per symbol."""
    rng = np.random.default_rng(1)
    data = rng.integers(0, 256, 20_000).astype(np.uint8)
    assert (_lzw_decode(_lzw_encode(data), 8) == data).all()
    # highly repetitive data exercises long-match codes + KwKwK
    rep = np.tile(np.arange(4, dtype=np.uint8), 5000)
    assert (_lzw_decode(_lzw_encode(rep), 8) == rep).all()
    run = np.zeros(10_000, np.uint8)  # degenerate single-symbol run
    assert (_lzw_decode(_lzw_encode(run), 8) == run).all()


@given(st.binary(min_size=1, max_size=600))
@settings(max_examples=60, deadline=None)
def test_lzw_roundtrip_property(raw):
    data = np.frombuffer(raw, np.uint8)
    assert (_lzw_decode(_lzw_encode(data), 8) == data).all()


def _gradient(h, w, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [
            xx * 255 // max(w - 1, 1),
            yy * 255 // max(h - 1, 1),
            rng.integers(0, 256, (h, w)),
        ],
        axis=2,
    ).astype(np.uint8)


@pytest.mark.parametrize("h,w", [(1, 1), (3, 5), (16, 16), (33, 47)])
def test_gif_roundtrip_few_colors_exact(h, w):
    rng = np.random.default_rng(h * 100 + w)
    pal = rng.integers(0, 256, (7, 3), np.uint8)
    img = pal[rng.integers(0, 7, (h, w))]
    assert (decode_gif(encode_gif(img)) == img).all()


def test_gif_rich_image_roundtrips_as_quantized():
    img = _gradient(40, 40)
    q = quantize_332(img)
    assert (decode_gif(encode_gif(img)) == q).all()
    # quantize is idempotent, so pre-quantized images are bit-exact
    assert (decode_gif(encode_gif(q)) == q).all()
    assert (quantize_332(q) == q).all()


@pytest.mark.parametrize("h", [1, 2, 7, 8, 9, 31])
def test_gif_interlace_roundtrip(h):
    img = quantize_332(_gradient(h, 11, seed=h))
    assert (decode_gif(encode_gif(img, interlace=True)) == img).all()
    assert (decode_gif(encode_gif(img, interlace=False)) == img).all()


def test_gif_roundtrip_property():
    """Any uint8 RGB image with <=256 colors survives bit-exact."""
    from hypothesis import given as _given

    @_given(
        st.integers(1, 24), st.integers(1, 24), st.integers(0, 2**32 - 1),
        st.booleans(),
    )
    @settings(max_examples=40, deadline=None)
    def inner(h, w, seed, interlace):
        rng = np.random.default_rng(seed)
        ncol = int(rng.integers(1, 257))
        pal = rng.integers(0, 256, (ncol, 3), np.uint8)
        img = pal[rng.integers(0, ncol, (h, w))]
        assert (decode_gif(encode_gif(img, interlace=interlace)) == img).all()

    inner()


def test_gif_skips_extension_blocks():
    """A graphic-control extension before the image descriptor (what real
    GIF89a writers emit) must be skipped cleanly."""
    img = quantize_332(_gradient(9, 13, seed=3))
    raw = encode_gif(img)
    desc = raw.index(b"\x2C", 13 + 768)  # first image descriptor
    gce = b"\x21\xF9\x04\x00\x00\x00\x00\x00"
    comment = b"\x21\xFE\x05hello\x00"
    spliced = raw[:desc] + gce + comment + raw[desc:]
    assert (decode_gif(spliced) == img).all()


def test_gif_local_color_table():
    """Hand-built GIF with NO global table and a local one."""
    rng = np.random.default_rng(7)
    pal = rng.integers(0, 256, (4, 3), np.uint8)
    idx = rng.integers(0, 4, (6, 5)).astype(np.uint8)
    lct = np.zeros((256, 3), np.uint8)
    lct[:4] = pal
    comp = _lzw_encode(idx.reshape(-1))
    raw = bytearray(b"GIF89a")
    raw += struct.pack("<HH", 5, 6) + bytes([0x07, 0, 0])  # no GCT
    raw += b"\x2C" + struct.pack("<HHHH", 0, 0, 5, 6) + bytes([0x87])
    raw += lct.tobytes() + bytes([8])
    for i in range(0, len(comp), 255):
        chunk = comp[i : i + 255]
        raw += bytes([len(chunk)]) + chunk
    raw += b"\x00\x3B"
    assert (decode_gif(bytes(raw)) == pal[idx]).all()


def test_gif_rejects_garbage():
    with pytest.raises(ValueError):
        decode_gif(b"NOTAGIF" + b"\x00" * 40)
    img = quantize_332(_gradient(5, 5))
    raw = encode_gif(img)
    with pytest.raises(ValueError):
        decode_gif(raw[:20])  # truncated: no image block survives
    # image with no color table anywhere
    bad = bytearray(raw)
    bad[10] &= 0x7F  # clear GCT flag (table bytes now parse as garbage)
    with pytest.raises(ValueError):
        decode_gif(bytes(bad))


def test_gif_magic_sniffing_in_dispatch():
    from olympian_spark.operators.multimodal import decode_image

    img = quantize_332(_gradient(6, 7))
    assert (decode_image(encode_gif(img), {}) == img).all()
    assert (decode_image(encode_gif(img), {"codec": "gif"}) == img).all()


def test_quantize_332_levels():
    img = np.array([[[0, 0, 0], [255, 255, 255], [130, 40, 200]]], np.uint8)
    q = quantize_332(img)
    assert (q[0, 0] == [0, 0, 0]).all()
    assert (q[0, 1] == [255, 255, 255]).all()
    r, g, b = q[0, 2]
    assert r in {k * 255 // 7 for k in range(8)}
    assert g in {k * 255 // 7 for k in range(8)}
    assert b in {k * 255 // 3 for k in range(4)}
    # every channel value is the nearest representable level
    assert abs(int(r) - 130) <= 19 and abs(int(g) - 40) <= 19
    assert abs(int(b) - 200) <= 43
