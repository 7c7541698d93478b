"""Progressive JPEG (SOF2) decode — spectral selection, successive
approximation, EOB-run coding.

The load-bearing property: :func:`encode_jpeg_progressive` entropy-codes
the SAME quantized coefficients as the baseline encoder (shared
``_prepare_components`` front end), so decoding the progressive stream
must yield pixels BIT-IDENTICAL to decoding the baseline stream — any
error anywhere in the 20-scan script (DC first/refine, AC first/refine,
both spectral bands, Al 2->1->0) breaks the equality.
"""

from __future__ import annotations

import numpy as np
import pytest

from olympian_spark.functions.jpeg import (
    decode_jpeg,
    encode_jpeg,
    encode_jpeg_progressive,
)


def _gradient_noise(h: int, w: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [
            (xx * 255 // max(w - 1, 1)),
            (yy * 255 // max(h - 1, 1)),
            rng.integers(0, 256, (h, w)),
        ],
        axis=2,
    ).astype(np.uint8)


@pytest.mark.parametrize("sub", ["4:4:4", "4:2:0"])
@pytest.mark.parametrize(
    "h,w", [(8, 8), (16, 16), (17, 23), (40, 33), (9, 50), (21, 8)]
)
def test_progressive_matches_baseline_bitwise(h, w, sub):
    img = _gradient_noise(h, w, seed=h * 100 + w)
    for q in (50, 85, 95):
        base = decode_jpeg(encode_jpeg(img, quality=q, subsampling=sub))
        prog = decode_jpeg(encode_jpeg_progressive(img, quality=q, subsampling=sub))
        assert np.array_equal(base, prog), (h, w, sub, q)


def test_progressive_is_sof2():
    img = _gradient_noise(24, 24, seed=3)
    payload = encode_jpeg_progressive(img)
    assert payload[:2] == b"\xff\xd8"
    assert b"\xff\xc2" in payload  # SOF2 marker present
    assert b"\xff\xc0" not in payload
    # many scans: the 20-scan script means many SOS markers
    assert payload.count(b"\xff\xda") == 20


def test_progressive_eobrun_spans_blocks():
    """A flat image makes every AC band all-zero -> the encoder folds whole
    block rows into multi-block EOB runs (EOBn with extra bits), which the
    decoder must unwind exactly."""
    img = np.full((64, 64, 3), 77, np.uint8)
    for sub in ("4:4:4", "4:2:0"):
        base = decode_jpeg(encode_jpeg(img, quality=85, subsampling=sub))
        prog = decode_jpeg(encode_jpeg_progressive(img, quality=85, subsampling=sub))
        assert np.array_equal(base, prog), sub
    # and the progressive stream is much smaller than per-block EOBs would
    # be: 8x8 blocks x 6 AC-first scans would dominate otherwise
    assert len(encode_jpeg_progressive(img)) < len(encode_jpeg(img)) * 3


def test_progressive_noise_roundtrip():
    """Dense high-frequency content exercises ZRL-in-refinement and the
    correction-bit buffering paths."""
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (48, 40, 3)).astype(np.uint8)
    for sub in ("4:4:4", "4:2:0"):
        for q in (30, 85):
            base = decode_jpeg(encode_jpeg(img, quality=q, subsampling=sub))
            prog = decode_jpeg(
                encode_jpeg_progressive(img, quality=q, subsampling=sub)
            )
            assert np.array_equal(base, prog), (sub, q)


def test_progressive_roundtrip_property():
    """Hypothesis: arbitrary shapes/content — progressive decode equals
    baseline decode bit-for-bit."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=20, deadline=None)
    @given(
        h=st.integers(1, 40),
        w=st.integers(1, 40),
        seed=st.integers(0, 2**31 - 1),
        sub=st.sampled_from(["4:4:4", "4:2:0"]),
    )
    def check(h, w, seed, sub):
        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
        base = decode_jpeg(encode_jpeg(img, quality=90, subsampling=sub))
        prog = decode_jpeg(encode_jpeg_progressive(img, quality=90, subsampling=sub))
        assert np.array_equal(base, prog)

    check()


def test_progressive_truncation_fails_cleanly():
    """Cutting the stream anywhere raises (never hangs, never returns a
    wrong-shaped array) — the corrupt-payload path decode_verify relies
    on."""
    img = _gradient_noise(24, 32, seed=9)
    payload = encode_jpeg_progressive(img)
    for cut in range(2, len(payload), max(1, len(payload) // 40)):
        try:
            out = decode_jpeg(payload[:cut])
            assert out.shape == (24, 32, 3)
        except (ValueError, NotImplementedError, IndexError, KeyError):
            pass


def test_progressive_fuzz_never_hangs():
    """Arbitrary bytes after a SOF2-bearing prefix either decode or raise."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    img = _gradient_noise(8, 8, seed=1)
    prefix = encode_jpeg_progressive(img)[:40]  # SOI + APP0 + DQT fragment

    @settings(max_examples=40, deadline=None)
    @given(body=st.binary(min_size=0, max_size=300))
    def check(body):
        import struct

        try:
            out = decode_jpeg(prefix + body)
            assert out.ndim == 3 and out.shape[2] == 3
        except (ValueError, NotImplementedError, struct.error, IndexError, KeyError):
            pass

    check()
