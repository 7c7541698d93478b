"""Gorilla block codec: lossless roundtrip property (Tier C, hypothesis) +
compression sanity on realistic turn streams."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from olympian_spark.functions.gorilla import decode_block, encode_block


def _roundtrip(ts, streams):
    ts = np.asarray(ts, dtype=np.int64)
    streams = [np.asarray(s, dtype=np.float32) for s in streams]
    buf = encode_block(ts, streams)
    ts2, streams2 = decode_block(buf)
    assert ts2.tolist() == ts.tolist()
    for a, b in zip(streams, streams2):
        # bit-exact incl. NaN payloads
        assert a.view(np.uint32).tolist() == b.view(np.uint32).tolist()
    return buf


@given(
    st.lists(st.integers(min_value=0, max_value=10**7), min_size=0, max_size=200),
    st.lists(
        st.floats(width=32, allow_nan=True, allow_infinity=True), min_size=0, max_size=200
    ),
)
@settings(max_examples=200, deadline=None)
def test_roundtrip_property(gaps, floats):
    n = min(len(gaps), len(floats))
    ts = 1_700_000_000_000_000 + np.cumsum(np.asarray(gaps[:n], dtype=np.int64))
    _roundtrip(ts, [np.asarray(floats[:n], dtype=np.float32)])


def test_empty_and_singleton():
    _roundtrip([], [[]])
    _roundtrip([123456], [[3.14]])
    _roundtrip([1, 1], [[float("nan"), float("nan")]])


def test_multi_stream_and_nan_gaps():
    ts = np.arange(100, dtype=np.int64) * 60_000_000 + 1_700_000_000_000_000
    gap = np.random.default_rng(3).normal(60, 5, 100).astype(np.float32)
    gap[::7] = np.nan  # gaps carried as NaN
    tl = np.random.default_rng(4).integers(0, 500, 100).astype(np.float32)
    _roundtrip(ts, [gap, tl])


def test_compression_ratio_on_regular_stream():
    """Regular cadence + slowly varying stats: the Gorilla sweet spot."""
    n = 1000
    ts = 1_700_000_000_000_000 + np.arange(n, dtype=np.int64) * 30_000_000
    vals = np.full(n, 42.5, dtype=np.float32)
    buf = encode_block(ts, [vals])
    raw = n * (8 + 4)
    assert len(buf) < raw / 8, f"expected >8x compression, got {raw / len(buf):.1f}x"


def test_negative_dod_and_large_jumps():
    ts = np.array(
        [0, 10, 15, 100000, 100001, 100002, 2**40, 2**40 + 1], dtype=np.int64
    )
    _roundtrip(ts, [np.arange(8, dtype=np.float32)])


def test_singleton_blocks_byte_identical():
    from olympian_spark.functions.gorilla import encode_singleton_blocks

    rng = np.random.default_rng(8)
    ts = rng.integers(0, 2**60, size=500).astype(np.int64)
    a = rng.normal(0, 100, 500).astype(np.float32)
    b = rng.integers(0, 1000, 500).astype(np.float32)
    a[::7] = np.nan
    vec = encode_singleton_blocks(ts, a, b)
    for i in range(500):
        ref = encode_block(ts[i : i + 1], [a[i : i + 1], b[i : i + 1]])
        assert vec[i] == ref, f"mismatch at {i}"


def test_decode_throughput():
    """The byte-aligned OG2 layout exists so decode is numpy-vectorized:
    >=5M pts/s nominal (~10-25M measured). Assert a 3M floor so the test
    doesn't flake during this VM's CPU-steal episodes while still failing
    hard if anyone reintroduces a per-point decode loop (~0.3M pts/s)."""
    import time

    rng = np.random.default_rng(1)
    n = 1_000_000
    ts = 1_700_000_000_000_000 + np.cumsum(
        rng.integers(0, 3_000_000, n).astype(np.int64)
    )
    g = rng.normal(60, 5, n).astype(np.float32)
    g[::7] = np.nan
    tl = rng.integers(0, 500, n).astype(np.float32)
    buf = encode_block(ts, [g, tl])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        decode_block(buf)
        best = min(best, time.perf_counter() - t0)
    rate = n / best
    assert rate >= 3_000_000, f"decode too slow: {rate/1e6:.2f}M pts/s"


@given(st.data())
@settings(max_examples=60, deadline=None)
def test_small_path_byte_identical_across_boundary(data):
    """The small-block encoders (_encode_*_small, plain Python) must be
    byte-identical to the vectorized general encoders for EVERY n — pinned
    explicitly at the _SMALL_N boundary (n in {1, 2, 31, 32, 33}) so future
    codec edits to either path fail here instead of silently diverging.
    encode_block dispatches on n < _SMALL_N; this checks both paths on the
    same input regardless of which one dispatch would pick."""
    from olympian_spark.functions.gorilla import (
        _SMALL_N,
        _encode_floats,
        _encode_floats_small,
        _encode_ts,
        _encode_ts_small,
    )

    assert _SMALL_N == 32  # boundary set below assumes this
    n = data.draw(st.sampled_from([1, 2, 31, 32, 33]))
    gaps = data.draw(
        st.lists(st.integers(min_value=0, max_value=10**7), min_size=n, max_size=n)
    )
    vals = data.draw(
        st.lists(
            st.floats(width=32, allow_nan=True, allow_infinity=True),
            min_size=n,
            max_size=n,
        )
    )
    ts = 1_700_000_000_000_000 + np.cumsum(np.asarray(gaps, dtype=np.int64))
    fl = np.asarray(vals, dtype=np.float32)
    assert _encode_ts(ts) == _encode_ts_small(ts)
    assert _encode_floats(fl) == _encode_floats_small(fl)
    # and the dispatching public encoder still roundtrips at the boundary
    _roundtrip(ts, [fl])


def test_og1_blocks_rejected_with_rebuild_hint():
    """Pre-OG2 catalogs hold OG1 blocks; decode must fail with the rebuild
    guidance rather than a generic magic error."""
    import pytest

    with pytest.raises(ValueError, match="full refresh"):
        decode_block(b"OG1" + b"\x01" + b"\x00" * 16)


def test_encode_blocks_bit_identical_to_per_block():
    """The vectorized multi-block encoder must produce byte-identical blocks
    to encode_block over every segment slice — across n in {0,1,2,3,small,
    >=_SMALL_N}, empty segments, all dod/xor payload classes, NaN/Inf."""
    import numpy as np

    from olympian_spark.functions.gorilla import (
        decode_block,
        encode_block,
        encode_blocks,
    )

    rng = np.random.default_rng(0)

    def check(counts, big_dod=False):
        counts = np.asarray(counts, np.int64)
        n = int(counts.sum())
        ts = np.empty(n, np.int64)
        pos = 0
        for c in counts:
            base = rng.integers(-(2**40), 2**40)
            scale = 2**35 if big_dod else [1, 100, 40000, 2**34][rng.integers(0, 4)]
            gaps = rng.integers(0, scale, c) if c else np.empty(0, np.int64)
            ts[pos : pos + c] = base + np.cumsum(gaps)
            pos += c

        def f32s():
            a = rng.normal(0, 1e3, n).astype(np.float32)
            m = rng.random(n)
            a[m < 0.2] = np.float32(np.nan)
            a[m > 0.95] = np.float32(np.inf)
            if n > 3:  # runs of equal values exercise class-0 xors
                a[1::3] = a[0::3][: a[1::3].size]
            return a

        a, b = f32s(), f32s()
        starts = np.concatenate(([0], np.cumsum(counts)))
        batch = encode_blocks(ts, [a, b], starts)
        for i in range(len(counts)):
            s, e = starts[i], starts[i + 1]
            ref = encode_block(ts[s:e], [a[s:e], b[s:e]])
            assert batch[i].as_py() == ref, f"bucket {i} n={counts[i]}"
            t2, (a2, b2) = decode_block(batch[i].as_py())
            assert (t2 == ts[s:e]).all()
            assert (a2.view(np.uint32) == a[s:e].view(np.uint32)).all()
            assert (b2.view(np.uint32) == b[s:e].view(np.uint32)).all()

    for _ in range(10):
        check(rng.integers(0, 40, rng.integers(1, 40)))
    check([0])
    check([0, 0, 0])
    check([1, 0, 2, 0, 3])
    check([31, 32, 33, 200])
    check([5, 7, 9], big_dod=True)


def test_compute_quantile_segmented_bit_identical():
    """Vectorized per-segment p95 must bit-match the scalar oracle kernel
    on every slice (incl. empty segments -> NaN and extreme magnitudes)."""
    import numpy as np

    from olympian_spark.oracle.quantile import (
        compute_quantile,
        compute_quantile_segmented,
    )

    rng = np.random.default_rng(3)
    for _ in range(50):
        counts = rng.integers(0, 25, rng.integers(1, 40))
        vals = rng.normal(0, 1e3, counts.sum()).astype(np.float32)
        if vals.size > 4:
            vals[0] = np.float32(1e-40)
            vals[1] = np.float32(3.4e38)
            vals[2] = np.float32(-3.4e38)
        starts = np.concatenate(([0], np.cumsum(counts)))
        got = compute_quantile_segmented(0.95, vals, starts)
        for i, c in enumerate(counts):
            s, e = starts[i], starts[i + 1]
            if c == 0:
                assert np.isnan(got[i])
            else:
                want = compute_quantile(0.95, vals[s:e])
                assert (
                    np.float32(got[i]).view(np.uint32)
                    == np.float32(want).view(np.uint32)
                ), (i, got[i], want)
