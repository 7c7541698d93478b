"""MJPEG-in-AVI video codec (functions/mjpeg.py) and the video leg of the
multimodal pipeline: real container roundtrip, lossy-budget verification,
robustness, and the decoded frame-sampling operator."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from olympian_spark.functions.mjpeg import decode_avi_mjpeg, encode_avi_mjpeg


def _gradient_frames(nf, h, w, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = np.stack(
        [
            xx * 255 // max(w - 1, 1),
            yy * 255 // max(h - 1, 1),
            rng.integers(0, 256, (h, w)),
        ],
        axis=2,
    )
    return np.clip(
        base[None] + np.arange(nf)[:, None, None, None] * 3, 0, 255
    ).astype(np.uint8)


def test_container_roundtrip_shape_fps_and_lossy_budget():
    frames = _gradient_frames(5, 24, 16)
    payload = encode_avi_mjpeg(frames, fps=8, quality=90)
    out, fps = decode_avi_mjpeg(payload)
    assert fps == 8.0
    assert out.shape == frames.shape and out.dtype == np.uint8
    # per-frame JPEG is lossy: the pixel SUM must sit within the same
    # per-sample budget decode_verify uses for still JPEGs
    diff = abs(int(out.sum(dtype=np.int64)) - int(frames.sum(dtype=np.int64)))
    assert diff <= 2 * frames.size


def test_single_frame_and_word_alignment():
    # odd-length JPEG payloads force the RIFF word-alignment padding path
    for w in (9, 10, 11, 13):
        frames = _gradient_frames(1, 8, w, seed=w)
        out, _ = decode_avi_mjpeg(encode_avi_mjpeg(frames, fps=1))
        assert out.shape == frames.shape


def test_rejects_garbage_and_foreign_handler():
    with pytest.raises(ValueError):
        decode_avi_mjpeg(b"not an avi at all")
    payload = bytearray(encode_avi_mjpeg(_gradient_frames(2, 8, 8), fps=5))
    i = payload.find(b"MJPG", 40)
    payload[i : i + 4] = b"H264"
    with pytest.raises(NotImplementedError):
        decode_avi_mjpeg(bytes(payload))


@settings(max_examples=40, deadline=None)
@given(st.data())
def test_decoder_fuzz_no_hang(data):
    base = bytearray(encode_avi_mjpeg(_gradient_frames(2, 8, 8), fps=5))
    for _ in range(data.draw(st.integers(1, 6))):
        base[data.draw(st.integers(0, len(base) - 1))] = data.draw(
            st.integers(0, 255)
        )
    trunc = data.draw(st.integers(4, len(base)))
    try:
        out, fps = decode_avi_mjpeg(bytes(base[:trunc]))
        assert out.dtype == np.uint8 and out.ndim == 4
    except Exception:
        pass  # any exception is fine; the contract is "never hang"


def test_video_pipeline_real_and_fallback(spark):
    """gen_fake_media now emits half REAL MJPEG videos: decode_verify must
    be green for every video row (mjpeg verified against pre-encode pixel
    sums, h264 via the payload-length fallback), and sample_frame_features
    must fan out one row per sampled timestamp, deterministically."""
    from olympian_spark.operators.multimodal import (
        decode_verify,
        gen_fake_media,
        sample_frame_features,
    )

    media = gen_fake_media(spark, n=72, with_truth=True)
    vids = media.filter("kind = 'video'")
    codecs = {r.codec for r in vids.select("meta.codec").collect()}
    assert codecs == {"h264", "mjpeg"}
    ver = decode_verify(media).filter("kind = 'video'").collect()
    assert len(ver) == 24 and all(r.decode_ok for r in ver)

    sf = sample_frame_features(media, every_ms=1000).collect()
    expect_rows = sum(
        int(r.duration_ms) // 1000 + 1
        for r in vids.select("meta.duration_ms").collect()
    )
    assert len(sf) == expect_rows
    assert all(
        len(r.feature) == 16 and all(0.0 <= x < 1.0 for x in r.feature)
        for r in sf
    )
    again = {
        (r.media_id, r.frame_ms): tuple(r.feature)
        for r in sample_frame_features(media, every_ms=1000).collect()
    }
    assert {(r.media_id, r.frame_ms): tuple(r.feature) for r in sf} == again
