"""FLAC codec (functions/flac.py): lossless roundtrip, full decoder
surface (LPC, Rice escape, wasted bits, stereo decorrelation, partition
orders), CRC/MD5 integrity, and robustness against corrupt payloads.

The encoder only emits constant/fixed subframes with partition-order-0
Rice — the decoder-only paths (LPC, escape, wasted bits, mid/side, high
partition orders) are exercised with hand-built spec-conformant streams
assembled from the module's own bit-writer + CRC primitives."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from olympian_spark.functions import flac as fl
from olympian_spark.functions.flac import decode_flac, encode_flac
from olympian_spark.operators.multimodal import decode_wav_pcm16, encode_wav_pcm16


def _quant(s):
    return np.clip(np.round(np.asarray(s, np.float64) * 32768.0), -32768, 32767)


def test_roundtrip_matches_wav_path():
    """FLAC is lossless: decode(encode(s)) must equal the WAV-path decode
    of the same float signal, bit-exactly (same quantization contract)."""
    rng = np.random.default_rng(7)
    rate = 8000
    t = np.arange(3201) / rate
    s = (
        0.5 * np.sin(2 * np.pi * 440 * t)
        + 0.2 * np.sin(2 * np.pi * 2000 * t)
        + 0.05 * rng.standard_normal(t.size)
    ).astype(np.float32)
    out, r = decode_flac(encode_flac(s, rate))
    ref, _ = decode_wav_pcm16(encode_wav_pcm16(s, rate))
    assert r == rate
    assert np.array_equal(out, ref)


def test_multi_frame_and_partial_final_block():
    # 20000 samples > 4 x 4096: four full frames + one partial
    s = (0.3 * np.sin(2 * np.pi * 300 * np.arange(20_000) / 16_000)).astype(
        np.float32
    )
    out, r = decode_flac(encode_flac(s, 16_000))
    assert r == 16_000 and out.size == 20_000
    assert np.array_equal(np.round(out.astype(np.float64) * 32768.0), _quant(s))


def test_constant_subframe_and_tiny_payload():
    p = encode_flac(np.full(1000, 0.25, np.float32), 8000)
    out, _ = decode_flac(p)
    assert np.unique(out).size == 1 and out.size == 1000
    assert len(p) < 100  # constant subframe, not 2000 bytes of PCM


def test_stereo_independent_roundtrip():
    rng = np.random.default_rng(1)
    left = (0.4 * np.sin(2 * np.pi * 200 * np.arange(5000) / 8000)).astype(
        np.float32
    )
    right = (0.1 * rng.standard_normal(5000)).astype(np.float32)
    out, _ = decode_flac(encode_flac(np.stack([left, right], 1), 8000))
    expect = (_quant(left) + _quant(right)).astype(np.float32) / 2 / np.float32(32768.0)
    assert np.array_equal(out, expect)


@settings(max_examples=50, deadline=None)
@given(
    n=st.integers(1, 9000),
    seed=st.integers(0, 2**31),
    kind=st.sampled_from(["noise", "sine", "ramp", "steps", "extreme"]),
)
def test_roundtrip_property(n, seed, kind):
    rng = np.random.default_rng(seed)
    if kind == "noise":
        s = rng.uniform(-1, 1, n).astype(np.float32)
    elif kind == "sine":
        s = (0.9 * np.sin(np.arange(n) * rng.uniform(0.001, 1.0))).astype(np.float32)
    elif kind == "ramp":
        s = np.linspace(-1, 1, n, dtype=np.float32)
    elif kind == "steps":
        s = (rng.integers(-3, 4, n) / 4.0).astype(np.float32)
    else:  # full-scale extremes incl. the +1.0 clip edge
        s = rng.choice(np.array([-1.0, -0.5, 0.0, 0.5, 1.0], np.float32), n)
    out, r = decode_flac(encode_flac(s, 16_000))
    assert r == 16_000
    assert np.array_equal(np.round(out.astype(np.float64) * 32768.0), _quant(s))


# ---------------------------------------------------------------------------
# hand-built streams for decoder-only paths
# ---------------------------------------------------------------------------


def _streaminfo(n, rate=8000, channels=1, bps=16, md5=b"\x00" * 16):
    si = fl._BitWriter()
    si.write(4096, 16)
    si.write(4096, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(rate, 20)
    si.write(channels - 1, 3)
    si.write(bps - 1, 5)
    si.write(n, 36)
    body = si.tobytes() + md5
    return b"fLaC" + bytes([0x80]) + len(body).to_bytes(3, "big") + body


def _frame_header(bs, rate, ch_assign):
    hdr = bytearray(b"\xff\xf8")
    hdr.append((0b0111 << 4) | 0b1101)
    hdr.append((ch_assign << 4) | (0b100 << 1))
    hdr.append(0)  # frame number 0 (utf8)
    hdr += (bs - 1).to_bytes(2, "big")
    hdr += rate.to_bytes(2, "big")
    hdr.append(fl._crc8(bytes(hdr)))
    return bytes(hdr)


def _finish_frame(hdr, w):
    frame = hdr + w.tobytes()
    return frame + fl._crc16(frame).to_bytes(2, "big")


def test_lpc_subframe_decode():
    """Hand-built order-2 LPC subframe: decoder must reproduce the exact
    integer recursion s[i] = (c0*s[i-1] + c1*s[i-2] >> shift) + res[i]."""
    bs, order, prec, shift = 64, 2, 12, 5
    coefs = [57, -26]  # ~ a damped resonator in Q5
    warm = [100, 103]
    rng = np.random.default_rng(3)
    res = rng.integers(-40, 40, bs - order)
    # reference recursion
    s = list(warm)
    for i in range(order, bs):
        acc = coefs[0] * s[i - 1] + coefs[1] * s[i - 2]
        s.append((acc >> shift) + int(res[i - order]))
    w = fl._BitWriter()
    w.write(0, 1)
    w.write(0b100000 | (order - 1), 6)
    w.write(0, 1)
    for v in warm:
        w.write(v & 0xFFFF, 16)
    w.write(prec - 1, 4)
    w.write(shift & 0x1F, 5)
    for c in coefs:
        w.write(c & ((1 << prec) - 1), prec)
    u = fl._zigzag(np.asarray(res))
    k, _ = fl._best_rice_k(u)
    w.write(0, 2)
    w.write(0, 4)
    w.write(k, 4)
    w.write_bits(fl._rice_encode_bits(u, k))
    payload = _streaminfo(bs) + _finish_frame(_frame_header(bs, 8000, 0), w)
    out, _ = decode_flac(payload, verify_md5=False)
    assert np.array_equal(np.round(out * 32768.0), np.array(s, np.float64))


def test_rice_escape_and_partition_order():
    """Partition order 2 (4 partitions), one partition escaped to verbatim
    9-bit residuals, one escaped to all-zero (ebps=0)."""
    bs, order = 64, 1
    warm = [5]
    per = bs // 4
    parts = [
        np.arange(per - order) - 10,          # rice partition
        np.full(per, 200, np.int64),          # escape verbatim (needs 9+ bits)
        np.zeros(per, np.int64),              # escape ebps=0
        np.arange(per) % 7 - 3,               # rice again
    ]
    res = np.concatenate(parts)
    sig = np.cumsum(np.concatenate(([warm[0]], res)))  # order-1 restore
    w = fl._BitWriter()
    w.write(0, 1)
    w.write(0b001000 | order, 6)
    w.write(0, 1)
    w.write(warm[0] & 0xFFFF, 16)
    w.write(0, 2)   # method 0
    w.write(2, 4)   # partition order 2
    for pi, pres in enumerate(parts):
        if pi == 1:
            w.write(15, 4)  # escape
            w.write(9, 5)
            for v in pres.tolist():
                w.write(v & 0x1FF, 9)
        elif pi == 2:
            w.write(15, 4)
            w.write(0, 5)   # ebps=0: all zero, no bits
        else:
            u = fl._zigzag(pres)
            k, _ = fl._best_rice_k(u)
            w.write(k, 4)
            w.write_bits(fl._rice_encode_bits(u, k))
    payload = _streaminfo(bs) + _finish_frame(_frame_header(bs, 8000, 0), w)
    out, _ = decode_flac(payload, verify_md5=False)
    assert np.array_equal(np.round(out * 32768.0), sig.astype(np.float64))


def test_wasted_bits_decode():
    """Subframe with 3 wasted bits: samples decoded at bps-3 then shifted
    left — the spec's mechanism for e.g. 13-bit-significant PCM."""
    bs = 32
    vals = (np.arange(bs) - 16) << 3  # all divisible by 8
    w = fl._BitWriter()
    w.write(0, 1)
    w.write(0b000001, 6)  # verbatim
    w.write(1, 1)         # wasted flag
    w.write(0b001, 3)     # unary 2 zeros + 1 => wasted = 3
    for v in (vals >> 3).tolist():
        w.write(int(v) & 0x1FFF, 13)
    payload = _streaminfo(bs) + _finish_frame(_frame_header(bs, 8000, 0), w)
    out, _ = decode_flac(payload, verify_md5=False)
    assert np.array_equal(np.round(out * 32768.0), vals.astype(np.float64))


@pytest.mark.parametrize("assign", [8, 9, 10])
def test_stereo_decorrelation_modes(assign):
    """left/side, right/side and mid/side reconstruction: the decoder must
    invert the decorrelation exactly (side channel carries bps+1 bits)."""
    bs = 48
    rng = np.random.default_rng(assign)
    left = rng.integers(-30000, 30000, bs).astype(np.int64)
    right = rng.integers(-30000, 30000, bs).astype(np.int64)
    side = left - right
    if assign == 8:
        chans = [(left, 16), (side, 17)]
    elif assign == 9:
        chans = [(side, 17), (right, 16)]
    else:
        mid = (left + right) >> 1
        chans = [(mid, 16), (side, 17)]
    w = fl._BitWriter()
    for vals, bps in chans:
        w.write(0, 1)
        w.write(0b000001, 6)  # verbatim keeps the test about decorrelation
        w.write(0, 1)
        for v in vals.tolist():
            w.write(int(v) & ((1 << bps) - 1), bps)
    payload = _streaminfo(bs, channels=2) + _finish_frame(
        _frame_header(bs, 8000, assign), w
    )
    out, _ = decode_flac(payload, verify_md5=False)
    expect = (left + right).astype(np.float64) / 2.0
    assert np.array_equal(out.astype(np.float64) * 32768.0, expect)


# ---------------------------------------------------------------------------
# integrity + robustness
# ---------------------------------------------------------------------------


def test_md5_and_crc_detect_tampering():
    s = (0.3 * np.sin(np.arange(2000) * 0.01)).astype(np.float32)
    p = bytearray(encode_flac(s, 8000))
    # STREAMINFO md5 lives at bytes 8+18 .. 8+34: flip one bit there
    bad_md5 = bytearray(p)
    bad_md5[8 + 18] ^= 0x01
    with pytest.raises(ValueError):
        decode_flac(bytes(bad_md5))
    # flip a bit in the audio frame body: CRC-16 (or header CRC-8) trips
    bad_body = bytearray(p)
    bad_body[len(p) // 2] ^= 0x10
    with pytest.raises(ValueError):
        decode_flac(bytes(bad_body))


@settings(max_examples=60, deadline=None)
@given(st.data())
def test_decoder_fuzz_no_hang(data):
    """Arbitrary mutations of a valid stream must raise (ValueError /
    NotImplementedError) or return quickly — never hang or segfault.
    Mirrors the JPEG decoder fuzz contract."""
    s = (0.2 * np.sin(np.arange(600) * 0.05)).astype(np.float32)
    base = bytearray(encode_flac(s, 8000))
    n_mut = data.draw(st.integers(1, 8))
    for _ in range(n_mut):
        i = data.draw(st.integers(0, len(base) - 1))
        base[i] = data.draw(st.integers(0, 255))
    trunc = data.draw(st.integers(4, len(base)))
    result = None
    try:
        result = decode_flac(bytes(base[:trunc]))
    except Exception:
        pass  # any exception is fine; the contract is "never hang"
    if result is not None:
        out, rate = result
        assert out.dtype == np.float32 and rate >= 0


def test_gen_fake_media_emits_flac(spark):
    """The generator now alternates wav/flac; every audio row must
    decode_verify green (FLAC is lossless, so the quantized-sum ground
    truth is identical to the WAV contract)."""
    from olympian_spark.operators.multimodal import decode_verify, gen_fake_media

    media = gen_fake_media(spark, n=48, with_truth=True)
    codecs = {
        r.codec
        for r in media.filter("kind = 'audio'").select("meta.codec").collect()
    }
    assert codecs == {"wav", "flac", "adpcm", "ulaw"}
    ok = decode_verify(media).filter("kind = 'audio'").collect()
    assert len(ok) == 16 and all(r.decode_ok for r in ok)
