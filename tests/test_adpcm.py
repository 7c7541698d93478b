"""IMA-ADPCM and µ-law WAV codecs (functions/adpcm.py) — numpy-only."""

import struct

import numpy as np
import pytest

from olympian_spark.functions.adpcm import (
    _BLOCK_ALIGN,
    _SPB,
    decode_wav_any,
    encode_wav_adpcm,
    encode_wav_mulaw,
    mulaw_decode,
    mulaw_encode,
)


def _sig(n, seed=0, rate=8000):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / rate
    return (
        0.5 * np.sin(2 * np.pi * 440 * t)
        + 0.2 * np.sin(2 * np.pi * 1870 * t)
        + 0.05 * rng.standard_normal(n)
    ).astype(np.float32)


@pytest.mark.parametrize("n", [1, 2, _SPB - 1, _SPB, _SPB + 1, 3 * _SPB + 17])
def test_adpcm_decoder_matches_encoder_reconstruction_exactly(n):
    """The vectorized-across-blocks decoder must reproduce the encoder's
    tracked predictor states bit-exactly — single and multi block, with
    last-block padding trimmed via the fact chunk."""
    s = _sig(n, seed=n)
    wav, recon = encode_wav_adpcm(s, 8000)
    out, rate = decode_wav_any(wav)
    assert rate == 8000 and out.size == n
    pcm = np.round(out.astype(np.float64) * 32768.0).astype(np.int64)
    assert (pcm == recon.astype(np.int64)).all()


def test_adpcm_is_a_faithful_lossy_codec():
    """Reconstruction must actually track the signal (SNR), not just be
    self-consistent."""
    s = _sig(4000, seed=3)
    _, recon = encode_wav_adpcm(s, 8000)
    orig = np.clip(np.round(s.astype(np.float64) * 32768.0), -32768, 32767)
    err = orig - recon
    snr_db = 10 * np.log10(
        np.mean(orig**2) / max(np.mean(err**2), 1e-9)
    )
    assert snr_db > 20  # IMA ADPCM typically lands 20-30 dB on speech-ish

    # 4:1-ish compression (4-bit nibbles + block headers) vs PCM-16
    wav, _ = encode_wav_adpcm(s, 8000)
    assert len(wav) < 0.30 * (2 * s.size)


def test_adpcm_blocks_are_independent():
    """Each block header restarts the predictor: decoding a payload whose
    data chunk is truncated to whole blocks still yields those blocks'
    exact samples (the property that makes across-block vectorization —
    and at-scale chunked decode — valid)."""
    s = _sig(3 * _SPB, seed=9)
    wav, recon = encode_wav_adpcm(s, 8000)
    # locate the data chunk and rebuild a 2-block payload
    pos = 12
    while wav[pos : pos + 4] != b"data":
        size = struct.unpack_from("<I", wav, pos + 4)[0]
        pos += 8 + size + (size & 1)
    body = wav[pos + 8 :]
    two = body[: 2 * _BLOCK_ALIGN]
    fmtpos = wav.index(b"fmt ")
    fmt = wav[fmtpos : fmtpos + 8 + 20]
    fact = b"fact" + struct.pack("<II", 4, 2 * _SPB)
    payload = b"WAVE" + fmt + fact + b"data" + struct.pack("<I", len(two)) + two
    short = b"RIFF" + struct.pack("<I", len(payload)) + payload
    out, _ = decode_wav_any(short)
    pcm = np.round(out.astype(np.float64) * 32768.0).astype(np.int64)
    assert (pcm == recon[: 2 * _SPB].astype(np.int64)).all()


def test_mulaw_known_values_and_symmetry():
    enc = mulaw_encode(np.array([0, 1, -1, 32767, -32768], np.int16))
    assert enc[0] == 0xFF  # zero encodes to 0xFF in µ-law
    assert enc[3] == 0x80 and enc[4] == 0x00  # extremes
    dec = mulaw_decode(enc)
    assert dec[0] == 0
    assert dec[3] == -dec[4] == 32124  # G.711 max magnitude
    # symmetric: enc(-x) flips only the sign bit for x in the clip range
    x = np.arange(1, 32000, 37, np.int16)
    assert (mulaw_encode(-x) == (mulaw_encode(x) ^ 0x80)).all()


def test_mulaw_roundtrip_error_bounded():
    """decode(encode(x)) is within the segment's step of x, monotone in
    segments: logarithmic companding, fine near zero, coarse at the top."""
    pcm = np.arange(-32768, 32768, 7, dtype=np.int16)
    rec = mulaw_decode(mulaw_encode(pcm)).astype(np.int32)
    err = np.abs(rec - pcm.astype(np.int32))
    mag = np.abs(pcm.astype(np.int32))
    assert (err[mag < 100] <= 8).all()
    assert (err <= np.maximum(mag // 16, 8) + 4).all()


def test_mulaw_wav_roundtrip_exact_vs_reconstruction():
    s = _sig(777, seed=5)
    wav, recon = encode_wav_mulaw(s, 16_000)
    out, rate = decode_wav_any(wav)
    assert rate == 16_000 and out.size == 777
    pcm = np.round(out.astype(np.float64) * 32768.0).astype(np.int64)
    assert (pcm == recon.astype(np.int64)).all()


def test_decode_wav_any_dispatches_pcm16():
    from olympian_spark.operators.multimodal import encode_wav_pcm16

    s = _sig(300, seed=6)
    out, rate = decode_wav_any(encode_wav_pcm16(s, 22_050))
    assert rate == 22_050 and out.size == 300


def test_decode_wav_any_rejects_unknown():
    fmt = struct.pack("<HHIIHH", 0x0055, 1, 8000, 8000, 1, 8)  # mp3-in-wav
    payload = (
        b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", 4) + b"\x00" * 4
    )
    with pytest.raises(NotImplementedError):
        decode_wav_any(b"RIFF" + struct.pack("<I", len(payload)) + payload)
    with pytest.raises(ValueError):
        decode_wav_any(b"OggS" + b"\x00" * 30)
