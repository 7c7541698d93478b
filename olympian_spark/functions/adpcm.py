"""Compressed-WAV audio codecs, pure numpy + stdlib: IMA ADPCM and G.711 µ-law.

Reference parity: the reference engine has no media decode — like gif.py
and flac.py this extends the multimodal surface with real compressed
formats so the at-scale feature-extraction path runs on genuine bytes.

Both codecs are lossy but DETERMINISTIC: the encoder tracks the exact
reconstruction the decoder will produce (IMA's predictor loop / µ-law's
256-value expansion table), so generators can record ground-truth sample
sums ahead of encoding and ``decode_verify`` checks integer-exact.

Layouts are from the public specs: IMA ADPCM per the IMA Digital Audio
Focus/Technical Working Group recommendations (wave format tag 0x0011,
4-byte block headers, low-nibble-first 4-bit codes); µ-law per ITU-T
G.711 (wave format tag 0x0007, 8-bit samples).

Scale note: the IMA decoder is vectorized ACROSS blocks — blocks are
independent given their headers, so a whole payload decodes as
``samples_per_block`` numpy steps over an ``(n_blocks,)`` vector rather
than a per-sample Python loop. Encoding (test/datagen-side only) is a
plain loop.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# IMA ADPCM tables (public spec)
# ---------------------------------------------------------------------------

_STEP = np.array(
    [7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
     41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
     190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
     724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
     2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
     6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
     16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767],
    np.int32,
)
_INDEX_ADJ = np.array([-1, -1, -1, -1, 2, 4, 6, 8], np.int32)

_BLOCK_ALIGN = 256  # bytes per mono block
_SPB = (_BLOCK_ALIGN - 4) * 2 + 1  # samples per block (header carries one)


def _ima_reconstruct(nibble: int, step: int) -> int:
    diffq = step >> 3
    if nibble & 4:
        diffq += step
    if nibble & 2:
        diffq += step >> 1
    if nibble & 1:
        diffq += step >> 2
    return -diffq if nibble & 8 else diffq


def encode_wav_adpcm(
    samples: np.ndarray, rate: int = 16_000
) -> tuple[bytes, np.ndarray]:
    """float32 mono [-1, 1] -> (IMA-ADPCM WAV bytes, int16 reconstruction).

    The second return value is the sample stream a correct decoder must
    reproduce bit-exactly — the encoder's own predictor states — which is
    the ground truth :func:`...multimodal.gen_fake_media` records."""
    pcm = np.clip(
        np.round(samples.astype(np.float64) * 32768.0), -32768, 32767
    ).astype(np.int32)
    n = int(pcm.size)
    n_blocks = max(1, -(-n // _SPB))
    recon = np.empty(n_blocks * _SPB, np.int32)
    data = bytearray()
    idx = 0
    pos = 0
    for _b in range(n_blocks):
        pred = int(pcm[pos]) if pos < n else int(recon[pos - 1]) if pos else 0
        data += struct.pack("<hBB", pred, idx, 0)
        recon[pos] = pred
        pos += 1
        byte = 0
        half = False
        for j in range(_SPB - 1):
            s = int(pcm[pos]) if pos < n else pred
            step = int(_STEP[idx])
            diff = s - pred
            nib = 0
            if diff < 0:
                nib = 8
                diff = -diff
            if diff >= step:
                nib |= 4
                diff -= step
            if diff >= step >> 1:
                nib |= 2
                diff -= step >> 1
            if diff >= step >> 2:
                nib |= 1
            pred = int(
                np.clip(pred + _ima_reconstruct(nib, step), -32768, 32767)
            )
            idx = int(np.clip(idx + _INDEX_ADJ[nib & 7], 0, 88))
            recon[pos] = pred
            pos += 1
            if half:
                data.append(byte | (nib << 4))
                half = False
            else:
                byte = nib
                half = True
    body = bytes(data)
    fmt = struct.pack(
        "<HHIIHHHH", 0x0011, 1, rate,
        rate * _BLOCK_ALIGN // _SPB, _BLOCK_ALIGN, 4, 2, _SPB,
    )
    fact = struct.pack("<I", n)
    payload = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<I", len(fact)) + fact
        + b"data" + struct.pack("<I", len(body)) + body
    )
    wav = b"RIFF" + struct.pack("<I", len(payload)) + payload
    return wav, recon[:n].astype(np.int16)


def _decode_ima_blocks(body: bytes, block_align: int, n_samples: int) -> np.ndarray:
    """Vectorized-across-blocks IMA decode -> int32 samples."""
    nb = len(body) // block_align
    if nb == 0:
        return np.zeros(0, np.int32)
    blocks = np.frombuffer(body, np.uint8, nb * block_align).reshape(
        nb, block_align
    )
    pred = (
        blocks[:, 0].astype(np.int32) | (blocks[:, 1].astype(np.int32) << 8)
    )
    pred = np.where(pred >= 32768, pred - 65536, pred)
    idx = np.clip(blocks[:, 2].astype(np.int32), 0, 88)
    payload = blocks[:, 4:]
    nibs = np.empty((nb, payload.shape[1] * 2), np.int32)
    nibs[:, 0::2] = payload & 0x0F
    nibs[:, 1::2] = payload >> 4
    spb = nibs.shape[1] + 1
    out = np.empty((nb, spb), np.int32)
    out[:, 0] = pred
    for j in range(nibs.shape[1]):
        n = nibs[:, j]
        step = _STEP[idx]
        diffq = (
            (step >> 3)
            + np.where(n & 4, step, 0)
            + np.where(n & 2, step >> 1, 0)
            + np.where(n & 1, step >> 2, 0)
        )
        pred = np.clip(
            pred + np.where(n & 8, -diffq, diffq), -32768, 32767
        )
        idx = np.clip(idx + _INDEX_ADJ[n & 7], 0, 88)
        out[:, j + 1] = pred
    return out.reshape(-1)[:n_samples]


# ---------------------------------------------------------------------------
# G.711 µ-law
# ---------------------------------------------------------------------------

_MULAW_BIAS = 0x84
_MULAW_CLIP = 32635
# floor(log2(v)) for v in 1..255 (0 -> 0): exponent of the biased magnitude's
# top byte, the classic G.711 segment lookup
_EXP_LUT = np.array(
    [0] + [v.bit_length() - 1 for v in range(1, 256)], np.int32
)


def mulaw_encode(pcm: np.ndarray) -> np.ndarray:
    """int16 -> uint8 µ-law codes, fully vectorized."""
    pcm = pcm.astype(np.int32)
    sign = np.where(pcm < 0, 0x80, 0)
    mag = np.minimum(np.abs(pcm), _MULAW_CLIP) + _MULAW_BIAS
    exp = _EXP_LUT[mag >> 7]
    mant = (mag >> (exp + 3)) & 0x0F
    return (~(sign | (exp << 4) | mant) & 0xFF).astype(np.uint8)


def _mulaw_table() -> np.ndarray:
    code = np.arange(256, dtype=np.int32)
    u = ~code & 0xFF
    exp = (u >> 4) & 7
    mant = u & 0x0F
    mag = (((mant << 3) + _MULAW_BIAS) << exp) - _MULAW_BIAS
    return np.where(u & 0x80, -mag, mag).astype(np.int16)


_MULAW_DECODE = _mulaw_table()


def mulaw_decode(codes: np.ndarray) -> np.ndarray:
    """uint8 µ-law codes -> int16, one table gather."""
    return _MULAW_DECODE[codes.astype(np.uint8)]


def encode_wav_mulaw(
    samples: np.ndarray, rate: int = 16_000
) -> tuple[bytes, np.ndarray]:
    """float32 mono [-1, 1] -> (µ-law WAV bytes, int16 reconstruction)."""
    pcm = np.clip(
        np.round(samples.astype(np.float64) * 32768.0), -32768, 32767
    ).astype(np.int16)
    codes = mulaw_encode(pcm)
    body = codes.tobytes()
    fmt = struct.pack("<HHIIHHH", 0x0007, 1, rate, rate, 1, 8, 0)
    fact = struct.pack("<I", pcm.size)
    payload = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<I", len(fact)) + fact
        + b"data" + struct.pack("<I", len(body)) + body
    )
    return b"RIFF" + struct.pack("<I", len(payload)) + payload, mulaw_decode(codes)


# ---------------------------------------------------------------------------
# unified RIFF walk
# ---------------------------------------------------------------------------

def decode_wav_any(payload: bytes) -> tuple[np.ndarray, int]:
    """(float32 mono samples in [-1, 1], rate) from a WAV of format tag
    0x0001 (PCM-16), 0x0011 (IMA ADPCM) or 0x0007 (µ-law). PCM-16 defers
    to the existing multimodal decoder (multi-channel downmix lives
    there); the compressed tags are mono-only, as written by the encoders
    above."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, fmt_body, data, n_fact = 12, None, None, None
    while pos + 8 <= len(payload):
        cid, size = struct.unpack_from("<4sI", payload, pos)
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt_body = body
        elif cid == b"data":
            data = body
        elif cid == b"fact":
            n_fact = struct.unpack_from("<I", body, 0)[0]
        pos += 8 + size + (size & 1)
    if fmt_body is None or data is None:
        raise ValueError("missing fmt/data chunk")
    tag, channels, rate = struct.unpack_from("<HHI", fmt_body, 0)
    if tag == 0x0001:
        from olympian_spark.operators.multimodal import decode_wav_pcm16

        return decode_wav_pcm16(payload)
    if channels != 1:
        raise ValueError("compressed WAV decode is mono-only")
    if tag == 0x0011:
        block_align = struct.unpack_from("<H", fmt_body, 12)[0]
        n = n_fact if n_fact is not None else (
            (len(data) // block_align) * ((block_align - 4) * 2 + 1)
        )
        pcm = _decode_ima_blocks(data, block_align, n)
        return pcm.astype(np.float32) / np.float32(32768.0), rate
    if tag == 0x0007:
        codes = np.frombuffer(data, np.uint8)
        if n_fact is not None:
            codes = codes[:n_fact]
        return (
            mulaw_decode(codes).astype(np.float32) / np.float32(32768.0),
            rate,
        )
    raise NotImplementedError(f"WAV format tag 0x{tag:04x} needs soundfile")
