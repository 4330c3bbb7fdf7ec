"""Compressed-audio codecs (operators/audio_codecs.py): G.711
mu-law/A-law pinned by the standards' known byte values and an
INDEPENDENT plain-loop decode (the numpy path must agree bit-exactly
— decode is deterministic even though the codecs are lossy), IMA
ADPCM pinned by a hand-stepped two-sample vector plus SNR-bounded
round-trips, and the WAV container dispatch incl. the fact-chunk
truncation and stereo word interleave."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from archetype_spark.operators import multimodal
from archetype_spark.operators.audio_codecs import (
    INDEX_TABLE,
    STEP_TABLE,
    alaw_decode,
    alaw_encode,
    ima_adpcm_decode,
    ima_adpcm_decode_block,
    ima_adpcm_encode,
    ulaw_decode,
    ulaw_encode,
    wav_encode_compressed,
    wav_fact_frames,
)


def _tone(k: int, n_samples: int, amp: float = 12000.0) -> np.ndarray:
    t = np.arange(n_samples)
    return np.round(amp * np.sin(2 * np.pi * k * t / 256)).astype(np.int16)


def test_g711_known_values():
    # ITU-T G.711 table anchors
    assert ulaw_decode(bytes([0xFF])).tolist() == [0]
    assert ulaw_decode(bytes([0x7F])).tolist() == [0]  # negative zero
    assert ulaw_decode(bytes([0x00])).tolist() == [-32124]  # max negative
    assert ulaw_decode(bytes([0x80])).tolist() == [32124]  # max positive
    assert alaw_decode(bytes([0x55])).tolist() == [-8]
    assert alaw_decode(bytes([0xD5])).tolist() == [8]
    assert alaw_decode(bytes([0x2A])).tolist() == [-32256]  # max negative


def test_ulaw_numpy_agrees_with_plain_loop():
    """Decode is deterministic: the vectorized path must equal an
    independent per-byte implementation of the spec arithmetic."""

    def plain(b):
        out = []
        for byte in b:
            u = (~byte) & 0xFF
            sign, exp, mant = u & 0x80, (u >> 4) & 0x07, u & 0x0F
            mag = (((mant << 3) + 0x84) << exp) - 0x84
            out.append(-mag if sign else mag)
        return out

    data = bytes(range(256))
    assert ulaw_decode(data).tolist() == plain(data)


def test_alaw_numpy_agrees_with_plain_loop():
    def plain(b):
        out = []
        for byte in b:
            a = byte ^ 0x55
            sign, exp, mant = a & 0x80, (a >> 4) & 0x07, a & 0x0F
            if exp == 0:
                mag = (mant << 4) + 8
            else:
                mag = ((mant << 4) + 0x108) << (exp - 1)
            out.append(mag if sign else -mag)
        return out

    data = bytes(range(256))
    assert alaw_decode(data).tolist() == plain(data)


@pytest.mark.parametrize("codec,dec,enc", [
    ("ulaw", ulaw_decode, ulaw_encode),
    ("alaw", alaw_decode, alaw_encode),
])
def test_g711_roundtrip_error_bounded(codec, dec, enc):
    tone = _tone(17, 6 * 256)
    rec = dec(enc(tone)).astype(np.int32)
    err = np.abs(rec - tone.astype(np.int32))
    # logarithmic companding: relative error ~ 1/32 of magnitude
    assert err.max() < 1100


def test_ima_adpcm_hand_stepped_block():
    """A mono block hand-stepped through the spec arithmetic:
    predictor 100, index 4 (step 11), nibbles 0b0101 then 0b1000.
    nibble 5 (bits 0+2): diff = 11>>3 + 11>>2 + 11 = 1+2+11 = 14
      -> 114, index 4 + INDEX_TABLE[5] = 8 (step 16)
    nibble 8 (sign only): diff = 16>>3 = 2, negative -> 112,
      index 8 + INDEX_TABLE[8] = 7."""
    block = struct.pack("<hBB", 100, 4, 0) + bytes([0x85]) + bytes(3)
    out = ima_adpcm_decode_block(block, 1, 3)
    assert out.tolist() == [100, 114, 112]


def test_ima_adpcm_tables_are_spec():
    assert len(STEP_TABLE) == 89
    assert STEP_TABLE[0] == 7 and STEP_TABLE[88] == 32767
    assert INDEX_TABLE.tolist() == [-1, -1, -1, -1, 2, 4, 6, 8] * 2


@pytest.mark.parametrize("channels", [1, 2])
def test_ima_adpcm_roundtrip_snr(channels):
    tone = _tone(17, 6 * 256)
    pcm = (
        tone
        if channels == 1
        else np.column_stack([tone, (tone // 2).astype(np.int16)]).reshape(-1)
    )
    data = ima_adpcm_encode(pcm, channels, 505)
    rec = ima_adpcm_decode(data, channels, 256 * channels, 505)[: len(pcm)]
    err = rec.astype(np.int64) - pcm.astype(np.int64)
    snr = 10 * np.log10(
        (pcm.astype(np.int64) ** 2).mean() / max((err**2).mean(), 1)
    )
    assert snr > 20, snr


def test_wav_container_dispatch_and_fact_truncation():
    sr = 8000
    tone = _tone(11, 5 * 256 + 37)  # ragged: fact must truncate pads
    for codec in ("ulaw", "alaw", "ima_adpcm"):
        payload = wav_encode_compressed(tone, sr, codec)
        assert wav_fact_frames(payload) == len(tone)
        rate, ch, samples = multimodal._wav_pcm(payload)
        assert (rate, ch) == (sr, 1)
        assert len(samples) == len(tone)
        # spectral dominance survives the lossy codec
        mag = np.abs(np.fft.rfft(samples[:256].astype(np.float64)))
        assert mag.argmax() == 11, codec


def test_wav_stereo_adpcm_word_interleave():
    tone = _tone(21, 5 * 256)
    st = np.column_stack([tone, tone]).reshape(-1)
    payload = wav_encode_compressed(st, 8000, "ima_adpcm", channels=2)
    _rate, ch, samples = multimodal._wav_pcm(payload)
    assert ch == 2 and len(samples) == len(st)
    pairs = samples.reshape(-1, 2)
    # identical channels must decode identically (a word-interleave
    # bug would desynchronize them)
    assert np.array_equal(pairs[:, 0], pairs[:, 1])


def test_unknown_compressed_format_still_refuses():
    body = struct.pack("<HHIIHH", 2, 1, 8000, 8000, 1, 8)  # MS ADPCM
    payload = (
        b"RIFF" + struct.pack("<I", 36) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + body
        + b"data" + struct.pack("<I", 0)
    )
    with pytest.raises(NotImplementedError, match="format 2"):
        multimodal._wav_pcm(payload)
