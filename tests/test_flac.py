"""FLAC codec (operators/flac_io): lossless round trips across
subframe strategies (constant / fixed / verbatim), Rice residuals
incl. the raw escape, the three stereo decorrelations, ragged last
blocks, coded-number width edges, CRC-8/CRC-16/MD5 verification
(corruption can never decode silently), the info probe, and the
multimodal audio operators consuming FLAC payloads next to WAV."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from archetype_spark.operators import flac_io


def test_crc_vectors():
    # classic check value "123456789"
    assert flac_io._crc8(b"123456789") == 0xF4
    assert flac_io._crc16(b"123456789") == 0xFEE8


def test_coded_number_roundtrip():
    for v in (0, 1, 0x7F, 0x80, 0x7FF, 0x800, 0xFFFF, 0xFFFFF, 2**30):
        bw = flac_io._BitWriter()
        flac_io._write_coded_number(bw, v)
        bw.align()
        br = flac_io._BitReader(bw.bytes())
        assert flac_io._read_coded_number(br) == v, v


@pytest.mark.parametrize("n", [1, 255, 512, 4096, 5000])
def test_roundtrip_noise_mono(n):
    rng = np.random.default_rng(n)
    pcm = rng.integers(-32768, 32768, n, dtype=np.int16)
    f = flac_io.flac_encode_pcm16(pcm, 8000, block_size=512)
    sr, ch, out, bps = flac_io.flac_decode(f)
    assert (sr, ch, bps) == (8000, 1, 16)
    assert (out == pcm).all()


def test_roundtrip_smooth_signal_compresses():
    t = np.arange(10000)
    sig = (1000 * np.sin(2 * np.pi * t / 500)).astype(np.int16)
    sig[:500] = 77  # a constant-subframe block
    f = flac_io.flac_encode_pcm16(sig, 16000, block_size=512)
    _, _, out, _ = flac_io.flac_decode(f)
    assert (out == sig).all()
    assert len(f) < sig.nbytes // 2  # fixed predictors actually help


@pytest.mark.parametrize("mode", ["independent", "left-side", "mid-side"])
def test_roundtrip_stereo_decorrelations(mode):
    rng = np.random.default_rng(3)
    st = np.empty(2 * 3001, dtype=np.int16)
    st[0::2] = (900 * np.sin(2 * np.pi * np.arange(3001) / 250)).astype(
        np.int16
    )
    st[1::2] = (st[0::2] * 0.7).astype(np.int16) + 13
    st[100:110] = rng.integers(-32768, 32768, 10)
    f = flac_io.flac_encode_pcm16(
        st, 44100, channels=2, block_size=600, stereo_mode=mode
    )
    sr, ch, out, _ = flac_io.flac_decode(f)
    assert ch == 2 and (out == st).all()


def test_extreme_values_roundtrip():
    # int16 rails exercise the Rice raw escape and side-channel width
    pcm = np.array([-32768, 32767] * 600, dtype=np.int16)
    f = flac_io.flac_encode_pcm16(pcm, 8000, channels=2, stereo_mode="mid-side")
    _, _, out, _ = flac_io.flac_decode(f)
    assert (out == pcm).all()


def test_info_probe():
    pcm = np.zeros(100, dtype=np.int16)
    f = flac_io.flac_encode_pcm16(pcm, 22050)
    assert flac_io.flac_info(f) == (22050, 1, 16, 100)
    assert flac_io.flac_info(b"RIFF....") is None
    assert flac_io.flac_info(b"") is None


def test_corruption_is_loud():
    rng = np.random.default_rng(9)
    pcm = rng.integers(-2000, 2000, 2000, dtype=np.int16)
    good = flac_io.flac_encode_pcm16(pcm, 8000)
    # flip one bit in each region: frame body (CRC-16), header (CRC-8)
    for off in (len(good) - 10, 4 + 4 + 34 + 2):
        bad = bytearray(good)
        bad[off] ^= 0x10
        with pytest.raises(ValueError):
            flac_io.flac_decode(bytes(bad))
    # an MD5 that disagrees with the (valid) frames is caught too
    bad = bytearray(good)
    bad[4 + 4 + 18] ^= 0xFF  # first md5 byte
    with pytest.raises(ValueError, match="MD5"):
        flac_io.flac_decode(bytes(bad))


def test_decoder_handles_lpc_subframe():
    """Hand-built LPC subframe (order 1, coef 1, shift 0 == the fixed
    order-1 predictor): the encoder never emits LPC, so pin the
    decode path against the analytically expected samples."""
    samples = [100, 103, 109, 118, 130]
    residual = [samples[i] - samples[i - 1] for i in range(1, 5)]
    bw = flac_io._BitWriter()
    bw.write(0x3FFE, 14)
    bw.write(0, 1)
    bw.write(0, 1)
    bw.write(6, 4)   # block size: 8-bit extra
    bw.write(4, 4)   # 8000 Hz
    bw.write(0, 4)   # 1 channel
    bw.write(4, 3)   # 16-bit
    bw.write(0, 1)
    flac_io._write_coded_number(bw, 0)
    bw.write(5 - 1, 8)
    bw.align()
    hdr = bw.bytes()
    frame = bytearray(hdr)
    frame.append(flac_io._crc8(hdr))
    body = flac_io._BitWriter()
    body.write(0, 1)
    body.write(32 + 0, 6)  # LPC order 1
    body.write(0, 1)       # no wasted bits
    body.signed(samples[0], 16)  # warmup
    body.write(15 - 1, 4)  # precision 15
    body.signed(0, 5)      # shift 0
    body.signed(1, 15)     # coefficient 1
    body.write(0, 2)       # rice method 0
    body.write(0, 4)       # partition order 0
    body.write(3, 4)       # rice param
    for r in residual:
        u = (r << 1) if r >= 0 else ((-r) << 1) - 1
        body.unary(u >> 3)
        body.write(u & 7, 3)
    body.align()
    frame += body.bytes()
    frame += struct.pack(">H", flac_io._crc16(frame))
    si = flac_io._BitWriter()
    si.write(5, 16)
    si.write(5, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(8000, 20)
    si.write(0, 3)
    si.write(15, 5)
    si.write(5, 36)
    stream = (
        b"fLaC" + bytes([0x80]) + (34).to_bytes(3, "big")
        + si.bytes() + b"\x00" * 16 + bytes(frame)
    )
    sr, ch, out, bps = flac_io.flac_decode(stream)
    assert out.tolist() == samples


def test_audio_operators_accept_flac(spark):
    from archetype_spark.operators import multimodal

    t = np.arange(4 * 256)
    tone = np.round(12000.0 * np.sin(2 * np.pi * 17 * t / 256)).astype(
        np.int16
    )
    wav = multimodal.wav_encode_pcm16(tone, 8000)
    flc = flac_io.flac_encode_pcm16(tone, 8000, block_size=512)
    media = spark.createDataFrame(
        [(0, bytearray(wav)), (1, bytearray(flc))],
        "media_id long, payload binary",
    )
    out = (
        multimodal.audio_spectral(media, frame_size=256)
        .orderBy("media_id")
        .collect()
    )
    # identical PCM -> identical spectral rows whatever the container
    assert (out[0].n_frames, out[0].dominant_bin) == (4, 17)
    assert (out[1].n_frames, out[1].dominant_bin) == (4, 17)
    feats = (
        multimodal.audio_features(media).orderBy("media_id", "window_idx")
        .collect()
    )
    half = len(feats) // 2
    assert [
        (r.window_idx, r.rms, r.peak) for r in feats[:half]
    ] == [(r.window_idx, r.rms, r.peak) for r in feats[half:]]
