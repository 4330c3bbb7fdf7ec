"""operators/avi_io.py — dependency-free AVI container codec.

Decode is pinned by a HAND-BUILT RIFF layout (assembled with struct,
never avi_encode) so the parser is checked against the public AVI
spec rather than against its own mirror; round-trips then exercise
MJPG (exact via the unit-DC-quant tile argument), DIB (exact for
arbitrary content), the 'rec '-interleaved movi layout, and the
refusal seams (foreign codecs, missing headers, truncation).
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from archetype_spark.operators import avi_io, jpeg_io


def _tile(mid: int, th: int, tw: int) -> np.ndarray:
    vals = np.array(
        [
            [(37 * mid + 11 * r + 23 * c + 5) % 251 for c in range(tw)]
            for r in range(th)
        ],
        dtype=np.uint8,
    )
    return np.kron(vals, np.ones((8, 8), dtype=np.uint8))


def _chunk(cc: bytes, body: bytes) -> bytes:
    return cc + struct.pack("<I", len(body)) + body + b"\x00" * (len(body) & 1)


def _lst(tp: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", tp + body)


def _hand_avi(frames_bytes, w, h, compression, fourcc, fps=10) -> bytes:
    """Minimal spec-shaped AVI assembled by hand (independent of
    avi_encode): RIFF(AVI ) -> hdrl{avih, strl{strh,strf}} ->
    movi{frames}."""
    avih = struct.pack(
        "<14I", 100_000, 0, 0, 0, len(frames_bytes), 0, 1, 0, w, h, 0, 0, 0, 0
    )
    strh = (
        b"vids"
        + compression
        + struct.pack(
            "<I2H8I4h", 0, 0, 0, 0, 1, fps, 0, len(frames_bytes), 0, 0, 0,
            0, 0, w, h,
        )
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, w, h, 1, 24, compression, 0, 0, 0, 0, 0
    )
    hdrl = _lst(
        b"hdrl",
        _chunk(b"avih", avih)
        + _lst(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi = _lst(b"movi", b"".join(_chunk(fourcc, b) for b in frames_bytes))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_hand_built_dib_avi_decodes_known_pixels():
    # 2x2 RGB frame, hand-laid DIB raster: bottom-up BGR rows padded
    # to 4 bytes (2*3=6 -> stride 8)
    px = np.array(
        [[[1, 2, 3], [4, 5, 6]], [[7, 8, 9], [10, 11, 12]]], dtype=np.uint8
    )
    bottom = bytes([9, 8, 7, 12, 11, 10, 0, 0])  # row 1 first (bottom-up)
    top = bytes([3, 2, 1, 6, 5, 4, 0, 0])
    raster = bottom + top
    payload = _hand_avi(
        [raster], 2, 2, struct.pack("<I", 0), b"00db", fps=10
    )
    frames, meta = avi_io.avi_decode_frames(payload)
    assert len(frames) == 1
    assert np.array_equal(frames[0], px)
    assert meta["handler"] == "DIB"
    assert (meta["fps_num"], meta["fps_den"]) == (10, 1)
    assert avi_io.avi_info(payload) == (2, 2, 100, 1)


def test_hand_built_mjpg_avi_decodes_via_jpeg_codec():
    f0, f1 = _tile(1, 2, 2), _tile(2, 2, 2)
    jp = [jpeg_io.jpeg_encode(f, quality_scale=16) for f in (f0, f1)]
    payload = _hand_avi([*jp], 16, 16, b"MJPG", b"00dc")
    frames, meta = avi_io.avi_decode_frames(payload)
    assert meta["handler"] == "MJPG" and meta["n_frames"] == 2
    assert np.array_equal(frames[0], f0)
    assert np.array_equal(frames[1], f1)


@pytest.mark.parametrize("rec_groups", [False, True])
def test_dib_round_trip_arbitrary_content(rec_groups):
    rng = np.random.default_rng(5)
    frames = [rng.integers(0, 256, (9, 5, 3), dtype=np.uint8) for _ in range(4)]
    payload = avi_io.avi_encode(
        frames, fps_num=30, codec="DIB", rec_groups=rec_groups
    )
    dec, meta = avi_io.avi_decode_frames(payload)
    assert meta["n_frames"] == 4
    for a, b in zip(frames, dec):
        assert np.array_equal(a, b)


def test_mjpg_round_trip_exact_at_unit_dc_quant():
    frames = [_tile(m, 3, 2) for m in range(5)]
    payload = avi_io.avi_encode(frames, fps_num=24, codec="MJPG")
    dec, meta = avi_io.avi_decode_frames(payload)
    assert meta["n_frames"] == 5
    for a, b in zip(frames, dec):
        assert np.array_equal(a, b)


def test_gray_dib_expands_to_rgb():
    g = _tile(3, 2, 2)
    payload = avi_io.avi_encode([g], codec="DIB")
    dec, _ = avi_io.avi_decode_frames(payload)
    assert dec[0].shape == (16, 16, 3)
    assert np.array_equal(dec[0], np.repeat(g[:, :, None], 3, axis=2))


def test_audio_stream_is_skipped():
    # a second ('auds') stream before the video one: frame chunks are
    # matched by STREAM INDEX, so '01db' is the video and '00wb' noise
    px = np.zeros((1, 1, 3), dtype=np.uint8)
    raster = bytes([0, 0, 0, 0])
    auds_strh = b"auds" + b"\x00" * 4 + struct.pack(
        "<I2H8I4h", 0, 0, 0, 0, 1, 8000, 0, 1, 0, 0, 0, 0, 0, 0, 0
    )
    vids_strh = b"vids" + struct.pack("<I", 0) + struct.pack(
        "<I2H8I4h", 0, 0, 0, 0, 1, 10, 0, 1, 0, 0, 0, 0, 0, 1, 1
    )
    strf_v = struct.pack(
        "<IiiHH4sIiiII", 40, 1, 1, 1, 24, struct.pack("<I", 0), 0, 0, 0, 0, 0
    )
    avih = struct.pack("<14I", 100_000, 0, 0, 0, 1, 0, 2, 0, 1, 1, 0, 0, 0, 0)
    hdrl = _lst(
        b"hdrl",
        _chunk(b"avih", avih)
        + _lst(b"strl", _chunk(b"strh", auds_strh) + _chunk(b"strf", b"\x00" * 16))
        + _lst(b"strl", _chunk(b"strh", vids_strh) + _chunk(b"strf", strf_v)),
    )
    movi = _lst(
        b"movi", _chunk(b"00wb", b"\x01\x02") + _chunk(b"01db", raster)
    )
    body = b"AVI " + hdrl + movi
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    frames, meta = avi_io.avi_decode_frames(payload)
    assert len(frames) == 1 and np.array_equal(frames[0], px)


def test_refusals_are_loud():
    with pytest.raises(ValueError, match="not an AVI"):
        avi_io.avi_decode_frames(b"RIFF\x04\x00\x00\x00WAVE")
    assert avi_io.avi_info(b"GIF89a") is None
    # foreign codec fourcc refuses naming the gap
    raster = bytes(8)
    payload = _hand_avi([raster], 2, 2, b"H264", b"00dc")
    with pytest.raises(NotImplementedError, match="MJPG and uncompressed"):
        avi_io.avi_decode_frames(payload)
    # truncated chunk overruns its parent
    good = avi_io.avi_encode([np.zeros((2, 2), np.uint8)], codec="DIB")
    with pytest.raises(ValueError):
        avi_io.avi_decode_frames(good[:40])


def test_encode_validates_input():
    with pytest.raises(ValueError, match="at least one frame"):
        avi_io.avi_encode([], codec="DIB")
    with pytest.raises(ValueError, match="share one shape"):
        avi_io.avi_encode(
            [np.zeros((2, 2), np.uint8), np.zeros((3, 2), np.uint8)],
            codec="DIB",
        )
    with pytest.raises(ValueError, match="MJPG or DIB"):
        avi_io.avi_encode([np.zeros((2, 2), np.uint8)], codec="CVID")
