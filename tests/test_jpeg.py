"""Baseline JPEG codec (operators/jpeg_io.py).

The load-bearing case is the HAND-BUILT payload: a DC-only JPEG
assembled byte-by-byte from the ITU-T T.81 spec in this file, with
the expected pixels derived from the standard's own IDCT formula by
hand — completely independent of the encoder, so an encode/decode
pair sharing one misreading of the spec cannot pass. Round-trip
property tests then exercise the full pipeline (4:4:4 / 4:2:0,
restart markers, byte stuffing) within the quantization error bound.
No Spark session needed — pure numpy."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from archetype_spark.operators import jpeg_io
from archetype_spark.operators.image_probe import jpeg_dims


def _seg(marker: int, body: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body


def _dc_only_jpeg(width_blocks: int, entropy: bytes) -> bytes:
    """A grayscale baseline JPEG, 8 rows x 8*width_blocks cols, DQT
    all ones, ONE DC Huffman code ('0' -> category 6) and ONE AC code
    ('0' -> EOB). Every block is then [1-bit DC code][6 magnitude
    bits][1-bit EOB] = exactly one byte of entropy data per block."""
    out = b"\xff\xd8"
    out += _seg(0xDB, bytes([0x00]) + bytes([1] * 64))  # DQT tq=0, all 1
    out += _seg(
        0xC0,
        struct.pack(">BHHB", 8, 8, 8 * width_blocks, 1) + bytes([1, 0x11, 0]),
    )
    one_code = bytes([1] + [0] * 15)  # one code of length 1
    out += _seg(0xC4, bytes([0x00]) + one_code + bytes([6]))  # DC: cat 6
    out += _seg(0xC4, bytes([0x10]) + one_code + bytes([0x00]))  # AC: EOB
    out += _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    return out + entropy + b"\xff\xd9"


def test_hand_built_dc_only_block_decodes_to_spec_value():
    """One 8x8 block, DC diff +40 (category 6, magnitude bits
    101000), EOB. T.81 A.3.3 with only F(0,0)=40 and quant 1:
    f(x,y) = 1/4 * (1/sqrt2)^2 * 40 = 5 for every pixel, level-shift
    +128 -> a uniform 133. Entropy byte: 0|101000|0 = 0x50."""
    img = jpeg_io.jpeg_decode(_dc_only_jpeg(1, bytes([0x50])))
    assert img.shape == (8, 8)
    assert (img == 133).all()


def test_hand_built_dc_prediction_across_blocks():
    """Two blocks: diff1=+40 (DC 40 -> 133), diff2=-33 encoded as
    category 6 with magnitude bits 30=011110 (T.81 F.2.2.1: value
    30 < 2^5 -> EXTEND gives 30 - 63 = -33), so DC2 = 7 ->
    7/8 + 128 = 128.875 -> 129. Stream 0|101000|0 0|011110|0 =
    0x50 0x3C."""
    img = jpeg_io.jpeg_decode(_dc_only_jpeg(2, bytes([0x50, 0x3C])))
    assert img.shape == (8, 16)
    assert (img[:, :8] == 133).all()
    assert (img[:, 8:] == 129).all()


def test_roundtrip_gray_and_color_within_quant_bound():
    x, y = np.meshgrid(np.arange(37), np.arange(29))
    gray = ((x * 3 + y * 5) % 200 + 20).astype(np.uint8)
    enc = jpeg_io.jpeg_encode(gray, quality_scale=8)
    dec = jpeg_io.jpeg_decode(enc)
    assert dec.shape == gray.shape
    assert np.abs(dec.astype(int) - gray.astype(int)).max() <= 8
    assert jpeg_dims(enc) == (37, 29)

    rgb = np.dstack(
        [(x * 2 + y) % 220 + 10, (x + y * 2) % 220 + 10, (x * 5) % 220 + 10]
    ).astype(np.uint8)
    enc = jpeg_io.jpeg_encode(rgb, quality_scale=8)
    dec = jpeg_io.jpeg_decode(enc)
    assert dec.shape == rgb.shape
    assert np.abs(dec.astype(int) - rgb.astype(int)).max() <= 8


def test_roundtrip_420_subsampling_and_restart_markers():
    x, y = np.meshgrid(np.arange(37), np.arange(29))
    rgb = np.dstack(
        [(x * 2 + y) % 220 + 10, (x + y * 2) % 220 + 10, (x * 5) % 220 + 10]
    ).astype(np.uint8)
    for dri in (0, 2):
        enc = jpeg_io.jpeg_encode(
            rgb, quality_scale=8, subsampling="420", restart_interval=dri
        )
        if dri:
            assert b"\xff\xd0" in enc  # RST0 actually emitted
        dec = jpeg_io.jpeg_decode(enc)
        assert dec.shape == rgb.shape
        # chroma is 2x2 box-averaged: luma-dominated bound stays tight
        assert np.abs(dec.astype(int) - rgb.astype(int)).max() <= 16


def test_byte_stuffing_roundtrip():
    """An image tuned until the entropy stream contains a stuffed
    0xFF00 — the unstuffing path must not desync."""
    rng = np.random.default_rng(0)
    for _ in range(40):
        img = rng.integers(0, 256, (16, 16), dtype=np.uint8)
        enc = jpeg_io.jpeg_encode(img, quality_scale=16)
        sos = enc.index(b"\xff\xda")
        if b"\xff\x00" in enc[sos:]:
            dec = jpeg_io.jpeg_decode(enc)
            assert dec.shape == img.shape
            assert np.abs(dec.astype(int) - img.astype(int)).max() <= 24
            return
    pytest.fail("no stuffed byte produced in 40 random images")


def test_uniform_image_exact_at_unit_quant():
    """quality_scale=16 floors the DC quant step to 1: a uniform
    image round-trips bit-exactly (DC = (v-128)*8 is an integer
    multiple of 1/8 scaling)."""
    u = np.full((24, 17), 77, np.uint8)
    assert (jpeg_io.jpeg_decode(jpeg_io.jpeg_encode(u, 16)) == 77).all()


def test_progressive_and_bad_precision_refused():
    x, y = np.meshgrid(np.arange(8), np.arange(8))
    enc = bytearray(
        jpeg_io.jpeg_encode(((x + y) % 250).astype(np.uint8))
    )
    sof = enc.index(b"\xff\xc0")
    enc[sof + 1] = 0xC2  # rebrand as progressive
    with pytest.raises(NotImplementedError, match="SOF2"):
        jpeg_io.jpeg_decode(bytes(enc))
    enc[sof + 1] = 0xC0
    enc[sof + 4] = 12  # precision 12
    with pytest.raises(NotImplementedError, match="precision"):
        jpeg_io.jpeg_decode(bytes(enc))


def test_truncated_and_garbage_refused():
    with pytest.raises(ValueError, match="SOI"):
        jpeg_io.jpeg_decode(b"not a jpeg")
    ok = jpeg_io.jpeg_encode(np.full((8, 8), 9, np.uint8))
    with pytest.raises((ValueError, IndexError)):
        jpeg_io.jpeg_decode(ok[: len(ok) // 3])
