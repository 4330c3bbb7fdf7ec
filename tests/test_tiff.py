"""TIFF codec (operators/tiff_io.py): a hand-built IFD decoded
WITHOUT the encoder, hand-derived PackBits and TIFF-LZW vectors (the
MSB-first early-change variant — NOT GIF's), lossless round-trips
over both byte orders / strip splits / predictor, and the loud
refusals (tiles, 16-bit, palette, unknown compression)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from archetype_spark.operators.tiff_io import (
    _lzw_decode,
    _lzw_encode,
    _packbits_decode,
    _packbits_encode,
    tiff_decode,
    tiff_encode,
    tiff_info,
)


def test_packbits_hand_vectors():
    # spec's worked example family: literal, repeat, no-op
    assert _packbits_decode(bytes([2, 1, 2, 3]), 3) == bytes([1, 2, 3])
    assert _packbits_decode(bytes([257 - 4, 9]), 4) == bytes([9, 9, 9, 9])
    assert (
        _packbits_decode(bytes([128, 0, 7, 254, 5]), 4)
        == bytes([7, 5, 5, 5])
    )
    with pytest.raises(ValueError, match="truncated"):
        _packbits_decode(bytes([2, 1]), 3)
    # encoder round-trips a mixed run/literal row
    row = bytes([1, 1, 1, 1, 2, 3, 4, 4, 4, 4, 4, 9])
    assert _packbits_decode(_packbits_encode(row), len(row)) == row


def _pack_msb(codes_and_widths):
    acc = nbits = 0
    out = bytearray()
    for code, width in codes_and_widths:
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def test_lzw_hand_vector_msb_first():
    """CLEAR; 1; 2 (decoder adds 258='1 2'); 258 -> '1 2' (adds
    259='2 1'); EOI — all 9-bit, packed MSB-first."""
    data = _pack_msb([(256, 9), (1, 9), (2, 9), (258, 9), (257, 9)])
    assert _lzw_decode(data, 4) == bytes([1, 2, 1, 2])


def test_lzw_kwkwk_and_roundtrip_with_width_growth():
    data = _pack_msb([(256, 9), (1, 9), (258, 9), (257, 9)])
    assert _lzw_decode(data, 3) == bytes([1, 1, 1])
    # long random payload crosses 9->10->11->12-bit widths and the
    # table-full reset; encoder and decoder must stay code-aligned
    rng = np.random.default_rng(5)
    payload = rng.integers(0, 256, 60_000, dtype=np.uint8).tobytes()
    assert _lzw_decode(_lzw_encode(payload), len(payload)) == payload


def test_decode_hand_built_ifd():
    """A little-endian TIFF assembled field-by-field (no tiff_encode):
    2x2 gray, uncompressed, one strip inline after the IFD."""
    px = bytes([10, 20, 30, 40])
    n = 8
    ifd_off = 8
    strip_off = ifd_off + 2 + 12 * n + 4

    def entry(tag, typ, count, value):
        return struct.pack("<HHI", tag, typ, count) + value

    buf = bytearray(b"II*\x00" + struct.pack("<I", ifd_off))
    buf += struct.pack("<H", n)
    buf += entry(256, 3, 1, struct.pack("<HH", 2, 0))  # width
    buf += entry(257, 3, 1, struct.pack("<HH", 2, 0))  # length
    buf += entry(258, 3, 1, struct.pack("<HH", 8, 0))  # bits
    buf += entry(259, 3, 1, struct.pack("<HH", 1, 0))  # compression none
    buf += entry(262, 3, 1, struct.pack("<HH", 1, 0))  # min-is-black
    buf += entry(273, 4, 1, struct.pack("<I", strip_off))
    buf += entry(278, 3, 1, struct.pack("<HH", 2, 0))
    buf += entry(279, 4, 1, struct.pack("<I", 4))
    buf += struct.pack("<I", 0)  # next IFD
    buf += px
    out = tiff_decode(bytes(buf))
    assert out.tolist() == [[10, 20], [30, 40]]
    assert tiff_info(bytes(buf)) == (2, 2)


@pytest.mark.parametrize("comp", ["none", "packbits", "lzw"])
@pytest.mark.parametrize("big_endian", [False, True])
def test_roundtrip_lossless(comp, big_endian):
    rng = np.random.default_rng(11)
    for shape in ((6, 9), (7, 5, 3)):
        px = rng.integers(0, 256, shape, dtype=np.uint8)
        enc = tiff_encode(
            px, compression=comp, big_endian=big_endian, rows_per_strip=3
        )
        assert np.array_equal(tiff_decode(enc), px)


def test_predictor_roundtrip_and_smaller_on_smooth():
    # a smooth gradient: horizontal differencing should help LZW
    grad = np.tile(np.arange(200, dtype=np.uint8), (40, 1))
    grad3 = np.stack([grad, grad, grad], axis=2)
    plain = tiff_encode(grad3, compression="lzw")
    pred = tiff_encode(grad3, compression="lzw", predictor=True)
    assert np.array_equal(tiff_decode(pred), grad3)
    assert len(pred) < len(plain)


def test_min_is_white_inverts():
    g = np.arange(12, dtype=np.uint8).reshape(3, 4)
    enc = bytearray(tiff_encode(g))
    n = struct.unpack("<H", enc[8:10])[0]
    for i in range(n):
        off = 10 + 12 * i
        if struct.unpack("<H", enc[off : off + 2])[0] == 262:
            enc[off + 8] = 0
    assert np.array_equal(tiff_decode(bytes(enc)), 255 - g)


def test_refusals_are_loud():
    with pytest.raises(ValueError, match="not a TIFF"):
        tiff_decode(b"GIF89a")
    assert tiff_info(b"BM..") is None
    g = np.zeros((2, 2), dtype=np.uint8)
    enc = bytearray(tiff_encode(g))
    n = struct.unpack("<H", enc[8:10])[0]

    def set_tag(tag, val):
        for i in range(n):
            off = 10 + 12 * i
            if struct.unpack("<H", enc[off : off + 2])[0] == tag:
                enc[off + 8 : off + 10] = struct.pack("<H", val)

    set_tag(259, 7)  # JPEG-in-TIFF
    with pytest.raises(NotImplementedError, match="compression 7"):
        tiff_decode(bytes(enc))
    set_tag(259, 1)
    set_tag(258, 16)
    with pytest.raises(NotImplementedError, match="8-bit"):
        tiff_decode(bytes(enc))
    set_tag(258, 8)
    set_tag(262, 3)  # palette
    with pytest.raises(NotImplementedError, match="photometric 3"):
        tiff_decode(bytes(enc))
    with pytest.raises(ValueError, match="compression"):
        tiff_encode(g, compression="deflate")
    with pytest.raises(ValueError, match="LZW pairing"):
        tiff_encode(g, compression="none", predictor=True)
