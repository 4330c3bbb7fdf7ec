"""WebP-lossless / VP8L codec (operators/webp_io.py): a fully
hand-derived simple-code payload (bit-by-bit from RFC 9649, with an
independent inline bit-writer), hand-built streams for LZ77 backward
references, the color cache, color indexing with sub-byte packing,
the predictor and subtract-green transforms, lossless encode round
trips, loud refusals (animation, truncation), the extended (VP8X)
container walk, and the container-independent pixel_digest through
image_pixel_stats. Lossy (VP8) coverage lives in tests/test_vp8.py."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from archetype_spark.operators import webp_io


class _W:
    """Independent LSB-first bit writer (NOT the module's) so the
    hand vectors do not inherit the codec's own bit-order bugs."""

    def __init__(self):
        self.bits: list[int] = []

    def put(self, value: int, n: int):  # LSB first
        for i in range(n):
            self.bits.append((value >> i) & 1)

    def put_msb(self, value: int, n: int):  # prefix-code bits
        for i in range(n - 1, -1, -1):
            self.bits.append((value >> i) & 1)

    def payload(self) -> bytes:
        out = bytearray((len(self.bits) + 7) // 8)
        for pos, b in enumerate(self.bits):
            if b:
                out[pos >> 3] |= 1 << (pos & 7)
        body = bytes([0x2F]) + bytes(out)
        chunk = b"VP8L" + struct.pack("<I", len(body)) + body
        if len(body) & 1:
            chunk += b"\x00"
        return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def _header(w, wd, ht, n_transform_bits=(0,)):
    w.put(wd - 1, 14)
    w.put(ht - 1, 14)
    w.put(0, 1)  # alpha hint
    w.put(0, 3)  # version
    for b in n_transform_bits:
        w.put(b, 1)


def _simple1(w, symbol, eight=True):
    """One-symbol simple prefix code (consumes 0 bits per read)."""
    w.put(1, 1)
    w.put(0, 1)
    if eight:
        w.put(1, 1)
        w.put(symbol, 8)
    else:
        w.put(0, 1)
        w.put(symbol, 1)


def _simple2(w, s0, s1):
    w.put(1, 1)
    w.put(1, 1)
    w.put(1, 1)
    w.put(s0, 8)
    w.put(s1, 8)


def test_hand_built_solid_color_simple_codes():
    """2x1 solid RGB (10, 20, 30): header + five single-symbol simple
    codes, zero bits per pixel — byte-for-byte from the spec."""
    w = _W()
    _header(w, 2, 1)
    w.put(0, 1)  # no color cache
    w.put(0, 1)  # no meta prefix image
    _simple1(w, 20)  # green
    _simple1(w, 10)  # red
    _simple1(w, 30)  # blue
    _simple1(w, 255)  # alpha
    _simple1(w, 0, eight=False)  # distance (unused)
    px = webp_io.webp_decode(w.payload())
    assert px.tolist() == [[[10, 20, 30], [10, 20, 30]]]
    assert webp_io.webp_lossless_info(w.payload()) == (2, 1)


def test_hand_built_lz77_distance_one():
    """Cleaner LZ77 pin: literal + copy(length 3, distance 1). The
    distance SYMBOL s prefix-decodes via the same scheme as lengths:
    s=1 -> plane 2 -> neighborhood (1, 0) -> distance 1."""
    w = _W()
    _header(w, 4, 1)
    w.put(0, 1)
    w.put(0, 1)
    # green: symbols {7, 258} as in the previous test
    w.put(0, 1)
    w.put(15, 4)
    clc = {0: 1, 1: 1}
    order = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)
    for c in order:
        w.put(clc.get(c, 0), 3)
    w.put(1, 1)
    w.put(4, 3)
    w.put(257, 10)
    for s in range(259):
        w.put_msb(1 if s in (7, 258) else 0, 1)
    _simple1(w, 99)
    _simple1(w, 88)
    _simple1(w, 255)
    _simple1(w, 1, eight=True)  # distance symbol 1 -> plane 2 -> dist 1
    w.put_msb(0, 1)  # literal (99, 7, 88)
    w.put_msb(1, 1)  # length code 2 -> length 3, then distance
    px = webp_io.webp_decode(w.payload())
    assert px.tolist() == [[[99, 7, 88]] * 4]


def test_incomplete_prefix_code_refuses():
    """Three symbols all at code length 2 violate Kraft equality —
    an incomplete prefix code must refuse, never misdecode."""
    w = _W()
    _header(w, 3, 1)
    w.put(0, 1)  # no cache
    w.put(0, 1)  # no meta
    # green: normal code, cl lengths over {0, 2}: 0 -> '0', 2 -> '1'
    w.put(0, 1)
    w.put(15, 4)
    clc = {0: 1, 2: 1}
    order = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)
    for c in order:
        w.put(clc.get(c, 0), 3)
    w.put(1, 1)  # short form
    w.put(0, 3)  # length_nbits = 2
    w.put(1, 2)  # read 3 entries
    for _ in range(3):  # symbols 0, 1, 2 each at length 2: INCOMPLETE
        w.put_msb(1, 1)
    with pytest.raises(ValueError, match="Kraft|prefix"):
        webp_io.webp_decode(w.payload())


def test_color_cache_round_trip_via_module_writer():
    """Cache semantics end-to-end with the module's own primitives:
    decode a stream with cache hits written against the documented
    hash (insert on every emitted pixel)."""
    from archetype_spark.operators.webp_io import (
        _BitWriter,
        _canonical,
        _huffman_lengths,
        _write_prefix_code,
    )

    px0 = (255, 5, 200, 7)  # a, r, g, b
    argb0 = (px0[0] << 24) | (px0[1] << 16) | (px0[2] << 8) | px0[3]
    idx0 = ((0x1E35A7BD * argb0) & 0xFFFFFFFF) >> (32 - 2)
    bw = _BitWriter()
    bw.write(3 - 1, 14)
    bw.write(0, 14)
    bw.write(0, 1)
    bw.write(0, 3)
    bw.write(0, 1)  # no transforms
    bw.write(1, 1)  # cache
    bw.write(2, 4)  # cache_bits = 2
    bw.write(0, 1)  # no meta
    greens = {200: 2, 280 + idx0: 1}
    glen = _huffman_lengths(greens)
    _write_prefix_code(bw, glen)
    gcan = _canonical(glen)
    for chan_sym in (5, 7, 255):
        _write_prefix_code(bw, {chan_sym: 1})
    _write_prefix_code(bw, {0: 1})
    code, ln = gcan[200]
    bw.write_code(code, ln)  # literal 1
    bw.write_code(code, ln)  # literal 2 (same pixel)
    code, ln = gcan[280 + idx0]
    bw.write_code(code, ln)  # cache hit
    body = bytes([0x2F]) + bytes(bw.buf)
    chunk = b"VP8L" + struct.pack("<I", len(body)) + body
    if len(body) & 1:
        chunk += b"\x00"
    payload = b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
    px = webp_io.webp_decode(payload)
    assert px.tolist() == [[[5, 200, 7]] * 3]


def test_hand_built_palette_with_packing():
    """COLOR_INDEXING: a 2-color palette packs 8 pixels per green
    byte (width_bits 3). Palette colors are DELTA-summed. 8x1 image:
    indices 0,1,1,0,1,0,0,1 -> packed green 0b10010110 = 0x96."""
    w = _W()
    _header(w, 8, 1, n_transform_bits=())
    w.put(1, 1)  # a transform follows
    w.put(3, 2)  # COLOR_INDEXING
    w.put(1, 8)  # palette size - 1 = 1 -> 2 colors
    # palette image (2x1): literals; color 0 = ARGB(255, 1, 2, 3),
    # color 1 DELTA = (0, 3, 4, 5) -> resolves to (255, 4, 6, 8)
    w.put(0, 1)  # palette stream: no cache
    _simple2(w, 2, 4)  # green: symbols 2 then 4 (1-bit codes)
    _simple2(w, 1, 3)  # red
    _simple2(w, 3, 5)  # blue
    _simple2(w, 255, 0)  # alpha: 255 then delta 0
    _simple1(w, 0, eight=False)  # distance
    # palette pixel 1: green=2 red=1 blue=3 alpha=255 (codes: first
    # symbol = '0', second = '1' per canonical order by symbol)
    w.put_msb(0, 1)  # green 2
    w.put_msb(0, 1)  # red 1
    w.put_msb(0, 1)  # blue 3
    w.put_msb(1, 1)  # alpha 255 (canonical: 0 -> '0', 255 -> '1')
    # palette pixel 2 (deltas): green 4, red 3, blue 5, alpha 0
    w.put_msb(1, 1)
    w.put_msb(1, 1)
    w.put_msb(1, 1)
    w.put_msb(0, 1)
    w.put(0, 1)  # no more transforms
    # main (packed, width 1): single literal pixel, green 0x96
    w.put(0, 1)  # no cache
    w.put(0, 1)  # no meta
    _simple1(w, 0x96)  # green
    _simple1(w, 0)  # red
    _simple1(w, 0)  # blue
    _simple1(w, 255)  # alpha
    _simple1(w, 0, eight=False)  # distance
    px = webp_io.webp_decode(w.payload())
    c0, c1 = [1, 2, 3], [4, 6, 8]
    assert px.tolist() == [[c0, c1, c1, c0, c1, c0, c0, c1]]


def test_hand_built_subtract_green_and_predictor():
    """SUBTRACT_GREEN inverse adds green to red/blue; PREDICTOR mode
    2 (top) reconstructs rows from residuals. Built as two separate
    single-transform streams."""
    # subtract green: 1x1, residual (r=10, g=20, b=30) -> (30, 20, 50)
    w = _W()
    _header(w, 1, 1, n_transform_bits=())
    w.put(1, 1)
    w.put(2, 2)  # SUBTRACT_GREEN
    w.put(0, 1)  # no more transforms
    w.put(0, 1)
    w.put(0, 1)
    _simple1(w, 20)
    _simple1(w, 10)
    _simple1(w, 30)
    _simple1(w, 255)
    _simple1(w, 0, eight=False)
    assert webp_io.webp_decode(w.payload()).tolist() == [[[30, 20, 50]]]

    # predictor: 2x2, mode 2 (T) in the one sub-image block. Edge
    # rules: (0,0) predicts opaque black, row 0 predicts L, column 0
    # predicts T; the interior pixel (1,1) is the one the MODE
    # governs — T gives green 10 + 1 = 11, a mode bug (e.g. L)
    # would give 19.
    w = _W()
    _header(w, 2, 2, n_transform_bits=())
    w.put(1, 1)
    w.put(0, 2)  # PREDICTOR
    w.put(0, 3)  # size_bits = 2 -> 4x4 blocks -> 1x1 sub-image
    # sub-image: one pixel whose GREEN holds predictor mode 2
    w.put(0, 1)  # sub-stream: no cache
    _simple1(w, 2)  # green = mode 2
    _simple1(w, 0)
    _simple1(w, 0)
    _simple1(w, 0)
    _simple1(w, 0, eight=False)
    w.put(0, 1)  # no more transforms
    w.put(0, 1)  # no cache
    w.put(0, 1)  # no meta
    # residual greens {9, 1}: canonical 1 -> '0', 9 -> '1'
    _simple2(w, 1, 9)
    _simple1(w, 0)  # red
    _simple1(w, 0)  # blue
    _simple1(w, 0)  # alpha residual (0xff carried from the edges)
    _simple1(w, 0, eight=False)
    w.put_msb(1, 1)  # (0,0): 9 over black -> green 9
    w.put_msb(0, 1)  # (0,1): +1 over L -> green 10
    w.put_msb(1, 1)  # (1,0): +9 over T -> green 18
    w.put_msb(0, 1)  # (1,1): +1 over T(=10) -> green 11
    px = webp_io.webp_decode(w.payload())
    assert px.tolist() == [
        [[0, 9, 0], [0, 10, 0]],
        [[0, 18, 0], [0, 11, 0]],
    ]


@pytest.mark.parametrize(
    "shape,seed", [((1, 1, 3), 0), ((5, 7, 3), 1), ((16, 16, 3), 2)]
)
def test_roundtrip_lossless(shape, seed):
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, shape, dtype=np.uint8)
    assert np.array_equal(webp_io.webp_decode(webp_io.webp_encode(px)), px)


def test_refusals():
    # a VP8 chunk of zero bytes is an interframe tag (bit 0 set is
    # keyframe=0... bit0 clear) with a missing start code
    with pytest.raises(ValueError, match="start code"):
        webp_io.webp_decode(
            b"RIFF\x00\x00\x00\x00WEBPVP8 " + struct.pack("<I", 16) + b"\x00" * 16
        )
    # animated VP8X refuses loudly
    vp8x = b"VP8X" + struct.pack("<I", 10) + bytes([0x02, 0, 0, 0]) + b"\x00" * 6
    with pytest.raises(NotImplementedError, match="animated"):
        webp_io.webp_decode(
            b"RIFF" + struct.pack("<I", 4 + len(vp8x)) + b"WEBP" + vp8x
        )
    with pytest.raises(ValueError, match="not a WebP"):
        webp_io.webp_decode(b"JUNK")
    enc = webp_io.webp_encode(np.zeros((4, 4, 3), np.uint8))
    with pytest.raises(ValueError):
        webp_io.webp_decode(enc[: len(enc) - 5])
    assert webp_io.webp_lossless_info(b"RIFF\x00\x00\x00\x00WEBPVP8 " + b"\x00" * 16) is None


def test_pixel_digest_is_container_independent(spark):
    import hashlib

    from archetype_spark.operators import multimodal, png_io

    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, (5, 8, 3), dtype=np.uint8)
    media = spark.createDataFrame(
        [
            (0, bytearray(webp_io.webp_encode(px))),
            (1, bytearray(png_io.png_encode(px))),
        ],
        "media_id long, payload binary",
    )
    rows = {
        r["media_id"]: r for r in multimodal.image_pixel_stats(media).collect()
    }
    want = hashlib.sha256(np.ascontiguousarray(px).tobytes()).hexdigest()
    assert rows[0]["pixel_digest"] == want == rows[1]["pixel_digest"]
