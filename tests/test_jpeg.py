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


def test_malformed_progressive_and_bad_precision_refused():
    x, y = np.meshgrid(np.arange(8), np.arange(8))
    enc = bytearray(
        jpeg_io.jpeg_encode(((x + y) % 250).astype(np.uint8))
    )
    sof = enc.index(b"\xff\xc0")
    enc[sof + 1] = 0xC2  # rebrand as progressive: the baseline
    # full-band SOS (Ss=0, Se=63) is ILLEGAL in a progressive frame
    with pytest.raises(ValueError, match="DC scan"):
        jpeg_io.jpeg_decode(bytes(enc))
    enc[sof + 1] = 0xC0
    enc[sof + 4] = 12  # precision 12
    with pytest.raises(NotImplementedError, match="precision"):
        jpeg_io.jpeg_decode(bytes(enc))
    enc[sof + 4] = 8
    enc[sof + 1] = 0xC7  # SOF7: lossless family stays refused
    with pytest.raises(NotImplementedError, match="SOF7"):
        jpeg_io.jpeg_decode(bytes(enc))


def test_truncated_and_garbage_refused():
    with pytest.raises(ValueError, match="SOI"):
        jpeg_io.jpeg_decode(b"not a jpeg")
    ok = jpeg_io.jpeg_encode(np.full((8, 8), 9, np.uint8))
    with pytest.raises((ValueError, IndexError)):
        jpeg_io.jpeg_decode(ok[: len(ok) // 3])


# ------------------------------------------------------------- progressive
def test_progressive_matches_baseline_pixels():
    """Spectral-selection progressive bytes must decode to EXACTLY
    the pixels the baseline encoding of the same array decodes to —
    identical quantized coefficients, different scan layout."""
    rng = np.random.default_rng(5)
    g = rng.integers(0, 256, (24, 17), dtype=np.uint8)
    assert np.array_equal(
        jpeg_io.jpeg_decode(jpeg_io.jpeg_encode_progressive(g)),
        jpeg_io.jpeg_decode(jpeg_io.jpeg_encode(g)),
    )
    c = rng.integers(0, 256, (16, 19, 3), dtype=np.uint8)
    assert np.array_equal(
        jpeg_io.jpeg_decode(jpeg_io.jpeg_encode_progressive(c)),
        jpeg_io.jpeg_decode(jpeg_io.jpeg_encode(c)),
    )


def test_progressive_tile_image_exact_at_unit_dc_quant():
    """The q121 exactness guarantee carries over: piecewise-uniform
    8x8 tiles at unit DC quantization round-trip bit-exactly through
    the progressive layout too."""
    vals = np.array([[7, 250], [23, 130], [99, 1]], dtype=np.uint8)
    px = np.kron(vals, np.ones((8, 8), np.uint8))
    assert np.array_equal(
        jpeg_io.jpeg_decode(jpeg_io.jpeg_encode_progressive(px, 16)), px
    )


class _PBits:
    """Entropy-bit builder for the hand-assembled progressive scans
    (MSB-first with 0xFF00 stuffing, 1-padded flush — independent of
    the module's _BitWriter)."""

    def __init__(self):
        self.bits: list[int] = []

    def put(self, value: int, n: int):
        for i in range(n - 1, -1, -1):
            self.bits.append((value >> i) & 1)

    def flush(self) -> bytes:
        bits = self.bits + [1] * (-len(self.bits) % 8)
        out = bytearray()
        for i in range(0, len(bits), 8):
            b = 0
            for j in range(8):
                b = (b << 1) | bits[i + j]
            out.append(b)
            if b == 0xFF:
                out.append(0x00)
        return bytes(out)


def test_hand_built_successive_approximation_scans():
    """Full successive-approximation pipeline from hand-assembled
    scans (the layouts cjpeg emits that the spectral-only encoder
    does not): DC first at Al=1 + DC refinement, AC first at Al=1
    with a ZRL and an EOB RUN spanning blocks (EOB1), then an AC
    refinement scan with a newly-significant coefficient, correction
    bits, and the eobrun correction tail. Expected pixels computed
    from the target coefficients via the module's pinned IDCT."""
    # target zig-zag coefficients (quant = all ones), 16x8 = 2 blocks
    zz0 = np.zeros(64, dtype=np.int64)
    zz0[0] = 9  # DC: first scan 4<<1, refinement bit 1
    zz0[1] = 3  # AC first 1<<1, correction bit -> 3
    zz0[5] = 1  # newly significant in the refinement scan
    zz0[18] = -3  # AC first -1<<1 (after a ZRL), correction -> -3
    zz1 = np.zeros(64, dtype=np.int64)
    zz1[0] = -3  # first scan -2<<1, refinement bit 1

    out = b"\xff\xd8"
    out += _seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    out += _seg(
        0xC2, struct.pack(">BHHB", 8, 8, 16, 1) + bytes([1, 0x11, 0])
    )
    # DC table: Annex K luminance
    counts, values = jpeg_io._K3_DC_LUMA
    out += _seg(0xC4, bytes([0x00] + counts + values))
    dc_codes = jpeg_io._huff_codes(counts, values)

    # scan 1: DC first, Al=1 (diffs over DC>>1: +4, then -6)
    out += _seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x01]))
    b = _PBits()
    for diff in (4, -6):
        t = abs(diff).bit_length()
        mag = diff if diff >= 0 else diff + (1 << t) - 1
        code, ln = dc_codes[t]
        b.put(code, ln)
        b.put(mag & ((1 << t) - 1), t)
    out += b.flush()

    # scan 2: DC refinement, Ah=1, Al=0 (bits 1, 1)
    out += _seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x10]))
    b = _PBits()
    b.put(1, 1)
    b.put(1, 1)
    out += b.flush()

    # scan 3: AC first, band 1..63, Al=1. Custom AC table with the
    # EOB1 symbol the Annex K tables lack: 4 symbols at length 2 —
    # 0x01 '00', 0xF0 '01', 0x10 '10', 0x00 '11'.
    out += _seg(
        0xC4,
        bytes([0x10, 0, 4] + [0] * 14 + [0x01, 0xF0, 0x10, 0x00]),
    )
    out += _seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0x01]))
    b = _PBits()
    b.put(0b00, 2)  # r=0 s=1 at k=1
    b.put(1, 1)  # value +1 (<<1 -> 2)
    b.put(0b01, 2)  # ZRL: 16 zeros (k -> 18)
    b.put(0b00, 2)  # r=0 s=1 at k=18
    b.put(0, 1)  # value -1 (<<1 -> -2)
    b.put(0b10, 2)  # EOB1: run = (1<<1)-1 + extra
    b.put(0, 1)  # extra bit 0 -> eobrun 1: ends block 0, skips block 1
    out += b.flush()

    # scan 4: AC refinement, band 1..63, Ah=1, Al=0. Custom table:
    # 0x31 '0' (skip 3 zero-history, new s=1), 0x10 '1' (EOB1).
    out += _seg(0xC4, bytes([0x10, 2] + [0] * 15 + [0x31, 0x10]))
    out += _seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0x10]))
    b = _PBits()
    b.put(0, 1)  # 0x31: new significant after 3 zero-history slots
    b.put(1, 1)  # its sign: +1
    b.put(1, 1)  # correction bit for zz[1] (2 -> 3), visited en route
    b.put(1, 1)  # 0x10: EOB run
    b.put(0, 1)  # extra bit -> eobrun 2
    b.put(1, 1)  # correction bit for zz[18] (-2 -> -3) in the tail
    out += b.flush()
    out += b"\xff\xd9"

    got = jpeg_io.jpeg_decode(out)
    # expected pixels straight from the target coefficients
    blocks = []
    for zz in (zz0, zz1):
        nat = np.zeros(64, dtype=np.float64)
        nat[jpeg_io._ZIGZAG] = zz
        blk = jpeg_io._A.T @ nat.reshape(8, 8) @ jpeg_io._A + 128.0
        blocks.append(np.clip(np.rint(blk), 0, 255).astype(np.uint8))
    want = np.concatenate(blocks, axis=1)
    assert got.shape == (8, 16)
    assert np.array_equal(got, want)


def test_progressive_multimodal_pixel_stats(spark):
    """image_pixel_stats now decodes progressive payloads too —
    identical pixels in baseline and progressive containers land on
    one digest."""
    import hashlib

    from archetype_spark.operators import multimodal

    vals = np.array([[40, 200], [90, 15]], dtype=np.uint8)
    px = np.kron(vals, np.ones((8, 8), np.uint8))
    media = spark.createDataFrame(
        [
            (0, bytearray(jpeg_io.jpeg_encode(px, 16))),
            (1, bytearray(jpeg_io.jpeg_encode_progressive(px, 16))),
        ],
        "media_id long, payload binary",
    )
    rows = {
        r["media_id"]: r
        for r in multimodal.image_pixel_stats(media).collect()
    }
    want = hashlib.sha256(np.ascontiguousarray(px).tobytes()).hexdigest()
    assert rows[0]["pixel_digest"] == want == rows[1]["pixel_digest"]
