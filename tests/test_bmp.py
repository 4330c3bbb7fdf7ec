"""BMP codec (operators/bmp_io.py): hand-built-payload exact decodes
for every supported layout (24-bit bottom-up with stride padding,
top-down, 32-bit BGRX under BI_RGB and canonical BI_BITFIELDS, 8-bit
color and pure-gray palettes), lossless encode round trips, loud
refusals for the unsupported variants, and the container-independent
pixel_digest through image_pixel_stats. Pure-python suite (no Spark)
except the final integration case."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from archetype_spark.operators import bmp_io


def _file_header(data_off: int, raster_len: int) -> bytes:
    return struct.pack("<2sIHHI", b"BM", data_off + raster_len, 0, 0, data_off)


def _info_header(w: int, h: int, bpp: int, compression: int = 0, clr_used: int = 0) -> bytes:
    return struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, bpp, compression, 0, 2835, 2835, clr_used, 0
    )


def test_hand_built_24bit_bottom_up_with_padding():
    """3x2 RGB, stride 12 (3 pad bytes per row), bottom-up: the LAST
    raster row is the TOP image row, and B<->R swap."""
    # image rows top->bottom: [(255,0,0),(0,255,0),(0,0,255)] and
    #                         [(1,2,3),(4,5,6),(7,8,9)]
    top = b"\x00\x00\xff" + b"\x00\xff\x00" + b"\xff\x00\x00" + b"\x00\x00\x00"
    bot = b"\x03\x02\x01" + b"\x06\x05\x04" + b"\x09\x08\x07" + b"\x00\x00\x00"
    payload = _file_header(54, 24) + _info_header(3, 2, 24) + bot + top
    px = bmp_io.bmp_decode(payload)
    assert px.shape == (2, 3, 3)
    assert px[0].tolist() == [[255, 0, 0], [0, 255, 0], [0, 0, 255]]
    assert px[1].tolist() == [[1, 2, 3], [4, 5, 6], [7, 8, 9]]
    assert bmp_io.bmp_info(payload) == (3, 2)


def test_hand_built_top_down_and_32bit():
    """Negative height = top-down; 32-bit rows are BGRX (X ignored)."""
    r0 = bytes([30, 20, 10, 99]) + bytes([60, 50, 40, 99])  # two px
    r1 = bytes([3, 2, 1, 0]) + bytes([6, 5, 4, 0])
    payload = _file_header(54, 16) + _info_header(2, -2, 32) + r0 + r1
    px = bmp_io.bmp_decode(payload)
    assert px.shape == (2, 2, 3)
    assert px[0].tolist() == [[10, 20, 30], [40, 50, 60]]
    assert px[1].tolist() == [[1, 2, 3], [4, 5, 6]]
    # canonical BI_BITFIELDS masks decode identically
    info = struct.pack(
        "<IiiHHIIiiII", 40, 2, -2, 1, 32, 3, 0, 2835, 2835, 0, 0
    )
    masks = struct.pack("<III", 0x00FF0000, 0x0000FF00, 0x000000FF)
    pay2 = _file_header(54 + 12, 16) + info + masks + r0 + r1
    assert np.array_equal(bmp_io.bmp_decode(pay2), px)
    # non-canonical masks refuse
    bad = struct.pack("<III", 0x000000FF, 0x0000FF00, 0x00FF0000)
    pay3 = _file_header(54 + 12, 16) + info + bad + r0 + r1
    with pytest.raises(NotImplementedError, match="BITFIELDS"):
        bmp_io.bmp_decode(pay3)


def test_hand_built_8bit_palettes():
    """Color palette maps to (h, w, 3); a pure-gray palette collapses
    to (h, w) — the shape image_pixel_stats digests for gray codecs."""
    # color palette: 0 -> red, 1 -> green (BGRX quads)
    pal = bytes([0, 0, 255, 0]) + bytes([0, 255, 0, 0])
    raster = bytes([0, 1, 0, 0])  # w=3 padded to 4
    payload = (
        _file_header(54 + 8, 4)
        + _info_header(3, 1, 8, clr_used=2)
        + pal
        + raster
    )
    px = bmp_io.bmp_decode(payload)
    assert px.shape == (1, 3, 3)
    assert px[0].tolist() == [[255, 0, 0], [0, 255, 0], [255, 0, 0]]
    # gray ramp palette
    gpal = b"".join(bytes([v, v, v, 0]) for v in (0, 128, 255))
    graster = bytes([2, 0, 1, 0])
    gpay = (
        _file_header(54 + 12, 4)
        + _info_header(3, 1, 8, clr_used=3)
        + gpal
        + graster
    )
    gpx = bmp_io.bmp_decode(gpay)
    assert gpx.shape == (1, 3)
    assert gpx[0].tolist() == [255, 0, 128]
    # palette index out of range refuses
    bad = (
        _file_header(54 + 8, 4)
        + _info_header(3, 1, 8, clr_used=2)
        + pal
        + bytes([0, 5, 0, 0])
    )
    with pytest.raises(ValueError, match="palette index"):
        bmp_io.bmp_decode(bad)


@pytest.mark.parametrize("shape,seed", [((5, 7, 3), 1), ((4, 4, 3), 2), ((9, 3, 3), 3)])
def test_roundtrip_lossless(shape, seed):
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, shape, dtype=np.uint8)
    assert np.array_equal(bmp_io.bmp_decode(bmp_io.bmp_encode(px)), px)


def test_gray_encode_expands_to_rgb():
    g = np.arange(12, dtype=np.uint8).reshape(3, 4)
    px = bmp_io.bmp_decode(bmp_io.bmp_encode(g))
    assert px.shape == (3, 4, 3)
    assert np.array_equal(px, np.repeat(g[:, :, None], 3, axis=2))


def test_refusals():
    raster = bytes(8)
    rle = _file_header(54, 8) + _info_header(2, 1, 8, compression=1) + raster
    with pytest.raises(NotImplementedError, match="compression 1"):
        bmp_io.bmp_decode(rle)
    sixteen = _file_header(54, 8) + _info_header(2, 1, 16) + raster
    with pytest.raises(NotImplementedError, match="bit depth 16"):
        bmp_io.bmp_decode(sixteen)
    os2 = (
        _file_header(26, 8)
        + struct.pack("<IHHHH", 12, 2, 1, 1, 24)
        + raster
    )
    with pytest.raises(NotImplementedError, match="info-header size 12"):
        bmp_io.bmp_decode(os2)
    truncated = _file_header(54, 8) + _info_header(4, 4, 24) + raster
    with pytest.raises(ValueError, match="truncated"):
        bmp_io.bmp_decode(truncated)
    assert bmp_io.bmp_info(b"notabitmap") is None


def test_pixel_digest_is_container_independent(spark):
    """The same pixels arriving as BMP and PNG must land on ONE
    pixel_digest — the cross-container exact-dedup contract."""
    import hashlib

    from archetype_spark.operators import multimodal, png_io

    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, (6, 9, 3), dtype=np.uint8)
    media = spark.createDataFrame(
        [(0, bytearray(bmp_io.bmp_encode(px))), (1, bytearray(png_io.png_encode(px)))],
        "media_id long, payload binary",
    )
    rows = {r["media_id"]: r for r in multimodal.image_pixel_stats(media).collect()}
    want = hashlib.sha256(np.ascontiguousarray(px).tobytes()).hexdigest()
    assert rows[0]["pixel_digest"] == want == rows[1]["pixel_digest"]
    assert (rows[0]["width"], rows[0]["height"]) == (9, 6)
