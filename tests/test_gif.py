"""GIF codec (operators/gif_io.py): hand-built spec vectors decoded
WITHOUT the encoder (so an encoder/decoder bug pair cannot cancel),
lossless round-trips over random palettes/images incl. the 12-bit
table-full reset, extension skipping, and the loud refusals
(interlace, truncation, bad codes)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from archetype_spark.operators.gif_io import (
    _lzw_decode,
    _lzw_encode,
    gif_decode,
    gif_decode_frames,
    gif_encode,
    gif_encode_frames,
)


def _pack_codes(codes_and_widths):
    """LSB-first pack of (code, width) pairs — the hand-vector tool."""
    acc = nbits = 0
    out = bytearray()
    for code, width in codes_and_widths:
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def test_lzw_decode_hand_vector():
    """min_code_size=2: clear=4, eoi=5, first dynamic code 6.
    Hand-derived stream: CLEAR; 1; 2 (decoder adds 6 = '1 2');
    6 -> emits '1 2' (and adds 7 = '2 1'); EOI.
    Output = 1 2 1 2."""
    codes = [(4, 3), (1, 3), (2, 3), (6, 3), (5, 3)]
    data = _pack_codes(codes)
    assert _lzw_decode(2, data, 4) == bytes([1, 2, 1, 2])


def test_lzw_decode_kwkwk_case():
    """The KwKwK special case: code == next_code refers to the entry
    being defined. CLEAR, 1, 6 -> '1' then '11' (prev + prev[0])."""
    codes = [(4, 3), (1, 3), (6, 3), (5, 3)]
    assert _lzw_decode(2, _pack_codes(codes), 3) == bytes([1, 1, 1])


def test_decode_hand_built_file():
    """A GIF built byte-by-byte here (not by gif_encode): 2x2 image,
    4-entry palette, indices [[0,1],[2,3]]."""
    pal = bytes(
        [255, 0, 0, 0, 255, 0, 0, 0, 255, 40, 50, 60]
    )  # R, G, B, gray-ish
    # width grows 3 -> 4 after the decoder's table hits 8 entries
    # (the add that follows reading code 2) — GIF's early-bump rule
    lzw = _pack_codes(
        [(4, 3), (0, 3), (1, 3), (2, 3), (3, 4), (5, 4)]
    )
    buf = bytearray(b"GIF89a")
    buf += struct.pack("<HHBBB", 2, 2, 0x80 | 0x01, 0, 0)  # GCT, 4 entries
    buf += pal
    # a Graphic Control Extension the decoder must skip
    buf += bytes([0x21, 0xF9, 4, 0, 0, 0, 0, 0])
    buf += struct.pack("<BHHHHB", 0x2C, 0, 0, 2, 2, 0)
    buf.append(2)  # min code size
    buf.append(len(lzw))
    buf += lzw
    buf.append(0)
    buf.append(0x3B)
    px = gif_decode(bytes(buf))
    expect = np.array(
        [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [40, 50, 60]]],
        dtype=np.uint8,
    )
    assert np.array_equal(px, expect)


@pytest.mark.parametrize("n_colors,shape,seed", [
    (4, (7, 9), 0),
    (17, (23, 31), 1),
    (256, (40, 50), 2),
    (2, (64, 64), 3),
])
def test_roundtrip_lossless(n_colors, shape, seed):
    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, (n_colors, 3), dtype=np.uint8)
    idx = rng.integers(0, n_colors, shape, dtype=np.uint8)
    px = gif_decode(gif_encode(idx, pal))
    assert np.array_equal(px, pal[idx])


def test_roundtrip_crosses_table_full_reset():
    """An image long/noisy enough that the LZW table hits 4096 and
    the encoder must emit a mid-stream CLEAR; the decoder follows."""
    rng = np.random.default_rng(7)
    idx = rng.integers(0, 256, (120, 120), dtype=np.uint8)
    pal = rng.integers(0, 256, (256, 3), dtype=np.uint8)
    enc = gif_encode(idx, pal)
    assert np.array_equal(gif_decode(enc), pal[idx])


def test_refusals():
    rng = np.random.default_rng(9)
    idx = rng.integers(0, 4, (6, 6), dtype=np.uint8)
    pal = rng.integers(0, 256, (4, 3), dtype=np.uint8)
    enc = bytearray(gif_encode(idx, pal))
    with pytest.raises(ValueError, match="not a GIF"):
        gif_decode(b"PNG..")
    with pytest.raises(ValueError, match="truncated"):
        gif_decode(bytes(enc[:20]))
    # flip the interlace flag in the image descriptor (10-byte
    # block: intro + x,y,w,h + packed)
    desc_off = 13 + 12  # header + 4-entry GCT
    assert enc[desc_off] == 0x2C
    enc[desc_off + 9] |= 0x40
    with pytest.raises(NotImplementedError, match="interlaced"):
        gif_decode(bytes(enc))


def test_encode_validations():
    pal = np.zeros((4, 3), dtype=np.uint8)
    with pytest.raises(ValueError, match="2-D"):
        gif_encode(np.zeros((2, 2, 3), dtype=np.uint8), pal)
    with pytest.raises(ValueError, match="palette"):
        gif_encode(np.zeros((2, 2), dtype=np.uint8), np.zeros((300, 3), dtype=np.uint8))
    with pytest.raises(ValueError, match="exceeds"):
        gif_encode(np.full((2, 2), 9, dtype=np.uint8), pal)


# ---------------------------------------------------------------- animation


def _composite_plain(frames, pal, screen, bg_index):
    """Independent plain-loop GCE compositor (no gif_io, no numpy
    vector ops) — the ground-truth derivation the fixture uses."""
    sw, sh = screen
    canvas = [[list(int(v) for v in pal[bg_index]) for _ in range(sw)] for _ in range(sh)]
    outs = []
    for fr in frames:
        idx = fr["indices"]
        x, y = fr.get("x", 0), fr.get("y", 0)
        t, d = fr.get("transparent"), fr.get("disposal", 0)
        before = [[list(c) for c in row] for row in canvas] if d == 3 else None
        for r in range(idx.shape[0]):
            for c in range(idx.shape[1]):
                v = int(idx[r, c])
                if t is not None and v == t:
                    continue
                canvas[y + r][x + c] = [int(u) for u in pal[v]]
        outs.append(np.array(canvas, dtype=np.uint8))
        if d == 2:
            for r in range(idx.shape[0]):
                for c in range(idx.shape[1]):
                    canvas[y + r][x + c] = [int(u) for u in pal[bg_index]]
        elif d == 3:
            canvas = before
    return outs


def test_animation_full_frames_round_trip():
    rng = np.random.default_rng(11)
    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    frames = [
        {"indices": rng.integers(0, 16, (6, 8), dtype=np.uint8), "disposal": 1}
        for _ in range(3)
    ]
    enc = gif_encode_frames(frames, pal, (8, 6), bg_index=0)
    got = gif_decode_frames(enc)
    exp = _composite_plain(frames, pal, (8, 6), 0)
    assert len(got) == 3
    for a, b in zip(exp, got):
        assert np.array_equal(a, b)
    # full-canvas first frame: still-image decode agrees
    assert np.array_equal(gif_decode(enc), exp[0])


def test_animation_subrect_transparency_and_disposals():
    rng = np.random.default_rng(12)
    pal = rng.integers(0, 256, (8, 3), dtype=np.uint8)
    frames = [
        {"indices": rng.integers(0, 8, (5, 7), dtype=np.uint8), "disposal": 1},
        {
            "indices": rng.integers(0, 8, (2, 3), dtype=np.uint8),
            "x": 1, "y": 2, "disposal": 2, "transparent": 3,
        },
        {
            "indices": rng.integers(0, 8, (2, 2), dtype=np.uint8),
            "x": 4, "y": 0, "disposal": 3, "transparent": 0,
        },
        {"indices": rng.integers(0, 8, (3, 4), dtype=np.uint8), "x": 2, "y": 1},
    ]
    enc = gif_encode_frames(frames, pal, (7, 5), bg_index=2)
    got = gif_decode_frames(enc)
    exp = _composite_plain(frames, pal, (7, 5), 2)
    assert len(got) == 4
    for i, (a, b) in enumerate(zip(exp, got)):
        assert np.array_equal(a, b), f"frame {i}"


def test_animation_hand_built_two_frame_vector():
    # hand-assembled 2x1 screen, 2-entry GCT, two 1x1 frames placed
    # at x=0 and x=1 — no encoder involved
    pal = bytes([10, 20, 30, 40, 50, 60])  # idx0 RGB, idx1 RGB
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", 2, 1, 0x80, 0, 0)  # GCT size 2, bg 0
    out += pal
    for x, idx_val in ((0, 1), (1, 0)):
        out += struct.pack("<BBBBHBB", 0x21, 0xF9, 4, 0, 0, 0, 0)  # GCE
        out += struct.pack("<BHHHHB", 0x2C, x, 0, 1, 1, 0)
        out.append(2)  # min code size (spec floor)
        lzw = _lzw_encode(2, bytes([idx_val]))
        out.append(len(lzw))
        out += lzw
        out.append(0)
    out.append(0x3B)
    frames = gif_decode_frames(bytes(out))
    assert len(frames) == 2
    # frame 0: pixel(0)=pal[1], pixel(1)=bg=pal[0]
    assert frames[0].tolist() == [[[40, 50, 60], [10, 20, 30]]]
    # frame 1 keeps frame 0's left pixel (disposal none), right=pal[0]
    assert frames[1].tolist() == [[[40, 50, 60], [10, 20, 30]]]


def test_animation_refusals():
    with pytest.raises(ValueError, match="not a GIF"):
        gif_decode_frames(b"BM..")
    rng = np.random.default_rng(13)
    pal = rng.integers(0, 256, (4, 3), dtype=np.uint8)
    enc = gif_encode_frames(
        [{"indices": rng.integers(0, 4, (2, 2), dtype=np.uint8)}],
        pal, (2, 2),
    )
    with pytest.raises(ValueError, match="truncated"):
        gif_decode_frames(enc[:-4])
    with pytest.raises(ValueError, match="exceeds the logical screen"):
        gif_encode_frames(
            [{"indices": rng.integers(0, 4, (3, 3), dtype=np.uint8)}],
            pal, (2, 2),
        )
