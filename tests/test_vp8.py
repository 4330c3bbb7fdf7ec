"""Lossy-WebP / VP8 keyframe codec (operators/vp8_io.py): boolean
coder fuzz round-trips, the DC-only exactness identities the fixture
encoder is built on, pixel-exact encode/decode round trips across all
intra modes / quantizer indexes / skip / chroma / token-partition
variants, hand-computed loop-filter arithmetic (normal and simple
kernels, straight from RFC 6386 §15), ALPH alpha-filter decoding,
loud refusals, and the webp_io container dispatch (bare VP8, VP8X).

Foreign-stream note (mirrors the module docstring): the large default
probability tables are memory-transcribed and cross-validated only
where libwebp/PIL exists — test_pil_cross_check runs there and skips
here. Everything below is exact regardless, because encoder and
decoder share the module's tables.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from archetype_spark.operators import vp8_io, webp_io


def _wrap(frame: bytes) -> bytes:
    chunk = b"VP8 " + struct.pack("<I", len(frame)) + frame
    if len(frame) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def _tiles(rng, mb_h, mb_w) -> np.ndarray:
    vals = rng.integers(0, 256, (mb_h, mb_w), dtype=np.uint8)
    return np.kron(vals, np.ones((16, 16), dtype=np.uint8))


# ------------------------------------------------------------ bool coder
def test_bool_coder_fuzz_roundtrip():
    rng = np.random.default_rng(0)
    for trial in range(20):
        n = int(rng.integers(1, 400))
        probs = rng.integers(1, 256, n)
        bits = rng.integers(0, 2, n)
        be = vp8_io._BoolEncoder()
        for p, b in zip(probs, bits):
            be.bool(int(p), int(b))
        bd = vp8_io._BoolDecoder(be.get_bytes())
        for p, b in zip(probs, bits):
            assert bd.bool(int(p)) == b, trial


def test_bool_coder_literals_and_trees():
    be = vp8_io._BoolEncoder()
    be.literal(7, 93)
    be.signed_literal(4, -11)
    be.signed_literal(4, 0)
    be.tree(vp8_io._KF_YMODE_TREE, vp8_io._KF_YMODE_PROB, 0)
    be.tree(vp8_io._KF_YMODE_TREE, vp8_io._KF_YMODE_PROB, 4)
    for v in range(10):
        be.tree(vp8_io._BMODE_TREE, vp8_io._KF_BMODE_PROB[3][7], v)
    bd = vp8_io._BoolDecoder(be.get_bytes())
    assert bd.literal(7) == 93
    assert bd.signed_literal(4) == -11
    assert bd.signed_literal(4) == 0
    assert bd.tree(vp8_io._KF_YMODE_TREE, vp8_io._KF_YMODE_PROB) == 0
    assert bd.tree(vp8_io._KF_YMODE_TREE, vp8_io._KF_YMODE_PROB) == 4
    for v in range(10):
        assert bd.tree(vp8_io._BMODE_TREE, vp8_io._KF_BMODE_PROB[3][7]) == v


# ------------------------------------------------- transform identities
def test_dc_only_idct_identity():
    # the encoder's exactness hinges on (8r + 4) >> 3 == r
    for r in range(-255, 256):
        blk = [8 * r] + [0] * 15
        out = vp8_io._idct4x4(blk)
        assert out == [r] * 16, r


def test_dc_only_iwht_identity():
    # Y2 DC w dequantizes to 16c; the iWHT must fan out (16c+3)>>3 == 2c
    for c in range(-1020, 1021, 17):
        blk = [16 * c] + [0] * 15
        out = vp8_io._iwht4x4(blk)
        assert out == [2 * c] * 16, c


# ------------------------------------------------------------ round trips
@pytest.mark.parametrize("qindex", [0, 4])
@pytest.mark.parametrize("use_skip", [True, False])
def test_roundtrip_modes(qindex, use_skip):
    rng = np.random.default_rng(qindex * 2 + use_skip)
    px = _tiles(rng, 3, 4)
    modes = rng.integers(0, 4, (3, 4))
    f = vp8_io.vp8_encode_gray(
        px, qindex=qindex, mb_modes=modes, use_skip=use_skip
    )
    y, u, v = vp8_io.vp8_decode_yuv(f)
    assert (y == px).all() and (u == 128).all() and (v == 128).all()


def test_roundtrip_bpred_and_16x16_mix():
    rng = np.random.default_rng(42)
    px = _tiles(rng, 2, 3)
    f = vp8_io.vp8_encode_gray(px, mb_modes=[[4, 0, 4], [1, 4, 2]])
    y, _, _ = vp8_io.vp8_decode_yuv(f)
    assert (y == px).all()


def test_roundtrip_all_bmodes_on_constant():
    px = np.full((32, 32), 77, dtype=np.uint8)
    bm = np.zeros((2, 2, 16), dtype=int)
    bm[1][1][:] = list(range(10)) + [0, 1, 2, 3, 4, 5]
    f = vp8_io.vp8_encode_gray(px, mb_modes=[[0, 0], [0, 4]], bmodes=bm)
    y, _, _ = vp8_io.vp8_decode_yuv(f)
    assert (y == px).all()


def test_roundtrip_odd_dims_crop():
    rng = np.random.default_rng(9)
    px = _tiles(rng, 2, 2)[:22, :27]
    f = vp8_io.vp8_encode_gray(px)
    y, u, v = vp8_io.vp8_decode_yuv(f)
    assert y.shape == (22, 27) and u.shape == (11, 14)
    assert (y == px).all()
    assert vp8_io.vp8_info(f) == (27, 22)


def test_roundtrip_flat_color_chroma():
    rng = np.random.default_rng(5)
    px = _tiles(rng, 2, 2)
    for q in (0, 4):
        f = vp8_io.vp8_encode_gray(px, qindex=q, uv=(90, 201))
        y, u, v = vp8_io.vp8_decode_yuv(f)
        assert (y == px).all() and (u == 90).all() and (v == 201).all()


@pytest.mark.parametrize("nparts", [2, 4, 8])
def test_roundtrip_token_partitions(nparts):
    rng = np.random.default_rng(nparts)
    px = _tiles(rng, 9, 2)  # more MB rows than partitions
    f = vp8_io.vp8_encode_gray(px, token_partitions=nparts)
    y, _, _ = vp8_io.vp8_decode_yuv(f)
    assert (y == px).all()


def test_skip_and_no_skip_streams_both_exact():
    # (skip flags at prob 128 cost a full bit per MB while EOB tokens
    # at ~253/256 cost ~0.04 bits, so skip isn't necessarily SMALLER —
    # what matters is that both stream shapes decode exactly)
    px = np.full((64, 64), 200, dtype=np.uint8)
    f_skip = vp8_io.vp8_encode_gray(px, use_skip=True)
    f_full = vp8_io.vp8_encode_gray(px, use_skip=False)
    assert f_skip != f_full
    assert (vp8_io.vp8_decode_yuv(f_skip)[0] == px).all()
    assert (vp8_io.vp8_decode_yuv(f_full)[0] == px).all()


def test_nonuniform_residual_refuses():
    rng = np.random.default_rng(1)
    with pytest.raises(ValueError, match="not uniform"):
        vp8_io.vp8_encode_gray(
            rng.integers(0, 256, (16, 16), dtype=np.uint8)
        )


# ------------------------------------------------------------ loop filter
def test_normal_loop_filter_hand_computed():
    # 100|104 tiles at level 30, sharpness 0: interior=30,
    # mb_edge=(30+2)*2+30=94, hev_t=1 -> not hev; w=c(-4+12)=8;
    # taps (27w+63)>>7=2, (18w+63)>>7=1, (9w+63)>>7=1 (RFC 6386 §15.2)
    px = np.kron(
        np.array([[100, 104]], dtype=np.uint8), np.ones((16, 16), np.uint8)
    )
    f = vp8_io.vp8_encode_gray(px, filter_level=30)
    y, _, _ = vp8_io.vp8_decode_yuv(f)
    for r in range(16):
        assert y[r, 12:20].tolist() == [100, 101, 101, 102, 102, 103, 103, 104]
    # the unfiltered encode of the same tiles stays source-exact
    assert (vp8_io.vp8_decode_yuv(vp8_io.vp8_encode_gray(px))[0] == px).all()


def test_simple_loop_filter_hand_computed():
    # simple kernel: a=c(-4+12)=8, f1=(8+4)>>3=1, f2=(8+3)>>3=1
    px = np.kron(
        np.array([[100, 104]], dtype=np.uint8), np.ones((16, 16), np.uint8)
    )
    f = vp8_io.vp8_encode_gray(px, filter_level=30, simple_filter=True)
    y, _, _ = vp8_io.vp8_decode_yuv(f)
    for r in range(16):
        assert y[r, 14:18].tolist() == [100, 101, 103, 104]


def test_loop_filter_preserves_real_edges():
    # a 0|255 step exceeds the edge limit: the loop filter must NOT
    # smear it (it only smooths quantization-scale steps)
    px = np.kron(
        np.array([[0, 255], [255, 0]], dtype=np.uint8),
        np.ones((16, 16), np.uint8),
    )
    f = vp8_io.vp8_encode_gray(px, filter_level=40)
    y, _, _ = vp8_io.vp8_decode_yuv(f)
    assert (y == px).all()


# ------------------------------------------------------------- refusals
def test_refusals():
    rng = np.random.default_rng(2)
    px = _tiles(rng, 1, 1)
    f = bytearray(vp8_io.vp8_encode_gray(px))
    with pytest.raises(NotImplementedError, match="interframe"):
        vp8_io.vp8_decode_yuv(bytes([f[0] | 1]) + bytes(f[1:]))
    with pytest.raises(ValueError, match="start code"):
        vp8_io.vp8_decode_yuv(bytes(f[:3]) + b"\x00\x01\x2a" + bytes(f[6:]))
    with pytest.raises(ValueError, match="truncated"):
        vp8_io.vp8_decode_yuv(bytes(f[:8]))
    assert vp8_io.vp8_info(b"") is None
    assert vp8_io.vp8_info(bytes([f[0] | 1]) + bytes(f[1:])) is None


# ----------------------------------------------------- container dispatch
def test_webp_lossy_dispatch_gray():
    rng = np.random.default_rng(3)
    px = _tiles(rng, 2, 3)
    w = webp_io.webp_encode_lossy_gray(px)
    out = webp_io.webp_decode(w)
    assert out.ndim == 2 and (out == px).all()


def test_webp_lossy_color_refuses():
    rng = np.random.default_rng(4)
    px = _tiles(rng, 1, 2)
    f = vp8_io.vp8_encode_gray(px, uv=(100, 150))
    with pytest.raises(NotImplementedError, match="YUV->RGB"):
        webp_io.webp_decode(_wrap(f))


def test_vp8x_wrapped_vp8l_roundtrip():
    rng = np.random.default_rng(6)
    px = rng.integers(0, 256, (7, 11, 3), dtype=np.uint8)
    for alph in (False, True):
        w = webp_io.webp_encode_vp8x(px, alpha_chunk=alph)
        assert (webp_io.webp_decode(w) == px).all()


def test_vp8x_wrapped_vp8_with_opaque_alpha():
    rng = np.random.default_rng(7)
    px = _tiles(rng, 1, 2)
    frame = vp8_io.vp8_encode_gray(px)
    h, w = px.shape
    alph = b"ALPH" + struct.pack("<I", 1 + w * h) + b"\x00" + b"\xff" * (w * h)
    if (1 + w * h) & 1:
        alph += b"\x00"
    vp8c = b"VP8 " + struct.pack("<I", len(frame)) + frame
    if len(frame) & 1:
        vp8c += b"\x00"
    head = bytes([0x10, 0, 0, 0]) + (w - 1).to_bytes(3, "little") + (
        h - 1
    ).to_bytes(3, "little")
    payload = b"VP8X" + struct.pack("<I", 10) + head + alph + vp8c
    container = b"RIFF" + struct.pack("<I", 4 + len(payload)) + b"WEBP" + payload
    out = webp_io.webp_decode(container)
    assert (out == px).all()
    # a non-opaque alpha plane refuses
    alph_bad = bytearray(alph)
    alph_bad[9] = 17
    payload = b"VP8X" + struct.pack("<I", 10) + head + bytes(alph_bad) + vp8c
    container = b"RIFF" + struct.pack("<I", 4 + len(payload)) + b"WEBP" + payload
    with pytest.raises(NotImplementedError, match="non-opaque"):
        webp_io.webp_decode(container)


def test_alph_filters_invert_exactly():
    rng = np.random.default_rng(8)
    h, w = 6, 9
    a = rng.integers(0, 256, (h, w), dtype=np.uint8).astype(np.int32)
    for filt in (0, 1, 2, 3):
        # forward-filter the plane exactly as a muxer would
        res = np.zeros_like(a)
        for y in range(h):
            for x in range(w):
                left = a[y, x - 1] if x else 0
                top = a[y - 1, x] if y else 0
                tl = a[y - 1, x - 1] if (x and y) else 0
                if filt == 0:
                    pred = 0
                elif filt == 1:
                    pred = left if x else (top if y else 0)
                elif filt == 2:
                    pred = top if y else (left if x else 0)
                else:
                    pred = min(255, max(0, left + top - tl))
                res[y, x] = (a[y, x] - pred) & 0xFF
        body = bytes([filt << 2]) + res.astype(np.uint8).tobytes()
        out = webp_io._alph_decode(body, w, h)
        assert (out == a).all(), filt
    with pytest.raises(ValueError, match="reserved"):
        webp_io._alph_decode(b"\x02" + b"\x00" * (w * h), w, h)


def test_alph_method1_vp8l_coded_alpha():
    rng = np.random.default_rng(13)
    a = rng.integers(0, 256, (6, 9), dtype=np.uint8).astype(np.uint8)
    body = webp_io.alph_encode_vp8l(a)
    assert body[0] & 3 == 1
    assert (webp_io._alph_decode(body, 9, 6) == a).all()
    # a truncated method-1 stream fails loudly in the VP8L layer
    with pytest.raises(ValueError):
        webp_io._alph_decode(body[: len(body) // 2], 9, 6)


# --------------------------------------------- PIL-gated cross-validation
def test_pil_cross_check():
    """Where libwebp (via PIL) exists, cross-validate the
    memory-transcribed probability tables: PIL must decode this
    module's lossy stream, and its RGB output of a flat-chroma stream
    must sit within conversion rounding of our Y plane."""
    PIL = pytest.importorskip("PIL.Image")
    import io

    rng = np.random.default_rng(10)
    px = _tiles(rng, 3, 3)
    w = webp_io.webp_encode_lossy_gray(px)
    im = PIL.open(io.BytesIO(w))
    arr = np.asarray(im.convert("RGB"), dtype=np.int32)
    assert arr.shape[:2] == px.shape
    # flat 128 chroma -> R=G=B=y under any sane YUV matrix, +-2 ulp
    assert np.abs(arr - px[:, :, None].astype(np.int32)).max() <= 2
