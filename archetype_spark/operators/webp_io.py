"""Dependency-free WebP-LOSSLESS (VP8L) codec (stdlib + numpy) —
the compressed sibling of png_io/jpeg_io/gif_io/bmp_io, closing the
WebP slice of the reference's image decode surface (the reference
reads images through Daft's `.image.decode`, reference
pyproject.toml:7-8).

Implements the PUBLIC WebP lossless bitstream (RFC 9649 §3, the
format cwebp -lossless and current browsers emit):

- decode: the full VP8L pixel stream — LSB-first bit reading,
  DEFLATE-style canonical prefix codes (simple 1-2-symbol and
  normal code-length-coded forms, incl. the 16/17/18 repeat codes
  and the max_symbol short form), meta-prefix (entropy) images,
  color cache, LZ77 backward references with the 120-entry 2D
  distance neighborhood, and ALL FOUR transforms in reverse order:
  PREDICTOR (14 modes), COLOR_TRANSFORM (signed >>5 cross-channel
  deltas), SUBTRACT_GREEN, and COLOR_INDEXING (delta-summed palette
  + sub-byte pixel packing). Lossy (VP8) chunks route to vp8_io's
  RFC 6386 keyframe decoder (grayscale for flat-chroma streams;
  color streams refuse rather than bake a non-normative YUV->RGB
  matrix into the digest). Extended (VP8X) still images decode via
  the container walk below (raw ALPH alpha honored, must be opaque;
  animations refuse loudly).
- encode: a minimal always-valid VP8L writer for fixtures/round
  trips — no transforms, no color cache, one prefix-code group,
  literals only, canonical Huffman per channel (simple codes when a
  channel holds <= 2 distinct values) — plus RIFF wrappers for the
  lossy encoder (webp_encode_lossy_gray) and the extended container
  (webp_encode_vp8x).

The decode loop is per-pixel Python (LZ77 + color cache are
inherently sequential); VP8L payloads in the media fixtures are
KB-scale, and the batch boundary stays Arrow-vectorized in
multimodal.image_pixel_stats.

Decoded pixels return as uint8 (h, w, 3) RGB for lossless and
(h, w) grayscale for flat-chroma lossy (alpha must be 255 — an
alpha-carrying image refuses rather than silently dropping the
channel), matching the shapes image_pixel_stats digests for the
other codecs.
"""

from __future__ import annotations

import heapq
import struct

import numpy as np

from archetype_spark.operators import vp8_io

#: code-length-code read order (RFC 9649 §3.7.1.2)
_CLC_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

#: the 120-entry distance-code neighborhood (dx, dy), RFC 9649 §3.6.4
_DIST_MAP = (
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
)


class _BitReader:
    """LSB-first bit reader (RFC 9649 §3.2)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def read(self, n: int) -> int:
        v = 0
        for i in range(n):
            byte = self.pos >> 3
            if byte >= len(self.data):
                raise ValueError("VP8L bitstream truncated")
            v |= ((self.data[byte] >> (self.pos & 7)) & 1) << i
            self.pos += 1
        return v


class _Prefix:
    """Canonical prefix code decoder: DEFLATE-style assignment
    (by length, then symbol), code bits read MSB first."""

    def __init__(self, lengths: dict[int, int]):
        # lengths: symbol -> code length (>0)
        self.table: dict[tuple[int, int], int] = {}
        self.single = None
        used = sorted((ln, s) for s, ln in lengths.items() if ln > 0)
        if not used:
            raise ValueError("prefix code with no symbols")
        if len(used) == 1:
            self.single = used[0][1]
            return
        code = 0
        prev_len = 0
        kraft = 0
        for ln, s in used:
            code <<= ln - prev_len
            self.table[(ln, code)] = s
            kraft += 1 << (15 - ln)
            code += 1
            prev_len = ln
        if kraft != 1 << 15:
            raise ValueError("prefix code is not complete (Kraft sum)")

    def read(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        for ln in range(1, 16):
            code = (code << 1) | br.read(1)
            s = self.table.get((ln, code))
            if s is not None:
                return s
        raise ValueError("invalid prefix code in VP8L stream")


def _read_prefix_code(br: _BitReader, alphabet_size: int) -> _Prefix:
    """One prefix code (RFC 9649 §3.7.1): simple or normal form."""
    if br.read(1):  # simple
        num_symbols = br.read(1) + 1
        if br.read(1):  # first symbol is 8 bits
            s0 = br.read(8)
        else:
            s0 = br.read(1)
        if num_symbols == 1:
            p = _Prefix.__new__(_Prefix)
            p.table = {}
            p.single = s0
            return p
        s1 = br.read(8)
        return _Prefix({s0: 1, s1: 1})
    num_clc = 4 + br.read(4)
    clc_lengths: dict[int, int] = {}
    for i in range(num_clc):
        ln = br.read(3)
        if ln:
            clc_lengths[_CLC_ORDER[i]] = ln
    clc = _Prefix(clc_lengths)
    if br.read(1):  # short form: explicit max symbol
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = {}
    symbol = 0
    prev_len = 8
    while symbol < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        code_len = clc.read(br)
        if code_len < 16:
            if code_len:
                lengths[symbol] = code_len
                prev_len = code_len
            symbol += 1
        elif code_len == 16:
            rep = 3 + br.read(2)
            for _ in range(rep):
                if symbol < alphabet_size:
                    lengths[symbol] = prev_len
                    symbol += 1
        elif code_len == 17:
            symbol += 3 + br.read(3)
        else:  # 18
            symbol += 11 + br.read(7)
    return _Prefix(lengths)


def _copy_len(br: _BitReader, code: int) -> int:
    """LZ77 length/distance prefix decoding (RFC 9649 §3.6.3)."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


def _decode_image(
    br: _BitReader, w: int, h: int, is_level0: bool, transforms=None
):
    """One VP8L image stream -> uint32 ARGB array (h, w). With
    `transforms` (a list, level0 only) the read transforms are
    appended for the caller to invert."""
    if is_level0:
        seen = set()
        while br.read(1):
            ttype = br.read(2)
            if ttype in seen:
                raise ValueError(f"VP8L transform {ttype} repeated")
            seen.add(ttype)
            if ttype == 0 or ttype == 1:  # predictor / color transform
                size_bits = br.read(3) + 2
                bw = (w + (1 << size_bits) - 1) >> size_bits
                bh = (h + (1 << size_bits) - 1) >> size_bits
                sub = _decode_image(br, bw, bh, False)
                transforms.append((ttype, size_bits, sub))
            elif ttype == 2:  # subtract green
                transforms.append((2, None, None))
            else:  # color indexing
                pal_size = br.read(8) + 1
                pal_img = _decode_image(br, pal_size, 1, False)
                # palette components are delta-summed left to right
                pal = np.cumsum(
                    pal_img[0].view(np.uint8).reshape(pal_size, 4).astype(
                        np.uint32
                    ),
                    axis=0,
                ).astype(np.uint8)
                if pal_size <= 2:
                    width_bits = 3
                elif pal_size <= 4:
                    width_bits = 2
                elif pal_size <= 16:
                    width_bits = 1
                else:
                    width_bits = 0
                transforms.append((3, (width_bits, w), pal))
                # subsequent transforms and the pixel stream operate
                # on the PACKED width
                w = (w + (1 << width_bits) - 1) >> width_bits
    # color cache
    cache_bits = 0
    if br.read(1):
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError(f"VP8L color-cache bits {cache_bits}")
    cache = [0] * (1 << cache_bits) if cache_bits else None
    # meta prefix image
    meta = None
    meta_bits = 0
    n_groups = 1
    if is_level0 and br.read(1):
        meta_bits = br.read(3) + 2
        mw = (w + (1 << meta_bits) - 1) >> meta_bits
        mh = (h + (1 << meta_bits) - 1) >> meta_bits
        meta_img = _decode_image(br, mw, mh, False)
        meta = ((meta_img >> 8) & 0xFFFF).astype(np.int64)
        n_groups = int(meta.max()) + 1
    green_size = 256 + 24 + (1 << cache_bits if cache_bits else 0)
    groups = []
    for _ in range(n_groups):
        groups.append(
            (
                _read_prefix_code(br, green_size),
                _read_prefix_code(br, 256),
                _read_prefix_code(br, 256),
                _read_prefix_code(br, 256),
                _read_prefix_code(br, 40),
            )
        )
    out = np.zeros(w * h, dtype=np.uint32)
    pos = 0
    total = w * h
    hash_mul = 0x1E35A7BD
    while pos < total:
        if meta is not None:
            x, y = pos % w, pos // w
            g = groups[int(meta[y >> meta_bits, x >> meta_bits])]
        else:
            g = groups[0]
        s = g[0].read(br)
        if s < 256:
            red = g[1].read(br)
            blue = g[2].read(br)
            alpha = g[3].read(br)
            px = (alpha << 24) | (red << 16) | (s << 8) | blue
            out[pos] = px
            if cache is not None:
                cache[((hash_mul * px) & 0xFFFFFFFF) >> (32 - cache_bits)] = px
            pos += 1
        elif s < 280:
            length = _copy_len(br, s - 256)
            plane = _copy_len(br, g[4].read(br))
            if plane > 120:
                dist = plane - 120
            else:
                dx, dy = _DIST_MAP[plane - 1]
                dist = max(1, dy * w + dx)
            if dist > pos or pos + length > total:
                raise ValueError("VP8L backward reference out of range")
            for _ in range(length):
                px = int(out[pos - dist])
                out[pos] = px
                if cache is not None:
                    cache[
                        ((hash_mul * px) & 0xFFFFFFFF) >> (32 - cache_bits)
                    ] = px
                pos += 1
        else:
            if cache is None:
                raise ValueError("VP8L cache symbol without a color cache")
            out[pos] = cache[s - 280]
            pos += 1
    return out.reshape(h, w)


def _inverse_transforms(argb: np.ndarray, transforms, w: int, h: int):
    """Apply the read transforms in REVERSE order (RFC 9649 §3.5)."""
    for ttype, info, data in reversed(transforms):
        if ttype == 3:  # color indexing
            width_bits, full_w = info
            pal = data  # (n, 4) uint8 rows of B,G,R,A (LE uint32 view)
            idx = ((argb >> 8) & 0xFF).astype(np.int64)
            if width_bits:
                per = 1 << width_bits
                bits = 8 >> width_bits
                mask = (1 << bits) - 1
                wide = np.zeros((argb.shape[0], argb.shape[1] * per), np.int64)
                for k in range(per):
                    wide[:, k::per] = (idx >> (k * bits)) & mask
                idx = wide[:, :full_w]
            if idx.max(initial=0) >= len(pal):
                raise ValueError("VP8L palette index out of range")
            quads = pal[idx]  # (..., 4) little-endian B,G,R,A
            argb = (
                quads[..., 3].astype(np.uint32) << 24
                | quads[..., 2].astype(np.uint32) << 16
                | quads[..., 1].astype(np.uint32) << 8
                | quads[..., 0].astype(np.uint32)
            )
        elif ttype == 2:  # add green
            g = (argb >> 8) & 0xFF
            r = (((argb >> 16) & 0xFF) + g) & 0xFF
            b = ((argb & 0xFF) + g) & 0xFF
            argb = (argb & 0xFF00FF00) | (r << 16) | b
        elif ttype == 1:  # color transform (inverse)
            size_bits, sub = info, data
            hh, ww = argb.shape
            a = (argb >> 24) & 0xFF
            r = ((argb >> 16) & 0xFF).astype(np.int64)
            g = ((argb >> 8) & 0xFF).astype(np.int64)
            b = (argb & 0xFF).astype(np.int64)
            ys, xs = np.indices((hh, ww))
            cte = sub[ys >> size_bits, xs >> size_bits]
            g2r = (cte & 0xFF).astype(np.int8).astype(np.int64)
            g2b = ((cte >> 8) & 0xFF).astype(np.int8).astype(np.int64)
            r2b = ((cte >> 16) & 0xFF).astype(np.int8).astype(np.int64)
            gs = g.astype(np.int8).astype(np.int64)
            r = (r + ((g2r * gs) >> 5)) & 0xFF
            rs = r.astype(np.uint8).view(np.uint8).astype(np.int8).astype(np.int64)
            b = (b + ((g2b * gs) >> 5) + ((r2b * rs) >> 5)) & 0xFF
            argb = (
                a.astype(np.uint32) << 24
                | r.astype(np.uint32) << 16
                | g.astype(np.uint32) << 8
                | b.astype(np.uint32)
            )
        else:  # predictor
            size_bits, sub = info, data
            argb = _inverse_predictor(argb, sub, size_bits)
    return argb


def _avg2(a, b):
    return tuple((x + y) >> 1 for x, y in zip(a, b))


def _clamp_add_sub_full(a, b, c):
    return tuple(min(255, max(0, x + y - z)) for x, y, z in zip(a, b, c))


def _cash(ave, c):
    # C-truncating division (toward zero), not Python floor
    d = ave - c
    half = d // 2 if d >= 0 else -((-d) // 2)
    return min(255, max(0, ave + half))


def _select(l, t, tl):  # noqa: E741
    """Predictor 11: the neighbor (T or L) closer to P = L + T - TL,
    T on ties — |P - T| reduces to |L - TL| and |P - L| to |T - TL|
    (the libwebp Sub3 form)."""
    p_t = sum(abs(x - z) for x, z in zip(l, tl))  # == |P - T|
    p_l = sum(abs(y - z) for y, z in zip(t, tl))  # == |P - L|
    return t if p_t <= p_l else l


def _inverse_predictor(res: np.ndarray, sub: np.ndarray, size_bits: int):
    """Predictor transform inverse (RFC 9649 §3.5.1): per-channel
    modular add of the block's predictor to the residual. Sequential
    by construction (each pixel's predictor reads decoded
    neighbors)."""
    h, w = res.shape
    out = np.zeros_like(res)

    def px(y, x):
        v = int(out[y, x])
        return ((v >> 24) & 0xFF, (v >> 16) & 0xFF, (v >> 8) & 0xFF, v & 0xFF)

    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = (0xFF, 0, 0, 0)
            elif y == 0:
                pred = px(0, x - 1)
            elif x == 0:
                pred = px(y - 1, 0)
            else:
                mode = int((sub[y >> size_bits, x >> size_bits] >> 8) & 0xFF)
                L = px(y, x - 1)
                T = px(y - 1, x)
                TL = px(y - 1, x - 1)
                # rightmost column: TR is pixel (pos - width + 1) in
                # scan order = the CURRENT row's first pixel (already
                # decoded) — the libwebp wrap
                TR = px(y - 1, x + 1) if x + 1 < w else px(y, 0)
                if mode == 0:
                    pred = (0xFF, 0, 0, 0)
                elif mode == 1:
                    pred = L
                elif mode == 2:
                    pred = T
                elif mode == 3:
                    pred = TR
                elif mode == 4:
                    pred = TL
                elif mode == 5:
                    pred = _avg2(_avg2(L, TR), T)
                elif mode == 6:
                    pred = _avg2(L, TL)
                elif mode == 7:
                    pred = _avg2(L, T)
                elif mode == 8:
                    pred = _avg2(TL, T)
                elif mode == 9:
                    pred = _avg2(T, TR)
                elif mode == 10:
                    pred = _avg2(_avg2(L, TL), _avg2(T, TR))
                elif mode == 11:
                    pred = _select(L, T, TL)
                elif mode == 12:
                    pred = _clamp_add_sub_full(L, T, TL)
                elif mode == 13:
                    ave = _avg2(L, T)
                    pred = tuple(_cash(a, c) for a, c in zip(ave, TL))
                else:
                    raise ValueError(f"VP8L predictor mode {mode}")
            v = int(res[y, x])
            ra = ((v >> 24) + pred[0]) & 0xFF
            rr = (((v >> 16) & 0xFF) + pred[1]) & 0xFF
            rg = (((v >> 8) & 0xFF) + pred[2]) & 0xFF
            rb = ((v & 0xFF) + pred[3]) & 0xFF
            out[y, x] = (ra << 24) | (rr << 16) | (rg << 8) | rb
    return out


def webp_lossless_info(payload: bytes):
    """(width, height) for a lossless (VP8L) WebP, else None."""
    if (
        len(payload or b"") < 30
        or payload[:4] != b"RIFF"
        or payload[8:12] != b"WEBP"
    ):
        return None
    if payload[12:16] != b"VP8L":
        return None
    if payload[20] != 0x2F:
        raise ValueError("VP8L signature byte missing")
    bits = struct.unpack_from("<I", payload, 21)[0]
    return (bits & 0x3FFF) + 1, ((bits >> 14) & 0x3FFF) + 1


def _walk_chunks(p: bytes, start: int = 12):
    """(fourcc, payload) pairs of a RIFF body, honoring even padding."""
    off = start
    while off + 8 <= len(p):
        fourcc = p[off:off + 4]
        size = struct.unpack_from("<I", p, off + 4)[0]
        body = p[off + 8:off + 8 + size]
        if len(body) < size:
            raise ValueError(f"WebP chunk {fourcc!r} truncated")
        yield fourcc, body
        off += 8 + size + (size & 1)


def _alph_decode(body: bytes, w: int, h: int) -> np.ndarray:
    """VP8X ALPH chunk -> uint8 (h, w) alpha plane. Compression
    method 0 (raw bytes) and method 1 (a HEADERLESS VP8L bitstream
    whose green channel carries the alpha values — dimensions come
    from the container), each under the four prediction filters."""
    if not body:
        raise ValueError("empty ALPH chunk")
    head = body[0]
    method = head & 3
    filt = (head >> 2) & 3
    if method == 1:
        br = _BitReader(body[1:])
        transforms: list = []
        argb = _decode_image(br, w, h, True, transforms)
        argb = _inverse_transforms(argb, transforms, w, h)
        a = ((argb >> 8) & 0xFF).astype(np.int32)
    elif method != 0:
        raise ValueError(f"ALPH compression method {method} is reserved")
    else:
        raw = body[1:1 + w * h]
        if len(raw) < w * h:
            raise ValueError("ALPH raw data truncated")
        a = np.frombuffer(raw, np.uint8).reshape(h, w).astype(np.int32)
    if filt:
        out = np.zeros((h, w), dtype=np.int32)
        for y in range(h):
            for x in range(w):
                left = out[y, x - 1] if x else 0
                top = out[y - 1, x] if y else 0
                tl = out[y - 1, x - 1] if (x and y) else 0
                if filt == 1:
                    pred = left if x else (top if y else 0)
                elif filt == 2:
                    pred = top if y else (left if x else 0)
                else:
                    pred = min(255, max(0, left + top - tl))
                out[y, x] = (a[y, x] + pred) & 0xFF
        a = out
    return a.astype(np.uint8)


def _decode_vp8_body(body: bytes) -> np.ndarray:
    """VP8 (lossy) chunk -> uint8 (h, w) GRAYSCALE pixels when the
    stream's chroma is flat 128 (the exact, conversion-free case);
    color streams refuse loudly — RFC 6386 defines no normative
    YUV->RGB matrix, so emitting RGB would bake a guessed conversion
    into the pixel digest. vp8_io.vp8_decode_yuv exposes the full
    normative (Y, U, V) output."""
    y, u, v = vp8_io.vp8_decode_yuv(body)
    if not (bool((u == 128).all()) and bool((v == 128).all())):
        raise NotImplementedError(
            "color VP8 stream: YUV->RGB conversion is not normative; "
            "use vp8_io.vp8_decode_yuv for the exact YUV planes"
        )
    return y


def _decode_vp8x(p: bytes) -> np.ndarray:
    """Extended (VP8X) still image: walk the chunk sequence, decode
    the VP8/VP8L image chunk, honor a raw ALPH chunk (which must be
    fully opaque — the RGB pixel-stats contract), refuse animation."""
    chunks = list(_walk_chunks(p))
    if not chunks or chunks[0][0] != b"VP8X":
        raise ValueError("VP8X chunk must lead the extended container")
    head = chunks[0][1]
    if len(head) < 10:
        raise ValueError("VP8X header truncated")
    flags = head[0]
    if flags & 0x02:
        raise NotImplementedError(
            "animated WebP (ANIM/ANMF) is a frame sequence, not a "
            "still image"
        )
    alpha_body = None
    for fourcc, body in chunks[1:]:
        if fourcc in (b"ANIM", b"ANMF"):
            raise NotImplementedError(
                "animated WebP (ANIM/ANMF) is a frame sequence, not "
                "a still image"
            )
        if fourcc == b"ALPH":
            alpha_body = body
        elif fourcc == b"VP8L":
            # VP8L carries its own alpha; a stray ALPH is invalid and
            # ignored by reference readers.
            return _decode_vp8l_body(body)
        elif fourcc == b"VP8 ":
            px = _decode_vp8_body(body)
            if alpha_body is not None:
                h, w = px.shape[:2]
                a = _alph_decode(alpha_body, w, h)
                if not bool((a == 255).all()):
                    raise NotImplementedError(
                        "VP8X image carries a non-opaque alpha plane; "
                        "the pixel-stats contract would silently drop it"
                    )
            return px
    raise ValueError("VP8X container has no VP8/VP8L image chunk")


def webp_decode(payload: bytes):
    """Decoded pixels of a WebP payload: uint8 (h, w, 3) RGB for
    lossless (VP8L), uint8 (h, w) grayscale for a flat-chroma lossy
    (VP8) stream, either behind an extended (VP8X) container. A
    non-opaque alpha channel and color lossy streams refuse loudly
    (dropping alpha or guessing a YUV->RGB matrix would corrupt the
    pixel digest); so do animations."""
    p = bytes(payload or b"")
    if len(p) < 16 or p[:4] != b"RIFF" or p[8:12] != b"WEBP":
        raise ValueError("not a WebP (RIFF/WEBP) payload")
    fourcc = p[12:16]
    if fourcc == b"VP8 ":
        size = struct.unpack_from("<I", p, 16)[0]
        body = p[20:20 + size]
        if len(body) < size:
            raise ValueError("VP8 chunk truncated")
        return _decode_vp8_body(body)
    if fourcc == b"VP8X":
        return _decode_vp8x(p)
    if fourcc != b"VP8L":
        raise ValueError(f"unknown WebP chunk {fourcc!r}")
    size = struct.unpack_from("<I", p, 16)[0]
    body = p[20 : 20 + size]
    if len(body) < size:
        raise ValueError("VP8L chunk truncated")
    return _decode_vp8l_body(body)


def _decode_vp8l_body(body: bytes) -> np.ndarray:
    """uint8 (h, w, 3) RGB pixels of a VP8L chunk body."""
    if not body or body[0] != 0x2F:
        raise ValueError("VP8L signature byte missing")
    br = _BitReader(body[1:])
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha hint
    version = br.read(3)
    if version != 0:
        raise NotImplementedError(f"VP8L version {version}")
    transforms: list = []
    argb = _decode_image(br, w, h, True, transforms)
    argb = _inverse_transforms(argb, transforms, w, h)
    a = (argb >> 24) & 0xFF
    if not bool((a == 0xFF).all()):
        raise NotImplementedError(
            "VP8L image carries a non-opaque alpha channel; the RGB "
            "pixel-stats contract would silently drop it"
        )
    out = np.stack(
        [
            ((argb >> 16) & 0xFF).astype(np.uint8),
            ((argb >> 8) & 0xFF).astype(np.uint8),
            (argb & 0xFF).astype(np.uint8),
        ],
        axis=-1,
    )
    return np.ascontiguousarray(out)


# ------------------------------------------------------------------- encoder
class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.bitpos = 0

    def write(self, value: int, n: int) -> None:
        for i in range(n):
            if self.bitpos & 7 == 0:
                self.buf.append(0)
            if (value >> i) & 1:
                self.buf[-1] |= 1 << (self.bitpos & 7)
            self.bitpos += 1

    def write_code(self, code: int, n: int) -> None:
        """Prefix-code bits go MSB first (DEFLATE packing)."""
        for i in range(n - 1, -1, -1):
            self.write((code >> i) & 1, 1)


def _canonical(lengths: dict[int, int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), canonical by (length, symbol)."""
    out = {}
    code = 0
    prev = 0
    for ln, s in sorted((ln, s) for s, ln in lengths.items()):
        code <<= ln - prev
        out[s] = (code, ln)
        code += 1
        prev = ln
    return out


def _huffman_lengths(freqs: dict[int, int]) -> dict[int, int]:
    """Code lengths from frequencies (plain Huffman; alphabets here
    are <= 256 with fixture-scale depth, well under the 15 limit)."""
    if len(freqs) == 1:
        return {next(iter(freqs)): 1}
    heap = [(f, i, (s,)) for i, (s, f) in enumerate(sorted(freqs.items()))]
    heapq.heapify(heap)
    depth = dict.fromkeys(freqs, 0)
    tick = len(heap)
    while len(heap) > 1:
        f1, _i1, s1 = heapq.heappop(heap)
        f2, _i2, s2 = heapq.heappop(heap)
        for s in s1 + s2:
            depth[s] += 1
        heapq.heappush(heap, (f1 + f2, tick, s1 + s2))
        tick += 1
    if max(depth.values()) > 15:
        raise ValueError("fixture encoder exceeded prefix depth 15")
    return depth


def _write_prefix_code(bw: _BitWriter, lengths: dict[int, int]) -> None:
    symbols = sorted(lengths)
    if len(symbols) <= 2 and max(symbols) <= 255:
        bw.write(1, 1)  # simple
        bw.write(len(symbols) - 1, 1)
        if symbols[0] > 1:
            bw.write(1, 1)
            bw.write(symbols[0], 8)
        else:
            bw.write(0, 1)
            bw.write(symbols[0], 1)
        if len(symbols) == 2:
            bw.write(symbols[1], 8)
        return
    bw.write(0, 1)  # normal
    # code-length code: emit ALL 19 entries as 3-bit literals
    max_sym = max(symbols)
    cl_freq: dict[int, int] = {}
    for s in range(max_sym + 1):
        cl_freq[lengths.get(s, 0)] = cl_freq.get(lengths.get(s, 0), 0) + 1
    cl_lengths = _huffman_lengths(cl_freq)
    if len(cl_freq) == 1:
        # a single code-length value still needs a COMPLETE code:
        # pad with an unused second symbol at length 1
        only = next(iter(cl_freq))
        other = 0 if only != 0 else 1
        cl_lengths = {only: 1, other: 1}
    bw.write(15, 4)  # num_code_lengths = 19
    order_pos = {c: i for i, c in enumerate(_CLC_ORDER)}
    emitted = [0] * 19
    for c, ln in cl_lengths.items():
        emitted[order_pos[c]] = ln
    for ln in emitted:
        bw.write(ln, 3)
    clc = _canonical(cl_lengths)
    # max_symbol short form: the decoder reads exactly max_sym + 1
    # length entries; everything past them is implicitly absent
    n_entries = max_sym + 1
    bw.write(1, 1)
    nbits_code = 0
    while (1 << (2 + 2 * nbits_code)) < n_entries - 2 + 1:
        nbits_code += 1
    bw.write(nbits_code, 3)
    bw.write(n_entries - 2, 2 + 2 * nbits_code)
    for s in range(n_entries):
        code, ln = clc[lengths.get(s, 0)]
        bw.write_code(code, ln)


def _write_vp8l_literals(bw: "_BitWriter", greens, reds, blues, alphas):
    """The literal-only VP8L pixel stream shared by webp_encode and
    the method-1 ALPH encoder: no transforms, no color cache, one
    prefix group, canonical Huffman per channel."""
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no color cache
    bw.write(0, 1)  # no meta prefix image
    chans = []
    for vals in (greens, reds, blues, alphas):
        uniq, counts = np.unique(vals, return_counts=True)
        freqs = {int(s): int(c) for s, c in zip(uniq, counts)}
        lengths = _huffman_lengths(freqs)
        _write_prefix_code(bw, lengths)
        if len(lengths) == 1:
            # single-symbol simple code: ZERO bits per symbol
            chans.append({next(iter(lengths)): (0, 0)})
        else:
            chans.append(_canonical(lengths))
    _write_prefix_code(bw, {0: 1})  # distance code: unused single symbol
    gc, rc, bc, ac = chans
    for g, r, b, al in zip(greens, reds, blues, alphas):
        for code, ln in (
            gc[int(g)], rc[int(r)], bc[int(b)], ac[int(al)]
        ):
            bw.write_code(code, ln)


def alph_encode_vp8l(alpha: np.ndarray) -> bytes:
    """A method-1 ALPH chunk body for a uint8 (h, w) alpha plane: the
    headerless VP8L literal stream with alpha in the green channel
    (filtering method 0). The inverse of _alph_decode's method-1
    path."""
    a = np.asarray(alpha, dtype=np.uint8)
    h, w = a.shape
    bw = _BitWriter()
    _write_vp8l_literals(
        bw,
        a.ravel(),
        np.zeros(w * h, np.uint8),
        np.zeros(w * h, np.uint8),
        np.full(w * h, 255, np.uint8),
    )
    return b"\x01" + bytes(bw.buf)


def webp_encode(arr: np.ndarray) -> bytes:
    """Minimal VP8L bytes for a uint8 (h, w, 3) RGB or (h, w) gray
    array: literals only, one prefix group, no transforms — the
    always-valid form every VP8L reader accepts (lossless round
    trip)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = np.repeat(a[:, :, None], 3, axis=2)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError(f"webp_encode wants (h, w[, 3]); got {a.shape}")
    h, w = a.shape[:2]
    if not (0 < w <= 16384 and 0 < h <= 16384):
        raise ValueError(f"VP8L dimensions {w}x{h} out of range")
    bw = _BitWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # no alpha
    bw.write(0, 3)  # version
    _write_vp8l_literals(
        bw,
        a[:, :, 1].ravel(),
        a[:, :, 0].ravel(),
        a[:, :, 2].ravel(),
        np.full(w * h, 255, np.uint8),
    )
    body = bytes([0x2F]) + bytes(bw.buf)
    chunk = b"VP8L" + struct.pack("<I", len(body)) + body
    if len(body) & 1:
        chunk += b"\x00"
    riff = b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
    return riff


def webp_encode_lossy_gray(px: np.ndarray, **kwargs) -> bytes:
    """RIFF-wrapped LOSSY (VP8) WebP of a uint8 (h, w) grayscale array
    that decodes back bit-exactly (vp8_io.vp8_encode_gray's DC-only
    construction; kwargs pass through — qindex, mb_modes, bmodes,
    filter_level, use_skip)."""
    frame = vp8_io.vp8_encode_gray(np.asarray(px), **kwargs)
    chunk = b"VP8 " + struct.pack("<I", len(frame)) + frame
    if len(frame) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def webp_encode_vp8x(arr: np.ndarray, alpha_chunk: bool = False) -> bytes:
    """Extended-container (VP8X) WebP wrapping this module's lossless
    VP8L encoding of `arr` — the still-image extended layout current
    muxers emit. With alpha_chunk=True a raw all-opaque ALPH chunk is
    prepended (exercises the reader's alpha path; VP8L itself already
    carries alpha, so this is only for plumbing tests)."""
    a = np.asarray(arr, dtype=np.uint8)
    h, w = a.shape[:2]
    inner = webp_encode(a)
    vp8l_chunk = inner[12:]  # the VP8L chunk incl. header + padding
    flags = 0
    body = b""
    if alpha_chunk:
        flags |= 0x10
        alph = b"ALPH" + struct.pack("<I", 1 + w * h) + b"\x00" + b"\xff" * (w * h)
        if (1 + w * h) & 1:
            alph += b"\x00"
        body += alph
    head = bytes([flags, 0, 0, 0]) + (w - 1).to_bytes(3, "little") + (
        h - 1
    ).to_bytes(3, "little")
    vp8x = b"VP8X" + struct.pack("<I", len(head)) + head
    payload = vp8x + body + vp8l_chunk
    return b"RIFF" + struct.pack("<I", 4 + len(payload)) + b"WEBP" + payload
