"""Dependency-free PNG codec (stdlib zlib + numpy) — the compressed
half of the real-decoder tier in operators/multimodal.py.

The reference's media surface decodes real image formats through
codec libraries (Daft `.image.decode`, reference pyproject.toml:7-8);
this container ships neither PIL nor libpng bindings, but PNG's
compression IS stdlib zlib — only the chunk framing and the five
scanline filters (spec §6, all exactly invertible integer ops) stand
between the bytes and the pixel array. So PNG decode/encode here is
REAL and exact, not a fake: every byte path is covered by round-trip
and per-filter tests in tests/test_multimodal.py.

Scope (loud refusals outside it, never silent wrong pixels):
- bit depth 8; color types 0 (gray), 2 (RGB), 3 (palette),
  4 (gray+alpha), 6 (RGBA)
- no Adam7 interlacing (progressive rendering is a display concern;
  training-data payloads are overwhelmingly non-interlaced)
- ancillary chunks are skipped; tRNS is APPLIED everywhere it
  carries pixel information (palette alpha table; gray/RGB color
  keys materialize an alpha channel) since dropping it would
  silently change pixels
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"

#: samples per pixel by color type
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def png_info(payload: bytes):
    """(width, height) from the IHDR, or None if not a PNG — the
    cheap probe `_real_decode` uses (13 header bytes, no inflate)."""
    if not payload or not payload.startswith(_SIG) or len(payload) < 33:
        return None
    length, ctype = struct.unpack(">I4s", payload[8:16])
    if ctype != b"IHDR" or length != 13:
        return None
    w, h = struct.unpack(">II", payload[16:24])
    return int(w), int(h)


def _chunks(payload: bytes):
    pos = 8
    n = len(payload)
    while pos + 8 <= n:
        length, ctype = struct.unpack(">I4s", payload[pos : pos + 8])
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) != length:
            raise ValueError("PNG truncated mid-chunk")
        yield ctype, data
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IEND":
            return
    raise ValueError("PNG missing IEND")


def _unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Invert the five scanline filters. Per spec all arithmetic is
    mod-256 on unsigned bytes; Paeth's predictor picks among left/
    up/up-left by smallest absolute difference with left winning
    ties, then up.

    Cost model: None/Up are whole-row numpy ops and Sub is an exact
    per-lane uint8 cumsum (modular wrap is the accumulate dtype's
    own overflow) — all O(row) vectorized. Average/Paeth carry a
    true left-to-right data dependency, so they run as tight
    plain-int Python loops over list-converted rows (~10x faster
    than scalar ndarray indexing; a fully-Paeth 1080p image costs
    seconds, which is the honest dependency-free price — route
    through PIL for bulk photographic decode when it exists)."""
    out = np.zeros((h, stride), dtype=np.uint8)
    rows = raw.reshape(h, stride + 1)
    prev_u8 = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ftype = int(rows[y, 0])
        line = rows[y, 1:]
        if ftype == 0:  # None
            out[y] = line
        elif ftype == 1:  # Sub: per-lane modular prefix sum
            out[y] = np.cumsum(
                line.reshape(-1, bpp), axis=0, dtype=np.uint8
            ).reshape(stride)
        elif ftype == 2:  # Up: uint8 addition wraps mod 256
            out[y] = line + prev_u8
        elif ftype == 3:  # Average
            cur = line.tolist()
            prev = prev_u8.tolist()
            for x in range(stride):
                left = cur[x - bpp] if x >= bpp else 0
                cur[x] = (cur[x] + ((left + prev[x]) >> 1)) & 0xFF
            out[y] = cur
        elif ftype == 4:  # Paeth
            cur = line.tolist()
            prev = prev_u8.tolist()
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                p = a + b - c
                pa = p - a if p >= a else a - p
                pb = p - b if p >= b else b - p
                pc = p - c if p >= c else c - p
                if pa <= pb and pa <= pc:
                    pred = a
                elif pb <= pc:
                    pred = b
                else:
                    pred = c
                cur[x] = (cur[x] + pred) & 0xFF
            out[y] = cur
        else:
            raise ValueError(f"PNG filter type {ftype} is not in the spec")
        prev_u8 = out[y]
    return out


def png_decode(payload: bytes) -> np.ndarray:
    """Pixels as (H, W, C) uint8 — C per the source color type
    (palette expands to RGB, or RGBA when a tRNS chunk is present).
    Loud on anything outside the documented scope."""
    if not payload or not payload.startswith(_SIG):
        raise ValueError("not a PNG (bad signature)")
    ihdr = None
    idat = bytearray()
    plte = None
    trns = None
    for ctype, data in _chunks(payload):
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"tRNS":
            trns = bytes(data)
        elif ctype == b"IDAT":
            idat += data
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color, comp, filt, interlace = ihdr
    if comp != 0 or filt != 0:
        raise ValueError(f"PNG compression/filter method {comp}/{filt}")
    if interlace != 0:
        raise NotImplementedError(
            "PNG Adam7 interlacing is outside the dependency-free "
            "decoder's scope"
        )
    if depth != 8 or color not in _CHANNELS:
        raise NotImplementedError(
            f"PNG bit depth {depth} / color type {color} is outside the "
            "dependency-free decoder's scope (8-bit gray/RGB/palette/"
            "gray+alpha/RGBA only)"
        )
    ch = _CHANNELS[color]
    stride = w * ch
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    if raw.size != h * (stride + 1):
        raise ValueError(
            f"PNG pixel data is {raw.size} bytes, expected {h * (stride + 1)}"
        )
    px = _unfilter(raw, h, stride, ch).reshape(h, w, ch)
    if color == 3:
        if plte is None:
            raise ValueError("PNG palette image without PLTE")
        idx = px[:, :, 0]
        rgb = plte[idx]
        if trns is not None:
            tr = np.frombuffer(trns, dtype=np.uint8)
            alpha = np.full(256, 255, dtype=np.uint8)
            alpha[: tr.size] = tr
            return np.dstack([rgb, alpha[idx]])
        return rgb
    if trns is not None and color in (0, 2):
        # color-key transparency: the tRNS chunk names one exact
        # gray/RGB value as fully transparent. Dropping it would
        # silently change pixels (the module contract), so the
        # alpha channel is materialized. Keys are stored as u16
        # per channel; a key > 255 cannot match any 8-bit sample.
        if color == 0:
            key = int.from_bytes(trns[:2], "big")
            transparent = px[:, :, 0].astype(np.int32) == key
        else:
            keys = [int.from_bytes(trns[i : i + 2], "big") for i in (0, 2, 4)]
            p32 = px.astype(np.int32)
            transparent = (
                (p32[:, :, 0] == keys[0])
                & (p32[:, :, 1] == keys[1])
                & (p32[:, :, 2] == keys[2])
            )
        alpha = np.where(transparent, 0, 255).astype(np.uint8)
        return np.dstack([px, alpha])
    return px


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def png_encode(arr: np.ndarray) -> bytes:
    """Minimal exact encoder: 8-bit, filter 0 every row. (H, W) or
    (H, W, 1) → gray; (H, W, 3) → RGB; (H, W, 2) → gray+alpha;
    (H, W, 4) → RGBA. Output decodes bit-identically by any
    spec-compliant reader."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    if a.ndim != 3 or a.shape[2] not in (1, 2, 3, 4):
        raise ValueError(f"unsupported array shape {arr.shape}")
    h, w, ch = a.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    rows = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), a.reshape(h, w * ch)], axis=1
    )
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(rows.tobytes(), 9))
        + _chunk(b"IEND", b"")
    )
