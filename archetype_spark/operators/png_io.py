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
- ancillary chunks are skipped; tRNS on palette images is applied
  (alpha channel materialized) since dropping it would silently
  change pixels
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
    ties, then up."""
    out = np.zeros((h, stride), dtype=np.uint8)
    rows = raw.reshape(h, stride + 1)
    for y in range(h):
        ftype = int(rows[y, 0])
        line = rows[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y > 0 else np.zeros(stride, np.int32)
        if ftype == 0:  # None
            cur = line
        elif ftype == 1:  # Sub
            cur = line.copy()
            for x in range(bpp, stride):
                cur[x] = (cur[x] + cur[x - bpp]) & 0xFF
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ftype == 3:  # Average
            cur = line.copy()
            for x in range(stride):
                left = cur[x - bpp] if x >= bpp else 0
                cur[x] = (cur[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            cur = line.copy()
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                if pa <= pb and pa <= pc:
                    pred = a
                elif pb <= pc:
                    pred = b
                else:
                    pred = c
                cur[x] = (cur[x] + pred) & 0xFF
        else:
            raise ValueError(f"PNG filter type {ftype} is not in the spec")
        out[y] = cur.astype(np.uint8)
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
            trns = np.frombuffer(data, dtype=np.uint8)
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
            alpha = np.full(256, 255, dtype=np.uint8)
            alpha[: trns.size] = trns
            return np.dstack([rgb, alpha[idx]])
        return rgb
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
