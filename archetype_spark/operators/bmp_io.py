"""Dependency-free BMP codec (stdlib struct + numpy) — the
uncompressed sibling of png_io/jpeg_io/gif_io, closing another slice
of the reference's image decode surface (the reference reads images
through Daft's `.image.decode`, reference pyproject.toml:7-8; this
module is the jar- and PIL-free Windows-bitmap equivalent).

Implements the PUBLIC BMP format (Windows BITMAPINFOHEADER family):

- decode: BITMAPFILEHEADER ("BM", pixel-data offset) + INFO header of
  40/52/56/108/124 bytes (BITMAPINFOHEADER through V5), uncompressed
  BI_RGB for 24-bit BGR, 32-bit BGRX, and 8-bit palette rows, plus
  BI_BITFIELDS 32-bit when the masks are the canonical BGRX layout.
  Bottom-up (positive height) and top-down (negative height) rasters;
  4-byte row stride. Everything else (RLE4/RLE8, 1/4/16-bit,
  embedded JPEG/PNG, OS/2 cores) refuses loudly naming the gap.
- encode: 24-bit BI_RGB bottom-up with a plain 40-byte
  BITMAPINFOHEADER — the always-valid writer choice every reader
  accepts; gray input (h, w) expands to RGB.

Decoded pixels come back as uint8 (h, w, 3) RGB for color sources and
(h, w) for 8-bit palettes that are pure gray ramps — matching the
shapes image_pixel_stats digests for the other codecs, so one image
gets one pixel_digest whatever container it arrived in.
"""

from __future__ import annotations

import struct

import numpy as np

_BI_RGB = 0
_BI_BITFIELDS = 3
#: header sizes of the BITMAPINFOHEADER family (v2/v3/v4/v5 extend,
#: never rearrange, the first 40 bytes)
_INFO_SIZES = {40, 52, 56, 108, 124}


def bmp_info(payload: bytes):
    """(width, height) or None (not a BM bitmap); matching-but-
    malformed payloads raise."""
    if len(payload or b"") < 26 or payload[:2] != b"BM":
        return None
    hsz = struct.unpack_from("<I", payload, 14)[0]
    if hsz not in _INFO_SIZES:
        raise NotImplementedError(
            f"BMP info-header size {hsz} (OS/2 core headers are not "
            "supported by the dependency-free codec)"
        )
    w, h = struct.unpack_from("<iI", payload, 18)[0], struct.unpack_from(
        "<i", payload, 22
    )[0]
    return int(w), int(abs(h))


def bmp_decode(payload: bytes) -> np.ndarray:
    """uint8 pixel array for an uncompressed BM bitmap: (h, w, 3) RGB
    for 24/32-bit and color palettes, (h, w) for pure-gray palettes."""
    p = bytes(payload or b"")
    if p[:2] != b"BM" or len(p) < 18:
        raise ValueError("not a BM bitmap")
    data_off = struct.unpack_from("<I", p, 10)[0]
    hsz = struct.unpack_from("<I", p, 14)[0]
    if hsz not in _INFO_SIZES:
        raise NotImplementedError(
            f"BMP info-header size {hsz} (OS/2 core headers are not "
            "supported by the dependency-free codec)"
        )
    if len(p) < 54:
        raise ValueError("BMP header truncated")
    w, h_raw = struct.unpack_from("<ii", p, 18)
    planes, bpp = struct.unpack_from("<HH", p, 26)
    compression = struct.unpack_from("<I", p, 30)[0]
    clr_used = struct.unpack_from("<I", p, 46)[0]
    if planes != 1:
        raise ValueError(f"BMP planes={planes} (must be 1)")
    if w <= 0 or h_raw == 0:
        raise ValueError(f"BMP dimensions {w}x{h_raw}")
    top_down = h_raw < 0
    h = abs(h_raw)
    if compression == _BI_BITFIELDS and bpp == 32:
        # canonical BGRX masks are equivalent to BI_RGB 32-bit
        masks = struct.unpack_from("<III", p, 54)
        if masks != (0x00FF0000, 0x0000FF00, 0x000000FF):
            raise NotImplementedError(
                f"BMP BI_BITFIELDS masks {[hex(m) for m in masks]} "
                "(only the canonical BGRX layout is supported)"
            )
    elif compression != _BI_RGB:
        raise NotImplementedError(
            f"BMP compression {compression} (RLE / embedded JPEG-PNG "
            "payloads are not supported by the dependency-free codec)"
        )
    if bpp not in (8, 24, 32):
        raise NotImplementedError(
            f"BMP bit depth {bpp} (supported: 8-bit palette, 24, 32)"
        )
    stride = (w * bpp // 8 + 3) & ~3
    need = stride * h
    if len(p) < data_off + need:
        raise ValueError("BMP raster truncated")
    raw = np.frombuffer(p, np.uint8, count=need, offset=data_off).reshape(
        h, stride
    )
    if not top_down:
        raw = raw[::-1]
    if bpp == 24:
        px = raw[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
    elif bpp == 32:
        px = raw[:, : w * 4].reshape(h, w, 4)[:, :, 2::-1]  # BGRX -> RGB
    else:  # 8-bit palette
        n_colors = clr_used or 256
        pal_off = 14 + hsz
        if len(p) < pal_off + 4 * n_colors:
            raise ValueError("BMP palette truncated")
        quads = np.frombuffer(
            p, np.uint8, count=4 * n_colors, offset=pal_off
        ).reshape(n_colors, 4)
        palette = quads[:, 2::-1]  # BGRX quads -> RGB
        idx = raw[:, :w]
        if idx.max(initial=0) >= n_colors:
            raise ValueError("BMP palette index out of range")
        px = palette[idx]
        if bool((palette[:, 0] == palette[:, 1]).all()) and bool(
            (palette[:, 1] == palette[:, 2]).all()
        ):
            px = px[:, :, 0]  # pure-gray palette -> (h, w)
    return np.ascontiguousarray(px)


def bmp_encode(arr: np.ndarray) -> bytes:
    """24-bit BI_RGB bottom-up BM bytes for a uint8 (h, w, 3) RGB or
    (h, w) gray array — the universally-readable writer form."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = np.repeat(a[:, :, None], 3, axis=2)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError(f"bmp_encode wants (h, w[, 3]); got {a.shape}")
    h, w = a.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), np.uint8)
    rows[:, : w * 3] = a[:, :, ::-1].reshape(h, w * 3)  # RGB -> BGR
    raster = rows[::-1].tobytes()  # bottom-up
    data_off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", data_off + len(raster), 0, 0, data_off)
    info = struct.pack(
        "<IiiHHIIiiII",
        40,
        w,
        h,  # positive: bottom-up
        1,
        24,
        _BI_RGB,
        len(raster),
        2835,  # ~72 DPI, the conventional stamp
        2835,
        0,
        0,
    )
    return header + info + raster
