"""Dependency-free image dimension probes for compressed formats.

The decode-probe half of `decode_media` (dims, not pixels): JPEG,
GIF, BMP and WebP all carry their dimensions in marker/header
structures that need no entropy decoding — exactly the metadata a
training-data pipeline filters on (aspect/size gates) before paying
for a real pixel decode. Pixel access for these formats still routes
through PIL when present and refuses loudly otherwise (PNG has the
full dependency-free codec in png_io.py).

Every parser returns (width, height) or None (not this format);
malformed-but-matching payloads raise ValueError rather than
guessing.
"""

from __future__ import annotations

import struct


def jpeg_dims(payload: bytes):
    """Walk JFIF/EXIF segments to the first SOF0/1/2 frame header.
    Baseline (C0), extended sequential (C1) and progressive (C2)
    all store height then width big-endian at offset 3 of the
    segment body."""
    if not payload or not payload.startswith(b"\xff\xd8"):
        return None
    pos = 2
    n = len(payload)
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            raise ValueError(f"JPEG marker desync at byte {pos}")
        # 0xFF fill bytes before a marker are legal (ITU T.81
        # B.1.1.2): skip them or the fill byte is misread as a
        # marker with a garbage segment length
        while pos + 1 < n and payload[pos + 1] == 0xFF:
            pos += 1
        if pos + 4 > n:
            break
        marker = payload[pos + 1]
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7 or marker == 0x01:
            pos += 2  # standalone markers carry no length
            continue
        if pos + 4 > n:
            break
        (seglen,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        if seglen < 2:
            raise ValueError("JPEG segment length < 2")
        if marker in (0xC0, 0xC1, 0xC2):
            if pos + 9 > n:
                raise ValueError("JPEG SOF truncated")
            h, w = struct.unpack(">HH", payload[pos + 5 : pos + 9])
            return int(w), int(h)
        if marker == 0xD9 or marker == 0xDA:
            break  # EOI / entropy-coded data: no SOF seen
        pos += 2 + seglen
    raise ValueError("JPEG without a SOF0/1/2 frame header")


def gif_dims(payload: bytes):
    """Logical-screen dimensions, little-endian, right after the
    6-byte version signature."""
    if not payload or payload[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    if len(payload) < 10:
        raise ValueError("GIF truncated before the logical screen")
    w, h = struct.unpack("<HH", payload[6:10])
    return int(w), int(h)


def bmp_dims(payload: bytes):
    """DIB header dims, dispatched on the header-size field:
    BITMAPCOREHEADER (12 — OS/2, uint16 dims) vs BITMAPINFOHEADER
    and successors (>= 40, signed int32 dims; negative height means
    top-down row order — the magnitude is the pixel height).
    Reading int32s blindly at offset 18 would pack an OS/2 header's
    width|height into one field — a silent wrong answer."""
    if not payload or not payload.startswith(b"BM"):
        return None
    if len(payload) < 26:
        raise ValueError("BMP truncated before the info header")
    (hdr_size,) = struct.unpack("<I", payload[14:18])
    if hdr_size == 12:
        w, h = struct.unpack("<HH", payload[18:22])
        return int(w), int(h)
    if hdr_size < 40:
        raise ValueError(f"BMP DIB header size {hdr_size} is not in the spec")
    w, h = struct.unpack("<ii", payload[18:26])
    return int(abs(w)), int(abs(h))


def webp_dims(payload: bytes):
    """RIFF/WEBP: VP8X (extended: 24-bit minus-one fields), VP8L
    (lossless: 14-bit packed fields) or VP8 (lossy: dims in the
    frame header past the 3-byte frame tag + start code)."""
    if (
        not payload
        or len(payload) < 16
        or payload[:4] != b"RIFF"
        or payload[8:12] != b"WEBP"
    ):
        return None
    chunk = payload[12:16]
    body = payload[20:]
    if chunk == b"VP8X":
        if len(body) < 10:
            raise ValueError("VP8X truncated")
        w = 1 + int.from_bytes(body[4:7], "little")
        h = 1 + int.from_bytes(body[7:10], "little")
        return w, h
    if chunk == b"VP8L":
        if len(body) < 5 or body[0] != 0x2F:
            raise ValueError("VP8L missing signature byte")
        bits = int.from_bytes(body[1:5], "little")
        w = (bits & 0x3FFF) + 1
        h = ((bits >> 14) & 0x3FFF) + 1
        return w, h
    if chunk == b"VP8 ":
        if len(body) < 10:
            raise ValueError("VP8 frame truncated")
        if body[3:6] != b"\x9d\x01\x2a":
            raise ValueError("VP8 start code missing (not a key frame?)")
        w, h = struct.unpack("<HH", body[6:10])
        return int(w & 0x3FFF), int(h & 0x3FFF)
    raise ValueError(f"WEBP chunk {chunk!r} is not VP8/VP8L/VP8X")


def probe_dims(payload: bytes):
    """(width, height) via the first matching format probe, else
    None. Order is cheap-signature-first; each probe self-selects on
    its magic bytes, so at most one runs past the signature."""
    for probe in (jpeg_dims, gif_dims, bmp_dims, webp_dims):
        dims = probe(payload)
        if dims is not None:
            return dims
    return None
