"""Dependency-free TIFF codec — stdlib + numpy only.

Extends the real-codec family (png_io, jpeg_io, gif_io, bmp_io,
webp_io, avi_io) with the TIFF 6.0 baseline subset scanned corpora
actually carry (the public Adobe TIFF 6.0 specification):

- both byte orders (`II` little-endian, `MM` big-endian), classic
  32-bit IFDs;
- 8-bit grayscale (PhotometricInterpretation 0/1, min-is-black and
  min-is-white) and 8-bit RGB (Photometric 2), chunky planar config;
- strip-based layout (any RowsPerStrip split, StripOffsets/
  StripByteCounts as SHORT or LONG arrays, inline or offset values);
- Compression 1 (none), 32773 (PackBits — the Macintosh RLE) and 5
  (TIFF LZW: MSB-first bit packing, 9..12-bit codes, CLEAR=256,
  EOI=257, the spec's EARLY-CHANGE width bump at 2^n - 1 — note this
  is NOT the GIF variant, which packs LSB-first and bumps late);
- Predictor 2 (horizontal differencing) for LZW strips.

Everything else refuses loudly naming the tag and value — tiled
layout, 16-bit samples, palette color, planar=2, JPEG-in-TIFF,
deflate — never silently wrong pixels. TIFF is LOSSLESS in this
subset, so every image round-trips bit-exactly and the q121
media_pixels oracle gates the decoder against generator-side source
arrays the same way it gates PNG/GIF/BMP.

Like the siblings this is DRIVER/EXECUTOR-side scalar code invoked
from Arrow-batched mapInPandas (multimodal.image_pixel_stats); the
Spark plumbing never sees per-pixel Python rows.
"""

from __future__ import annotations

import struct

import numpy as np

# baseline tag ids
_WIDTH, _LENGTH, _BITS, _COMPRESSION = 256, 257, 258, 259
_PHOTOMETRIC, _STRIP_OFFSETS, _SPP, _ROWS_PER_STRIP = 262, 273, 277, 278
_STRIP_COUNTS, _PLANAR, _PREDICTOR = 279, 284, 317

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}  # BYTE ASCII SHORT LONG RATIONAL


# ------------------------------------------------------------------- decode


def _read_ifd(payload: bytes, bo: str):
    """First IFD as {tag: [values]} (BYTE/SHORT/LONG only — the
    baseline subset's tag types)."""
    (ifd_off,) = struct.unpack(bo + "I", payload[4:8])
    if ifd_off + 2 > len(payload):
        raise ValueError("TIFF truncated before the first IFD")
    (n,) = struct.unpack(bo + "H", payload[ifd_off : ifd_off + 2])
    tags: dict[int, list[int]] = {}
    for i in range(n):
        off = ifd_off + 2 + 12 * i
        if off + 12 > len(payload):
            raise ValueError("TIFF truncated inside the IFD")
        tag, typ, count = struct.unpack(bo + "HHI", payload[off : off + 8])
        if typ not in _TYPE_SIZES:
            continue  # unknown type: spec says skip the entry
        size = _TYPE_SIZES[typ] * count
        if size <= 4:
            raw = payload[off + 8 : off + 8 + size]
        else:
            (voff,) = struct.unpack(bo + "I", payload[off + 8 : off + 12])
            raw = payload[voff : voff + size]
            if len(raw) != size:
                raise ValueError(f"TIFF tag {tag} value overruns the file")
        if typ == 3:
            vals = list(struct.unpack(bo + "H" * count, raw))
        elif typ == 4:
            vals = list(struct.unpack(bo + "I" * count, raw))
        elif typ == 1:
            vals = list(raw)
        else:
            continue  # ASCII/RATIONAL irrelevant to the pixel path
        tags[tag] = vals
    return tags


def _packbits_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    i = 0
    while len(out) < expected and i < len(data):
        n = data[i]
        i += 1
        if n < 128:  # literal run of n+1 bytes
            out += data[i : i + n + 1]
            i += n + 1
        elif n > 128:  # repeat next byte 257-n times
            out += data[i : i + 1] * (257 - n)
            i += 1
        # n == 128: no-op
    if len(out) < expected:
        raise ValueError("TIFF PackBits strip truncated")
    return bytes(out[:expected])


def _lzw_decode(data: bytes, expected: int) -> bytes:
    """TIFF-variant LZW: MSB-first bits, CLEAR=256/EOI=257, width
    grows 9->12 with the spec's early change (bump at table size
    2^n - 1, one code before the GIF variant would)."""
    out = bytearray()
    table: list[bytes] = []

    def reset():
        nonlocal table
        table = [bytes([i]) for i in range(256)] + [b"", b""]

    reset()
    width = 9
    acc = nbits = 0
    prev: bytes | None = None
    for byte in data:
        acc = (acc << 8) | byte
        nbits += 8
        while nbits >= width:
            code = (acc >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            if code == 256:  # CLEAR
                reset()
                width = 9
                prev = None
                continue
            if code == 257:  # EOI
                if len(out) != expected:
                    raise ValueError(
                        f"TIFF LZW strip yields {len(out)} bytes, "
                        f"expected {expected}"
                    )
                return bytes(out)
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
            elif code == len(table):
                entry = prev + prev[:1]
            else:
                raise ValueError(f"TIFF LZW code {code} out of order")
            out += entry
            if prev is not None:
                table.append(prev + entry[:1])
            prev = entry
            # EARLY CHANGE: widen when the NEXT add would need it
            if len(table) + 1 >= (1 << width) and width < 12:
                width += 1
            if len(out) > expected:
                raise ValueError("TIFF LZW strip yields too many bytes")
    raise ValueError("TIFF LZW strip ended without EOI")


def tiff_decode(payload: bytes) -> np.ndarray:
    """Baseline TIFF -> uint8 (h, w) gray or (h, w, 3) RGB (module
    docstring for the exact subset; anything outside refuses by
    name)."""
    p = bytes(payload or b"")
    if p[:4] == b"II*\x00":
        bo = "<"
    elif p[:4] == b"MM\x00*":
        bo = ">"
    else:
        raise ValueError("not a TIFF stream (no II*/MM* header)")
    tags = _read_ifd(p, bo)
    for req in (_WIDTH, _LENGTH, _STRIP_OFFSETS, _STRIP_COUNTS):
        if req not in tags:
            raise ValueError(f"TIFF missing required baseline tag {req}")
    w, h = tags[_WIDTH][0], tags[_LENGTH][0]
    spp = tags.get(_SPP, [1])[0]
    bits = tags.get(_BITS, [8] * spp)
    photometric = tags.get(_PHOTOMETRIC, [1])[0]
    compression = tags.get(_COMPRESSION, [1])[0]
    planar = tags.get(_PLANAR, [1])[0]
    predictor = tags.get(_PREDICTOR, [1])[0]
    if any(b != 8 for b in bits):
        raise NotImplementedError(
            f"TIFF BitsPerSample {bits}: only 8-bit samples are implemented"
        )
    if photometric not in (0, 1, 2) or spp not in (1, 3):
        raise NotImplementedError(
            f"TIFF photometric {photometric} / {spp} samples: only 8-bit "
            "grayscale and RGB are implemented (no palette/CMYK/YCbCr)"
        )
    if planar != 1:
        raise NotImplementedError("TIFF PlanarConfiguration 2 (planar)")
    if compression not in (1, 5, 32773):
        raise NotImplementedError(
            f"TIFF compression {compression}: only none (1), LZW (5) and "
            "PackBits (32773) are implemented"
        )
    if predictor not in (1, 2):
        raise NotImplementedError(f"TIFF predictor {predictor}")
    rows_per_strip = tags.get(_ROWS_PER_STRIP, [h])[0] or h
    offsets, counts = tags[_STRIP_OFFSETS], tags[_STRIP_COUNTS]
    if len(offsets) != len(counts):
        raise ValueError("TIFF StripOffsets/StripByteCounts length mismatch")
    row_bytes = w * spp
    raster = bytearray()
    row0 = 0
    for off, cnt in zip(offsets, counts):
        n_rows = min(rows_per_strip, h - row0)
        if n_rows <= 0:
            break
        expected = n_rows * row_bytes
        raw = p[off : off + cnt]
        if len(raw) != cnt:
            raise ValueError("TIFF strip overruns the file")
        if compression == 1:
            if len(raw) < expected:
                raise ValueError("TIFF uncompressed strip truncated")
            strip = raw[:expected]
        elif compression == 32773:
            strip = _packbits_decode(raw, expected)
        else:
            strip = _lzw_decode(raw, expected)
        if predictor == 2:
            arr = np.frombuffer(strip, np.uint8).reshape(
                n_rows, w, spp
            )
            strip = np.cumsum(arr.astype(np.uint16), axis=1).astype(
                np.uint8
            ).tobytes()
        raster += strip
        row0 += n_rows
    if row0 < h:
        raise ValueError(f"TIFF strips cover {row0} of {h} rows")
    px = np.frombuffer(bytes(raster), np.uint8).reshape(h, w, spp)
    if spp == 1:
        px = px[:, :, 0]
        if photometric == 0:  # min-is-white inverts
            px = (255 - px.astype(np.int16)).astype(np.uint8)
        return px.copy()
    return px.copy()


def tiff_info(payload: bytes):
    """(width, height) from the first IFD, or None if not TIFF — the
    decode-probe tier (image_probe contract)."""
    p = bytes(payload or b"")
    if p[:4] == b"II*\x00":
        bo = "<"
    elif p[:4] == b"MM\x00*":
        bo = ">"
    else:
        return None
    try:
        tags = _read_ifd(p, bo)
        return int(tags[_WIDTH][0]), int(tags[_LENGTH][0])
    except (ValueError, KeyError, IndexError, struct.error):
        return None


# ------------------------------------------------------------------- encode


def _packbits_encode(row: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(row)
    while i < n:
        run = 1
        while i + run < n and run < 128 and row[i + run] == row[i]:
            run += 1
        if run >= 2:
            out += bytes([257 - run, row[i]])
            i += run
            continue
        lit0 = i
        while (
            i < n
            and i - lit0 < 128
            and not (i + 1 < n and row[i + 1] == row[i] and i + 2 < n and row[i + 2] == row[i])
        ):
            i += 1
        out += bytes([i - lit0 - 1]) + row[lit0:i]
    return bytes(out)


def _lzw_encode(data: bytes) -> bytes:
    """TIFF-variant LZW encoder mirroring _lzw_decode's table rules
    (early change), pinned by round-trip tests plus a hand-built
    decode-only vector."""
    out = bytearray()
    acc = nbits = 0

    def emit(code: int, width: int):
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8

    def fresh():
        return {bytes([i]): i for i in range(256)}, 258

    width = 9
    table, next_code = fresh()
    emit(256, width)  # initial CLEAR
    prefix = b""
    for b in data:
        cand = prefix + bytes([b])
        if cand in table:
            prefix = cand
            continue
        emit(table[prefix], width)
        table[cand] = next_code
        next_code += 1
        # early change, mirrored: the decoder (whose table trails this
        # one by one entry) widens after ITS table reaches 2^width - 1,
        # which is when this next_code reaches 2^width
        if next_code >= (1 << width) and width < 12:
            width += 1
        if next_code == (1 << 12) - 1:
            emit(256, width)
            table, next_code = fresh()
            width = 9
        prefix = bytes([b])
    if prefix:
        emit(table[prefix], width)
    emit(257, width)  # EOI
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def tiff_encode(
    img: np.ndarray,
    compression: str = "none",
    rows_per_strip: int | None = None,
    big_endian: bool = False,
    predictor: bool = False,
) -> bytes:
    """uint8 (h, w) gray or (h, w, 3) RGB -> baseline TIFF.
    `compression`: 'none' | 'packbits' | 'lzw'; `predictor` applies
    horizontal differencing (LZW only, the spec pairing). The
    fixture-side encoder for tiff_decode, mirrored by round-trip
    tests over both byte orders and strip splits."""
    img = np.asarray(img)
    if img.dtype != np.uint8 or img.ndim not in (2, 3):
        raise ValueError("tiff_encode wants uint8 (h,w) or (h,w,3)")
    if img.ndim == 3 and img.shape[2] != 3:
        raise ValueError("tiff_encode wants 3 channels for color")
    if predictor and compression != "lzw":
        raise ValueError("predictor=True is the LZW pairing")
    comp_id = {"none": 1, "packbits": 32773, "lzw": 5}.get(compression)
    if comp_id is None:
        raise ValueError(f"tiff_encode compression {compression!r}")
    bo = ">" if big_endian else "<"
    h, w = img.shape[:2]
    spp = 1 if img.ndim == 2 else 3
    rps = rows_per_strip or h
    chunky = img.reshape(h, w * spp)
    strips = []
    for row0 in range(0, h, rps):
        block = chunky[row0 : row0 + rps]
        if predictor:
            a = block.reshape(block.shape[0], w, spp).astype(np.int16)
            d = a.copy()
            d[:, 1:] = a[:, 1:] - a[:, :-1]
            block = (d & 0xFF).astype(np.uint8).reshape(block.shape[0], -1)
        raw = block.tobytes()
        if comp_id == 1:
            strips.append(raw)
        elif comp_id == 32773:
            strips.append(
                b"".join(
                    _packbits_encode(block[r].tobytes())
                    for r in range(block.shape[0])
                )
            )
        else:
            strips.append(_lzw_encode(raw))

    entries = []  # (tag, type, count, packed-or-offset-resolver)

    def short(tag, *vals):
        entries.append((tag, 3, vals))

    def long_(tag, *vals):
        entries.append((tag, 4, vals))

    short(_WIDTH, w)
    short(_LENGTH, h)
    short(_BITS, *([8] * spp))
    short(_COMPRESSION, comp_id)
    short(_PHOTOMETRIC, 1 if spp == 1 else 2)
    long_(_STRIP_OFFSETS, *([0] * len(strips)))  # patched below
    short(_SPP, spp)
    short(_ROWS_PER_STRIP, rps)
    long_(_STRIP_COUNTS, *[len(s) for s in strips])
    short(_PLANAR, 1)
    if predictor:
        short(_PREDICTOR, 2)
    entries.sort(key=lambda e: e[0])

    header = struct.pack(bo + "2sHI", b"II" if bo == "<" else b"MM", 42, 8)
    n = len(entries)
    ifd_size = 2 + 12 * n + 4
    # out-of-line value area follows the IFD; strips follow that
    overflow = bytearray()
    overflow_base = 8 + ifd_size
    packed_entries = []
    strip_offsets_pos = None
    for tag, typ, vals in entries:
        esize = _TYPE_SIZES[typ] * len(vals)
        fmt = "H" if typ == 3 else "I"
        if esize <= 4:
            raw = struct.pack(bo + fmt * len(vals), *vals)
            raw += b"\x00" * (4 - len(raw))
            packed_entries.append((tag, typ, len(vals), raw, None))
        else:
            pos = overflow_base + len(overflow)
            overflow += struct.pack(bo + fmt * len(vals), *vals)
            packed_entries.append(
                (tag, typ, len(vals), struct.pack(bo + "I", pos), pos)
            )
        if tag == _STRIP_OFFSETS:
            strip_offsets_pos = (
                packed_entries[-1][4],  # overflow pos or None (inline)
                len(packed_entries) - 1,
            )
    data_base = overflow_base + len(overflow)
    offs = []
    cur = data_base
    for s in strips:
        offs.append(cur)
        cur += len(s)
    # patch the strip offsets (inline when a single strip fits)
    pos, eidx = strip_offsets_pos
    if pos is None:
        tag, typ, cnt, _raw, _p = packed_entries[eidx]
        raw = struct.pack(bo + "I" * cnt, *offs)
        raw += b"\x00" * (4 - len(raw))
        packed_entries[eidx] = (tag, typ, cnt, raw, None)
    else:
        o = pos - overflow_base
        overflow[o : o + 4 * len(offs)] = struct.pack(
            bo + "I" * len(offs), *offs
        )
    out = bytearray(header)
    out += struct.pack(bo + "H", n)
    for tag, typ, cnt, raw, _pos in packed_entries:
        out += struct.pack(bo + "HHI", tag, typ, cnt) + raw
    out += struct.pack(bo + "I", 0)  # next-IFD pointer
    out += overflow
    for s in strips:
        out += s
    return bytes(out)
