"""Dependency-free GIF codec — stdlib + numpy only.

Completes the real-codec family (png_io.py exact DEFLATE/filter
codec, jpeg_io.py baseline T.81): GIF is an INDEXED LOSSLESS format
(GIF87a/89a, the public W3C/CompuServe specification), so — like PNG
and unlike JPEG — every image round-trips bit-exactly: pixels map
through a <=256-entry palette and the index stream is LZW-compressed
with the GIF variable-code-width variant (LSB-first bit packing,
code width N+1..12, CLEAR resets the table, EOI terminates).

Decode path: header + logical screen descriptor -> global color
table -> extension blocks skipped (Graphic Control, comments,
application — 0x21-introduced, sub-block structured) -> first image
descriptor -> optional local color table -> LZW-decoded index stream
-> palette-mapped (h, w, 3) RGB array. Interlaced images and
truncated streams refuse loudly; gif_decode keeps still-image
semantics (first frame only) while gif_decode_frames composites the
FULL animation per the GIF89a Graphic Control semantics — sub-rect
placement, transparency, disposal none/background/previous — for the
video operators (multimodal.video_frame_stats).

Encode path: (h, w) uint8 index array + (n<=256, 3) palette ->
GIF89a with a global color table and one image. The LZW encoder
emits an initial CLEAR, grows the code width exactly when the
decoder's table-size rule would (next free code crosses the current
width's capacity), and resets at table-full — mirrored logic, pinned
by round-trip tests over random images plus a hand-built spec vector
decoded without this encoder.

Like the siblings, this is DRIVER/EXECUTOR-side scalar code invoked
from Arrow-batched mapInPandas (multimodal.image_pixel_stats); the
Spark-side plumbing never sees per-pixel Python rows.
"""

from __future__ import annotations

import struct

import numpy as np

_MAX_WIDTH = 12


# ------------------------------------------------------------------- decode


class _BitReader:
    """LSB-first bit reader over the concatenated sub-block bytes."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def read(self, n: int) -> int:
        end = self.pos + n
        if end > len(self.data) * 8:
            raise ValueError("GIF LZW stream truncated")
        out = 0
        got = 0
        pos = self.pos
        while got < n:
            byte = self.data[pos >> 3]
            avail = 8 - (pos & 7)
            take = min(n - got, avail)
            out |= ((byte >> (pos & 7)) & ((1 << take) - 1)) << got
            got += take
            pos += take
        self.pos = pos
        return out


def _lzw_decode(min_code_size: int, data: bytes, n_expected: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    br = _BitReader(data)
    out = bytearray()

    def reset():
        return (
            {i: bytes([i]) for i in range(clear)},
            clear + 2,
            min_code_size + 1,
        )

    table, next_code, width = reset()
    prev: bytes | None = None
    while True:
        code = br.read(width)
        if code == clear:
            table, next_code, width = reset()
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            entry = table[code]
        elif code in table:
            entry = table[code]
        elif code == next_code:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError(f"GIF LZW code {code} out of table order")
        out.extend(entry)
        if prev is not None:
            table[next_code] = prev + entry[:1]
            next_code += 1
            if next_code == (1 << width) and width < _MAX_WIDTH:
                width += 1
        prev = entry
        if len(out) > n_expected:
            raise ValueError("GIF LZW stream yields more pixels than the image")
    if len(out) != n_expected:
        raise ValueError(
            f"GIF LZW stream yields {len(out)} pixels, image has {n_expected}"
        )
    return bytes(out)


def _read_color_table(payload: bytes, off: int, n: int):
    end = off + 3 * n
    if end > len(payload):
        raise ValueError("GIF truncated inside a color table")
    pal = np.frombuffer(payload[off:end], dtype=np.uint8).reshape(n, 3)
    return pal, end


def _read_subblocks(payload: bytes, off: int):
    chunks = []
    while True:
        if off >= len(payload):
            raise ValueError("GIF truncated inside sub-blocks")
        n = payload[off]
        off += 1
        if n == 0:
            return b"".join(chunks), off
        chunks.append(payload[off : off + n])
        if len(chunks[-1]) != n:
            raise ValueError("GIF truncated inside sub-blocks")
        off += n


def gif_decode(payload: bytes) -> np.ndarray:
    """First frame of a GIF87a/89a stream as an (h, w, 3) uint8 RGB
    array (indices mapped through the active color table)."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF stream")
    if len(payload) < 13:
        raise ValueError("GIF truncated before the logical screen descriptor")
    sw, sh, packed, _bg, _aspect = struct.unpack("<HHBBB", payload[6:13])
    off = 13
    gct = None
    if packed & 0x80:
        gct, off = _read_color_table(payload, off, 2 << (packed & 0x07))
    while True:
        if off >= len(payload):
            raise ValueError("GIF truncated before any image descriptor")
        intro = payload[off]
        off += 1
        if intro == 0x21:  # extension: label + sub-blocks, skipped
            off += 1
            _data, off = _read_subblocks(payload, off)
            continue
        if intro == 0x3B:  # trailer
            raise ValueError("GIF carries no image data")
        if intro != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{intro:02x}")
        break
    if off + 9 > len(payload):
        raise ValueError("GIF truncated inside the image descriptor")
    _x, _y, w, h, ipacked = struct.unpack("<HHHHB", payload[off : off + 9])
    off += 9
    if ipacked & 0x40:
        raise NotImplementedError("interlaced GIF images are not supported")
    pal = gct
    if ipacked & 0x80:
        pal, off = _read_color_table(payload, off, 2 << (ipacked & 0x07))
    if pal is None:
        raise ValueError("GIF image has neither global nor local color table")
    if off >= len(payload):
        raise ValueError("GIF truncated before the LZW minimum code size")
    min_code_size = payload[off]
    off += 1
    if not 2 <= min_code_size <= 8:
        raise ValueError(f"GIF LZW minimum code size {min_code_size}")
    data, off = _read_subblocks(payload, off)
    idx = np.frombuffer(
        _lzw_decode(min_code_size, data, w * h), dtype=np.uint8
    ).reshape(h, w)
    if int(idx.max(initial=0)) >= len(pal):
        raise ValueError("GIF index exceeds the color table")
    return pal[idx]


# ---------------------------------------------------------------- animation


def gif_decode_frames(payload: bytes) -> list[np.ndarray]:
    """Every frame of an animated GIF89a as full-canvas (sh, sw, 3)
    uint8 RGB arrays, composited per the GIF89a Graphic Control
    Extension semantics:

    - the canvas starts at the logical screen's BACKGROUND color
      (global color table entry named by the screen descriptor; black
      when there is no global table) — the spec's literal reading,
      and the documented definition the oracle's independent
      compositor re-derives;
    - each image descriptor renders its rect through the active
      (local-else-global) color table, skipping pixels equal to the
      GCE's transparent index when the transparency flag is set;
    - disposal 0/1 leave the canvas, disposal 2 restores the frame's
      RECT to the background color, disposal 3 restores the canvas
      captured before the frame rendered.

    Interlaced frames and truncated streams refuse loudly (shared
    helpers). A single-image GIF yields one frame equal to
    gif_decode() when the image covers the screen."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF stream")
    if len(payload) < 13:
        raise ValueError("GIF truncated before the logical screen descriptor")
    sw, sh, packed, bg_idx, _aspect = struct.unpack("<HHBBB", payload[6:13])
    off = 13
    gct = None
    if packed & 0x80:
        gct, off = _read_color_table(payload, off, 2 << (packed & 0x07))
    bg = (
        gct[bg_idx]
        if gct is not None and bg_idx < len(gct)
        else np.zeros(3, dtype=np.uint8)
    )
    canvas = np.empty((sh, sw, 3), dtype=np.uint8)
    canvas[:] = bg
    frames: list[np.ndarray] = []
    # active GCE state (applies to the NEXT image descriptor only)
    disposal, transparent = 0, None
    while True:
        if off >= len(payload):
            raise ValueError("GIF truncated before the trailer")
        intro = payload[off]
        off += 1
        if intro == 0x3B:  # trailer
            break
        if intro == 0x21:  # extension
            if off >= len(payload):
                raise ValueError("GIF truncated inside an extension")
            label = payload[off]
            off += 1
            data, off = _read_subblocks(payload, off)
            if label == 0xF9 and len(data) >= 4:  # Graphic Control
                gpacked = data[0]
                disposal = (gpacked >> 2) & 0x07
                transparent = data[3] if gpacked & 0x01 else None
            continue
        if intro != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{intro:02x}")
        if off + 9 > len(payload):
            raise ValueError("GIF truncated inside the image descriptor")
        x, y, w, h, ipacked = struct.unpack("<HHHHB", payload[off : off + 9])
        off += 9
        if ipacked & 0x40:
            raise NotImplementedError("interlaced GIF images are not supported")
        pal = gct
        if ipacked & 0x80:
            pal, off = _read_color_table(payload, off, 2 << (ipacked & 0x07))
        if pal is None:
            raise ValueError(
                "GIF image has neither global nor local color table"
            )
        if x + w > sw or y + h > sh:
            raise ValueError("GIF frame rect exceeds the logical screen")
        if off >= len(payload):
            raise ValueError("GIF truncated before the LZW minimum code size")
        min_code_size = payload[off]
        off += 1
        if not 2 <= min_code_size <= 8:
            raise ValueError(f"GIF LZW minimum code size {min_code_size}")
        data, off = _read_subblocks(payload, off)
        idx = np.frombuffer(
            _lzw_decode(min_code_size, data, w * h), dtype=np.uint8
        ).reshape(h, w)
        if int(idx.max(initial=0)) >= len(pal):
            raise ValueError("GIF index exceeds the color table")
        before = canvas.copy() if disposal == 3 else None
        rect = canvas[y : y + h, x : x + w]
        if transparent is None:
            rect[:] = pal[idx]
        else:
            opaque = idx != transparent
            rect[opaque] = pal[idx][opaque]
        frames.append(canvas.copy())
        if disposal == 2:
            canvas[y : y + h, x : x + w] = bg
        elif disposal == 3:
            canvas = before
        disposal, transparent = 0, None
    if not frames:
        raise ValueError("GIF carries no image data")
    return frames


def gif_encode_frames(
    frames: list[dict],
    palette: np.ndarray,
    screen: tuple[int, int],
    bg_index: int = 0,
    loop: bool = True,
) -> bytes:
    """Animated GIF89a from frame dicts {indices: (h, w) uint8,
    x, y, delay_cs, disposal, transparent} sharing one GLOBAL color
    table — the fixture-side encoder for gif_decode_frames (sub-rect
    placement, transparency and all three disposal modes), mirrored
    by round-trip tests. `screen` is (width, height); `loop` adds the
    NETSCAPE2.0 infinite-loop application extension real muxers
    emit."""
    pal = np.ascontiguousarray(palette, dtype=np.uint8)
    if pal.ndim != 2 or pal.shape[1] != 3 or not 1 <= pal.shape[0] <= 256:
        raise ValueError(f"palette must be (n<=256, 3), got {pal.shape}")
    sw, sh = screen
    size_pow = max(1, (max(pal.shape[0], 2) - 1).bit_length())
    n_entries = 1 << size_pow
    pal_padded = np.zeros((n_entries, 3), dtype=np.uint8)
    pal_padded[: pal.shape[0]] = pal
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", sw, sh, 0x80 | (size_pow - 1), bg_index, 0)
    out += pal_padded.tobytes()
    if loop:
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    min_code_size = max(2, size_pow)
    for fr in frames:
        idx = np.ascontiguousarray(fr["indices"], dtype=np.uint8)
        if idx.ndim != 2:
            raise ValueError("frame indices must be 2-D")
        if int(idx.max(initial=0)) >= pal.shape[0]:
            raise ValueError("frame index exceeds the palette")
        h, w = idx.shape
        x, y = int(fr.get("x", 0)), int(fr.get("y", 0))
        if x + w > sw or y + h > sh:
            raise ValueError("frame rect exceeds the logical screen")
        transparent = fr.get("transparent")
        gpacked = (int(fr.get("disposal", 0)) & 0x07) << 2
        if transparent is not None:
            gpacked |= 0x01
        out += struct.pack(
            "<BBBBHBB",
            0x21, 0xF9, 4, gpacked,
            int(fr.get("delay_cs", 0)),
            int(transparent or 0), 0,
        )
        out += struct.pack("<BHHHHB", 0x2C, x, y, w, h, 0)
        out.append(min_code_size)
        lzw = _lzw_encode(min_code_size, idx.tobytes())
        for i in range(0, len(lzw), 255):
            block = lzw[i : i + 255]
            out.append(len(block))
            out += block
        out.append(0)
    out.append(0x3B)
    return bytes(out)


# ------------------------------------------------------------------- encode


def _lzw_encode(min_code_size: int, indices: bytes) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    def fresh():
        return {bytes([i]): i for i in range(clear)}, clear + 2

    width = min_code_size + 1
    table, next_code = fresh()
    emit(clear, width)
    prefix = b""
    for b in indices:
        cand = prefix + bytes([b])
        if cand in table:
            prefix = cand
            continue
        emit(table[prefix], width)
        table[cand] = next_code
        next_code += 1
        # the decoder widens when ITS next_code hits the capacity;
        # its next_code trails the encoder's by one (it learns each
        # entry one code later), so the encoder widens after the add
        if next_code == (1 << width) + 1 and width < _MAX_WIDTH:
            width += 1
        if next_code == (1 << _MAX_WIDTH) + 1:
            emit(clear, width)
            table, next_code = fresh()
            width = min_code_size + 1
        prefix = bytes([b])
    if prefix:
        emit(table[prefix], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def gif_encode(indices: np.ndarray, palette: np.ndarray) -> bytes:
    """(h, w) uint8 index array + (n, 3) uint8 palette -> one-frame
    GIF89a with a global color table (padded to a power of two >= 2
    per the spec's size encoding)."""
    idx = np.ascontiguousarray(indices, dtype=np.uint8)
    pal = np.ascontiguousarray(palette, dtype=np.uint8)
    if idx.ndim != 2:
        raise ValueError(f"index array must be 2-D, got shape {idx.shape}")
    if pal.ndim != 2 or pal.shape[1] != 3 or not 1 <= pal.shape[0] <= 256:
        raise ValueError(f"palette must be (n<=256, 3), got {pal.shape}")
    if int(idx.max(initial=0)) >= pal.shape[0]:
        raise ValueError("index exceeds the palette")
    h, w = idx.shape
    # color-table size from the PALETTE (power of two >= 2, spec rule)
    size_pow = max(1, (max(pal.shape[0], 2) - 1).bit_length())
    n_entries = 1 << size_pow
    pal_padded = np.zeros((n_entries, 3), dtype=np.uint8)
    pal_padded[: pal.shape[0]] = pal
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (size_pow - 1), 0, 0)
    out += pal_padded.tobytes()
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)
    min_code_size = max(2, size_pow)
    out.append(min_code_size)
    lzw = _lzw_encode(min_code_size, idx.tobytes())
    for i in range(0, len(lzw), 255):
        block = lzw[i : i + 255]
        out.append(len(block))
        out += block
    out.append(0)  # block terminator
    out.append(0x3B)  # trailer
    return bytes(out)
