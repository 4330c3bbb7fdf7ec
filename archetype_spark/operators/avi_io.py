"""Dependency-free AVI (RIFF) video container — stdlib + numpy only.

Completes the multimodal family's VIDEO tier the way png_io/jpeg_io/
gif_io did for images: AVI is Microsoft's public RIFF-based container
(the 'AVI ' form of the Resource Interchange File Format, documented
in the Windows multimedia SDK and OpenDML AVI specs), and the two
frame codecs implemented here make real pixel access possible without
PyAV:

- **MJPG** (Motion JPEG): every '##dc' chunk is a complete baseline/
  progressive JPEG picture, decoded by operators/jpeg_io.py. Fixtures
  use piecewise-uniform 8x8 tiles at unit DC quantization, which
  T.81 round-trips bit-exactly (the q121 media_pixels argument).
- **DIB** (biCompression=0, BI_RGB): uncompressed device-independent
  bitmap frames in '##db' chunks — 24-bit BGR bottom-up rows padded
  to 4 bytes (exactly the BMP raster without the file header), exact
  for arbitrary content.

Anything else (cvid, h264, audio-only files, palettized DIB) refuses
loudly naming the gap — never silently wrong pixels.

Layout handled: RIFF('AVI ') -> LIST('hdrl'){ avih, LIST('strl'){
strh, strf, ... } * } -> LIST('movi'){ '##dc'/'##db' frames, possibly
grouped inside LIST('rec ') } -> optional idx1. Chunks are WORD-
aligned (a pad byte follows odd-sized chunk data). The video stream's
frame chunks are matched by the stream's INDEX among all streams
(stream 0 -> '00dc'), so files with an audio stream interleave
cleanly past the video walk.

Like the sibling codecs this is DRIVER/EXECUTOR-side scalar code
invoked from Arrow-batched mapInPandas (multimodal.video_frame_stats);
the Spark plumbing never sees per-pixel Python rows.

Reference parity: the reference's media pipeline exposes video
frame-sampling over container files (SURVEY.md §2 multimodal rows);
this module is the dependency-free decode seam that makes the Spark
operator real rather than metadata-only.
"""

from __future__ import annotations

import struct

import numpy as np

from archetype_spark.operators import jpeg_io


def _pad(n: int) -> int:
    return n + (n & 1)


def _walk_chunks(buf: bytes, off: int, end: int):
    """Yield (fourcc, body_off, body_size) for the chunk sequence in
    buf[off:end]; LIST chunks yield ('LIST:<type>', ...) with the
    body EXCLUDING the 4-byte list type."""
    while off + 8 <= end:
        fourcc = buf[off : off + 4]
        (size,) = struct.unpack("<I", buf[off + 4 : off + 8])
        body = off + 8
        if body + size > end:
            raise ValueError("AVI chunk overruns its parent")
        if fourcc == b"LIST":
            if size < 4:
                raise ValueError("AVI LIST chunk shorter than its type")
            yield (b"LIST:" + buf[body : body + 4], body + 4, size - 4)
        else:
            yield (fourcc, body, size)
        off = body + _pad(size)


def _dib_decode(data: bytes, width: int, height: int, bit_count: int) -> np.ndarray:
    """BI_RGB raster -> (h, w, 3) uint8 RGB. 24-bit BGR bottom-up
    rows padded to 4 bytes (positive biHeight — the only DIB layout
    AVI fixtures and common writers emit for uncompressed video)."""
    if bit_count != 24:
        raise NotImplementedError(
            f"DIB frames: only 24-bit BI_RGB is implemented, got {bit_count}-bit"
        )
    stride = (width * 3 + 3) & ~3
    if len(data) < stride * height:
        raise ValueError("DIB frame raster truncated")
    rows = np.frombuffer(data, np.uint8, count=stride * height).reshape(
        height, stride
    )
    bgr = rows[:, : width * 3].reshape(height, width, 3)[::-1]
    return bgr[:, :, ::-1].copy()


def _dib_encode(frame: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> 24-bit BI_RGB raster (bottom-up BGR,
    4-byte row padding)."""
    h, w = frame.shape[:2]
    stride = (w * 3 + 3) & ~3
    out = np.zeros((h, stride), dtype=np.uint8)
    out[:, : w * 3] = np.ascontiguousarray(frame[::-1, :, ::-1]).reshape(
        h, w * 3
    )
    return out.tobytes()


def avi_decode_frames(payload: bytes):
    """Decode an AVI payload's first video stream into
    (frames, meta): frames is a list of uint8 arrays — (h, w) gray
    for grayscale MJPG pictures, (h, w, 3) RGB otherwise — and meta
    is {width, height, fps_num, fps_den, n_frames, handler}."""
    p = bytes(payload or b"")
    if len(p) < 12 or p[:4] != b"RIFF" or p[8:12] != b"AVI ":
        raise ValueError("not an AVI (RIFF/'AVI ') stream")
    (riff_size,) = struct.unpack("<I", p[4:8])
    end = min(len(p), 8 + riff_size)

    avih = None
    streams = []  # list of dicts: {type, handler, scale, rate, length, strf}
    movi = None
    for fourcc, off, size in _walk_chunks(p, 12, end):
        if fourcc == b"LIST:hdrl":
            for f2, o2, s2 in _walk_chunks(p, off, off + size):
                if f2 == b"avih":
                    if s2 < 40:
                        raise ValueError("AVI avih chunk truncated")
                    vals = struct.unpack("<10I", p[o2 : o2 + 40])
                    avih = {
                        "usec_per_frame": vals[0],
                        "total_frames": vals[4],
                        "n_streams": vals[6],
                        "width": vals[8],
                        "height": vals[9],
                    }
                elif f2 == b"LIST:strl":
                    st: dict = {}
                    for f3, o3, s3 in _walk_chunks(p, o2, o2 + s2):
                        if f3 == b"strh":
                            if s3 < 48:
                                raise ValueError("AVI strh chunk truncated")
                            st["type"] = p[o3 : o3 + 4]
                            st["handler"] = p[o3 + 4 : o3 + 8]
                            st["scale"], st["rate"], _start, st["length"] = (
                                struct.unpack("<4I", p[o3 + 20 : o3 + 36])
                            )
                        elif f3 == b"strf":
                            st["strf"] = p[o3 : o3 + s3]
                    streams.append(st)
        elif fourcc == b"LIST:movi":
            movi = (off, size)
    if avih is None or movi is None:
        raise ValueError("AVI missing avih header or movi list")
    vidx = next(
        (i for i, s in enumerate(streams) if s.get("type") == b"vids"), None
    )
    if vidx is None:
        raise ValueError("AVI carries no video ('vids') stream")
    vs = streams[vidx]
    strf = vs.get("strf", b"")
    if len(strf) < 40:
        raise ValueError("AVI video strf (BITMAPINFOHEADER) truncated")
    (_bisize, bw, bh, _planes, bit_count, compression) = struct.unpack(
        "<IiiHHI", strf[:20]
    )
    comp = struct.pack("<I", compression)
    handler = (vs.get("handler") or b"").strip(b"\x00 ").upper()
    prefix = b"%02d" % vidx

    frames = []
    def walk_movi(off: int, size: int) -> None:
        for f2, o2, s2 in _walk_chunks(p, off, off + size):
            if f2 == b"LIST:rec ":
                walk_movi(o2, s2)
                continue
            if f2[:2] != prefix or f2[2:4] not in (b"dc", b"db"):
                continue
            data = p[o2 : o2 + s2]
            if compression == 0:  # BI_RGB DIB
                frames.append(_dib_decode(data, bw, abs(bh), bit_count))
            elif comp == b"MJPG" or handler == b"MJPG":
                frames.append(jpeg_io.jpeg_decode(data))
            else:
                raise NotImplementedError(
                    "AVI video codec "
                    f"{comp!r}/{handler!r}: only MJPG and uncompressed "
                    "BI_RGB DIB frames are implemented"
                )

    walk_movi(*movi)
    fps_num = vs.get("rate") or 0
    fps_den = vs.get("scale") or 1
    meta = {
        "width": int(avih["width"] or bw),
        "height": int(avih["height"] or abs(bh)),
        "fps_num": int(fps_num),
        "fps_den": int(fps_den),
        "n_frames": len(frames),
        "handler": (b"DIB " if compression == 0 else comp).decode(
            "ascii", "replace"
        ).strip(),
    }
    return frames, meta


def avi_info(payload: bytes):
    """(width, height, duration_ms, n_frames) from the AVI headers
    alone (no frame decode — the decode-probe tier), or None if the
    payload is not RIFF/'AVI '."""
    p = bytes(payload or b"")
    if len(p) < 12 or p[:4] != b"RIFF" or p[8:12] != b"AVI ":
        return None
    (riff_size,) = struct.unpack("<I", p[4:8])
    end = min(len(p), 8 + riff_size)
    for fourcc, off, size in _walk_chunks(p, 12, end):
        if fourcc != b"LIST:hdrl":
            continue
        for f2, o2, s2 in _walk_chunks(p, off, off + size):
            if f2 == b"avih" and s2 >= 40:
                vals = struct.unpack("<10I", p[o2 : o2 + 40])
                usec, total, w, h = vals[0], vals[4], vals[8], vals[9]
                dur = round(usec * total / 1000) if usec else None
                return int(w), int(h), dur, int(total)
    return None


def avi_encode(
    frames,
    fps_num: int = 25,
    fps_den: int = 1,
    codec: str = "MJPG",
    quality_scale: int = 16,
    rec_groups: bool = False,
) -> bytes:
    """Encode uint8 frames — (h, w) gray or (h, w, 3) RGB, all the
    same shape — as an AVI: codec 'MJPG' (each frame a baseline JPEG
    via jpeg_io at the given quality_scale; gray frames stay
    single-component) or 'DIB' (uncompressed 24-bit BI_RGB '##db'
    chunks; gray frames are expanded to RGB first). `rec_groups=True`
    wraps each frame in a LIST('rec ') — the interleaved layout some
    muxers emit — to exercise the decoder's recursive movi walk."""
    if not frames:
        raise ValueError("avi_encode wants at least one frame")
    frames = [np.ascontiguousarray(f, dtype=np.uint8) for f in frames]
    h, w = frames[0].shape[:2]
    for f in frames:
        if f.shape[:2] != (h, w):
            raise ValueError("all AVI frames must share one shape")
    if codec == "MJPG":
        payloads = [
            jpeg_io.jpeg_encode(f, quality_scale=quality_scale) for f in frames
        ]
        fourcc, compression, bits = b"00dc", b"MJPG", 24
    elif codec == "DIB":
        rgb = [
            np.repeat(f[:, :, None], 3, axis=2) if f.ndim == 2 else f
            for f in frames
        ]
        payloads = [_dib_encode(f) for f in rgb]
        fourcc, compression, bits = b"00db", struct.pack("<I", 0), 24
    else:
        raise ValueError(f"avi_encode codec {codec!r}: MJPG or DIB")

    def chunk(cc: bytes, body: bytes) -> bytes:
        return cc + struct.pack("<I", len(body)) + body + (b"\x00" * (len(body) & 1))

    def lst(tp: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", tp + body)

    max_bytes = max(len(b) for b in payloads)
    usec = round(1_000_000 * fps_den / fps_num) if fps_num else 0
    avih = struct.pack(
        "<10I4I",
        usec, max_bytes * fps_num // max(fps_den, 1), 0,
        0x10,  # AVIF_HASINDEX
        len(frames), 0, 1, max_bytes, w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids"
        + (b"MJPG" if codec == "MJPG" else b"DIB ")
        + struct.pack("<I2H8I4h", 0, 0, 0, 0, fps_den, fps_num, 0,
                      len(frames), max_bytes, 0xFFFFFFFF, 0, 0, 0, w, h)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, w, h, 1, bits, compression, len(payloads[0]), 0, 0, 0, 0,
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi_body = b""
    idx_entries = []
    for b in payloads:
        off_in_movi = 4 + len(movi_body)  # offsets count from 'movi' fourcc
        fr = chunk(fourcc, b)
        if rec_groups:
            fr = lst(b"rec ", fr)
            off_in_movi += 12
        idx_entries.append((off_in_movi, len(b)))
        movi_body += fr
    movi = lst(b"movi", movi_body)
    idx1 = chunk(
        b"idx1",
        b"".join(
            fourcc + struct.pack("<III", 0x10, off, ln)
            for off, ln in idx_entries
        ),
    )
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body
