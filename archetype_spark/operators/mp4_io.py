"""MP4 / ISO-BMFF sample extraction for Motion-JPEG tracks — stdlib
+ numpy only.

multimodal.py already parses MP4 STRUCTURE (moov/mvhd/tkhd/stts — the
decode-probe tier). This module adds real SAMPLE access for the one
video coding the dependency-free codec family can actually decode:
photo-JPEG / Motion-JPEG tracks ('jpeg' and 'mjpa' sample entries —
the QuickTime/ISO registration where every sample is a complete
T.81 JPEG picture, decoded by operators/jpeg_io.py). H.264/H.265/AV1
tracks still refuse loudly naming the PyAV gap — entropy-decoding
those needs a real codec library.

The full ISO/IEC 14496-12 sample-table machinery is implemented, not
a shortcut: stsd (sample description + format fourcc), stsz (uniform
or per-sample sizes), stsc (sample-to-chunk runs, properly expanded
to the chunk list), stco/co64 (32/64-bit chunk offsets), and the
mdhd/stts timing for fps. Sample offsets derive as chunk offset +
preceding sample sizes within the chunk — the spec's layout, which
also means mdat position is irrelevant (faststart and tail-moov files
both work).

The encoder muxes a minimal-but-spec-shaped file (ftyp, mdat, then
moov with the full stbl) for fixtures and round-trip tests; frames
use the unit-DC-quant tile construction, so decode is bit-exact by
the q121 media_pixels argument.

Like the siblings, DRIVER/EXECUTOR-side scalar code invoked from
Arrow-batched mapInPandas (multimodal.video_frame_stats); the Spark
plumbing never sees per-pixel rows.
"""

from __future__ import annotations

import struct

from archetype_spark.operators import jpeg_io

#: sample-entry fourccs whose samples are complete JPEG pictures
_JPEG_FORMATS = (b"jpeg", b"mjpa")


def _boxes(data: bytes, start: int, end: int):
    i = start
    while i + 8 <= end:
        (size,) = struct.unpack(">I", data[i : i + 4])
        btype = data[i + 4 : i + 8]
        if size == 1 and i + 16 <= end:
            (size,) = struct.unpack(">Q", data[i + 8 : i + 16])
            if size < 16:
                return
            yield btype, i + 16, i + size
        elif size == 0:
            # ISO-BMFF 4.2: size 0 = box extends to the end of the
            # enclosing span (streaming writers' final mdat)
            yield btype, i + 8, end
            return
        elif size >= 8:
            yield btype, i + 8, i + size
        else:
            return
        i += size


def _find(data: bytes, path: list[bytes], start: int, end: int):
    for btype, b0, b1 in _boxes(data, start, end):
        if btype == path[0]:
            if len(path) == 1:
                return b0, b1
            return _find(data, path[1:], b0, b1)
    return None


def _find_all(data: bytes, btype: bytes, start: int, end: int):
    return [(b0, b1) for t, b0, b1 in _boxes(data, start, end) if t == btype]


def _video_stbl(p: bytes):
    """(stbl_span, mdhd_timescale) for the first 'vide' track."""
    n = len(p)
    moov = _find(p, [b"moov"], 0, n)
    if moov is None:
        raise ValueError("MP4 has no moov box")
    for t0, t1 in _find_all(p, b"trak", *moov):
        mdia = _find(p, [b"mdia"], t0, t1)
        if mdia is None:
            continue
        hdlr = _find(p, [b"hdlr"], *mdia)
        if hdlr is None or p[hdlr[0] + 8 : hdlr[0] + 12] != b"vide":
            continue
        stbl = _find(p, [b"minf", b"stbl"], *mdia)
        if stbl is None:
            raise ValueError("MP4 video trak has no sample table")
        mdhd = _find(p, [b"mdhd"], *mdia)
        timescale = 0
        if mdhd is not None:
            m0 = mdhd[0]
            ver = p[m0]
            timescale = struct.unpack(
                ">I", p[m0 + (20 if ver == 1 else 12) :][:4]
            )[0]
        return stbl, timescale
    raise ValueError("MP4 carries no video ('vide') track")


def _full(p: bytes, span) -> tuple[int, int]:
    """Skip a FullBox's version/flags word."""
    return span[0] + 4, span[1]


def mp4_sample_format(payload: bytes) -> str | None:
    """The video track's sample-entry fourcc ('jpeg', 'avc1', ...) or
    None if the payload is not MP4 / has no video track — the cheap
    dispatch probe decode_video_frames uses."""
    p = bytes(payload or b"")
    if len(p) < 12 or p[4:8] != b"ftyp":
        return None
    try:
        stbl, _ts = _video_stbl(p)
    except ValueError:
        return None
    stsd = _find(p, [b"stsd"], *stbl)
    if stsd is None:
        return None
    s0, _s1 = _full(p, stsd)
    # entry_count (4) then the first sample entry: size + format
    if s0 + 12 > len(p):
        return None
    return p[s0 + 8 : s0 + 12].decode("ascii", "replace")


def mp4_decode_frames(payload: bytes):
    """Decode every sample of an MP4 Motion-JPEG video track:
    (frames, meta) where frames are uint8 arrays from jpeg_io and
    meta is {width, height, fps_num, fps_den, n_frames, handler}.
    Non-JPEG codings refuse naming the codec and the PyAV gap."""
    p = bytes(payload or b"")
    if len(p) < 12 or p[4:8] != b"ftyp":
        raise ValueError("not an MP4 (ftyp) stream")
    stbl, timescale = _video_stbl(p)
    stsd = _find(p, [b"stsd"], *stbl)
    if stsd is None:
        raise ValueError("MP4 sample table has no stsd")
    s0, _ = _full(p, stsd)
    fmt = p[s0 + 8 : s0 + 12]
    if fmt not in _JPEG_FORMATS:
        raise NotImplementedError(
            f"MP4 video coding {fmt.decode('ascii', 'replace')!r}: only "
            "Motion-JPEG ('jpeg'/'mjpa') samples decode dependency-free; "
            "other codecs need a codec library (PyAV)"
        )
    # sample sizes: stsz sample_size != 0 means uniform
    stsz = _find(p, [b"stsz"], *stbl)
    if stsz is None:
        raise ValueError("MP4 sample table has no stsz")
    z0, _ = _full(p, stsz)
    uniform, count = struct.unpack(">II", p[z0 : z0 + 8])
    sizes = (
        [uniform] * count
        if uniform
        else list(
            struct.unpack(f">{count}I", p[z0 + 8 : z0 + 8 + 4 * count])
        )
    )
    # chunk offsets: stco (32-bit) or co64
    stco = _find(p, [b"stco"], *stbl)
    width64 = False
    if stco is None:
        stco = _find(p, [b"co64"], *stbl)
        width64 = True
    if stco is None:
        raise ValueError("MP4 sample table has no stco/co64")
    c0, _ = _full(p, stco)
    (n_chunks,) = struct.unpack(">I", p[c0 : c0 + 4])
    fmt_ch = ">Q" if width64 else ">I"
    w_ch = 8 if width64 else 4
    chunk_offsets = [
        struct.unpack(fmt_ch, p[c0 + 4 + w_ch * i : c0 + 4 + w_ch * (i + 1)])[0]
        for i in range(n_chunks)
    ]
    # sample-to-chunk runs expanded over the chunk list
    stsc = _find(p, [b"stsc"], *stbl)
    if stsc is None:
        raise ValueError("MP4 sample table has no stsc")
    sc0, _ = _full(p, stsc)
    (n_runs,) = struct.unpack(">I", p[sc0 : sc0 + 4])
    runs = [
        struct.unpack(">III", p[sc0 + 4 + 12 * i : sc0 + 16 + 12 * i])
        for i in range(n_runs)
    ]
    per_chunk = []
    for i, (first, spc, _desc) in enumerate(runs):
        last = runs[i + 1][0] - 1 if i + 1 < len(runs) else n_chunks
        per_chunk += [spc] * (last - first + 1)
    if len(per_chunk) != n_chunks:
        raise ValueError("MP4 stsc runs do not cover the chunk list")
    frames = []
    si = 0
    for ci, coff in enumerate(chunk_offsets):
        off = coff
        for _ in range(per_chunk[ci]):
            if si >= count:
                break
            sz = sizes[si]
            sample = p[off : off + sz]
            if len(sample) != sz:
                raise ValueError("MP4 sample overruns the file")
            frames.append(jpeg_io.jpeg_decode(sample))
            off += sz
            si += 1
    if si != count:
        raise ValueError(f"MP4 chunks yield {si} of {count} samples")
    # fps from stts: single-run tables give an exact rational
    stts = _find(p, [b"stts"], *stbl)
    fps_num = fps_den = 0
    if stts is not None and timescale:
        t0, _ = _full(p, stts)
        (n_ent,) = struct.unpack(">I", p[t0 : t0 + 4])
        if n_ent >= 1:
            _cnt, delta = struct.unpack(">II", p[t0 + 4 : t0 + 12])
            if delta:
                fps_num, fps_den = timescale, delta
    h0, w0 = (frames[0].shape[0], frames[0].shape[1]) if frames else (0, 0)
    meta = {
        "width": int(w0),
        "height": int(h0),
        "fps_num": int(fps_num),
        "fps_den": int(fps_den),
        "n_frames": len(frames),
        "handler": fmt.decode("ascii"),
    }
    return frames, meta


# ------------------------------------------------------------------- encode


def _box(btype: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + btype + body


def mp4_encode_mjpeg(
    frames,
    fps: int = 24,
    quality_scale: int = 16,
    samples_per_chunk: int | None = None,
    use_co64: bool = False,
) -> bytes:
    """uint8 frames — (h, w) gray or (h, w, 3) RGB, one shape — as an
    ISO-BMFF file with a 'jpeg' (photo-JPEG) video track: ftyp, mdat
    holding one JPEG picture per sample, moov with the full sample
    table (stsd/stts/stsc/stsz/stco). Tile frames at quality_scale 16
    decode bit-exactly (the unit-DC-quant argument).
    `samples_per_chunk` splits the samples across multiple chunks
    (a trailing short chunk gets its own stsc run) — the layout real
    muxers interleave with audio, exercising the decoder's full
    run-expansion path; `use_co64` writes 64-bit chunk offsets (the
    box >4 GB files carry), exercising the reader's co64 branch."""
    import numpy as np

    if not frames:
        raise ValueError("mp4_encode_mjpeg wants at least one frame")
    frames = [np.ascontiguousarray(f, dtype=np.uint8) for f in frames]
    h, w = frames[0].shape[:2]
    for f in frames:
        if f.shape[:2] != (h, w):
            raise ValueError("all MP4 frames must share one shape")
    samples = [
        jpeg_io.jpeg_encode(f, quality_scale=quality_scale) for f in frames
    ]
    n = len(samples)
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    mdat_body = b"".join(samples)
    mdat = _box(b"mdat", mdat_body)
    data_base = len(ftyp) + 8  # first sample starts after mdat header
    spc = samples_per_chunk or n
    chunk_offsets = []
    off = data_base
    for c0 in range(0, n, spc):
        chunk_offsets.append(off)
        off += sum(len(s) for s in samples[c0 : c0 + spc])
    rem = n % spc
    stsc_runs = [(1, spc, 1)]
    if rem and len(chunk_offsets) > 1:
        stsc_runs.append((len(chunk_offsets), rem, 1))

    timescale = fps
    dur = n  # one timescale unit per frame
    mvhd = _box(
        b"mvhd",
        # version/flags, creation, modification, timescale, duration
        struct.pack(">IIIII", 0, 0, 0, timescale, dur)
        + struct.pack(">I", 0x00010000)  # rate 1.0
        + struct.pack(">HHII", 0x0100, 0, 0, 0)  # volume + reserved
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">6I", 0, 0, 0, 0, 0, 0)
        + struct.pack(">I", 2),  # next track id
    )
    tkhd = _box(
        b"tkhd",
        struct.pack(">I", 3)  # version 0, flags: enabled+in-movie
        + struct.pack(">IIIII", 0, 0, 1, 0, dur)
        + struct.pack(">II", 0, 0)
        + struct.pack(">hhhh", 0, 0, 0, 0)
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", w << 16, h << 16),
    )
    mdhd = _box(
        b"mdhd",
        # version/flags, creation, modification, timescale, duration
        struct.pack(">IIIII", 0, 0, 0, timescale, dur)
        + struct.pack(">HH", 0x55C4, 0),  # language 'und', predefined
    )
    hdlr = _box(
        b"hdlr",
        struct.pack(">II", 0, 0) + b"vide" + bytes(12) + b"VideoHandler\x00",
    )
    vmhd = _box(b"vmhd", struct.pack(">IHHHH", 1, 0, 0, 0, 0))
    dref = _box(
        b"dref",
        struct.pack(">II", 0, 1) + _box(b"url ", struct.pack(">I", 1)),
    )
    dinf = _box(b"dinf", dref)
    # 'jpeg' visual sample entry (ISO 14496-12 VisualSampleEntry)
    entry = (
        b"jpeg"
        + bytes(6)
        + struct.pack(">H", 1)  # data reference index
        + struct.pack(">HH", 0, 0)  # pre_defined/reserved
        + bytes(12)
        + struct.pack(">HH", w, h)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + struct.pack(">I", 0)
        + struct.pack(">H", 1)  # frame count per sample
        + bytes(32)  # compressor name
        + struct.pack(">Hh", 24, -1)  # depth, color table
    )
    stsd = _box(
        b"stsd",
        struct.pack(">II", 0, 1)
        + struct.pack(">I", 8 + len(entry))
        + entry,
    )
    stts = _box(b"stts", struct.pack(">IIII", 0, 1, n, 1))
    stsc = _box(
        b"stsc",
        struct.pack(">II", 0, len(stsc_runs))
        + b"".join(struct.pack(">III", *run) for run in stsc_runs),
    )
    stsz = _box(
        b"stsz",
        struct.pack(">III", 0, 0, n)
        + struct.pack(f">{n}I", *[len(s) for s in samples]),
    )
    stco = _box(
        b"co64" if use_co64 else b"stco",
        struct.pack(">II", 0, len(chunk_offsets))
        + struct.pack(
            f">{len(chunk_offsets)}{'Q' if use_co64 else 'I'}",
            *chunk_offsets,
        ),
    )
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = _box(b"minf", vmhd + dinf + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov
