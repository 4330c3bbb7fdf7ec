"""Multimodal column plumbing ([N]): opaque binary payloads + typed
metadata, with decode / feature-extract / resize / frame-sample as
Arrow-batched `mapInPandas` stages.

Design for 100 TB:
- media live as `binary` columns (or storage URLs at petabyte scale —
  the schema carries `uri` for that) with a `kind` discriminator and
  a typed `meta` struct; Spark shuffles only the columns a stage
  reads, so feature extraction that ignores `payload` never moves it.
- decode runs inside `mapInPandas` so each Python worker processes an
  Arrow batch (vectorized transfer), never a row at a time.
- the actual codec calls (PIL/librosa/av) are NOT in this container,
  so `decode_media` dispatches to a clearly-marked deterministic fake
  decoder (`_fake_decode`) unless a real decoder import succeeds; the
  Spark-side plumbing (schema, batching, partitioning) is real and
  tested either way.
"""

from __future__ import annotations

import hashlib
import sys
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from archetype_spark.operators import (
    avi_io,
    bmp_io,
    flac_io,
    gif_io,
    image_probe,
    jpeg_io,
    mp4_io,
    png_io,
    tiff_io,
    webp_io,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("uri", StringType(), True),  # at PB scale: store refs
        StructField("payload", BinaryType(), True),
        StructField("n_bytes", LongType(), True),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("width", IntegerType(), True),  # image/video
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),  # audio/video
        StructField("n_frames", IntegerType(), True),  # video
        StructField("content_digest", StringType(), False),
    ]
)

_KINDS = ["image", "audio", "video"]

# The mapInPandas closures below reference this module's globals
# (_fake_decode, DECODED_SCHEMA). By default cloudpickle serializes
# those by reference, which requires every Spark Python worker to be
# able to `import archetype_spark` — not guaranteed when the driver
# process runs outside the repo root. Registering the module for
# by-value pickling ships the function bodies inside the task binary
# instead, so workers need only stdlib + pandas.
try:  # pyspark vendors cloudpickle; plain cloudpickle as fallback
    from pyspark.cloudpickle import register_pickle_by_value
except ImportError:  # pragma: no cover
    from cloudpickle import register_pickle_by_value

register_pickle_by_value(sys.modules[__name__])
# png_io is referenced from the same closures (real decode/resize):
# ship it by value too, same worker-importability rationale
register_pickle_by_value(png_io)
register_pickle_by_value(image_probe)
register_pickle_by_value(jpeg_io)
register_pickle_by_value(gif_io)
register_pickle_by_value(bmp_io)
register_pickle_by_value(webp_io)
register_pickle_by_value(flac_io)
register_pickle_by_value(avi_io)
register_pickle_by_value(tiff_io)
register_pickle_by_value(mp4_io)
# audio_codecs is reached lazily from _wav_pcm's compressed-format
# dispatch; register it so compressed WAVs decode on workers whose
# cwd is not the repo (the drive-contract pickling scenario)
from archetype_spark.operators import audio_codecs  # noqa: E402

register_pickle_by_value(audio_codecs)
# vp8_io is reached through webp_io's module-top import; registering
# it keeps the lossy path importable on workers whose cwd is not the
# repo (the drive-contract pickling scenario)
from archetype_spark.operators import vp8_io  # noqa: E402

register_pickle_by_value(vp8_io)


def synth_media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic fake media table derived from `documents`: the
    payload is the utf-8 text bytes (stand-in for an encoded blob),
    kind cycles by doc_id. Exists so the multimodal plumbing has a
    reproducible input in this container."""
    kind = F.element_at(
        F.array(*[F.lit(k) for k in _KINDS]), (F.col("doc_id") % 3 + 1).cast("int")
    )
    payload = F.encode(F.col("text"), "utf-8")
    # Deliberately NOT fanned out (r16): the fake-codec consumers do
    # microseconds of Python per row, and a measured same-JVM A/B put
    # the repartition + 32-task mapInPandas overhead at +0.3 s against
    # a ~0.03 s parallel win at sf0.1. Wide real inputs arrive wide.
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.concat(F.lit("synthetic://doc/"), F.col("doc_id")).alias("uri"),
        payload.alias("payload"),
        F.length(F.col("text")).cast("bigint").alias("n_bytes"),
    )


def fetch_payloads(
    media: DataFrame,
    uri_col: str = "uri",
    payload_col: str = "payload",
    on_error: str = "null",
) -> DataFrame:
    """Resolve storage refs to bytes — the Daft `.url.download()` row
    of the [D] surface (reference pyproject.toml:7-8): at PB scale
    media tables carry URIs, and this stage materializes the payload
    column right before a decode stage needs it.

    Runs as Arrow-batched mapInPandas: each Python worker fetches its
    batch's URIs (file:// reads locally; http(s):// via stdlib urllib,
    which this container can't exercise — guarded, surfaced per-row).
    Output = input columns with `payload_col` (re)bound to the fetched
    bytes plus a `fetch_error` string column (NULL on success).
    `on_error='error'` raises on the first failed row instead.

    Scale notes: fetch is I/O-bound, so repartition the URI frame to
    the cluster's concurrent-connection budget before this stage; only
    the uri column shuffles (payload is born executor-side, exactly
    like Daft's lazy download)."""
    if on_error not in ("null", "error"):
        raise ValueError(f"on_error must be 'null' or 'error', got {on_error!r}")
    keep = [f for f in media.schema.fields if f.name != payload_col]
    out_schema = StructType(
        list(keep)
        + [
            StructField(payload_col, BinaryType(), True),
            StructField("fetch_error", StringType(), True),
        ]
    )
    keep_names = [f.name for f in keep]

    def _fetch_one(uri):
        if uri is None:
            return None, "null uri"
        if uri.startswith("file://"):
            try:
                with open(uri[len("file://"):], "rb") as fh:
                    return fh.read(), None
            except OSError as exc:
                return None, f"file error: {exc}"
        if uri.startswith(("http://", "https://")):
            try:
                import urllib.request

                with urllib.request.urlopen(uri, timeout=30) as resp:
                    return resp.read(), None
            except Exception as exc:  # no network in this container
                return None, f"http error: {exc}"
        return None, f"unsupported scheme: {uri.split(':', 1)[0]}"

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, errors = [], []
            for uri in pdf[uri_col]:
                data, err = _fetch_one(uri)
                if err is not None and on_error == "error":
                    raise IOError(f"fetch_payloads: {uri!r}: {err}")
                payloads.append(data)
                errors.append(err)
            out = pdf[keep_names].copy()
            out[payload_col] = payloads
            out["fetch_error"] = errors
            yield out

    return media.select(*keep_names).mapInPandas(process, schema=out_schema)


def _fake_decode(kind: str, payload: bytes) -> dict:
    """Deterministic stand-in decoder: derives plausible media
    properties from a sha256 of the payload. Replace with PIL/librosa/
    av in a full container — the signature is the contract."""
    digest = hashlib.sha256(payload or b"").hexdigest()
    h = int(digest[:8], 16)
    out = {
        "width": None,
        "height": None,
        "duration_ms": None,
        "n_frames": None,
        "content_digest": digest,
    }
    if kind == "image":
        out["width"] = 64 + h % 1920
        out["height"] = 64 + (h >> 8) % 1080
    elif kind == "audio":
        out["duration_ms"] = 500 + h % 600_000
    elif kind == "video":
        out["width"] = 64 + h % 1920
        out["height"] = 64 + (h >> 8) % 1080
        out["duration_ms"] = 1000 + h % 3_600_000
        out["n_frames"] = 1 + (h >> 4) % 10_000
    return out


def _ppm_header(payload: bytes):
    """Parse a binary PNM header (P5 gray / P6 RGB): returns
    (width, height, maxval, raster_offset) or None if not PNM.
    Comments (#...) and arbitrary whitespace between header fields
    per the spec; exactly one whitespace byte separates maxval from
    the raster."""
    if not payload or payload[:2] not in (b"P5", b"P6"):
        return None
    i, vals = 2, []
    while len(vals) < 3 and i < len(payload):
        c = payload[i : i + 1]
        if c == b"#":
            nl = payload.find(b"\n", i)
            if nl < 0:
                return None
            i = nl + 1
        elif c.isspace():
            i += 1
        elif c.isdigit():
            j = i
            while j < len(payload) and payload[j : j + 1].isdigit():
                j += 1
            vals.append(int(payload[i:j]))
            i = j
        else:
            return None
    if len(vals) < 3:
        return None
    return vals[0], vals[1], vals[2], i + 1


def _wav_chunks(payload: bytes):
    """Shared RIFF/WAVE chunk walk for _wav_info and _wav_pcm:
    (fmt_body, (data_body, declared_data_size)) or None if not WAV.
    fmt_body comes back only when the chunk both DECLARES and
    actually CONTAINS at least the 16 standard format bytes — a
    lying shorter size would make a caller read the next chunk's
    bytes as format fields, a silent wrong answer. Missing chunks
    surface as None entries; every read is bounds-guarded so a
    corrupt blob degrades loudly downstream, never a struct.error
    task crash."""
    import struct

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    fmt_body = None
    data = None
    i = 12
    while i + 8 <= len(payload):
        cid = payload[i : i + 4]
        (size,) = struct.unpack("<I", payload[i + 4 : i + 8])
        body = payload[i + 8 : i + 8 + size]
        if cid == b"fmt " and size >= 16 and len(body) >= 16:
            fmt_body = body
        elif cid == b"data":
            # duration math uses the DECLARED size (the header's
            # own claim); PCM extraction uses the present bytes
            data = (body, size)
        i += 8 + size + (size & 1)
    return fmt_body, data


def _wav_info(payload: bytes):
    """duration_ms from the RIFF/WAVE header, or None if not WAV /
    malformed (degrades to the loud NotImplementedError path)."""
    import struct

    parsed = _wav_chunks(payload)
    if parsed is None:
        return None
    fmt_body, data = parsed
    if fmt_body is None or data is None:
        return None
    byte_rate = struct.unpack("<I", fmt_body[8:12])[0]
    if not byte_rate:
        return None
    return round(data[1] * 1000 / byte_rate)


def _mp4_boxes(data: bytes, start: int, end: int):
    """Yield (box_type, body_start, body_end) over an MP4 box run.
    Every branch guarantees `i` strictly advances (a 64-bit size
    smaller than its own 16-byte header would otherwise loop the
    task forever on a malformed payload — worse than the crash the
    bounds checks prevent)."""
    import struct

    i = start
    while i + 8 <= end:
        (size,) = struct.unpack(">I", data[i : i + 4])
        btype = data[i + 4 : i + 8]
        if size == 1 and i + 16 <= end:  # 64-bit size
            (size,) = struct.unpack(">Q", data[i + 8 : i + 16])
            if size < 16:  # must cover its own extended header
                return
            yield btype, i + 16, i + size
        elif size >= 8:
            yield btype, i + 8, i + size
        else:
            return
        i += size


def _mp4_find(data: bytes, path: list[bytes], start: int, end: int):
    for btype, b0, b1 in _mp4_boxes(data, start, end):
        if btype == path[0]:
            if len(path) == 1:
                return b0, b1
            return _mp4_find(data, path[1:], b0, b1)
    return None


def _mp4_info(payload: bytes):
    """Parse MP4 structure boxes (no codec work): moov/mvhd gives
    duration, moov/trak/tkhd gives display dims (16.16 fixed point),
    stbl/stts sample counts give n_frames. Returns
    (width, height, duration_ms, n_frames), or None if not MP4 or
    truncated mid-box — box fields are read under a struct.error/
    IndexError net so malformed payloads degrade to the loud
    NotImplementedError path instead of crashing the Spark task."""
    import struct

    if len(payload) < 12 or payload[4:8] != b"ftyp":
        return None
    n = len(payload)
    try:
        mvhd = _mp4_find(payload, [b"moov", b"mvhd"], 0, n)
        if mvhd is None:
            return None
        b0, _ = mvhd
        ver = payload[b0]
        if ver == 1:
            ts = struct.unpack(">I", payload[b0 + 20 : b0 + 24])[0]
            dur = struct.unpack(">Q", payload[b0 + 24 : b0 + 32])[0]
        else:
            ts = struct.unpack(">I", payload[b0 + 12 : b0 + 16])[0]
            dur = struct.unpack(">I", payload[b0 + 16 : b0 + 20])[0]
        duration_ms = round(dur * 1000 / ts) if ts else None
        width = height = None
        tkhd = _mp4_find(payload, [b"moov", b"trak", b"tkhd"], 0, n)
        if tkhd is not None:
            t0, t1 = tkhd
            if t1 - t0 >= 84 and t1 <= n and payload[t0] == 0:  # version 0
                width = struct.unpack(">I", payload[t0 + 76 : t0 + 80])[0] >> 16
                height = struct.unpack(">I", payload[t0 + 80 : t0 + 84])[0] >> 16
        n_frames = None
        stts = _mp4_find(
            payload, [b"moov", b"trak", b"mdia", b"minf", b"stbl", b"stts"], 0, n
        )
        if stts is not None:
            s0, s1 = stts
            if s0 + 8 > min(s1, n):
                return None
            (entries,) = struct.unpack(">I", payload[s0 + 4 : s0 + 8])
            if s0 + 8 + 8 * entries > min(s1, n):  # truncated sample table
                return None
            n_frames = sum(
                struct.unpack(">I", payload[s0 + 8 + 8 * k : s0 + 12 + 8 * k])[0]
                for k in range(entries)
            )
    except (struct.error, IndexError):
        return None
    return width, height, duration_ms, n_frames


def _probe_codec_libs() -> dict:
    """Import-probe the optional codec libraries ONCE per process.
    Returns {'pil': bool, 'av': bool}. The container this repo is
    built in has neither; the probe exists so the same code routes
    through real codecs the day the environment gains them (the
    conditional-import seam the r7 verdict asked for)."""
    out = {}
    try:
        import PIL.Image  # noqa: F401

        out["pil"] = True
    except ImportError:
        out["pil"] = False
    try:
        import av  # noqa: F401

        out["av"] = True
    except ImportError:
        out["av"] = False
    return out


_CODEC_LIBS = _probe_codec_libs()


def _pil_image_info(payload: bytes):
    """(width, height) via PIL for any format it knows, or None if
    PIL is absent or cannot parse the payload."""
    if not _CODEC_LIBS["pil"]:
        return None
    import io

    import PIL.Image

    try:
        with PIL.Image.open(io.BytesIO(payload or b"")) as im:
            return im.width, im.height
    except Exception:
        return None


def _pil_resize(payload: bytes, width: int, height: int):
    """Re-encoded PNG bytes of the PIL-resized image, or None if PIL
    is absent or cannot parse the payload."""
    if not _CODEC_LIBS["pil"]:
        return None
    import io

    import PIL.Image

    try:
        with PIL.Image.open(io.BytesIO(payload or b"")) as im:
            buf = io.BytesIO()
            im.resize((width, height)).save(buf, format="PNG")
            return buf.getvalue()
    except Exception:
        return None


def _av_media_info(payload: bytes):
    """(width, height, duration_ms, n_frames) via PyAV container
    probe, or None if av is absent or cannot parse the payload."""
    if not _CODEC_LIBS["av"]:
        return None
    import io

    import av

    try:
        with av.open(io.BytesIO(payload or b"")) as c:
            dur = (
                round(c.duration * 1000 / av.time_base)
                if c.duration is not None
                else None
            )
            vstreams = [s for s in c.streams if s.type == "video"]
            if vstreams:
                v = vstreams[0]
                return v.width, v.height, dur, v.frames or None
            return None, None, dur, None
    except Exception:
        return None


def _real_decode(kind: str, payload: bytes) -> dict:
    """Real decoders. Dependency-free tier: container formats
    parseable WITHOUT codec libraries — PNM (P5/P6) images, RIFF/WAVE
    PCM audio, MP4 structure boxes for video (header/box arithmetic
    only, which is exactly what decode-probe needs: dims, duration,
    frame count). When PIL / PyAV are importable (probed once at
    module load — absent in this container), compressed formats
    (JPEG/PNG/WebP, H.264/Opus containers) route through them.
    Anything neither tier can parse raises loudly naming the gap —
    never a silent wrong answer."""
    digest = hashlib.sha256(payload or b"").hexdigest()
    out = {
        "width": None,
        "height": None,
        "duration_ms": None,
        "n_frames": None,
        "content_digest": digest,
    }
    if kind == "image":
        hdr = _ppm_header(payload or b"")
        if hdr is not None:
            out["width"], out["height"] = hdr[0], hdr[1]
            return out
        png = png_io.png_info(payload or b"")
        if png is not None:
            # real PNG parse (operators/png_io.py): stdlib zlib +
            # chunk framing, no codec library needed
            out["width"], out["height"] = png
            return out
        probed = image_probe.probe_dims(payload or b"")
        if probed is not None:
            # real marker/header dims for JPEG/GIF/BMP/WebP
            # (operators/image_probe.py) — the decode-probe metadata;
            # pixel access for these still needs PIL
            out["width"], out["height"] = probed
            return out
        tf = tiff_io.tiff_info(payload or b"")
        if tf is not None:
            out["width"], out["height"] = tf
            return out
        dims = _pil_image_info(payload)
        if dims is None:
            raise NotImplementedError(
                "real image decode: payload is not PNM/PNG/JPEG/GIF/BMP/WebP "
                + ("and PIL could not parse it" if _CODEC_LIBS["pil"] else "and PIL is not installed")
            )
        out["width"], out["height"] = dims
    elif kind == "audio":
        ms = _wav_info(payload or b"")
        if ms is not None:
            out["duration_ms"] = ms
            return out
        fl = flac_io.flac_info(payload or b"")
        if fl is not None:
            sr, _ch, _bps, total = fl
            out["duration_ms"] = round(total * 1000 / sr) if sr else None
            return out
        info = _av_media_info(payload)
        if info is None:
            raise NotImplementedError(
                "real audio decode: payload is not RIFF/WAVE PCM or FLAC "
                "and av "
                + ("could not parse it" if _CODEC_LIBS["av"] else "is not installed")
            )
        out["duration_ms"] = info[2]
    elif kind == "video":
        info = avi_io.avi_info(payload or b"")
        if info is None:
            info = _mp4_info(payload or b"")
        if info is None:
            info = _av_media_info(payload)
        if info is None:
            raise NotImplementedError(
                "real video decode: payload is not AVI or MP4 box structure "
                "and av "
                + ("could not parse it" if _CODEC_LIBS["av"] else "is not installed")
            )
        out["width"], out["height"], out["duration_ms"], out["n_frames"] = info
    return out


#: image_pixel_stats output: pixel_digest = sha256 hexdigest of the
#: decoded row-major uint8 pixel bytes — the container-format-
#: independent image identity (two encodings of the same pixels get
#: one digest), i.e. the exact-dedup key for images.
PIXEL_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("n_px", LongType(), True),
        StructField("pixel_digest", StringType(), True),
    ]
)


def decode_image_pixels(payload: bytes):
    """REAL pixel decode through the dependency-free codec dispatch:
    uint8 (h, w[, 3]) for P5/P6 PNM, PNG, GIF, BMP, WebP (lossless,
    flat-chroma lossy, VP8X still) and JPEG (baseline + progressive)
    payloads. Anything else raises loudly naming the codecs — never
    silently wrong pixels. Shared by image_pixel_stats and
    image_dhash."""
    import numpy as _np

    p = bytes(payload or b"")
    if p[:2] == b"\xff\xd8":
        return jpeg_io.jpeg_decode(p)
    if png_io.png_info(p) is not None:
        return png_io.png_decode(p)
    if p[:6] in (b"GIF87a", b"GIF89a"):
        return gif_io.gif_decode(p)
    if p[:2] == b"BM":
        return bmp_io.bmp_decode(p)
    if p[:4] in (b"II*\x00", b"MM\x00*"):
        return tiff_io.tiff_decode(p)
    if p[:4] == b"RIFF" and p[8:12] == b"WEBP":
        return webp_io.webp_decode(p)
    if p[:2] in (b"P6", b"P5"):
        hdr = _ppm_header(p)
        if hdr is None:
            raise ValueError("malformed PNM header")
        w0, h0, maxval, off = hdr
        if maxval > 255:
            raise NotImplementedError("PNM maxval > 255 (2-byte samples)")
        ch = 3 if p[:2] == b"P6" else 1
        need = w0 * h0 * ch
        if len(p) < off + need:
            raise ValueError("PNM raster truncated")
        px = _np.frombuffer(p, _np.uint8, count=need, offset=off)
        return px.reshape(h0, w0, ch) if ch == 3 else px.reshape(h0, w0)
    raise NotImplementedError(
        "image decode: payload is not P5/P6 PNM, PNG, GIF, "
        "BMP, TIFF (baseline: none/PackBits/LZW strips), "
        "WebP (lossless, flat-chroma lossy, or VP8X still) "
        "or JPEG (the dependency-free pixel codecs)"
    )


def image_dhash_int(px) -> int:
    """The 64-bit difference hash of a decoded uint8 array — the
    perceptual near-dup key (the LAION-style image-dedup signal):
    integer luma ((r+g+b)//3; gray passes through), a 9x8
    nearest-neighbor sample grid (rows (j*h)//8, cols (i*w)//9 —
    NN rather than area means so the definition is exact for ANY
    dimensions and trivially re-derivable), and bit r*8+c set when
    sample[r][c+1] > sample[r][c]. Returned as SIGNED int64 (bit 63
    is the sign bit) so it round-trips Spark/DuckDB BIGINT columns."""
    import numpy as _np

    a = _np.asarray(px)
    if a.ndim == 3 and a.shape[2] == 1:
        a = a[:, :, 0]
    if a.ndim == 3:
        luma = (
            a[:, :, 0].astype(_np.int64)
            + a[:, :, 1].astype(_np.int64)
            + a[:, :, 2].astype(_np.int64)
        ) // 3
    else:
        luma = a.astype(_np.int64)
    h0, w0 = luma.shape
    ys = (_np.arange(8) * h0) // 8
    xs = (_np.arange(9) * w0) // 9
    grid = luma[ys][:, xs]
    bits = grid[:, 1:] > grid[:, :-1]
    v = 0
    for r in range(8):
        for c in range(8):
            if bits[r, c]:
                v |= 1 << (r * 8 + c)
    return v - (1 << 64) if v & (1 << 63) else v


DHASH_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("dhash", LongType(), True),
    ]
)


def image_dhash(media: DataFrame) -> DataFrame:
    """Per-image perceptual hash (image_dhash_int over the real codec
    dispatch) — the candidate key for near-duplicate IMAGE dedup:
    re-encodes and small perturbations keep the gradient signs, so
    equal/near hashes flag visual duplicates exact digests miss.
    Arrow-batched mapInPandas; input (media_id, payload)."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, hv = [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                px = decode_image_pixels(
                    bytes(payload) if payload is not None else b""
                )
                ids.append(mid)
                hs.append(int(px.shape[0]))
                ws.append(int(px.shape[1]))
                hv.append(image_dhash_int(px))
            yield pd.DataFrame(
                {
                    "media_id": pd.array(ids, dtype="int64"),
                    "width": pd.array(ws, dtype="int32"),
                    "height": pd.array(hs, dtype="int32"),
                    "dhash": pd.array(hv, dtype="int64"),
                }
            )

    return media.select("media_id", "payload").mapInPandas(
        process, schema=DHASH_SCHEMA
    )


def image_pixel_stats(media: DataFrame) -> DataFrame:
    """REAL pixel decode -> per-image stats, dependency-free: P6 PNM,
    PNG (png_io), baseline+progressive JPEG (jpeg_io), GIF (gif_io —
    LZW, palette-mapped RGB), BMP (bmp_io — 24/32-bit + 8-bit
    palette) and WebP (webp_io — VP8L lossless, flat-chroma lossy
    VP8 via vp8_io's RFC 6386 keyframe decoder, VP8X still
    containers) payloads decode to their
    uint8 pixel arrays executor-side (Arrow-batched mapInPandas);
    output (media_id, width, height, n_px, pixel_digest) where the
    digest is sha256 over the row-major pixel BYTES — identical
    pixels give identical digests whatever container they arrived in
    (exact image dedup across re-encodes). Anything the codecs can't
    decode raises loudly naming the format — never a silent wrong
    digest. Input: (media_id, payload)."""

    def stats_one(payload: bytes) -> dict:
        import numpy as _np

        px = decode_image_pixels(payload)
        h0, w0 = px.shape[0], px.shape[1]
        return {
            "width": int(w0),
            "height": int(h0),
            "n_px": int(px.size),
            "pixel_digest": hashlib.sha256(
                _np.ascontiguousarray(px).tobytes()
            ).hexdigest(),
        }

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [stats_one(p) for p in pdf["payload"]]
            out = pd.DataFrame(rows)
            out.insert(0, "media_id", pdf["media_id"].values)
            yield out[[f.name for f in PIXEL_STATS_SCHEMA.fields]]

    return media.select("media_id", "payload").mapInPandas(
        process, schema=PIXEL_STATS_SCHEMA
    )


def decode_media(media: DataFrame, use_real_decoders: bool = False) -> DataFrame:
    """Decode/probe media payloads via Arrow-batched mapInPandas.

    Input must contain (media_id, kind, payload); output follows
    DECODED_SCHEMA. Each Arrow batch is processed vectorized in the
    Python worker; batch size is governed by
    spark.sql.execution.arrow.maxRecordsPerBatch.
    """
    decode = _real_decode if use_real_decoders else _fake_decode

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode(k, p) for k, p in zip(pdf["kind"], pdf["payload"])]
            out = pd.DataFrame(feats)
            out.insert(0, "media_id", pdf["media_id"].values)
            out.insert(1, "kind", pdf["kind"].values)
            yield out[[f.name for f in DECODED_SCHEMA.fields]]

    return media.select("media_id", "kind", "payload").mapInPandas(
        process, schema=DECODED_SCHEMA
    )


def resize_images(
    media: DataFrame, width: int, height: int, use_real_decoders: bool = False
) -> DataFrame:
    """Resize stage: images pass through the Python worker batch-wise;
    the fake path re-emits a digest-stamped payload of the target
    size's metadata (the real path would emit re-encoded bytes)."""
    out_schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("payload", BinaryType(), True),
            StructField("width", IntegerType(), False),
            StructField("height", IntegerType(), False),
        ]
    )
    if use_real_decoders:

        def resize_one(payload: bytes) -> bytes:
            """Real nearest-neighbor resize for P6 (RGB) PNM — pure
            numpy index arithmetic, re-encoded as P6. Other formats
            route through PIL when it is importable (PNG re-encode),
            else raise loudly."""
            hdr = _ppm_header(payload or b"")
            if hdr is None or payload[:2] != b"P6":
                if (payload or b"")[:2] == b"\xff\xd8":
                    # real baseline-JPEG path (operators/jpeg_io.py):
                    # Huffman+IDCT decode -> nearest-neighbor -> exact
                    # baseline re-encode, dependency-free. Profiles
                    # outside the codec (arithmetic, 12-bit) fall
                    # THROUGH to PIL when present, loud refusal below
                    # otherwise — the png_io conditional-seam pattern
                    import numpy as np

                    try:
                        px = jpeg_io.jpeg_decode(payload)
                    except NotImplementedError:
                        px = None
                    if px is not None:
                        h0, w0 = px.shape[0], px.shape[1]
                        ys = (np.arange(height) * h0) // height
                        xs = (np.arange(width) * w0) // width
                        return jpeg_io.jpeg_encode(
                            px[ys][:, xs], quality_scale=2
                        )
                if (payload or b"")[:4] == b"RIFF" and (payload or b"")[
                    8:12
                ] == b"WEBP":
                    # real WebP path: VP8L (RGB) / flat-chroma lossy
                    # VP8 (gray) / VP8X decode -> nearest-neighbor ->
                    # literal-form VP8L re-encode. The residual
                    # refusals (color VP8, animation, VP8L-coded
                    # alpha) fall THROUGH to PIL when present
                    import numpy as np

                    try:
                        px = webp_io.webp_decode(payload)
                    except NotImplementedError:
                        px = None
                    if px is not None:
                        h0, w0 = px.shape[0], px.shape[1]
                        ys = (np.arange(height) * h0) // height
                        xs = (np.arange(width) * w0) // width
                        return webp_io.webp_encode(px[ys][:, xs])
                if (payload or b"")[:2] == b"BM":
                    # real BMP path: uncompressed decode -> nearest-
                    # neighbor -> 24-bit BI_RGB re-encode. Variants
                    # outside bmp_io's scope (RLE, 16-bit) fall
                    # THROUGH to PIL when present, loud refusal below
                    import numpy as np

                    try:
                        px = bmp_io.bmp_decode(payload)
                    except NotImplementedError:
                        px = None
                    if px is not None:
                        h0, w0 = px.shape[0], px.shape[1]
                        ys = (np.arange(height) * h0) // height
                        xs = (np.arange(width) * w0) // width
                        return bmp_io.bmp_encode(px[ys][:, xs])
                if png_io.png_info(payload or b"") is not None:
                    # real PNG path: full decode -> nearest-neighbor
                    # -> exact re-encode, all dependency-free.
                    # PNGs outside png_io's scope (interlaced,
                    # non-8-bit depths) fall THROUGH to PIL when it
                    # exists — raising here would regress the r8
                    # conditional-codec seam for payloads PIL decodes
                    import numpy as np

                    try:
                        px = png_io.png_decode(payload)
                    except NotImplementedError:
                        px = None
                    if px is not None:
                        h0, w0 = px.shape[0], px.shape[1]
                        ys = (np.arange(height) * h0) // height
                        xs = (np.arange(width) * w0) // width
                        return png_io.png_encode(px[ys][:, xs])
                resized = _pil_resize(payload, width, height)
                if resized is not None:
                    return resized
                raise NotImplementedError(
                    "real image resize: payload is not P6 PNM or PNG and PIL "
                    + (
                        "could not parse it"
                        if _CODEC_LIBS["pil"]
                        else "is not installed"
                    )
                )
            w0, h0, maxval, off = hdr
            if maxval > 255:
                # 2-byte samples per the PNM spec: the uint8 view
                # below would silently misread pixels — refuse loudly
                # per the module's never-a-silent-wrong-answer rule.
                raise NotImplementedError(
                    "real image resize: P6 with maxval > 255 uses 2-byte "
                    "samples; only 1-byte P6 is supported without PIL"
                )
            if len(payload) < off + w0 * h0 * 3:
                raise ValueError(
                    "real image resize: P6 raster truncated "
                    f"({len(payload) - off} of {w0 * h0 * 3} bytes)"
                )
            import numpy as np

            px = np.frombuffer(
                payload, dtype=np.uint8, count=w0 * h0 * 3, offset=off
            ).reshape(h0, w0, 3)
            ys = (np.arange(height) * h0) // height
            xs = (np.arange(width) * w0) // width
            out = px[ys][:, xs]
            return (
                b"P6\n%d %d\n%d\n" % (width, height, maxval)
                + out.tobytes()
            )

        def process_real(
            batches: Iterator[pd.DataFrame],
        ) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                out = pd.DataFrame(
                    {
                        "media_id": pdf["media_id"].values,
                        "payload": [resize_one(p) for p in pdf["payload"]],
                    }
                )
                out["width"] = width
                out["height"] = height
                yield out

        return media.select("media_id", "payload").mapInPandas(
            process_real, schema=out_schema
        )

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            digests = [
                hashlib.sha256(p or b"").hexdigest().encode() for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": digests,
                    "width": width,
                    "height": height,
                }
            )

    return (
        media.filter(F.col("kind") == "image")
        .select("media_id", "payload")
        .mapInPandas(process, schema=out_schema)
    )


def sample_frames(
    media: DataFrame, every_n: int = 100, use_real_decoders: bool = False
) -> DataFrame:
    """Frame-sampling stage for videos: emits (media_id, frame_idx,
    frame_digest) rows — one row per sampled frame, demonstrating the
    1-to-N mapInPandas expansion shape."""
    out_schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("frame_idx", IntegerType(), False),
            StructField("frame_digest", StringType(), False),
        ]
    )
    if use_real_decoders:

        def process_real(
            batches: Iterator[pd.DataFrame],
        ) -> Iterator[pd.DataFrame]:
            import numpy as _np

            for pdf in batches:
                rows = []
                for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                    p = bytes(payload or b"")
                    if (
                        (p[:4] == b"RIFF" and p[8:12] == b"AVI ")
                        or p[:6] in (b"GIF87a", b"GIF89a")
                        or (
                            len(p) >= 12
                            and p[4:8] == b"ftyp"
                            and mp4_io.mp4_sample_format(p)
                            in ("jpeg", "mjpa")
                        )
                    ):
                        # dependency-free tier (avi_io / gif_io / mp4_io)
                        for idx, fr in enumerate(decode_video_frames(p)):
                            if idx % every_n == 0:
                                rows.append(
                                    (
                                        mid,
                                        idx,
                                        hashlib.sha256(
                                            _np.ascontiguousarray(fr).tobytes()
                                        ).hexdigest()[:16],
                                    )
                                )
                        continue
                    if not _CODEC_LIBS["av"]:
                        raise NotImplementedError(
                            "real frame sampling: payload is not AVI/GIF "
                            "(the dependency-free codecs) and av is not "
                            "installed"
                        )
                    import io

                    import av

                    with av.open(io.BytesIO(p)) as c:
                        for idx, frame in enumerate(c.decode(video=0)):
                            if idx % every_n == 0:
                                rows.append(
                                    (
                                        mid,
                                        idx,
                                        hashlib.sha256(
                                            bytes(frame.planes[0])
                                        ).hexdigest()[:16],
                                    )
                                )
                yield pd.DataFrame(
                    rows, columns=["media_id", "frame_idx", "frame_digest"]
                )

        return (
            media.filter(F.col("kind") == "video")
            .select("media_id", "payload")
            .mapInPandas(process_real, schema=out_schema)
        )

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                meta = _fake_decode("video", payload)
                for idx in range(0, meta["n_frames"], every_n):
                    rows.append(
                        (
                            mid,
                            idx,
                            hashlib.sha256(
                                (meta["content_digest"] + str(idx)).encode()
                            ).hexdigest()[:16],
                        )
                    )
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame_digest"])

    return (
        media.filter(F.col("kind") == "video")
        .select("media_id", "payload")
        .mapInPandas(process, schema=out_schema)
    )


# ------------------------------------------------------------- video frames


def decode_video_frames(payload: bytes) -> list:
    """REAL per-frame pixel decode through the dependency-free video
    dispatch: AVI containers (operators/avi_io.py — MJPG pictures via
    the full JPEG codec, uncompressed BI_RGB DIB frames) and animated
    GIF (gif_io.gif_decode_frames — GCE compositing: sub-rects,
    transparency, all three disposal modes). Returns a list of uint8
    arrays, (h, w) gray or (h, w, 3) RGB. MP4 payloads name the PyAV
    gap loudly (the container ships no H.264 codec); anything else
    refuses naming the formats — never silently wrong frames."""
    p = bytes(payload or b"")
    if p[:4] == b"RIFF" and p[8:12] == b"AVI ":
        return avi_io.avi_decode_frames(p)[0]
    if p[:6] in (b"GIF87a", b"GIF89a"):
        return gif_io.gif_decode_frames(p)
    if len(p) >= 12 and p[4:8] == b"ftyp":
        # MP4: Motion-JPEG tracks decode dependency-free (mp4_io walks
        # the full stsd/stsz/stsc/stco sample table); other codings
        # name the codec and the PyAV gap
        fmt = mp4_io.mp4_sample_format(p)
        if fmt in ("jpeg", "mjpa"):
            return mp4_io.mp4_decode_frames(p)[0]
        raise NotImplementedError(
            f"video frame decode: MP4 video coding {fmt!r} needs a codec "
            "library (PyAV), "
            + ("available" if _CODEC_LIBS["av"] else "not installed")
            + " — route through sample_frames(use_real_decoders=True)"
        )
    raise NotImplementedError(
        "video frame decode: payload is not AVI (MJPG / DIB), animated "
        "GIF, or MP4 with Motion-JPEG samples (the dependency-free "
        "video codecs)"
    )


#: video_frame_stats output: frame_digest = sha256 hexdigest of the
#: decoded frame's row-major uint8 pixel bytes — the container- and
#: codec-independent frame identity (the exact-dedup key for frames),
#: mirroring image_pixel_stats' pixel_digest.
VIDEO_FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
        StructField("frame_digest", StringType(), False),
    ]
)


def video_frame_stats(media: DataFrame, every_n: int = 1) -> DataFrame:
    """REAL video frame sampling, dependency-free: each payload's
    frames decode executor-side (decode_video_frames — AVI MJPG/DIB,
    animated GIF) and every `every_n`-th frame emits (media_id,
    frame_idx, width, height, frame_digest). The 1-to-N mapInPandas
    expansion shape of sample_frames, but over REAL pixels: two
    encodings of the same frame get one digest, so downstream
    frame-level dedup/fingerprinting works across containers. At
    scale the payload column moves ONCE into the Python workers per
    partition (Arrow batches); emitted rows carry only scalars, so a
    100 TB video corpus shuffles digests, never pixels. Input:
    (media_id, payload)."""
    import numpy as _np

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, ws, hs, dg = [], [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                frames = decode_video_frames(
                    bytes(payload) if payload is not None else b""
                )
                for fi in range(0, len(frames), every_n):
                    fr = frames[fi]
                    ids.append(mid)
                    idxs.append(fi)
                    hs.append(int(fr.shape[0]))
                    ws.append(int(fr.shape[1]))
                    dg.append(
                        hashlib.sha256(
                            _np.ascontiguousarray(fr).tobytes()
                        ).hexdigest()
                    )
            yield pd.DataFrame(
                {
                    "media_id": pd.array(ids, dtype="int64"),
                    "frame_idx": pd.array(idxs, dtype="int32"),
                    "width": pd.array(ws, dtype="int32"),
                    "height": pd.array(hs, dtype="int32"),
                    "frame_digest": pd.array(dg, dtype=object),
                }
            )

    return media.select("media_id", "payload").mapInPandas(
        process, schema=VIDEO_FRAME_SCHEMA
    )


# ------------------------------------------------------------ audio features

AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("window_idx", IntegerType(), False),
        StructField("rms", IntegerType(), False),  # amplitude units
        StructField("peak", IntegerType(), False),
    ]
)


def _wav_pcm(payload: bytes):
    """(sample_rate, n_channels, int16 samples) for a 16-bit PCM
    RIFF/WAVE payload, or None if not WAV. Compressed/other-depth
    WAVs raise loudly (decoding them as int16 would be silently
    wrong audio)."""
    import struct

    import numpy as np

    parsed = _wav_chunks(payload or b"")
    if parsed is None:
        return None
    fmt_body, data_entry = parsed
    if fmt_body is None or data_entry is None:
        raise ValueError("WAV missing fmt/data chunk")
    data = data_entry[0]
    audio_format, channels, rate, _br, _ba, bits = struct.unpack(
        "<HHIIHH", fmt_body[:16]
    )
    if audio_format in (6, 7, 0x11):
        # compressed encodings the dependency-free tier decodes:
        # G.711 A-law / mu-law and IMA ADPCM (operators/audio_codecs —
        # module-level import so the reference pickles BY VALUE; a
        # function-local import would re-run on workers whose cwd
        # cannot import the package)
        return audio_codecs.wav_decode_compressed(
            fmt_body, data, payload or b""
        )
    if audio_format != 1 or bits != 16:
        raise NotImplementedError(
            f"WAV format {audio_format} / {bits}-bit: only 16-bit PCM, "
            "G.711 mu-law/A-law (7/6) and IMA ADPCM (17) are supported "
            "without codec libraries"
        )
    if channels == 0 or rate == 0:
        # Malformed header: dividing by channels below would crash the
        # task with ZeroDivisionError instead of the module's loud
        # ValueError contract.
        raise ValueError(
            f"WAV fmt declares {channels} channels / {rate} Hz"
        )
    samples = np.frombuffer(
        data[: (len(data) // (2 * channels)) * 2 * channels], dtype="<i2"
    )
    return rate, channels, samples


def _audio_pcm(payload: bytes):
    """(sample_rate, n_channels, int16 samples) for a PCM audio
    payload in either container the dependency-free tier decodes:
    16-bit RIFF/WAVE (_wav_pcm) or 16-bit FLAC (flac_io — lossless,
    CRC+MD5-verified, so the samples are the SAME ones a WAV of the
    clip would carry). None if the payload is neither."""
    import numpy as np

    p = bytes(payload or b"")
    if p[:4] == b"fLaC":
        sr, ch, samples, bps = flac_io.flac_decode(p)
        if bps != 16:
            raise NotImplementedError(
                f"{bps}-bit FLAC: the audio operators' PCM contract "
                "is 16-bit"
            )
        return sr, ch, samples.astype(np.int16)
    return _wav_pcm(p)


def audio_features(
    media: DataFrame, window_ms: int = 100, payload_col: str = "payload"
) -> DataFrame:
    """Per-window energy features from 16-bit PCM WAV payloads: RMS
    and absolute peak amplitude per `window_ms` window after a mean
    mixdown to mono — the silence/clipping signal an audio curation
    pipeline gates on before paying for transcription. Real DSP, no
    codec library: values are exact integer math on the PCM samples
    (RMS floor-rounded), so tests pin them analytically.

    Arrow-batched mapInPandas, one output row per (media, window);
    only media_id and the payload column shuffle in."""
    import math

    out_schema = AUDIO_FEATURES_SCHEMA

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, widx, rms, peak = [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf[payload_col]):
                parsed = _audio_pcm(
                    bytes(payload) if payload is not None else b""
                )
                if parsed is None:
                    raise NotImplementedError(
                        f"audio_features: media {mid} payload is neither "
                        "RIFF/WAVE nor FLAC — the dependency-free audio "
                        "codecs"
                    )
                rate, channels, samples = parsed
                if samples.size == 0:
                    continue
                mono = (
                    samples.reshape(-1, channels).mean(axis=1)
                    if channels > 1
                    else samples.astype(np.float64)
                )
                win = max(1, (rate * window_ms) // 1000)
                n_win = math.ceil(mono.size / win)
                for w in range(n_win):
                    seg = mono[w * win : (w + 1) * win]
                    ids.append(mid)
                    widx.append(w)
                    rms.append(int(math.floor(math.sqrt(float((seg * seg).mean())))))
                    peak.append(int(np.abs(seg).max()))
            yield pd.DataFrame(
                {
                    "media_id": pd.array(ids, dtype="int64"),
                    "window_idx": pd.array(widx, dtype="int32"),
                    "rms": pd.array(rms, dtype="int32"),
                    "peak": pd.array(peak, dtype="int32"),
                }
            )

    return media.select("media_id", payload_col).mapInPandas(
        process, schema=out_schema
    )


SPECTRAL_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("sample_rate", IntegerType(), False),
        StructField("n_frames", IntegerType(), False),
        StructField("dominant_bin", IntegerType(), False),
    ]
)


def audio_spectral(
    media: DataFrame, frame_size: int = 256, payload_col: str = "payload"
) -> DataFrame:
    """Frame-level SPECTRAL analysis of 16-bit PCM WAV payloads — the
    real-DSP tier above audio_features' time-domain energies: mono
    mixdown, non-overlapping `frame_size` frames (tail samples
    dropped — n_frames is the floor), one rfft power spectrum per
    frame (numpy, executor-side), spectra summed over the clip, and
    the clip's DOMINANT BIN = argmax over the summed spectrum with DC
    excluded (ties break to the lowest bin). The dominant bin is
    EXACT for any signal whose strongest component clears the
    quantization-noise floor (a full-scale sine at bin k carries
    ~A²N²/4 in bin k vs O(N) noise elsewhere), which is what lets
    q129's oracle state it ANALYTICALLY — the manifest is derived
    from the generator's math, never from running this code.

    Arrow-batched mapInPandas; the FFT work is numpy over whole
    frames, never per-row Python. Output: (media_id, sample_rate,
    n_frames, dominant_bin)."""
    if frame_size < 4:
        raise ValueError(f"frame_size must be >= 4, got {frame_size}")

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, rates, nfr, dom = [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf[payload_col]):
                parsed = _audio_pcm(
                    bytes(payload) if payload is not None else b""
                )
                if parsed is None:
                    raise NotImplementedError(
                        f"audio_spectral: media {mid} payload is neither "
                        "RIFF/WAVE nor FLAC — the dependency-free audio "
                        "codecs"
                    )
                rate, channels, samples = parsed
                mono = (
                    samples.reshape(-1, channels).mean(axis=1)
                    if channels > 1
                    else samples.astype(np.float64)
                )
                n_frames = mono.size // frame_size
                if n_frames == 0:
                    raise ValueError(
                        f"audio_spectral: media {mid} has {mono.size} "
                        f"samples, shorter than one {frame_size}-frame"
                    )
                frames = mono[: n_frames * frame_size].reshape(
                    n_frames, frame_size
                )
                spec = np.abs(np.fft.rfft(frames, axis=1)) ** 2
                total = spec.sum(axis=0)
                ids.append(mid)
                rates.append(int(rate))
                nfr.append(int(n_frames))
                dom.append(int(total[1:].argmax()) + 1)  # DC excluded
            yield pd.DataFrame(
                {
                    "media_id": pd.array(ids, dtype="int64"),
                    "sample_rate": pd.array(rates, dtype="int32"),
                    "n_frames": pd.array(nfr, dtype="int32"),
                    "dominant_bin": pd.array(dom, dtype="int32"),
                }
            )

    return media.select("media_id", payload_col).mapInPandas(
        process, schema=SPECTRAL_SCHEMA
    )


def wav_encode_pcm16(samples, sample_rate: int, channels: int = 1) -> bytes:
    """Minimal RIFF/WAVE container around int16 PCM samples
    (interleaved when channels > 1) — the fixture generators' tool;
    round-trips through _wav_pcm exactly."""
    import struct

    import numpy as np

    pcm = np.ascontiguousarray(samples, dtype="<i2").tobytes()
    byte_rate = sample_rate * channels * 2
    hdr = b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
    hdr += b"fmt " + struct.pack(
        "<IHHIIHH", 16, 1, channels, sample_rate, byte_rate, channels * 2, 16
    )
    hdr += b"data" + struct.pack("<I", len(pcm))
    return hdr + pcm
