"""Multimodal plumbing tests: the URL-fetch stage (Daft
`.url.download()` parity) against deterministic local fixtures, plus
scheme-error surfacing. The decode/resize/frame stages are exercised
by q43/q48/q49 (rows-only corpus) — fetch gets direct tests because
its failure modes (missing file, bad scheme) never appear there.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from archetype_spark.operators import multimodal


@pytest.fixture()
def fixture_files(tmp_path):
    blobs = {}
    for i in range(4):
        data = f"payload-{i}".encode() * (i + 1)
        p = tmp_path / f"blob_{i}.bin"
        p.write_bytes(data)
        blobs[str(p)] = data
    return blobs


def test_fetch_file_uris(spark, fixture_files):
    media = spark.createDataFrame(
        [(i, f"file://{path}") for i, path in enumerate(sorted(fixture_files))],
        "media_id long, uri string",
    )
    rows = multimodal.fetch_payloads(media).orderBy("media_id").collect()
    for row, path in zip(rows, sorted(fixture_files)):
        want = fixture_files[path]
        assert bytes(row["payload"]) == want
        assert row["fetch_error"] is None


def test_fetch_digest_matches_local(spark, fixture_files):
    path = sorted(fixture_files)[0]
    media = spark.createDataFrame([(1, f"file://{path}")], "media_id long, uri string")
    out = multimodal.fetch_payloads(media).select(
        F.sha2("payload", 256).alias("digest")
    ).collect()[0]
    assert out["digest"] == hashlib.sha256(fixture_files[path]).hexdigest()


def test_fetch_error_modes(spark, tmp_path):
    media = spark.createDataFrame(
        [
            (1, f"file://{tmp_path}/does_not_exist.bin"),
            (2, "synthetic://doc/42"),
            (3, None),
        ],
        "media_id long, uri string",
    )
    rows = {r["media_id"]: r for r in multimodal.fetch_payloads(media).collect()}
    assert rows[1]["payload"] is None and "file error" in rows[1]["fetch_error"]
    assert rows[2]["payload"] is None and "unsupported scheme" in rows[2]["fetch_error"]
    assert rows[3]["payload"] is None and rows[3]["fetch_error"] == "null uri"

    with pytest.raises(Exception, match="fetch_payloads"):
        multimodal.fetch_payloads(media, on_error="error").collect()


def test_fetch_rebinds_existing_payload_column(spark, fixture_files):
    """A media frame that already has a (stale/empty) payload column
    gets it replaced, not duplicated — the lazy-materialization shape:
    schema carries uri, payload appears when fetched."""
    path = sorted(fixture_files)[0]
    media = spark.createDataFrame(
        [(1, f"file://{path}", bytearray(b""))],
        "media_id long, uri string, payload binary",
    )
    out = multimodal.fetch_payloads(media)
    assert out.columns.count("payload") == 1
    row = out.collect()[0]
    assert bytes(row["payload"]) == fixture_files[path]


def _box(btype: bytes, body: bytes) -> bytes:
    import struct

    return struct.pack(">I", 8 + len(body)) + btype + body


def _sample_media() -> dict[str, bytes]:
    """Hand-built minimal payloads: a 4x2 P6 image, a 2-second PCM
    WAV, an MP4 with mvhd/tkhd/stts structure boxes."""
    import struct

    ppm = b"P6\n# test\n4 2\n255\n" + bytes(range(24))
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    wav = (
        b"RIFF" + struct.pack("<I", 36 + 32000) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", 32000) + bytes(32000)
    )
    mvhd = _box(b"mvhd", struct.pack(">B3xII II", 0, 0, 0, 1000, 2500) + bytes(80))
    tkhd_body = struct.pack(">B3x", 0) + bytes(72) + struct.pack(
        ">II", 320 << 16, 240 << 16
    )
    stts = _box(b"stts", struct.pack(">B3xI", 0, 2) + struct.pack(">IIII", 10, 100, 5, 200))
    stbl = _box(b"stbl", stts)
    minf = _box(b"minf", stbl)
    mdia = _box(b"mdia", minf)
    trak = _box(b"trak", _box(b"tkhd", tkhd_body) + mdia)
    moov = _box(b"moov", mvhd + trak)
    mp4 = _box(b"ftyp", b"isom\x00\x00\x00\x00") + moov
    return {"image": ppm, "audio": wav, "video": mp4}


def test_real_decoders_parse_container_formats(spark):
    """The dependency-free real decoders parse actual bytes: PNM dims,
    WAV duration from PCM arithmetic, MP4 duration/dims/frame count
    from structure boxes — end-to-end through the Arrow stage."""
    from archetype_spark.operators import multimodal

    m = _sample_media()
    df = spark.createDataFrame(
        [(1, "image", m["image"]), (2, "audio", m["audio"]), (3, "video", m["video"])],
        "media_id long, kind string, payload binary",
    )
    out = {
        r["media_id"]: r.asDict()
        for r in multimodal.decode_media(df, use_real_decoders=True).collect()
    }
    assert (out[1]["width"], out[1]["height"]) == (4, 2)
    assert out[2]["duration_ms"] == 2000
    assert (out[3]["width"], out[3]["height"]) == (320, 240)
    assert out[3]["duration_ms"] == 2500  # 2500 ticks @ timescale 1000
    assert out[3]["n_frames"] == 15
    # malformed compressed payloads still refuse loudly rather than
    # guess — since r9 a recognized-but-broken JPEG raises the
    # format-specific error from image_probe (no silent fallthrough)
    import pytest

    jpeg = spark.createDataFrame(
        [(9, "image", b"\xff\xd8\xff\xe0junk")],
        "media_id long, kind string, payload binary",
    )
    with pytest.raises(Exception, match="JPEG"):
        multimodal.decode_media(jpeg, use_real_decoders=True).collect()


def test_real_resize_p6_nearest_neighbor(spark):
    """Real P6 resize: nearest-neighbor downsample 4x2 -> 2x1 keeps
    the exact source pixels the index arithmetic selects, re-encoded
    as valid P6."""
    from archetype_spark.operators import multimodal

    ppm = b"P6\n4 2\n255\n" + bytes(range(24))
    df = spark.createDataFrame(
        [(1, ppm)], "media_id long, payload binary"
    )
    out = multimodal.resize_images(
        df, width=2, height=1, use_real_decoders=True
    ).collect()[0]
    assert (out["width"], out["height"]) == (2, 1)
    # ys = [0], xs = [0, 2] -> pixels (0,0) and (0,2) of row 0
    expect = b"P6\n2 1\n255\n" + bytes([0, 1, 2, 6, 7, 8])
    assert bytes(out["payload"]) == expect
    hdr = multimodal._ppm_header(bytes(out["payload"]))
    assert hdr[:3] == (2, 1, 255)


def test_real_resize_jpeg_dependency_free(spark):
    """Real JPEG resize without PIL (r11, operators/jpeg_io.py): a
    baseline JPEG decodes through the stdlib Huffman+IDCT codec,
    nearest-neighbor resizes, and re-encodes as a valid baseline JPEG
    with the target dimensions; pixel values stay within the
    quantization band of the source region."""
    import numpy as np

    from archetype_spark.operators import jpeg_io, multimodal

    x, y = np.meshgrid(np.arange(32), np.arange(16))
    rgb = np.dstack(
        [(x * 4) % 200 + 20, (y * 8) % 200 + 20, ((x + y) * 3) % 200 + 20]
    ).astype(np.uint8)
    payload = jpeg_io.jpeg_encode(rgb, quality_scale=8)
    df = spark.createDataFrame(
        [(1, payload)], "media_id long, payload binary"
    )
    out = multimodal.resize_images(
        df, width=8, height=4, use_real_decoders=True
    ).collect()[0]
    assert (out["width"], out["height"]) == (8, 4)
    resized = jpeg_io.jpeg_decode(bytes(out["payload"]))
    assert resized.shape == (4, 8, 3)
    # nearest-neighbor reference computed outside Spark
    src = jpeg_io.jpeg_decode(payload)
    ys = (np.arange(4) * 16) // 4
    xs = (np.arange(8) * 32) // 8
    want = src[ys][:, xs]
    assert np.abs(resized.astype(int) - want.astype(int)).max() <= 12


def test_image_pixel_stats_container_independent_digest(spark):
    """image_pixel_stats (r11): the pixel digest is the IMAGE's
    identity, not the container's — the same array served as PNG and
    as P6 yields one digest (exact image dedup across re-encodes); a
    unit-quant tile JPEG of a DIFFERENT array yields another; a
    non-image payload refuses loudly."""
    import numpy as np

    from archetype_spark.operators import jpeg_io, multimodal, png_io

    rng = np.random.default_rng(5)
    rgb = rng.integers(0, 256, (6, 10, 3), dtype=np.uint8)
    png = png_io.png_encode(rgb)
    ppm = b"P6\n10 6\n255\n" + np.ascontiguousarray(rgb).tobytes()
    tiles = np.kron(
        np.array([[7, 200], [90, 33]], dtype=np.uint8),
        np.ones((8, 8), np.uint8),
    )
    jpg = jpeg_io.jpeg_encode(tiles, quality_scale=16)
    df = spark.createDataFrame(
        [(1, png), (2, ppm), (3, jpg)], "media_id long, payload binary"
    )
    out = {
        r["media_id"]: r.asDict()
        for r in multimodal.image_pixel_stats(df).collect()
    }
    assert out[1]["pixel_digest"] == out[2]["pixel_digest"]
    assert (out[1]["width"], out[1]["height"], out[1]["n_px"]) == (10, 6, 180)
    import hashlib

    # unit-quant tile JPEG decodes bit-exactly: digest == source array
    assert out[3]["pixel_digest"] == hashlib.sha256(tiles.tobytes()).hexdigest()
    import pytest as _pytest

    # a format none of the codecs decode refuses, naming them
    bad = spark.createDataFrame(
        [(9, b"XZ\x01\x00\x01\x00")], "media_id long, payload binary"
    )
    with _pytest.raises(Exception, match="pixel codecs"):
        multimodal.image_pixel_stats(bad).collect()
    # a payload that SNIFFS as BMP but is malformed fails loudly in
    # the codec (never a silent wrong digest)
    badbmp = spark.createDataFrame(
        [(9, b"BM\x01\x00\x01\x00")], "media_id long, payload binary"
    )
    with _pytest.raises(Exception, match="BM bitmap|truncated"):
        multimodal.image_pixel_stats(badbmp).collect()
    # a TRUNCATED GIF reaches the real decoder (r11) and fails loudly
    # there, never a silent wrong digest
    tgif = spark.createDataFrame(
        [(10, b"GIF89a\x01\x00\x01\x00")], "media_id long, payload binary"
    )
    with _pytest.raises(Exception, match="GIF"):
        multimodal.image_pixel_stats(tgif).collect()


def test_malformed_payloads_degrade_not_crash(spark):
    """ADVICE r7: payloads truncated inside a chunk/box must parse to
    None (-> the loud NotImplementedError path), never crash the task
    with struct.error/IndexError."""
    import struct

    from archetype_spark.operators import multimodal

    m = _sample_media()
    # WAV truncated inside the fmt chunk: 18 bytes after the chunk id
    trunc_wav = m["audio"][:30]
    assert multimodal._wav_info(trunc_wav) is None
    # MP4 truncated mid-mvhd and mid-stts
    for cut in (20, 40, 60, len(m["video"]) - 5):
        assert multimodal._mp4_info(m["video"][:cut]) in (
            None,
        ) or isinstance(multimodal._mp4_info(m["video"][:cut]), tuple)
    # an stts whose entry count exceeds its body must return None,
    # not unpack garbage
    bad_stts = _box(b"stts", struct.pack(">B3xI", 0, 999))
    bad = _box(b"ftyp", b"isom\x00\x00\x00\x00") + _box(
        b"moov",
        _box(b"mvhd", struct.pack(">B3xII II", 0, 0, 0, 1000, 2500) + bytes(80))
        + _box(b"trak", _box(b"mdia", _box(b"minf", _box(b"stbl", bad_stts)))),
    )
    assert multimodal._mp4_info(bad) is None
    # end-to-end: the degrade surfaces as the loud guard, not a crash
    import pytest as _pytest

    df = spark.createDataFrame(
        [(1, "audio", trunc_wav)], "media_id long, kind string, payload binary"
    )
    with _pytest.raises(Exception, match="not RIFF/WAVE"):
        multimodal.decode_media(df, use_real_decoders=True).collect()


def test_p6_resize_refuses_wide_samples(spark):
    """ADVICE r7: P6 with maxval > 255 has 2-byte samples; resize must
    refuse loudly instead of silently misreading pixels."""
    import pytest as _pytest

    from archetype_spark.operators import multimodal

    wide = b"P6\n2 1\n65535\n" + bytes(12)
    df = spark.createDataFrame([(1, wide)], "media_id long, payload binary")
    with _pytest.raises(Exception, match="maxval > 255"):
        multimodal.resize_images(
            df, width=1, height=1, use_real_decoders=True
        ).collect()
    trunc = b"P6\n4 2\n255\n" + bytes(5)
    df2 = spark.createDataFrame([(1, trunc)], "media_id long, payload binary")
    with _pytest.raises(Exception, match="raster truncated"):
        multimodal.resize_images(
            df2, width=1, height=1, use_real_decoders=True
        ).collect()


_needs_pil = pytest.mark.skipif(
    not multimodal._CODEC_LIBS["pil"], reason="PIL not installed"
)
_needs_av = pytest.mark.skipif(
    not multimodal._CODEC_LIBS["av"], reason="av not installed"
)


@_needs_pil
def test_pil_decode_and_resize_png(spark):
    """When PIL exists, compressed-format decode/resize routes through
    it (runs only in containers with PIL — the conditional-codec seam
    is proven the day the dependency appears)."""
    import io

    import PIL.Image

    buf = io.BytesIO()
    PIL.Image.new("RGB", (6, 4), (10, 20, 30)).save(buf, format="PNG")
    png = buf.getvalue()
    df = spark.createDataFrame(
        [(1, "image", png)], "media_id long, kind string, payload binary"
    )
    out = multimodal.decode_media(df, use_real_decoders=True).collect()[0]
    assert (out["width"], out["height"]) == (6, 4)
    rdf = spark.createDataFrame([(1, png)], "media_id long, payload binary")
    rout = multimodal.resize_images(
        rdf, width=3, height=2, use_real_decoders=True
    ).collect()[0]
    with PIL.Image.open(io.BytesIO(bytes(rout["payload"]))) as im:
        assert (im.width, im.height) == (3, 2)


@_needs_av
def test_av_decode_routes_through_pyav(spark):
    """When PyAV exists, non-MP4 audio/video probes route through it."""
    assert multimodal._av_media_info(b"\x00\x00") is None  # junk -> None


def test_mp4_zero_extended_size_terminates():
    """Review r8: a 64-bit box size smaller than its own 16-byte
    header must terminate parsing (None), never loop the task."""
    import struct

    bad = (
        _box(b"ftyp", b"isom\x00\x00\x00\x00")
        + struct.pack(">I", 1)
        + b"moov"
        + struct.pack(">Q", 0)
    )
    assert multimodal._mp4_info(bad) is None
    bad15 = (
        _box(b"ftyp", b"isom\x00\x00\x00\x00")
        + struct.pack(">I", 1)
        + b"moov"
        + struct.pack(">Q", 15)
    )
    assert multimodal._mp4_info(bad15) is None


def test_wav_lying_fmt_size_degrades():
    """Review r8: a fmt chunk DECLARING fewer than 12 body bytes must
    parse to None (reading byte_rate there would read the next
    chunk's bytes — a silent wrong duration)."""
    import struct

    lying = (
        b"RIFF" + struct.pack("<I", 100) + b"WAVE"
        + b"fmt " + struct.pack("<I", 4) + bytes(4)
        + b"data" + struct.pack("<I", 8) + bytes(8)
    )
    assert multimodal._wav_info(lying) is None


# ------------------------------------------------------------- PNG codec


def _png_filter_forward(img, bpp, filters):
    """Independent forward filtering per the PNG spec (test-side
    reference: the decoder must invert THIS, not its own logic)."""
    import numpy as np

    h, stride = img.shape
    out = []
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        cur = img[y].astype(np.int32)
        ftype = filters[y % len(filters)]
        enc = np.zeros(stride, dtype=np.int32)
        for x in range(stride):
            a = cur[x - bpp] if x >= bpp else 0
            b = prev[x]
            c = prev[x - bpp] if x >= bpp else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
            enc[x] = (cur[x] - pred) & 0xFF
        out.append(bytes([ftype]) + enc.astype(np.uint8).tobytes())
        prev = cur
    return b"".join(out)


def test_png_roundtrip_all_channel_counts():
    import numpy as np

    from archetype_spark.operators import png_io

    rng = np.random.default_rng(7)
    for ch in (1, 2, 3, 4):
        arr = rng.integers(0, 256, (13, 9, ch), dtype=np.uint8)
        enc = png_io.png_encode(arr)
        assert png_io.png_info(enc) == (9, 13)
        dec = png_io.png_decode(enc)
        assert dec.shape == (13, 9, ch)
        assert (dec == arr).all()


def test_png_decoder_inverts_every_filter_type():
    """Build a PNG whose scanlines cycle through filters 0-4 using an
    INDEPENDENT forward-filter implementation; the decoder must
    recover the exact pixels."""
    import struct
    import zlib

    import numpy as np

    from archetype_spark.operators import png_io

    rng = np.random.default_rng(11)
    w, h, ch = 16, 10, 3
    img = rng.integers(0, 256, (h, w * ch), dtype=np.uint8)
    raw = _png_filter_forward(img, ch, filters=[0, 1, 2, 3, 4])
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    payload = (
        b"\x89PNG\r\n\x1a\n"
        + png_io._chunk(b"IHDR", ihdr)
        + png_io._chunk(b"IDAT", zlib.compress(raw))
        + png_io._chunk(b"IEND", b"")
    )
    dec = png_io.png_decode(payload)
    assert (dec.reshape(h, w * ch) == img).all()


def test_png_palette_and_trns():
    import struct
    import zlib

    import numpy as np

    from archetype_spark.operators import png_io

    w, h = 4, 2
    palette = np.array(
        [[255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8
    )
    idx = np.array([[0, 1, 2, 0], [2, 2, 1, 0]], dtype=np.uint8)
    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0)

    def build(with_trns):
        chunks = png_io._chunk(b"IHDR", ihdr) + png_io._chunk(
            b"PLTE", palette.tobytes()
        )
        if with_trns:
            chunks += png_io._chunk(b"tRNS", bytes([10, 20]))
        chunks += png_io._chunk(b"IDAT", zlib.compress(raw)) + png_io._chunk(
            b"IEND", b""
        )
        return b"\x89PNG\r\n\x1a\n" + chunks

    rgb = png_io.png_decode(build(False))
    assert rgb.shape == (h, w, 3)
    assert (rgb == palette[idx]).all()
    rgba = png_io.png_decode(build(True))
    assert rgba.shape == (h, w, 4)
    # entries beyond the tRNS table default to opaque 255
    assert (rgba[:, :, 3] == np.array([10, 20, 255])[idx]).all()


def test_png_refusals_are_loud():
    import struct
    import zlib

    import numpy as np
    import pytest

    from archetype_spark.operators import png_io

    arr = np.zeros((2, 2, 3), dtype=np.uint8)
    good = png_io.png_encode(arr)
    # interlaced flag
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 1)
    bad = (
        b"\x89PNG\r\n\x1a\n"
        + png_io._chunk(b"IHDR", ihdr)
        + png_io._chunk(b"IDAT", zlib.compress(b"\x00" * 14))
        + png_io._chunk(b"IEND", b"")
    )
    with pytest.raises(NotImplementedError, match="interlac"):
        png_io.png_decode(bad)
    # 16-bit depth
    ihdr16 = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
    bad16 = (
        b"\x89PNG\r\n\x1a\n"
        + png_io._chunk(b"IHDR", ihdr16)
        + png_io._chunk(b"IDAT", zlib.compress(b"\x00" * 26))
        + png_io._chunk(b"IEND", b"")
    )
    with pytest.raises(NotImplementedError, match="bit depth"):
        png_io.png_decode(bad16)
    # not a PNG
    assert png_io.png_info(b"nope") is None
    with pytest.raises(ValueError, match="signature"):
        png_io.png_decode(b"nope")
    # truncated pixel data
    trunc = good[:-20]
    with pytest.raises(ValueError):
        png_io.png_decode(trunc)


def test_real_decode_and_resize_png_payloads(spark):
    """The real-decoder tier handles PNG end-to-end through the
    Arrow-batched operators: decode_media reports true dims and
    resize_images produces a decodable PNG with exact
    nearest-neighbor pixels — no codec library involved."""
    import numpy as np

    from archetype_spark.operators import png_io
    from archetype_spark.operators.multimodal import (
        decode_media,
        resize_images,
    )

    rng = np.random.default_rng(3)
    rows = []
    arrays = {}
    for i in range(3):
        arr = rng.integers(0, 256, (8 + i, 6 + i, 3), dtype=np.uint8)
        arrays[i] = arr
        payload = png_io.png_encode(arr)
        rows.append((i, "image", None, bytearray(payload), len(payload)))
    media = spark.createDataFrame(
        rows,
        "media_id long, kind string, uri string, payload binary, n_bytes long",
    )
    dec = {
        r["media_id"]: (r["width"], r["height"])
        for r in decode_media(media, use_real_decoders=True).collect()
    }
    assert dec == {0: (6, 8), 1: (7, 9), 2: (8, 10)}

    res = resize_images(media, width=4, height=4, use_real_decoders=True)
    for r in res.collect():
        out = png_io.png_decode(bytes(r["payload"]))
        src = arrays[r["media_id"]]
        h0, w0 = src.shape[0], src.shape[1]
        ys = (np.arange(4) * h0) // 4
        xs = (np.arange(4) * w0) // 4
        assert (out == src[ys][:, xs]).all()


def test_image_probe_dims_hand_built_headers():
    """Marker/header dims for the compressed formats, against
    hand-built minimal payloads with known dimensions."""
    import struct

    import pytest

    from archetype_spark.operators import image_probe

    # JPEG: SOI + APP0 (stub) + SOF0 with h=31, w=77
    app0 = b"\xff\xe0" + struct.pack(">H", 4) + b"xx"
    sof0 = b"\xff\xc0" + struct.pack(">H", 11) + bytes([8]) + struct.pack(
        ">HH", 31, 77
    ) + bytes([1, 0x11, 0x11, 0])
    jpg = b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"
    assert image_probe.jpeg_dims(jpg) == (77, 31)
    assert image_probe.probe_dims(jpg) == (77, 31)
    # progressive SOF2 also parses
    jpg2 = jpg.replace(b"\xff\xc0", b"\xff\xc2")
    assert image_probe.jpeg_dims(jpg2) == (77, 31)
    with pytest.raises(ValueError, match="SOF"):
        image_probe.jpeg_dims(b"\xff\xd8" + app0 + b"\xff\xd9")

    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00" * 3
    assert image_probe.probe_dims(gif) == (320, 200)

    bmp = (
        b"BM" + b"\x00" * 12 + struct.pack("<I", 40)
        + struct.pack("<ii", 640, -480) + b"\x00" * 4
    )
    assert image_probe.probe_dims(bmp) == (640, 480)  # top-down height
    # OS/2 BITMAPCOREHEADER: 12-byte DIB header, uint16 dims — an
    # int32 read at offset 18 would pack w|h into one field
    core = b"BM" + b"\x00" * 12 + struct.pack("<IHHHH", 12, 100, 50, 1, 24)
    assert image_probe.probe_dims(core) == (100, 50)
    with pytest.raises(ValueError, match="DIB header"):
        image_probe.bmp_dims(b"BM" + b"\x00" * 12 + struct.pack("<I", 16) + b"\x00" * 8)
    # JPEG 0xFF fill bytes before a marker are legal: still parses
    filled = jpg.replace(b"\xff\xc0", b"\xff\xff\xff\xc0")
    assert image_probe.jpeg_dims(filled) == (77, 31)

    def riff(chunk, body):
        return b"RIFF" + struct.pack("<I", 4 + 8 + len(body)) + b"WEBP" + chunk + struct.pack("<I", len(body)) + body

    vp8x = riff(b"VP8X", b"\x00" * 4 + (99).to_bytes(3, "little") + (49).to_bytes(3, "little"))
    assert image_probe.probe_dims(vp8x) == (100, 50)
    bits = (119) | (59 << 14)  # w-1=119, h-1=59
    vp8l = riff(b"VP8L", b"\x2f" + struct.pack("<I", bits))
    assert image_probe.probe_dims(vp8l) == (120, 60)
    vp8 = riff(b"VP8 ", b"\x00" * 3 + b"\x9d\x01\x2a" + struct.pack("<HH", 33, 44))
    assert image_probe.probe_dims(vp8) == (33, 44)

    assert image_probe.probe_dims(b"not an image") is None


def test_real_decode_probes_jpeg_dims(spark):
    import struct

    from archetype_spark.operators.multimodal import decode_media

    app0 = b"\xff\xe0" + struct.pack(">H", 4) + b"xx"
    sof0 = b"\xff\xc0" + struct.pack(">H", 11) + bytes([8]) + struct.pack(
        ">HH", 240, 320
    ) + bytes([1, 0x11, 0x11, 0])
    jpg = b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"
    media = spark.createDataFrame(
        [(0, "image", None, bytearray(jpg), len(jpg))],
        "media_id long, kind string, uri string, payload binary, n_bytes long",
    )
    row = decode_media(media, use_real_decoders=True).collect()[0]
    assert (row["width"], row["height"]) == (320, 240)


def _wav_bytes(rate, channels, samples_int16):
    """Minimal valid RIFF/WAVE wrapper around raw 16-bit PCM."""
    import struct

    import numpy as np

    data = np.asarray(samples_int16, dtype="<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * 2 * channels, 2 * channels, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_audio_features_analytic_values(spark):
    """RMS/peak per window from real PCM arithmetic: a constant
    amplitude-1000 signal has rms == peak == 1000 in every window; a
    stereo pair (+2000, -2000) mixes down to 0; a half-window tail
    still emits its window."""
    import numpy as np

    from archetype_spark.operators.multimodal import audio_features

    rate = 1000  # 1 kHz -> 100 ms windows = 100 samples
    const = np.full(250, 1000, dtype=np.int16)  # 2.5 windows
    stereo = np.empty(200 * 2, dtype=np.int16)
    stereo[0::2] = 2000
    stereo[1::2] = -2000
    media = spark.createDataFrame(
        [
            (1, bytearray(_wav_bytes(rate, 1, const))),
            (2, bytearray(_wav_bytes(rate, 2, stereo))),
        ],
        "media_id long, payload binary",
    )
    rows = audio_features(media, window_ms=100).collect()
    got = {(r["media_id"], r["window_idx"]): (r["rms"], r["peak"]) for r in rows}
    assert got[(1, 0)] == (1000, 1000)
    assert got[(1, 1)] == (1000, 1000)
    assert got[(1, 2)] == (1000, 1000)  # 50-sample tail window
    assert len([k for k in got if k[0] == 1]) == 3
    # stereo mean mixdown cancels to silence
    assert got[(2, 0)] == (0, 0)
    assert got[(2, 1)] == (0, 0)


def test_audio_features_refusals(spark):
    import pytest

    from archetype_spark.operators.multimodal import audio_features

    not_wav = spark.createDataFrame(
        [(9, bytearray(b"not audio"))], "media_id long, payload binary"
    )
    with pytest.raises(Exception, match="RIFF/WAVE"):
        audio_features(not_wav).collect()
    # 8-bit WAV: loud, not silently-wrong int16 parsing
    import struct

    fmt8 = struct.pack("<HHIIHH", 1, 1, 1000, 1000, 1, 8)
    body = (
        b"WAVE" + b"fmt " + struct.pack("<I", len(fmt8)) + fmt8
        + b"data" + struct.pack("<I", 4) + b"\x01\x02\x03\x04"
    )
    w8 = b"RIFF" + struct.pack("<I", len(body)) + body
    bad = spark.createDataFrame(
        [(8, bytearray(w8))], "media_id long, payload binary"
    )
    with pytest.raises(Exception, match="16-bit PCM"):
        audio_features(bad).collect()


def test_png_colorkey_trns_materializes_alpha():
    """tRNS on gray/RGB images is a transparent-color key: the decode
    materializes the alpha channel (dropping it would silently change
    pixels). Keys are u16 per channel; a key above 255 can match no
    8-bit sample, so everything stays opaque."""
    import struct
    import zlib

    import numpy as np

    from archetype_spark.operators import png_io

    px = np.array([[[10, 20, 30], [1, 2, 3]]], dtype=np.uint8)  # 1x2 RGB
    raw = b"\x00" + px.reshape(-1).tobytes()
    ihdr = struct.pack(">IIBBBBB", 2, 1, 8, 2, 0, 0, 0)

    def build(keys):
        trns = struct.pack(">HHH", *keys)
        return (
            b"\x89PNG\r\n\x1a\n"
            + png_io._chunk(b"IHDR", ihdr)
            + png_io._chunk(b"tRNS", trns)
            + png_io._chunk(b"IDAT", zlib.compress(raw))
            + png_io._chunk(b"IEND", b"")
        )

    dec = png_io.png_decode(build((10, 20, 30)))
    assert dec.shape == (1, 2, 4)
    assert list(dec[0, 0]) == [10, 20, 30, 0]  # keyed pixel transparent
    assert list(dec[0, 1]) == [1, 2, 3, 255]
    # key beyond 8-bit range: opaque everywhere
    dec2 = png_io.png_decode(build((300, 20, 30)))
    assert (dec2[:, :, 3] == 255).all()


def test_wav_zero_channels_raises_loudly():
    """A malformed fmt chunk declaring 0 channels must hit the loud
    ValueError path, not a ZeroDivisionError mid-task (ADVICE r9)."""
    import struct

    import pytest as _pytest

    from archetype_spark.operators.multimodal import _wav_pcm

    fmt = struct.pack("<HHIIHH", 1, 0, 8000, 0, 0, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", 4) + b"\x00\x00\x00\x00"
    )
    wav = b"RIFF" + struct.pack("<I", len(body)) + body
    with _pytest.raises(ValueError, match="0 channels"):
        _wav_pcm(wav)


def test_audio_spectral_analytic_tones(spark):
    """Exact-bin sinusoids: dominant_bin == the generating bin, for
    mono AND stereo (mixdown preserves the tone), with ragged tails
    dropped (n_frames = floor). A two-tone clip picks the stronger;
    Parseval sanity: the tone bin carries >99% of the energy."""
    import numpy as np

    from archetype_spark.operators import multimodal

    n, sr = 256, 8000
    t = np.arange(6 * n)
    tone17 = np.round(12000 * np.sin(2 * np.pi * 17 * t / n)).astype("<i2")
    stereo = np.column_stack([tone17, tone17]).reshape(-1)
    two = np.round(
        9000 * np.sin(2 * np.pi * 31 * t / n)
        + 4000 * np.sin(2 * np.pi * 80 * t / n)
    ).astype("<i2")
    ragged = np.round(
        11000 * np.sin(2 * np.pi * 5 * np.arange(3 * n + 99) / n)
    ).astype("<i2")
    rows = [
        (0, multimodal.wav_encode_pcm16(tone17, sr)),
        (1, multimodal.wav_encode_pcm16(stereo, sr, channels=2)),
        (2, multimodal.wav_encode_pcm16(two, sr)),
        (3, multimodal.wav_encode_pcm16(ragged, sr)),
    ]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {
        r["media_id"]: (r["n_frames"], r["dominant_bin"])
        for r in multimodal.audio_spectral(media, frame_size=n).collect()
    }
    assert got == {0: (6, 17), 1: (6, 17), 2: (6, 31), 3: (3, 5)}
    # energy concentration (Parseval sanity, numpy-side)
    spec = np.abs(np.fft.rfft(tone17[:n].astype(float))) ** 2
    assert spec[17] / spec.sum() > 0.99


def test_audio_spectral_refusals(spark):
    import numpy as np
    import pytest as _pytest

    from archetype_spark.operators import multimodal

    short = multimodal.wav_encode_pcm16(
        np.zeros(100, dtype="<i2"), 8000
    )
    m = spark.createDataFrame(
        [(0, short)], "media_id long, payload binary"
    )
    with _pytest.raises(Exception, match="shorter than one"):
        multimodal.audio_spectral(m, frame_size=256).collect()
    notwav = spark.createDataFrame(
        [(1, b"OggS....")], "media_id long, payload binary"
    )
    with _pytest.raises(Exception, match="RIFF/WAVE"):
        multimodal.audio_spectral(notwav).collect()


def test_image_dhash_definition_and_near_dup(spark):
    """dhash pins: the documented definition on a hand-built gradient
    (independent loop derivation), invariance across containers of
    the SAME pixels, small-perturbation closeness, and the sign-bit
    round trip through a Spark BIGINT."""
    import numpy as np

    from archetype_spark.operators import bmp_io, multimodal, png_io

    # hand-check: strictly increasing rows -> every gradient bit set
    inc = np.tile(np.arange(0, 90, 10, dtype=np.uint8), (8, 1))
    assert multimodal.image_dhash_int(inc) == -1  # all 64 bits (signed)
    dec = inc[:, ::-1].copy()
    assert multimodal.image_dhash_int(dec) == 0
    # independent loop derivation agrees on a random RGB image
    rng = np.random.default_rng(5)
    px = rng.integers(0, 256, (15, 21, 3), dtype=np.uint8)
    v = 0
    for r in range(8):
        row = []
        for c in range(9):
            y, x = (r * 15) // 8, (c * 21) // 9
            row.append(int(px[y, x].astype(int).sum()) // 3)
        for c in range(8):
            if row[c + 1] > row[c]:
                v |= 1 << (r * 8 + c)
    v = v - (1 << 64) if v & (1 << 63) else v
    assert multimodal.image_dhash_int(px) == v
    # container invariance + near-dup through the Spark face
    perturbed = px.copy()
    perturbed[(3 * 15) // 8, (4 * 21) // 9] = (255, 255, 255)
    media = spark.createDataFrame(
        [
            (0, bytearray(png_io.png_encode(px))),
            (1, bytearray(bmp_io.bmp_encode(px))),
            (2, bytearray(png_io.png_encode(perturbed))),
        ],
        "media_id long, payload binary",
    )
    rows = multimodal.image_dhash(media).orderBy("media_id").collect()
    assert rows[0].dhash == rows[1].dhash == v
    ham = bin((rows[0].dhash ^ rows[2].dhash) & ((1 << 64) - 1)).count("1")
    assert 0 < ham <= 3
    assert (rows[0].width, rows[0].height) == (21, 15)


def test_video_frame_stats_real_decode(spark):
    """video_frame_stats: AVI (MJPG + DIB) and animated-GIF payloads
    decode to REAL frames executor-side; digests equal the source
    arrays' (MJPG exact via unit-DC-quant tiles), and every_n
    samples by frame index."""
    import hashlib as _hl

    import numpy as np

    from archetype_spark.operators import avi_io, gif_io, multimodal

    def tile(fi):
        vals = np.array(
            [[(13 * fi + 11 * r + 23 * c + 7) % 251 for c in range(3)]
             for r in range(2)],
            dtype=np.uint8,
        )
        return np.kron(vals, np.ones((8, 8), dtype=np.uint8))

    mj = [tile(fi) for fi in range(4)]
    rng = np.random.default_rng(31)
    db = [rng.integers(0, 256, (5, 6, 3), dtype=np.uint8) for _ in range(3)]
    pal = rng.integers(0, 256, (8, 3), dtype=np.uint8)
    g = [
        {"indices": rng.integers(0, 8, (4, 6), dtype=np.uint8), "disposal": 1}
        for _ in range(3)
    ]
    payloads = {
        0: avi_io.avi_encode(mj, codec="MJPG"),
        1: avi_io.avi_encode(db, codec="DIB"),
        2: gif_io.gif_encode_frames(g, pal, (6, 4), bg_index=0),
    }
    df = spark.createDataFrame(
        [(mid, bytearray(p)) for mid, p in payloads.items()],
        "media_id long, payload binary",
    )
    out = {
        (r.media_id, r.frame_idx): r
        for r in multimodal.video_frame_stats(df, every_n=2).collect()
    }
    # sampling: frames 0 and 2 of each (mjpg also has idx 2; db 0,2; gif 0,2)
    assert set(out) == {(0, 0), (0, 2), (1, 0), (1, 2), (2, 0), (2, 2)}
    for fi in (0, 2):
        assert (
            out[(0, fi)].frame_digest
            == _hl.sha256(np.ascontiguousarray(mj[fi]).tobytes()).hexdigest()
        )
        assert (
            out[(1, fi)].frame_digest
            == _hl.sha256(np.ascontiguousarray(db[fi]).tobytes()).hexdigest()
        )
    assert out[(0, 0)].width == 24 and out[(0, 0)].height == 16
    # GIF frames: full-canvas composite (disposal none) == raw frames
    exp2 = pal[g[2]["indices"]]
    assert (
        out[(2, 2)].frame_digest
        == _hl.sha256(np.ascontiguousarray(exp2).tobytes()).hexdigest()
    )


def test_sample_frames_real_tier_dependency_free(spark):
    """sample_frames(use_real_decoders=True) handles AVI/GIF without
    PyAV (the dependency-free tier) and still refuses loudly for
    payloads only a codec library could open."""
    import numpy as np
    import pytest as _pytest

    from archetype_spark.operators import avi_io, multimodal

    frames = [np.full((2, 2), v, dtype=np.uint8) for v in (10, 20, 30)]
    payload = avi_io.avi_encode(frames, codec="DIB")
    df = spark.createDataFrame(
        [(7, bytearray(payload), "video")],
        "media_id long, payload binary, kind string",
    )
    rows = multimodal.sample_frames(
        df, every_n=2, use_real_decoders=True
    ).collect()
    assert [(r.media_id, r.frame_idx) for r in rows] == [(7, 0), (7, 2)]
    if not multimodal._CODEC_LIBS["av"]:
        bad = spark.createDataFrame(
            [(8, bytearray(b"\x00" * 32), "video")],
            "media_id long, payload binary, kind string",
        )
        with _pytest.raises(Exception, match="not AVI/GIF"):
            multimodal.sample_frames(
                bad, every_n=1, use_real_decoders=True
            ).collect()


def test_decode_video_frames_refusals():
    import pytest as _pytest

    from archetype_spark.operators import multimodal

    with _pytest.raises(NotImplementedError, match="not AVI"):
        multimodal.decode_video_frames(b"\x89PNG....")
    # a minimal MP4 ftyp box names the PyAV gap, not a generic error
    mp4 = bytes.fromhex("0000001466747970") + b"isom" + bytes(4)
    with _pytest.raises(NotImplementedError, match="PyAV"):
        multimodal.decode_video_frames(mp4)
