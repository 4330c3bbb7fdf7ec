"""MP4 Motion-JPEG sample extraction (operators/mp4_io.py): the full
ISO-BMFF sample-table walk (stsd/stsz/stsc/stco incl. multi-chunk
runs and co64), round-trips exact by the unit-DC-quant tile argument,
interop with multimodal's structural probe, and loud refusals for
non-JPEG codings."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from archetype_spark.operators import multimodal
from archetype_spark.operators.mp4_io import (
    mp4_decode_frames,
    mp4_encode_mjpeg,
    mp4_sample_format,
)


def _tile(fi: int, th: int = 2, tw: int = 3) -> np.ndarray:
    vals = np.array(
        [
            [(13 * fi + 11 * r + 23 * c + 7) % 251 for c in range(tw)]
            for r in range(th)
        ],
        dtype=np.uint8,
    )
    return np.kron(vals, np.ones((8, 8), dtype=np.uint8))


def test_roundtrip_exact_and_meta():
    frames = [_tile(i) for i in range(6)]
    payload = mp4_encode_mjpeg(frames, fps=30)
    assert mp4_sample_format(payload) == "jpeg"
    dec, meta = mp4_decode_frames(payload)
    assert meta == {
        "width": 24, "height": 16, "fps_num": 30, "fps_den": 1,
        "n_frames": 6, "handler": "jpeg",
    }
    for a, b in zip(frames, dec):
        assert np.array_equal(a, b)
    # the structural probe (decode-probe tier) reads the same headers
    assert multimodal._mp4_info(payload) == (24, 16, 200, 6)


def test_video_frame_dispatch_decodes_mp4():
    frames = [_tile(i, 2, 2) for i in range(4)]
    payload = mp4_encode_mjpeg(frames, fps=24)
    dec = multimodal.decode_video_frames(payload)
    assert len(dec) == 4
    assert np.array_equal(dec[3], frames[3])


def test_multi_chunk_stsc_expansion():
    """Samples split 2+2+1 across three chunks: the stsc table gets
    TWO runs (chunks 1-2 at 2 samples, chunk 3 at 1) and the walk
    must expand runs over the chunk list, not assume one chunk."""
    frames = [_tile(i, 2, 2) for i in range(5)]
    payload = mp4_encode_mjpeg(frames, fps=24, samples_per_chunk=2)
    import archetype_spark.operators.mp4_io as m

    stbl, _ts = m._video_stbl(payload)
    stco = m._find(payload, [b"stco"], *stbl)
    (n_chunks,) = struct.unpack(
        ">I", payload[stco[0] + 4 : stco[0] + 8]
    )
    assert n_chunks == 3
    stsc = m._find(payload, [b"stsc"], *stbl)
    (n_runs,) = struct.unpack(">I", payload[stsc[0] + 4 : stsc[0] + 8])
    assert n_runs == 2
    dec, meta = mp4_decode_frames(payload)
    assert meta["n_frames"] == 5
    for a, b in zip(frames, dec):
        assert np.array_equal(a, b)


def test_refusals_are_loud():
    with pytest.raises(ValueError, match="not an MP4"):
        mp4_decode_frames(b"RIFF....AVI ")
    assert mp4_sample_format(b"GIF89a") is None
    # an avc1-coded track names the codec and the PyAV gap
    frames = [_tile(0, 2, 2)]
    payload = bytearray(mp4_encode_mjpeg(frames))
    i = payload.find(b"jpeg", payload.find(b"stsd"))
    payload[i : i + 4] = b"avc1"
    assert mp4_sample_format(bytes(payload)) == "avc1"
    with pytest.raises(NotImplementedError, match="avc1"):
        mp4_decode_frames(bytes(payload))
    with pytest.raises(NotImplementedError, match="avc1"):
        multimodal.decode_video_frames(bytes(payload))
    with pytest.raises(ValueError, match="at least one frame"):
        mp4_encode_mjpeg([])


def test_co64_offsets():
    """64-bit chunk offsets (the >4 GB layout): same samples, co64
    instead of stco — the reader's width-64 branch."""
    frames = [_tile(i, 2, 2) for i in range(4)]
    payload = mp4_encode_mjpeg(
        frames, fps=24, samples_per_chunk=2, use_co64=True
    )
    assert b"co64" in payload and b"stco" not in payload
    dec, meta = mp4_decode_frames(payload)
    assert meta["n_frames"] == 4
    for a, b in zip(frames, dec):
        assert np.array_equal(a, b)


def test_size_zero_final_mdat():
    """ISO-BMFF allows a final box with size 0 = 'extends to end of
    file' (streaming writers' trailing mdat, moov written first).
    Rebuild the encoder's ftyp+mdat+moov layout into that shape and
    pin that probe + decode still work."""
    frames = [_tile(i, 2, 2) for i in range(3)]
    payload = mp4_encode_mjpeg(frames, fps=24)
    (ftyp_sz,) = struct.unpack(">I", payload[:4])
    ftyp = payload[:ftyp_sz]
    (mdat_sz,) = struct.unpack(">I", payload[ftyp_sz : ftyp_sz + 4])
    mdat_body = payload[ftyp_sz + 8 : ftyp_sz + mdat_sz]
    moov = payload[ftyp_sz + mdat_sz :]
    # chunk offsets shift by the moov now sitting before the mdat;
    # single chunk, so the old stco body is a unique byte pattern
    old_off = ftyp_sz + 8
    old_stco = struct.pack(">III", 0, 1, old_off)
    new_stco = struct.pack(">III", 0, 1, old_off + len(moov))
    assert moov.count(old_stco) == 1
    moov = moov.replace(old_stco, new_stco)
    stream = ftyp + moov + struct.pack(">I", 0) + b"mdat" + mdat_body
    assert mp4_sample_format(stream) == "jpeg"
    dec, meta = mp4_decode_frames(stream)
    assert meta["n_frames"] == 3
    for a, b in zip(frames, dec):
        assert np.array_equal(a, b)
