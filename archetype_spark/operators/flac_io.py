"""Dependency-free FLAC codec (stdlib + numpy) — the compressed
sibling of the PCM-WAV audio path, closing the audio slice the same
way jpeg_io/vp8_io closed images (the reference ingests media through
Daft columns, reference pyproject.toml:7-8; real speech corpora —
LibriSpeech and kin — ship FLAC, so an audio curation pipeline that
only reads WAV never sees production data).

Implements the PUBLIC FLAC format (RFC 9639):

- decode: `fLaC` stream marker + metadata blocks (STREAMINFO parsed,
  others skipped), frame headers (sync, blocking strategy, coded
  frame/sample number, block-size/sample-rate/sample-size codes incl.
  the uncommon-value extras, CRC-8 verified), ALL subframe types —
  CONSTANT, VERBATIM, FIXED orders 0-4, LPC orders 1-32 with
  quantized-coefficient prediction — wasted-bits, both Rice residual
  methods (4- and 5-bit parameters) including the raw-bitwidth
  escape, the three stereo decorrelations (left-side, right-side,
  mid-side; side channels carry the +1 bit the spec assigns), frame
  CRC-16 verified, and the STREAMINFO MD5 of the decoded PCM verified
  when present — a desync can NOT produce silently wrong audio.
- encode: an exact lossless writer for fixtures/round trips — per
  block the cheapest of CONSTANT / FIXED order 0-2 (Rice-coded
  residuals, single partition, best 4-bit parameter) / VERBATIM,
  optional left-side or mid-side decorrelation for stereo, true
  CRCs and the STREAMINFO MD5. Losslessness is by construction
  (every subframe type reproduces samples exactly), so
  decode(encode(pcm)) == pcm bit-for-bit for any int16 input.

Decode cost is O(samples) pure Python over KB-scale fixture clips;
the Spark batch boundary stays Arrow-vectorized in
multimodal.audio_features/audio_spectral (mapInPandas — executors
decode whole payloads, the driver never touches samples).
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

_FIXED_COEF = {
    0: (),
    1: (1,),
    2: (2, -1),
    3: (3, -3, 1),
    4: (4, -6, 4, -1),
}

_BLOCK_SIZES = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
                8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
                13: 8192, 14: 16384, 15: 32768}
_SAMPLE_RATES = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000,
                 6: 22050, 7: 24000, 8: 32000, 9: 44100, 10: 48000,
                 11: 96000}
_SAMPLE_SIZES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = (
                ((crc << 1) ^ 0x8005) & 0xFFFF
                if crc & 0x8000
                else (crc << 1) & 0xFFFF
            )
    return crc


class _BitReader:
    """MSB-first bit reader with a byte-position anchor (frame CRCs
    cover whole bytes, so frames always start byte-aligned)."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.bit = pos * 8

    @property
    def byte_pos(self) -> int:
        return self.bit >> 3

    def aligned(self) -> bool:
        return (self.bit & 7) == 0

    def read(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte = self.bit >> 3
            if byte >= len(self.data):
                raise ValueError("FLAC bitstream truncated")
            v = (v << 1) | ((self.data[byte] >> (7 - (self.bit & 7))) & 1)
            self.bit += 1
        return v

    def signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v & (1 << (n - 1)) else v

    def unary(self) -> int:
        n = 0
        while self.read(1) == 0:
            n += 1
        return n

    def align(self) -> None:
        self.bit = (self.bit + 7) & ~7


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nacc = 0

    def write(self, v: int, n: int) -> None:
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.nacc += n
        while self.nacc >= 8:
            self.nacc -= 8
            self.buf.append((self.acc >> self.nacc) & 0xFF)
        self.acc &= (1 << self.nacc) - 1

    def signed(self, v: int, n: int) -> None:
        self.write(v & ((1 << n) - 1), n)

    def unary(self, n: int) -> None:
        while n >= 32:
            self.write(0, 32)
            n -= 32
        self.write(1, n + 1)

    def align(self) -> None:
        if self.nacc:
            self.write(0, 8 - self.nacc)

    def bytes(self) -> bytes:
        assert self.nacc == 0
        return bytes(self.buf)


def _read_coded_number(br: _BitReader) -> int:
    """The frame header's UTF-8-style coded frame/sample number."""
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    probe = b0
    while probe & 0x40:
        n += 1
        probe <<= 1
    if n == 0 or n > 6:
        raise ValueError("FLAC coded number has invalid leading byte")
    v = b0 & (0x3F >> n)
    for _ in range(n):
        c = br.read(8)
        if (c & 0xC0) != 0x80:
            raise ValueError("FLAC coded number has invalid continuation")
        v = (v << 6) | (c & 0x3F)
    return v


def _write_coded_number(bw: _BitWriter, v: int) -> None:
    if v < 0x80:
        bw.write(v, 8)
        return
    if v >= 1 << 36:
        raise ValueError("FLAC coded number exceeds 36 bits")
    chunks = []
    n = 0
    while True:
        n += 1
        chunks.append(v & 0x3F)
        v >>= 6
        # the n-continuation leading byte holds (6 - n) payload bits
        if v <= (0x3F >> n):
            break
    bw.write((0xFF00 >> (n + 1)) & 0xFF | v, 8)
    for c in reversed(chunks):
        bw.write(0x80 | c, 8)


def flac_info(payload: bytes):
    """(sample_rate, channels, bits_per_sample, total_samples) from
    STREAMINFO, or None if the payload is not FLAC."""
    p = bytes(payload or b"")
    if len(p) < 4 + 4 + 34 or p[:4] != b"fLaC":
        return None
    hdr = p[4:8]
    if (hdr[0] & 0x7F) != 0:
        raise ValueError("FLAC first metadata block is not STREAMINFO")
    si = p[8:8 + 34]
    sr = (si[10] << 12) | (si[11] << 4) | (si[12] >> 4)
    ch = ((si[12] >> 1) & 7) + 1
    bps = (((si[12] & 1) << 4) | (si[13] >> 4)) + 1
    total = ((si[13] & 0x0F) << 32) | struct.unpack(">I", si[14:18])[0]
    return sr, ch, bps, total


def _decode_residual(br: _BitReader, block_size: int, order: int) -> list:
    method = br.read(2)
    if method > 1:
        raise ValueError(f"FLAC residual method {method} is reserved")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    part_order = br.read(4)
    nparts = 1 << part_order
    if block_size % nparts:
        raise ValueError("FLAC partition order does not divide block size")
    out = []
    for p in range(nparts):
        n = block_size >> part_order
        if p == 0:
            n -= order
        param = br.read(pbits)
        if param == escape:
            raw = br.read(5)
            for _ in range(n):
                out.append(br.signed(raw) if raw else 0)
        else:
            for _ in range(n):
                q = br.unary()
                u = (q << param) | br.read(param)
                out.append((u >> 1) ^ -(u & 1))
    return out


def _decode_subframe(br: _BitReader, block_size: int, bps: int) -> list:
    if br.read(1):
        raise ValueError("FLAC subframe header padding bit set")
    stype = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = 1 + br.unary()
        bps -= wasted
    if stype == 0:
        v = br.signed(bps)
        samples = [v] * block_size
    elif stype == 1:
        samples = [br.signed(bps) for _ in range(block_size)]
    elif 8 <= stype <= 12:
        order = stype - 8
        samples = [br.signed(bps) for _ in range(order)]
        resid = _decode_residual(br, block_size, order)
        coef = _FIXED_COEF[order]
        for i, r in enumerate(resid):
            pred = sum(
                c * samples[order + i - 1 - j] for j, c in enumerate(coef)
            )
            samples.append(pred + r)
    elif stype >= 32:
        order = stype - 31
        samples = [br.signed(bps) for _ in range(order)]
        precision = br.read(4) + 1
        if precision == 16:
            raise ValueError("FLAC LPC precision code 15 is invalid")
        shift = br.signed(5)
        if shift < 0:
            raise ValueError("FLAC negative LPC shift is invalid")
        coef = [br.signed(precision) for _ in range(order)]
        resid = _decode_residual(br, block_size, order)
        for i, r in enumerate(resid):
            acc = sum(
                c * samples[order + i - 1 - j] for j, c in enumerate(coef)
            )
            samples.append((acc >> shift) + r)
    else:
        raise ValueError(f"FLAC subframe type {stype} is reserved")
    if wasted:
        samples = [s << wasted for s in samples]
    return samples


def flac_decode(payload: bytes):
    """(sample_rate, channels, interleaved int32 samples,
    bits_per_sample) of a FLAC stream. Frame CRC-8/CRC-16 and the
    STREAMINFO MD5 (when stamped) are all VERIFIED — a codec bug or
    corrupt stream fails loudly, never as silently wrong audio."""
    p = bytes(payload or b"")
    info = flac_info(p)
    if info is None:
        raise ValueError("not a FLAC (fLaC marker) payload")
    sr0, ch0, bps0, total = info
    md5 = p[8 + 18:8 + 34]
    # walk metadata blocks
    pos = 4
    while True:
        last = p[pos] & 0x80
        length = int.from_bytes(p[pos + 1:pos + 4], "big")
        pos += 4 + length
        if last:
            break
        if pos >= len(p):
            raise ValueError("FLAC metadata blocks truncated")
    channels_out: list[list[int]] = [[] for _ in range(ch0)]
    got = 0
    while pos < len(p) and (total == 0 or got < total):
        br = _BitReader(p, pos)
        sync = br.read(14)
        if sync != 0x3FFE:
            raise ValueError(f"FLAC frame sync not found at byte {pos}")
        if br.read(1):
            raise ValueError("FLAC frame reserved bit set")
        br.read(1)  # blocking strategy: coded number read either way
        bs_code = br.read(4)
        sr_code = br.read(4)
        ca = br.read(4)
        ss_code = br.read(3)
        if br.read(1):
            raise ValueError("FLAC frame header reserved bit set")
        _read_coded_number(br)
        if bs_code == 0:
            raise ValueError("FLAC block size code 0 is reserved")
        elif bs_code == 6:
            block_size = br.read(8) + 1
        elif bs_code == 7:
            block_size = br.read(16) + 1
        else:
            block_size = _BLOCK_SIZES[bs_code]
        if sr_code == 0:
            pass
        elif sr_code == 12:
            br.read(8)
        elif sr_code in (13, 14):
            br.read(16)
        elif sr_code == 15:
            raise ValueError("FLAC sample rate code 15 is invalid")
        if ss_code == 0:
            bps = bps0
        elif ss_code == 3:
            raise ValueError("FLAC sample size code 3 is reserved")
        else:
            bps = _SAMPLE_SIZES[ss_code]
        hdr_end = br.byte_pos
        want_crc8 = br.read(8)
        if _crc8(p[pos:hdr_end]) != want_crc8:
            raise ValueError("FLAC frame header CRC-8 mismatch")
        if ca <= 7:
            nch = ca + 1
            if nch != ch0:
                raise ValueError(
                    f"frame channel count {nch} != STREAMINFO {ch0}"
                )
            chans = [
                _decode_subframe(br, block_size, bps) for _ in range(nch)
            ]
        elif ca in (8, 9, 10):
            if ch0 != 2:
                raise ValueError("stereo decorrelation in a non-stereo stream")
            extra0 = 1 if ca == 9 else 0
            extra1 = 1 if ca in (8, 10) else 0
            c0 = _decode_subframe(br, block_size, bps + extra0)
            c1 = _decode_subframe(br, block_size, bps + extra1)
            if ca == 8:  # left/side
                chans = [c0, [left - s for left, s in zip(c0, c1)]]
            elif ca == 9:  # right/side
                chans = [[r + s for s, r in zip(c0, c1)], c1]
            else:  # mid/side
                left, right = [], []
                for m, s in zip(c0, c1):
                    m = (m << 1) | (s & 1)
                    left.append((m + s) >> 1)
                    right.append((m - s) >> 1)
                chans = [left, right]
        else:
            raise ValueError(f"FLAC channel assignment {ca} is reserved")
        br.align()
        frame_end = br.byte_pos
        want_crc16 = br.read(16)
        if _crc16(p[pos:frame_end]) != want_crc16:
            raise ValueError("FLAC frame CRC-16 mismatch")
        keep = block_size
        if total and got + keep > total:
            keep = total - got
        for c in range(ch0):
            channels_out[c].extend(chans[c][:keep])
        got += keep
        pos = br.byte_pos
    if total and got < total:
        raise ValueError(
            f"FLAC stream ended at {got} of {total} declared samples"
        )
    out = np.empty(got * ch0, dtype=np.int32)
    for c in range(ch0):
        out[c::ch0] = channels_out[c]
    if md5 != b"\x00" * 16:
        nbytes = (bps0 + 7) // 8
        if nbytes == 2:
            raw = out.astype("<i2").tobytes()
        elif nbytes == 1:
            raw = (out.astype(np.int32) & 0xFF).astype(np.uint8).tobytes()
        else:
            raw = b"".join(
                int(v).to_bytes(nbytes, "little", signed=True) for v in out
            )
        if hashlib.md5(raw).digest() != md5:
            raise ValueError(
                "decoded PCM does not match the STREAMINFO MD5 — "
                "corrupt stream or decoder bug, refusing to emit it"
            )
    return sr0, ch0, out, bps0


# ---------------------------------------------------------------- encoder
def _rice_cost(resid: list, param: int) -> int:
    cost = 0
    for r in resid:
        u = (r << 1) ^ (r >> 63) if r >= 0 else ((-r) << 1) - 1
        cost += (u >> param) + 1 + param
    return cost


def _write_residual(bw: _BitWriter, resid: list) -> None:
    """Single-partition Rice residual with the best 4-bit parameter
    (or the raw escape when even that is cheaper)."""
    best_p, best_c = 0, None
    for param in range(15):
        c = _rice_cost(resid, param)
        if best_c is None or c < best_c:
            best_p, best_c = param, c
    maxabs = max((abs(r) for r in resid), default=0)
    raw_bits = max(1, maxabs.bit_length() + 1)
    bw.write(0, 2)  # method: 4-bit rice
    bw.write(0, 4)  # partition order 0
    if raw_bits * len(resid) < best_c:
        bw.write(15, 4)
        bw.write(raw_bits, 5)
        for r in resid:
            bw.signed(r, raw_bits)
        return
    bw.write(best_p, 4)
    for r in resid:
        u = (r << 1) if r >= 0 else ((-r) << 1) - 1
        bw.unary(u >> best_p)
        bw.write(u & ((1 << best_p) - 1), best_p)


def _write_subframe(bw: _BitWriter, samples: list, bps: int) -> None:
    """The cheapest exact subframe: CONSTANT / FIXED 0-2 / VERBATIM."""
    bw.write(0, 1)
    if all(s == samples[0] for s in samples):
        bw.write(0, 6)
        bw.write(0, 1)
        bw.signed(samples[0], bps)
        return
    options = []
    for order in (0, 1, 2):
        if len(samples) <= order:
            continue
        coef = _FIXED_COEF[order]
        resid = [
            samples[i]
            - sum(c * samples[i - 1 - j] for j, c in enumerate(coef))
            for i in range(order, len(samples))
        ]
        cost = order * bps + min(
            _rice_cost(resid, pr) for pr in range(15)
        )
        options.append((cost, order, resid))
    cost, order, resid = min(options)
    if cost >= len(samples) * bps:
        bw.write(1, 6)  # verbatim
        bw.write(0, 1)
        for s in samples:
            bw.signed(s, bps)
        return
    bw.write(8 + order, 6)
    bw.write(0, 1)
    for s in samples[:order]:
        bw.signed(s, bps)
    _write_residual(bw, resid)


def flac_encode_pcm16(
    samples,
    sample_rate: int,
    channels: int = 1,
    block_size: int = 4096,
    stereo_mode: str = "independent",
) -> bytes:
    """Lossless FLAC bytes for interleaved int16 PCM. stereo_mode
    'independent' | 'left-side' | 'mid-side' selects the frame
    decorrelation for 2-channel input (each is exactly invertible,
    so the round trip stays bit-exact either way)."""
    pcm = np.asarray(samples, dtype=np.int16).ravel()
    if channels < 1 or channels > 8:
        raise ValueError("channels must be 1..8")
    if pcm.size % channels:
        raise ValueError("sample count not divisible by channel count")
    if stereo_mode != "independent" and channels != 2:
        raise ValueError("stereo decorrelation needs exactly 2 channels")
    n = pcm.size // channels
    chans = [pcm[c::channels].astype(np.int64) for c in range(channels)]

    frames = bytearray()
    off = 0
    idx = 0
    min_bs = max_bs = None
    min_fs = max_fs = None
    while off < n:
        bs = min(block_size, n - off)
        bw = _BitWriter()
        bw.write(0x3FFE, 14)
        bw.write(0, 1)
        bw.write(0, 1)  # fixed block-size strategy
        bs_code = next(
            (c for c, v in _BLOCK_SIZES.items() if v == bs), 7
        )
        bw.write(bs_code, 4)
        sr_code = next(
            (c for c, v in _SAMPLE_RATES.items() if v == sample_rate), 0
        )
        bw.write(sr_code, 4)
        block = [c[off:off + bs].tolist() for c in chans]
        if stereo_mode == "left-side":
            ca = 8
            sub = [block[0], [a - b for a, b in zip(block[0], block[1])]]
            extra = [0, 1]
        elif stereo_mode == "mid-side":
            ca = 10
            sub = [
                [(a + b) >> 1 for a, b in zip(block[0], block[1])],
                [a - b for a, b in zip(block[0], block[1])],
            ]
            extra = [0, 1]
        else:
            ca = channels - 1
            sub = block
            extra = [0] * channels
        bw.write(ca, 4)
        bw.write(4, 3)  # 16-bit samples
        bw.write(0, 1)
        _write_coded_number(bw, idx)
        if bs_code == 6:
            bw.write(bs - 1, 8)
        elif bs_code == 7:
            bw.write(bs - 1, 16)
        bw.align()
        hdr = bw.bytes()
        frame = bytearray(hdr)
        frame.append(_crc8(hdr))
        body = _BitWriter()
        for s, e in zip(sub, extra):
            _write_subframe(body, s, 16 + e)
        body.align()
        frame += body.bytes()
        frame += struct.pack(">H", _crc16(frame))
        frames += frame
        min_bs = bs if min_bs is None else min(min_bs, bs)
        max_bs = bs if max_bs is None else max(max_bs, bs)
        fs = len(frame)
        min_fs = fs if min_fs is None else min(min_fs, fs)
        max_fs = fs if max_fs is None else max(max_fs, fs)
        off += bs
        idx += 1

    si = _BitWriter()
    si.write(min_bs or 0, 16)
    si.write(max_bs or 0, 16)
    si.write(min_fs or 0, 24)
    si.write(max_fs or 0, 24)
    si.write(sample_rate, 20)
    si.write(channels - 1, 3)
    si.write(15, 5)  # bps - 1
    si.write(n, 36)
    streaminfo = si.bytes() + hashlib.md5(pcm.astype("<i2").tobytes()).digest()
    head = b"fLaC" + bytes([0x80]) + len(streaminfo).to_bytes(3, "big")
    return head + streaminfo + bytes(frames)
