"""Dependency-free baseline JPEG codec (ITU-T T.81 / ISO 10918-1).

The compressed-pixel gap `image_probe.jpeg_dims` left open: the probe
reads dimensions from the SOF header; this module entropy-decodes the
pixels — stdlib `struct` + numpy, no PIL. Scope (refusals are loud):

- DECODE: baseline sequential DCT (SOF0) AND progressive DCT (SOF2 —
  spectral selection + successive approximation: DC first/refine, AC
  band scans with EOB runs, refinement correction bits, per T.81
  Annex G), 8-bit, Huffman, grayscale or YCbCr with 4:4:4 / 4:2:2 /
  4:2:0 sampling, restart intervals, 0xFF00 byte unstuffing.
  Arithmetic coding, extended precision, lossless SOFs and unusual
  sampling refuse with the reason.
- ENCODE: baseline 4:4:4 (or grayscale) with the spec's Annex K
  example quantization/Huffman tables — deterministic bytes, used by
  tests (round-trip property: decode(encode(x)) ≈ x within the
  quantization error bound) and fixtures; jpeg_encode_progressive
  emits the spectral-selection SOF2 layout with identical
  quantization (progressive decode == baseline decode, pixel-exact).

The IDCT/DCT pair is the exact T.81 A.3.3 float transform expressed
as one numpy basis-matrix sandwich per block batch (`_A @ block @
_A.T`), vectorized over all blocks of a component — no per-pixel
Python. Used by multimodal.decode_media/resize_media as the real
JPEG pixel path when PIL is absent (the container default).

Parity note: the reference's Daft surface decodes JPEG via its image
dependency (reference pyproject.toml:7-8 `daft[...]`); this is the
jar/wheel-free equivalent seam.
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------- constants
#: zig-zag order: index i of the scan -> (row, col) flat offset
_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

#: T.81 Annex K.1 luminance / K.2 chrominance quantization tables
#: (natural row-major order after un-zigzag)
_K1_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int32,
)
_K2_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int32,
)

#: Annex K.3 Huffman specs: (bits[1..16] counts, values)
_K3_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_K3_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_K3_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_K3_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

#: DCT-II basis: _A[u, x] = c(u)/2 * cos((2x+1) u pi / 16);
#: IDCT(block) = _A.T @ block @ _A, DCT(block) = _A @ block @ _A.T
_A = np.zeros((8, 8))
for _u in range(8):
    _c = (1.0 / np.sqrt(2.0)) if _u == 0 else 1.0
    for _x in range(8):
        _A[_u, _x] = 0.5 * _c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


# ---------------------------------------------------------------- bit I/O
class _BitReader:
    """MSB-first reader over an entropy-coded segment with 0xFF00
    unstuffing; stops at any real marker (caller handles RSTn)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bits = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
            if nxt == 0x00:
                self.pos += 2
            else:
                # a real marker: T.81 F.2.2.5 pads the tail with 1-bits
                self.bits = (self.bits << 8) | 0xFF
                self.nbits += 8
                return
        else:
            self.pos += 1
        self.bits = (self.bits << 8) | b
        self.nbits += 8

    def read(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        v = (self.bits >> self.nbits) & ((1 << n) - 1)
        self.bits &= (1 << self.nbits) - 1
        return v

    def align_to_marker(self) -> int | None:
        """Drop partial bits and return the next marker byte (the
        0xDn of an RSTn), advancing past it."""
        self.bits = 0
        self.nbits = 0
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and d[self.pos + 1] != 0x00:
                m = d[self.pos + 1]
                self.pos += 2
                return m
            self.pos += 1
        return None


class _Huff:
    """Canonical Huffman table from (bits counts, values): decode by
    extending the code one bit at a time against per-length windows —
    at most 16 dict probes per symbol, tiny tables."""

    def __init__(self, counts, values):
        self.lookup: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        self.maxcode_by_len = {}
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                self.lookup[(length, code)] = values[k]
                k += 1
                code += 1
            code <<= 1

    def decode(self, br: _BitReader) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | br.read(1)
            sym = self.lookup.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map a t-bit magnitude to its signed
    value."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


# ----------------------------------------------------------------- decode
def jpeg_decode(payload: bytes) -> np.ndarray:
    """Decode a baseline JPEG to a uint8 array: (h, w) for grayscale,
    (h, w, 3) RGB otherwise. Loud ValueError/NotImplementedError on
    anything outside the supported profile (module docstring)."""
    if not payload or not payload.startswith(b"\xff\xd8"):
        raise ValueError("not a JPEG (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, _Huff] = {}
    ac_tabs: dict[int, _Huff] = {}
    frame = None
    restart_interval = 0
    pos = 2
    n = len(payload)
    while pos + 4 <= n:
        while pos + 1 < n and payload[pos + 1] == 0xFF:
            pos += 1
        if payload[pos] != 0xFF:
            raise ValueError(f"JPEG marker desync at byte {pos}")
        marker = payload[pos + 1]
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7 or marker == 0x01:
            pos += 2
            continue
        (seglen,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        body = payload[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0xF
                i += 1
                if pq == 0:
                    tab = np.frombuffer(
                        body[i : i + 64], dtype=np.uint8
                    ).astype(np.int32)
                    i += 64
                else:
                    tab = np.frombuffer(
                        body[i : i + 128], dtype=">u2"
                    ).astype(np.int32)
                    i += 128
                nat = np.zeros(64, dtype=np.int32)
                nat[_ZIGZAG] = tab
                qt[tq] = nat.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0xF
                counts = list(body[i + 1 : i + 17])
                nv = sum(counts)
                values = list(body[i + 17 : i + 17 + nv])
                (dc_tabs if tc == 0 else ac_tabs)[th] = _Huff(counts, values)
                i += 17 + nv
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF{marker - 0xC0} (extended/lossless/"
                "arithmetic) is outside this decoder; the "
                "PIL-conditional path handles it when present"
            )
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            prec = body[0]
            if prec != 8:
                raise NotImplementedError(f"JPEG precision {prec} != 8")
            h, w = struct.unpack(">HH", body[1:5])
            ncomp = body[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq}
                )
            frame = {
                "w": int(w),
                "h": int(h),
                "comps": comps,
                "progressive": marker == 0xC2,
            }
            if marker == 0xC2:
                _init_progressive(frame)
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = body[0]
            scan = []
            for c in range(ns):
                cs, tt = body[1 + 2 * c : 3 + 2 * c]
                comp = next(x for x in frame["comps"] if x["id"] == cs)
                scan.append((comp, tt >> 4, tt & 0xF))
            if not frame["progressive"]:
                return _decode_scan(
                    payload,
                    pos + 2 + seglen,
                    frame,
                    scan,
                    qt,
                    dc_tabs,
                    ac_tabs,
                    restart_interval,
                )
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ahal = body[3 + 2 * ns]
            pos = _decode_progressive_scan(
                payload,
                pos + 2 + seglen,
                frame,
                scan,
                dc_tabs,
                ac_tabs,
                restart_interval,
                int(ss),
                int(se),
                ahal >> 4,
                ahal & 0xF,
            )
            continue
        elif marker == 0xD9:
            if frame is not None and frame.get("progressive"):
                for c in frame["comps"]:
                    blk = np.zeros((c["bh"] * c["bw"], 64), dtype=np.int32)
                    blk[:, _ZIGZAG] = c["czz"]
                    c["blocks"] = blk.reshape(-1, 8, 8)
                return _reconstruct(frame, qt)
            break
        pos += 2 + seglen
    if frame is not None and frame.get("progressive"):
        # tolerate a missing EOI after the last scan
        for c in frame["comps"]:
            blk = np.zeros((c["bh"] * c["bw"], 64), dtype=np.int32)
            blk[:, _ZIGZAG] = c["czz"]
            c["blocks"] = blk.reshape(-1, 8, 8)
        return _reconstruct(frame, qt)
    raise ValueError("JPEG ended without an SOS scan")


def _init_progressive(frame) -> None:
    """Allocate the persistent zig-zag coefficient store progressive
    scans accumulate into, plus per-component DC predictors."""
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-frame["w"] // (8 * hmax))
    mcuy = -(-frame["h"] // (8 * vmax))
    frame["mcux"], frame["mcuy"] = mcux, mcuy
    for c in comps:
        c["bw"] = mcux * c["h"]
        c["bh"] = mcuy * c["v"]
        c["czz"] = np.zeros((c["bh"] * c["bw"], 64), dtype=np.int32)
        # the component's OWN block grid (non-interleaved scans cover
        # ceil(comp_size/8), NOT the MCU-padded grid)
        c["cbw"] = -(-(frame["w"] * c["h"]) // (8 * hmax))
        c["cbh"] = -(-(frame["h"] * c["v"]) // (8 * vmax))
        c["pred"] = 0


def _decode_progressive_scan(
    data,
    pos,
    frame,
    scan,
    dc_tabs,
    ac_tabs,
    restart_interval,
    ss,
    se,
    ah,
    al,
) -> int:
    """One progressive scan (T.81 G.2): DC scans (Ss=Se=0) may be
    interleaved and carry first (Ah=0, point-transformed diffs) or
    refinement (one bit per block) passes; AC scans cover one
    component's spectral band [Ss, Se] with EOB-run coding, first or
    refinement (correction bits). Updates the frame's persistent
    zig-zag coefficient store and returns the byte position of the
    marker after the scan's entropy segment."""
    br = _BitReader(data, pos)
    state = {"eobrun": 0}
    if ss == 0:  # DC scan
        if se != 0:
            raise ValueError(f"JPEG DC scan with Se={se}")
        mcux, mcuy = frame["mcux"], frame["mcuy"]
        if ah == 0:
            for comp, _td, _ta in scan:
                comp["pred"] = 0
        n_mcu = mcux * mcuy
        one_comp = scan[0][0] if len(scan) == 1 else None
        n_units = (
            n_mcu
            if one_comp is None
            else one_comp["cbw"] * one_comp["cbh"]
        )
        for m in range(n_units):
            if restart_interval and m and m % restart_interval == 0:
                mk = br.align_to_marker()
                if mk is None or not 0xD0 <= mk <= 0xD7:
                    raise ValueError(f"expected RSTn at unit {m}, got {mk!r}")
                for comp, _td, _ta in scan:
                    comp["pred"] = 0
            if one_comp is not None:
                cy, cx = divmod(m, one_comp["cbw"])
                _dc_unit(br, one_comp, dc_tabs, scan[0][1], cy, cx, ah, al)
                continue
            my, mx = divmod(m, mcux)
            for comp, td, _ta in scan:
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        _dc_unit(
                            br,
                            comp,
                            dc_tabs,
                            td,
                            my * comp["v"] + by,
                            mx * comp["h"] + bx,
                            ah,
                            al,
                        )
    else:  # AC scan: exactly one component (T.81 G.1.1.1.1)
        if len(scan) != 1:
            raise ValueError("JPEG progressive AC scan with Ns != 1")
        comp, _td, ta = scan[0]
        act = ac_tabs[ta]
        n_units = comp["cbw"] * comp["cbh"]
        for m in range(n_units):
            if restart_interval and m and m % restart_interval == 0:
                mk = br.align_to_marker()
                if mk is None or not 0xD0 <= mk <= 0xD7:
                    raise ValueError(f"expected RSTn at unit {m}, got {mk!r}")
                state["eobrun"] = 0
            cy, cx = divmod(m, comp["cbw"])
            zz = comp["czz"][cy * comp["bw"] + cx]
            if ah == 0:
                _ac_first(br, act, zz, ss, se, al, state)
            else:
                _ac_refine(br, act, zz, ss, se, al, state)
    # the next marker after this scan's entropy bytes
    d = data
    p = br.pos
    while p + 1 < len(d):
        if d[p] == 0xFF and d[p + 1] != 0x00:
            if 0xD0 <= d[p + 1] <= 0xD7:  # stray RSTn at scan end
                p += 2
                continue
            return p
        p += 1
    return len(d)


def _dc_unit(br, comp, dc_tabs, td, row, col, ah, al) -> None:
    zz = comp["czz"][row * comp["bw"] + col]
    if ah == 0:
        t = dc_tabs[td].decode(br)
        diff = _extend(br.read(t), t) if t else 0
        comp["pred"] += diff
        zz[0] = comp["pred"] << al
    else:
        if br.read(1):
            zz[0] |= 1 << al


def _ac_first(br, act, zz, ss, se, al, state) -> None:
    """T.81 G.1.2.2: first pass over a spectral band — EOB runs skip
    whole blocks; coefficients land point-transformed (<< Al)."""
    if state["eobrun"] > 0:
        state["eobrun"] -= 1
        return
    k = ss
    while k <= se:
        rs = act.decode(br)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r < 15:
                state["eobrun"] = (1 << r) - 1
                if r:
                    state["eobrun"] += br.read(r)
                return
            k += 16  # ZRL
            continue
        k += r
        if k > se:
            raise ValueError("JPEG AC run past the spectral band")
        zz[k] = _extend(br.read(s), s) << al
        k += 1


def _ac_refine(br, act, zz, ss, se, al, state) -> None:
    """T.81 G.1.2.3: refinement pass — newly-significant coefficients
    carry magnitude 1; every already-nonzero coefficient visited
    reads one correction bit."""
    p1 = 1 << al
    m1 = -1 << al
    k = ss

    def correct(idx: int) -> None:
        if br.read(1) and (zz[idx] & p1) == 0:
            zz[idx] += p1 if zz[idx] >= 0 else m1

    if state["eobrun"] == 0:
        while k <= se:
            rs = act.decode(br)
            r, s = rs >> 4, rs & 0xF
            new_val = 0
            if s == 0:
                if r < 15:
                    state["eobrun"] = 1 << r
                    if r:
                        state["eobrun"] += br.read(r)
                    break
                # r == 15: skip 16 zero-HISTORY positions
            else:
                if s != 1:
                    raise ValueError(
                        "JPEG AC refinement symbol with size != 1"
                    )
                new_val = p1 if br.read(1) else m1
            while k <= se:
                if zz[k] != 0:
                    correct(k)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if new_val:
                if k > se:
                    raise ValueError("JPEG AC refinement past the band")
                zz[k] = new_val
            k += 1
    if state["eobrun"] > 0:
        while k <= se:
            if zz[k] != 0:
                correct(k)
            k += 1
        state["eobrun"] -= 1


def _decode_scan(
    data, pos, frame, scan, qt, dc_tabs, ac_tabs, restart_interval
) -> np.ndarray:
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    # per-component coefficient block grids (MCU-padded)
    for c in comps:
        c["bw"] = mcux * c["h"]
        c["bh"] = mcuy * c["v"]
        c["blocks"] = np.zeros((c["bh"] * c["bw"], 8, 8), dtype=np.int32)
    br = _BitReader(data, pos)
    pred = {c["id"]: 0 for c in comps}
    n_mcu = mcux * mcuy
    for m in range(n_mcu):
        if restart_interval and m and m % restart_interval == 0:
            mk = br.align_to_marker()
            if mk is None or not 0xD0 <= mk <= 0xD7:
                raise ValueError(f"expected RSTn at MCU {m}, got {mk!r}")
            pred = {c["id"]: 0 for c in comps}
        my, mx = divmod(m, mcux)
        for comp, td, ta in scan:
            dct = dc_tabs[td]
            act = ac_tabs[ta]
            for by in range(comp["v"]):
                for bx in range(comp["h"]):
                    zz = np.zeros(64, dtype=np.int32)
                    t = dct.decode(br)
                    diff = _extend(br.read(t), t) if t else 0
                    pred[comp["id"]] += diff
                    zz[0] = pred[comp["id"]]
                    k = 1
                    while k < 64:
                        rs = act.decode(br)
                        r, s = rs >> 4, rs & 0xF
                        if s == 0:
                            if r == 15:
                                k += 16  # ZRL
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("JPEG AC run past block end")
                        zz[k] = _extend(br.read(s), s)
                        k += 1
                    row = my * comp["v"] + by
                    col = mx * comp["h"] + bx
                    blk = np.zeros(64, dtype=np.int32)
                    blk[_ZIGZAG] = zz
                    comp["blocks"][row * comp["bw"] + col] = blk.reshape(8, 8)
    return _reconstruct(frame, qt)


def _reconstruct(frame, qt) -> np.ndarray:
    """Shared tail of the baseline and progressive decoders:
    dequantize + IDCT (vectorized per component), upsample chroma,
    crop, and convert YCbCr -> RGB."""
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    planes = []
    for c in comps:
        coef = c["blocks"].astype(np.float64) * qt[c["tq"]][None, :, :]
        pix = np.einsum("ux,nuv,vy->nxy", _A, coef, _A) + 128.0
        grid = (
            pix.reshape(c["bh"], c["bw"], 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(c["bh"] * 8, c["bw"] * 8)
        )
        # chroma upsampling: sample replication to the full MCU grid
        grid = np.repeat(
            np.repeat(grid, vmax // c["v"], axis=0), hmax // c["h"], axis=1
        )
        planes.append(grid[:h, :w])
    out = np.stack(planes, axis=-1) if len(planes) > 1 else planes[0]
    if out.ndim == 2:
        return np.clip(np.rint(out), 0, 255).astype(np.uint8)
    if out.shape[-1] != 3:
        raise NotImplementedError(
            f"{out.shape[-1]}-component JPEG (only grayscale/YCbCr)"
        )
    y, cb, cr = out[..., 0], out[..., 1] - 128.0, out[..., 2] - 128.0
    rgb = np.stack(
        [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb],
        axis=-1,
    )
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


# ----------------------------------------------------------------- encode
def _huff_codes(counts, values):
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            out[values[k]] = (code, length)
            k += 1
            code += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)  # byte stuffing
        self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # 1-bit padding per spec
        return bytes(self.buf)


def jpeg_encode(
    img: np.ndarray,
    quality_scale: int = 1,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Encode a uint8 grayscale (h, w) or RGB (h, w, 3) array as a
    baseline JPEG — Annex K tables divided by `quality_scale` (>=1
    sharpens quantization; 1 = the spec's example tables),
    `subsampling` "444" or "420" (2x2 box-averaged chroma), optional
    DRI restart markers every `restart_interval` MCUs. Deterministic
    bytes for fixtures + the round-trip property tests (which is how
    the decoder's 4:2:0 and restart paths get exercised without PIL);
    not a rate-optimized encoder."""
    img = np.asarray(img)
    if img.dtype != np.uint8 or img.ndim not in (2, 3):
        raise ValueError("jpeg_encode wants uint8 (h,w) or (h,w,3)")
    if subsampling not in ("444", "420"):
        raise ValueError(f"subsampling {subsampling!r} not 444/420")
    h, w = img.shape[:2]
    gray = img.ndim == 2
    if not gray and img.shape[2] != 3:
        raise ValueError("jpeg_encode wants 3 channels for color")
    sub = 2 if (subsampling == "420" and not gray) else 1
    if gray:
        planes = [img.astype(np.float64)]
    else:
        r, g, b = (img[..., i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y, cb, cr]
    q_luma = np.maximum(_K1_LUMA.reshape(8, 8) // quality_scale, 1)
    q_chroma = np.maximum(_K2_CHROMA.reshape(8, 8) // quality_scale, 1)
    qtabs = [q_luma] + ([q_chroma, q_chroma] if not gray else [])

    out = bytearray(b"\xff\xd8")  # SOI

    def seg(marker: int, body: bytes) -> None:
        out.extend(struct.pack(">BBH", 0xFF, marker, len(body) + 2))
        out.extend(body)

    for tq, tab in enumerate([q_luma] if gray else [q_luma, q_chroma]):
        zz = tab.reshape(-1)[_ZIGZAG].astype(np.uint8)
        seg(0xDB, bytes([tq]) + zz.tobytes())
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for c in range(ncomp):
        hv = (sub << 4) | sub if c == 0 else 0x11
        sof += bytes([c + 1, hv, 0 if c == 0 else 1])
    seg(0xC0, sof)
    hts = [(0, 0, _K3_DC_LUMA), (1, 0, _K3_AC_LUMA)]
    if not gray:
        hts += [(0, 1, _K3_DC_CHROMA), (1, 1, _K3_AC_CHROMA)]
    for tc, th, (counts, values) in hts:
        seg(0xC4, bytes([(tc << 4) | th] + counts + values))
    if restart_interval:
        seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([ncomp])
    for c in range(ncomp):
        sos += bytes([c + 1, 0x00 if c == 0 else 0x11])
    sos += bytes([0, 63, 0])
    seg(0xDA, sos)

    dc_codes = [_huff_codes(*_K3_DC_LUMA)] + (
        [_huff_codes(*_K3_DC_CHROMA)] * 2 if not gray else []
    )
    ac_codes = [_huff_codes(*_K3_AC_LUMA)] + (
        [_huff_codes(*_K3_AC_CHROMA)] * 2 if not gray else []
    )
    # per-component sampling factors + padded planes at MCU granularity
    samp = [(sub, sub)] + [(1, 1)] * (ncomp - 1) if not gray else [(1, 1)]
    mcu_h, mcu_w = 8 * sub, 8 * sub
    mcuy, mcux = -(-h // mcu_h), -(-w // mcu_w)
    padded = []
    for ci, p in enumerate(planes):
        if ci > 0 and sub == 2:
            # 2x2 box-average chroma downsample (pad to even first)
            pp = np.pad(
                p, ((0, h % 2), (0, w % 2)), mode="edge"
            )
            p = (
                pp.reshape(pp.shape[0] // 2, 2, pp.shape[1] // 2, 2)
                .mean(axis=(1, 3))
            )
        ch = mcuy * 8 * samp[ci][1]
        cw = mcux * 8 * samp[ci][0]
        padded.append(
            np.pad(
                p,
                ((0, ch - p.shape[0]), (0, cw - p.shape[1])),
                mode="edge",
            )
        )

    def put_block(bw, ci, blk, pred):
        coef = _A @ blk @ _A.T
        q = np.rint(coef / qtabs[ci]).astype(np.int64)
        zz = q.reshape(-1)[_ZIGZAG]
        diff = int(zz[0]) - pred[ci]
        pred[ci] = int(zz[0])
        t = int(diff).bit_length() if diff else 0
        mag = diff if diff >= 0 else diff + (1 << t) - 1
        code, length = dc_codes[ci][t]
        bw.write(code, length)
        if t:
            bw.write(mag & ((1 << t) - 1), t)
        run = 0
        for k in range(1, 64):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, length = ac_codes[ci][0xF0]  # ZRL
                bw.write(code, length)
                run -= 16
            s = abs(v).bit_length()
            mag = v if v >= 0 else v + (1 << s) - 1
            code, length = ac_codes[ci][(run << 4) | s]
            bw.write(code, length)
            bw.write(mag & ((1 << s) - 1), s)
            run = 0
        if run:
            code, length = ac_codes[ci][0x00]  # EOB
            bw.write(code, length)

    bw = _BitWriter()
    pred = [0] * ncomp
    m = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and m and m % restart_interval == 0:
                out.extend(bw.flush())
                out.extend(bytes([0xFF, 0xD0 + (rst % 8)]))
                rst += 1
                bw = _BitWriter()
                pred = [0] * ncomp
            for ci in range(ncomp):
                sh, sv = samp[ci]
                for by in range(sv):
                    for bx in range(sh):
                        r0 = (my * sv + by) * 8
                        c0 = (mx * sh + bx) * 8
                        blk = (
                            padded[ci][r0 : r0 + 8, c0 : c0 + 8] - 128.0
                        )
                        put_block(bw, ci, blk, pred)
            m += 1
    out.extend(bw.flush())
    out.extend(b"\xff\xd9")  # EOI
    return bytes(out)


def jpeg_encode_progressive(
    img: np.ndarray, quality_scale: int = 1
) -> bytes:
    """Progressive (SOF2) spectral-selection encoder — one interleaved
    DC scan, then one full-band AC scan per component (Ss=1, Se=63,
    Ah=Al=0), always 4:4:4, Annex K tables. The simplest spec-valid
    progressive layout (the K AC tables carry only EOB0, so runs end
    per block); quantization matches jpeg_encode exactly, so
    decode(progressive bytes) equals decode(baseline bytes) pixel for
    pixel — the round-trip property that exercises the progressive
    DECODER without PIL."""
    img = np.asarray(img)
    if img.dtype != np.uint8 or img.ndim not in (2, 3):
        raise ValueError("jpeg_encode_progressive wants uint8 (h,w)/(h,w,3)")
    h, w = img.shape[:2]
    gray = img.ndim == 2
    if not gray and img.shape[2] != 3:
        raise ValueError("jpeg_encode_progressive wants 3 channels")
    if gray:
        planes = [img.astype(np.float64)]
    else:
        r, g, b = (img[..., i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y, cb, cr]
    q_luma = np.maximum(_K1_LUMA.reshape(8, 8) // quality_scale, 1)
    q_chroma = np.maximum(_K2_CHROMA.reshape(8, 8) // quality_scale, 1)
    qtabs = [q_luma] + ([q_chroma, q_chroma] if not gray else [])
    ncomp = len(planes)

    out = bytearray(b"\xff\xd8")

    def seg(marker: int, body: bytes) -> None:
        out.extend(struct.pack(">BBH", 0xFF, marker, len(body) + 2))
        out.extend(body)

    for tq, tab in enumerate([q_luma] if gray else [q_luma, q_chroma]):
        zz = tab.reshape(-1)[_ZIGZAG].astype(np.uint8)
        seg(0xDB, bytes([tq]) + zz.tobytes())
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for c in range(ncomp):
        sof += bytes([c + 1, 0x11, 0 if c == 0 else 1])
    seg(0xC2, sof)  # SOF2: progressive
    hts = [(0, 0, _K3_DC_LUMA), (1, 0, _K3_AC_LUMA)]
    if not gray:
        hts += [(0, 1, _K3_DC_CHROMA), (1, 1, _K3_AC_CHROMA)]
    for tc, th, (counts, values) in hts:
        seg(0xC4, bytes([(tc << 4) | th] + counts + values))

    dc_codes = [_huff_codes(*_K3_DC_LUMA)] + (
        [_huff_codes(*_K3_DC_CHROMA)] * 2 if not gray else []
    )
    ac_codes = [_huff_codes(*_K3_AC_LUMA)] + (
        [_huff_codes(*_K3_AC_CHROMA)] * 2 if not gray else []
    )
    by_, bx_ = -(-h // 8), -(-w // 8)
    zzs = []
    for ci, p in enumerate(planes):
        pp = np.pad(
            p, ((0, by_ * 8 - h), (0, bx_ * 8 - w)), mode="edge"
        ) - 128.0
        blocks = (
            pp.reshape(by_, 8, bx_, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
        )
        coef = np.einsum("ux,nxy,vy->nuv", _A, blocks, _A)
        q = np.rint(coef / qtabs[ci][None, :, :]).astype(np.int64)
        # natural -> zig-zag scan order
        zzs.append(q.reshape(-1, 64)[:, _ZIGZAG])

    # DC scan: interleaved, Ss=Se=0, Ah=Al=0
    sos = bytes([ncomp])
    for c in range(ncomp):
        sos += bytes([c + 1, ((0 if c == 0 else 1) << 4) | 0])
    sos += bytes([0, 0, 0])
    seg(0xDA, sos)
    bw = _BitWriter()
    pred = [0] * ncomp
    for m in range(by_ * bx_):
        for ci in range(ncomp):
            dc = int(zzs[ci][m][0])
            diff = dc - pred[ci]
            pred[ci] = dc
            t = abs(diff).bit_length()
            mag = diff if diff >= 0 else diff + (1 << t) - 1
            code, length = dc_codes[ci][t]
            bw.write(code, length)
            if t:
                bw.write(mag & ((1 << t) - 1), t)
    out.extend(bw.flush())
    # one full-band AC scan per component (Ss=1, Se=63)
    for ci in range(ncomp):
        seg(
            0xDA,
            bytes([1, ci + 1, (0 << 4) | (0 if ci == 0 else 1), 1, 63, 0]),
        )
        bw = _BitWriter()
        for m in range(by_ * bx_):
            zz = zzs[ci][m]
            run = 0
            for k in range(1, 64):
                v = int(zz[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, length = ac_codes[ci][0xF0]
                    bw.write(code, length)
                    run -= 16
                s = abs(v).bit_length()
                mag = v if v >= 0 else v + (1 << s) - 1
                code, length = ac_codes[ci][(run << 4) | s]
                bw.write(code, length)
                bw.write(mag & ((1 << s) - 1), s)
                run = 0
            if run:
                code, length = ac_codes[ci][0x00]  # EOB (run of 1)
                bw.write(code, length)
        out.extend(bw.flush())
    out.extend(b"\xff\xd9")
    return bytes(out)
