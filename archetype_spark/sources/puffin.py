"""Puffin file codec — pure stdlib: the sidecar container Iceberg
format-version 3 stores DELETION VECTORS in (iceberg.apache.org
"Puffin spec" + the v3 table spec "Position Delete Vectors").

File layout (all from the public spec):

    Magic ``PFA1``
    Blob_1 .. Blob_n              (raw bytes, back to back)
    Footer:
        Magic ``PFA1``
        FooterPayload             (UTF-8 JSON FileMetadata)
        FooterPayloadSize         (4-byte LE int)
        Flags                     (4 bytes; bit 0 of byte 0 = payload
                                   compressed — refused here, loudly)
        Magic ``PFA1``

FileMetadata JSON: {"blobs": [BlobMetadata...], "properties": {...}}
where BlobMetadata = {"type", "fields", "snapshot-id",
"sequence-number", "offset", "length", "properties": {...}}.

The ``deletion-vector-v1`` blob (Iceberg v3 spec):

    4 bytes BE  combined length of the magic + vector
    4 bytes     magic D1 D3 39 64
    vector      64-bit "portable" RoaringBitmap serialization
                (u64 LE bucket count, then per bucket a u32 LE high
                key + the 32-bit portable bitmap — sources/dv.py's
                container codec, shared with the Delta DV reader)
    4 bytes BE  CRC-32C of the magic + vector

Blob properties carry ``referenced-data-file`` (the data file the DV
masks, by its manifest-recorded path) and ``cardinality``. The blob
magic bytes are the same 1681511377 constant Delta's RoaringBitmapArray
framing uses, little-endian — the two formats share their roaring
heritage, which is why sources/dv.py's 32-bit container codec serves
both.

Reference parity: SURVEY.md §2.2 Sources — v3 is shipping in engines
now; a reader that refuses every v3 table misses the installed base's
newest tables, and DVs are v3's flagship feature.
"""

from __future__ import annotations

import json
import struct

from archetype_spark.sources import dv as _dv

MAGIC = b"PFA1"
DV_MAGIC = b"\xd1\xd3\x39\x64"
DELETION_VECTOR_V1 = "deletion-vector-v1"

# ----------------------------------------------------------------- CRC-32C
#: CRC-32C (Castagnoli, reflected poly 0x82F63B78) — the checksum the
#: DV blob carries; not in the stdlib (zlib.crc32 is CRC-32/ISO-HDLC).
_CRC32C_TABLE = []
for _n in range(256):
    _c = _n
    for _ in range(8):
        _c = (_c >> 1) ^ 0x82F63B78 if _c & 1 else _c >> 1
    _CRC32C_TABLE.append(_c)


def crc32c(data: bytes) -> int:
    c = 0xFFFFFFFF
    for b in data:
        c = _CRC32C_TABLE[(c ^ b) & 0xFF] ^ (c >> 8)
    return c ^ 0xFFFFFFFF


# ------------------------------------------------- portable 64-bit roaring


def roaring64_portable_serialize(values) -> bytes:
    """Standard portable 64-bit RoaringBitmap bytes (NOT Delta's
    magic-framed RoaringBitmapArray): u64 LE bucket count, then per
    bucket u32 LE high key + the 32-bit portable bitmap."""
    buckets: dict[int, list[int]] = {}
    for v in values:
        v = int(v)
        if v < 0:
            raise ValueError(f"negative row position {v}")
        buckets.setdefault(v >> 32, []).append(v & 0xFFFFFFFF)
    out = [struct.pack("<Q", len(buckets))]
    for high in sorted(buckets):
        out.append(struct.pack("<I", high))
        out.append(_dv._roaring32_serialize(sorted(set(buckets[high]))))
    return b"".join(out)


def roaring64_portable_deserialize(buf: bytes) -> list[int]:
    (n_buckets,) = struct.unpack_from("<Q", buf, 0)
    pos = 8
    out: list[int] = []
    for _ in range(n_buckets):
        (high,) = struct.unpack_from("<I", buf, pos)
        pos += 4
        lows, used = _dv._roaring32_deserialize(buf, pos)
        pos += used
        base = high << 32
        out.extend(base | lo for lo in lows)
    if pos != len(buf):
        raise ValueError(
            f"portable roaring64: {len(buf) - pos} trailing bytes"
        )
    return out


# ----------------------------------------------------------------- DV blob


def dv_blob(positions) -> bytes:
    """One deletion-vector-v1 blob's bytes for sorted row positions."""
    vec = roaring64_portable_serialize(positions)
    body = DV_MAGIC + vec
    return (
        struct.pack(">i", len(body))
        + body
        + struct.pack(">I", crc32c(body))
    )


def dv_positions(blob: bytes) -> list[int]:
    """Decode + verify one deletion-vector-v1 blob."""
    (blen,) = struct.unpack_from(">i", blob, 0)
    body = blob[4 : 4 + blen]
    if len(body) != blen:
        raise ValueError("deletion vector blob truncated")
    if body[:4] != DV_MAGIC:
        raise ValueError(
            f"deletion vector magic {body[:4]!r} != {DV_MAGIC!r}"
        )
    (crc,) = struct.unpack_from(">I", blob, 4 + blen)
    if crc32c(body) != crc:
        raise ValueError(
            "deletion vector CRC-32C mismatch — refusing a corrupt mask"
        )
    return roaring64_portable_deserialize(body[4:])


# -------------------------------------------------------------- container


def write_puffin(path: str, blobs: list[dict]) -> list[dict]:
    """Write a Puffin file. Each blob dict: {'type', 'data': bytes,
    'snapshot-id', 'sequence-number', 'fields'?, 'properties'?}.
    Returns the footer's BlobMetadata list (offset/length filled)."""
    metas: list[dict] = []
    out = bytearray(MAGIC)
    for b in blobs:
        meta = {
            "type": b["type"],
            "fields": list(b.get("fields") or []),
            "snapshot-id": int(b.get("snapshot-id") or 0),
            "sequence-number": int(b.get("sequence-number") or 0),
            "offset": len(out),
            "length": len(b["data"]),
        }
        if b.get("properties"):
            meta["properties"] = dict(b["properties"])
        metas.append(meta)
        out += b["data"]
    payload = json.dumps({"blobs": metas, "properties": {}}).encode()
    out += MAGIC
    out += payload
    out += struct.pack("<i", len(payload))
    out += b"\x00\x00\x00\x00"  # flags: payload uncompressed
    out += MAGIC
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        fh.write(out)
    import os

    os.rename(tmp, path)
    return metas


def read_footer(path: str) -> dict:
    """The FileMetadata JSON of a Puffin file (blob index)."""
    with open(path, "rb") as fh:
        data = fh.read()
    if data[:4] != MAGIC or data[-4:] != MAGIC:
        raise ValueError(f"not a Puffin file (bad magic): {path}")
    (psize,) = struct.unpack_from("<i", data, len(data) - 12)
    flags = data[len(data) - 8 : len(data) - 4]
    if flags[0] & 1:
        raise NotImplementedError(
            f"Puffin footer payload is compressed in {path}: the "
            "container ships no lz4 — refusing rather than guessing"
        )
    start = len(data) - 12 - psize
    if data[start - 4 : start] != MAGIC:
        raise ValueError(f"Puffin footer magic missing in {path}")
    return json.loads(data[start : start + psize].decode())


def read_blob(path: str, offset: int, length: int) -> bytes:
    with open(path, "rb") as fh:
        fh.seek(int(offset))
        data = fh.read(int(length))
    if len(data) != int(length):
        raise ValueError(f"Puffin blob truncated in {path}")
    return data
