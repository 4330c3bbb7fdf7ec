"""Delta deletion-vector codec — pure stdlib, no connector jars.

Implements the three PUBLIC formats a Delta reader needs to apply
row-level deletes (delta.io PROTOCOL.md "Deletion Vectors" section,
plus the RoaringBitmap interoperable spec at
github.com/RoaringBitmap/RoaringFormatSpec):

1. Z85 text encoding (ZeroMQ RFC 32/Z85) — the descriptor's
   `pathOrInlineDv` encodes either the DV file's UUID (storageType
   "u") or the whole bitmap (storageType "i") in Z85.
2. 32-bit Roaring bitmap, "portable" serialization — both
   no-run-container (cookie 12347) and run-container (cookie 12346)
   layouts on decode, with array / bitset / run containers; encode
   emits cookie 12347 with array/bitset containers (always valid —
   run containers are an optional optimization).
3. The 64-bit RoaringBitmapArray framing Delta stores row indexes in
   (magic 1681511377 LE, i64 bitmap count, then per bitmap a u32 LE
   high-32-bits key + a portable 32-bit bitmap), wrapped in the DV
   FILE layout: a single format-version byte (1), then each vector at
   its descriptor `offset` as <i32 BE dataSize> <bitmap bytes>
   <i32 BE CRC-32 of the bitmap bytes>.

Used by sources/delta.py: the reader parses descriptors into sorted
row-index lists (driver-side — DVs are metadata-sized relative to
their data files), the writer emits spec-compliant "u" vectors so
`delete_where_delta` round-trips through any connector-enabled
reader. Reference parity: the reference's `daft.read_deltalake`
surface (reference pyproject.toml:7-8) reads DV-bearing tables via
delta-rs; this module is the jar-free equivalent seam.
"""

from __future__ import annotations

import os
import struct
import uuid as _uuid
import zlib

# --------------------------------------------------------------------- Z85
_Z85_CHARS = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_INDEX = {c: i for i, c in enumerate(_Z85_CHARS)}


def z85_encode(data: bytes) -> str:
    """Z85 text for `data` (length must be a multiple of 4; UUIDs and
    roaring blobs padded by the caller satisfy this)."""
    if len(data) % 4:
        raise ValueError(f"Z85 input length {len(data)} not a multiple of 4")
    out = []
    for i in range(0, len(data), 4):
        v = int.from_bytes(data[i : i + 4], "big")
        chunk = []
        for _ in range(5):
            v, rem = divmod(v, 85)
            chunk.append(_Z85_CHARS[rem])
        out.extend(reversed(chunk))
    return "".join(out)


def z85_decode(text: str) -> bytes:
    if len(text) % 5:
        raise ValueError(f"Z85 text length {len(text)} not a multiple of 5")
    out = bytearray()
    for i in range(0, len(text), 5):
        v = 0
        for ch in text[i : i + 5]:
            try:
                v = v * 85 + _Z85_INDEX[ch]
            except KeyError:
                raise ValueError(f"invalid Z85 character {ch!r}") from None
        if v > 0xFFFFFFFF:
            raise ValueError(f"Z85 group {text[i:i + 5]!r} overflows 32 bits")
        out += v.to_bytes(4, "big")
    return bytes(out)


# ------------------------------------------------- 32-bit portable roaring
_SERIAL_COOKIE_NO_RUN = 12347
_SERIAL_COOKIE_RUN = 12346
_NO_OFFSET_THRESHOLD = 4  # run-cookie bitmaps with < 4 containers omit offsets


def _roaring32_serialize(values) -> bytes:
    """Portable bytes for sorted distinct uint32 `values` — cookie
    12347, array containers at cardinality <= 4096 else bitset
    containers (the always-valid encoder choice; run containers are
    an optional size optimization decoders must accept, not one
    encoders must produce)."""
    containers: dict[int, list[int]] = {}
    for v in values:
        if not 0 <= v <= 0xFFFFFFFF:
            raise ValueError(f"value {v} out of uint32 range")
        containers.setdefault(v >> 16, []).append(v & 0xFFFF)
    keys = sorted(containers)
    n = len(keys)
    head = struct.pack("<II", _SERIAL_COOKIE_NO_RUN, n)
    desc = b"".join(
        struct.pack("<HH", k, len(containers[k]) - 1) for k in keys
    )
    # offsets are from the start of the bitmap blob
    payloads = []
    for k in keys:
        vals = containers[k]
        if len(vals) <= 4096:
            payloads.append(struct.pack(f"<{len(vals)}H", *vals))
        else:
            bits = bytearray(8192)
            for lo in vals:
                bits[lo >> 3] |= 1 << (lo & 7)
            payloads.append(bytes(bits))
    base = len(head) + len(desc) + 4 * n
    offsets, pos = [], base
    for p in payloads:
        offsets.append(pos)
        pos += len(p)
    return (
        head
        + desc
        + struct.pack(f"<{n}I", *offsets)
        + b"".join(payloads)
    )


def _roaring32_deserialize(buf: bytes, start: int = 0) -> tuple[list[int], int]:
    """(sorted values, bytes consumed) for one portable 32-bit bitmap
    beginning at `start`. Handles both cookies and all three container
    types (array / bitset / run)."""
    (cookie,) = struct.unpack_from("<I", buf, start)
    pos = start + 4
    run_flags = b""
    if cookie == _SERIAL_COOKIE_NO_RUN:
        (n,) = struct.unpack_from("<I", buf, pos)
        pos += 4
        has_offsets = True
    elif cookie & 0xFFFF == _SERIAL_COOKIE_RUN:
        n = (cookie >> 16) + 1
        nbytes = (n + 7) // 8
        run_flags = buf[pos : pos + nbytes]
        pos += nbytes
        has_offsets = n >= _NO_OFFSET_THRESHOLD
    else:
        raise ValueError(f"bad roaring cookie {cookie} at offset {start}")
    desc = struct.unpack_from(f"<{2 * n}H", buf, pos)
    pos += 4 * n
    if has_offsets:
        pos += 4 * n  # trust container order; offsets are redundant here
    values: list[int] = []
    for i in range(n):
        key, card = desc[2 * i], desc[2 * i + 1] + 1
        base = key << 16
        is_run = bool(run_flags) and bool(run_flags[i >> 3] & (1 << (i & 7)))
        if is_run:
            (n_runs,) = struct.unpack_from("<H", buf, pos)
            pos += 2
            runs = struct.unpack_from(f"<{2 * n_runs}H", buf, pos)
            pos += 4 * n_runs
            for r in range(n_runs):
                s, ln = runs[2 * r], runs[2 * r + 1]
                values.extend(base + v for v in range(s, s + ln + 1))
        elif card <= 4096:
            arr = struct.unpack_from(f"<{card}H", buf, pos)
            pos += 2 * card
            values.extend(base + v for v in arr)
        else:
            words = struct.unpack_from("<1024Q", buf, pos)
            pos += 8192
            for w_i, w in enumerate(words):
                while w:
                    low = w & -w
                    values.append(base + (w_i << 6) + low.bit_length() - 1)
                    w ^= low
    return values, pos - start


# --------------------------------------- 64-bit RoaringBitmapArray framing
MAGIC_PORTABLE = 1681511377


def roaring64_serialize(values) -> bytes:
    """Delta's portable RoaringBitmapArray bytes for sorted distinct
    uint64 row indexes: magic, i64 bitmap count, then (u32 key +
    portable 32-bit bitmap) per non-empty high-32-bit bucket in key
    order."""
    buckets: dict[int, list[int]] = {}
    for v in sorted(set(int(v) for v in values)):
        if v < 0 or v > 0xFFFFFFFFFFFFFFFF:
            raise ValueError(f"row index {v} out of uint64 range")
        buckets.setdefault(v >> 32, []).append(v & 0xFFFFFFFF)
    out = [struct.pack("<iq", MAGIC_PORTABLE, len(buckets))]
    for key in sorted(buckets):
        out.append(struct.pack("<I", key))
        out.append(_roaring32_serialize(buckets[key]))
    return b"".join(out)


def roaring64_deserialize(buf: bytes) -> list[int]:
    magic, n = struct.unpack_from("<iq", buf, 0)
    if magic != MAGIC_PORTABLE:
        raise ValueError(
            f"bad RoaringBitmapArray magic {magic} (want {MAGIC_PORTABLE})"
        )
    pos, values = 12, []
    for _ in range(n):
        (key,) = struct.unpack_from("<I", buf, pos)
        pos += 4
        vals32, used = _roaring32_deserialize(buf, pos)
        pos += used
        values.extend((key << 32) + v for v in vals32)
    return values


# ------------------------------------------------------------ DV file layout
_FORMAT_VERSION = 1


def write_dv_file(path: str, bitmap: bytes) -> int:
    """Write a single-vector DV file (format-version byte, then
    <i32 BE size><bitmap><i32 BE crc32>); returns the vector's byte
    offset (where the size field starts — the descriptor `offset`)."""
    body = (
        bytes([_FORMAT_VERSION])
        + struct.pack(">i", len(bitmap))
        + bitmap
        + struct.pack(">I", zlib.crc32(bitmap) & 0xFFFFFFFF)
    )
    tmp = f"{path}.tmp-{_uuid.uuid4().hex}"
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(tmp, "wb") as fh:
        fh.write(body)
    os.rename(tmp, path)
    return 1


def read_dv_bitmap(path: str, offset: int | None, size_in_bytes: int) -> bytes:
    """The raw bitmap bytes of one vector inside a DV file, CRC- and
    size-checked against the descriptor."""
    with open(path, "rb") as fh:
        data = fh.read()
    pos = 1 if offset is None else int(offset)
    (size,) = struct.unpack_from(">i", data, pos)
    if size != size_in_bytes:
        raise ValueError(
            f"DV at {path}:{pos} has dataSize {size}, descriptor says "
            f"{size_in_bytes}"
        )
    bitmap = data[pos + 4 : pos + 4 + size]
    (crc,) = struct.unpack_from(">I", data, pos + 4 + size)
    if crc != zlib.crc32(bitmap) & 0xFFFFFFFF:
        raise ValueError(f"DV checksum mismatch at {path}:{pos}")
    return bitmap


def dv_path(table_root: str, path_or_inline: str) -> str:
    """Absolute DV file path for a storageType "u" descriptor: the
    LAST 20 chars Z85-decode to the file UUID, anything before them is
    a random subdirectory prefix (PROTOCOL.md's derived-file-name
    rule)."""
    prefix, enc = path_or_inline[:-20], path_or_inline[-20:]
    u = _uuid.UUID(bytes=z85_decode(enc))
    name = f"deletion_vector_{u}.bin"
    return os.path.join(table_root, prefix, name) if prefix else os.path.join(
        table_root, name
    )


def descriptor_bitmap(table_root: str, desc: dict) -> bytes:
    """The raw serialized RoaringBitmapArray bytes behind one
    add-action `deletionVector` descriptor (storage types "u"/"i"/
    "p") — WITHOUT deserializing the positions. The wide-mask write
    path broadcasts these blobs to executors so the driver never
    materializes a position set."""
    st = desc.get("storageType")
    size = int(desc["sizeInBytes"])
    if st == "i":
        return z85_decode(desc["pathOrInlineDv"])[:size]
    if st == "u":
        return read_dv_bitmap(
            dv_path(table_root, desc["pathOrInlineDv"]), desc.get("offset"), size
        )
    if st == "p":
        return read_dv_bitmap(desc["pathOrInlineDv"], desc.get("offset"), size)
    raise NotImplementedError(f"deletion vector storageType {st!r}")


def read_descriptor(table_root: str, desc: dict) -> list[int]:
    """Sorted deleted row indexes for one add-action
    `deletionVector` descriptor (storage types "u"/"i"/"p")."""
    values = roaring64_deserialize(descriptor_bitmap(table_root, desc))
    card = int(desc.get("cardinality", len(values)))
    if card != len(values):
        raise ValueError(
            f"DV cardinality mismatch: descriptor {card}, bitmap {len(values)}"
        )
    return sorted(values)


def write_descriptor(table_root: str, row_indexes) -> dict:
    """Persist `row_indexes` as a storageType "u" DV file under the
    table root and return the add-action descriptor dict."""
    bitmap = roaring64_serialize(row_indexes)
    u = _uuid.uuid4()
    path = os.path.join(table_root, f"deletion_vector_{u}.bin")
    offset = write_dv_file(path, bitmap)
    return {
        "storageType": "u",
        "pathOrInlineDv": z85_encode(u.bytes),
        "offset": offset,
        "sizeInBytes": len(bitmap),
        "cardinality": len(set(int(v) for v in row_indexes)),
    }
