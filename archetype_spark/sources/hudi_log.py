"""Hudi log-file codec (HoodieLogFormat, log format version 1) —
stdlib only, pure bytes in/out: the block framing MERGE_ON_READ file
slices append their deltas into, per the public Apache Hudi storage
layout (hudi.apache.org "Table & Query Types" + the
hudi-common log format, table version 6).

A log file (named `.<fileId>_<baseInstant>.log.<version>_<token>`,
living beside its file group's base files) is a sequence of blocks:

    6  bytes  magic ``#HUDI#``
    8  bytes  blocksize (BE long) — everything after this field
              through the trailing reverse-pointer, so a reader can
              skip a block without parsing it
    4  bytes  log format version (1)
    4  bytes  block type (the public HoodieLogBlockType ordinals:
              0 COMMAND, 1 DELETE, 2 CORRUPT, 3 AVRO_DATA,
              4 HFILE_DATA, 5 PARQUET_DATA, 6 CDC_DATA)
    header    BE-int entry count, then per entry: BE-int key ordinal
              (HeaderMetadataType: 0 INSTANT_TIME,
              1 TARGET_INSTANT_TIME, 2 SCHEMA, 3 COMMAND_BLOCK_TYPE)
              + BE-int length + UTF-8 bytes
    8  bytes  content length (BE long)
    content
    footer    BE-int entry count (same wire shape as the header)
    8  bytes  total block length including the magic (BE long) — the
              reverse traversal pointer real readers use to walk a
              log file tail-first

Block contents:

- AVRO_DATA (3): BE-int content format version (3), BE-int record
  count, then per record BE-int size + the record binary-encoded
  against the writer schema carried in the SCHEMA header — exactly
  the public HoodieAvroDataBlock layout, decoded here with the
  stdlib Avro codec (sources/avro_io.py).
- DELETE (1): BE-int content format version, BE-int payload size,
  then an Avro-array of {recordKey, partitionPath, orderingVal}
  records (the HoodieDeleteRecordList shape).
- COMMAND (0): the rollback marker. A failed MOR write that was
  rolled back leaves a command block whose COMMAND_BLOCK_TYPE header
  is ROLLBACK_PREVIOUS_BLOCK (enum ordinal 0) and whose
  TARGET_INSTANT_TIME header names the dead instant; content is
  empty. Readers MASK every block carrying that instant — a
  rolled-back instant time is never retried (retries get a fresh
  instant), so the masking is chain-wide per the public
  AbstractHoodieLogRecordReader semantics. parse_log_entries emits
  them as ('<block instant>', 'rollback', {'targetInstant': ...})
  entries; the merge layer applies the mask (sources/hudi.py) so a
  rollback living in a LATER log file of the same slice still
  shadows the dead blocks.
- HFILE_DATA (4) and PARQUET_DATA (5) refuse by name (the container
  ships no HFile reader; parquet log blocks are a 1.x layout this
  table version never writes). Non-rollback command types refuse by
  name.

Reference parity: SURVEY.md §2.2 Sources — the reference reads
lakehouse tables through its connector tier; MERGE_ON_READ is the
default table type for streaming Hudi ingest, so a Hudi connector
that only reads COPY_ON_WRITE misses production tables.
"""

from __future__ import annotations

import io
import json
import struct

from archetype_spark.sources import avro_io

MAGIC = b"#HUDI#"
LOG_FORMAT_VERSION = 1

#: HoodieLogBlockType ordinals (public enum order)
COMMAND_BLOCK = 0
DELETE_BLOCK = 1
CORRUPT_BLOCK = 2
AVRO_DATA_BLOCK = 3
HFILE_DATA_BLOCK = 4
PARQUET_DATA_BLOCK = 5
CDC_DATA_BLOCK = 6

#: HeaderMetadataType ordinals (public enum order)
INSTANT_TIME = 0
TARGET_INSTANT_TIME = 1
SCHEMA = 2
COMMAND_BLOCK_TYPE = 3

_DELETE_LIST_SCHEMA = {
    "type": "array",
    "items": {
        "type": "record",
        "name": "HoodieDeleteRecord",
        "fields": [
            {"name": "recordKey", "type": "string"},
            {"name": "partitionPath", "type": "string"},
            {"name": "orderingVal", "type": "long"},
        ],
    },
}


def _encode_kv(entries: dict[int, str]) -> bytes:
    out = io.BytesIO()
    out.write(struct.pack(">i", len(entries)))
    for key in sorted(entries):
        raw = entries[key].encode("utf-8")
        out.write(struct.pack(">ii", key, len(raw)))
        out.write(raw)
    return out.getvalue()


def _decode_kv(buf: io.BytesIO) -> dict[int, str]:
    (n,) = struct.unpack(">i", buf.read(4))
    out: dict[int, str] = {}
    for _ in range(n):
        key, size = struct.unpack(">ii", buf.read(8))
        out[key] = buf.read(size).decode("utf-8")
    return out


def write_block(
    btype: int, header: dict[int, str], content: bytes
) -> bytes:
    """One framed log block (module docstring layout)."""
    hdr = _encode_kv(header)
    ftr = _encode_kv({})
    # blocksize covers version..reverse-pointer; total adds magic+size
    blocksize = 4 + 4 + len(hdr) + 8 + len(content) + len(ftr) + 8
    total = len(MAGIC) + 8 + blocksize
    out = io.BytesIO()
    out.write(MAGIC)
    out.write(struct.pack(">q", blocksize))
    out.write(struct.pack(">ii", LOG_FORMAT_VERSION, btype))
    out.write(hdr)
    out.write(struct.pack(">q", len(content)))
    out.write(content)
    out.write(ftr)
    out.write(struct.pack(">q", total))
    return out.getvalue()


def read_blocks(data: bytes, name: str = "<bytes>"):
    """-> list of (block_type, header, content). Strict framing: a
    bad magic or a reverse pointer that disagrees with the walk
    raises (never silently resyncs past corruption)."""
    buf = io.BytesIO(data)
    out = []
    while True:
        start = buf.tell()
        magic = buf.read(len(MAGIC))
        if not magic:
            break
        if magic != MAGIC:
            raise ValueError(f"bad Hudi log block magic in {name}")
        (blocksize,) = struct.unpack(">q", buf.read(8))
        version, btype = struct.unpack(">ii", buf.read(8))
        if version != LOG_FORMAT_VERSION:
            raise NotImplementedError(
                f"Hudi log format version {version} in {name}: only "
                f"version {LOG_FORMAT_VERSION} is implemented"
            )
        header = _decode_kv(buf)
        (clen,) = struct.unpack(">q", buf.read(8))
        content = buf.read(clen)
        if len(content) != clen:
            raise ValueError(f"truncated Hudi log block in {name}")
        _decode_kv(buf)  # footer
        (total,) = struct.unpack(">q", buf.read(8))
        if buf.tell() - start != total:
            raise ValueError(
                f"Hudi log block reverse pointer mismatch in {name}"
            )
        out.append((btype, header, content))
    return out


# ----------------------------------------------------------- data blocks


def avro_data_block(
    records: list[dict], schema: dict, instant: str
) -> bytes:
    """An AVRO_DATA block: records binary-encoded against `schema`
    (carried in the SCHEMA header), INSTANT_TIME stamped — the public
    HoodieAvroDataBlock content layout (format version 3)."""
    body = io.BytesIO()
    body.write(struct.pack(">ii", 3, len(records)))
    names: dict = {}
    for rec in records:
        one = io.BytesIO()
        avro_io._encode(schema, rec, one, names)
        raw = one.getvalue()
        body.write(struct.pack(">i", len(raw)))
        body.write(raw)
    return write_block(
        AVRO_DATA_BLOCK,
        {INSTANT_TIME: instant, SCHEMA: json.dumps(schema)},
        body.getvalue(),
    )


def decode_avro_data(header: dict[int, str], content: bytes) -> list[dict]:
    schema = json.loads(header[SCHEMA])
    buf = io.BytesIO(content)
    fmt, n = struct.unpack(">ii", buf.read(8))
    if fmt != 3:
        raise NotImplementedError(
            f"Hudi avro data block content version {fmt}: only 3"
        )
    names: dict = {}
    out = []
    for _ in range(n):
        (size,) = struct.unpack(">i", buf.read(4))
        out.append(
            avro_io._decode(schema, io.BytesIO(buf.read(size)), names)
        )
    return out


def delete_block(
    keys: list[tuple[str, str, int]], instant: str
) -> bytes:
    """A DELETE block: (recordKey, partitionPath, orderingVal) tuples
    as the Avro HoodieDeleteRecordList shape."""
    body = io.BytesIO()
    names: dict = {}
    avro_io._encode(
        _DELETE_LIST_SCHEMA,
        [
            {"recordKey": k, "partitionPath": p, "orderingVal": o}
            for k, p, o in keys
        ],
        body,
        names,
    )
    payload = body.getvalue()
    return write_block(
        DELETE_BLOCK,
        {INSTANT_TIME: instant},
        struct.pack(">ii", 3, len(payload)) + payload,
    )


def decode_delete(content: bytes) -> list[dict]:
    buf = io.BytesIO(content)
    fmt, _size = struct.unpack(">ii", buf.read(8))
    if fmt != 3:
        raise NotImplementedError(
            f"Hudi delete block content version {fmt}: only 3"
        )
    return avro_io._decode(_DELETE_LIST_SCHEMA, buf, {})


#: HoodieCommandBlockTypeEnum ordinals (public enum order)
ROLLBACK_PREVIOUS_BLOCK = 0


def rollback_block(target_instant: str, instant: str) -> bytes:
    """A COMMAND block masking `target_instant`'s blocks — what the
    real writer appends to a slice's log after rolling back a failed
    write. Empty content; the action rides the headers."""
    return write_block(
        COMMAND_BLOCK,
        {
            INSTANT_TIME: instant,
            TARGET_INSTANT_TIME: target_instant,
            COMMAND_BLOCK_TYPE: str(ROLLBACK_PREVIOUS_BLOCK),
        },
        b"",
    )


def log_file_name(
    file_id: str, base_instant: str, version: int, token: str = "0-0-0"
) -> str:
    return f".{file_id}_{base_instant}.log.{version}_{token}"


def parse_log_entries(data: bytes, name: str = "<bytes>"):
    """Flatten a log file into merge-ready entries, in block order:
    (instant, op, record) where op is 'upsert' (record = the avro
    dict), 'delete' (record = the HoodieDeleteRecord dict) or
    'rollback' (record = {'targetInstant': ...} — the caller masks
    the target instant's entries chain-wide, see module docstring).
    HFile/parquet/CDC and non-rollback command blocks refuse by name
    — silently skipping an unreadable block would resolve a WRONG
    snapshot."""
    out = []
    for btype, header, content in read_blocks(data, name=name):
        instant = header.get(INSTANT_TIME, "")
        if btype == AVRO_DATA_BLOCK:
            for rec in decode_avro_data(header, content):
                out.append((instant, "upsert", rec))
        elif btype == DELETE_BLOCK:
            for rec in decode_delete(content):
                out.append((instant, "delete", rec))
        elif btype == COMMAND_BLOCK:
            ctype = header.get(COMMAND_BLOCK_TYPE, "")
            if ctype != str(ROLLBACK_PREVIOUS_BLOCK):
                raise NotImplementedError(
                    f"Hudi command block type {ctype!r} in {name}: "
                    "only rollback (0) is modeled"
                )
            target = header.get(TARGET_INSTANT_TIME)
            if not target:
                raise ValueError(
                    f"Hudi rollback block in {name} carries no "
                    "TARGET_INSTANT_TIME header"
                )
            out.append((instant, "rollback", {"targetInstant": target}))
        elif btype == HFILE_DATA_BLOCK:
            raise NotImplementedError(
                f"Hudi HFile log block in {name}: the container ships "
                "no HFile reader (hbase) — avro-block logs only"
            )
        elif btype == PARQUET_DATA_BLOCK:
            raise NotImplementedError(
                f"Hudi parquet log block in {name}: a 1.x layout this "
                "table version never writes"
            )
        else:
            raise NotImplementedError(
                f"Hudi log block type {btype} in {name}"
            )
    return out
