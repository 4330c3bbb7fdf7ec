"""Minimal Apache Avro Object Container File codec — stdlib only.

Exists to make Iceberg metadata readable/writable in this container
(Iceberg manifests and manifest lists are Avro; no avro package is
installed). Implements the PUBLIC Avro 1.11 spec subset that metadata
files use:

- binary encoding: null/boolean/int/long (zigzag varint), float/
  double (LE), bytes/string (length-prefixed), fixed, enum (int),
  array and map (block runs, 0-terminated; negative counts carry a
  byte size we honor on read and never emit on write), record (fields
  in declared order), union (branch index + value).
- container framing: magic `Obj\\x01`, file-metadata map carrying
  `avro.schema` (writer schema JSON) + `avro.codec`, 16-byte sync
  marker, then (count, size, payload, sync) blocks. Codecs: null,
  deflate (raw zlib, -15 window).

The DECODER is fully schema-driven by the file's own embedded writer
schema, so foreign-written manifests (real Iceberg writers add extra
fields) parse into plain dicts without this module knowing their
layout. The ENCODER covers the types our Iceberg writer emits.
Unsupported spec corners (logical-type semantics beyond passthrough,
schema resolution against a different reader schema, snappy codec)
raise loudly.
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib

MAGIC = b"Obj\x01"


# ------------------------------------------------------------------ primitives


def _read_long(buf: io.BytesIO) -> int:
    """zigzag varint."""
    shift = 0
    acc = 0
    while True:
        b = buf.read(1)
        if not b:
            raise EOFError("truncated varint")
        byte = b[0]
        acc |= (byte & 0x7F) << shift
        if not byte & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)


def _write_long(out: io.BytesIO, n: int) -> None:
    n = (n << 1) ^ (n >> 63) if n < 0 else n << 1
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.write(bytes([b | 0x80]))
        else:
            out.write(bytes([b]))
            break


def _read_bytes(buf: io.BytesIO) -> bytes:
    n = _read_long(buf)
    data = buf.read(n)
    if len(data) != n:
        raise EOFError("truncated bytes")
    return data


def _write_bytes(out: io.BytesIO, data: bytes) -> None:
    _write_long(out, len(data))
    out.write(data)


# -------------------------------------------------------------- schema-driven


def _decode(schema, buf: io.BytesIO, names: dict):
    """Decode one value of `schema` (parsed JSON) from `buf`."""
    if isinstance(schema, str):
        if schema in names:  # named-type reference
            return _decode(names[schema], buf, names)
        t = schema
    elif isinstance(schema, list):  # union
        idx = _read_long(buf)
        return _decode(schema[idx], buf, names)
    else:
        t = schema["type"]
    if t == "null":
        return None
    if t == "boolean":
        b = buf.read(1)
        if not b:
            raise EOFError("truncated boolean")
        return b == b"\x01"
    if t in ("int", "long"):
        return _read_long(buf)
    if t == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if t == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if t == "bytes":
        return _read_bytes(buf)
    if t == "string":
        return _read_bytes(buf).decode("utf-8")
    if t == "fixed":
        _register(schema, names)
        data = buf.read(schema["size"])
        if len(data) != schema["size"]:
            raise EOFError("truncated fixed")
        return data
    if t == "enum":
        _register(schema, names)
        return schema["symbols"][_read_long(buf)]
    if t == "array":
        out = []
        while True:
            n = _read_long(buf)
            if n == 0:
                break
            if n < 0:
                _read_long(buf)  # block byte size — skip, decode items
                n = -n
            for _ in range(n):
                out.append(_decode(schema["items"], buf, names))
        return out
    if t == "map":
        out = {}
        while True:
            n = _read_long(buf)
            if n == 0:
                break
            if n < 0:
                _read_long(buf)
                n = -n
            for _ in range(n):
                k = _read_bytes(buf).decode("utf-8")
                out[k] = _decode(schema["values"], buf, names)
        return out
    if t == "record":
        _register(schema, names)
        return {
            f["name"]: _decode(f["type"], buf, names)
            for f in schema["fields"]
        }
    if isinstance(t, (dict, list)):  # {"type": {...nested...}}
        return _decode(t, buf, names)
    raise NotImplementedError(f"avro type {t!r}")


def _register(schema: dict, names: dict) -> None:
    name = schema.get("name")
    if name:
        names[name] = schema
        ns = schema.get("namespace")
        if ns:
            names[f"{ns}.{name}"] = schema


#: Python-type → acceptable Avro kinds, in preference order. bool is
#: checked before int (bool subclasses int); ints prefer the integral
#: branches and only widen to float/double when no integral branch
#: exists (["null","double"] unions), never silently when a long
#: branch is present.
_UNION_KINDS: tuple[tuple[type, tuple[str, ...]], ...] = (
    (bool, ("boolean",)),
    (int, ("long", "int", "double", "float")),
    (float, ("double", "float")),
    (str, ("string", "enum")),
    (bytes, ("bytes", "fixed")),
    (list, ("array",)),
    (dict, ("record", "map")),
)


def _union_branch(schema: list, value, names: dict) -> tuple[int, object]:
    """Pick the union branch whose Avro kind matches the Python type
    of `value` (not merely its null-ness): an int in a
    ["null","double","long"] union encodes under the long branch, not
    as a float. Raises when no branch is type-compatible."""
    kinds = []
    for branch in schema:
        b = names.get(branch, branch) if isinstance(branch, str) else branch
        kinds.append(b if isinstance(b, str) else b.get("type"))
    if value is None:
        if "null" in kinds:
            return kinds.index("null"), schema[kinds.index("null")]
        raise ValueError(f"no null branch for None in {schema!r}")
    for py_type, avro_kinds in _UNION_KINDS:
        if isinstance(value, py_type):
            for want in avro_kinds:
                if want in kinds:
                    i = kinds.index(want)
                    return i, schema[i]
            break
    raise ValueError(
        f"no union branch for {type(value).__name__} value {value!r} "
        f"in {schema!r}"
    )


def _encode(schema, value, out: io.BytesIO, names: dict) -> None:
    if isinstance(schema, str):
        if schema in names:
            return _encode(names[schema], value, out, names)
        t = schema
    elif isinstance(schema, list):  # union: branch by Python-type fit
        i, branch = _union_branch(schema, value, names)
        _write_long(out, i)
        return _encode(branch, value, out, names)
    else:
        t = schema["type"]
    if t == "null":
        return
    if t == "boolean":
        out.write(b"\x01" if value else b"\x00")
        return
    if t in ("int", "long"):
        _write_long(out, int(value))
        return
    if t == "float":
        out.write(struct.pack("<f", value))
        return
    if t == "double":
        out.write(struct.pack("<d", value))
        return
    if t == "bytes":
        _write_bytes(out, value)
        return
    if t == "string":
        _write_bytes(out, value.encode("utf-8"))
        return
    if t == "fixed":
        _register(schema, names)
        out.write(value)
        return
    if t == "array":
        if value:
            _write_long(out, len(value))
            for item in value:
                _encode(schema["items"], item, out, names)
        _write_long(out, 0)
        return
    if t == "map":
        if value:
            _write_long(out, len(value))
            for k, v in value.items():
                _write_bytes(out, k.encode("utf-8"))
                _encode(schema["values"], v, out, names)
        _write_long(out, 0)
        return
    if t == "record":
        _register(schema, names)
        for f in schema["fields"]:
            try:
                _encode(f["type"], value.get(f["name"]), out, names)
            except ValueError as e:
                raise ValueError(f"field {f['name']}: {e}") from e
        return
    if isinstance(t, (dict, list)):
        return _encode(t, value, out, names)
    raise NotImplementedError(f"avro type {t!r}")


# ----------------------------------------------------------------- containers

_META_SCHEMA = {"type": "map", "values": "bytes"}


def read_container(path: str):
    """-> (writer_schema: dict, records: list). Whole-file read —
    Iceberg metadata files are KBs-to-MBs, driver-side."""
    with open(path, "rb") as fh:
        data = fh.read()
    return read_container_bytes(data, name=path)


def read_container_bytes(data: bytes, name: str = "<bytes>"):
    """read_container over in-memory bytes — the executor-side entry
    point (Avro DATA files arrive as binaryFile content on workers;
    there is no shared local path to reopen)."""
    buf = io.BytesIO(data)
    if buf.read(4) != MAGIC:
        raise ValueError(f"not an Avro container: {name}")
    meta = _decode(_META_SCHEMA, buf, {})
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    if codec not in ("null", "deflate"):
        raise NotImplementedError(f"avro codec {codec!r}")
    sync = buf.read(16)
    records = []
    names: dict = {}
    while True:
        probe = buf.read(1)
        if not probe:
            break
        buf.seek(-1, os.SEEK_CUR)
        n = _read_long(buf)
        size = _read_long(buf)
        payload = buf.read(size)
        if codec == "deflate":
            payload = zlib.decompress(payload, -15)
        block = io.BytesIO(payload)
        for _ in range(n):
            records.append(_decode(schema, block, names))
        if buf.read(16) != sync:
            raise ValueError(f"sync marker mismatch in {name}")
    return schema, records


def write_container(
    path: str, schema: dict, records: list, codec: str = "deflate"
) -> None:
    if codec not in ("null", "deflate"):
        raise NotImplementedError(f"avro codec {codec!r}")
    body = io.BytesIO()
    names: dict = {}
    for r in records:
        _encode(schema, r, body, names)
    payload = body.getvalue()
    if codec == "deflate":
        comp = zlib.compressobj(9, zlib.DEFLATED, -15)
        payload = comp.compress(payload) + comp.flush()
    sync = os.urandom(16)
    out = io.BytesIO()
    out.write(MAGIC)
    _encode(
        _META_SCHEMA,
        {
            "avro.schema": json.dumps(schema).encode("utf-8"),
            "avro.codec": codec.encode("utf-8"),
        },
        out,
        {},
    )
    out.write(sync)
    _write_long(out, len(records))
    _write_long(out, len(payload))
    out.write(payload)
    out.write(sync)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as fh:
        fh.write(out.getvalue())
