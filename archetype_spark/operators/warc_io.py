"""WARC (Web ARChive, ISO 28500) ingestion — the container web
corpora actually arrive in (Common Crawl publishes WARC/WET/WAT),
stdlib only. Upstream of html_text: a real training-data pipeline is
WARC record split -> HTTP response split -> HTML -> text -> curation,
and q135 gates that whole chain against a source-column digest.

- `parse_warc(payload)`: WARC records from a raw byte stream in
  either layout the ecosystem uses — per-record gzip members (the
  Common Crawl convention; stdlib zlib walks member boundaries) or
  uncompressed concatenation. Each record: the WARC/1.X version
  line, headers to the blank line (folded continuation lines
  honored), exactly Content-Length block bytes, and the record
  separator. Returns (headers dict lowercase, block bytes).
- `split_http_response(block)`: status code, lowercase header dict
  and body of an application/http block (response records store the
  full HTTP message). Chunked transfer-encoding is decoded; other
  encodings refuse loudly (returning a still-encoded body as "the
  page" would be silently wrong text).
- `warc_records(df, col)`: the Spark face — one output row per
  record with (record_idx, warc_type, target_uri, content_type,
  http_status, body); response records pass through the HTTP split,
  conversion/metadata records (WET/WAT) carry their block verbatim.
  Arrow-batched mapInPandas; payloads never touch the driver.
- `warc_encode(records, gzip_members=True)`: a spec-shaped writer
  for fixtures — correct Content-Length accounting, per-record gzip
  members, HTTP wrapping for response records.
"""

from __future__ import annotations

import sys
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

try:  # pyspark vendors cloudpickle; plain cloudpickle as fallback
    from pyspark.cloudpickle import register_pickle_by_value
except ImportError:  # pragma: no cover
    from cloudpickle import register_pickle_by_value


def _gunzip_members(data: bytes) -> list[bytes]:
    """Decompress a stream of CONCATENATED gzip members, one output
    chunk per member (zlib's unused_data marks each boundary)."""
    out = []
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(wbits=31)
        chunk = d.decompress(data[pos:])
        if not d.eof:
            raise ValueError("gzip member truncated inside WARC stream")
        out.append(chunk + d.flush())
        consumed = len(data) - pos - len(d.unused_data)
        if consumed <= 0:
            raise ValueError("gzip member consumed no bytes")
        pos += consumed
    return out


def _parse_records_plain(data: bytes) -> list[tuple[dict, bytes]]:
    records = []
    pos = 0
    while pos < len(data):
        # tolerate separator residue between records
        while data[pos:pos + 2] in (b"\r\n",) or data[pos:pos + 1] == b"\n":
            pos += 2 if data[pos:pos + 2] == b"\r\n" else 1
        if pos >= len(data):
            break
        if not data.startswith(b"WARC/", pos):
            raise ValueError(
                f"WARC version line not found at byte {pos}: "
                f"{data[pos:pos + 20]!r}"
            )
        hdr_end = data.find(b"\r\n\r\n", pos)
        if hdr_end == -1:
            raise ValueError("WARC header block not terminated")
        head = data[pos:hdr_end].decode("utf-8", "replace")
        lines = head.split("\r\n")
        headers: dict[str, str] = {}
        last = None
        for line in lines[1:]:
            if line[:1] in (" ", "\t") and last:  # folded continuation
                headers[last] += " " + line.strip()
                continue
            k, _, v = line.partition(":")
            last = k.strip().lower()
            headers[last] = v.strip()
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError):
            raise ValueError(
                "WARC record lacks a numeric Content-Length"
            ) from None
        body_at = hdr_end + 4
        block = data[body_at:body_at + length]
        if len(block) < length:
            raise ValueError("WARC record block truncated")
        records.append((headers, block))
        pos = body_at + length
    return records


def parse_warc(payload: bytes) -> list[tuple[dict, bytes]]:
    """All records of a WARC byte stream (gzip members or plain)."""
    p = bytes(payload or b"")
    if p[:2] == b"\x1f\x8b":
        records = []
        for member in _gunzip_members(p):
            records.extend(_parse_records_plain(member))
        return records
    return _parse_records_plain(p)


def split_http_response(block: bytes):
    """(status int, headers dict lowercase, body bytes) of an HTTP
    response message. Chunked bodies are decoded; any other
    Transfer/Content-Encoding refuses loudly."""
    hdr_end = block.find(b"\r\n\r\n")
    if hdr_end == -1:
        raise ValueError("HTTP message has no header terminator")
    head = block[:hdr_end].decode("iso-8859-1")
    lines = head.split("\r\n")
    parts = lines[0].split(None, 2)
    if len(parts) < 2 or not parts[0].startswith("HTTP/"):
        raise ValueError(f"not an HTTP response status line: {lines[0]!r}")
    status = int(parts[1])
    headers: dict[str, str] = {}
    for line in lines[1:]:
        k, _, v = line.partition(":")
        headers[k.strip().lower()] = v.strip()
    body = block[hdr_end + 4:]
    te = headers.get("transfer-encoding", "").lower()
    if te == "chunked":
        out = bytearray()
        pos = 0
        while True:
            eol = body.find(b"\r\n", pos)
            if eol == -1:
                raise ValueError("chunked body truncated (no size line)")
            size = int(body[pos:eol].split(b";")[0], 16)
            pos = eol + 2
            if size == 0:
                break
            out += body[pos:pos + size]
            if body[pos + size:pos + size + 2] != b"\r\n":
                raise ValueError("chunk not CRLF-terminated")
            pos += size + 2
        body = bytes(out)
    elif te:
        raise NotImplementedError(f"HTTP transfer-encoding {te!r}")
    ce = headers.get("content-encoding", "").lower()
    if ce in ("gzip", "x-gzip"):
        body = zlib.decompress(body, wbits=31)
    elif ce == "deflate":
        body = zlib.decompress(body)
    elif ce and ce != "identity":
        raise NotImplementedError(f"HTTP content-encoding {ce!r}")
    return status, headers, body


WARC_RECORDS_SCHEMA = StructType(
    [
        StructField("record_idx", IntegerType(), False),
        StructField("warc_type", StringType(), True),
        StructField("target_uri", StringType(), True),
        StructField("content_type", StringType(), True),
        StructField("http_status", IntegerType(), True),
        StructField("body", BinaryType(), True),
    ]
)


def warc_records(df: DataFrame, col: str = "payload") -> DataFrame:
    """Explode WARC payloads into records: one output row per record,
    keyed by the input's non-payload columns. `body` is the HTTP
    response body for response records (status split out), the block
    verbatim otherwise (WET conversion text, WAT metadata)."""
    keep = [f for f in df.schema.fields if f.name != col]
    out_schema = StructType(list(keep) + list(WARC_RECORDS_SCHEMA.fields))
    keep_names = [f.name for f in keep]

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in range(len(pdf)):
                base = {k: pdf[k].iloc[i] for k in keep_names}
                for idx, (hdrs, block) in enumerate(
                    parse_warc(bytes(pdf[col].iloc[i] or b""))
                ):
                    wtype = hdrs.get("warc-type")
                    ctype = hdrs.get("content-type")
                    status, body = None, block
                    if wtype == "response" and (ctype or "").startswith(
                        "application/http"
                    ):
                        status, _h, body = split_http_response(block)
                    rows.append(
                        {
                            **base,
                            "record_idx": idx,
                            "warc_type": wtype,
                            "target_uri": hdrs.get("warc-target-uri"),
                            "content_type": ctype,
                            "http_status": status,
                            "body": body,
                        }
                    )
            out = pd.DataFrame(
                rows, columns=keep_names + [f.name for f in WARC_RECORDS_SCHEMA.fields]
            )
            out["record_idx"] = out["record_idx"].astype("int32")
            yield out

    return df.mapInPandas(process, schema=out_schema)


# ---------------------------------------------------------------- writer
def warc_encode(records, gzip_members: bool = True) -> bytes:
    """WARC bytes from record specs, each a dict with `warc_type`,
    optional `target_uri`, and either `body` (stored verbatim with
    `content_type`) or `http_body` (+ optional `http_status`,
    `http_content_type`) wrapped as an application/http response —
    the Common Crawl layout. One gzip member per record when
    `gzip_members` (the convention that keeps WARCs splittable)."""
    out = bytearray()
    for i, spec in enumerate(records):
        if "http_body" in spec:
            body = bytes(spec["http_body"])
            status = int(spec.get("http_status", 200))
            http = (
                f"HTTP/1.1 {status} OK\r\n"
                f"Content-Type: {spec.get('http_content_type', 'text/html')}\r\n"
                f"Content-Length: {len(body)}\r\n\r\n"
            ).encode("ascii") + body
            block = http
            ctype = "application/http; msgtype=response"
            wtype = spec.get("warc_type", "response")
        else:
            block = bytes(spec["body"])
            ctype = spec.get("content_type", "text/plain")
            wtype = spec.get("warc_type", "conversion")
        head = [f"WARC/1.0", f"WARC-Type: {wtype}"]
        if spec.get("target_uri"):
            head.append(f"WARC-Target-URI: {spec['target_uri']}")
        head.append(f"WARC-Record-ID: <urn:fixture:{i}>")
        head.append(f"Content-Type: {ctype}")
        head.append(f"Content-Length: {len(block)}")
        rec = (
            "\r\n".join(head).encode("ascii")
            + b"\r\n\r\n" + block + b"\r\n\r\n"
        )
        if gzip_members:
            co = zlib.compressobj(wbits=31)
            rec = co.compress(rec) + co.flush()
        out += rec
    return bytes(out)


def synth_warc_from_text(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, payload) with payload a two-record gzip-member WARC: a
    warcinfo record plus an HTTP response whose HTML body escapes the
    text losslessly into a <pre> main block (the q133 synthesis shape
    one container further out). q135's fixture face."""
    from html import escape

    out_schema = f"{id_col} long, payload binary"

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for did, t in zip(pdf[id_col], pdf[text_col]):
                html = (
                    f"<html><head><title>doc {did}</title></head>"
                    f"<body><nav>menu menu</nav><pre>{escape(t)}</pre>"
                    f"</body></html>"
                )
                payloads.append(
                    warc_encode(
                        [
                            {
                                "warc_type": "warcinfo",
                                "body": b"software: fixture",
                                "content_type": "application/warc-fields",
                            },
                            {
                                "http_body": html.encode("utf-8"),
                                "target_uri": f"http://fixture/doc/{did}",
                                "http_content_type": "text/html; charset=utf-8",
                            },
                        ]
                    )
                )
            yield pd.DataFrame({id_col: pdf[id_col], "payload": payloads})

    from archetype_spark.operators.util import fan_out_if_narrow

    # Single-file corpora land the WARC build (and the downstream
    # record/HTTP/HTML parses, which inherit this width) in ONE task;
    # no-op on already-wide inputs (util.fan_out_if_narrow).
    src = fan_out_if_narrow(df.select(id_col, text_col))
    return src.mapInPandas(process, schema=out_schema)


register_pickle_by_value(sys.modules[__name__])
