"""WARC ingestion (operators/warc_io): record parsing in both
layouts (per-record gzip members, plain concatenation), header
folding, HTTP response splitting (status/headers/body, chunked
transfer decode, gzip/deflate content decode), loud refusals, the
Spark explode face, and the synth->parse identity the q135 chain
builds on."""

from __future__ import annotations

import zlib

import pytest
from pyspark.sql import functions as F

from archetype_spark.operators import warc_io


def _sample(gz: bool) -> bytes:
    return warc_io.warc_encode(
        [
            {
                "warc_type": "warcinfo",
                "body": b"software: fixture",
                "content_type": "application/warc-fields",
            },
            {
                "http_body": b"<html>page one</html>",
                "target_uri": "http://x/1",
            },
            {
                "warc_type": "conversion",
                "body": b"plain text record",
                "target_uri": "http://x/1",
                "content_type": "text/plain",
            },
        ],
        gzip_members=gz,
    )


@pytest.mark.parametrize("gz", [True, False])
def test_parse_both_layouts(gz):
    recs = warc_io.parse_warc(_sample(gz))
    assert [h["warc-type"] for h, _ in recs] == [
        "warcinfo", "response", "conversion",
    ]
    assert recs[1][0]["warc-target-uri"] == "http://x/1"
    status, hdrs, body = warc_io.split_http_response(recs[1][1])
    assert status == 200 and body == b"<html>page one</html>"
    assert hdrs["content-type"] == "text/html"
    assert recs[2][1] == b"plain text record"


def test_gzip_members_are_independent():
    # each record is its own member: truncating after member 1 still
    # yields record 1 (the property that keeps WARCs splittable)
    data = _sample(True)
    d = zlib.decompressobj(wbits=31)
    d.decompress(data)
    first_len = len(data) - len(d.unused_data)
    recs = warc_io.parse_warc(data[:first_len])
    assert len(recs) == 1 and recs[0][0]["warc-type"] == "warcinfo"


def test_header_folding():
    block = b"x"
    raw = (
        b"WARC/1.0\r\nWARC-Type: metadata\r\nWARC-Long: start\r\n"
        b"  folded tail\r\nContent-Length: 1\r\n\r\n" + block + b"\r\n\r\n"
    )
    recs = warc_io.parse_warc(raw)
    assert recs[0][0]["warc-long"] == "start folded tail"


def test_http_chunked_and_encodings():
    chunked = b"6\r\nchunky\r\n5\r\n-body\r\n0\r\n\r\n"
    msg = b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n" + chunked
    assert warc_io.split_http_response(msg)[2] == b"chunky-body"
    co = zlib.compressobj(wbits=31)
    gz = co.compress(b"payload") + co.flush()
    msg = b"HTTP/1.1 404 NF\r\nContent-Encoding: gzip\r\n\r\n" + gz
    status, _h, body = warc_io.split_http_response(msg)
    assert (status, body) == (404, b"payload")
    msg = b"HTTP/1.1 200 OK\r\nContent-Encoding: br\r\n\r\nxx"
    with pytest.raises(NotImplementedError, match="br"):
        warc_io.split_http_response(msg)


def test_refusals():
    with pytest.raises(ValueError, match="version line"):
        warc_io.parse_warc(b"HTTP/1.1 200 OK\r\n\r\n")
    with pytest.raises(ValueError, match="Content-Length"):
        warc_io.parse_warc(b"WARC/1.0\r\nWARC-Type: x\r\n\r\nbody\r\n\r\n")
    truncated = (
        b"WARC/1.0\r\nWARC-Type: x\r\nContent-Length: 99\r\n\r\nshort"
    )
    with pytest.raises(ValueError, match="truncated"):
        warc_io.parse_warc(truncated)


def test_spark_explode_face(spark):
    df = spark.createDataFrame(
        [(1, bytearray(_sample(True))), (2, bytearray(_sample(False)))],
        "doc_id long, payload binary",
    )
    out = (
        warc_io.warc_records(df, "payload")
        .orderBy("doc_id", "record_idx")
        .collect()
    )
    assert len(out) == 6
    assert [r.warc_type for r in out[:3]] == [
        "warcinfo", "response", "conversion",
    ]
    assert out[1].http_status == 200
    assert bytes(out[1].body) == b"<html>page one</html>"
    assert out[0].http_status is None


def test_synth_chain_identity(spark):
    from archetype_spark.operators.html_text import html_fields

    text = "Hello & <world> with  spacing "
    df = spark.createDataFrame([(7, text)], "doc_id long, text string")
    recs = warc_io.warc_records(warc_io.synth_warc_from_text(df), "payload")
    resp = recs.filter(F.col("warc_type") == "response").select(
        "doc_id", "target_uri", F.decode("body", "UTF-8").alias("html")
    )
    row = html_fields(resp, "html").collect()[0]
    assert row.main_text == text
    assert row.target_uri == "http://fixture/doc/7"
    assert row.title == "doc 7"
