"""PDF text extraction (operators/pdf_text): writer/reader round
trips (compressed + plain, Tj line breaks, TJ segment concatenation,
escapes incl. octal and nesting), hex strings, multi-page trees,
damaged-/Length recovery, loud refusals (non-PDF, unknown filters,
CID fonts, codepoints past latin-1), and the Spark faces
(synth_pdf_from_text -> pdf_fields)."""

from __future__ import annotations

import re
import zlib

import pytest
from pyspark.sql import functions as F

from archetype_spark.operators import pdf_text


def test_tj_segments_concatenate_to_identity():
    text = "Hello (world) \\ with specials & high\xe9 byte\tand more"
    pdf = pdf_text.pdf_encode_text(
        [[[text[i:i + 20] for i in range(0, len(text), 20)]]]
    )
    assert pdf_text.pdf_text_pages(pdf) == [text]


@pytest.mark.parametrize("compress", [True, False])
def test_tj_vs_tj_linebreaks(compress):
    pdf = pdf_text.pdf_encode_text(
        [["line one", "line two"], ["page two"]], compress=compress
    )
    assert pdf_text.pdf_text_pages(pdf) == ["line one\nline two", "page two"]


def test_escapes_roundtrip():
    tricky = "()\\\n\r\t\b\f\x01\x7f\xff plain"
    pdf = pdf_text.pdf_encode_text([[tricky]], compress=False)
    assert pdf_text.pdf_text_pages(pdf) == [tricky]


def test_hex_string_and_quote_operators():
    content = b"BT /F1 12 Tf (a) Tj <4243> Tj (c) ' ET"
    assert pdf_text._content_text(content) == "aBC\nc"


def test_octal_and_continuation_in_literal():
    s, end = pdf_text._literal_string(b"(A\\101\\\nB\\053)", 0)
    assert s == b"AAB+"


def test_damaged_length_falls_back_to_endstream_scan():
    pdf = bytearray(pdf_text.pdf_encode_text([["recoverable"]], compress=False))
    m = re.search(rb"/Length (\d+)", pdf)
    pdf[m.start(1):m.end(1)] = b"9" * (m.end(1) - m.start(1))
    assert pdf_text.pdf_text_pages(bytes(pdf)) == ["recoverable"]


def test_flate_stream_is_actually_compressed():
    text = "z" * 500
    pdf = pdf_text.pdf_encode_text([[text]])
    assert b"FlateDecode" in pdf
    assert text.encode() not in pdf  # the bytes only exist inflated
    assert pdf_text.pdf_text_pages(pdf) == [text]
    # and the stream inflates with plain zlib (spec conformance)
    m = re.search(rb"stream\r?\n", pdf)
    end = pdf.find(b"\nendstream", m.end())
    assert "z" * 500 in zlib.decompress(pdf[m.end():end]).decode()


def test_refusals():
    with pytest.raises(ValueError, match="not a PDF"):
        pdf_text.pdf_text_pages(b"plain bytes")
    good = pdf_text.pdf_encode_text([["x"]], compress=False)
    with pytest.raises(NotImplementedError, match="FlateDecode"):
        pdf_text.pdf_text_pages(
            good.replace(b"<< /Length", b"<< /Filter /DCTDecode /Length")
        )
    with pytest.raises(NotImplementedError, match="CID|Type0"):
        pdf_text.pdf_text_pages(
            good.replace(b"/Type1", b"/Type0")
        )
    with pytest.raises(NotImplementedError, match="U\\+4E16"):
        pdf_text.pdf_encode_text([["世"]])


def test_three_page_tree_order():
    pdf = pdf_text.pdf_encode_text([["p1"], ["p2"], ["p3"]])
    assert pdf_text.pdf_text_pages(pdf) == ["p1", "p2", "p3"]


def test_spark_faces(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "x" * 100)], "doc_id long, text string"
    )
    pdfs = pdf_text.synth_pdf_from_text(df, seg=7)
    out = pdf_text.pdf_fields(pdfs, "payload").orderBy("doc_id")
    rows = out.select(
        "doc_id",
        "n_pages",
        F.split("pdf_text", "\f").getItem(0).alias("page1"),
        F.split("pdf_text", "\f").getItem(1).alias("page2"),
    ).collect()
    assert [(r.doc_id, r.n_pages) for r in rows] == [(1, 2), (2, 2)]
    assert rows[0].page1 == "alpha beta gamma" and rows[0].page2 == "doc 1"
    assert rows[1].page1 == "x" * 100
