"""Dependency-free PDF text extraction (stdlib only) — the document
half of the web-corpus ingestion tier beside html_text: real document
corpora arrive as PDF, and a curation pipeline that cannot read them
never sees that data. Implements the PUBLIC PDF 1.4 subset simple
text documents use (ISO 32000 / the classic Adobe spec):

- read (`pdf_text_pages`): object scan (`N G obj ... endobj` — body
  scan rather than xref chase, so mildly damaged files still parse;
  the trailer is only used for /Root), a minimal object-syntax parser
  (dicts, arrays, names, numbers, strings, references), the
  Catalog -> /Pages -> /Kids page-tree walk (nested trees, /Contents
  as one stream or an array), FlateDecode content streams (stdlib
  zlib; any other filter refuses loudly), and a content-stream
  tokenizer that understands literal strings (nesting + all escapes
  incl. octal and line continuations), hex strings, and the text
  operators: Tj, TJ (string items concatenated, kerning numbers
  skipped), ' and " (newline + show), with Td/TD/T*/Tm between shows
  becoming newlines. String bytes decode latin-1 — exact for simple
  (non-CID) fonts; a /Type0 font or /ToUnicode CMap in a page's
  resources refuses loudly (decoding CID text as bytes would be
  silently wrong).
- write (`pdf_encode_text`): a spec-valid single-font writer for
  fixtures/round trips — correct xref byte offsets, optional
  FlateDecode, literal-string escaping (chars > 255 refuse; the
  corpus is ASCII), one content stream per page built from Tj/TJ.

The q134 oracle pins extraction end-to-end the html_text way: a
document's text is embedded losslessly (a TJ array of segments whose
concatenation IS the text), and extraction must return the ORIGINAL
string bit-exactly — the oracle digests the source column, never
this module's output. Per-payload work is pure Python over KB-scale
documents; the Spark boundary stays Arrow-vectorized (mapInPandas).
"""

from __future__ import annotations

import re
import sys
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

try:  # pyspark vendors cloudpickle; plain cloudpickle as fallback
    from pyspark.cloudpickle import register_pickle_by_value
except ImportError:  # pragma: no cover
    from cloudpickle import register_pickle_by_value

_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b", re.S)
_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


# ------------------------------------------------------- object parsing
class _P:
    """Cursor over a PDF object body."""

    def __init__(self, data: bytes, pos: int = 0):
        self.d = data
        self.i = pos

    def _skip_ws(self):
        while self.i < len(self.d):
            c = self.d[self.i:self.i + 1]
            if c == b"%":  # comment to EOL
                while self.i < len(self.d) and self.d[self.i] not in b"\r\n":
                    self.i += 1
            elif c in (b" ", b"\t", b"\r", b"\n", b"\x0c", b"\x00"):
                self.i += 1
            else:
                return

    def value(self):
        self._skip_ws()
        d, i = self.d, self.i
        if d.startswith(b"<<", i):
            self.i += 2
            out = {}
            while True:
                self._skip_ws()
                if self.d.startswith(b">>", self.i):
                    self.i += 2
                    return out
                key = self.value()
                if not isinstance(key, _Name):
                    raise ValueError("PDF dict key is not a name")
                out[str(key)] = self.value()
        if d.startswith(b"[", i):
            self.i += 1
            out = []
            while True:
                self._skip_ws()
                if self.d.startswith(b"]", self.i):
                    self.i += 1
                    return out
                out.append(self.value())
        if d.startswith(b"/", i):
            self.i += 1
            j = self.i
            while j < len(d) and d[j] not in _WS and d[j] not in _DELIM:
                j += 1
            name = d[self.i:j].decode("latin-1")
            self.i = j
            return _Name(name)
        if d.startswith(b"(", i):
            s, self.i = _literal_string(d, i)
            return s
        if d.startswith(b"<", i):
            s, self.i = _hex_string(d, i)
            return s
        m = re.match(rb"(\d+)\s+(\d+)\s+R\b", d[i:])
        if m:
            self.i = i + m.end()
            return _Ref(int(m.group(1)))
        m = re.match(rb"[+-]?(?:\d+\.\d*|\.\d+|\d+)", d[i:])
        if m:
            self.i = i + m.end()
            t = m.group(0)
            return float(t) if b"." in t else int(t)
        for lit, v in ((b"true", True), (b"false", False), (b"null", None)):
            if d.startswith(lit, i):
                self.i = i + len(lit)
                return v
        raise ValueError(f"PDF syntax at byte {i}: {d[i:i+20]!r}")


class _Name(str):
    pass


class _Ref(int):
    pass


_STR_ESC = {
    ord("n"): b"\n", ord("r"): b"\r", ord("t"): b"\t",
    ord("b"): b"\b", ord("f"): b"\x0c",
    ord("("): b"(", ord(")"): b")", ord("\\"): b"\\",
}


def _literal_string(d: bytes, i: int):
    """Parse a ( ) literal string at i -> (bytes, end). Handles
    nesting, the escape set, octal escapes, and escaped newlines."""
    assert d[i:i + 1] == b"("
    i += 1
    depth = 1
    out = bytearray()
    while i < len(d):
        c = d[i]
        if c == 0x5C:  # backslash
            i += 1
            if i >= len(d):
                break
            e = d[i]
            if e in _STR_ESC:
                out += _STR_ESC[e]
                i += 1
            elif 0x30 <= e <= 0x37:  # octal, up to 3 digits
                j = i
                while j < len(d) and j - i < 3 and 0x30 <= d[j] <= 0x37:
                    j += 1
                out.append(int(d[i:j], 8) & 0xFF)
                i = j
            elif e in (0x0A, 0x0D):  # line continuation
                i += 1
                if e == 0x0D and d[i:i + 1] == b"\n":
                    i += 1
            else:
                out.append(e)
                i += 1
            continue
        if c == 0x28:
            depth += 1
        elif c == 0x29:
            depth -= 1
            if depth == 0:
                return bytes(out), i + 1
        out.append(c)
        i += 1
    raise ValueError("PDF literal string not terminated")


def _hex_string(d: bytes, i: int):
    assert d[i:i + 1] == b"<"
    j = d.index(b">", i)
    hx = re.sub(rb"\s", b"", d[i + 1:j])
    if len(hx) % 2:
        hx += b"0"
    return bytes.fromhex(hx.decode("ascii")), j + 1


def _objects(p: bytes) -> dict:
    """num -> (body_start, body_end) for every `N G obj` in the file
    (body scan: xref damage doesn't matter; later definitions win,
    matching incremental-update semantics)."""
    out = {}
    for m in _OBJ_RE.finditer(p):
        end = p.find(b"endobj", m.end())
        if end == -1:
            continue
        out[int(m.group(1))] = (m.end(), end)
    return out


def _resolve(objs: dict, p: bytes, v):
    while isinstance(v, _Ref):
        if int(v) not in objs:
            raise ValueError(f"PDF reference to missing object {int(v)}")
        s, _e = objs[int(v)]
        v = _P(p, s).value()
    return v


def _stream_bytes(objs: dict, p: bytes, ref) -> bytes:
    s, e = objs[int(ref)]
    parser = _P(p, s)
    meta = parser.value()
    ks = p.find(b"stream", parser.i)
    if ks == -1 or ks >= e:
        raise ValueError(f"PDF object {int(ref)} has no stream body")
    ks += len(b"stream")
    if p[ks:ks + 2] == b"\r\n":
        ks += 2
    elif p[ks:ks + 1] == b"\n":
        ks += 1
    length = _resolve(objs, p, meta.get("Length"))
    if isinstance(length, int) and ks + length <= e:
        raw = p[ks:ks + length]
    else:  # damaged /Length: fall back to the endstream scan
        ke = p.rfind(b"endstream", ks, e)
        raw = p[ks:ke if ke != -1 else e]
        if raw.endswith(b"\r\n"):
            raw = raw[:-2]
        elif raw.endswith(b"\n"):
            raw = raw[:-1]
    filt = meta.get("Filter")
    if filt is None:
        return raw
    filts = filt if isinstance(filt, list) else [filt]
    for f in filts:
        if str(f) != "FlateDecode":
            raise NotImplementedError(
                f"PDF stream filter {str(f)!r}: only FlateDecode is "
                "readable without codec libraries"
            )
        raw = zlib.decompress(raw)
    return raw


def _walk_pages(objs: dict, p: bytes, node, acc: list) -> None:
    node = _resolve(objs, p, node)
    t = str(node.get("Type", ""))
    if t == "Pages" or (not t and "Kids" in node):
        for kid in _resolve(objs, p, node["Kids"]):
            _walk_pages(objs, p, kid, acc)
    else:
        acc.append(node)


_TEXT_SHOW = {b"Tj", b"'", b'"'}
_TEXT_BREAK = {b"Td", b"TD", b"T*", b"Tm"}


def _content_text(stream: bytes) -> str:
    """Show-string text of one content stream: Tj/TJ/'/\" contents in
    order, newline where a positioning op (or '/\") separates shows."""
    i = 0
    operands: list = []
    parts: list[str] = []
    pending_break = False

    def show(data: bytes, break_first: bool):
        nonlocal pending_break
        if (break_first or pending_break) and parts:
            parts.append("\n")
        pending_break = False
        parts.append(data.decode("latin-1"))

    while i < len(stream):
        c = stream[i:i + 1]
        if c in (b" ", b"\t", b"\r", b"\n", b"\x0c", b"\x00"):
            i += 1
            continue
        if c == b"%":
            while i < len(stream) and stream[i] not in b"\r\n":
                i += 1
            continue
        if c == b"(":
            s, i = _literal_string(stream, i)
            operands.append(s)
            continue
        if c == b"<" and stream[i:i + 2] != b"<<":
            s, i = _hex_string(stream, i)
            operands.append(s)
            continue
        if c == b"<" or c == b"[" or c == b"/":
            parser = _P(stream, i)
            operands.append(parser.value())
            i = parser.i
            continue
        m = re.match(rb"[+-]?(?:\d+\.\d*|\.\d+|\d+)", stream[i:])
        if m:
            operands.append(0)
            i += m.end()
            continue
        m = re.match(rb"[^\s()<>\[\]{}/%]+", stream[i:])
        if not m:
            raise ValueError(f"PDF content syntax at byte {i}")
        op = m.group(0)
        i += m.end()
        if op == b"Tj":
            if operands and isinstance(operands[-1], bytes):
                show(operands[-1], False)
        elif op == b"TJ":
            if operands and isinstance(operands[-1], list):
                if pending_break and parts:
                    parts.append("\n")
                pending_break = False
                parts.append(
                    b"".join(
                        x for x in operands[-1] if isinstance(x, bytes)
                    ).decode("latin-1")
                )
        elif op in (b"'", b'"'):
            if operands and isinstance(operands[-1], bytes):
                show(operands[-1], True)
        elif op in (b"Td", b"TD", b"Tm") or op == b"T*":
            pending_break = True
        elif op == b"BT":
            pending_break = False
        operands = []
    return "".join(parts)


def pdf_text_pages(payload: bytes) -> list[str]:
    """Per-page extracted text of a PDF. Simple (byte-encoded) fonts
    only: a /Type0 font or /ToUnicode CMap refuses loudly."""
    p = bytes(payload or b"")
    if not p.startswith(b"%PDF-"):
        raise ValueError("not a PDF (%PDF- header) payload")
    objs = _objects(p)
    if not objs:
        raise ValueError("PDF has no indirect objects")
    root = None
    for m in re.finditer(rb"trailer", p):
        parser = _P(p, m.end())
        try:
            tr = parser.value()
        except ValueError:
            continue
        if isinstance(tr, dict) and "Root" in tr:
            root = tr["Root"]
    if root is None:
        # no classic trailer (xref-stream files): find the Catalog
        for num, (s, _e) in objs.items():
            try:
                v = _P(p, s).value()
            except ValueError:
                continue
            if isinstance(v, dict) and str(v.get("Type", "")) == "Catalog":
                root = _Ref(num)
                break
    if root is None:
        raise ValueError("PDF catalog (/Root) not found")
    catalog = _resolve(objs, p, root)
    pages: list[dict] = []
    _walk_pages(objs, p, catalog["Pages"], pages)
    if b"/Type0" in p or b"/ToUnicode" in p:
        raise NotImplementedError(
            "PDF uses a CID (/Type0) font or /ToUnicode CMap: byte-"
            "decoding its strings would be silently wrong text"
        )
    out = []
    for page in pages:
        contents = page.get("Contents")
        if contents is None:
            out.append("")
            continue
        refs = contents if isinstance(contents, list) else [contents]
        data = b"\n".join(_stream_bytes(objs, p, r) for r in refs)
        out.append(_content_text(data))
    return out


PDF_FIELDS = StructType(
    [
        StructField("n_pages", IntegerType(), False),
        StructField("pdf_text", StringType(), False),
    ]
)


def pdf_fields(df: DataFrame, col: str = "payload") -> DataFrame:
    """Append (n_pages, pdf_text) — pages joined by form-feed —
    extracted from the PDF column `col`. Arrow-batched mapInPandas;
    other columns pass through."""
    out_schema = StructType(list(df.schema.fields) + list(PDF_FIELDS.fields))

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pages = [
                pdf_text_pages(bytes(b) if b is not None else b"")
                for b in pdf[col]
            ]
            out = pdf.copy()
            out["n_pages"] = [len(ps) for ps in pages]
            out["pdf_text"] = ["\f".join(ps) for ps in pages]
            yield out

    return df.mapInPandas(process, schema=out_schema)


# ---------------------------------------------------------------- writer
def _escape_literal(s: str) -> bytes:
    out = bytearray(b"(")
    for ch in s:
        o = ord(ch)
        if o > 255:
            raise NotImplementedError(
                f"codepoint U+{o:04X} needs a CID font; the simple-"
                "font writer covers latin-1 only"
            )
        if ch in "()\\":
            out += b"\\" + ch.encode("latin-1")
        elif o < 32 or o > 126:
            out += b"\\%03o" % o
        else:
            out.append(o)
    out += b")"
    return bytes(out)


def pdf_encode_text(pages, compress: bool = True) -> bytes:
    """A spec-valid PDF 1.4 from `pages` = list of page specs, each a
    list of content items: a plain string becomes one Tj show (with a
    Td line break between consecutive items), a list of strings
    becomes one TJ array whose concatenation is shown contiguously.
    Correct xref offsets; FlateDecode when `compress`."""
    objs: list[bytes] = []  # bodies, object number = index + 1

    def add(body: bytes) -> int:
        objs.append(body)
        return len(objs)

    font = add(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    )
    page_nums = []
    content_nums = []
    for items in pages:
        ops = [b"BT /F1 12 Tf 72 720 Td"]
        first = True
        for item in items:
            if not first:
                ops.append(b"0 -14 Td")
            first = False
            if isinstance(item, str):
                ops.append(_escape_literal(item) + b" Tj")
            else:
                arr = b" -2 ".join(_escape_literal(s) for s in item)
                ops.append(b"[" + arr + b"] TJ")
        ops.append(b"ET")
        data = b"\n".join(ops)
        if compress:
            z = zlib.compress(data)
            body = (
                b"<< /Length %d /Filter /FlateDecode >>\nstream\n" % len(z)
                + z + b"\nendstream"
            )
        else:
            body = (
                b"<< /Length %d >>\nstream\n" % len(data)
                + data + b"\nendstream"
            )
        content_nums.append(add(body))
    pages_num = len(objs) + 1 + len(pages)  # after the page objects
    for cn in content_nums:
        page_nums.append(
            add(
                b"<< /Type /Page /Parent %d 0 R /MediaBox [0 0 612 792] "
                b"/Resources << /Font << /F1 %d 0 R >> >> "
                b"/Contents %d 0 R >>" % (pages_num, font, cn)
            )
        )
    kids = b" ".join(b"%d 0 R" % n for n in page_nums)
    assert add(
        b"<< /Type /Pages /Kids [%s] /Count %d >>" % (kids, len(page_nums))
    ) == pages_num
    catalog = add(b"<< /Type /Catalog /Pages %d 0 R >>" % pages_num)

    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = [0]
    for i, body in enumerate(objs):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % (i + 1) + body + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 %d\n" % (len(objs) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size %d /Root %d 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objs) + 1, catalog, xref_at)
    )
    return bytes(out)


def synth_pdf_from_text(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    seg: int = 48,
) -> DataFrame:
    """(id, payload) with payload a TWO-page PDF: page 1 embeds the
    text losslessly as ONE TJ array of `seg`-char segments (their
    concatenation IS the text — the q134 identity), page 2 a
    'doc <id>' footer. The q133 synthesis pattern for PDF."""
    out_schema = f"{id_col} long, payload binary"

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                pdf_encode_text(
                    [
                        [[t[i:i + seg] for i in range(0, len(t), seg)] or [""]],
                        [f"doc {did}"],
                    ]
                )
                for did, t in zip(pdf[id_col], pdf[text_col])
            ]
            yield pd.DataFrame({id_col: pdf[id_col], "payload": payloads})

    from archetype_spark.operators.util import fan_out_if_narrow

    # Single-file corpora land the whole per-row PDF build (and every
    # downstream parse) in ONE task; the guarded fan-out is a no-op on
    # inputs that already arrive wide (util.fan_out_if_narrow).
    src = fan_out_if_narrow(df.select(id_col, text_col))
    return src.mapInPandas(process, schema=out_schema)


register_pickle_by_value(sys.modules[__name__])
