"""Dependency-free HTML -> text extraction (stdlib html.parser) —
the web-corpus ingestion step upstream of every text operator here:
real training-data pipelines start from markup, and the reference's
curation surface consumes the text column this produces (reference
reads documents through Daft text columns; the extraction itself is
standard public practice — tag stripping, entity decoding, block
segmentation, largest-block main-content selection).

`html_fields(df, col)` is an Arrow-batched mapInPandas (HTML parsing
is genuinely inexpressible in built-in SQL functions; everything
downstream of the extraction stays JVM-side). Per document:

- title: the <title> element's decoded text (None when absent).
- full_text: every text node outside script/style/template/noscript
  and comments, entities decoded (named + numeric — html.parser's
  convert_charrefs), block-level tag boundaries becoming newlines,
  whitespace runs collapsed per block EXCEPT inside <pre>, whose
  content is preserved byte-exactly.
- main_text: the longest block-level chunk — the crude-readability
  main-content heuristic (boilerplate like nav/footer/header text
  loses to the article body by length).
- n_links: <a> tag count (a quality signal: link farms score high).

Extraction is total: malformed markup never raises (html.parser is
lenient by design); an empty or tagless payload yields its collapsed
text. The q133 oracle pins the exactness contract end-to-end: a
document wrapped in synthetic HTML (escaped into a <pre> main block,
decorated with title/h1/script/style/comment/footer noise) must
extract back to the ORIGINAL text bit-exactly — the oracle digests
the source column, never this module's output.
"""

from __future__ import annotations

import sys
from html.parser import HTMLParser
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

#: block-level elements whose boundaries separate text chunks
_BLOCK = {
    "address", "article", "aside", "blockquote", "br", "caption", "dd",
    "div", "dl", "dt", "fieldset", "figcaption", "figure", "footer",
    "form", "h1", "h2", "h3", "h4", "h5", "h6", "header", "hr", "li",
    "main", "nav", "ol", "p", "pre", "section", "table", "tbody", "td",
    "tfoot", "th", "thead", "tr", "ul",
}
#: elements whose text content is never prose
_SKIP = {"script", "style", "template", "noscript"}


class _Extractor(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.skip_depth = 0
        self.pre_depth = 0
        self.in_title = False
        self.title_parts: list[str] = []
        self.chunks: list[str] = []
        self.cur: list[str] = []
        self.n_links = 0

    def _flush(self, preserve: bool):
        raw = "".join(self.cur)
        self.cur = []
        text = raw if preserve else " ".join(raw.split())
        if text:
            self.chunks.append(text)

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP:
            self.skip_depth += 1
            return
        if tag == "a":
            self.n_links += 1
        if tag == "title":
            self.in_title = True
        if tag in _BLOCK:
            self._flush(self.pre_depth > 0)
            if tag == "pre":
                self.pre_depth += 1

    def handle_endtag(self, tag):
        if tag in _SKIP:
            self.skip_depth = max(0, self.skip_depth - 1)
            return
        if tag == "title":
            self.in_title = False
        if tag in _BLOCK:
            self._flush(self.pre_depth > 0)
            if tag == "pre" and self.pre_depth:
                self.pre_depth -= 1

    def handle_data(self, data):
        if self.skip_depth:
            return
        if self.in_title:
            self.title_parts.append(data)
            return
        self.cur.append(data)

    def result(self) -> dict:
        self._flush(self.pre_depth > 0)
        title = "".join(self.title_parts)
        title = " ".join(title.split()) if title else None
        return {
            "title": title,
            "full_text": "\n".join(self.chunks),
            "main_text": max(self.chunks, key=len) if self.chunks else "",
            "n_links": self.n_links,
        }


def extract_one(payload: str) -> dict:
    """One document's extraction — total over malformed markup."""
    ex = _Extractor()
    ex.feed(payload or "")
    ex.close()
    return ex.result()


HTML_FIELDS = StructType(
    [
        StructField("title", StringType(), True),
        StructField("full_text", StringType(), False),
        StructField("main_text", StringType(), False),
        StructField("n_links", IntegerType(), False),
    ]
)


def html_fields(df: DataFrame, col: str = "html") -> DataFrame:
    """Append (title, full_text, main_text, n_links) extracted from
    the HTML column `col`. Arrow-batched mapInPandas; every other
    input column passes through unchanged."""
    out_schema = StructType(
        list(df.schema.fields) + list(HTML_FIELDS.fields)
    )

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [extract_one(h) for h in pdf[col]]
            out = pdf.copy()
            for f in HTML_FIELDS.fields:
                out[f.name] = [r[f.name] for r in rows]
            yield out

    return df.mapInPandas(process, schema=out_schema)


register_pickle_by_value(sys.modules[__name__])
