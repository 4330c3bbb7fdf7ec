"""HTML -> text extraction (operators/html_text): entity decoding
(named + numeric), script/style/template/noscript and comment
exclusion, block segmentation with per-block whitespace collapsing,
<pre> byte-exact preservation, largest-block main-content selection,
link counting, title capture, and leniency over malformed markup —
plus the Spark face's pass-through column contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from archetype_spark.operators.html_text import extract_one, html_fields


def test_entities_and_numeric_charrefs():
    r = extract_one("<p>A &amp; B &lt;x&gt; &#65;&#x42; &quot;q&quot;</p>")
    assert r["full_text"] == 'A & B <x> AB "q"'


def test_script_style_comments_excluded():
    r = extract_one(
        "<style>p {color:red}</style><script>var a = '<p>no</p>';</script>"
        "<!-- hidden --><noscript>no js</noscript><p>real</p>"
    )
    assert r["full_text"] == "real"


def test_block_boundaries_and_whitespace_collapse():
    r = extract_one("<div>  a \n b  </div><p>c</p>d<br>e")
    assert r["full_text"] == "a b\nc\nd\ne"


def test_pre_preserves_whitespace_exactly():
    body = "  two\n\tspaced   lines  "
    r = extract_one(f"<p>intro</p><pre>{body}</pre>")
    assert r["full_text"] == f"intro\n{body}"
    assert r["main_text"] == body


def test_main_text_is_longest_block():
    r = extract_one(
        "<h1>head</h1><div>the much longer main body of the page"
        "</div><footer>foot</footer>"
    )
    assert r["main_text"] == "the much longer main body of the page"


def test_title_links_and_malformed_markup():
    r = extract_one(
        '<title> My  Page </title><p a=">">x<a href="/1">l1</a>'
        '<a href="/2">l2</a><div>unclosed'
    )
    assert r["title"] == "My Page"
    assert r["n_links"] == 2
    assert "unclosed" in r["full_text"]
    # total over junk
    assert extract_one("")["main_text"] == ""
    assert extract_one(None)["title"] is None
    assert extract_one("<<<>>>&#xZZ; &unknown;")["n_links"] == 0


def test_inversion_of_escaped_wrap():
    text = "Hello & <world>!\n  spacing\tpreserved  "
    from html import escape

    r = extract_one(
        f"<html><body><h1>{escape(text[:4])}</h1>"
        f"<pre>{escape(text)}</pre></body></html>"
    )
    assert r["main_text"] == text


def test_spark_face_passthrough(spark):
    df = spark.createDataFrame(
        [(1, "<title>t</title><p>alpha beta</p>"), (2, "<pre> x </pre>")],
        "doc_id long, html string",
    )
    out = html_fields(df, "html").orderBy("doc_id").collect()
    assert [r.doc_id for r in out] == [1, 2]
    assert out[0].title == "t" and out[0].main_text == "alpha beta"
    assert out[1].main_text == " x "
