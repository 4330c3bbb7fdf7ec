"""Cleaning operators (operators/cleaning.py): line-level boilerplate
removal semantics and the PII scrub pass."""

from __future__ import annotations

from pyspark.sql import functions as F

from archetype_spark.operators import cleaning


def test_remove_boilerplate_lines_semantics(spark):
    """Lines above the df threshold vanish from every document; order
    is preserved; within-doc repeats count once toward df; a document
    that was ALL boilerplate survives as an empty string."""
    rows = [
        (1, "nav\nalpha\nnav\nbeta"),   # nav repeats in-doc: df still 3
        (2, "nav\ngamma"),
        (3, "nav\ndelta\nbeta"),
        (4, "nav"),                       # all-boilerplate doc
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = {
        r["doc_id"]: (r["text"], r["n_lines"], r["n_kept"])
        for r in cleaning.remove_boilerplate_lines(df, max_line_df=2).collect()
    }
    assert out == {
        1: ("alpha\nbeta", 4, 2),
        2: ("gamma", 2, 1),
        3: ("delta\nbeta", 3, 2),
        4: ("", 1, 0),
    }
    # threshold high enough -> nothing dropped, text round-trips
    kept_all = {
        r["doc_id"]: r["text"]
        for r in cleaning.remove_boilerplate_lines(df, max_line_df=10).collect()
    }
    assert kept_all == {i: t for i, t in rows}


def test_scrub_pii_counts_and_redactions(spark):
    df = spark.createDataFrame(
        [
            (1, "mail a.b-c@x-mail.co.uk now"),
            (2, "call 555-123-4567 or 555.000.1111 from 10.0.0.1"),
            (3, "no pii here, v1.2 and 12.5 are versions"),
            (4, "two mails a@b.io c@d.org and ip 192.168.254.3"),
        ],
        "doc_id int, text string",
    )
    got = {
        r["doc_id"]: (r["n_email"], r["n_phone"], r["n_ip"], r["text"])
        for r in cleaning.scrub_pii(df).collect()
    }
    assert got[1] == (1, 0, 0, "mail <EMAIL> now")
    assert got[2] == (0, 2, 1, "call <PHONE> or <PHONE> from <IP>")
    assert got[3] == (0, 0, 0, "no pii here, v1.2 and 12.5 are versions")
    assert got[4] == (2, 0, 1, "two mails <EMAIL> <EMAIL> and ip <IP>")
    # audit=False keeps only the scrubbed text
    cols = cleaning.scrub_pii(df, audit=False).columns
    assert cols == ["doc_id", "text"]


def test_scrub_pii_is_narrow(spark):
    """The scrub pass must add zero exchanges — pure per-row
    expressions that fuse into the input scan."""
    from archetype_spark.plans import n_exchanges

    df = spark.createDataFrame([(1, "x@y.zz")], "doc_id int, text string")
    assert n_exchanges(cleaning.scrub_pii(df)) == 0


def test_dedup_paragraphs_keep_first(spark):
    """Each distinct paragraph survives only at its globally-first
    (doc_id, pos); order is preserved; a doc whose every paragraph
    appeared earlier survives as an empty string."""
    rows = [
        (1, "alpha\nshared\nbeta"),
        (2, "shared\ngamma\nalpha"),   # shared+alpha first seen in doc 1
        (3, "shared"),                  # fully duplicate doc
        (4, "delta\ndelta"),            # within-doc repeat: keep pos 0
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = {
        r["doc_id"]: (r["text"], r["n_paras"], r["n_kept"])
        for r in cleaning.dedup_paragraphs(df).collect()
    }
    assert out == {
        1: ("alpha\nshared\nbeta", 3, 3),
        2: ("gamma", 3, 1),
        3: ("", 1, 0),
        4: ("delta", 2, 1),
    }


def test_vocab_coverage_short_docs_and_rates(spark):
    """Docs shorter than n tokens report zero grams / rate 0; OOV
    counts occurrences (term frequency), not distinct grams."""
    from archetype_spark.operators import textstats

    rows = [
        (1, "a b a b a b"),   # grams: "a b" x3, "b a" x2
        (2, "a b c"),          # "a b", "b c"
        (3, "x"),              # too short: 0 grams
        (4, "c c c"),          # "c c" x2
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = {
        r["doc_id"]: (r["n_ngrams"], r["n_oov"], r["oov_rate"])
        for r in textstats.vocab_coverage(df, n=2, top_v=2).collect()
    }
    # vocab by tf desc, text asc: "a b"(3), "b a"(2) -- "c c"(2) loses tie
    assert out[1] == (5, 0, 0.0)
    assert out[2] == (2, 1, 0.5)
    assert out[3] == (0, 0, 0.0)
    assert out[4] == (2, 2, 1.0)


def test_bigram_surprisal_exact_small(spark):
    """Hand-computed add-one-smoothed surprisal on a 2-doc corpus;
    short docs report zero bigrams."""
    import math

    from archetype_spark.operators import textstats

    rows = [(1, "a b"), (2, "a b"), (3, "x")]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = {
        r["doc_id"]: (r["n_bigrams"], r["sum_micro_nats"], r["avg_surprisal"])
        for r in textstats.bigram_surprisal(df).collect()
    }
    # tokens: a,b,a,b,x -> ca: a=2,b=2,x=1; V=3; c(a,b)=2
    # p(b|a) = (2+1)/(2+3) = 0.6; s = round(-ln(0.6)*1e6)
    s = math.floor(-math.log(0.6) * 1e6 + 0.5)
    avg = round(s / 1e6, 6)
    assert out[1] == (1, s, avg)
    assert out[2] == (1, s, avg)
    assert out[3] == (0, 0, 0.0)


def test_mixed_language_stats(spark):
    """Per-chunk lang-id agreement: an en+de concatenation flags
    mixed; a pure doc doesn't; majority ties break by lang asc;
    no-stopword text predicts 'unknown' but is not mixed."""
    from archetype_spark.operators import textstats

    en16 = ("the a of and " * 4).strip()
    de16 = ("der die und ist " * 4).strip()
    rows = [
        (1, en16 + " " + de16),   # chunks: en, de -> tie, major de (asc)
        (2, en16 + " " + en16),   # pure en
        (3, "zz yy"),             # unknown, single chunk
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = {
        r["doc_id"]: (
            r["n_chunks"], r["n_langs"], r["major_lang"],
            r["major_share"], r["is_mixed"],
        )
        for r in textstats.mixed_language_stats(df, window=16).collect()
    }
    assert out[1] == (2, 2, "de", 0.5, True)
    assert out[2] == (2, 1, "en", 1.0, False)
    assert out[3] == (1, 1, "unknown", 1.0, False)


def test_dsir_importance_semantics(spark):
    """DSIR importance weights: documents built from target-heavy
    bigrams must score higher than raw-only ones; weights are
    deterministic and zero-feature docs degrade to 0."""
    from pyspark.sql import functions as F

    from archetype_spark.operators import textstats

    rows = (
        # target slice: 'en' docs full of 'alpha beta'
        [(i, "alpha beta " * 20, "en") for i in range(8)]
        # raw-only slice: 'xx' docs full of 'gamma delta'
        + [(100 + i, "gamma delta " * 20, "xx") for i in range(8)]
        # probes: one target-looking, one raw-looking, one empty-ish
        + [(900, "alpha beta alpha beta", "xx"), (901, "gamma delta gamma delta", "xx"),
           (902, "solo", "xx")]
    )
    d = spark.createDataFrame(
        [(i, t.strip(), lg) for i, t, lg in rows],
        "doc_id long, text string, lang string",
    )
    out = {
        r["doc_id"]: r
        for r in textstats.dsir_importance(
            d, target=F.col("lang") == "en", n_buckets=256
        ).collect()
    }
    assert out[900]["avg_log_ratio"] > out[901]["avg_log_ratio"]
    assert out[900]["sum_micro_nats"] > 0 > out[901]["sum_micro_nats"]
    assert out[902]["n_feats"] == 0 and out[902]["avg_log_ratio"] == 0.0
    # deterministic across runs
    again = {
        r["doc_id"]: r["sum_micro_nats"]
        for r in textstats.dsir_importance(
            d, target=F.col("lang") == "en", n_buckets=256
        ).collect()
    }
    assert again == {k: v["sum_micro_nats"] for k, v in out.items()}


def test_dsir_importance_null_target(spark):
    """Review r8: NULL target values count as not-target; grams from
    NULL-flag rows must still contribute to the raw distribution and
    to their own documents' sums (no silently-NULLed buckets)."""
    from pyspark.sql import functions as F

    from archetype_spark.operators import textstats

    d = spark.createDataFrame(
        [(1, "p q p q p q", True), (2, "r s r s r s", None), (3, "p q r s", False)],
        "doc_id long, text string, flag boolean",
    )
    out = {
        r["doc_id"]: r
        for r in textstats.dsir_importance(
            d, target=F.col("flag"), n_buckets=64
        ).collect()
    }
    # every doc has all its grams scored (5 bigrams in docs 1-2, 3 in doc 3)
    assert out[1]["n_feats"] == 5 and out[2]["n_feats"] == 5
    assert out[3]["n_feats"] == 3
    # the NULL-flag doc's buckets score like raw-only: a finite,
    # non-zero-sum verdict (would have been silently dropped before)
    assert out[2]["sum_micro_nats"] != 0
    # equivalent to coalescing the flag to false up front
    want = {
        r["doc_id"]: r["sum_micro_nats"]
        for r in textstats.dsir_importance(
            d.withColumn("flag", F.coalesce("flag", F.lit(False))),
            target=F.col("flag"),
            n_buckets=64,
        ).collect()
    }
    assert want == {k: v["sum_micro_nats"] for k, v in out.items()}
