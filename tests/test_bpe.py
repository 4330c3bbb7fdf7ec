"""Learned BPE: exact equivalence to a pure-Python reference trainer
(same tie-break, same left-to-right merge rule), apply==train
consistency, token counting vs the persisted segmentation, and the
ensure_bpe lifecycle."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from archetype_spark.operators import bpe

END = bpe.END_TOKEN


# ------------------------------------------------------ reference trainer
def _ref_train(word_freqs: dict[str, int], n_merges: int):
    """Sennrich-style BPE on a word-frequency dict: per round, count
    adjacent symbol pairs weighted by word freq, merge the argmax by
    (freq desc, left asc, right asc) left-to-right non-overlapping.
    Returns (merges, segments)."""
    segs = {w: list(w) + [END] for w in word_freqs}
    merges = []
    for _ in range(n_merges):
        counts: Counter = Counter()
        for w, syms in segs.items():
            f = word_freqs[w]
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] += f
        if not counts:
            break
        # tie-break: freq desc, then (a, b) lexicographic asc
        top_f = max(counts.values())
        a, b = min(k for k, v in counts.items() if v == top_f)
        merges.append((a, b, top_f))
        for w, syms in segs.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            segs[w] = out
    return merges, segs


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "low lower lowest low low"),
        (2, "new newer newest new"),
        (3, "wide wider widest low new"),
        (4, "low low low newer"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _word_freqs(rows):
    c: Counter = Counter()
    for _, text in rows:
        c.update(text.split(" "))
    return dict(c)


def test_train_matches_reference_exactly(spark, corpus):
    merges, segments = bpe.train_bpe_frames(corpus, n_merges=12)
    wf = _word_freqs([(r["doc_id"], r["text"]) for r in corpus.collect()])
    ref_merges, ref_segs = _ref_train(wf, 12)
    assert merges == ref_merges
    got = {r["word"]: list(r["syms"]) for r in segments.collect()}
    assert got == ref_segs
    # frequencies survive the rounds
    freqs = {r["word"]: r["freq"] for r in segments.collect()}
    assert freqs == wf


def test_apply_reproduces_training_segmentation(spark, corpus):
    merges, segments = bpe.train_bpe_frames(corpus, n_merges=12)
    seg = {r["word"]: list(r["syms"]) for r in segments.collect()}
    toks = {
        r["doc_id"]: list(r["bpe_tokens"])
        for r in bpe.apply_bpe_tokens(
            corpus, [(a, b) for a, b, _ in merges]
        ).collect()
    }
    for r in corpus.collect():
        expect = [s for w in r["text"].split(" ") for s in seg[w]]
        assert toks[r["doc_id"]] == expect


def test_token_counts_match_segmentation_and_fallback(spark, corpus):
    merges, segments = bpe.train_bpe_frames(corpus, n_merges=12)
    seg = {r["word"]: r["n_subtokens"] for r in segments.collect()}
    counts = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
        for r in bpe.bpe_token_counts(corpus, segments).collect()
    }
    for r in corpus.collect():
        words = r["text"].split(" ")
        assert counts[r["doc_id"]] == (
            len(words),
            sum(seg[w] for w in words),
        )
    # unseen word falls back to chars + 1
    alien = spark.createDataFrame(
        [(9, "zzzquux low")], "doc_id long, text string"
    )
    got = bpe.bpe_token_counts(alien, segments).collect()[0]
    assert got["n_bpe_tokens"] == len("zzzquux") + 1 + seg["low"]


def test_ensure_bpe_lifecycle(spark, tmp_path, monkeypatch):
    base = str(tmp_path / "docs")
    spark.createDataFrame(
        [(1, "aa ab aa"), (2, "ab aa ab")], "doc_id long, text string"
    ).write.parquet(base)
    docs = spark.read.parquet(base)
    idx = str(tmp_path / "bpe")
    m1, s1 = bpe.ensure_bpe(docs, idx, n_merges=4)
    # reuse: no refit on unchanged corpus
    monkeypatch.setattr(
        bpe,
        "fit_bpe",
        lambda *a, **k: (_ for _ in ()).throw(AssertionError("refit!")),
    )
    m2, s2 = bpe.ensure_bpe(docs, idx, n_merges=4)
    assert m2.count() == m1.count() and s2.count() == s1.count()
    monkeypatch.undo()
    # any corpus change rebuilds (pair stats are corpus-global)
    spark.createDataFrame(
        [(3, "zz zy zz zz")], "doc_id long, text string"
    ).write.mode("append").parquet(base)
    docs2 = spark.read.parquet(base)
    m3, s3 = bpe.ensure_bpe(docs2, idx, n_merges=4)
    words = {r["word"] for r in s3.collect()}
    assert {"zz", "zy"} <= words


def test_early_stop_when_fully_merged(spark):
    docs = spark.createDataFrame([(1, "ab ab ab")], "doc_id long, text string")
    merges, segments = bpe.train_bpe_frames(docs, n_merges=50)
    # "ab" has 3 symbols (a, b, </w>) -> exactly 2 merges possible
    assert len(merges) == 2
    seg = segments.collect()[0]
    assert seg["n_subtokens"] == 1 and seg["syms"] == [f"ab{END}"]


def test_train_handles_newline_inside_word(spark):
    """Words split on spaces only, so a newline can sit inside one;
    symbol init must keep it ('.' without DOTALL dropped it — ADVICE
    r9 — silently breaking train<->apply equivalence)."""
    rows = [(1, "ab\ncd ab\ncd ef"), (2, "ab\ncd gh ef ef")]
    corpus = spark.createDataFrame(rows, "doc_id long, text string")
    merges, segments = bpe.train_bpe_frames(corpus, n_merges=4)
    wf = _word_freqs([(r["doc_id"], r["text"]) for r in corpus.collect()])
    ref_merges, ref_segs = _ref_train(wf, 4)
    assert merges == ref_merges
    got = {r["word"]: list(r["syms"]) for r in segments.collect()}
    assert got == ref_segs
