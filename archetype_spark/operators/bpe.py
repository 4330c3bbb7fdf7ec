"""Learned BPE tokenization (Sennrich et al., ACL'16) as index state.

Capability extension beyond the reference: the reference has no
tokenizer surface at all (its Daft/LanceDB core is relational ECS
storage — reference archetype/core/store.py), while this repo's own
text tier so far counted tokens by whitespace/regex heuristics
(operators/textstats.py). A training-data pipeline budgets in
LEARNED subword tokens — packing, pricing, and mixture math all key
on them. This module trains a byte-pair-encoding
merge table on the corpus and persists it like the ANN families
(operators/ann_index.py plumbing: params sidecar, corpus fingerprint,
atomic swap): training is ingest-time maintenance, token counting is
a broadcast join at query time.

Training is the classic iterative algorithm — count adjacent symbol
pairs over the word-frequency table, merge the argmax, repeat — and
is therefore NOT SQL-expressible; its correctness is pinned by exact
equivalence to a pure-Python reference implementation
(tests/test_bpe.py) instead of a DuckDB oracle. What IS oracle-gated
is the artifact's USE: fit persists each word's final segmentation
(word -> n_subtokens), so per-document token counting is a pure
explode + broadcast-join + sum that DuckDB replays over the same
persisted parquet (the q65 persisted-signature pattern).

Scale shape: the iterative state is the WORD-FREQUENCY table, not
the corpus — bounded by vocabulary (millions of rows at web scale,
not billions of documents); each round is one map-side-combinable
pair-count aggregation plus a 1-row argmax collect (the merge
decision is inherently global and sequential — this is how
distributed BPE trainers work), with localCheckpoint() truncating
the per-round lineage. Document-side cost never pays training:
counting joins the broadcast segmentation table; unseen words (a
corpus append without refit cannot happen — the fingerprint forces
rebuild — but robustness is free) fall back to character count + 1,
the untrained segmentation.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from archetype_spark.operators.ann_index import (
    _read_params,
    _write_index,
    corpus_fingerprint,
)
from archetype_spark.operators.util import fan_out
from archetype_spark.sources.io import read_table

#: End-of-word marker appended as a standalone symbol (one Sennrich
#: convention; fixed here and in the reference implementation).
END_TOKEN = "</w>"


def _word_freqs(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(word, freq, syms): distinct whitespace words with corpus
    frequency and the initial character + END_TOKEN symbol array."""
    words = (
        fan_out(docs)
        .select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    # (?s) so '.' matches EVERY char (words split on spaces only, so a
    # newline can sit inside a word; without DOTALL it would be dropped
    # here while apply-side list(word) keeps it, breaking train<->apply
    # segmentation equivalence and the chars+1 fallback convention).
    chars = F.regexp_extract_all(F.col("word"), F.lit("(?s)(.)"), 1)
    return words.withColumn(
        "syms", F.concat(chars, F.array(F.lit(END_TOKEN)))
    )


def _merge_once(syms_col: F.Column, a: str, b: str) -> F.Column:
    """Replace every non-overlapping adjacent (a, b) in the symbol
    array with the fused symbol a+b, scanning left to right — the
    exact in-word rule the reference trainer uses, as a single
    higher-order fold (vocab-table rows are short arrays; interpreted
    lambda cost is bounded by word length, never corpus size)."""
    n = F.size(syms_col)
    hit = lambda i: (  # noqa: E731 — local predicate, used twice
        (i < n)
        & (F.element_at(syms_col, i) == F.lit(a))
        & (F.element_at(syms_col, i + 1) == F.lit(b))
    )
    return F.aggregate(
        F.sequence(F.lit(1), n),
        F.struct(
            F.array().cast("array<string>").alias("out"),
            F.lit(False).alias("skip"),
        ),
        lambda acc, i: F.struct(
            F.when(acc["skip"], acc["out"])
            .when(hit(i), F.concat(acc["out"], F.array(F.lit(a + b))))
            .otherwise(
                F.concat(acc["out"], F.array(F.element_at(syms_col, i)))
            )
            .alias("out"),
            F.when(acc["skip"], F.lit(False)).otherwise(hit(i)).alias("skip"),
        ),
        lambda acc: acc["out"],
    )


def train_bpe_frames(
    docs: DataFrame,
    n_merges: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """Learn up to `n_merges` merges; returns (merges, segments).

    merges: [(left, right, pair_freq)] in learned order — the rank-r
    entry was round r's argmax pair by (freq desc, left asc, right
    asc); training stops early when no adjacent pair remains.
    segments: (word, freq, syms, n_subtokens) — every training word's
    FINAL symbol sequence under all learned merges.
    """
    words = _word_freqs(docs, id_col, text_col).localCheckpoint()
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        pairs = (
            words.select(
                "freq",
                F.explode(
                    F.when(
                        F.size("syms") >= 2,
                        F.transform(
                            F.sequence(F.lit(1), F.size("syms") - 1),
                            lambda i: F.struct(
                                F.element_at("syms", i).alias("a"),
                                F.element_at("syms", i + 1).alias("b"),
                            ),
                        ),
                    ).otherwise(
                        F.array().cast("array<struct<a:string,b:string>>")
                    )
                ).alias("p"),
            )
            .groupBy("p.a", "p.b")
            .agg(F.sum("freq").alias("pf"))
        )
        best = pairs.orderBy(F.desc("pf"), F.asc("a"), F.asc("b")).limit(1).collect()
        if not best:
            break
        a, b, pf = best[0]["a"], best[0]["b"], int(best[0]["pf"])
        merges.append((a, b, pf))
        words = words.withColumn("syms", _merge_once(F.col("syms"), a, b))
        words = words.localCheckpoint()
    segments = words.withColumn("n_subtokens", F.size("syms"))
    return merges, segments


def fit_bpe(
    docs: DataFrame,
    index_dir: str,
    n_merges: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Train + persist the BPE artifact: a `merges` table (rank, left,
    right, pair_freq) and a `segments` table (word, freq, syms,
    n_subtokens). Atomic directory swap; params sidecar records the
    corpus fingerprint (any corpus change = stale merges = rebuild —
    pair statistics are corpus-global, so there is no sound
    incremental append)."""
    spark = docs.sparkSession
    merges, segments = train_bpe_frames(docs, n_merges, id_col, text_col)
    merges_df = spark.createDataFrame(
        [(r, a, b, pf) for r, (a, b, pf) in enumerate(merges)],
        schema="rank int, left string, right string, pair_freq bigint",
    )
    params = {
        "kind": "bpe",
        "n_merges": n_merges,
        "n_learned": len(merges),
        "end_token": END_TOKEN,
        "id_col": id_col,
        "text_col": text_col,
        "corpus": corpus_fingerprint(docs, id_col, text_col),
    }
    _write_index(
        index_dir,
        params,
        {
            "merges": (merges_df.coalesce(1), None),
            "segments": (segments, ["word"]),
        },
    )


def load_bpe(
    spark: SparkSession, index_dir: str, expect: dict | None = None
) -> tuple[DataFrame, DataFrame] | None:
    params = _read_params(index_dir, "bpe", expect)
    if params is None:
        return None
    return (
        read_table(spark, os.path.join(index_dir, "merges")),
        read_table(spark, os.path.join(index_dir, "segments")),
    )


def ensure_bpe(
    docs: DataFrame,
    index_dir: str,
    n_merges: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame]:
    """Load the persisted BPE artifact, rebuilding when the corpus or
    params changed (never a silent stale tokenizer)."""
    expect = {
        "n_merges": n_merges,
        "end_token": END_TOKEN,
        "id_col": id_col,
        "text_col": text_col,
        "corpus": corpus_fingerprint(docs, id_col, text_col),
    }
    spark = docs.sparkSession
    got = load_bpe(spark, index_dir, expect)
    if got is None:
        fit_bpe(docs, index_dir, n_merges, id_col, text_col)
        got = load_bpe(spark, index_dir, expect)
        assert got is not None, f"BPE build failed to land at {index_dir}"
    return got


def bpe_token_counts(
    docs: DataFrame,
    segments: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id_col, n_words, n_bpe_tokens): per-document learned-token
    budget — explode words, broadcast-join the persisted segmentation
    (vocabulary-bounded: comfortably broadcastable at web scale),
    SUM n_subtokens. Unseen words count as chars + 1 (the untrained
    segmentation; unreachable under ensure_bpe's fingerprint but kept
    total so ad-hoc frames can reuse a foreign artifact)."""
    toks = fan_out(docs).select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("word")
    )
    seg = F.broadcast(segments.select("word", "n_subtokens"))
    return (
        toks.join(seg, "word", "left")
        .select(
            F.col(id_col),
            F.coalesce(
                F.col("n_subtokens").cast("bigint"),
                F.length("word").cast("bigint") + 1,
            ).alias("_n"),
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("_n").alias("n_bpe_tokens"),
        )
    )


def apply_bpe_tokens(
    docs: DataFrame,
    merges: list[tuple[str, str]] | DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id_col, bpe_tokens array<string>): full tokenization by
    replaying the learned merges in rank order, each left-to-right
    within the word — composition-identical to the training
    evolution, so applying to the training corpus reproduces the
    persisted segmentation exactly (test-pinned). Arrow-batched with
    a per-batch word memo: each distinct word tokenizes once."""
    if isinstance(merges, DataFrame):
        merges = [
            (r["left"], r["right"])
            for r in merges.orderBy("rank").collect()
        ]
    ranked = list(merges)
    end_token = END_TOKEN

    def run(it):
        import pandas as _pd

        def tokenize(word: str) -> list[str]:
            syms = list(word) + [end_token]
            for a, b in ranked:
                out, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            return syms

        memo: dict[str, list[str]] = {}
        for pdf in it:
            if not len(pdf):
                continue
            toks = []
            for text in pdf["_t"]:
                row: list[str] = []
                for w in text.split(" "):
                    if w not in memo:
                        memo[w] = tokenize(w)
                    row.extend(memo[w])
                toks.append(row)
            yield _pd.DataFrame({"_id": pdf["_id"], "bpe_tokens": toks})

    out = fan_out(docs).select(
        F.col(id_col).alias("_id"), F.col(text_col).alias("_t")
    ).mapInPandas(run, "_id long, bpe_tokens array<string>")
    return out.select(F.col("_id").alias(id_col), "bpe_tokens")
