"""Streaming curation: the q95 pipeline's stateless-per-document
subset composed over the incremental-dedup ingest stream — the
arriving-data shape of the batch curation queries (r7 verdict,
"Next round" #5).

Which q95 stages stream, and why:
- incremental exact dedup: ALREADY stream-safe (operators/dedup.py
  ingest_dedup — fingerprint anti-join against the accumulated
  table; the q64 pattern).
- line chunking, structural sanity gate, mixed-language gate,
  flatten: stateless per document — identical semantics per
  micro-batch and per full corpus, so they run unchanged inside
  foreachBatch.
- NOT streamed (corpus-level state, excluded by design):
  boilerplate removal (needs corpus-wide line document frequency)
  and temperature resampling (needs corpus-wide language rates).
  Streaming those needs an accumulated-statistics feedback loop —
  a deliberate batch/stream seam, documented rather than fudged:
  a production pipeline runs them as periodic batch compaction over
  the curated table this stream maintains.

Equivalence contract: draining any file split of a corpus through
`curate_batch` appends exactly the rows `curate_corpus` produces on
the full corpus in one batch (tests/test_streaming.py) — order-free,
because every pass is per-document and the dedup keeper policy is
min-id within the whole corpus only when ids arrive in order; the
stream keeps FIRST-ARRIVAL keepers, the same contract ingest_dedup
already pins.

Scale: each micro-batch shuffles only its own rows plus the 8-byte
fingerprint column of the accumulated table (ingest_dedup's
column-pruned anti-join); the stateless passes are narrow column
work fused onto the batch scan. State lives entirely in the two
parquet tables, so a restarted stream resumes from them — the
checkpoint carries only source offsets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def line_chunked(d: DataFrame, k: int = 3) -> DataFrame:
    """Deterministic k-token line structure (the corpus-q80 seam):
    newline-join every k tokens. Stateless per document."""
    # one codegen'd regexp pass — identical to the former interpreted
    # transform/slice/array_join rebuild on every input (see
    # queries/curation_q._chunked, the corpus-verified twin)
    pat = "((?:[^ ]* ){" + str(k - 1) + "}[^ ]*) "
    others = [c for c in d.columns if c not in ("doc_id", "text")]
    return d.select(
        "doc_id", F.regexp_replace("text", pat, "$1\n").alias("text"), *others
    )


def stateless_curation(d: DataFrame, line_tokens: int = 3, window: int = 16) -> DataFrame:
    """The per-document (state-free) subset of the q95 pipeline:
    line chunking -> structural sanity (non-empty) -> flatten ->
    mixed-language gate. Returns surviving (doc_id, text, ...)
    rows with the flattened text. Runs identically on a micro-batch
    and on the full corpus — the property the stream-equivalence
    test pins.

    The line/flatten round-trip is applied ALGEBRAICALLY rather than
    materialized: without q95's boilerplate df-drop between them,
    `flatten(line_chunked(t, k))` == `replace(t, "\\n", " ")` for any
    k (token groups re-join with the same single spaces; group
    separators and embedded newlines both become spaces), and the
    structural gate `length(lined) > 0` == `length(t) > 0`. The
    identity saves two full-text array rebuilds per document
    (measured ~30% of q99's cost); `line_chunked` stays exported for
    pipelines that DO clean between the two steps (q95's shape)."""
    from archetype_spark.operators import textstats

    others = [c for c in d.columns if c not in ("doc_id", "text")]
    flat = d.filter(F.length("text") > 0).select(
        "doc_id", F.regexp_replace("text", "\n", " ").alias("text"), *others
    )
    pure = textstats.mixed_language_stats(
        flat.select("doc_id", "text"), window=window
    ).filter(~F.col("is_mixed"))
    return flat.join(pure.select("doc_id"), "doc_id", "left_semi")


def curate_batch(
    spark,
    batch: DataFrame,
    base_dir: str,
    line_tokens: int = 3,
    window: int = 16,
) -> DataFrame:
    """Per-micro-batch curation step (call from foreachBatch):
    incremental exact dedup against `<base_dir>/dedup`, then the
    stateless curation passes over the FRESH rows only, appending
    survivors to `<base_dir>/curated`. Returns the appended rows."""
    from archetype_spark.operators import dedup

    fresh = dedup.ingest_dedup(spark, batch, f"{base_dir}/dedup")
    survivors = stateless_curation(
        fresh, line_tokens=line_tokens, window=window
    ).localCheckpoint(eager=True)
    if survivors.count() > 0:
        survivors.write.mode("append").parquet(f"{base_dir}/curated")
    return survivors


def curate_corpus(
    spark,
    docs: DataFrame,
    base_dir: str,
    line_tokens: int = 3,
    window: int = 16,
) -> DataFrame:
    """One-shot batch equivalent of draining the whole corpus through
    `curate_batch` — the equivalence oracle for the stream tests."""
    return curate_batch(
        spark, docs, base_dir, line_tokens=line_tokens, window=window
    )
