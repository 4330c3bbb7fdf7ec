"""Sequence packing: assign documents to fixed-token-budget training
sequences — the last hop of an LLM data pipeline, where a cleaned,
deduped corpus becomes the (seq_id, docs...) groups a tokenizer/
writer materializes.

The scalable formulation is cumulative-sum bucketing: within a shard,
docs are laid out in a deterministic order and doc d starts at offset
cumsum(tokens up to d, exclusive); its sequence is offset // budget.
That is one partitioned window (running sum) plus integer division —
exact, order-stable, and replayable in any SQL engine (the oracle).

Scale: the window MUST be partitioned (here by a shard column; real
pipelines use lang/domain/hash-shard). An unpartitioned ORDER BY
over the whole corpus is the classic single-task window trap — one
executor sorts 100 TB. Within a shard the running sum is a single
shuffle on the shard key; shards are independent, so width scales
with the cluster. Docs longer than the budget inflate their sequence
past the budget rather than being split — token-level splitting
needs a tokenizer and belongs to the writer stage downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    shard_col: str = "lang",
    budget: int = 1024,
) -> DataFrame:
    """Adds (seq_id, seq_offset): doc's sequence index within its
    shard and its token offset inside that sequence. Deterministic:
    layout order is `id_col` ascending within each shard value."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    w = (
        Window.partitionBy(shard_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum(tokens_col).over(w), F.lit(0))
    return df.withColumn("seq_id", (start / budget).cast("bigint")).withColumn(
        "seq_offset", start % budget
    )
