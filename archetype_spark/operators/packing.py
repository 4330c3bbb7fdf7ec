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


def pack_payloads(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_col: str = "n_tokens",
    shard_col: str = "lang",
    budget: int = 1024,
    sep: str = "\n",
) -> DataFrame:
    """The writer stage after `pack_sequences`: materialize each
    (shard, seq_id) group's actual training payload — member docs
    concatenated with `sep` in the same deterministic id order the
    offsets were computed in. Returns one row per sequence:
    (shard_col, seq_id, n_docs, payload).

    Scale: the per-group collect is SAFE here, uniquely, because
    group size is capped by the token budget (a sequence holds at
    most ~budget tokens plus one overflowing doc) — this is the one
    place a collect_list can't skew. Sorting happens inside each
    collected array (array_sort on (offset, id) structs), not as a
    shuffle sort; the groupBy is the same single shard-key exchange
    the packing window already established."""
    packed = pack_sequences(df, id_col, tokens_col, shard_col, budget)
    member = F.struct(F.col("seq_offset"), F.col(id_col), F.col(text_col).alias("_t"))
    return (
        packed.groupBy(shard_col, "seq_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.array_sort(F.collect_list(member)).alias("_m"),
        )
        .withColumn(
            "payload",
            F.array_join(F.transform(F.col("_m"), lambda m: m["_t"]), sep),
        )
        .drop("_m")
    )
