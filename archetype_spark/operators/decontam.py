"""Benchmark decontamination ([N] training-data tier).

A training corpus must not contain the evaluation data it will be
judged against. The standard contamination test (GPT-3 appendix C /
Gopher §A.5 lineage) is n-gram overlap: a training document is
contaminated when a large-enough fraction of its n-grams also occur
anywhere in the eval set. This module computes, per training doc,
the overlap fraction against an eval corpus and the keep/drop
verdict — the step a pipeline runs between dedup and packing.

Scale shape (the whole point at 100 TB): eval sets are tiny —
benchmarks are MBs while the corpus is TBs — so the eval shingle
set is BROADCAST and the training side is never shuffled at all:
explode shingles -> broadcast-hash semi-join -> per-doc count, with
the count aggregation map-side combinable on the already-co-located
doc_id. The join key is xxhash64 of the shingle (8-byte compare, the
same digest-for-body trade the Jaccard inverted index makes; the
DuckDB oracle joins raw strings as the semantic ground truth).

The reference has no decontamination surface (its dedup story stops
at `distinct`); this is a beyond-reference operator from the brief's
training-pipeline tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from archetype_spark.functions.text import shingles
from archetype_spark.operators.util import fan_out


def eval_shingle_set(
    eval_df: DataFrame, text_col: str = "text", n: int = 3
) -> DataFrame:
    """Distinct xxhash64'd n-gram shingles of the eval corpus — the
    small side every training partition probes. One column, 8 bytes a
    row: benchmark-sized eval sets stay well under broadcast budgets."""
    return (
        fan_out(eval_df)
        .select(F.explode(shingles(text_col, n)).alias("_s"))
        .select(F.xxhash64("_s").alias("_es"))
        .dropDuplicates()
    )


def contamination(
    train_df: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    max_frac: float = 0.2,
) -> DataFrame:
    """Per-training-doc eval overlap: (id, n_shingles, n_shared,
    contam_frac, keep) where n_shared counts the doc's DISTINCT
    n-gram shingles that appear anywhere in the eval corpus and
    contam_frac = n_shared / n_shingles (0.0 for shingle-less docs).
    keep = contam_frac <= max_frac.

    The eval side is broadcast (see module docstring): the training
    corpus is scanned — and its shingle expression evaluated — exactly
    once. The exploded branch carries everything the verdict needs:
    a broadcast LEFT join marks which shingles the eval set contains
    (the distinct probe side guarantees at most one match per row),
    and ONE per-doc aggregation counts both totals and matches — no
    second derivation of the document shingles, no backfill join.
    The only shuffle is the per-doc partial counts."""
    ev = F.broadcast(eval_shingle_set(eval_df, text_col, n))
    docs = fan_out(train_df).select(
        F.col(id_col).alias("_id"), shingles(text_col, n).alias("_sh")
    )
    # explode_outer + NULL-preserving hash wrap: same
    # InferFiltersFromGenerate dodge as ngram_jaccard_pairs — a plain
    # explode would let the inferred size(_sh)>0 filter inline the
    # whole shingle tree below the fan-out exchange into one task.
    # The outer explode also keeps shingle-less docs as one NULL row,
    # so every doc reaches the aggregate (count("_s") skips it).
    ex = docs.select("_id", F.explode_outer("_sh").alias("_s0")).select(
        "_id",
        F.when(F.col("_s0").isNotNull(), F.xxhash64("_s0")).alias("_s"),
    )
    marked = ex.join(ev, ex["_s"] == ev["_es"], "left")
    counts = marked.groupBy("_id").agg(
        F.count("_s").alias("_n_sh"),
        F.count("_es").alias("_n_shared"),
    )
    frac = F.when(
        F.col("_n_sh") > 0,
        F.round(F.col("_n_shared").cast("double") / F.col("_n_sh"), 6),
    ).otherwise(F.lit(0.0))
    return (
        counts.select(
            F.col("_id").alias(id_col),
            F.col("_n_sh").cast("bigint").alias("n_shingles"),
            F.col("_n_shared").cast("bigint").alias("n_shared"),
            frac.alias("contam_frac"),
        )
        .withColumn("keep", F.col("contam_frac") <= F.lit(max_frac))
    )


def verbatim_leaks(
    train_df: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """Exact-substring leak detection (the Lee et al. / GPT-3 'dirty
    document' rule): a training doc leaks when ANY exact n-token
    window also occurs in the eval set — the verbatim complement to
    `contamination`'s fractional budget. The two rules catch
    different failure modes: a doc quoting one eval answer verbatim
    can sit far below a 20% 3-gram budget (q71 keeps it), while long
    n windows make incidental phrase collisions vanishingly rare, so
    any hit is a true leak. Returns (id, n_windows, n_leaked,
    leaked); same broadcast-eval/never-shuffle-train shape as
    `contamination` — one operator, two verdict algebras."""
    c = contamination(train_df, eval_df, id_col, text_col, n=n, max_frac=0.0)
    return c.select(
        F.col(id_col),
        F.col("n_shingles").alias("n_windows"),
        F.col("n_shared").alias("n_leaked"),
        (F.col("n_shared") > 0).alias("leaked"),
    )
