"""Opt-in 10x stress suite (SPARK_GRAFT_STRESS=1): the hostile
corpus behind SCALE.md's Measured Headroom section, reproducible —
50k docs (sf0.1 x 10 copies, so every doc has 9 exact near-dups),
every doc prefixed with one shared boilerplate line (a key hot in
ALL docs), 20k embeddings. Skipped by default: it adds minutes and
its purpose is headroom regression checks, not correctness (the
oracle corpus owns correctness).

This suite is what caught the unsized-local-JVM-heap OOM (see
session.get_spark): keep it runnable.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_STRESS") != "1",
    reason="set SPARK_GRAFT_STRESS=1 to run the 10x stress suite",
)

SF = "/root/testdata/sf0.1"


@pytest.fixture(scope="module")
def stress_docs(spark, tmp_path_factory):
    out = tmp_path_factory.mktemp("stress") / "documents.parquet"
    d = spark.read.parquet(f"{SF}/documents.parquet")
    copies = d.crossJoin(
        F.broadcast(spark.range(10).withColumnRenamed("id", "copy"))
    )
    big = copies.select(
        (F.col("doc_id") + F.col("copy") * 1_000_000).alias("doc_id"),
        F.concat(
            F.lit("this site uses cookies accept to continue "), F.col("text")
        ).alias("text"),
        "lang",
    )
    big.repartition(8).write.parquet(str(out))
    return spark.read.parquet(str(out))


def test_stress_hotkey_cleaning(stress_docs):
    """Hot-key paragraph dedup and line removal complete on 50k docs
    with one key hot in every doc; the hot paragraph survives exactly
    once corpus-wide."""
    from archetype_spark.operators import cleaning

    w = F.split(F.col("text"), " ")
    nch = F.ceil(F.size(w) / F.lit(4.0)).cast("int")
    lined = stress_docs.select(
        "doc_id",
        F.array_join(
            F.transform(
                F.sequence(F.lit(1), nch),
                lambda i: F.array_join(F.slice(w, (i - 1) * 4 + 1, 4), " "),
            ),
            "\n",
        ).alias("text"),
    )
    deduped = cleaning.dedup_paragraphs(lined)
    agg = deduped.agg(
        F.sum("n_paras").alias("np"), F.sum("n_kept").alias("nk")
    ).collect()[0]
    assert agg["np"] > agg["nk"] > 0
    cleaned = cleaning.remove_boilerplate_lines(lined, max_line_df=3)
    # the injected hot line is boilerplate everywhere: no doc keeps it
    kept_hot = cleaned.filter(
        F.col("text").contains("this site uses cookies")
    ).count()
    assert kept_hot == 0


def test_stress_minhash_cc(stress_docs):
    """Banded MinHash + component closure over 10x dup groups: every
    source doc's 10 copies land in one component."""
    from archetype_spark.operators import dedup, graph

    pairs = dedup.minhash_lsh_pairs(
        stress_docs, hash_family="xxhash64", threshold=0.8
    )
    comp = graph.connected_components(
        pairs.select(F.col("doc_id").alias("a"), F.col("other_doc_id").alias("b")),
        "a",
        "b",
    )
    n_comp = comp.select("component").distinct().count()
    # ~5k source docs -> at most ~5k components among the paired docs
    assert 0 < n_comp < 5500, n_comp
