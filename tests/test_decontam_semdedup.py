"""Round-6 operators: benchmark decontamination (operators/decontam)
and SemDeDup-style embedding dedup (similarity.semantic_dedup).
Exact-value pins on constructed inputs + consistency properties vs
the exact pairwise tier; the DuckDB end-to-end diff runs in
test_oracle_corpus (q71/q72)."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from archetype_spark.operators import decontam, similarity


def test_contamination_exact_values(spark):
    train = spark.createDataFrame(
        [
            (1, "a b c d"),        # shingles {a b c, b c d}
            (2, "p q r s t"),      # 3 shingles, none shared
            (3, "zz"),             # < n tokens -> 0 shingles
            (4, "a b c x y"),      # {a b c, b c x, c x y}: 1 shared
        ],
        "doc_id long, text string",
    )
    eval_set = spark.createDataFrame(
        [(100, "a b c q"), (101, "m n o")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r
        for r in decontam.contamination(train, eval_set, n=3, max_frac=0.4).collect()
    }
    assert got[1]["n_shingles"] == 2 and got[1]["n_shared"] == 1
    assert got[1]["contam_frac"] == pytest.approx(0.5) and not got[1]["keep"]
    assert got[2]["n_shared"] == 0 and got[2]["keep"]
    assert got[3]["n_shingles"] == 0
    assert got[3]["contam_frac"] == 0.0 and got[3]["keep"]
    assert got[4]["n_shingles"] == 3 and got[4]["n_shared"] == 1
    assert got[4]["contam_frac"] == pytest.approx(round(1 / 3, 6)) and got[4]["keep"]


def test_contamination_identical_doc_is_flagged(spark, sf_dir):
    """A train doc byte-identical to an eval doc must be fully
    contaminated (frac 1.0) — the case the operator exists for."""
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    eval_set = docs.limit(3)
    out = decontam.contamination(docs, eval_set, n=3, max_frac=0.2)
    flagged = {
        r["doc_id"]: r["contam_frac"]
        for r in out.join(eval_set.select("doc_id"), "doc_id").collect()
    }
    long_enough = {
        r["doc_id"]
        for r in eval_set.filter(F.size(F.split("text", " ")) >= 3).collect()
    }
    for did in long_enough:
        assert flagged[did] == pytest.approx(1.0)


def _planted_embeddings(spark):
    import numpy as np

    rng = np.random.default_rng(11)
    base = rng.standard_normal((40, 16)).astype("float32")
    rows = [(i, base[i].tolist()) for i in range(40)]
    # plant exact duplicates of vec 0 and vec 7
    rows.append((100, base[0].tolist()))
    rows.append((101, base[7].tolist()))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_semantic_dedup_planted_dups_and_consistency(spark):
    emb = _planted_embeddings(spark)
    out = similarity.semantic_dedup(emb, threshold=0.95).collect()
    by_id = {r["vec_id"]: r for r in out}
    assert len(by_id) == emb.count()  # a verdict for every vector
    # identical vectors always share a cell -> both flagged, min id keeps
    assert by_id[0]["is_keeper"] and by_id[0]["n_dups"] >= 1
    assert not by_id[100]["is_keeper"] and by_id[100]["n_dups"] >= 1
    assert by_id[7]["is_keeper"] and not by_id[101]["is_keeper"]
    # every flagged duplicate pair must be real: vectors the exact
    # tier scores >= threshold (cell blocking can only LOSE pairs)
    exact_pairs = {
        (r["vec_id"], r["other_vec_id"])
        for r in similarity.dup_pairs_by_cosine(emb, threshold=0.95).collect()
    }
    exact_ids = {i for p in exact_pairs for i in p}
    # cell blocking can only LOSE pairs, never invent them
    for r in out:
        if r["n_dups"] > 0:
            assert r["vec_id"] in exact_ids


def test_semantic_dedup_uses_persisted_index(spark):
    """With index_dir, the verdicts must be computed against the
    persisted assignments (same cells as the index on disk)."""
    emb = _planted_embeddings(spark)
    d = os.path.join(tempfile.mkdtemp(prefix="semdedup_idx_"), "ivf")
    out1 = similarity.semantic_dedup(emb, threshold=0.95, index_dir=d)
    cells_from_out = {r["vec_id"]: r["cell"] for r in out1.collect()}
    assert os.path.isdir(d)
    disk = spark.read.parquet(os.path.join(d, "assignments"))
    cells_on_disk = {r["id"]: int(r["cell"]) for r in disk.collect()}
    assert cells_from_out == cells_on_disk
    # second call reuses the index (no refit): verdicts identical
    out2 = similarity.semantic_dedup(emb, threshold=0.95, index_dir=d)
    assert sorted(map(tuple, out1.collect())) == sorted(map(tuple, out2.collect()))


def test_verbatim_leak_catches_what_fraction_budget_misses(spark):
    """A long doc quoting one eval answer verbatim sits under the 20%
    3-gram budget (contamination keeps it) but shares an 8-token
    window (verbatim_leaks flags it); clean docs flag nothing. The
    eval side must broadcast."""
    from archetype_spark.operators import decontam
    from archetype_spark.plans import formatted_plan

    answer = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    filler = " ".join(f"w{i}" for i in range(160))
    train = spark.createDataFrame(
        [(1, filler + " " + answer), (2, filler)],
        "doc_id int, text string",
    )
    ev = spark.createDataFrame([(100, answer)], "doc_id int, text string")
    frac = {
        r["doc_id"]: r["keep"]
        for r in decontam.contamination(train, ev, n=3, max_frac=0.2).collect()
    }
    assert frac == {1: True, 2: True}  # fractional budget misses the quote
    leaks = {
        r["doc_id"]: (r["leaked"], r["n_leaked"])
        for r in decontam.verbatim_leaks(train, ev, n=8).collect()
    }
    assert leaks[1] == (True, 1)
    assert leaks[2] == (False, 0)
    plan = formatted_plan(decontam.verbatim_leaks(train, ev, n=8))
    assert "BroadcastHashJoin" in plan
