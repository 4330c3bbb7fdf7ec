"""Direct exercises for [D]-surface rows not covered by an oracle
query: `sample` (RNG — not oracle-comparable across engines) and
`any_value` (nondeterministic unless the group is single-valued)."""

from __future__ import annotations

from pyspark.sql import functions as F

from archetype_spark.tables import load

SF = "/root/testdata/sf0.001"


def test_sample_is_seed_deterministic(spark):
    li = load(spark, SF, "lineitem")
    n = li.count()
    a = li.sample(fraction=0.1, seed=42)
    b = li.sample(fraction=0.1, seed=42)
    ra = sorted((r["l_orderkey"], r["l_linenumber"]) for r in a.collect())
    rb = sorted((r["l_orderkey"], r["l_linenumber"]) for r in b.collect())
    assert ra == rb
    # Bernoulli sampling: expect ~10%, allow generous slack
    assert 0.05 * n < len(ra) < 0.15 * n


def test_any_value_on_functionally_dependent_group(spark):
    """any_value is safe exactly when the value is functionally
    determined by the group key — here nation name per nation key."""
    c = load(spark, SF, "customer")
    n = load(spark, SF, "nation").select(
        F.col("n_nationkey").alias("c_nationkey"), "n_name"
    )
    joined = c.join(F.broadcast(n), "c_nationkey")
    got = {
        (r["c_nationkey"], r["nation_name"])
        for r in joined.groupBy("c_nationkey")
        .agg(F.any_value("n_name").alias("nation_name"))
        .collect()
    }
    want = {
        (r["c_nationkey"], r["n_name"])
        for r in n.join(
            c.select("c_nationkey").distinct(), "c_nationkey", "left_semi"
        ).collect()
    }
    assert got == want


def test_relative_quality_gate_median_fence_and_ties(spark):
    import pytest

    from archetype_spark.operators.textstats import relative_quality_gate

    # group A: scores 0.1..1.0 -> ceil(0.5*10)=5th smallest = 0.5 is
    # the fence; 0.5..1.0 (6 rows) survive. group B: all-tied scores
    # -> fence is the tie value, everyone survives.
    rows = [(i, "A", (i + 1) / 10.0) for i in range(10)]
    rows += [(100 + i, "B", 0.3) for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id int, grp string, score double")
    kept = relative_quality_gate(df, "grp", "score", q=0.5)
    got = {(r["grp"], r["doc_id"]) for r in kept.collect()}
    assert got == {("A", i) for i in range(4, 10)} | {
        ("B", 100 + i) for i in range(4)
    }
    # q=1.0 keeps only the max (and its ties)
    top = relative_quality_gate(df, "grp", "score", q=1.0)
    got_top = {(r["grp"], r["doc_id"]) for r in top.collect()}
    assert got_top == {("A", 9)} | {("B", 100 + i) for i in range(4)}
    with pytest.raises(ValueError, match="q must be"):
        relative_quality_gate(df, "grp", "score", q=0.0)


def test_swap_slot_restores_old_on_failed_rename(tmp_path):
    """_swap_slot (the fixture-slot discipline): when the second
    rename fails, the old slot is restored — a failed swap can never
    leave the path empty — and a successful swap removes the aside
    copy."""
    import pytest

    from archetype_spark.queries.northstar import _swap_slot

    idx = tmp_path / "slot"
    idx.mkdir()
    (idx / "f").write_text("old")
    with pytest.raises(FileNotFoundError):
        _swap_slot(str(idx), str(tmp_path / "missing-building"))
    assert (idx / "f").read_text() == "old"  # restored, not lost
    import os

    building = tmp_path / "building"
    building.mkdir()
    (building / "f").write_text("new")
    _swap_slot(str(idx), str(building))
    assert (idx / "f").read_text() == "new"
    assert not building.exists()
    assert not [p for p in os.listdir(tmp_path) if p.startswith(".old-")]
