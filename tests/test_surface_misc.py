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
