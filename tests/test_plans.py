"""Plan-shape regression tests (SURVEY §4 scale contract).

Correctness tests can stay green while a plan silently degrades — a
lost pushdown or a broadcast that flips to sort-merge only shows up
at scale. These tests pin the physical properties each operator's
scale story depends on.
"""

from __future__ import annotations

import pytest

from archetype_spark.plans import (
    formatted_plan,
    join_impls,
    n_exchanges,
    pushed_filters,
    read_schemas,
)
from archetype_spark.queries import all_queries

QS = all_queries()


def test_q01_filter_and_projection_reach_scan(spark, sf_dir):
    """Filter pushdown + column pruning: the scan must read only the
    4 needed columns and carry the quantity predicate (the reference
    materializes full tables then filters, store.py:211-216 — this is
    the strictly-better plan Catalyst gives for free)."""
    df = QS["q01_scan_filter_project"](spark, sf_dir)
    (filters,) = pushed_filters(df)
    assert "l_quantity" in filters, filters
    (cols,) = read_schemas(df)
    assert set(cols) == {
        "l_orderkey",
        "l_linenumber",
        "l_extendedprice",
        "l_quantity",
    }, cols


def test_q03_all_conjuncts_pushed(spark, sf_dir):
    (filters,) = pushed_filters(QS["q03_compound_predicate"](spark, sf_dir))
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in filters, (col, filters)


def test_q05_small_dim_broadcasts(spark, sf_dir):
    """customer joins orders via broadcast — no shuffle of the fact
    side; at 100 TB the orders scan stays partition-local."""
    impls = join_impls(QS["q05_inner_join"](spark, sf_dir))
    assert impls == ["BroadcastHashJoin"], impls


def test_q06_multiway_join_all_broadcast(spark, sf_dir):
    """TPC-H Q5 shape: every dimension (customer/nation/region) hangs
    off the lineitem-orders spine as a broadcast; the only shuffles
    are the spine join + final aggregate."""
    df = QS["q06_multiway_join"](spark, sf_dir)
    impls = join_impls(df)
    assert impls.count("BroadcastHashJoin") >= 3, impls
    assert "CartesianProduct" not in impls


def test_q12_single_shuffle_aggregate(spark, sf_dir):
    """Partial (map-side) aggregation: one shuffle for the group-by,
    one for the final small sort — nothing else."""
    df = QS["q12_grouped_agg"](spark, sf_dir)
    assert n_exchanges(df) <= 2, formatted_plan(df)


def test_q24_latest_state_single_shuffle(spark, sf_dir):
    """The M4 latest-state window must cost exactly one shuffle on the
    partition key (+ the output sort)."""
    df = QS["q24_latest_state"](spark, sf_dir)
    assert n_exchanges(df) <= 2, formatted_plan(df)


def test_q30_pairwise_is_gemm_fanned(spark, sf_dir):
    """The exact cosine kernel's auto tier is GEMM candidates — since
    r7 an EXECUTOR-SIDE cogrouped Arrow stage (probe groups x
    replicated build side: the corpus never lands on the driver, r6
    VERDICT wrong-item #2) feeding broadcast-hash candidate re-score
    joins — never a 1-task cartesian or nested loop."""
    df = QS["q30_cosine_topk"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "FlatMapCoGroupsInPandas" in plan, plan
    impls = join_impls(df)
    assert "CartesianProduct" not in impls, impls
    assert "BroadcastNestedLoopJoin" not in impls, impls
    assert "BroadcastHashJoin" in impls, impls


def test_q40_no_single_task_signature_stage(spark, sf_dir):
    """The InferFiltersFromGenerate regression guard: no xxhash64 may
    appear below the fan-out exchange (i.e., in a Filter directly over
    the scan)."""
    plan = formatted_plan(QS["q40_minhash_pairs"](spark, sf_dir))
    scan_region = plan.split("Exchange", 1)[0]
    # The tree section lists node names only; detail sections follow.
    # Find the Filter detail that sits directly on the scan (node 2).
    import re

    m = re.search(r"\(2\) Filter\n(.*?)\n\n", plan, re.S)
    if m:
        assert "xxhash64" not in m.group(1), m.group(1)[:500]


def test_q51_asof_is_joinless_merge(spark, sf_dir):
    """The as-of join must compile to the union+window merge — NO join
    operator (an inequality join would be a per-key nested loop)."""
    df = QS["q51_asof_join"](spark, sf_dir)
    assert join_impls(df) == [], join_impls(df)
    assert n_exchanges(df) <= 2


def test_q52_range_join_is_equi(spark, sf_dir):
    """The bucketed range join must be an equi join (hash/merge), never
    a nested loop or cartesian over the inequality predicate."""
    impls = join_impls(QS["q52_range_join"](spark, sf_dir))
    assert impls, "expected a join"
    assert set(impls) <= {"BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin"}, impls


def test_ecs_hot_loop_shuffle_free(spark, tmp_path):
    """The per-step processor transform itself adds no exchange beyond
    the latest-state window's single shuffle (SURVEY §4.2: the ECS hot
    path is embarrassingly parallel)."""
    from dataclasses import dataclass

    from pyspark.sql import functions as F

    from archetype_spark.ecs import Component, make_world

    @dataclass
    class P(Component):
        x: float

    world = make_world(spark, str(tmp_path / "wh"), simulation="plan")
    world.spawn(P(x=1.0))
    (df,) = world.latest(P).values()
    transformed = df.withColumn("p__x", F.col("p__x") + 1.0)
    assert n_exchanges(transformed) <= 1, formatted_plan(transformed)


def test_hash_split_is_narrow(spark, sf_dir):
    """Split assignment is a map-only column expression: zero
    exchanges on top of the scan — at 100 TB the train/test fence
    costs nothing."""
    from archetype_spark.operators import sampling
    from archetype_spark.tables import load

    df = sampling.hash_split(load(spark, sf_dir, "documents"), id_col="doc_id")
    assert n_exchanges(df) == 0, formatted_plan(df)


def test_pack_sequences_window_is_partitioned(spark, sf_dir):
    """The packing window must hash-partition on the shard column —
    a SinglePartition window would serialize the whole corpus through
    one task (the global-sort trap SCALE.md forbids)."""
    from pyspark.sql import functions as F

    from archetype_spark.operators import packing
    from archetype_spark.tables import load

    d = load(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.size(F.split(F.col("text"), " ")).alias("n_tokens")
    )
    plan = formatted_plan(packing.pack_sequences(d, budget=2048))
    assert "SinglePartition" not in plan, plan
    assert "Window" in plan, plan
