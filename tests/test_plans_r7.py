"""Plan-shape pins for the round-7 operators (SURVEY §4 contract):
boilerplate removal's broadcast hot-set and PII scrubbing's
exchange-free narrowness."""

from __future__ import annotations

from archetype_spark.plans import formatted_plan, join_impls, n_exchanges
from archetype_spark.queries import all_queries

QS = all_queries()


def test_q80_hot_set_broadcasts_below_reassembly(spark, sf_dir):
    """The line df-filter must be a join against the SMALL hot set
    (boilerplate is few distinct strings repeated massively), keyed on
    the 8-byte line hash, sitting below the per-doc reassembly
    aggregation — never a window over the corpus and never a shuffle
    of line bodies back."""
    df = QS["q80_boilerplate_lines"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "BroadcastHashJoin" in join_impls(df), join_impls(df)
    assert "xxhash64" in plan, "line df-count must key on the 8-byte hash"
    assert "Window" not in plan, "reassembly regressed to a window sort"
    assert "CartesianProduct" not in plan
    # the df > threshold filter exists and feeds the broadcast side
    assert "_df" in plan and "Filter" in plan


def test_q81_scrub_is_exchange_free(spark, sf_dir):
    """PII scrubbing is narrow regex work: the only exchange in q81
    is the presentation orderBy."""
    df = QS["q81_pii_scrub"](spark, sf_dir)
    assert n_exchanges(df) <= 1, formatted_plan(df)
    plan = formatted_plan(df)
    assert "regexp_replace" in plan


def test_q84_winner_is_partial_aggregated_no_window(spark, sf_dir):
    """The first-occurrence winner must be a struct-MIN aggregation
    with a map-side partial phase (hot paragraphs — e.g. the empty
    line — cost one partial min per task), never a row_number window
    buffering the hot key in one task. Probe join keys on the 8-byte
    paragraph hash."""
    df = QS["q84_paragraph_dedup"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "Window" not in plan, "winner regressed to a window sort"
    assert "partial_min" in plan, "struct-MIN lost its map-side combine"
    assert "xxhash64" in plan, "winner join must key on the 8-byte hash"
    assert "CartesianProduct" not in plan


def test_q86_vocab_broadcasts_no_global_sort(spark, sf_dir):
    """The top-V vocabulary must reach the per-doc probe as a
    broadcast (V rows by construction) and the limit must be a
    TakeOrdered, never a full global Sort of the gram counts."""
    df = QS["q86_oov_rate"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "BroadcastHashJoin" in join_impls(df), join_impls(df)
    assert "TakeOrderedAndProject" in plan, "top-V regressed to global sort"
    assert "CartesianProduct" not in plan


def test_q95_composition_single_tree(spark, sf_dir):
    """The composed pipeline must stay one lazy Catalyst tree: no
    cartesian products, no per-row Python UDFs (BatchEvalPython), the
    mixture rates still reach the corpus as a broadcast."""
    df = QS["q95_curation_v2"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan, "per-row Python UDF crept in"
    assert "BroadcastHashJoin" in join_impls(df)
