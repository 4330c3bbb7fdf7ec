"""Plan-shape snapshots: a generic formatted-explain normalizer that
reduces any query's physical plan to counts of the scale-relevant
node kinds, so the WHOLE corpus's plan shapes can be recorded once
and diffed on every test run.

The bespoke plan pins (tests/test_plans*.py) assert specific facts
about specific queries; this harness is the safety net UNDER them —
an accidental cartesian product, a lost broadcast, a surprise
exchange, or a Python-eval node sneaking into any of the 96 registered
queries flips a recorded count and fails CI, instead of needing a
human to read plans (r7 verdict, "Next round" #8).

Counts are taken from `explain("formatted")`'s details section, where
every physical node appears exactly once as `(N) NodeName` — the same
stable public surface audit.py parses. Only node KINDS are counted
(never partition numbers, plan ids, or statistics), so snapshots are
stable across machines while still catching strategy flips.
"""

from __future__ import annotations

import json
import re

from pyspark.sql import DataFrame

from archetype_spark.plans.audit import formatted_plan

#: Node kinds whose count changing means the execution strategy
#: changed. Order is the report order.
SHAPE_NODES = (
    "Scan parquet",
    "Exchange",
    "BroadcastExchange",
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
    "HashAggregate",
    "ObjectHashAggregate",
    "SortAggregate",
    "Window",
    "WindowGroupLimit",
    "Generate",
    "MapInPandas",
    "FlatMapGroupsInPandas",
    "FlatMapCoGroupsInPandas",
    "ArrowEvalPython",
    "BatchEvalPython",
)


def plan_shape(df: DataFrame) -> dict[str, int]:
    """Counts of each SHAPE_NODES kind in the physical plan; kinds
    with zero occurrences are omitted, so the dict is the minimal
    stable fingerprint of the plan's strategy."""
    plan = formatted_plan(df)
    shape = {}
    for node in SHAPE_NODES:
        n = len(re.findall(rf"\(\d+\) {re.escape(node)}\b", plan))
        if n:
            shape[node] = n
    return shape


def shape_diff(
    recorded: dict[str, int], current: dict[str, int]
) -> list[str]:
    """Human-readable per-node differences ([] when identical)."""
    out = []
    for node in SHAPE_NODES:
        r, c = recorded.get(node, 0), current.get(node, 0)
        if r != c:
            out.append(f"{node}: recorded {r} -> current {c}")
    return out


def load_snapshot(path: str) -> dict[str, dict[str, int]]:
    with open(path) as fh:
        return json.load(fh)


def save_snapshot(path: str, shapes: dict[str, dict[str, int]]) -> None:
    with open(path, "w") as fh:
        json.dump(shapes, fh, indent=1, sort_keys=True)
        fh.write("\n")
