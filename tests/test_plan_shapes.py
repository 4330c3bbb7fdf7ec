"""Corpus-wide plan-shape regression net (plans/snapshot.py): every
registered query's physical-plan node counts must match the recorded
snapshot — an accidental cartesian, lost broadcast, strategy flip or
surprise shuffle in ANY query fails here instead of waiting for a
human to read plans.

Snapshots are recorded at SF_SMOKE (plan STRUCTURE is sf-independent
for these queries; the file pins whatever scale recorded it). To
(re)record after an intentional plan change or a new query:

    SPARK_GRAFT_PLAN_SNAPSHOT=update pytest tests/test_plan_shapes.py

and commit the diff of tests/plan_shapes.json alongside the change —
the diff IS the reviewable plan-impact statement.
"""

from __future__ import annotations

import os

import pytest

from archetype_spark import queries
from archetype_spark.plans import snapshot

SNAPSHOT_PATH = os.path.join(os.path.dirname(__file__), "plan_shapes.json")
_UPDATE = os.environ.get("SPARK_GRAFT_PLAN_SNAPSHOT") == "update"

_ALL = queries.all_queries()


@pytest.fixture(scope="module")
def recorded():
    if not os.path.exists(SNAPSHOT_PATH):
        return {}
    return snapshot.load_snapshot(SNAPSHOT_PATH)


_collected: dict[str, dict[str, int]] = {}


@pytest.mark.parametrize("name", sorted(_ALL))
def test_plan_shape(name, spark, sf_dir, recorded):
    shape = snapshot.plan_shape(_ALL[name](spark, sf_dir))
    _collected[name] = shape
    if _UPDATE:
        return
    if name not in recorded:
        pytest.fail(
            f"{name} has no recorded plan shape — run "
            "SPARK_GRAFT_PLAN_SNAPSHOT=update pytest "
            "tests/test_plan_shapes.py and commit plan_shapes.json"
        )
    diff = snapshot.shape_diff(recorded[name], shape)
    assert not diff, f"{name} plan shape changed: {'; '.join(diff)}"


def test_no_stale_snapshot_entries(recorded):
    """Deleted/renamed queries must leave the snapshot too."""
    if _UPDATE:
        # MERGE into the existing snapshot rather than replacing it:
        # an update run filtered with -k (or a partially-failed one)
        # must not silently discard the shapes it didn't re-record.
        # Entries for queries no longer registered are dropped here —
        # the only place stale rows can leave.
        merged = {
            **{k: v for k, v in recorded.items() if k in _ALL},
            **_collected,
        }
        snapshot.save_snapshot(SNAPSHOT_PATH, merged)
        return
    stale = sorted(set(recorded) - set(_ALL))
    assert not stale, f"snapshot has entries for unregistered queries: {stale}"
