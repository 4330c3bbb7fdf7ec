"""Registration-order contract: the driver's CORRECTNESS snapshot only
records the first DRIVER_WINDOW (50) registered queries, so every
oracle-gated query must land inside that window or it silently loses
its hard-signal check (this is exactly what cost 12 queries their
driver rows in round 1)."""

from __future__ import annotations

from archetype_spark.queries import DRIVER_WINDOW, all_oracles, all_queries


def test_every_oracle_gated_query_is_inside_driver_window():
    names = list(all_queries())
    oracles = set(all_oracles())
    outside = [n for n in names[DRIVER_WINDOW:] if n in oracles]
    assert outside == [], (
        f"oracle-gated queries registered outside the driver's "
        f"{DRIVER_WINDOW}-entry CORRECTNESS window: {outside}"
    )


def test_window_is_not_wasted_on_rows_only_queries():
    names = list(all_queries())
    oracles = set(all_oracles())
    n_oracled = len([n for n in names if n in oracles])
    head = names[: min(DRIVER_WINDOW, n_oracled)]
    wasted = [n for n in head if n not in oracles]
    assert wasted == [], (
        f"rows-only queries occupy checked slots ahead of oracle-gated "
        f"ones: {wasted}"
    )


def test_every_oracle_has_a_query():
    missing = set(all_oracles()) - set(all_queries())
    assert missing == set()
