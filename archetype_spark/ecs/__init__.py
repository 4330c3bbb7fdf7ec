"""ECS (Entity-Component-System) core — the reference's actual API,
re-expressed Spark-first.

Reference: /root/reference/archetype/core/__init__.py:11-31
(make_world wires store/querier/updater/system/world over a LanceDB
connection). Here the "connection" is a SparkSession plus a warehouse
directory of per-archetype parquet tables.

Architecture decisions (SURVEY.md §7):
- append-only event-sourcing + latest-wins windows instead of LanceDB
  MERGE (store.py:258-264 in the reference) — zero extra deps, and at
  100 TB an append is a partition-local write while a MERGE is a
  full-key shuffle.
- all state (catalog, entity counter, commit sequence) is derivable
  from storage, unlike the reference's driver-only dicts
  (store.py:47-49) — crash recovery is a re-scan, not data loss.
"""

from archetype_spark.ecs.component import Component, component_schema
from archetype_spark.ecs.processor import Processor, processor
from archetype_spark.ecs.querier import QueryManager
from archetype_spark.ecs.store import ArchetypeStore
from archetype_spark.ecs.system import SimpleSystem
from archetype_spark.ecs.updater import UpdateManager
from archetype_spark.ecs.world import World


def make_world(
    spark,
    warehouse: str,
    simulation: str | None = None,
    run: str | None = None,
) -> World:
    """Wire the ECS engine over a warehouse directory (reference:
    archetype/core/__init__.py:11-31). Synchronous — Spark manages its
    own async I/O; the reference's asyncio layer existed only to drive
    LanceDB's tokio client."""
    store = ArchetypeStore(spark, warehouse, simulation=simulation, run=run)
    querier = QueryManager(store)
    updater = UpdateManager(store)
    system = SimpleSystem(querier)
    return World(store=store, querier=querier, updater=updater, system=system)


# Imported after make_world exists — aio.make_async_world wraps it.
from archetype_spark.ecs.aio import AsyncWorld, make_async_world  # noqa: E402


__all__ = [
    "World",
    "AsyncWorld",
    "make_async_world",
    "Processor",
    "processor",
    "Component",
    "component_schema",
    "ArchetypeStore",
    "QueryManager",
    "UpdateManager",
    "SimpleSystem",
    "make_world",
]
