"""T-SIM through the driver contract (rows-only).

Runs the reference's toy kinematics simulation (SURVEY §2.4 T-SIM;
reference tests/test_toy.py:24-58) on the ECS core in a temp
warehouse and returns the full Position history: 3 entities x
(spawn + 10 steps) = 33 deterministic rows. Exact final positions are
asserted in tests/test_ecs.py::test_tsim_exact; this entry makes the
driver's smoke/correctness runs exercise the ECS engine end-to-end,
not just the relational corpus.
"""

from __future__ import annotations

import tempfile
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from archetype_spark.ecs import Component, Processor, make_world, processor


@dataclass
class Position(Component):
    x: float
    y: float


@dataclass
class Velocity(Component):
    vx: float
    vy: float


@processor(Position, Velocity, priority=1)
class MovementProcessor(Processor):
    def process(self, df: DataFrame, dt: float) -> DataFrame:
        return df.withColumns(
            {
                "position__x": F.col("position__x") + F.col("velocity__vx") * dt,
                "position__y": F.col("position__y") + F.col("velocity__vy") * dt,
            }
        )


def q50_ecs_tsim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3 entities, 10 steps, dt=0.1 (sf_dir unused — the workload is
    the reference's own fixed toy test, not corpus-scaled)."""
    wh = tempfile.mkdtemp(prefix="tsim_wh_")
    world = make_world(spark, wh, simulation="tsim", run="r1")
    world.add_processor(MovementProcessor())
    world.spawn(Position(x=0.0, y=0.0), Velocity(vx=1.0, vy=1.0))
    world.spawn(Position(x=10.0, y=5.0), Velocity(vx=2.0, vy=-1.0))
    world.spawn(Position(x=-5.0, y=-10.0), Velocity(vx=-0.5, vy=0.5))
    for _ in range(10):
        world.step(dt=0.1)
    (history,) = world.get_history(Position).values()
    return history.select(
        "entity_id",
        "step",
        F.round("position__x", 6).alias("x"),
        F.round("position__y", 6).alias("y"),
        "is_active",
    ).orderBy("entity_id", "step")


QUERIES = {"q50_ecs_tsim": q50_ecs_tsim}
ORACLES: dict[str, str] = {}
