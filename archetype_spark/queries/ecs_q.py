"""T-SIM through the driver contract (oracle-gated).

Runs the reference's toy kinematics simulation (SURVEY §2.4 T-SIM;
reference tests/test_toy.py:24-58) on the ECS core in a temp
warehouse and returns the full Position history: 3 entities x
(spawn + 10 steps) = 33 deterministic rows. The oracle is a literal
VALUES table computed from the same spec arithmetic the reference's
own test pins (tests/test_toy.py:17-21 — entity 1 ends at exactly
x=1.0), so the driver hash-verifies the whole ECS write/read path:
spawn id allocation, per-step upsert commits, history resolution.
Exact final positions are additionally asserted in
tests/test_ecs.py::test_tsim_exact.
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
    # One batch spawn, not three: ids are allocated by list position
    # (1..3, identical to sequential world.spawn calls) and the three
    # step-0 rows land in ONE commit instead of three — each commit is
    # a full Spark job, and the local job floor is ~0.2 s regardless
    # of row count. History output is byte-identical.
    world.spawn_many(
        [
            [Position(x=0.0, y=0.0), Velocity(vx=1.0, vy=1.0)],
            [Position(x=10.0, y=5.0), Velocity(vx=2.0, vy=-1.0)],
            [Position(x=-5.0, y=-10.0), Velocity(vx=-0.5, vy=0.5)],
        ]
    )
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


#: (entity_id, (x0, y0), (vx, vy)) — the reference toy fixture
#: (tests/test_toy.py:24-58), spawned in this order so ids are 1..3.
_TSIM_ENTITIES = [
    (1, (0.0, 0.0), (1.0, 1.0)),
    (2, (10.0, 5.0), (2.0, -1.0)),
    (3, (-5.0, -10.0), (-0.5, 0.5)),
]


def _tsim_values() -> str:
    """The expected history as SQL literals: per entity, the spawn row
    (step 0) then 10 Euler steps of p += v*dt at dt=0.1 — the same
    accumulation the MovementProcessor performs, rounded to 6 like the
    query output (float accumulation noise ~1e-16 is far below the
    rounding step, so these literals are exact on both engines)."""
    rows = []
    for eid, (x, y), (vx, vy) in _TSIM_ENTITIES:
        rows.append((eid, 0, round(x, 6), round(y, 6)))
        for s in range(1, 11):
            x += vx * 0.1
            y += vy * 0.1
            rows.append((eid, s, round(x, 6), round(y, 6)))
    return ", ".join(f"({e}, {s}, {x!r}, {y!r})" for e, s, x, y in rows)


ORACLES: dict[str, str] = {
    "q50_ecs_tsim": f"""
        SELECT CAST(entity_id AS BIGINT) AS entity_id,
               CAST(step AS BIGINT) AS step,
               CAST(x AS DOUBLE) AS x,
               CAST(y AS DOUBLE) AS y,
               TRUE AS is_active
        FROM (VALUES {_tsim_values()}) t(entity_id, step, x, y)
        ORDER BY entity_id, step
    """
}

QUERIES = {"q50_ecs_tsim": q50_ecs_tsim}
