"""World facade (reference: archetype/core/world.py): spawn / despawn
/ query / history / the step loop.

Step semantics (world.py:23-33 + SURVEY §2.4 T-SIM): a step reads the
latest committed state (as of `current_step`), runs the processor
chain, stamps the NEXT step number on the result, and appends. Spawn
at step 0 plus N steps yields N+1 step-versions per entity — the
history declared by T-SIM (spawn + 10 commits = 11 versions; final
x = x0 + vx*dt*10). The reference's literal code stamps the CURRENT
step (world.py:26-31 + updater.py:18), which overwrites the step-0
rows and then processes empty frames forever after — a latent defect
its value-free test (tests/test_toy.py:51-54) can't see; we implement
the documented intent (store.py:18-20) rather than the bug.
"""

from __future__ import annotations

import time
import uuid
from typing import Dict, Optional, Type

from pyspark.sql import DataFrame

from archetype_spark.ecs.component import Component
from archetype_spark.ecs.processor import Processor
from archetype_spark.ecs.querier import QueryManager
from archetype_spark.ecs.store import ArchetypeStore
from archetype_spark.ecs.system import SimpleSystem
from archetype_spark.ecs.updater import UpdateManager


class World:
    def __init__(
        self,
        store: ArchetypeStore,
        querier: QueryManager,
        updater: UpdateManager,
        system: SimpleSystem,
    ):
        self.store = store
        self.querier = querier
        self.updater = updater
        self.system = system
        self.id = f"world_{uuid.uuid4().hex}"  # ULID in the reference (world.py:19)
        # Resume the step clock from storage: a World re-attached to an
        # existing (simulation, run) continues where the last commit
        # stopped instead of silently rewinding to 0 (the reference's
        # clock is process-local, world.py:20).
        self.current_step = store.max_committed_step()
        self.step_seconds: list[float] = []  # O8 instrumentation
        # The reference prints per-step timing unconditionally
        # (world.py:32-33); here it is opt-in — bench.py's contract is
        # ONE JSON line on stdout, and step timings are recorded in
        # step_seconds either way.
        self.verbose = False

    # ------------------------------------------------------------- step loop
    def step(self, dt: float) -> None:
        """One simulation tick (world.py:23-33): execute -> commit ->
        advance clock, with per-step wall-time recorded (not just
        printed, unlike world.py:32-33 — BASELINE.md asks for it)."""
        start = time.time()
        updated = self.system.execute(self.current_step, dt)
        commit_step = self.current_step + 1
        self.updater(updated, commit_step)
        self.current_step = commit_step
        elapsed = time.time() - start
        self.step_seconds.append(elapsed)
        if self.verbose:
            print(f"Step {self.current_step} done in {elapsed:.3f}s")

    # ------------------------------------------------------- entity management
    def spawn(self, *components: Component, step: Optional[int] = None) -> int:
        """Create an entity (world.py:39-44)."""
        return self.store.add_entity(list(components), step=step if step is not None else self.current_step)

    def spawn_many(self, entities, step: Optional[int] = None) -> list[int]:
        """Batch spawn — one write job per archetype signature."""
        return self.store.add_entities(
            entities, step=step if step is not None else self.current_step
        )

    def spawn_from_df(
        self, component_types, df, step: Optional[int] = None, order_by=None
    ) -> tuple[int, int]:
        """Distributed spawn: one entity per DataFrame row, ids
        allocated executor-side via per-partition offsets (returns the
        [lo, hi] id range). `order_by`: stable key for retry-
        deterministic id assignment (see store.add_entities_df)."""
        return self.store.add_entities_df(
            component_types,
            df,
            step=step if step is not None else self.current_step,
            order_by=order_by,
        )

    def despawn(self, entity_id: int, step: Optional[int] = None) -> None:
        """Soft-delete (world.py:46-48): tombstone, history retained."""
        self.store.remove_entity(
            entity_id, step if step is not None else self.current_step
        )

    def despawn_many(self, entity_ids, step: Optional[int] = None) -> None:
        """Batch soft-delete: one tombstone-append job per involved
        table regardless of how many entities retire."""
        self.store.remove_entities(
            entity_ids, step if step is not None else self.current_step
        )

    # --------------------------------------------------------------- queries
    def query(
        self, *components: Type[Component], step: Optional[int] = None
    ) -> Dict[str, DataFrame]:
        """Live state at an exact step (world.py:54-62)."""
        return self.querier(
            list(components), step=step if step is not None else self.current_step
        )

    def latest(
        self, *components: Type[Component], step: Optional[int] = None
    ) -> Dict[str, DataFrame]:
        """Latest-state-per-entity view (M4)."""
        return self.querier.latest(
            *components, as_of_step=step if step is not None else self.current_step
        )

    def get_history(
        self, *components: Type[Component], include_all_runs: bool = False
    ) -> Dict[str, DataFrame]:
        """Step-versioned history (world.py:64-66)."""
        return self.querier.get_history(
            *components, include_all_runs=include_all_runs
        )

    # ---------------------------------------------------------------- system
    def add_processor(self, proc: Processor) -> None:
        self.system.add_processor(proc)

    def remove_processor(self, proc_type: Type[Processor]) -> None:
        self.system.remove_processor(proc_type)

    def execute(self, step: int, dt: float) -> Dict[str, DataFrame]:
        return self.system.execute(step, dt)

    def update(self, archetypes: Dict[str, DataFrame], step: int) -> None:
        self.updater(archetypes, step)
