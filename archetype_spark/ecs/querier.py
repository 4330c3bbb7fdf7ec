"""QueryManager (reference: archetype/core/querier.py).

Two access patterns:
- `query(..., step=s)` / `__call__`: live rows at exact step(s) —
  parity with querier.py:24-36 (`is_in(step)` + `is_active`).
- `latest(..., as_of_step=s)`: latest committed state per entity at or
  before `s` — the M4 view the reference documents as its core access
  pattern but never implemented (store.py:18-20, 215). The step loop
  uses THIS, which is what makes step N read step N-1's commits (the
  reference's literal exact-step preprocess reads an empty frame for
  every step after the first — querier.py:32 filters `step == N`
  before any row with step N exists; its only test never checks
  values, so the defect is latent there).

Unlike the reference (which re-materializes the full table per
processor per step, store.py:211-216), these return lazy DataFrames:
Catalyst pushes step/liveness predicates into the parquet scan.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Type, Union

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from archetype_spark.ecs.component import Component
from archetype_spark.ecs.store import ArchetypeStore


class QueryManager:
    def __init__(self, store: ArchetypeStore):
        self._store = store

    def __call__(
        self,
        component_types: Sequence[Type[Component]],
        step: Union[int, List[int]],
    ) -> Dict[str, DataFrame]:
        steps = [step] if isinstance(step, int) else list(step)
        return self.query(*component_types, step=steps)

    def query(
        self, *component_types: Type[Component], step: List[int]
    ) -> Dict[str, DataFrame]:
        """Exact-step liveness query (querier.py:24-36)."""
        out = {}
        for hash_val, df in self._store.get_archetypes(*component_types).items():
            out[hash_val] = df.filter(
                F.col("step").isin(step) & F.col("is_active")
            )
        return out

    def latest(
        self, *component_types: Type[Component], as_of_step: int | None = None
    ) -> Dict[str, DataFrame]:
        """Latest live state per entity (M4)."""
        out = {}
        for hash_val in self._store._matching_hashes(component_types):
            raw = self._store._read_raw(hash_val)
            if raw is None:
                continue
            raw = raw.filter(
                (F.col("simulation") == self._store.simulation)
                & (F.col("run") == self._store.run)
            )
            out[hash_val] = self._store.latest_state(
                raw, as_of_step=as_of_step
            ).filter(F.col("is_active"))
        return out

    def get_history(
        self, *component_types: Type[Component], include_all_runs: bool = False
    ) -> Dict[str, DataFrame]:
        """Full step-versioned history (querier.py:38-42)."""
        return self._store.get_history(
            *component_types, include_all_runs=include_all_runs
        )
