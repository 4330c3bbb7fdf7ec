"""SimpleSystem (reference: archetype/core/system.py): priority-ordered
sequential processor execution with intra-step read-your-writes.

Semantics preserved (system.py:26-58):
- processors run sorted by `priority` (O1, system.py:42);
- processor n+1 sees processor n's in-flight DataFrame for the same
  archetype (O2, system.py:46: `modified_archetypes.get(hash, queried)`);
- returning None is a contract violation (O3, system.py:50-51);
- only archetypes actually touched are returned for commit.

Spark-specific: each processor appends lazy transformations, so plan
depth grows with processor count within a step. That's fine for the
common few-processor case; the commit write at step end truncates
lineage for the NEXT step (it re-reads parquet). For very long
processor chains, `SimpleSystem(checkpoint_every=k)` inserts
`localCheckpoint(eager=False)` every k processors to bound plan depth
(SURVEY §7 hard-part 2 — the reference gets the same effect by
accident, materializing to Arrow every step, updater.py:24).
"""

from __future__ import annotations

from typing import Dict, List, Type

from pyspark.sql import DataFrame

from archetype_spark.ecs.processor import Processor
from archetype_spark.ecs.querier import QueryManager


class SimpleSystem:
    def __init__(self, querier: QueryManager, checkpoint_every: int = 8):
        self.processors: List[Processor] = []
        self.querier = querier
        self.checkpoint_every = checkpoint_every

    def add_processor(self, proc: Processor) -> None:
        self.processors.append(proc)

    def remove_processor(self, proc_type: Type[Processor]) -> None:
        for p in self.processors:
            if isinstance(p, proc_type):
                self.processors.remove(p)
                return

    def execute(self, step: int, dt: float) -> Dict[str, DataFrame]:
        modified: Dict[str, DataFrame] = {}
        for i, proc in enumerate(sorted(self.processors, key=lambda x: x.priority)):
            # Latest live state as of `step` — not the exact-step filter;
            # see querier.py docstring for why the reference's literal
            # preprocess reads empty frames after step 0.
            queried = self.querier.latest(*proc.components, as_of_step=step)
            for hash_val, queried_df in queried.items():
                df_in = modified.get(hash_val, queried_df)
                df_out = proc.process(df_in, dt)
                if df_out is None:
                    raise ValueError(
                        f"Processor {type(proc).__name__} returned None. It "
                        "should return the input DataFrame if no changes were "
                        "intended."
                    )
                if (
                    self.checkpoint_every
                    and (i + 1) % self.checkpoint_every == 0
                ):
                    df_out = df_out.localCheckpoint(eager=False)
                modified[hash_val] = df_out
        return modified
