"""UpdateManager (reference: archetype/core/updater.py): the commit
phase of a step — stamp the commit step on every updated row
(updater.py:18) and upsert each modified archetype (updater.py:24).

Spark difference: the reference's `df.to_arrow()` materialized the
whole plan driver-side before handing rows to LanceDB's MERGE; here
the commit IS the action — `upsert` appends the lazy DataFrame
directly, so rows flow executor->storage without a driver bounce.
"""

from __future__ import annotations

from typing import Dict

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from archetype_spark.ecs.store import ArchetypeStore


class UpdateManager:
    def __init__(self, store: ArchetypeStore):
        self._store = store

    def __call__(self, updates: Dict[str, DataFrame], step: int) -> None:
        self.collect(updates, step)

    def collect(self, updates: Dict[str, DataFrame], step: int) -> None:
        for sig_hash, df in updates.items():
            stamped = df.withColumn("step", F.lit(step).cast("long"))
            sig = self._store._hash2sig[sig_hash]
            self._store.upsert(sig, stamped)
