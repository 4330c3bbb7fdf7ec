"""Processor contract (reference: archetype/core/processor.py,
base.py:7-37): a priority-ordered transform over the lazy DataFrame of
every archetype containing its declared components.

`process` receives a pyspark DataFrame and must return one (identity
by default, processor.py:14-15). Prefer native Column expressions —
they stay inside whole-stage codegen; reach for applyInPandas only
when the semantics genuinely aren't expressible (SURVEY §2.2 UDF row).
"""

from __future__ import annotations

from typing import Dict, Tuple, Type

from pyspark.sql import DataFrame

from archetype_spark.ecs.component import Component


class Processor:
    priority: int = 0
    components: Tuple[Type[Component], ...] = ()

    def preprocess(self, querier, step: int) -> Dict[str, DataFrame]:
        """Fetch the live state of this processor's components as of
        `step`, keyed by archetype hash (processor.py:9-12)."""
        if not self.components:
            raise ValueError(
                "Processor must declare components — use the "
                "@processor(Component1, Component2) decorator"
            )
        return querier(self.components, step=step)

    def process(self, df: DataFrame, dt: float) -> DataFrame:
        """Identity by default (processor.py:14-15)."""
        return df


def processor(*component_types: Type[Component], priority: int = 0):
    """Class decorator declaring which components a Processor
    reads/writes (processor.py:19-28)."""

    def wrap(cls):
        cls.components = component_types
        cls.priority = priority
        return cls

    return wrap
