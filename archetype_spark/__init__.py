"""archetype_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the
VangelisTech/archetype reference (an ECS simulation engine over
Daft/LanceDB) on idiomatic Spark: DataFrame/SQL plans optimized by
Catalyst, append-only event-sourced archetype tables with
latest-wins views, plus the LLM-data-pipeline operator family
(dedup, similarity search, text analysis, multimodal plumbing)
designed for 100 TB scale.

Layout:
  session    — SparkSession factory with scale-tuned defaults
  tables     — loaders for the driver's parquet corpus
  queries/   — the declared query corpus (SURVEY.md §2.4) + oracles
  ecs/       — the ECS engine (Component/Store/World/System)
  operators/ — dedup, similarity, temporal joins, text, multimodal
  functions/ — reusable column expressions (vector math, text)
  streaming/ — structured-streaming lift of the step loop
  plans/     — physical-plan audit helpers
  sources/   — uniform reader/writer surface
"""

from archetype_spark.ecs import (
    Component,
    Processor,
    World,
    make_world,
    processor,
)
from archetype_spark.session import get_spark

__all__ = [
    "get_spark",
    "make_world",
    "World",
    "Component",
    "Processor",
    "processor",
]
__version__ = "0.1.0"
