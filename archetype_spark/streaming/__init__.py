"""Structured Streaming lift (SURVEY §7 phase 7).

The reference has NO streaming surface: its step loop
(reference world.py:23-33) is a synchronous micro-batch loop with no
watermarks, event-time windows, or late-data handling (SURVEY §2.2,
"Streaming-only: None"). This package supplies the Spark-native lift:

- windows.py: event-time tumbling / sliding / session windows with
  watermarks — the same builders serve batch DataFrames (oracle-
  testable vs DuckDB) and streaming DataFrames (watermark applied).
- world_stream.py: `foreachBatch` driver that turns an event stream
  into simulation steps — each micro-batch spawns/updates entities
  and advances the world clock, making the ECS engine a continuous
  ingestion target.
- stateful.py: per-key custom state via applyInPandasWithState —
  the streaming analogue of a Processor that needs memory across
  micro-batches.
"""

from archetype_spark.streaming.windows import (
    session_agg,
    sliding_agg,
    tumbling_agg,
    with_watermark,
)

__all__ = ["tumbling_agg", "sliding_agg", "session_agg", "with_watermark"]
