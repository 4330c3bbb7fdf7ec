"""Custom per-key streaming state: applyInPandasWithState.

The streaming analogue of a stateful Processor — memory that survives
across micro-batches, partitioned by key. Demonstrated with a running
per-user accumulator over the `events` schema (event count + value
sum carried in GroupState), the shape a per-entity simulation state
would take (SURVEY §2.2 streaming row).

Scale: state lives in the executor state store partitioned by key —
no driver bottleneck; a watermark bounds state growth via timeouts.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

RUNNING_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("n_events", LongType(), False),
        StructField("sum_value", DoubleType(), False),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("n", LongType(), False),
        StructField("s", DoubleType(), False),
    ]
)


def _accumulate(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, s = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].sum())
    state.update((n, s))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "sum_value": [s]}
    )


def running_totals(events_stream: DataFrame) -> DataFrame:
    """Per-user running totals carried in GroupState across
    micro-batches. Emits the updated total for each key seen in the
    batch (update-mode semantics)."""
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _accumulate,
        outputStructType=RUNNING_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# applyInPandasWithState ships _accumulate to Python workers by
# pickle; register by value so consumers outside the repo root work
# (same trap as operators/multimodal.py).
import sys  # noqa: E402

try:
    from pyspark.cloudpickle import register_pickle_by_value
except ImportError:  # pragma: no cover
    from cloudpickle import register_pickle_by_value

register_pickle_by_value(sys.modules[__name__])
