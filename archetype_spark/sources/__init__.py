from archetype_spark.sources.delta import (
    last_txn_version,
    merge_delta,
    read_delta,
    streaming_delta_sink,
    write_delta,
)
from archetype_spark.sources.io import (
    merge_table,
    read_binary_dir,
    read_table,
    write_bucketed_table,
    write_table,
)

__all__ = [
    "merge_table",
    "read_binary_dir",
    "last_txn_version",
    "merge_delta",
    "read_delta",
    "read_table",
    "write_bucketed_table",
    "streaming_delta_sink",
    "write_delta",
    "write_table",
]
