from archetype_spark.sources.delta import (
    checkpoint_delta,
    last_txn_version,
    merge_delta,
    read_delta,
    read_delta_changes,
    streaming_delta_sink,
    vacuum_delta,
    write_delta,
)
from archetype_spark.sources.iceberg import (
    expire_snapshots_iceberg,
    merge_iceberg,
    read_iceberg,
    snapshots_iceberg,
    vacuum_iceberg,
    write_iceberg,
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
    "checkpoint_delta",
    "last_txn_version",
    "merge_delta",
    "merge_iceberg",
    "read_delta",
    "read_delta_changes",
    "expire_snapshots_iceberg",
    "read_iceberg",
    "snapshots_iceberg",
    "vacuum_iceberg",
    "read_table",
    "write_bucketed_table",
    "streaming_delta_sink",
    "vacuum_delta",
    "write_delta",
    "write_iceberg",
    "write_table",
]
