from archetype_spark.sources.delta import read_delta, write_delta
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
    "read_delta",
    "read_table",
    "write_bucketed_table",
    "write_delta",
    "write_table",
]
