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
    "read_table",
    "write_bucketed_table",
    "write_table",
]
