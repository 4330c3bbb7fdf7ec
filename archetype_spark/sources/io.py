"""Source/sink surface (SURVEY §2.2 Sources/Sinks rows).

The reference hands processors Daft's reader/writer family
(read_parquet/csv/json/lance/iceberg/deltalake, write_*;
pyproject.toml:7-10). Spark equivalents are one dispatch away; this
module is the uniform entry point plus the defaults that matter at
scale:

- parquet: snappy, v2 pages; the only format for data at rest.
- csv/json: header + schema handling and a REQUIRED explicit-or-
  sampled schema at scale (schema inference reads the data twice).
- lance/iceberg/delta: format names accepted and dispatched to
  `spark.read.format(...)` — they engage when the corresponding
  connector jars are on the classpath, which this container doesn't
  ship; the dispatch is tested with the built-in formats.

Writers default to snappy parquet with optional partition columns and
sortWithinPartitions, which is what substitutes for the reference's
BTree indexes (parquet min/max row-group stats; store.py:107-108).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

_FORMATS = {"parquet", "csv", "json", "orc", "delta", "iceberg", "lance", "avro"}


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: StructType | str | None = None,
    **options: str,
) -> DataFrame:
    """Uniform reader. csv defaults: header=true. json: one object per
    line (spark's jsonl default). Explicit `schema` skips inference —
    mandatory practice on large inputs."""
    if fmt not in _FORMATS:
        raise ValueError(f"unknown format {fmt!r}; expected one of {sorted(_FORMATS)}")
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv":
        options.setdefault("header", "true")
    return reader.format(fmt).options(**options).load(path)


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "error",
    partition_by: Sequence[str] | None = None,
    sort_by: Sequence[str] | None = None,
    **options: str,
) -> None:
    """Uniform writer. `sort_by` sorts within partitions before the
    write so parquet row-group stats support skipping on those keys."""
    if fmt not in _FORMATS:
        raise ValueError(f"unknown format {fmt!r}; expected one of {sorted(_FORMATS)}")
    if sort_by:
        df = df.sortWithinPartitions(*sort_by)
    writer = df.write.format(fmt).mode(mode).options(**options)
    if fmt == "csv":
        writer = writer.option("header", "true")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)
