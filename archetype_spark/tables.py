"""Loaders for the driver's parquet corpus (TESTDATA.md).

One parquet file per table under /root/testdata/sf*/ — the loader is
a thin `spark.read.parquet` so that Catalyst owns predicate pushdown
and column pruning (the reference pushes only simulation/run
predicates into its Lance scans and filters the rest
post-materialization, reference: archetype/core/store.py:211-216,
querier.py:32-33 — Spark strictly improves on this for free).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: (abs path) -> (mtime_ns, size, StructType). Schema-on-read
#: inference costs a ~75-90 ms driver-side footer pass PER
#: spark.read.parquet call (measured local[32], guide §5 "the driver
#: should do almost no data work") — for a corpus query that loads
#: 2-3 tables that is a fixed 0.15-0.3 s tax per execution. A real
#: deployment reads these tables through a catalog that already
#: knows the schema; this process-local memo is the engine-side
#: equivalent. It caches METADATA only (never rows, never results),
#: is keyed on the file's identity (mtime+size) so a regenerated
#: /root/testdata invalidates naturally, and dies with the process.
_SCHEMA_CACHE: dict[str, tuple[int, int, object]] = {}


def _read_with_cached_schema(spark: SparkSession, path: str) -> DataFrame:
    try:
        st = os.stat(path)
    except OSError:
        # missing file: let Spark raise its usual AnalysisException
        return spark.read.parquet(path)
    key = os.path.abspath(path)
    hit = _SCHEMA_CACHE.get(key)
    if hit is not None and hit[0] == st.st_mtime_ns and hit[1] == st.st_size:
        return spark.read.schema(hit[2]).parquet(path)
    df = spark.read.parquet(path)
    _SCHEMA_CACHE[key] = (st.st_mtime_ns, st.st_size, df.schema)
    return df


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one corpus table as a lazy DataFrame.

    `events.ts` is physically TIMESTAMP(NANOS) parquet, which Spark
    only reads via the nanosAsLong legacy conf — so it arrives as
    nanosecond bigints and is converted right here to a microsecond
    timestamp (truncation, matching DuckDB's ns->us handling). The
    conf is set lazily so the engine works under any caller's session.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    # Timestamp outputs (q18/q24/q45-q47/q51) must serialize in UTC to
    # hash-match the (timezone-naive) DuckDB oracle regardless of the
    # caller's session defaults — the driver builds its own session.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = _read_with_cached_schema(spark, f"{sf_dir}/{name}.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            # integral DIV: double division would lose precision at
            # ~1e18 nanoseconds (beyond 2^53)
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        return df
    return _read_with_cached_schema(spark, f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every corpus table as a temp view for spark.sql use."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
