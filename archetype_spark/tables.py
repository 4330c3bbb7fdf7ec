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
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            # integral DIV: double division would lose precision at
            # ~1e18 nanoseconds (beyond 2^53)
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every corpus table as a temp view for spark.sql use."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
