"""SparkSession factory with scale-minded defaults.

The reference delegates execution to Daft's Rust runtime and LanceDB
storage (reference: archetype/core/__init__.py:11-12 connects the
store; pyproject.toml:7-10 pins the engines). Here the equivalent
"connect" is building a SparkSession whose defaults are chosen for
the 100 TB design point:

- AQE on (runtime re-planning: join strategy switch, partition
  coalescing, skew-join splitting) — on a 1000-executor cluster this
  is what keeps a bad static plan from burning the job.
- Arrow-based Python interchange on — every toPandas/createDataFrame
  and every pandas_udf batch crosses Python<->JVM via Arrow.
- Session timezone pinned to UTC so timestamp semantics are identical
  to the DuckDB oracle (naive == UTC).
- shuffle.partitions sized by env for local runs; on a real cluster
  AQE coalescing makes the static number mostly irrelevant.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "archetype-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the SparkSession.

    Env knobs (driver contract): SPARK_GRAFT_CPUS sets local
    parallelism; defaults to all cores.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus != "*" else (os.cpu_count() or 8)

    # Size the single local JVM for its parallelism: Spark's default
    # 1g heap shared by 32 concurrent tasks is ~30 MB of working heap
    # each — measured OOM on the banded MinHash join at a 10x (50k
    # doc) stress corpus, while the same plan at 8g finishes
    # comfortably. On a real cluster executors get dedicated heaps
    # and this knob is the deploy config's business; locally it must
    # come from the factory (driver memory is fixed at JVM launch —
    # set before the first session, env SPARK_GRAFT_DRIVER_MEM to
    # override).
    driver_mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.driver.memory", driver_mem)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # INT64 micros, not Spark's legacy INT96: the Iceberg spec
        # REQUIRES int64 timestamp encodings, and INT96 columns carry
        # no parquet min/max stats (so manifest column bounds and
        # row-group skipping would silently never apply to them)
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.maxResultSize", "4g")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
