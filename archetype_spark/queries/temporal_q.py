"""Temporal join queries (q51-q52), oracle-gated.

q51: as-of join — for each purchase event, the user's most recent
click at or before it (DuckDB has native ASOF JOIN as the oracle).
q52: range join — per signup, count/sum of the user's events within
the following hour (plain inequality-join SQL as the oracle; the
Spark side uses the bucketed linear-cost plan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from archetype_spark.operators.temporal import asof_join, range_join
from archetype_spark.tables import load


def q51_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    out = asof_join(
        purchases,
        clicks,
        keys=["user_id"],
        ts_col="ts",
        right_cols=["event_id", "value"],
    )
    return out.select(
        "event_id",
        "user_id",
        F.round("value", 6).alias("value"),
        F.col("r_event_id").alias("click_event_id"),
        F.round("r_value", 6).alias("click_value"),
    ).orderBy("event_id")


def q52_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    signups = ev.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_id"),
        "user_id",
        F.col("ts").alias("signup_ts"),
    )
    others = ev.select("user_id", "ts", "value")
    joined = range_join(
        signups,
        others,
        keys=["user_id"],
        left_ts="signup_ts",
        right_ts="ts",
        width_seconds=3600,
    )
    return (
        joined.groupBy("signup_id", "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .orderBy("signup_id")
    )


QUERIES = {
    "q51_asof_join": q51_asof_join,
    "q52_range_join": q52_range_join,
}

ORACLES = {
    "q51_asof_join": """
        WITH purchases AS (
            SELECT event_id, user_id, ts, value FROM events
            WHERE event_type = 'purchase'
        ), clicks AS (
            SELECT event_id, user_id, ts, value FROM events
            WHERE event_type = 'click'
        )
        SELECT p.event_id,
               p.user_id,
               ROUND(p.value, 6) AS value,
               c.event_id AS click_event_id,
               ROUND(c.value, 6) AS click_value
        FROM purchases p
        ASOF JOIN clicks c
          ON p.user_id = c.user_id AND p.ts >= c.ts
        ORDER BY p.event_id
    """,
    "q52_range_join": """
        SELECT s.event_id AS signup_id,
               s.user_id,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               ROUND(SUM(e.value), 6) AS sum_value
        FROM events s
        JOIN events e
          ON e.user_id = s.user_id
         AND e.ts >= s.ts
         AND e.ts < s.ts + INTERVAL 1 HOUR
        WHERE s.event_type = 'signup'
        GROUP BY s.event_id, s.user_id
        ORDER BY signup_id
    """,
}
