"""Event-time window queries (q45-q47) — the batch-mode faces of the
streaming builders in archetype_spark/streaming/windows.py, oracle-
gated against DuckDB.

The reference has no event-time windows at all (SURVEY §2.2
"Streaming-only: None"); these pin the semantics the streaming lift
relies on:
- q45: tumbling window == DuckDB time_bucket.
- q46: sliding window == DuckDB cross of bucket offsets (each event
  lands in duration/slide windows).
- q47: session_window == gaps-and-islands SQL (a new session starts
  when the gap from the previous event exceeds the threshold).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from archetype_spark.streaming.windows import session_agg, sliding_agg, tumbling_agg
from archetype_spark.tables import load


def q45_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return tumbling_agg(ev, duration="1 hour").orderBy("user_id", "win_start")


def q46_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return sliding_agg(ev, duration="1 hour", slide="30 minutes").orderBy(
        "user_id", "win_start"
    )


def q47_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return session_agg(ev, gap="30 minutes").orderBy("user_id", "sess_start")


QUERIES = {
    "q45_tumbling_window": q45_tumbling_window,
    "q46_sliding_window": q46_sliding_window,
    "q47_session_window": q47_session_window,
}

ORACLES = {
    # time_bucket floors ts into the hour — identical to window().start
    "q45_tumbling_window": """
        SELECT user_id,
               time_bucket(INTERVAL '1 hour', ts) AS win_start,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               ROUND(SUM(value), 6) AS sum_value
        FROM events
        GROUP BY user_id, win_start
        ORDER BY user_id, win_start
    """,
    # each event belongs to the windows starting at bucket(ts,30m) and
    # bucket(ts,30m)-30m (duration 1h, slide 30m => 2 windows/event)
    "q46_sliding_window": """
        WITH offsets AS (SELECT * FROM (VALUES (0), (1)) t(k)),
        placed AS (
            SELECT e.user_id,
                   time_bucket(INTERVAL '30 minutes', e.ts)
                     - k * INTERVAL '30 minutes' AS win_start
            FROM events e CROSS JOIN offsets
        )
        SELECT user_id, win_start,
               win_start + INTERVAL '1 hour' AS win_end,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM placed
        GROUP BY user_id, win_start
        ORDER BY user_id, win_start
    """,
    # gaps-and-islands: session boundary when gap > 30 minutes
    "q47_session_window": """
        WITH flagged AS (
            SELECT user_id, ts, value,
                   CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                             >= INTERVAL '30 minutes'
                        OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                        THEN 1 ELSE 0 END AS new_sess
            FROM events
        ),
        numbered AS (
            SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                       ROWS UNBOUNDED PRECEDING) AS sess_id
            FROM flagged
        )
        SELECT user_id,
               MIN(ts) AS sess_start,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               ROUND(SUM(value), 6) AS sum_value
        FROM numbered
        GROUP BY user_id, sess_id
        ORDER BY user_id, sess_start
    """,
}
