"""Event-time window aggregations — batch/stream dual-mode.

Each builder takes any DataFrame with an event-time column and returns
a windowed aggregation. On a streaming DataFrame, pass
`watermark="10 minutes"` so state for closed windows is dropped
(late rows beyond the watermark are discarded — the late-data policy
the reference lacks entirely). On a batch DataFrame the same plan runs
as a regular aggregation, which is how the oracle tests pin the
window semantics against DuckDB.

Scale: window aggs shuffle once on (key, window). Spark expands
sliding windows into one row per covered window BEFORE the shuffle
(slide ratio multiplies shuffle volume — keep slide >= 1/4 duration
at 100 TB). Session windows use Spark's native session_window, which
merges adjacent sessions in the state store.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_watermark(df: DataFrame, ts_col: str, delay: str | None) -> DataFrame:
    """Apply a watermark iff the frame is streaming; no-op on batch so
    the same builder is oracle-testable.

    TIMESTAMP_NTZ event times are cast to TIMESTAMP first: Spark
    refuses watermarks on NTZ (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE),
    and parquet timestamps without isAdjustedToUTC — the corpus
    events table since the driver moved it to plain timestamp[us] —
    read as NTZ. The engine pins the session timezone to UTC
    (session.py / tables.load), so the cast reinterprets the same
    wall-clock instant losslessly and window bounds are unchanged."""
    if delay and df.isStreaming:
        if dict(df.dtypes).get(ts_col) == "timestamp_ntz":
            df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        return df.withWatermark(ts_col, delay)
    return df


def tumbling_agg(
    events: DataFrame,
    duration: str = "1 hour",
    ts_col: str = "ts",
    key_col: str = "user_id",
    watermark: str | None = None,
) -> DataFrame:
    """Non-overlapping event-time buckets: per (key, window) count and
    value sum. Equivalent batch semantics to Q28's epoch bucketing but
    via the native window() expression (struct of start/end)."""
    df = with_watermark(events, ts_col, watermark)
    return (
        df.groupBy(F.col(key_col), F.window(ts_col, duration).alias("win"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            key_col,
            F.col("win.start").alias("win_start"),
            "n_events",
            "sum_value",
        )
    )


def sliding_agg(
    events: DataFrame,
    duration: str = "1 hour",
    slide: str = "30 minutes",
    ts_col: str = "ts",
    key_col: str = "user_id",
    watermark: str | None = None,
) -> DataFrame:
    """Overlapping windows: each event lands in duration/slide windows
    (that ratio multiplies pre-shuffle rows — see module docstring)."""
    df = with_watermark(events, ts_col, watermark)
    return (
        df.groupBy(F.col(key_col), F.window(ts_col, duration, slide).alias("win"))
        .agg(F.count("*").alias("n_events"))
        .select(
            key_col,
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "n_events",
        )
    )


def session_agg(
    events: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    key_col: str = "user_id",
    watermark: str | None = None,
) -> DataFrame:
    """Activity sessions: rows within `gap` of each other merge into
    one session per key (native session_window; the state store merges
    adjacent sessions on the fly in streaming mode)."""
    df = with_watermark(events, ts_col, watermark)
    return (
        df.groupBy(F.col(key_col), F.session_window(ts_col, gap).alias("sess"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            key_col,
            F.col("sess.start").alias("sess_start"),
            "n_events",
            "sum_value",
        )
    )


def dedup_within_watermark(
    events: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming exact dedup with bounded state: duplicates arriving
    within the watermark horizon are dropped; state for older keys is
    reclaimed. Batch mode falls back to dropDuplicates (unbounded but
    finite input)."""
    if events.isStreaming:
        if dict(events.dtypes).get(ts_col) == "timestamp_ntz":
            # same NTZ->LTZ reinterpretation as with_watermark (UTC
            # session): watermarks reject NTZ event times
            events = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            keys
        )
    return events.dropDuplicates(keys)
