"""Physical-plan audit helpers.

The scale contract for every operator (SURVEY §4) is checkable from
`explain("formatted")`: filters reach the scan (PushedFilters),
projections prune the read (ReadSchema), small dimensions broadcast,
and shuffle count matches the algorithm's minimum. These helpers
parse that output so tests can pin the plan shape — a plan regression
(lost pushdown, join strategy flip, surprise shuffle) fails CI even
while results stay correct.

Parsing the formatted explain keeps us off private JVM APIs; the
format is a stable public surface.
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> list[str]:
    """One entry per parquet scan: its PushedFilters list, as text."""
    return re.findall(r"PushedFilters: \[(.*?)\]", formatted_plan(df))


def read_schemas(df: DataFrame) -> list[list[str]]:
    """One entry per parquet scan: the column names actually read."""
    out = []
    for m in re.findall(r"ReadSchema: struct<(.*?)>", formatted_plan(df)):
        cols = [c.split(":")[0].strip() for c in m.split(",") if c.strip()]
        out.append(cols)
    return out


def n_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges in the plan (BroadcastExchange not
    counted — broadcasts are the cheap alternative being asserted).
    Each physical node appears exactly once as `(N) Exchange` in the
    details section of the formatted explain."""
    return len(re.findall(r"\(\d+\) Exchange\b", formatted_plan(df)))


def join_impls(df: DataFrame) -> list[str]:
    """Join operator names in plan order (BroadcastHashJoin,
    SortMergeJoin, BroadcastNestedLoopJoin, ...)."""
    return re.findall(
        r"\(\d+\) (BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
        r"BroadcastNestedLoopJoin|CartesianProduct)",
        formatted_plan(df),
    )
