"""Declared query corpus (SURVEY.md §2.4) + north-star operators.

Each query is a `(spark, sf_dir) -> DataFrame` callable; each has a
matching ANSI-SQL oracle string runnable by DuckDB over the same
parquet tables. Column names/types are aligned between both sides —
the driver sorts columns by name and hashes values, so every computed
column is aliased identically in the DataFrame code and the SQL.
"""

from archetype_spark.queries import (
    ecs_q,
    extras_q,
    northstar,
    relational,
    temporal_q,
    windows_q,
)

_MODULES = (relational, northstar, windows_q, ecs_q, temporal_q, extras_q)


def all_queries():
    q = {}
    for m in _MODULES:
        q.update(m.QUERIES)
    return q


def all_oracles():
    o = {}
    for m in _MODULES:
        o.update(m.ORACLES)
    return o
