"""Declared query corpus (SURVEY.md §2.4) + north-star operators.

Each query is a `(spark, sf_dir) -> DataFrame` callable; each has a
matching ANSI-SQL oracle string runnable by DuckDB over the same
parquet tables. Column names/types are aligned between both sides —
the driver sorts columns by name and hashes values, so every computed
column is aliased identically in the DataFrame code and the SQL.
"""

from archetype_spark.queries import ecs_q, northstar, relational, windows_q


def all_queries():
    q = dict(relational.QUERIES)
    q.update(northstar.QUERIES)
    q.update(windows_q.QUERIES)
    q.update(ecs_q.QUERIES)
    return q


def all_oracles():
    o = dict(relational.ORACLES)
    o.update(northstar.ORACLES)
    o.update(windows_q.ORACLES)
    o.update(ecs_q.ORACLES)
    return o
