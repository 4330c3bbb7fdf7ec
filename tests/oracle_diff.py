"""Differential oracle runner: execute a Spark query and its DuckDB
oracle on the same parquet dir, canonicalize, and compare.

Mirrors the driver's protocol (FIXTURES.md §C): sort columns by name,
order-insensitive row compare, NULL-safe, timestamps to ISO, floats
kept as-is (queries round internally where accumulation order could
differ).
"""

from __future__ import annotations

import datetime as _dt
import math

import duckdb

from archetype_spark.tables import TABLES


def run_oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    return cols, cur.fetchall()


def _canon_val(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # 12 significant digits absorbs float32->double display noise
        return f"{v:.12g}"
    if isinstance(v, _dt.datetime):
        return v.isoformat()
    return str(v)


def canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_canon_val(r[i]) for i in order) for r in rows)


def compare(spark_df, oracle_sql: str, sf_dir: str):
    """Returns (ok, detail). Compares sorted column names and
    order-insensitive canonical rows."""
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    o_cols, o_rows = run_oracle(oracle_sql, sf_dir)
    if sorted(s_cols) != sorted(o_cols):
        return False, f"columns differ: spark={sorted(s_cols)} oracle={sorted(o_cols)}"
    if len(s_rows) != len(o_rows):
        return False, f"row count differs: spark={len(s_rows)} oracle={len(o_rows)}"
    sc = canon_rows(s_cols, s_rows)
    oc = canon_rows(o_cols, o_rows)
    if sc != oc:
        diffs = [(a, b) for a, b in zip(sc, oc) if a != b][:5]
        return False, f"values differ; first diffs: {diffs}"
    return True, f"ok ({len(s_rows)} rows)"
