"""Differential correctness: every oracle-gated query must match
DuckDB on the same parquet (sf0.001 locally for speed; the driver
re-runs the same protocol at sf0.01)."""

from __future__ import annotations

import pytest

from archetype_spark.queries import all_oracles, all_queries
from tests.conftest import SF_SMOKE
from tests.oracle_diff import compare

# require_live_index=False: q61's index-reading oracle is always
# included — the Spark side (ensure_ivf) builds the index eagerly at
# DataFrame-construction time, before compare() runs DuckDB.
ORACLES = all_oracles(SF_SMOKE, require_live_index=False)
QUERIES = all_queries()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_match(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    ok, detail = compare(df, ORACLES[name], sf_dir)
    assert ok, f"{name}: {detail}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    n = df.count()
    assert n >= 0
    assert df.columns
