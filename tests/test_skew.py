"""Skew-mitigation operators: salted two-phase aggregation and salted
join must be ROW-IDENTICAL to their unsalted plans while spreading
each hot key over n_salt reducers."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from archetype_spark.operators import skew


@pytest.fixture(scope="module")
def hot(spark):
    # one pathologically hot key (90%) + a long tail
    return spark.range(20_000).select(
        F.when(F.col("id") % 10 != 0, F.lit("HOT"))
        .otherwise(F.concat(F.lit("k"), (F.col("id") % 97).cast("string")))
        .alias("k"),
        (F.col("id") % 1000).cast("double").alias("v"),
        F.col("id").alias("rid"),
    )


def test_salted_agg_matches_plain(spark, hot):
    plain = hot.groupBy("k").agg(
        F.sum("v").alias("sum_v"),
        F.count("rid").alias("count_rid"),
        F.max("v").alias("max_v"),
    )
    salted = skew.salted_agg(hot, ["k"], {"v": "sum", "rid": "count"}, n_salt=16)
    salted_mm = skew.salted_agg(hot, ["k"], {"v": "max"}, n_salt=16)
    a = {(r["k"], r["sum_v"], r["count_rid"]) for r in plain.collect()}
    b = {(r["k"], r["sum_v"], r["count_rid"]) for r in salted.collect()}
    assert a == b
    mm = {(r["k"], r["max_v"]) for r in salted_mm.collect()}
    assert mm == {(r["k"], r["max_v"]) for r in plain.collect()}
    with pytest.raises(ValueError, match="non-decomposable"):
        skew.salted_agg(hot, ["k"], {"v": "avg"})


def test_salted_join_matches_plain(spark, hot):
    dim = spark.createDataFrame(
        [("HOT", 1), ("k3", 3), ("k42", 42)], "k string, tag int"
    )
    plain = hot.join(dim, "k")
    salted = skew.salted_join(hot, dim, ["k"], n_salt=8)
    a = sorted((r["rid"], r["tag"]) for r in plain.collect())
    b = sorted((r["rid"], r["tag"]) for r in salted.collect())
    assert a == b and len(a) > 18_000

    plain_l = hot.join(dim, "k", "left")
    salted_l = skew.salted_join(hot, dim, ["k"], n_salt=8, how="left")
    assert salted_l.count() == plain_l.count() == hot.count()
    with pytest.raises(ValueError, match="inner/left"):
        skew.salted_join(hot, dim, ["k"], how="full")
