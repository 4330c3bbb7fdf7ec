"""Round-trip tests for the source/sink surface."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from archetype_spark.sources import read_table, write_table
from archetype_spark.tables import load

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def nation(spark):
    return load(spark, SF, "nation")


@pytest.mark.parametrize("fmt", ["parquet", "csv", "json", "orc"])
def test_roundtrip(spark, tmp_path, nation, fmt):
    path = str(tmp_path / f"t_{fmt}")
    write_table(nation, path, fmt=fmt)
    back = read_table(spark, path, fmt=fmt, schema=nation.schema)
    assert back.count() == nation.count()
    a = {tuple(r) for r in nation.collect()}
    b = {tuple(r) for r in back.collect()}
    assert a == b


def test_partitioned_sorted_write(spark, tmp_path):
    li = load(spark, SF, "lineitem").limit(1000)
    path = str(tmp_path / "li")
    write_table(
        li.withColumn("flag", F.col("l_returnflag")),
        path,
        partition_by=["flag"],
        sort_by=["l_orderkey"],
    )
    back = read_table(spark, path)
    assert back.count() == 1000
    # hive partition pruning works on the partition column
    one = back.filter(F.col("flag") == "A")
    from archetype_spark.plans import formatted_plan

    assert "PartitionFilters" in formatted_plan(one)


def test_unknown_format_rejected(spark, nation, tmp_path):
    with pytest.raises(ValueError, match="unknown format"):
        read_table(spark, "/nope", fmt="xml")
    with pytest.raises(ValueError, match="unknown format"):
        write_table(nation, str(tmp_path / "x"), fmt="xml")
