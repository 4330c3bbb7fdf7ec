"""Iceberg partition transforms (sources/ice_transforms.py +
sources/iceberg.py): spec-exact transform math (murmur3 bucket vectors
from the Iceberg spec's Appendix B; Spark-Column vs Python lockstep),
transformed-spec write/read round-trips, manifest-level partition
pruning through read_iceberg(scan_filter=...) — files skipped at the
manifest walk, answers unchanged — and row-level deletes over
transformed tables. Capability the reference reads through its
Iceberg dependency (reference pyproject.toml:7-10); semantics from
the PUBLIC Iceberg table spec ("Partition Transforms")."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from archetype_spark.sources import read_iceberg, write_iceberg
from archetype_spark.sources.ice_transforms import (
    murmur3_32_long_py,
    parse_transform,
    transform_value,
    with_transform_column,
)


# --------------------------------------------------------------- pure math


def test_murmur3_iceberg_spec_vectors():
    """The spec's Appendix B bucket-hash examples, verbatim."""
    assert murmur3_32_long_py(34) == 2017239379  # int/long 34
    days = (datetime.date(2017, 11, 16) - datetime.date(1970, 1, 1)).days
    assert murmur3_32_long_py(days) == -653330422  # date 2017-11-16
    micros = int(
        (
            datetime.datetime(2017, 11, 16, 22, 31, 8)
            - datetime.datetime(1970, 1, 1)
        ).total_seconds()
        * 1_000_000
    )
    assert murmur3_32_long_py(micros) == -2047944441  # timestamptz


def test_transform_value_twins():
    ts = datetime.datetime(2017, 11, 16, 22, 31, 8)
    assert transform_value(ts, "day", "timestamp") == 17486
    assert transform_value(ts, "hour", "timestamp") == 17486 * 24 + 22
    assert transform_value(ts, "month", "timestamp") == (2017 - 1970) * 12 + 10
    assert transform_value(ts, "year", "timestamp") == 47
    pre = datetime.date(1969, 12, 15)
    assert transform_value(pre, "month", "date") == -1
    assert transform_value(pre, "year", "date") == -1
    assert transform_value(-7, "truncate[100]", "long") == -100
    assert transform_value("iceberg", "truncate[3]", "string") == "ice"
    assert transform_value(34, "bucket[16]", "long") == (
        2017239379 & 0x7FFFFFFF
    ) % 16


def test_parse_transform_refuses_unknown():
    with pytest.raises(NotImplementedError, match="void"):
        parse_transform("void")
    with pytest.raises(NotImplementedError):
        parse_transform("zorder")


def test_column_python_lockstep(spark):
    """The Spark Column builders and the Python twins agree on every
    transform over a value sweep (incl. negatives and the epoch)."""
    import random

    random.seed(11)
    vals = [0, 1, -1, 34, -34, 2**62, -(2**62)] + [
        random.randint(-(2**62), 2**62) for _ in range(100)
    ]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    df = with_transform_column(df, "b", "v", "bucket[32]", "long")
    df = with_transform_column(df, "t", "v", "truncate[1000]", "long")
    for r in df.collect():
        assert r["b"] == transform_value(r["v"], "bucket[32]", "long")
        assert r["t"] == transform_value(r["v"], "truncate[1000]", "long")
    dts = [
        datetime.datetime(2017, 11, 16, 22, 31, 8),
        datetime.datetime(1969, 12, 31, 23, 0, 0),
        datetime.datetime(1970, 1, 1, 0, 0, 0),
        datetime.datetime(2024, 2, 29, 12, 1, 2),
    ]
    d2 = spark.createDataFrame([(t,) for t in dts], "ts timestamp_ntz")
    for k in ("day", "hour", "month", "year"):
        d2 = with_transform_column(d2, k, "ts", k, "timestamp")
    for r in d2.collect():
        for k in ("day", "hour", "month", "year"):
            assert r[k] == transform_value(r["ts"], k, "timestamp"), k


# ------------------------------------------------------------ table fixtures


def _day_df(spark, n_days=6, per_day=8):
    rows = []
    for d in range(n_days):
        for i in range(per_day):
            rows.append(
                (
                    d * per_day + i,
                    datetime.datetime(2024, 3, 1 + d, 6 + i, 30, 0),
                    float(d * 100 + i),
                )
            )
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, value double"
    )


def test_day_partition_roundtrip_and_pruning(spark, tmp_path):
    t = str(tmp_path / "t")
    df = _day_df(spark).repartition("ts")  # co-locate days
    write_iceberg(
        df, t, partition_by=["ts"], partition_transforms={"ts": "day"}
    )
    # full read: every column (incl. the transform SOURCE) survives
    got = read_iceberg(spark, t)
    assert sorted(r["event_id"] for r in got.collect()) == list(range(48))
    assert got.schema["ts"].dataType.typeName() == "timestamp_ntz"
    # range scan: 2 of 6 days
    lo = datetime.datetime(2024, 3, 2)
    hi = datetime.datetime(2024, 3, 4)
    pruned = read_iceberg(spark, t, scan_filter={"ts": (lo, hi)})
    expect = {r["event_id"] for r in df.filter((F.col("ts") >= lo) & (F.col("ts") < hi)).collect()}
    assert {r["event_id"] for r in pruned.collect()} == expect
    # pruning happened at the MANIFEST walk: strictly fewer files
    all_files = set(read_iceberg(spark, t).inputFiles())
    kept = set(pruned.inputFiles())
    assert kept < all_files
    assert len(kept) <= len(all_files) * 2 // 6 + 1


def test_bucket_partition_prunes_key_probe(spark, tmp_path):
    t = str(tmp_path / "t")
    df = spark.range(0, 400).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v")
    )
    write_iceberg(
        df.repartition(4),
        t,
        partition_by=["k"],
        partition_transforms={"k": "bucket[8]"},
    )
    probe = read_iceberg(spark, t, scan_filter={"k": 123})
    rows = probe.collect()
    assert len(rows) == 1 and rows[0]["v"] == 369
    # the probe opened only the one bucket's files
    all_files = set(read_iceberg(spark, t).inputFiles())
    assert len(set(probe.inputFiles())) <= len(all_files) // 8 + 1
    # a RANGE over a bucket column cannot prune but stays correct
    rng = read_iceberg(spark, t, scan_filter={"k": (10, 20)})
    assert sorted(r["k"] for r in rng.collect()) == list(range(10, 20))


def test_truncate_partition_long_and_string(spark, tmp_path):
    t = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, f"cat{i % 3}xyz"[: 4 + i % 3]) for i in range(-50, 50)],
        "k long, s string",
    )
    write_iceberg(
        df.repartition(2),
        t,
        partition_by=["k"],
        partition_transforms={"k": "truncate[20]"},
    )
    got = read_iceberg(spark, t, scan_filter={"k": (-10, 10)})
    assert sorted(r["k"] for r in got.collect()) == list(range(-10, 10))
    assert set(got.inputFiles()) < set(read_iceberg(spark, t).inputFiles())


def test_append_validates_spec_and_scan_filter_validates(spark, tmp_path):
    t = str(tmp_path / "t")
    df = _day_df(spark)
    write_iceberg(
        df, t, partition_by=["ts"], partition_transforms={"ts": "day"}
    )
    # silent append inherits the spec
    write_iceberg(df.withColumn("event_id", F.col("event_id") + 100), t)
    assert read_iceberg(spark, t).count() == 96
    # conflicting spec refuses
    with pytest.raises(ValueError, match="partition spec"):
        write_iceberg(df, t, mode="append", partition_by=["ts"])
    with pytest.raises(ValueError, match="scan_filter"):
        read_iceberg(spark, t, scan_filter={"nope": 1})
    with pytest.raises(ValueError, match="absent from partition_by"):
        write_iceberg(
            df,
            str(tmp_path / "t2"),
            partition_by=["ts"],
            partition_transforms={"value": "day"},
        )
    with pytest.raises(NotImplementedError, match="transform"):
        write_iceberg(
            df,
            str(tmp_path / "t3"),
            partition_by=["value"],
            partition_transforms={"value": "day"},
        )


def test_row_level_deletes_on_transformed_table(spark, tmp_path):
    """Position deletes, equality deletes, and the CDC upsert all
    compose with a day-transformed spec."""
    from archetype_spark.sources.iceberg import (
        delete_by_key_iceberg,
        delete_where_iceberg,
        upsert_by_key_iceberg,
    )

    t = str(tmp_path / "t")
    df = _day_df(spark).coalesce(1)
    write_iceberg(
        df, t, partition_by=["ts"], partition_transforms={"ts": "day"}
    )
    out = delete_where_iceberg(spark, t, "event_id % 8 = 0")
    assert out["rows_deleted"] == 6
    delete_by_key_iceberg(
        spark, t, spark.createDataFrame([(1,), (2,)], "event_id long")
    )
    ups = df.filter(F.col("event_id") == 3).withColumn(
        "value", F.lit(999.0)
    )
    upsert_by_key_iceberg(spark, t, ups, ["event_id"])
    got = {r["event_id"]: r["value"] for r in read_iceberg(spark, t).collect()}
    assert len(got) == 48 - 6 - 2
    assert got[3] == 999.0
    # pruned scans apply the deletes too
    lo = datetime.datetime(2024, 3, 1)
    hi = datetime.datetime(2024, 3, 2)
    day1 = read_iceberg(spark, t, scan_filter={"ts": (lo, hi)})
    ids = sorted(r["event_id"] for r in day1.collect())
    assert ids == [3, 4, 5, 6, 7]  # 0 (pos-deleted), 1,2 (eq) gone


def test_foreign_void_transform_refuses(spark, tmp_path):
    import json
    import os

    t = str(tmp_path / "t")
    write_iceberg(_day_df(spark), t, partition_by=["event_id"])
    mfile = os.path.join(t, "metadata", "v1.metadata.json")
    with open(mfile) as fh:
        meta = json.load(fh)
    for spec in meta["partition-specs"]:
        for f in spec["fields"]:
            f["transform"] = "void"
    with open(mfile, "w") as fh:
        json.dump(meta, fh)
    with pytest.raises(NotImplementedError, match="void"):
        read_iceberg(spark, t).count()
