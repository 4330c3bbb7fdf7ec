"""Iceberg non-parquet DATA files (sources/iceberg.py): ORC commits
scan natively (per-commit file_format, mixed-format snapshots, hive
and literal partition paths), AVRO data files decode executor-side
via avro_io (ingest_avro_files registration, timestamp/date mapping,
synthesized row ordinals giving them FULL positional-delete
semantics), equality deletes apply across all three formats, and ORC
entries gain REAL row ordinals through the pyarrow executor-side
scan whenever positional semantics touch them (r14 — previously a
loud refusal)."""

from __future__ import annotations

import datetime
import os

import pytest
from pyspark.sql import functions as F

from archetype_spark.sources import avro_io
from archetype_spark.sources.iceberg import (
    count_rows_iceberg,
    delete_by_key_iceberg,
    delete_where_iceberg,
    ingest_avro_files,
    read_iceberg,
    read_iceberg_changes,
    write_iceberg,
)


def _mixed_table(spark, tmp_path) -> str:
    t = str(tmp_path / "tbl")
    write_iceberg(
        spark.createDataFrame(
            [(1, "a", 1.5), (2, "b", 2.5)], "id long, s string, v double"
        ),
        t,
    )
    write_iceberg(
        spark.createDataFrame(
            [(3, "c", 3.5), (4, "d", 4.5)], "id long, s string, v double"
        ),
        t,
        file_format="orc",
    )
    ap = str(tmp_path / "in.avro")
    avro_io.write_container(
        ap,
        {
            "type": "record",
            "name": "r",
            "fields": [
                {"name": "id", "type": "long"},
                {"name": "s", "type": ["null", "string"]},
                {"name": "v", "type": "double"},
            ],
        },
        [{"id": 5, "s": "e", "v": 5.5}, {"id": 6, "s": None, "v": 6.5}],
    )
    ingest_avro_files(t, [ap])
    return t


def test_mixed_formats_scan_and_metadata_count(spark, tmp_path):
    t = _mixed_table(spark, tmp_path)
    out = read_iceberg(spark, t).orderBy("id").collect()
    assert [(r.id, r.s, r.v) for r in out] == [
        (1, "a", 1.5), (2, "b", 2.5), (3, "c", 3.5),
        (4, "d", 4.5), (5, "e", 5.5), (6, None, 6.5),
    ]
    # manifests record true record_counts for every format
    assert count_rows_iceberg(t) == 6


def test_equality_delete_applies_across_formats(spark, tmp_path):
    t = _mixed_table(spark, tmp_path)
    delete_by_key_iceberg(
        spark, t, spark.createDataFrame([(3,), (5,)], "id long")
    )
    out = read_iceberg(spark, t).orderBy("id").collect()
    assert [r.id for r in out] == [1, 2, 4, 6]


def test_positional_delete_spans_all_three_formats(spark, tmp_path):
    """delete_where over a parquet+ORC+avro snapshot: the mask
    records real positions for every format (ORC via the pyarrow
    positional scan), no data file is rewritten, and time travel
    before the delete still sees every row."""
    t = _mixed_table(spark, tmp_path)
    before = {
        n
        for n in os.listdir(os.path.join(t, "data"))
        if not n.startswith(".")
    }
    out = delete_where_iceberg(
        spark, t, F.col("id").isin(2, 4, 6)  # parquet, ORC, avro rows
    )
    assert out["rows_deleted"] == 3
    got = read_iceberg(spark, t).orderBy("id").collect()
    assert [r.id for r in got] == [1, 3, 5]
    after = {
        n
        for n in os.listdir(os.path.join(t, "data"))
        if not n.startswith(".")
    }
    assert before <= after  # positional: nothing rewritten
    # time travel to the pre-delete snapshot
    from archetype_spark.sources.iceberg import _load_metadata

    snaps = _load_metadata(t)["snapshots"]
    pre = sorted(s["snapshot-id"] for s in snaps)[-2]
    allrows = read_iceberg(spark, t, snapshot_id=pre).collect()
    assert sorted(r.id for r in allrows) == [1, 2, 3, 4, 5, 6]


def test_positional_update_over_orc_partitioned(spark, tmp_path):
    """update_where over a partitioned pure-ORC table: matched ORC
    rows mask positionally and the updated images land as new files;
    partition pruning still drives off manifests afterwards."""
    from archetype_spark.sources.iceberg import update_where_iceberg

    t = str(tmp_path / "t")
    write_iceberg(
        spark.createDataFrame(
            [(1, "x", 10), (2, "x", 20), (3, "y", 30)],
            "id long, p string, v long",
        ),
        t,
        partition_by=["p"],
        file_format="orc",
    )
    update_where_iceberg(spark, t, F.col("v") >= 20, {"v": "v + 1"})
    got = sorted(
        (r.id, r.p, r.v) for r in read_iceberg(spark, t).collect()
    )
    assert got == [(1, "x", 10), (2, "x", 21), (3, "y", 31)]
    pruned = read_iceberg(spark, t, scan_filter={"p": "y"}).collect()
    assert sorted((r.id, r.v) for r in pruned) == [(3, 31)]


def test_positional_delete_applies_to_avro_entries(spark, tmp_path):
    # parquet + avro table (no ORC): the positional mask face works,
    # including positions INSIDE the avro file via synthesized ordinals
    t = str(tmp_path / "tbl")
    write_iceberg(
        spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string"), t
    )
    ap = str(tmp_path / "in.avro")
    avro_io.write_container(
        ap,
        {
            "type": "record",
            "name": "r",
            "fields": [
                {"name": "id", "type": "long"},
                {"name": "s", "type": "string"},
            ],
        },
        [{"id": 3, "s": "c"}, {"id": 4, "s": "d"}, {"id": 5, "s": "e"}],
    )
    ingest_avro_files(t, [ap])
    delete_where_iceberg(spark, t, F.col("id").isin(2, 4))
    out = read_iceberg(spark, t).orderBy("id").collect()
    assert [r.id for r in out] == [1, 3, 5]
    # the avro file itself was NOT rewritten — the delete is positional
    data_files = [
        n for n in os.listdir(os.path.join(t, "data"))
        if n.startswith("ingest-")
    ]
    assert len(data_files) == 1


def test_avro_timestamp_and_date_mapping(spark, tmp_path):
    t = str(tmp_path / "tbl")
    write_iceberg(
        spark.createDataFrame(
            [(1, datetime.datetime(2024, 3, 1, 12, 30, 0, 250), datetime.date(2024, 3, 1))],
            "id long, ts timestamp, d date",
        ),
        t,
    )
    micros = int(
        datetime.datetime(
            2024, 3, 2, 7, 45, 1, 125, tzinfo=datetime.timezone.utc
        ).timestamp() * 1_000_000
    )
    days = (datetime.date(2024, 3, 2) - datetime.date(1970, 1, 1)).days
    ap = str(tmp_path / "in.avro")
    avro_io.write_container(
        ap,
        {
            "type": "record",
            "name": "r",
            "fields": [
                {"name": "id", "type": "long"},
                {
                    "name": "ts",
                    "type": {"type": "long", "logicalType": "timestamp-micros"},
                },
                {"name": "d", "type": {"type": "int", "logicalType": "date"}},
            ],
        },
        [{"id": 2, "ts": micros, "d": days}],
    )
    ingest_avro_files(t, [ap])
    out = read_iceberg(spark, t).orderBy("id").collect()
    assert out[1].ts == datetime.datetime(2024, 3, 2, 7, 45, 1, 125)
    assert out[1].d == datetime.date(2024, 3, 2)


def test_orc_partitioned_roundtrip(spark, tmp_path):
    t = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(1, "x", 10), (2, "x", 20), (3, "y", 30)], "id long, p string, v long"
    )
    write_iceberg(df, t, partition_by=["p"], file_format="orc")
    out = read_iceberg(spark, t).orderBy("id").collect()
    assert [(r.id, r.p, r.v) for r in out] == [
        (1, "x", 10), (2, "x", 20), (3, "y", 30)
    ]
    # partition pruning still drives off manifests
    out = read_iceberg(spark, t, scan_filter={"p": "y"}).collect()
    assert [(r.id, r.v) for r in [out[0]]] == [(3, 30)] and len(out) == 1


def test_changes_over_mixed_formats(spark, tmp_path):
    t = _mixed_table(spark, tmp_path)
    ch = read_iceberg_changes(spark, t, from_snapshot=1).orderBy("id")
    rows = ch.collect()
    assert [r.id for r in rows] == [1, 2, 3, 4, 5, 6]
    # each row is attributed to the snapshot that added it
    assert len({r._snapshot_id for r in rows}) == 3


def test_ingest_refuses_partitioned_and_unknown_fields(spark, tmp_path):
    # partitioned ingest without row values OR a claim refuses (the
    # r13 partitioned face needs one or the other; full coverage in
    # test_ingest_avro_partitioned_*)
    t = str(tmp_path / "tbl")
    write_iceberg(
        spark.createDataFrame([(1, "x")], "id long, p string"),
        t,
        partition_by=["p"],
    )
    ap = str(tmp_path / "in.avro")
    avro_io.write_container(
        ap,
        {
            "type": "record",
            "name": "r",
            "fields": [{"name": "id", "type": "long"}],
        },
        [{"id": 9}],
    )
    with pytest.raises(ValueError, match="pass partition_values"):
        ingest_avro_files(t, [ap])
    t2 = str(tmp_path / "tbl2")
    write_iceberg(spark.createDataFrame([(1,)], "id long"), t2)
    avro_io.write_container(
        ap,
        {
            "type": "record",
            "name": "r",
            "fields": [
                {"name": "id", "type": "long"},
                {"name": "zz", "type": "long"},
            ],
        },
        [{"id": 9, "zz": 1}],
    )
    with pytest.raises(ValueError, match="zz"):
        ingest_avro_files(t2, [ap])


def test_avro_decimal_refuses(spark):
    # our writer cannot create decimal columns, but a FOREIGN table's
    # schema can carry them — the avro scan must refuse rather than
    # emit unscaled ints as decimals
    from pyspark.sql.types import (
        DecimalType,
        LongType,
        StructField,
        StructType,
    )

    from archetype_spark.sources.iceberg import _scan_avro_files

    schema = StructType(
        [
            StructField("id", LongType()),
            StructField("dec", DecimalType(10, 2)),
        ]
    )
    with pytest.raises(NotImplementedError, match="decimal"):
        _scan_avro_files(spark, schema, [], [("/nope.avro", {})], False)


def test_q132_avro_fixture_collect_is_size_guarded(
    spark, tmp_path, monkeypatch
):
    """The q132 fixture's Avro cohort collects driver-side; the cap
    (_AVRO_FIXTURE_MAX_ROWS, mirrored in the oracle) must bound that
    collect at ANY sf. Build the fixture with the cap forced tiny and
    pin that exactly the cap's worth of avro rows (smallest doc_ids)
    entered the table."""
    import shutil

    from archetype_spark.queries import northstar

    sf_dir = str(tmp_path / "sf")
    os.makedirs(sf_dir)
    shutil.copy(
        "/root/testdata/sf0.001/documents.parquet",
        os.path.join(sf_dir, "documents.parquet"),
    )
    monkeypatch.setenv(
        "SPARK_GRAFT_INDEX_DIR", str(tmp_path / "idx")
    )
    monkeypatch.setattr(northstar, "_AVRO_FIXTURE_MAX_ROWS", 7)
    table = northstar._ensure_iceberg_mixed(spark, sf_dir)
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    avro_ids = sorted(
        r["doc_id"]
        for r in docs.filter(F.col("doc_id") % 3 == 2).collect()
    )[:7]
    expect = sorted(
        r["doc_id"]
        for r in docs.filter(
            ((F.col("doc_id") % 3).isin(0, 1))
            | F.col("doc_id").isin(avro_ids)
        )
        .filter(F.col("doc_id") % 7 != 3)
        .collect()
    )
    got = sorted(
        r["doc_id"] for r in read_iceberg(spark, table).collect()
    )
    assert got == expect
    # and the cohort beyond the cap is really absent
    beyond = [
        i
        for i in (
            r["doc_id"]
            for r in docs.filter(F.col("doc_id") % 3 == 2).collect()
        )
        if i not in avro_ids and i % 7 != 3
    ]
    assert beyond and not set(beyond) & set(got)


def test_ingest_avro_partitioned_identity(spark, tmp_path):
    """Partitioned AVRO ingest (r13 — closes the unpartitioned-only
    asymmetry): per-file partition values are VERIFIED against the
    file's own rows, or supplied explicitly when the rows omit the
    hive-encoded source column; the manifest records a typed
    partition struct under the default spec, so identity
    reconstruction and partition pruning both work on the ingested
    files."""
    t = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, "us", 10), (2, "us", 20), (3, "jp", 30)],
        "id long, country string, v long",
    )
    write_iceberg(df.repartition("country"), t, partition_by=["country"])
    schema = {
        "type": "record",
        "name": "doc",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "country", "type": ["null", "string"]},
            {"name": "v", "type": ["null", "long"]},
        ],
    }
    # file 1: rows CARRY the partition column (verified, not claimed)
    a1 = str(tmp_path / "a1.avro")
    avro_io.write_container(a1, schema, [{"id": 4, "country": "us", "v": 40}])
    # file 2: rows OMIT the column (hive-encoded upstream) -> claimed
    schema2 = {
        "type": "record",
        "name": "doc",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "v", "type": ["null", "long"]},
        ],
    }
    a2 = str(tmp_path / "a2.avro")
    avro_io.write_container(a2, schema2, [{"id": 5, "v": 50}])
    ingest_avro_files(
        t, [a1, a2], partition_values=[{}, {"country": "jp"}]
    )
    got = sorted(
        (r["id"], r["country"], r["v"])
        for r in read_iceberg(spark, t).collect()
    )
    assert got == [
        (1, "us", 10), (2, "us", 20), (3, "jp", 30),
        (4, "us", 40), (5, "jp", 50),
    ]
    assert count_rows_iceberg(t) == 5
    # pruning: a country filter must keep the ingested file in scope
    us = read_iceberg(spark, t).filter(F.col("country") == "us")
    assert sorted(r["id"] for r in us.collect()) == [1, 2, 4]


def test_ingest_avro_partitioned_refusals(spark, tmp_path):
    t = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, "us", 10)], "id long, country string, v long"
    )
    write_iceberg(df, t, partition_by=["country"])
    schema = {
        "type": "record",
        "name": "doc",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "country", "type": ["null", "string"]},
            {"name": "v", "type": ["null", "long"]},
        ],
    }
    # a file spanning two partitions refuses
    span = str(tmp_path / "span.avro")
    avro_io.write_container(
        span,
        schema,
        [
            {"id": 2, "country": "us", "v": 1},
            {"id": 3, "country": "jp", "v": 2},
        ],
    )
    with pytest.raises(ValueError, match="one file = one partition"):
        ingest_avro_files(t, [span])
    # a claimed value disagreeing with the rows refuses
    one = str(tmp_path / "one.avro")
    avro_io.write_container(
        one, schema, [{"id": 2, "country": "us", "v": 1}]
    )
    with pytest.raises(ValueError, match="disagrees with the rows"):
        ingest_avro_files(t, [one], partition_values=[{"country": "jp"}])
    # rows omitting the column with no claim refuse
    bare_schema = {
        "type": "record",
        "name": "doc",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "v", "type": ["null", "long"]},
        ],
    }
    bare = str(tmp_path / "bare.avro")
    avro_io.write_container(bare, bare_schema, [{"id": 2, "v": 1}])
    with pytest.raises(ValueError, match="pass partition_values"):
        ingest_avro_files(t, [bare])
    # transform-derived specs refuse by name
    t2 = str(tmp_path / "t2")
    write_iceberg(
        spark.createDataFrame([(1, 10)], "id long, v long"),
        t2,
        partition_by=["id"],
        partition_transforms={"id": "bucket[4]"},
    )
    with pytest.raises(NotImplementedError, match="transform-derived"):
        ingest_avro_files(t2, [one])
