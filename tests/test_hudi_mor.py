"""Hudi MERGE_ON_READ (sources/hudi.py + sources/hudi_log.py): the
log-block codec framing, snapshot merge (avro-data upserts + delete
tombstones onto base files, newest record version wins), time travel
across the log chain, compaction (logs fold into a new base file
under a commit instant), clustering (replacecommit exclusion +
pre-replace time travel), the incremental face read_hudi_changes,
metadata-only counts, and the loud refusals (HFile/parquet/command
blocks, clustering over pending logs)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from archetype_spark.sources import hudi_log
from archetype_spark.sources.hudi import (
    cluster_hudi,
    compact_hudi,
    count_rows_hudi,
    delete_by_key_hudi,
    hudi_timeline,
    read_hudi,
    read_hudi_changes,
    upsert_hudi,
    write_hudi,
)


@pytest.fixture()
def people(spark):
    return spark.createDataFrame(
        [(1, "ann", "a", 10), (2, "bob", "b", 20), (3, "cho", "a", 30),
         (4, "dee", "b", 40)],
        "id long, name string, grp string, v long",
    )


def _rows(spark, path, **kw):
    return sorted(
        tuple(r)
        for r in read_hudi(spark, path, **kw)
        .select("id", "name", "grp", "v")
        .collect()
    )


def _mor(spark, tmp_path, people) -> str:
    t = str(tmp_path / "mor")
    write_hudi(
        people, t, record_key="id", partition_by="grp",
        table_type="MERGE_ON_READ",
    )
    return t


# ------------------------------------------------------------------ log codec


def test_log_block_roundtrip():
    schema = {
        "type": "record",
        "name": "R",
        "fields": [
            {"name": "k", "type": ["null", "string"]},
            {"name": "v", "type": ["null", "long"]},
        ],
    }
    recs = [{"k": "a", "v": 1}, {"k": "b", "v": None}]
    data = hudi_log.avro_data_block(recs, schema, "001")
    data += hudi_log.delete_block([("a", "grp=a", 0)], "002")
    entries = hudi_log.parse_log_entries(data)
    assert entries[0] == ("001", "upsert", {"k": "a", "v": 1})
    assert entries[1] == ("001", "upsert", {"k": "b", "v": None})
    assert entries[2][0:2] == ("002", "delete")
    assert entries[2][2]["recordKey"] == "a"
    # framing is strict: a flipped magic byte raises, never resyncs
    with pytest.raises(ValueError, match="magic"):
        hudi_log.parse_log_entries(b"#HUDX#" + data[6:])


def test_log_block_refusals_are_loud():
    blk = hudi_log.write_block(
        hudi_log.HFILE_DATA_BLOCK, {hudi_log.INSTANT_TIME: "001"}, b"x"
    )
    with pytest.raises(NotImplementedError, match="HFile"):
        hudi_log.parse_log_entries(blk)
    # a command block that is NOT a rollback refuses by name
    blk = hudi_log.write_block(
        hudi_log.COMMAND_BLOCK,
        {hudi_log.INSTANT_TIME: "001", hudi_log.COMMAND_BLOCK_TYPE: "7"},
        b"",
    )
    with pytest.raises(NotImplementedError, match="command block type"):
        hudi_log.parse_log_entries(blk)
    # a rollback block without a target raises (never guess the mask)
    blk = hudi_log.write_block(
        hudi_log.COMMAND_BLOCK,
        {
            hudi_log.INSTANT_TIME: "001",
            hudi_log.COMMAND_BLOCK_TYPE: str(
                hudi_log.ROLLBACK_PREVIOUS_BLOCK
            ),
        },
        b"",
    )
    with pytest.raises(ValueError, match="TARGET_INSTANT_TIME"):
        hudi_log.parse_log_entries(blk)
    blk = hudi_log.write_block(
        hudi_log.PARQUET_DATA_BLOCK, {hudi_log.INSTANT_TIME: "001"}, b"x"
    )
    with pytest.raises(NotImplementedError, match="parquet"):
        hudi_log.parse_log_entries(blk)


# --------------------------------------------------------------- MOR snapshot


def test_mor_upsert_appends_log_not_base(spark, tmp_path, people):
    t = _mor(spark, tmp_path, people)
    base_files_before = [
        n for n in os.listdir(os.path.join(t, "grp=b"))
        if n.endswith(".parquet")
    ]
    upsert_hudi(
        spark, t,
        spark.createDataFrame(
            [(2, "bob2", "b", 21)], "id long, name string, grp string, v long"
        ),
    )
    # no base rewrite: same parquet set, one new dot-prefixed log file
    base_files_after = [
        n for n in os.listdir(os.path.join(t, "grp=b"))
        if n.endswith(".parquet")
    ]
    assert base_files_before == base_files_after
    logs = [
        n for n in os.listdir(os.path.join(t, "grp=b")) if ".log." in n
    ]
    assert len(logs) == 1 and logs[0].startswith(".")
    assert _rows(spark, t) == [
        (1, "ann", "a", 10), (2, "bob2", "b", 21),
        (3, "cho", "a", 30), (4, "dee", "b", 40),
    ]
    # the deltacommit action (not a commit) carries the instant
    hd = os.path.join(t, ".hoodie")
    assert any(n.endswith(".deltacommit") for n in os.listdir(hd))


def test_mor_delete_block_and_last_wins(spark, tmp_path, people):
    t = _mor(spark, tmp_path, people)
    delete_by_key_hudi(
        spark, t, spark.createDataFrame([(3,)], "id long")
    )
    assert _rows(spark, t) == [
        (1, "ann", "a", 10), (2, "bob", "b", 20), (4, "dee", "b", 40),
    ]
    assert count_rows_hudi(t) == 3
    # delete then re-upsert the SAME key: the newer block wins
    upsert_hudi(
        spark, t,
        spark.createDataFrame(
            [(3, "cho2", "a", 31)], "id long, name string, grp string, v long"
        ),
    )
    assert (3, "cho2", "a", 31) in _rows(spark, t)


def test_mor_multiple_updates_same_key_across_instants(spark, tmp_path, people):
    t = _mor(spark, tmp_path, people)
    for i, name in enumerate(["bob2", "bob3", "bob4"]):
        upsert_hudi(
            spark, t,
            spark.createDataFrame(
                [(2, name, "b", 20 + i)],
                "id long, name string, grp string, v long",
            ),
        )
    assert (2, "bob4", "b", 22) in _rows(spark, t)
    # three log files rolled on the same slice, versions 1..3
    logs = sorted(
        n for n in os.listdir(os.path.join(t, "grp=b")) if ".log." in n
    )
    assert [n.split(".log.")[1].split("_")[0] for n in logs] == ["1", "2", "3"]


def test_mor_fresh_keys_become_base_files(spark, tmp_path, people):
    t = _mor(spark, tmp_path, people)
    upsert_hudi(
        spark, t,
        spark.createDataFrame(
            [(9, "zed", "c", 90), (2, "bob2", "b", 21)],
            "id long, name string, grp string, v long",
        ),
    )
    assert os.path.isdir(os.path.join(t, "grp=c"))
    assert (9, "zed", "c", 90) in _rows(spark, t)
    assert count_rows_hudi(t) == 5


def test_mor_time_travel_truncates_log_chain(spark, tmp_path, people):
    t = _mor(spark, tmp_path, people)
    upsert_hudi(
        spark, t,
        spark.createDataFrame(
            [(2, "bob2", "b", 21)], "id long, name string, grp string, v long"
        ),
    )
    delete_by_key_hudi(spark, t, spark.createDataFrame([(1,)], "id long"))
    t0, t1, t2 = hudi_timeline(t)
    assert _rows(spark, t, as_of=t0) == [
        (1, "ann", "a", 10), (2, "bob", "b", 20),
        (3, "cho", "a", 30), (4, "dee", "b", 40),
    ]
    assert (2, "bob2", "b", 21) in _rows(spark, t, as_of=t1)
    assert (1, "ann", "a", 10) in _rows(spark, t, as_of=t1)
    assert (1, "ann", "a", 10) not in _rows(spark, t, as_of=t2)
    assert count_rows_hudi(t, as_of=t1) == 4
    assert count_rows_hudi(t, as_of=t2) == 3


def test_mor_compaction_folds_logs(spark, tmp_path, people):
    t = _mor(spark, tmp_path, people)
    upsert_hudi(
        spark, t,
        spark.createDataFrame(
            [(2, "bob2", "b", 21)], "id long, name string, grp string, v long"
        ),
    )
    delete_by_key_hudi(spark, t, spark.createDataFrame([(4,)], "id long"))
    pre = _rows(spark, t)
    out = compact_hudi(spark, t)
    assert out["instant"] is not None
    # compaction publishes a COMMIT instant (the real convention)
    hd = os.path.join(t, ".hoodie")
    assert os.path.isfile(os.path.join(hd, f"{out['instant']}.commit"))
    assert _rows(spark, t) == pre
    assert count_rows_hudi(t) == len(pre)
    # time travel to a pre-compaction instant still replays the logs
    t1 = hudi_timeline(t)[1]
    assert (2, "bob2", "b", 21) in _rows(spark, t, as_of=t1)
    # idempotent: nothing left to compact
    assert compact_hudi(spark, t)["instant"] is None
    # unchanged records kept their original commit stamps
    m = read_hudi(spark, t, with_meta=True)
    t0 = hudi_timeline(t)[0]
    r = m.filter(F.col("id") == 1).collect()[0]
    assert r["_hoodie_commit_time"] == t0


def test_mor_upsert_after_compaction(spark, tmp_path, people):
    t = _mor(spark, tmp_path, people)
    upsert_hudi(
        spark, t,
        spark.createDataFrame(
            [(2, "bob2", "b", 21)], "id long, name string, grp string, v long"
        ),
    )
    compact_hudi(spark, t)
    upsert_hudi(
        spark, t,
        spark.createDataFrame(
            [(2, "bob3", "b", 22)], "id long, name string, grp string, v long"
        ),
    )
    assert (2, "bob3", "b", 22) in _rows(spark, t)
    # the new log attaches to the COMPACTED slice (version restarts)
    logs = sorted(
        n for n in os.listdir(os.path.join(t, "grp=b")) if ".log." in n
    )
    assert any(n.split(".log.")[1].startswith("1") for n in logs)


# ----------------------------------------------------------------- clustering


def test_cluster_replacecommit_and_time_travel(spark, tmp_path, people):
    t = str(tmp_path / "cow")
    write_hudi(people, t, record_key="id", partition_by="grp", buckets=2)
    pre = _rows(spark, t)
    out = cluster_hudi(spark, t, buckets=1)
    assert out["instant"] is not None
    hd = os.path.join(t, ".hoodie")
    assert os.path.isfile(
        os.path.join(hd, f"{out['instant']}.replacecommit")
    )
    # same rows, new (fewer) file groups; replaced groups excluded
    assert _rows(spark, t) == pre
    assert count_rows_hudi(t) == len(pre)
    # time travel BEFORE the replacecommit still sees the old groups
    t0 = hudi_timeline(t)[0]
    assert _rows(spark, t, as_of=t0) == pre
    assert count_rows_hudi(t, as_of=t0) == len(pre)
    # upserts still resolve groups after clustering (fresh file name)
    upsert_hudi(
        spark, t,
        spark.createDataFrame(
            [(2, "bob2", "b", 21)], "id long, name string, grp string, v long"
        ),
    )
    assert (2, "bob2", "b", 21) in _rows(spark, t)


def test_cluster_refuses_pending_logs(spark, tmp_path, people):
    t = _mor(spark, tmp_path, people)
    upsert_hudi(
        spark, t,
        spark.createDataFrame(
            [(2, "bob2", "b", 21)], "id long, name string, grp string, v long"
        ),
    )
    with pytest.raises(NotImplementedError, match="compact"):
        cluster_hudi(spark, t)
    compact_hudi(spark, t)
    assert cluster_hudi(spark, t)["instant"] is not None


# ---------------------------------------------------------------- incremental


def test_read_hudi_changes_per_instant(spark, tmp_path, people):
    t = _mor(spark, tmp_path, people)
    upsert_hudi(
        spark, t,
        spark.createDataFrame(
            [(2, "bob2", "b", 21), (9, "zed", "c", 90)],
            "id long, name string, grp string, v long",
        ),
    )
    delete_by_key_hudi(spark, t, spark.createDataFrame([(1,)], "id long"))
    t0, t1, t2 = hudi_timeline(t)
    full = read_hudi_changes(spark, t)
    got = sorted(
        (r["_commit_instant"], r["id"], r["name"]) for r in full.collect()
    )
    assert got == sorted(
        [(t0, 1, "ann"), (t0, 2, "bob"), (t0, 3, "cho"), (t0, 4, "dee"),
         (t1, 2, "bob2"), (t1, 9, "zed")]
    )  # the delete instant adds no rows (incremental = upserts only)
    # begin-exclusive windowing
    inc = read_hudi_changes(spark, t, begin_instant=t0)
    assert sorted((r["id"], r["name"]) for r in inc.collect()) == [
        (2, "bob2"), (9, "zed")
    ]
    # replay idempotence: the same window returns the same rows
    again = read_hudi_changes(spark, t, begin_instant=t0, end_instant=t1)
    assert sorted(tuple(r) for r in again.collect()) == sorted(
        tuple(r) for r in inc.collect()
    )
    # compaction contributes nothing to a later window
    compact_hudi(spark, t)
    t3 = hudi_timeline(t)[-1]
    assert read_hudi_changes(spark, t, begin_instant=t2).count() == 0
    assert t3 > t2
    # loud range errors
    with pytest.raises(ValueError, match="not a completed instant"):
        read_hudi_changes(spark, t, begin_instant="123")
    with pytest.raises(ValueError, match="inverted"):
        read_hudi_changes(spark, t, begin_instant=t2, end_instant=t0)


def test_cow_changes_track_rewrites(spark, tmp_path, people):
    """CoW survivors keep their original commit stamps, so an
    incremental window over a rewrite instant emits ONLY the upserted
    rows — never the carried-over survivors."""
    t = str(tmp_path / "cow")
    write_hudi(people, t, record_key="id", partition_by="grp")
    upsert_hudi(
        spark, t,
        spark.createDataFrame(
            [(2, "bob2", "b", 21)], "id long, name string, grp string, v long"
        ),
    )
    t0, t1 = hudi_timeline(t)
    inc = read_hudi_changes(spark, t, begin_instant=t0)
    assert [(r["id"], r["name"]) for r in inc.collect()] == [(2, "bob2")]
    # group b's other row (4, dee) survived the rewrite un-emitted
    m = read_hudi(spark, t, with_meta=True)
    assert (
        m.filter(F.col("id") == 4).collect()[0]["_hoodie_commit_time"] == t0
    )


def test_mor_log_schema_refusal_is_loud(spark, tmp_path):
    """Nested temporals and non-string map keys ride the log since
    r15 (their own round-trip tests below); what stays OUT still
    refuses by name: unsupported leaf types like binary."""
    t4 = str(tmp_path / "mor4")
    bn = spark.createDataFrame([(1, b"x")], "id long, b binary")
    write_hudi(bn, t4, record_key="id", table_type="MERGE_ON_READ")
    with pytest.raises(NotImplementedError, match="'b'"):
        upsert_hudi(spark, t4, bn)


def test_mor_nested_temporals_round_trip(spark, tmp_path):
    """Temporal leaves INSIDE containers (the r14 advisor's gap:
    the schema builder walked them, the epoch wire conversion did
    not): struct-nested timestamp/date, array<timestamp> and
    map<string,timestamp> all round-trip through log blocks with
    exact micros, nulls survive at both the container and the leaf,
    and compaction folds the values unchanged."""
    import datetime

    from archetype_spark.sources.hudi import compact_hudi

    ts1 = datetime.datetime(2024, 3, 1, 12, 30, 0, 123456)
    ts2 = datetime.datetime(2025, 7, 4, 8, 0, 1, 654321)
    d1 = datetime.date(2021, 5, 6)
    ddl = (
        "id long, ev struct<at:timestamp,on:date,tag:string>, "
        "hist array<timestamp>, marks map<string,timestamp>"
    )
    t = str(tmp_path / "t")
    df = spark.createDataFrame(
        [
            (1, (ts1, d1, "x"), [ts1, ts2], {"a": ts1}),
            (2, (ts2, None, "y"), [], {}),
        ],
        ddl,
    )
    write_hudi(df, t, record_key="id", table_type="MERGE_ON_READ")
    upsert_hudi(
        spark,
        t,
        spark.createDataFrame(
            [(2, (ts1, d1, "y2"), [ts2, None], {"b": ts2, "c": None})], ddl
        ),
    )  # id=2 rides the LOG path with nested temporals
    got = {
        r["id"]: (r["ev"], r["hist"], r["marks"])
        for r in read_hudi(spark, t).collect()
    }
    assert tuple(got[1][0]) == (ts1, d1, "x")  # base row untouched
    assert tuple(got[2][0]) == (ts1, d1, "y2")  # exact micros via log
    assert got[2][1] == [ts2, None]  # null element survives
    assert got[2][2] == {"b": ts2, "c": None}
    # null containers through the log
    upsert_hudi(
        spark,
        t,
        spark.createDataFrame([(1, None, None, None)], ddl),
    )
    r1 = read_hudi(spark, t).filter(F.col("id") == 1).collect()[0]
    assert r1["ev"] is None and r1["hist"] is None and r1["marks"] is None
    compact_hudi(spark, t)
    got2 = {r["id"]: r["ev"] for r in read_hudi(spark, t).collect()}
    assert tuple(got2[2]) == (ts1, d1, "y2")


def test_mor_nested_timestamp_cross_timezone_read(spark, tmp_path):
    """The zone normalization extends into containers: a
    struct-nested TimestampType written under one session zone reads
    back as the same INSTANT under another (nested Arrow values are
    session-local naive wall clock exactly like top-level ones)."""
    import datetime

    t = str(tmp_path / "t")
    tz0 = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        ts0 = datetime.datetime(2024, 3, 1, 12, 30, 0)
        ddl = "id long, ev struct<at:timestamp>, s string"
        df = spark.createDataFrame([(1, (ts0,), "a"), (2, (ts0,), "b")], ddl)
        want = {
            r["id"]: r["u"]
            for r in df.select(
                "id", F.unix_micros("ev.at").alias("u")
            ).collect()
        }
        write_hudi(df, t, record_key="id", table_type="MERGE_ON_READ")
        ts1 = datetime.datetime(2024, 7, 4, 8, 0, 0, 123456)  # DST leg
        upd = spark.createDataFrame([(2, (ts1,), "b2")], ddl)
        want[2] = upd.select(F.unix_micros("ev.at").alias("u")).collect()[0][
            "u"
        ]
        upsert_hudi(spark, t, upd)  # log path
        spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
        got = {
            r["id"]: r["u"]
            for r in read_hudi(spark, t)
            .select("id", F.unix_micros("ev.at").alias("u"))
            .collect()
        }
        assert got == want
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz0)


def test_mor_nonstring_map_keys_round_trip(spark, tmp_path):
    """map<long,_> / map<int,struct<...timestamp>> MOR columns: the
    avro wire carries them as entry-record arrays (logicalType
    'map'), from_json parses the entry form and map_from_entries
    rebuilds the typed map — including a temporal INSIDE the map
    value. Upsert, delete, incremental face and compaction hold."""
    import datetime

    from archetype_spark.sources.hudi import (
        compact_hudi,
        delete_by_key_hudi,
        hudi_timeline,
        read_hudi_changes,
    )

    ts1 = datetime.datetime(2024, 3, 1, 12, 30, 0, 123456)
    ddl = "id long, counts map<bigint,long>, evs map<int,struct<at:timestamp>>"
    t = str(tmp_path / "t")
    df = spark.createDataFrame(
        [
            (1, {10: 1, 20: 2}, {5: (ts1,)}),
            (2, {}, {}),
            (3, {30: 3}, None),
        ],
        ddl,
    )
    write_hudi(df, t, record_key="id", table_type="MERGE_ON_READ")
    base = {
        r["id"]: (r["counts"], r["evs"])
        for r in read_hudi(spark, t).collect()
    }
    assert base[1] == ({10: 1, 20: 2}, {5: (ts1,)})
    upsert_hudi(
        spark,
        t,
        spark.createDataFrame(
            [(2, {40: 4, 50: None}, {7: (ts1,), 8: None})], ddl
        ),
    )  # log path: kvmap blocks
    got = {
        r["id"]: (r["counts"], r["evs"])
        for r in read_hudi(spark, t).collect()
    }
    assert got[1] == ({10: 1, 20: 2}, {5: (ts1,)})
    assert got[2][0] == {40: 4, 50: None}  # null value survives
    assert got[2][1][7] == (ts1,) and got[2][1][8] is None
    # incremental face types the kvmap back too
    line = hudi_timeline(t)
    inc = read_hudi_changes(spark, t, begin_instant=line[0]).collect()
    upd = next(r for r in inc if r["_commit_instant"] == line[1])
    assert upd["counts"] == {40: 4, 50: None}
    delete_by_key_hudi(spark, t, spark.createDataFrame([(3,)], "id long"))
    compact_hudi(spark, t)
    after = {r["id"]: r["counts"] for r in read_hudi(spark, t).collect()}
    assert set(after) == {1, 2} and after[2] == {40: 4, 50: None}


def test_mor_complex_columns_round_trip(spark, tmp_path):
    """MOR log records with array / struct / map columns: the avro
    block nests containers with nullable elements, the merge read
    types them back exactly through from_json — upsert, null
    container, delete tombstone and compaction all hold."""
    from archetype_spark.sources.hudi import delete_by_key_hudi

    t = str(tmp_path / "t")
    df = spark.createDataFrame(
        [
            (1, ["a", "b"], (10, "x"), {"k1": 1}),
            (2, ["c"], (20, "y"), {"k2": 2}),
            (3, [], (30, None), {}),
        ],
        "id long, tags array<string>, st struct<n:long,s:string>, "
        "m map<string,long>",
    )
    write_hudi(df, t, record_key="id", table_type="MERGE_ON_READ")
    upsert_hudi(
        spark, t,
        spark.createDataFrame(
            [(2, ["c2", None], (21, "y2"), {"k2": 22, "k3": None})],
            "id long, tags array<string>, st struct<n:long,s:string>, "
            "m map<string,long>",
        ),
    )
    got = {
        r["id"]: (r["tags"], r["st"], r["m"])
        for r in read_hudi(spark, t).collect()
    }
    assert got[1] == (["a", "b"], (10, "x"), {"k1": 1})
    assert got[2][0] == ["c2", None]  # null element survives
    assert tuple(got[2][1]) == (21, "y2")
    assert got[2][2] == {"k2": 22, "k3": None}
    # a null container survives the block
    upsert_hudi(
        spark, t,
        spark.createDataFrame(
            [(1, None, None, None)],
            "id long, tags array<string>, st struct<n:long,s:string>, "
            "m map<string,long>",
        ),
    )
    r1 = read_hudi(spark, t).filter(F.col("id") == 1).collect()[0]
    assert r1["tags"] is None and r1["st"] is None and r1["m"] is None
    # delete block + compaction over the complex schema
    delete_by_key_hudi(
        spark, t, spark.createDataFrame([(3,)], "id long")
    )
    compact_hudi(spark, t)
    after = {
        r["id"]: (r["tags"], r["m"])
        for r in read_hudi(spark, t).collect()
    }
    assert set(after) == {1, 2}
    assert after[2] == (["c2", None], {"k2": 22, "k3": None})


def test_read_optimized_skips_log_merge(spark, tmp_path, people):
    """Hudi's second MOR query type: base files only — log updates
    and deletes are invisible until compaction folds them in, after
    which read-optimized equals the snapshot."""
    t = _mor(spark, tmp_path, people)
    upsert_hudi(
        spark, t,
        spark.createDataFrame(
            [(2, "bob2", "b", 21)], "id long, name string, grp string, v long"
        ),
    )
    delete_by_key_hudi(spark, t, spark.createDataFrame([(1,)], "id long"))
    assert _rows(spark, t, read_optimized=True) == [
        (1, "ann", "a", 10), (2, "bob", "b", 20),
        (3, "cho", "a", 30), (4, "dee", "b", 40),
    ]  # the pre-log base state
    compact_hudi(spark, t)
    assert _rows(spark, t, read_optimized=True) == _rows(spark, t)


def test_partition_filter_prunes_groups(spark, tmp_path, people):
    """partition_filter prunes file GROUPS at O(timeline metadata):
    non-matching groups' base and log files never open (pinned by
    breaking the other partition's file on disk), and unknown fields
    refuse."""
    t = _mor(spark, tmp_path, people)
    upsert_hudi(
        spark, t,
        spark.createDataFrame(
            [(2, "bob2", "b", 21)], "id long, name string, grp string, v long"
        ),
    )
    # corrupt partition a's base file: a pruned read must never see it
    a_dir = os.path.join(t, "grp=a")
    victim = next(
        n for n in os.listdir(a_dir) if n.endswith(".parquet")
    )
    with open(os.path.join(a_dir, victim), "wb") as fh:
        fh.write(b"not parquet")
    got = sorted(
        tuple(r)
        for r in read_hudi(spark, t, partition_filter={"grp": "b"})
        .select("id", "name", "grp", "v")
        .collect()
    )
    assert got == [(2, "bob2", "b", 21), (4, "dee", "b", 40)]
    with pytest.raises(ValueError, match="partition_filter"):
        read_hudi(spark, t, partition_filter={"nope": "x"})
    with pytest.raises(FileNotFoundError, match="no file groups match"):
        read_hudi(spark, t, partition_filter={"grp": "zz"})


def test_clean_removes_unreachable_slices(spark, tmp_path, people):
    """clean_hudi (KEEP_LATEST_COMMITS): obsolete base files, replaced
    groups and compacted-away logs unlink once no retained as_of can
    reach them; every retained snapshot still reads exactly, and the
    .clean metadata records what was removed."""
    import json as _json

    from archetype_spark.sources.hudi import clean_hudi

    t = _mor(spark, tmp_path, people)
    upsert_hudi(
        spark, t,
        spark.createDataFrame(
            [(2, "bob2", "b", 21)], "id long, name string, grp string, v long"
        ),
    )
    compact_hudi(spark, t)  # the pre-compaction slice becomes garbage
    upsert_hudi(
        spark, t,
        spark.createDataFrame(
            [(2, "bob3", "b", 22)], "id long, name string, grp string, v long"
        ),
    )
    pre_rows = _rows(spark, t)
    line = hudi_timeline(t)
    out = clean_hudi(t, keep_last=2)
    assert out["files_deleted"] > 0
    # retained snapshots read exactly
    assert _rows(spark, t) == pre_rows
    assert _rows(spark, t, as_of=line[-2]) is not None
    # the cleaned instant fails LOUDLY, never silently wrong
    with pytest.raises(Exception):
        _rows(spark, t, as_of=line[0])
    # .clean metadata records the removals
    hd = os.path.join(t, ".hoodie")
    clean_files = [n for n in os.listdir(hd) if n.endswith(".clean")]
    assert len(clean_files) == 1
    meta = _json.load(open(os.path.join(hd, clean_files[0])))
    assert meta["totalFilesDeleted"] == out["files_deleted"]
    assert meta["earliestCommitToRetain"] == line[-2]
    # idempotent: nothing else to remove
    assert clean_hudi(t, keep_last=2)["files_deleted"] == 0
    # the table still accepts writes afterwards
    upsert_hudi(
        spark, t,
        spark.createDataFrame(
            [(1, "ann2", "a", 11)], "id long, name string, grp string, v long"
        ),
    )
    assert (1, "ann2", "a", 11) in _rows(spark, t)


def test_streaming_upsert_sink_exactly_once_mor(spark, tmp_path):
    """The CDC-stream sink shape: mode='upsert' on a MERGE_ON_READ
    table appends one log file per affected slice per micro-batch,
    the batch mark riding the same atomic deltacommit; replayed batch
    ids skip, intra-batch duplicate keys collapse via precombine."""
    from archetype_spark.sources.hudi import (
        last_streaming_batch_hudi,
        streaming_hudi_sink,
    )

    t = str(tmp_path / "t")
    sink = streaming_hudi_sink(
        t, "id", app_id="cdc-v1", mode="upsert",
        precombine="ver", table_type="MERGE_ON_READ",
    )
    schema = "id long, s string, ver long"
    sink(spark.createDataFrame([(1, "a", 1), (2, "b", 1)], schema), 0)
    assert last_streaming_batch_hudi(t, "cdc-v1") == 0
    # batch 1: update key 2 (duplicate in-batch rows, larger ver wins)
    # and insert key 3
    sink(
        spark.createDataFrame(
            [(2, "b-old", 2), (2, "b-new", 3), (3, "c", 1)], schema
        ),
        1,
    )
    assert last_streaming_batch_hudi(t, "cdc-v1") == 1
    got = sorted(
        tuple(r)
        for r in read_hudi(spark, t).select("id", "s", "ver").collect()
    )
    assert got == [(1, "a", 1), (2, "b-new", 3), (3, "c", 1)]
    # the update landed as a LOG file, not a base rewrite
    logs = [
        n
        for _d, _s, fs in os.walk(t)
        if ".hoodie" not in _d
        for n in fs
        if ".log." in n
    ]
    assert logs
    # replayed batch: a no-op (no new instant, same rows)
    n_before = len(hudi_timeline(t))
    sink(
        spark.createDataFrame([(2, "zzz", 9)], schema), 1
    )
    assert len(hudi_timeline(t)) == n_before
    assert sorted(
        tuple(r)
        for r in read_hudi(spark, t).select("id", "s", "ver").collect()
    ) == got
    # compaction folds the stream's logs without changing the rows
    compact_hudi(spark, t)
    assert sorted(
        tuple(r)
        for r in read_hudi(spark, t).select("id", "s", "ver").collect()
    ) == got


def test_hudi_history_introspection(spark, tmp_path, people):
    """hudi_history: one row per completed instant from the timeline
    JSON alone — actions, operations and write stats (the DESCRIBE
    HISTORY / snapshots_iceberg twin)."""
    from archetype_spark.sources.hudi import hudi_history

    t = _mor(spark, tmp_path, people)
    upsert_hudi(
        spark, t,
        spark.createDataFrame(
            [(2, "bob2", "b", 21)], "id long, name string, grp string, v long"
        ),
    )
    delete_by_key_hudi(spark, t, spark.createDataFrame([(1,)], "id long"))
    compact_hudi(spark, t)
    h = hudi_history(spark, t).orderBy("instant").collect()
    assert [r["action"] for r in h] == [
        "deltacommit", "deltacommit", "deltacommit", "commit"
    ]
    assert [r["operation"] for r in h] == [
        "BULK_INSERT", "UPSERT", "DELETE", "COMPACT"
    ]
    assert h[0]["rows_written"] == 4
    assert h[1]["rows_updated"] == 1 and h[1]["rows_written"] == 0
    assert h[2]["rows_deleted"] == 1
    assert h[3]["rows_written"] == 3  # the compacted slices' rows


def test_mor_temporal_columns_round_trip(spark, tmp_path):
    """MOR log records with timestamp / timestamp_ntz / date columns:
    the avro block stores epoch micros/days under logical types, the
    merge read converts back exactly — and the incremental face sees
    the same values."""
    import datetime

    from archetype_spark.sources.hudi import read_hudi_changes

    t = str(tmp_path / "t")
    ts0 = datetime.datetime(2024, 3, 1, 12, 30, 0, 250)
    d0 = datetime.date(2024, 3, 1)
    df = spark.createDataFrame(
        [(1, ts0, d0, "a"), (2, ts0, d0, "b")],
        "id long, ts timestamp, d date, s string",
    )
    write_hudi(df, t, record_key="id", table_type="MERGE_ON_READ")
    ts1 = datetime.datetime(2025, 7, 4, 1, 2, 3, 456789)
    d1 = datetime.date(2025, 7, 4)
    upsert_hudi(
        spark, t,
        spark.createDataFrame(
            [(2, ts1, d1, "b2")], "id long, ts timestamp, d date, s string"
        ),
    )
    got = {
        r["id"]: (r["ts"], r["d"], r["s"])
        for r in read_hudi(spark, t).collect()
    }
    assert got[1] == (ts0, d0, "a")
    assert got[2] == (ts1, d1, "b2")  # exact micros through the log
    # a null temporal survives the block too
    upsert_hudi(
        spark, t,
        spark.createDataFrame(
            [(1, None, None, "a2")], "id long, ts timestamp, d date, s string"
        ),
    )
    r1 = read_hudi(spark, t).filter(F.col("id") == 1).collect()[0]
    assert r1["ts"] is None and r1["d"] is None and r1["s"] == "a2"
    # the incremental face reads the same values back out of the logs
    line = hudi_timeline(t)
    inc = read_hudi_changes(spark, t, begin_instant=line[0]).collect()
    by_instant = {(r["_commit_instant"], r["id"]): r for r in inc}
    assert by_instant[(line[1], 2)]["ts"] == ts1
    assert by_instant[(line[2], 1)]["ts"] is None
    # compaction folds temporal log records exactly
    compact_hudi(spark, t)
    got2 = {
        r["id"]: (r["ts"], r["d"], r["s"])
        for r in read_hudi(spark, t).collect()
    }
    assert got2[2] == (ts1, d1, "b2") and got2[1] == (None, None, "a2")


def test_mor_timestamp_cross_timezone_read(spark, tmp_path):
    """MOR log timestamp-micros are TRUE UTC instants: a snapshot read
    under a DIFFERENT session time zone resolves log-merged rows to
    the same instant as base-file rows (regression: the encoder used
    to store the session-local wall clock as if it were UTC, shifting
    cross-tz reads by the zone offset)."""
    import datetime

    t = str(tmp_path / "t")
    tz0 = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        ts0 = datetime.datetime(2024, 3, 1, 12, 30, 0)  # EST wall clock
        df = spark.createDataFrame(
            [(1, ts0, "a"), (2, ts0, "b")], "id long, ts timestamp, s string"
        )
        # the instant the writer session means by ts0 (EST -> UTC)
        want = {
            r["id"]: r["u"]
            for r in df.select(
                "id", F.unix_micros("ts").alias("u")
            ).collect()
        }
        write_hudi(df, t, record_key="id", table_type="MERGE_ON_READ")
        ts1 = datetime.datetime(2024, 7, 4, 8, 0, 0, 123456)  # EDT (DST)
        upd = spark.createDataFrame(
            [(2, ts1, "b2")], "id long, ts timestamp, s string"
        )
        want[2] = upd.select(F.unix_micros("ts").alias("u")).collect()[0]["u"]
        upsert_hudi(spark, t, upd)  # id=2 rides the LOG path
        spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
        got = {
            r["id"]: r["u"]
            for r in read_hudi(spark, t)
            .select("id", F.unix_micros("ts").alias("u"))
            .collect()
        }
        assert got == want  # base row AND log row: same instants
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz0)


def test_mor_malformed_log_payload_fails_fast(spark, tmp_path, people):
    """A log record whose payload cannot parse as the table schema
    raises at read (FAILFAST) — PERMISSIVE would silently null the
    columns and resurrect the row as key-only/all-null data."""
    t = _mor(spark, tmp_path, people)
    upsert_hudi(
        spark, t,
        spark.createDataFrame(
            [(2, "bob2", "b", 21)], "id long, name string, grp string, v long"
        ),
    )
    # overwrite the committed log file with a type-poisoned record:
    # v is declared long in the table schema but carries a string
    log_path = next(
        os.path.join(r, n)
        for r, _d, files in os.walk(t)
        for n in files
        if ".log." in n
    )
    bad_schema = {
        "type": "record",
        "name": "R",
        "fields": [
            {"name": "_hoodie_record_key", "type": ["null", "string"]},
            {"name": "v", "type": ["null", "string"]},
        ],
    }
    instant = hudi_timeline(t)[-1]
    with open(log_path, "wb") as fh:
        fh.write(
            hudi_log.avro_data_block(
                [{"_hoodie_record_key": "2", "v": "not-a-long"}],
                bad_schema,
                instant,
            )
        )
    with pytest.raises(Exception, match="(?i)malformed|failfast"):
        read_hudi(spark, t).collect()
