"""Delta column mapping, mode 'name' (sources/delta.py): reads under
pinned physical names with a logical rename on top, so
rename_column_delta / drop_column_delta are metadata-only commits
that never rewrite data. Pins the protocol rules that bite: parquet
files + add-action partitionValues speak PHYSICAL names, renames keep
old files readable (incl. renamed partition columns), appends after a
rename restage under the physical layout, new columns get fresh
never-reused physical names, and DV row-level deletes compose with
mapping. Semantics from the PUBLIC Delta protocol ("Column Mapping");
the capability the reference reads through its deltalake dependency
(reference pyproject.toml:7-10)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from archetype_spark.sources import (
    add_column_delta,
    checkpoint_delta,
    compact_delta,
    drop_column_delta,
    enable_column_mapping_delta,
    read_delta,
    read_delta_changes,
    rename_column_delta,
    write_delta,
)
from archetype_spark.sources.delta import _mapping_info, _snapshot_actions


@pytest.fixture()
def people(spark):
    return spark.createDataFrame(
        [
            (1, "ann", "us"),
            (2, "bob", "us"),
            (3, "cho", "jp"),
            (4, "dee", "jp"),
        ],
        "id long, name string, country string",
    ).coalesce(1)


def _rows(spark, t, version=None):
    return sorted(tuple(r) for r in read_delta(spark, t, version).collect())


def test_enable_rename_read_old_files(spark, tmp_path, people):
    t = str(tmp_path / "t")
    write_delta(people, t)
    before = _rows(spark, t)
    enable_column_mapping_delta(t)
    # upgrade alone changes nothing visible
    assert _rows(spark, t) == before
    rename_column_delta(t, "name", "full_name")
    got = read_delta(spark, t)
    assert got.columns == ["id", "full_name", "country"]
    assert sorted(r["full_name"] for r in got.collect()) == [
        "ann",
        "bob",
        "cho",
        "dee",
    ]
    # zero data rewritten: the original parquet is still the only one
    files = [
        n
        for _r, _d, fs in os.walk(t)
        for n in fs
        if n.endswith(".parquet") and "_delta_log" not in _r
    ]
    assert len(files) == 1
    # physicalName stayed pinned to the ORIGINAL name
    meta, _a, _t = _snapshot_actions(os.path.abspath(t))
    _mode, _log, _phys, l2p = _mapping_info(meta)
    assert l2p["full_name"] == "name"
    # double rename keeps working; time travel shows the OLD schema
    rename_column_delta(t, "full_name", "nm")
    assert read_delta(spark, t).columns == ["id", "nm", "country"]
    assert read_delta(spark, t, version=0).columns == [
        "id",
        "name",
        "country",
    ]


def test_append_after_rename_stages_physical(spark, tmp_path, people):
    t = str(tmp_path / "t")
    write_delta(people, t, partition_by=["country"])
    enable_column_mapping_delta(t)
    rename_column_delta(t, "country", "nation")
    more = spark.createDataFrame(
        [(5, "eve", "de")], "id long, name string, nation string"
    ).coalesce(1)
    write_delta(more, t, mode="append", partition_by=["nation"])
    got = read_delta(spark, t)
    assert got.columns == ["id", "name", "nation"]
    assert sorted(r["nation"] for r in got.collect()) == [
        "de",
        "jp",
        "jp",
        "us",
        "us",
    ]
    # the new add's partitionValues key is the PHYSICAL name
    meta, active, _t2 = _snapshot_actions(os.path.abspath(t))
    new_adds = [a for a in active.values() if "de" in str(a)]
    assert new_adds and list(new_adds[0]["partitionValues"]) == ["country"]
    # filters on the renamed partition column still prune/answer
    assert read_delta(spark, t).filter(F.col("nation") == "de").count() == 1


def test_add_and_drop_columns_metadata_only(spark, tmp_path, people):
    t = str(tmp_path / "t")
    write_delta(people, t)
    enable_column_mapping_delta(t)
    v = add_column_delta(t, "score", "double")
    meta, _a, _t2 = _snapshot_actions(os.path.abspath(t), v)
    _m, _l, _p, l2p = _mapping_info(meta)
    assert l2p["score"].startswith("col-")  # fresh physical name
    upd = read_delta(spark, t).withColumn("score", F.lit(1.5))
    write_delta(upd, t, mode="append")
    assert read_delta(spark, t).filter("score = 1.5").count() == 4
    drop_column_delta(t, "name")
    got = read_delta(spark, t)
    assert got.columns == ["id", "country", "score"]
    assert got.count() == 8
    with pytest.raises(ValueError, match="partition column"):
        # partition columns refuse to drop
        t2 = str(tmp_path / "t2")
        write_delta(people, t2, partition_by=["country"])
        enable_column_mapping_delta(t2)
        drop_column_delta(t2, "country")


def test_mapping_composes_with_deletion_vectors(spark, tmp_path, people):
    from archetype_spark.sources import delete_where_delta, update_where_delta

    t = str(tmp_path / "t")
    write_delta(people, t)
    enable_column_mapping_delta(t)
    rename_column_delta(t, "country", "nation")
    out = delete_where_delta(spark, t, "nation = 'us'")
    assert out["rows_deleted"] == 2
    assert sorted(r["id"] for r in read_delta(spark, t).collect()) == [3, 4]
    out2 = update_where_delta(
        spark, t, "id = 3", {"name": "upper(name)"}
    )
    assert out2["rows_updated"] == 1
    got = {r["id"]: r["name"] for r in read_delta(spark, t).collect()}
    assert got == {3: "CHO", 4: "dee"}
    # checkpoint keeps the mapping config; replay-from-checkpoint reads
    checkpoint_delta(t)
    assert sorted(got) == sorted(
        r["id"] for r in read_delta(spark, t).collect()
    )


def test_compaction_and_changes_on_mapped_table(spark, tmp_path, people):
    t = str(tmp_path / "t")
    write_delta(people, t)
    enable_column_mapping_delta(t)
    rename_column_delta(t, "name", "nm")
    write_delta(
        read_delta(spark, t).limit(0), t, mode="append"
    )  # empty commit
    compact_delta(spark, t, target_files=1)
    assert read_delta(spark, t).columns == ["id", "nm", "country"]
    assert read_delta(spark, t).count() == 4
    # a range ending at the PRE-mapping version speaks that version's
    # schema; a range ending at latest speaks the renamed one (the
    # old files read through their pinned physical names either way)
    ch0 = read_delta_changes(spark, t, 0, 0)
    assert ch0.columns == ["id", "name", "country", "_commit_version"]
    assert ch0.count() == 4
    ch = read_delta_changes(spark, t, 0)
    assert ch.columns == ["id", "nm", "country", "_commit_version"]
    assert ch.filter("_commit_version = 0").count() == 4


def test_mode_id_and_missing_physical_refuse(spark, tmp_path, people):
    t = str(tmp_path / "t")
    write_delta(people, t)
    enable_column_mapping_delta(t)
    table = os.path.abspath(t)
    meta, _a, _t2 = _snapshot_actions(table)
    # flip the mode to 'id' by hand: must refuse loudly
    from archetype_spark.sources.delta import _publish_commit

    bad = dict(meta)
    bad["configuration"] = {
        **meta["configuration"],
        "delta.columnMapping.mode": "id",
    }
    _publish_commit(table, 2, [{"metaData": bad}])
    # mode 'id' now READS — but only when the data files carry
    # matching PARQUET:field_id stamps, which this name-mode-written
    # table lacks: still a loud refusal, never silent misreads
    with pytest.raises(NotImplementedError, match="field id"):
        read_delta(spark, t).count()
    # strip a physicalName: must refuse, not silently misread
    sch = json.loads(meta["schemaString"])
    sch["fields"][0]["metadata"].pop("delta.columnMapping.physicalName")
    bad2 = dict(meta)
    bad2["schemaString"] = json.dumps(sch)
    _publish_commit(table, 3, [{"metaData": bad2}])
    with pytest.raises(NotImplementedError, match="physicalName"):
        read_delta(spark, t).count()


def test_legacy_reader2_protocol_accepted(spark, tmp_path, people):
    """A mapped table at the legacy protocol level (minReaderVersion 2,
    no table features) reads — that is how most existing mapped
    tables in the wild are stamped."""
    t = str(tmp_path / "t")
    write_delta(people, t)
    enable_column_mapping_delta(t)
    meta, _a, _t2, protocol = _snapshot_actions(
        os.path.abspath(t), return_protocol=True
    )
    assert protocol == {"minReaderVersion": 2, "minWriterVersion": 5}
    rename_column_delta(t, "id", "pk")
    assert sorted(r["pk"] for r in read_delta(spark, t).collect()) == [
        1,
        2,
        3,
        4,
    ]


def _write_id_mode_table(tmp_path, field_ids=(1, 2)):
    """Hand-built FOREIGN mode-'id' table: parquet stamped with
    PARQUET:field_id metadata, a (2,5) log whose schema maps logical
    (id, name) onto physical (col-aaa, col-bbb) with matching
    delta.columnMapping.id values."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    t = str(tmp_path / "idmode")
    os.makedirs(os.path.join(t, "_delta_log"))
    arrow = pa.schema(
        [
            pa.field(
                "col-aaa",
                pa.int64(),
                metadata={b"PARQUET:field_id": str(field_ids[0]).encode()},
            ),
            pa.field(
                "col-bbb",
                pa.string(),
                metadata={b"PARQUET:field_id": str(field_ids[1]).encode()},
            ),
        ]
    )
    pq.write_table(
        pa.table({"col-aaa": [1, 2], "col-bbb": ["ann", "bob"]}, schema=arrow),
        os.path.join(t, "part-0.parquet"),
    )
    logical = StructType(
        [
            StructField(
                "id",
                LongType(),
                True,
                {
                    "delta.columnMapping.id": 1,
                    "delta.columnMapping.physicalName": "col-aaa",
                },
            ),
            StructField(
                "name",
                StringType(),
                True,
                {
                    "delta.columnMapping.id": 2,
                    "delta.columnMapping.physicalName": "col-bbb",
                },
            ),
        ]
    )
    actions = [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        {
            "metaData": {
                "id": "t-idmode",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": logical.json(),
                "partitionColumns": [],
                "configuration": {
                    "delta.columnMapping.mode": "id",
                    "delta.columnMapping.maxColumnId": "2",
                },
            }
        },
        {
            "add": {
                "path": "part-0.parquet",
                "partitionValues": {},
                "size": os.path.getsize(os.path.join(t, "part-0.parquet")),
                "modificationTime": 0,
                "dataChange": True,
            }
        },
    ]
    with open(os.path.join(t, "_delta_log", f"{0:020d}.json"), "w") as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")
    return t


def test_id_mode_reads_by_verified_physical_names(spark, tmp_path):
    """Mode 'id' (read-only): conforming writers stamp physicalName
    AND parquet field ids, so the scan resolves by physicalName
    after a one-footer field-id verification."""
    t = _write_id_mode_table(tmp_path)
    got = sorted(tuple(r) for r in read_delta(spark, t).collect())
    assert got == [(1, "ann"), (2, "bob")]
    assert read_delta(spark, t).columns == ["id", "name"]


def test_id_mode_mismatched_field_ids_refuse(spark, tmp_path):
    """A pure-id layout (file ids disagree with metadata ids) cannot
    be served by physicalName resolution — loud refusal, never
    silently wrong columns."""
    t = _write_id_mode_table(tmp_path, field_ids=(9, 2))
    with pytest.raises(NotImplementedError, match="field id"):
        read_delta(spark, t).collect()


def _assert_field_ids(table, want: dict[str, int], skip: set | None = None):
    """Every data file THIS writer staged must carry PARQUET:field_id
    stamps matching the table metadata (what a conforming id-matching
    reader resolves on)."""
    import pyarrow.parquet as pq

    checked = 0
    for root, _dirs, files in os.walk(table):
        if "_delta_log" in root:
            continue
        for f in files:
            if not f.endswith(".parquet") or f in (skip or set()):
                continue
            arrow = pq.ParquetFile(os.path.join(root, f)).schema_arrow
            for pn, fid in want.items():
                if arrow.get_field_index(pn) == -1:
                    continue
                got = (arrow.field(pn).metadata or {}).get(
                    b"PARQUET:field_id"
                )
                assert got is not None and int(got) == fid, (f, pn, got)
            checked += 1
    assert checked > 0


def test_id_mode_append_round_trip(spark, tmp_path):
    """Mode-'id' APPEND (r13): staged files carry PARQUET:field_id
    stamps from the alias metadata, so both this reader's one-footer
    verification and a conforming id-matching reader accept them."""
    t = _write_id_mode_table(tmp_path)
    more = spark.createDataFrame([(3, "eve")], "id long, name string")
    write_delta(more, t, mode="append")
    got = sorted(tuple(r) for r in read_delta(spark, t).collect())
    assert got == [(1, "ann"), (2, "bob"), (3, "eve")]
    _assert_field_ids(t, {"col-aaa": 1, "col-bbb": 2}, skip={"part-0.parquet"})


def test_id_mode_dv_delete_and_update(spark, tmp_path):
    """Mode-'id' row-level DELETE/UPDATE: the DV mask composes with
    id mapping, and UPDATE's replacement files are id-stamped."""
    from archetype_spark.sources import delete_where_delta, update_where_delta

    t = _write_id_mode_table(tmp_path)
    out = delete_where_delta(spark, t, "id = 1")
    assert out["rows_deleted"] == 1
    assert sorted(tuple(r) for r in read_delta(spark, t).collect()) == [
        (2, "bob")
    ]
    out = update_where_delta(spark, t, "id = 2", {"name": "'bobby'"})
    assert out["rows_updated"] == 1
    assert sorted(tuple(r) for r in read_delta(spark, t).collect()) == [
        (2, "bobby")
    ]
    _assert_field_ids(t, {"col-aaa": 1, "col-bbb": 2}, skip={"part-0.parquet"})


def test_id_mode_add_column_and_evolution_refusals(spark, tmp_path):
    """add_column on an id-mode table assigns a fresh id + physical
    name and bumps maxColumnId; appends then stamp the new column
    too. Rename/drop evolution stays refused (only the 'name'-mode
    contract covers it)."""
    t = _write_id_mode_table(tmp_path)
    add_column_delta(t, "age", "long")
    meta, _a, _t2 = _snapshot_actions(os.path.abspath(t))
    sch = json.loads(meta["schemaString"])
    new_md = sch["fields"][2]["metadata"]
    assert new_md["delta.columnMapping.id"] == 3
    assert new_md["delta.columnMapping.physicalName"].startswith("col-")
    assert meta["configuration"]["delta.columnMapping.maxColumnId"] == "3"
    # old rows read NULL for the new column; new appends carry it
    more = spark.createDataFrame(
        [(3, "eve", 30)], "id long, name string, age long"
    )
    write_delta(more, t, mode="append")
    got = sorted(
        tuple(r) for r in read_delta(spark, t).collect()
    )
    assert got == [(1, "ann", None), (2, "bob", None), (3, "eve", 30)]
    pn = new_md["delta.columnMapping.physicalName"]
    _assert_field_ids(
        t, {"col-aaa": 1, "col-bbb": 2, pn: 3}, skip={"part-0.parquet"}
    )
    with pytest.raises(ValueError, match="mode 'id'"):
        rename_column_delta(t, "name", "nm")
    with pytest.raises(ValueError, match="mode 'id'"):
        drop_column_delta(t, "name")
