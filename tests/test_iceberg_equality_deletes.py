"""Iceberg format-v2 EQUALITY deletes (sources/iceberg.py):
delete_by_key_iceberg / upsert_by_key_iceberg. Pins the spec rules
that differ from position deletes: STRICT sequence scoping (an
equality delete applies only to data at a strictly LOWER sequence —
so a same-commit upsert's inserts escape their own delete, and rows
re-appended after a delete survive it), null-matches-null key
comparison, multi-column keys, and interaction with position deletes,
compaction, metadata-COUNT and incremental-read refusals. The
capability the reference reads through its Iceberg dependency
(reference pyproject.toml:7-10); semantics from the PUBLIC Iceberg
table spec ("Scan Planning", "Delete Files")."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from archetype_spark.sources import (
    compact_iceberg,
    count_rows_iceberg,
    read_iceberg,
    read_iceberg_changes,
    snapshots_iceberg,
    write_iceberg,
)
from archetype_spark.sources.iceberg import (
    _live_entries,
    _load_metadata,
    delete_by_key_iceberg,
    delete_where_iceberg,
    upsert_by_key_iceberg,
)


@pytest.fixture()
def people(spark):
    """One data file so deletes hit rows inside a multi-row file."""
    return spark.createDataFrame(
        [
            (1, "ann", "us"),
            (2, "bob", "us"),
            (3, "cho", "jp"),
            (4, "dee", "jp"),
        ],
        "id long, name string, country string",
    ).coalesce(1)


def _ids(spark, t, snapshot_id=None):
    return sorted(
        r["id"] for r in read_iceberg(spark, t, snapshot_id).collect()
    )


def _keys(spark, *ids):
    return spark.createDataFrame([(i,) for i in ids], "id long").coalesce(1)


def test_delete_by_key_basic_upgrade_and_time_travel(spark, tmp_path, people):
    t = str(tmp_path / "t")
    write_iceberg(people, t)
    out = delete_by_key_iceberg(spark, t, _keys(spark, 1, 3))
    assert out == {"delete_files": 1, "delete_keys": 2}
    meta = _load_metadata(t)
    assert int(meta["format-version"]) == 2
    assert int(meta["last-sequence-number"]) == 1
    assert _ids(spark, t) == [2, 4]
    # time travel to the pre-delete snapshot sees everything
    first = snapshots_iceberg(t)[0]["snapshot-id"]
    assert _ids(spark, t, first) == [1, 2, 3, 4]
    # manifest records the equality field ids + table-global scope
    meta2 = _load_metadata(t)
    _d, _pos, eq = _live_entries(
        os.path.abspath(t), meta2["snapshots"][-1], meta2
    )
    assert len(eq) == 1
    _path, seq, ids, rc, scope = eq[0]
    assert seq == 1 and ids == (1,) and rc == 2  # id is field 1
    assert scope is None  # unpartitioned spec -> global


def test_strict_scoping_reappended_keys_survive(spark, tmp_path, people):
    """THE equality-vs-position semantic difference: strict `>`.
    A re-append of a deleted key at a HIGHER sequence escapes the
    delete; a hypothetical `>=` reader would also (wrongly) kill
    same-sequence rows — pinned separately by the upsert test."""
    t = str(tmp_path / "t")
    write_iceberg(people, t)
    delete_by_key_iceberg(spark, t, _keys(spark, 1, 2))
    assert _ids(spark, t) == [3, 4]
    # re-append id=1 with the SAME key value
    back = spark.createDataFrame(
        [(1, "ann2", "us")], "id long, name string, country string"
    ).coalesce(1)
    write_iceberg(back, t, mode="append")
    assert _ids(spark, t) == [1, 3, 4]
    names = {r["id"]: r["name"] for r in read_iceberg(spark, t).collect()}
    assert names[1] == "ann2"  # the new row, not the resurrected old one
    # a LATER delete reaches it again
    delete_by_key_iceberg(spark, t, _keys(spark, 1))
    assert _ids(spark, t) == [3, 4]


def test_multi_column_keys_and_null_matches_null(spark, tmp_path):
    t = str(tmp_path / "t")
    df = spark.createDataFrame(
        [
            (1, "us", 10),
            (1, None, 11),
            (2, "us", 12),
            (2, None, 13),
            (1, "jp", 14),
        ],
        "k long, country string, v long",
    ).coalesce(1)
    write_iceberg(df, t)
    keys = spark.createDataFrame(
        [(1, None), (2, "us")], "k long, country string"
    ).coalesce(1)
    delete_by_key_iceberg(spark, t, keys)
    got = sorted(r["v"] for r in read_iceberg(spark, t).collect())
    # (1, NULL) kills v=11 (null matches null), (2,'us') kills v=12;
    # (1,'us'), (2,NULL), (1,'jp') survive
    assert got == [10, 13, 14]


def test_upsert_one_snapshot_inserts_escape_own_delete(
    spark, tmp_path, people
):
    t = str(tmp_path / "t")
    write_iceberg(people, t)
    n0 = len(snapshots_iceberg(t))
    ups = spark.createDataFrame(
        [(2, "BOB", "uk"), (5, "eve", "uk")],
        "id long, name string, country string",
    ).coalesce(1)
    out = upsert_by_key_iceberg(spark, t, ups, ["id"])
    assert out["delete_keys"] == 2 and out["rows_inserted"] == 2
    assert len(snapshots_iceberg(t)) == n0 + 1  # ONE snapshot
    got = sorted(tuple(r) for r in read_iceberg(spark, t).collect())
    assert got == [
        (1, "ann", "us"),
        (2, "BOB", "uk"),  # replaced, not duplicated, not self-deleted
        (3, "cho", "jp"),
        (4, "dee", "jp"),
        (5, "eve", "uk"),  # fresh key: plain insert
    ]
    # the delete and data manifests share one sequence number
    meta = _load_metadata(t)
    data, _pos, eq = _live_entries(os.path.abspath(t), meta["snapshots"][-1])
    assert eq[0][1] == 1
    assert {s for _p, _pv, _rp, s, _f in data} == {0, 1}
    # upserting again is idempotent in effect
    upsert_by_key_iceberg(spark, t, ups, ["id"])
    assert sorted(tuple(r) for r in read_iceberg(spark, t).collect()) == got


def test_upsert_into_partitioned_table(spark, tmp_path, people):
    t = str(tmp_path / "t")
    write_iceberg(people.repartition("country"), t, partition_by=["country"])
    ups = spark.createDataFrame(
        [(3, "CHO", "jp")], "id long, name string, country string"
    ).coalesce(1)
    out = upsert_by_key_iceberg(spark, t, ups, ["id"])
    assert out["rows_inserted"] == 1
    got = {r["id"]: r["name"] for r in read_iceberg(spark, t).collect()}
    assert got == {1: "ann", 2: "bob", 3: "CHO", 4: "dee"}


def test_partitioned_global_delete_uses_unpartitioned_spec(
    spark, tmp_path, people
):
    """Spec rule: equality deletes are table-global only when stored
    under an UNPARTITIONED spec. On a partitioned table the writer
    must register one and stamp the delete manifest with its id —
    an all-null partition under the partitioned spec would read as
    scoped-to-null-partition in spec-compliant engines."""
    from archetype_spark.sources import avro_io
    from archetype_spark.sources.iceberg import _abs

    t = str(tmp_path / "t")
    write_iceberg(people.repartition("country"), t, partition_by=["country"])
    delete_by_key_iceberg(spark, t, _keys(spark, 2, 3))  # one per partition
    assert _ids(spark, t) == [1, 4]
    meta = _load_metadata(t)
    unpart = {
        int(s["spec-id"])
        for s in meta["partition-specs"]
        if not (s.get("fields") or [])
    }
    assert unpart, "global equality delete must register an unpartitioned spec"
    assert int(meta["default-spec-id"]) not in unpart  # data spec unchanged
    snap = meta["snapshots"][-1]
    _s, manifests = avro_io.read_container(
        _abs(os.path.abspath(t), snap["manifest-list"])
    )
    del_mans = [m for m in manifests if int(m.get("content") or 0) == 1]
    assert del_mans
    assert all(int(m["partition_spec_id"]) in unpart for m in del_mans)
    _d, _pos, eq = _live_entries(os.path.abspath(t), snap, meta)
    assert eq and all(e[4] is None for e in eq)  # resolved scope: global
    # upsert into the partitioned table still round-trips end to end
    ups = spark.createDataFrame(
        [(4, "DEE", "jp"), (9, "new", "us")],
        "id long, name string, country string",
    ).coalesce(1)
    upsert_by_key_iceberg(spark, t, ups, ["id"])
    got = {r["id"]: r["name"] for r in read_iceberg(spark, t).collect()}
    assert got == {1: "ann", 4: "DEE", 9: "new"}


def test_foreign_partition_scoped_equality_delete_scopes(spark, tmp_path):
    """A delete file stored under the PARTITIONED spec with real
    partition values (the form Flink/Java writers emit for
    partition-local deletes) must apply ONLY to data files in that
    partition: the same key value in another partition survives.
    Hand-built manifest so the reader is pinned to foreign files,
    not to our own writer."""
    import pyarrow as pa
    import pyarrow.parquet as papq

    from archetype_spark.sources import avro_io
    from archetype_spark.sources.iceberg import (
        _BLOCK_SIZE,
        _commit_row_delta_snapshot,
        _manifest_schema,
        _meta_dir,
        _part_types,
        _spec_fields,
    )

    t = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, "us"), (1, "jp"), (2, "us"), (2, "jp")],
        "id long, country string",
    )
    write_iceberg(df.repartition("country"), t, partition_by=["country"])
    table = os.path.abspath(t)
    meta = _load_metadata(table)
    if int(meta.get("format-version", 1)) == 1:
        meta["format-version"] = 2
        meta.setdefault("last-sequence-number", 0)
    spec_fields = _spec_fields(meta)
    part_cols = [f["name"] for f in spec_fields]
    seq = int(meta.get("last-sequence-number", 0)) + 1
    snapshot_id = max(s["snapshot-id"] for s in meta["snapshots"]) + 1
    name = "delete-scoped-us.parquet"
    dpath = os.path.join(table, "data", name)
    papq.write_table(pa.table({"id": pa.array([1], pa.int64())}), dpath)
    entry = {
        "status": 1,
        "snapshot_id": snapshot_id,
        "sequence_number": seq,
        "file_sequence_number": seq,
        "data_file": {
            "content": 2,
            "file_path": f"data/{name}",
            "file_format": "PARQUET",
            "partition": {"country": "us"},  # scoped, not global
            "record_count": 1,
            "file_size_in_bytes": os.path.getsize(dpath),
            "block_size_in_bytes": _BLOCK_SIZE,
            "equality_ids": [1],  # id is field 1
        },
    }
    man_name = "manifest-scoped-delete.avro"
    man_path = os.path.join(_meta_dir(table), man_name)
    avro_io.write_container(
        man_path,
        _manifest_schema(part_cols, _part_types(spec_fields), 2),
        [entry],
    )
    snaps = {s["snapshot-id"]: s for s in meta["snapshots"]}
    _commit_row_delta_snapshot(
        table,
        meta,
        snaps[meta["current-snapshot-id"]],
        [
            {
                "manifest_path": f"metadata/{man_name}",
                "manifest_length": os.path.getsize(man_path),
                "partition_spec_id": 0,  # the PARTITIONED spec
                "added_snapshot_id": snapshot_id,
                "added_data_files_count": 1,
                "existing_data_files_count": 0,
                "deleted_data_files_count": 0,
                "added_rows_count": 1,
                "existing_rows_count": 0,
                "deleted_rows_count": 0,
                "content": 1,
                "sequence_number": seq,
                "min_sequence_number": seq,
            }
        ],
        seq,
        snapshot_id,
        "delete",
    )
    got = sorted(tuple(r) for r in read_iceberg(spark, t).collect())
    assert got == [(1, "jp"), (2, "jp"), (2, "us")]  # (1,'us') only
    meta2 = _load_metadata(table)
    _d, _pos, eq = _live_entries(table, meta2["snapshots"][-1], meta2)
    assert eq and eq[0][4] == {"country": "us"}


def test_mixed_position_and_equality_deletes(spark, tmp_path, people):
    t = str(tmp_path / "t")
    write_iceberg(people, t)
    delete_where_iceberg(spark, t, "id = 4")  # position, seq 1
    delete_by_key_iceberg(spark, t, _keys(spark, 1))  # equality, seq 2
    assert _ids(spark, t) == [2, 3]
    # position-delete writer re-scans through the equality-filtered
    # view: deleting country='us' now only matches id=2 (1 is gone)
    out = delete_where_iceberg(spark, t, "country = 'us'")
    assert out["rows_deleted"] == 1
    assert _ids(spark, t) == [3]


def test_compaction_materializes_and_count_refusals(spark, tmp_path, people):
    t = str(tmp_path / "t")
    write_iceberg(people, t)
    first = snapshots_iceberg(t)[0]["snapshot-id"]
    delete_by_key_iceberg(spark, t, _keys(spark, 2))
    with pytest.raises(ValueError, match="metadata-only COUNT"):
        count_rows_iceberg(t)
    with pytest.raises(NotImplementedError, match="delete file"):
        read_iceberg_changes(spark, t, first).count()
    compact_iceberg(spark, t, target_files=1)
    _d, pos, eq = _live_entries(
        os.path.abspath(t), _load_metadata(t)["snapshots"][-1]
    )
    assert pos == [] and eq == []
    assert count_rows_iceberg(t) == 3
    assert _ids(spark, t) == [1, 3, 4]


def test_equality_changelog_via_prior_snapshot(spark, tmp_path, people):
    """The opt-in equality changelog: delete-by-key and upsert
    snapshots emit the exact rows they killed by key-joining the
    PRIOR snapshot — the upsert's delete row carries the pre-upsert
    values; a key with no prior row (a pure insert) emits no delete.
    Without the flag the loud refusal stands."""
    t = str(tmp_path / "t")
    write_iceberg(people, t)
    delete_by_key_iceberg(spark, t, _keys(spark, 2))
    ups = spark.createDataFrame(
        [(3, "CHO", "jp"), (9, "new", "us")],
        "id long, name string, country string",
    ).coalesce(1)
    upsert_by_key_iceberg(spark, t, ups, ["id"])
    first = snapshots_iceberg(t)[0]["snapshot-id"]
    with pytest.raises(NotImplementedError, match="equality_via_prior"):
        read_iceberg_changes(spark, t, first, include_deletes=True).count()
    ch = read_iceberg_changes(
        spark,
        t,
        first,
        include_deletes=True,
        equality_via_prior_snapshot=True,
    )
    got = sorted(
        (r["_snapshot_id"], r["_change_type"], r["id"], r["name"])
        for r in ch.collect()
    )
    assert got == [
        (1, "insert", 1, "ann"),
        (1, "insert", 2, "bob"),
        (1, "insert", 3, "cho"),
        (1, "insert", 4, "dee"),
        (2, "delete", 2, "bob"),
        (3, "delete", 3, "cho"),  # pre-upsert image; no row for key 9
        (3, "insert", 3, "CHO"),
        (3, "insert", 9, "new"),
    ]
    # replaying the changelog latest-wins reproduces the live table
    assert _ids(spark, t) == [1, 3, 4, 9]


def test_delete_by_key_validation_and_noop(spark, tmp_path, people):
    t = str(tmp_path / "t")
    write_iceberg(people, t)
    with pytest.raises(ValueError, match="not in table schema"):
        delete_by_key_iceberg(
            spark, t, spark.createDataFrame([(1,)], "nope long")
        )
    with pytest.raises(ValueError, match="absent from the updates"):
        upsert_by_key_iceberg(spark, t, people, ["missing"])
    # an empty key frame commits nothing
    empty = spark.createDataFrame([], "id long")
    out = delete_by_key_iceberg(spark, t, empty)
    assert out == {"delete_files": 0, "delete_keys": 0}
    assert len(snapshots_iceberg(t)) == 1
    # duplicate keys collapse to one delete row
    out = delete_by_key_iceberg(
        spark, t, spark.createDataFrame([(1,), (1,), (1,)], "id long")
    )
    assert out["delete_keys"] == 1
    assert _ids(spark, t) == [2, 3, 4]


def test_key_type_coercion_matches_table_types(spark, tmp_path, people):
    """Keys arrive as int (not long): cast to the table's column type
    before writing, else the value anti-join silently misses."""
    t = str(tmp_path / "t")
    write_iceberg(people, t)
    keys = spark.createDataFrame([(1,)], "id int")
    delete_by_key_iceberg(spark, t, keys)
    assert _ids(spark, t) == [2, 3, 4]


def test_foreign_global_equality_delete_under_registered_spec(
    spark, tmp_path
):
    """The OTHER scoping direction, foreign-built: an equality delete
    stored under a REGISTERED UNPARTITIONED spec (stamped spec-id,
    empty fields — the table-global form conforming engines emit)
    must apply to the key in EVERY partition; and strict sequence
    scoping must keep it from over-deleting — the same key value
    re-appended AFTER the delete (higher sequence) survives."""
    import pyarrow as pa
    import pyarrow.parquet as papq

    from archetype_spark.sources import avro_io
    from archetype_spark.sources.iceberg import (
        _BLOCK_SIZE,
        _commit_row_delta_snapshot,
        _manifest_schema,
        _meta_dir,
    )

    t = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, "us"), (1, "jp"), (2, "us"), (2, "jp")],
        "id long, country string",
    )
    write_iceberg(df.repartition("country"), t, partition_by=["country"])
    table = os.path.abspath(t)
    meta = _load_metadata(table)
    if int(meta.get("format-version", 1)) == 1:
        meta["format-version"] = 2
        meta.setdefault("last-sequence-number", 0)
    # a foreign engine registers its own unpartitioned spec id
    specs = list(meta.get("partition-specs") or [])
    foreign_spec = max((int(s["spec-id"]) for s in specs), default=-1) + 7
    specs.append({"spec-id": foreign_spec, "fields": []})
    meta["partition-specs"] = specs
    seq = int(meta.get("last-sequence-number", 0)) + 1
    snapshot_id = max(s["snapshot-id"] for s in meta["snapshots"]) + 1
    name = "delete-global.parquet"
    dpath = os.path.join(table, "data", name)
    papq.write_table(pa.table({"id": pa.array([1], pa.int64())}), dpath)
    entry = {
        "status": 1,
        "snapshot_id": snapshot_id,
        "sequence_number": seq,
        "file_sequence_number": seq,
        "data_file": {
            "content": 2,
            "file_path": f"data/{name}",
            "file_format": "PARQUET",
            "partition": {},  # table-global under the empty spec
            "record_count": 1,
            "file_size_in_bytes": os.path.getsize(dpath),
            "block_size_in_bytes": _BLOCK_SIZE,
            "equality_ids": [1],
        },
    }
    man_name = "manifest-global-delete.avro"
    man_path = os.path.join(_meta_dir(table), man_name)
    avro_io.write_container(man_path, _manifest_schema([], {}, 2), [entry])
    snaps = {s["snapshot-id"]: s for s in meta["snapshots"]}
    _commit_row_delta_snapshot(
        table,
        meta,
        snaps[meta["current-snapshot-id"]],
        [
            {
                "manifest_path": f"metadata/{man_name}",
                "manifest_length": os.path.getsize(man_path),
                "partition_spec_id": foreign_spec,  # stamped, not 0
                "added_snapshot_id": snapshot_id,
                "added_data_files_count": 1,
                "existing_data_files_count": 0,
                "deleted_data_files_count": 0,
                "added_rows_count": 1,
                "existing_rows_count": 0,
                "deleted_rows_count": 0,
                "content": 1,
                "sequence_number": seq,
                "min_sequence_number": seq,
            }
        ],
        seq,
        snapshot_id,
        "delete",
    )
    # global: key 1 dies in BOTH partitions
    got = sorted(tuple(r) for r in read_iceberg(spark, t).collect())
    assert got == [(2, "jp"), (2, "us")]
    # the delete resolved with NO partition scope
    meta2 = _load_metadata(table)
    _d, _pos, eq = _live_entries(table, meta2["snapshots"][-1], meta2)
    assert eq and eq[0][4] is None
    # no over-delete: the same key re-appended at a HIGHER sequence
    # escapes the delete's scope (strict sequence rule)
    write_iceberg(
        spark.createDataFrame([(1, "de")], "id long, country string"),
        t,
        mode="append",
    )
    got = sorted(tuple(r) for r in read_iceberg(spark, t).collect())
    assert got == [(1, "de"), (2, "jp"), (2, "us")]
