"""Iceberg format-v2 position deletes (sources/iceberg.py):
delete_where semantics, v1->v2 upgrade, sequence-number scoping
(appends after a delete are untouched), time travel, compaction
materialization, equality-delete refusal, and the loud metadata-COUNT
/ incremental-read refusals. The Iceberg twin of
tests/test_deletion_vectors.py."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from archetype_spark.sources import (
    compact_iceberg,
    count_rows_iceberg,
    delete_where_iceberg,
    read_iceberg,
    read_iceberg_changes,
    snapshots_iceberg,
    vacuum_iceberg,
    write_iceberg,
)
from archetype_spark.sources import avro_io
from archetype_spark.sources.iceberg import (
    _abs,
    _live_entries,
    _load_metadata,
)


@pytest.fixture()
def people(spark):
    """One data file (coalesce(1)) so row-level deletes target
    positions inside a multi-row file."""
    return spark.createDataFrame(
        [(1, "ann", "us"), (2, "bob", "us"), (3, "cho", "jp"), (4, "dee", "jp")],
        "id long, name string, country string",
    ).coalesce(1)


def _ids(spark, t, snapshot_id=None):
    return sorted(
        r["id"] for r in read_iceberg(spark, t, snapshot_id).collect()
    )


def test_delete_where_basic_upgrade_and_idempotent(spark, tmp_path, people):
    t = str(tmp_path / "t")
    write_iceberg(people, t)
    assert int(_load_metadata(t).get("format-version", 1)) == 1
    out = delete_where_iceberg(spark, t, "country = 'us'")
    assert out["rows_deleted"] == 2 and out["delete_files"] == 1
    meta = _load_metadata(t)
    assert int(meta["format-version"]) == 2
    assert int(meta["last-sequence-number"]) == 1
    assert _ids(spark, t) == [3, 4]
    # time travel to the pre-delete snapshot: full set
    first = snapshots_iceberg(t)[0]["snapshot-id"]
    assert _ids(spark, t, first) == [1, 2, 3, 4]
    # repeat: already-deleted rows never re-match
    again = delete_where_iceberg(spark, t, "country = 'us'")
    assert again == {"rows_deleted": 0, "delete_files": 0}
    # second delete lands a second delete file over the same data file
    out2 = delete_where_iceberg(spark, t, "id = 3")
    assert out2["rows_deleted"] == 1
    assert _ids(spark, t) == [4]


def test_sequence_scoping_appends_after_delete_untouched(
    spark, tmp_path, people
):
    """The v2 rule the implementation must get right: a delete with
    sequence number N applies only to data files with sequence <= N.
    Rows appended AFTER the delete that MATCH its predicate must
    survive."""
    t = str(tmp_path / "t")
    write_iceberg(people, t)
    delete_where_iceberg(spark, t, "country = 'us'")
    late = spark.createDataFrame(
        [(5, "eve", "us")], "id long, name string, country string"
    ).coalesce(1)
    write_iceberg(late, t, mode="append")
    # id 5 is country='us' — matched by the OLD delete's predicate,
    # but its file has a higher sequence number: it must be visible
    assert _ids(spark, t) == [3, 4, 5]
    # and a NEW delete reaches it
    out = delete_where_iceberg(spark, t, "country = 'us'")
    assert out["rows_deleted"] == 1
    assert _ids(spark, t) == [3, 4]


def test_partitioned_delete_files_are_partition_scoped(
    spark, tmp_path, people
):
    t = str(tmp_path / "t")
    write_iceberg(
        people.repartition("country"), t, partition_by=["country"]
    )
    out = delete_where_iceberg(spark, t, "id IN (1, 3)")
    # one delete parquet per affected partition (us and jp)
    assert out == {"rows_deleted": 2, "delete_files": 2}
    assert _ids(spark, t) == [2, 4]
    meta = _load_metadata(t)
    snap = meta["snapshots"][-1]
    _data, dels, _eq = _live_entries(os.path.abspath(t), snap)
    assert len(dels) == 2
    # the delete manifest records typed partition values per file
    _s, manifests = avro_io.read_container(
        _abs(os.path.abspath(t), snap["manifest-list"])
    )
    del_manifests = [m for m in manifests if (m.get("content") or 0) == 1]
    assert len(del_manifests) == 1
    _ms, rows = avro_io.read_container(
        _abs(os.path.abspath(t), del_manifests[0]["manifest_path"])
    )
    parts = sorted(r["data_file"]["partition"]["country"] for r in rows)
    assert parts == ["jp", "us"]


def test_wide_positional_mask_executor_path(spark, tmp_path, monkeypatch):
    """Past POS_DELETE_DRIVER_COLLECT_MAX the workers write one
    position-delete file per masked DATA file and the driver handles
    O(files) manifest rows, never the position set. Semantics match
    the driver path: partition-scoped entries, sequence scoping, and
    UPDATE staging."""
    from archetype_spark.sources import iceberg as ice_mod
    from archetype_spark.sources import update_where_iceberg

    df = spark.createDataFrame(
        [(1, "ann", "us"), (2, "bob", "us"), (3, "cho", "jp"), (4, "dee", "jp")],
        "id long, name string, country string",
    ).repartition("country")
    t = str(tmp_path / "t")
    write_iceberg(df, t, partition_by=["country"])
    monkeypatch.setattr(ice_mod, "POS_DELETE_DRIVER_COLLECT_MAX", 0)
    out = delete_where_iceberg(spark, t, "id IN (1, 3)")
    assert ice_mod._LAST_MASK_PATH == "executor"
    assert out["rows_deleted"] == 2
    assert out["delete_files"] == 2  # one per masked data file
    assert _ids(spark, t) == [2, 4]
    # entries carry their data file's partition (scoped, per spec)
    meta = _load_metadata(t)
    snap = meta["snapshots"][-1]
    _d, pos, _eq = _live_entries(os.path.abspath(t), snap, meta)
    assert len(pos) == 2
    # appends after the delete escape its sequence scope
    write_iceberg(
        spark.createDataFrame(
            [(1, "ann2", "us")], "id long, name string, country string"
        ).coalesce(1),
        t,
        mode="append",
        partition_by=["country"],
    )
    assert _ids(spark, t) == [1, 2, 4]
    # a wide UPDATE through the same path stages replacements
    out2 = update_where_iceberg(spark, t, "country = 'us'", {"name": "upper(name)"})
    assert ice_mod._LAST_MASK_PATH == "executor"
    assert out2["rows_updated"] == 2  # the two LIVE 'us' rows
    got = sorted((r["id"], r["name"]) for r in read_iceberg(spark, t).collect())
    assert got == [(1, "ANN2"), (2, "BOB"), (4, "dee")]


def test_count_and_changes_refuse_live_deletes(spark, tmp_path, people):
    t = str(tmp_path / "t")
    write_iceberg(people, t)
    assert count_rows_iceberg(t) == 4
    first = snapshots_iceberg(t)[0]["snapshot-id"]
    delete_where_iceberg(spark, t, "id = 1")
    with pytest.raises(ValueError, match="metadata-only COUNT"):
        count_rows_iceberg(t)
    with pytest.raises(NotImplementedError, match="delete file"):
        read_iceberg_changes(spark, t, first).count()
    # the scan itself is the supported way to count
    assert read_iceberg(spark, t).count() == 3


def test_compact_materializes_deletes_and_vacuum_collects(
    spark, tmp_path, people
):
    t = str(tmp_path / "t")
    write_iceberg(people, t)
    delete_where_iceberg(spark, t, "country = 'us'")
    compact_iceberg(spark, t, target_files=1)
    meta = _load_metadata(t)
    _data, dels, _eq = _live_entries(
        os.path.abspath(t), meta["snapshots"][-1]
    )
    assert dels == []
    assert _ids(spark, t) == [3, 4]
    # metadata-only COUNT works again after materialization
    assert count_rows_iceberg(t) == 2
    from archetype_spark.sources import expire_snapshots_iceberg

    expire_snapshots_iceberg(t, keep_last=1)
    deleted = vacuum_iceberg(t)
    assert deleted["data_files"] >= 1  # old data + delete parquet gone
    assert _ids(spark, t) == [3, 4]


def test_update_where_row_delta_one_snapshot(spark, tmp_path, people):
    """UPDATE via the v2 row-delta shape: one snapshot carries BOTH
    the position-delete manifest and the replacement-rows data
    manifest at the same sequence number; unmatched rows untouched,
    pre-update snapshot time-travelable, and a later delete reaches
    the replacement rows (their sequence number is current)."""
    from archetype_spark.sources import update_where_iceberg

    t = str(tmp_path / "t")
    write_iceberg(people, t)
    n_snaps0 = len(snapshots_iceberg(t))
    out = update_where_iceberg(
        spark, t, "country = 'us'", {"name": "upper(name)", "id": "id + 100"}
    )
    assert out["rows_updated"] == 2
    assert out["delete_files"] == 1 and out["files_added"] >= 1
    assert len(snapshots_iceberg(t)) == n_snaps0 + 1  # ONE snapshot
    got = sorted(tuple(r) for r in read_iceberg(spark, t).collect())
    assert got == [
        (3, "cho", "jp"),
        (4, "dee", "jp"),
        (101, "ANN", "us"),
        (102, "BOB", "us"),
    ]
    first = snapshots_iceberg(t)[0]["snapshot-id"]
    assert sorted(
        r["id"] for r in read_iceberg(spark, t, first).collect()
    ) == [1, 2, 3, 4]
    # the replacement rows are deletable by a later statement
    out2 = delete_where_iceberg(spark, t, "id = 101")
    assert out2["rows_deleted"] == 1
    assert _ids(spark, t) == [3, 4, 102]
    with pytest.raises(ValueError, match="unknown column"):
        update_where_iceberg(spark, t, "id = 3", {"nope": "1"})


def test_equality_deletes_without_ids_refused(spark, tmp_path, people):
    """A hand-patched content=2 entry with NO equality_ids must refuse
    loudly — there is nothing to compare on, and skipping the file
    would resurrect rows. (Well-formed equality deletes are applied:
    tests/test_iceberg_equality_deletes.py.)"""
    t = str(tmp_path / "t")
    write_iceberg(people, t)
    delete_where_iceberg(spark, t, "id = 1")
    table = os.path.abspath(t)
    meta = _load_metadata(table)
    snap = meta["snapshots"][-1]
    _s, manifests = avro_io.read_container(_abs(table, snap["manifest-list"]))
    dm = next(m for m in manifests if (m.get("content") or 0) == 1)
    sch, rows = avro_io.read_container(_abs(table, dm["manifest_path"]))
    for r in rows:
        r["data_file"]["content"] = 2
    avro_io.write_container(_abs(table, dm["manifest_path"]), sch, rows)
    with pytest.raises(NotImplementedError, match="equality delete"):
        read_iceberg(spark, t).count()


def test_v4_metadata_refused(tmp_path, spark, people):
    # v3 reads since r14 (tests/test_iceberg_v3.py); unknown future
    # versions keep refusing
    t = str(tmp_path / "t")
    write_iceberg(people, t)
    mfile = os.path.join(t, "metadata", "v1.metadata.json")
    with open(mfile) as fh:
        meta = json.load(fh)
    meta["format-version"] = 4
    with open(mfile, "w") as fh:
        json.dump(meta, fh)
    with pytest.raises(NotImplementedError, match="format-version"):
        read_iceberg(spark, t)


def test_changelog_materializes_position_deletes(spark, tmp_path, people):
    """read_iceberg_changes(include_deletes=True) — the derived
    changelog: inserts from added data files, the EXACT tombstoned
    rows from added position-delete files (O(deleted) — only the
    referenced files scan), and a v2 UPDATE reading as its
    delete+insert pair. Equality-delete snapshots still refuse."""
    from archetype_spark.sources import update_where_iceberg
    from archetype_spark.sources.iceberg import delete_by_key_iceberg

    t = str(tmp_path / "t")
    write_iceberg(people, t)
    delete_where_iceberg(spark, t, "id IN (1, 3)")
    update_where_iceberg(spark, t, "id = 4", {"name": "'X'"})
    snaps = [s["snapshot-id"] for s in snapshots_iceberg(t)]
    ch = read_iceberg_changes(spark, t, snaps[0], include_deletes=True)
    got = sorted(
        (r["_snapshot_id"], r["_change_type"], r["id"], r["name"])
        for r in ch.collect()
    )
    assert got == [
        (1, "insert", 1, "ann"),
        (1, "insert", 2, "bob"),
        (1, "insert", 3, "cho"),
        (1, "insert", 4, "dee"),
        (2, "delete", 1, "ann"),
        (2, "delete", 3, "cho"),
        (3, "delete", 4, "dee"),
        (3, "insert", 4, "X"),
    ]
    # without the flag the delete commit still refuses (back-compat)
    with pytest.raises(NotImplementedError, match="include_deletes"):
        read_iceberg_changes(spark, t, snaps[0]).count()
    # equality-delete snapshots refuse even in changelog form
    delete_by_key_iceberg(
        spark, t, spark.createDataFrame([(2,)], "id long")
    )
    last = snapshots_iceberg(t)[-1]["snapshot-id"]
    with pytest.raises(NotImplementedError, match="EQUALITY"):
        read_iceberg_changes(
            spark, t, last, include_deletes=True
        ).count()
