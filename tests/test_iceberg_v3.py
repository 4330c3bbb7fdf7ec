"""Iceberg format-version 3 (sources/iceberg.py + sources/puffin.py):
upgrade path, puffin DELETION VECTORS (write on the positional faces,
read via driver-side blob decode, the one-live-DV-per-file replace
rule, v2 position-delete merge-on-upgrade), minimal row lineage
(first_row_id / next-row-id / snapshot first-row-id), the
include_deletes changelog over DV commits, and the loud refusals
(field defaults, duplicate live DVs, compressed puffin footers).

Layout per the public Iceberg v3 table spec ("Position Delete
Vectors", "Row Lineage") and the Puffin spec."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from archetype_spark.sources import puffin
from archetype_spark.sources.iceberg import (
    _live_entries,
    _load_metadata,
    delete_where_iceberg,
    read_iceberg,
    read_iceberg_changes,
    update_where_iceberg,
    upgrade_iceberg,
    upsert_by_key_iceberg,
    write_iceberg,
)


def _v3_table(spark, tmp_path, partitioned=False, one_file=False):
    t = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, "x" if i % 2 else "y", i * 10) for i in range(1, 9)],
        "id long, p string, v long",
    )
    if one_file:
        df = df.coalesce(1)
    write_iceberg(df, t, partition_by=["p"] if partitioned else None)
    upgrade_iceberg(t, 3)
    return t


def _ids(spark, t, **kw):
    return sorted(r.id for r in read_iceberg(spark, t, **kw).collect())


def _data_files(t):
    return {
        n for n in os.listdir(os.path.join(t, "data")) if not n.startswith(".")
    }


def test_upgrade_and_dv_delete(spark, tmp_path):
    """delete_where on a v3 table writes a puffin DV (no new parquet
    delete files), the snapshot reads exactly, and pre-delete time
    travel still sees every row."""
    t = _v3_table(spark, tmp_path)
    assert int(_load_metadata(t)["format-version"]) == 3
    before = _data_files(t)
    out = delete_where_iceberg(spark, t, F.col("id").isin(2, 5))
    assert out["rows_deleted"] == 2
    assert _ids(spark, t) == [1, 3, 4, 6, 7, 8]
    added = _data_files(t) - before
    assert added and all(n.endswith(".puffin") for n in added)
    meta = _load_metadata(t)
    snaps = sorted(s["snapshot-id"] for s in meta["snapshots"])
    assert _ids(spark, t, snapshot_id=snaps[0]) == list(range(1, 9))
    # the DV blob itself is spec-framed (magic + CRC verified decode)
    ppath = os.path.join(t, "data", next(iter(added)))
    ft = puffin.read_footer(ppath)
    b = ft["blobs"][0]
    assert b["type"] == "deletion-vector-v1"
    assert "referenced-data-file" in (b.get("properties") or {})
    positions = puffin.dv_positions(
        puffin.read_blob(ppath, b["offset"], b["length"])
    )
    assert len(positions) >= 1


def test_dv_replace_rule_merges(spark, tmp_path):
    """A second positional delete on the same file MERGES the prior
    DV and supersedes it: at most one live DV per data file, and both
    delete sets apply."""
    t = _v3_table(spark, tmp_path, one_file=True)
    delete_where_iceberg(spark, t, F.col("id") == 2)
    delete_where_iceberg(spark, t, F.col("id") == 4)
    assert _ids(spark, t) == [1, 3, 5, 6, 7, 8]
    meta = _load_metadata(t)
    snap = {s["snapshot-id"]: s for s in meta["snapshots"]}[
        meta["current-snapshot-id"]
    ]
    _data, deletes, _eq = _live_entries(t, snap, meta)
    dvs = [d for d in deletes if d[2] is not None]
    assert len(dvs) == 1  # the second DV superseded the first
    positions = puffin.dv_positions(
        puffin.read_blob(dvs[0][0], dvs[0][2]["offset"], dvs[0][2]["size"])
    )
    assert len(positions) == 2  # merged: both masked rows


def test_update_where_v3_and_row_lineage(spark, tmp_path):
    """update_where on v3: matched rows mask via DV, replacement rows
    land as new data files carrying first_row_id; next-row-id
    advances and the snapshot records its first-row-id."""
    t = _v3_table(spark, tmp_path)
    n0 = int(_load_metadata(t).get("next-row-id", 0))
    update_where_iceberg(spark, t, F.col("id") >= 7, {"v": "v + 1"})
    got = {
        r.id: r.v for r in read_iceberg(spark, t).collect()
    }
    assert got[7] == 71 and got[8] == 81 and got[1] == 10
    meta = _load_metadata(t)
    assert int(meta["next-row-id"]) == n0 + 2  # two replacement rows
    snap = {s["snapshot-id"]: s for s in meta["snapshots"]}[
        meta["current-snapshot-id"]
    ]
    assert snap.get("first-row-id") == n0
    data, _d, _e = _live_entries(t, snap, meta)
    # appends after the upgrade carry first_row_id in their manifests
    import archetype_spark.sources.avro_io as avro_io

    found = []
    from archetype_spark.sources.iceberg import _abs

    _s, manifests = avro_io.read_container(_abs(t, snap["manifest-list"]))
    for m in manifests:
        _ms, rows = avro_io.read_container(_abs(t, m["manifest_path"]))
        for r in rows:
            if (
                int(r["data_file"].get("content") or 0) == 0
                and r["data_file"].get("first_row_id") is not None
            ):
                found.append(int(r["data_file"]["first_row_id"]))
    assert n0 in found


def test_v2_position_deletes_fold_into_dv(spark, tmp_path):
    """An upgraded table's legacy parquet position deletes merge into
    any NEW DV written for the same data file — readers that ignore
    position deletes once a DV exists (the v3 rule) still see the
    full mask."""
    t = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, i * 10) for i in range(1, 9)], "id long, v long"
    )
    write_iceberg(df.coalesce(1), t)  # one data file: same-file merge
    delete_where_iceberg(spark, t, F.col("id") == 3)  # v2 parquet
    upgrade_iceberg(t, 3)
    delete_where_iceberg(spark, t, F.col("id") == 6)  # v3 DV
    assert _ids(spark, t) == [1, 2, 4, 5, 7, 8]
    meta = _load_metadata(t)
    snap = {s["snapshot-id"]: s for s in meta["snapshots"]}[
        meta["current-snapshot-id"]
    ]
    _data, deletes, _eq = _live_entries(t, snap, meta)
    dv = next(d for d in deletes if d[2] is not None)
    positions = puffin.dv_positions(
        puffin.read_blob(dv[0], dv[2]["offset"], dv[2]["size"])
    )
    assert len(positions) == 2  # id=3's position folded in


def test_equality_faces_on_v3(spark, tmp_path):
    """The equality-delete upsert face keeps working on v3 (equality
    deletes stay legal); row lineage advances for its inserts."""
    t = _v3_table(spark, tmp_path)
    n0 = int(_load_metadata(t).get("next-row-id", 0))
    upsert_by_key_iceberg(
        spark,
        t,
        spark.createDataFrame(
            [(2, "x", 999), (99, "y", 990)], "id long, p string, v long"
        ),
        ["id"],
    )
    got = {r.id: r.v for r in read_iceberg(spark, t).collect()}
    assert got[2] == 999 and got[99] == 990 and len(got) == 9
    assert int(_load_metadata(t)["next-row-id"]) == n0 + 2


def test_changelog_emits_dv_tombstones(spark, tmp_path):
    """read_iceberg_changes(include_deletes=True) recovers the exact
    rows a DV commit killed, tagged delete."""
    t = _v3_table(spark, tmp_path)
    meta0 = _load_metadata(t)
    first = meta0["current-snapshot-id"]
    delete_where_iceberg(spark, t, F.col("id").isin(1, 8))
    ch = read_iceberg_changes(
        spark, t, from_snapshot=first + 1, include_deletes=True
    )
    rows = [(r.id, r._change_type) for r in ch.collect()]
    assert sorted(rows) == [(1, "delete"), (8, "delete")]


def test_changelog_dv_supersede_emits_delta(spark, tmp_path):
    """A superseding DV MERGES its predecessor's positions on write
    (_build_dv_commit), so the blob alone re-reports earlier
    snapshots' deletes; the changelog must emit only the DELTA — the
    re-reported stale delete would otherwise outrank a genuine
    re-insert of the same key in the latest-wins replication cut."""
    t = _v3_table(spark, tmp_path, one_file=True)
    delete_where_iceberg(spark, t, F.col("id") == 3)  # DV{A: pos(3)}
    snap_d3 = _load_metadata(t)["current-snapshot-id"]
    write_iceberg(
        spark.createDataFrame(
            [(3, "x", 333)], "id long, p string, v long"
        ).coalesce(1),
        t,
    )  # genuine re-insert of id=3
    delete_where_iceberg(spark, t, F.col("id") == 6)  # supersede: DV{A: 3,6}
    snap_d6 = _load_metadata(t)["current-snapshot-id"]
    ch = read_iceberg_changes(
        spark, t, from_snapshot=snap_d3, include_deletes=True
    )
    dels = sorted(
        (r.id, r._snapshot_id)
        for r in ch.filter(F.col("_change_type") == "delete").collect()
    )
    assert dels == [(3, snap_d3), (6, snap_d6)]  # 3 NOT re-reported
    ins = [
        (r.id, r.v)
        for r in ch.filter(F.col("_change_type") == "insert").collect()
    ]
    assert ins == [(3, 333)]


def test_changelog_dv_excludes_folded_v2_rows(spark, tmp_path):
    """The upgrade-merge rule folds legacy v2 position-delete rows
    into the first v3 DV; the changelog subtracts them the same way
    it subtracts a superseded DV's mask."""
    t = str(tmp_path / "t")
    write_iceberg(
        spark.createDataFrame(
            [(i, "x" if i % 2 else "y", i * 10) for i in range(1, 9)],
            "id long, p string, v long",
        ).coalesce(1),
        t,
    )
    delete_where_iceberg(spark, t, F.col("id") == 3)  # v2 parquet rows
    upgrade_iceberg(t, 3)
    delete_where_iceberg(spark, t, F.col("id") == 6)  # DV folds pos(3)
    snap_d6 = _load_metadata(t)["current-snapshot-id"]
    ch = read_iceberg_changes(
        spark, t, from_snapshot=snap_d6, include_deletes=True
    )
    rows = [(r.id, r._change_type) for r in ch.collect()]
    assert rows == [(6, "delete")]  # the folded id=3 row stays silent


def _edit_meta(t, fn):
    import json

    from archetype_spark.sources.iceberg import (
        _current_metadata_version,
        _meta_dir,
    )

    v = _current_metadata_version(t)
    mp = os.path.join(_meta_dir(t), f"v{v}.metadata.json")
    with open(mp) as fh:
        meta = json.load(fh)
    fn(meta)
    with open(mp, "w") as fh:
        json.dump(meta, fh)


def test_v3_top_level_default_reads(spark, tmp_path):
    """A foreign-shaped v3 schema whose existing field carries
    initial-default: files that CARRY the column keep their values;
    the default only fills files that physically lack it — here none,
    so values are untouched and the load no longer refuses (r15)."""
    t = _v3_table(spark, tmp_path)

    def stamp(meta):
        for s in meta.get("schemas") or []:
            s["fields"][-1]["initial-default"] = 42

    _edit_meta(t, stamp)
    got = {r.id: r.v for r in read_iceberg(spark, t).collect()}
    assert got == {i: i * 10 for i in range(1, 9)}  # no 42 leaked


def test_v3_nested_defaults_refuse(spark, tmp_path):
    """Defaults this reader cannot APPLY refuse by name at metadata
    load: a struct-nested field, and — the r14 advisor's gap — one
    nested inside a LIST element struct (the old walk recursed only
    into struct-typed fields and would have read it silently null)."""
    t1 = _v3_table(spark, tmp_path / "a")

    def nest_struct(meta):
        for s in meta.get("schemas") or []:
            s["fields"].append(
                {
                    "id": 99,
                    "name": "obj",
                    "required": False,
                    "type": {
                        "type": "struct",
                        "fields": [
                            {
                                "id": 100,
                                "name": "inner",
                                "required": False,
                                "type": "long",
                                "initial-default": 7,
                            }
                        ],
                    },
                }
            )

    _edit_meta(t1, nest_struct)
    with pytest.raises(NotImplementedError, match="nested"):
        read_iceberg(spark, t1)

    t2 = _v3_table(spark, tmp_path / "b")

    def nest_list(meta):
        for s in meta.get("schemas") or []:
            s["fields"].append(
                {
                    "id": 99,
                    "name": "items",
                    "required": False,
                    "type": {
                        "type": "list",
                        "element-id": 100,
                        "element-required": False,
                        "element": {
                            "type": "struct",
                            "fields": [
                                {
                                    "id": 101,
                                    "name": "inner",
                                    "required": False,
                                    "type": "long",
                                    "write-default": 7,
                                }
                            ],
                        },
                    },
                }
            )

    _edit_meta(t2, nest_list)
    with pytest.raises(NotImplementedError, match="nested"):
        read_iceberg(spark, t2)


def test_add_column_with_default_cohorts(spark, tmp_path):
    """add_column_iceberg(default=...) on a v3 table: pre-evolution
    files read the constant, post-evolution appends keep real values
    INCLUDING genuine nulls, time travel composes, and the changelog
    emits the default for pre-evolution rows."""
    from archetype_spark.sources.iceberg import add_column_iceberg

    t = _v3_table(spark, tmp_path, one_file=True)
    meta0 = _load_metadata(t)
    snap0 = meta0["current-snapshot-id"]
    add_column_iceberg(t, "score", "long", default=7)
    got = {r.id: r.score for r in read_iceberg(spark, t).collect()}
    assert got == {i: 7 for i in range(1, 9)}  # whole old cohort
    write_iceberg(
        spark.createDataFrame(
            [(20, "x", 200, 5), (21, "y", 210, None)],
            "id long, p string, v long, score long",
        ).coalesce(1),
        t,
    )
    got = {r.id: r.score for r in read_iceberg(spark, t).collect()}
    assert got[20] == 5 and got[21] is None  # genuine null survives
    assert all(got[i] == 7 for i in range(1, 9))
    # deletes compose with the default fill
    delete_where_iceberg(spark, t, F.col("id") == 3)
    got = {r.id: r.score for r in read_iceberg(spark, t).collect()}
    assert 3 not in got and got[4] == 7 and got[20] == 5
    # time travel to the pre-evolution snapshot: current schema, old
    # files — the default fills there too
    tt = {r.id: r.score for r in read_iceberg(spark, t, snapshot_id=snap0).collect()}
    assert tt == {i: 7 for i in range(1, 9)}
    # changelog: pre-evolution inserts read the default, new real rows
    ch = read_iceberg_changes(spark, t, from_snapshot=snap0, include_deletes=True)
    by_id = {
        (r.id, r._change_type): r.score for r in ch.collect()
    }
    assert by_id[(1, "insert")] == 7 and by_id[(20, "insert")] == 5
    assert by_id[(21, "insert")] is None
    assert by_id[(3, "delete")] == 7  # tombstone row reads default too


def test_duplicate_live_dvs_refuse(spark, tmp_path):
    """Two live DVs referencing one data file violate the spec's
    replace rule — the reader refuses rather than guessing."""
    import json

    t = _v3_table(spark, tmp_path)
    delete_where_iceberg(spark, t, F.col("id") == 2)
    # clone the DV manifest entry under a second manifest: hand-build
    # the foreign corruption
    from archetype_spark.sources import avro_io
    from archetype_spark.sources.iceberg import (
        _abs,
        _current_metadata_version,
        _meta_dir,
    )

    meta = _load_metadata(t)
    snap = {s["snapshot-id"]: s for s in meta["snapshots"]}[
        meta["current-snapshot-id"]
    ]
    _s, manifests = avro_io.read_container(_abs(t, snap["manifest-list"]))
    dvm = next(m for m in manifests if int(m.get("content") or 0) == 1)
    ms, rows = avro_io.read_container(_abs(t, dvm["manifest_path"]))
    dup_name = "manifest-dup.avro"
    avro_io.write_container(
        os.path.join(_meta_dir(t), dup_name), ms, rows
    )
    import copy

    dup = copy.deepcopy(dvm)
    dup["manifest_path"] = f"metadata/{dup_name}"
    mlist = _abs(t, snap["manifest-list"])
    ls, lrows = avro_io.read_container(mlist)
    avro_io.write_container(mlist, ls, lrows + [dup])
    with pytest.raises(ValueError, match="two live deletion vectors"):
        read_iceberg(spark, t).collect()


def test_partitioned_v3_dv_delete(spark, tmp_path):
    """DVs over a partitioned table: masks land per data file across
    partitions, manifest pruning still works after."""
    t = _v3_table(spark, tmp_path, partitioned=True)
    delete_where_iceberg(spark, t, F.col("v") >= 60)
    assert _ids(spark, t) == [1, 2, 3, 4, 5]
    got = read_iceberg(spark, t, scan_filter={"p": "x"}).collect()
    assert sorted(r.id for r in got) == [1, 3, 5]


def test_expire_vacuum_reclaims_superseded_dvs(spark, tmp_path):
    """After snapshot expiry, vacuum removes puffin files only a
    superseded DV (status=2 carry entry) or an expired snapshot
    references — retained reads stay exact, orphans are gone."""
    from archetype_spark.sources.iceberg import (
        expire_snapshots_iceberg,
        vacuum_iceberg,
    )

    t = _v3_table(spark, tmp_path, one_file=True)
    delete_where_iceberg(spark, t, F.col("id") == 2)
    delete_where_iceberg(spark, t, F.col("id") == 4)  # supersedes
    puffins_before = {n for n in _data_files(t) if n.endswith(".puffin")}
    assert len(puffins_before) == 2
    expire_snapshots_iceberg(t, keep_last=1)
    out = vacuum_iceberg(t)
    assert out["data_files"] >= 1  # the superseded DV reclaimed
    puffins_after = {n for n in _data_files(t) if n.endswith(".puffin")}
    assert len(puffins_after) == 1
    assert _ids(spark, t) == [1, 3, 5, 6, 7, 8]


def test_row_lineage_read_surface(spark, tmp_path):
    """read_iceberg(with_row_lineage=True): pre-upgrade rows carry
    NULL _row_id (lazy assignment), post-upgrade appends get
    first_row_id + position, DV deletes never shift surviving ids,
    and rewrite replacements get FRESH ids; non-null ids are unique.
    Below v3 the flag refuses."""
    t = _v3_table(spark, tmp_path, one_file=True)
    n0 = int(_load_metadata(t).get("next-row-id", 0))
    write_iceberg(
        spark.createDataFrame(
            [(100, "x", 1000), (101, "y", 1010)], "id long, p string, v long"
        ).coalesce(1),
        t,
        mode="append",
    )
    rows = {
        r.id: r._row_id
        for r in read_iceberg(spark, t, with_row_lineage=True).collect()
    }
    assert all(rows[i] is None for i in range(1, 9))  # pre-upgrade
    assert sorted(rows[i] for i in (100, 101)) == [n0, n0 + 1]
    # a DV delete shifts nothing
    delete_where_iceberg(spark, t, F.col("id") == 100)
    rows2 = {
        r.id: r._row_id
        for r in read_iceberg(spark, t, with_row_lineage=True).collect()
    }
    assert 100 not in rows2 and rows2[101] == rows[101]
    # a rewrite replacement gets a FRESH id
    update_where_iceberg(spark, t, F.col("id") == 101, {"v": "v + 1"})
    rows3 = {
        r.id: r._row_id
        for r in read_iceberg(spark, t, with_row_lineage=True).collect()
    }
    assert rows3[101] is not None and rows3[101] > rows[101]
    nonnull = [v for v in rows3.values() if v is not None]
    assert len(nonnull) == len(set(nonnull))
    # below v3 the flag refuses
    t2 = str(tmp_path / "v2t")
    write_iceberg(
        spark.createDataFrame([(1, "a", 1)], "id long, p string, v long"), t2
    )
    with pytest.raises(ValueError, match="format-version 3"):
        read_iceberg(spark, t2, with_row_lineage=True)
