"""Delta deletion vectors (sources/dv.py + delta.py integration):
codec-level round trips against hand-built spec bytes, DELETE WHERE
semantics, time travel, checkpoint survival, vacuum hygiene, and the
loud incremental-read refusal. The byte-level cases follow the public
delta.io PROTOCOL.md + RoaringFormatSpec layouts so the reader is
pinned to the interoperable format, not to our own writer."""

from __future__ import annotations

import json
import os
import struct

import pytest
from pyspark.sql import functions as F

from archetype_spark.sources import (
    checkpoint_delta,
    compact_delta,
    delete_where_delta,
    read_delta,
    read_delta_changes,
    vacuum_delta,
    write_delta,
)
from archetype_spark.sources import dv
from archetype_spark.sources.delta import _snapshot_actions


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


# ------------------------------------------------------------------ codec
def test_z85_rfc_reference_vector():
    """The ZeroMQ RFC 32 worked example: 0x86 0x4F 0xD2 0x6F 0xB5
    0x59 0xF7 0x5B <-> 'HelloWorld'."""
    raw = bytes([0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B])
    assert dv.z85_encode(raw) == "HelloWorld"
    assert dv.z85_decode("HelloWorld") == raw


def test_roaring64_round_trips_all_container_types():
    cases = [
        [],
        [0],
        [1, 2, 3, 65535, 65536],            # array containers, 2 keys
        list(range(5000)),                  # bitset container (>4096)
        [2**32 + 7, 2**33, 2**33 + 70000],  # multiple high-32 buckets
        [0xFFFFFFFF, 0xFFFFFFFFFF],
    ]
    for vals in cases:
        assert dv.roaring64_deserialize(dv.roaring64_serialize(vals)) == sorted(
            set(vals)
        )


def test_roaring32_run_container_decodes():
    """Hand-built cookie-12346 bytes with one run container [10..20]
    — the layout delta-spark/CRoaring emit for dense runs; our encoder
    never writes it, so this pins the decoder to foreign bytes."""
    r32 = (
        struct.pack("<I", 12346)        # run cookie, (size-1)=0 in high bits
        + bytes([1])                    # run flag bitset: container 0 is run
        + struct.pack("<HH", 0, 10)     # key 0, cardinality-1 = 10
        + struct.pack("<HHH", 1, 10, 10)  # 1 run: start 10, length-1 = 10
    )
    blob = struct.pack("<iq", dv.MAGIC_PORTABLE, 1) + struct.pack("<I", 0) + r32
    assert dv.roaring64_deserialize(blob) == list(range(10, 21))


def test_dv_file_checks_size_and_crc(tmp_path):
    t = str(tmp_path)
    desc = dv.write_descriptor(t, [1, 5, 9])
    assert dv.read_descriptor(t, desc) == [1, 5, 9]
    bad = dict(desc, sizeInBytes=desc["sizeInBytes"] + 1)
    with pytest.raises(ValueError, match="dataSize"):
        dv.read_descriptor(t, bad)
    path = dv.dv_path(t, desc["pathOrInlineDv"])
    blob = bytearray(open(path, "rb").read())
    blob[10] ^= 0xFF
    with open(path, "wb") as fh:
        fh.write(bytes(blob))
    with pytest.raises(ValueError, match="checksum|magic|cookie"):
        dv.read_descriptor(t, desc)


def test_inline_dv_descriptor_applies(spark, tmp_path):
    """A hand-crafted storageType "i" (inline Z85) descriptor written
    straight into the log — the reader path exercised by bytes our
    writer never produces."""
    t = str(tmp_path / "t")
    df = (
        spark.range(10)
        .select(F.col("id").cast("long").alias("id"))
        .coalesce(1)
    )
    write_delta(df, t)
    _meta, active, _ = _snapshot_actions(t)
    (rel,) = active.keys()
    bitmap = dv.roaring64_serialize([0, 3, 7])
    pad = (-len(bitmap)) % 4
    inline = dv.z85_encode(bitmap + b"\0" * pad)
    add = dict(active[rel])
    add["deletionVector"] = {
        "storageType": "i",
        "pathOrInlineDv": inline,
        "sizeInBytes": len(bitmap),
        "cardinality": 3,
    }
    with open(os.path.join(t, "_delta_log", f"{1:020d}.json"), "w") as fh:
        fh.write(
            json.dumps(
                {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                              "readerFeatures": ["deletionVectors"],
                              "writerFeatures": ["deletionVectors"]}}
            )
            + "\n"
        )
        fh.write(json.dumps({"remove": {"path": rel, "dataChange": True}}) + "\n")
        fh.write(json.dumps({"add": add}) + "\n")
    got = sorted(r["id"] for r in read_delta(spark, t).collect())
    assert got == [1, 2, 4, 5, 6, 8, 9]


# --------------------------------------------------------------- DELETE WHERE
@pytest.fixture()
def people(spark):
    """One data FILE (coalesce(1)) so row-level deletes actually
    produce deletion vectors — a 1-row-per-file layout would turn
    every delete into a whole-file remove instead."""
    return spark.createDataFrame(
        [(1, "ann", "us"), (2, "bob", "us"), (3, "cho", "jp"), (4, "dee", "jp")],
        "id long, name string, country string",
    ).coalesce(1)


def test_delete_where_basic_and_idempotent(spark, tmp_path, people):
    t = str(tmp_path / "t")
    write_delta(people, t)
    out = delete_where_delta(spark, t, "country = 'us'")
    assert out["rows_deleted"] == 2
    got = read_delta(spark, t)
    assert sorted(r["id"] for r in got.collect()) == [3, 4]
    # time travel: the pre-delete snapshot still shows every row
    assert read_delta(spark, t, version=0).count() == 4
    # repeat delete: already-deleted rows never re-match
    again = delete_where_delta(spark, t, "country = 'us'")
    assert again == {"rows_deleted": 0, "files_updated": 0, "files_removed": 0}
    # second delete merges with the existing vector
    out2 = delete_where_delta(spark, t, "id = 3")
    assert out2["rows_deleted"] == 1
    assert sorted(r["id"] for r in read_delta(spark, t).collect()) == [4]


def test_delete_where_full_file_becomes_remove(spark, tmp_path, people):
    t = str(tmp_path / "t")
    write_delta(people, t, partition_by=["country"])
    out = delete_where_delta(spark, t, "country = 'us'")
    # partitioned layout: the us file(s) lose every row -> pure removes
    assert out["files_removed"] >= 1 and out["files_updated"] == 0
    _meta, active, _ = _snapshot_actions(t)
    assert all("us" not in p for p in active)
    assert sorted(r["id"] for r in read_delta(spark, t).collect()) == [3, 4]


def test_delete_survives_checkpoint_and_appends(spark, tmp_path, people):
    t = str(tmp_path / "t")
    write_delta(people, t)
    delete_where_delta(spark, t, "id = 2")
    write_delta(
        spark.createDataFrame([(5, "eve", "fr")], people.schema), t, mode="append"
    )
    checkpoint_delta(t)
    # replay now starts from the parquet checkpoint: the DV descriptor
    # and the upgraded protocol must both survive it
    got = read_delta(spark, t)
    assert sorted(r["id"] for r in got.collect()) == [1, 3, 4, 5]
    _meta, active, _txns, protocol = _snapshot_actions(
        os.path.abspath(t), return_protocol=True
    )
    assert protocol["minReaderVersion"] == 3
    assert "deletionVectors" in protocol["readerFeatures"]


def test_dv_upgrade_carries_legacy_implied_features(spark, tmp_path, people):
    """PROTOCOL.md table-features upgrade rule: moving a LEGACY
    protocol to (3,7) must list every feature the legacy versions
    implied, or connector readers/writers reject the table. A (2,5)
    column-mapped table gaining deletion vectors must keep
    columnMapping in BOTH feature lists (plus the mwv<=5 implied
    writer set); a legacy CDF table (mwv 4) must keep changeDataFeed."""
    from archetype_spark.sources.delta import (
        enable_cdf_delta,
        enable_column_mapping_delta,
    )

    t = str(tmp_path / "t")
    write_delta(people, t)
    enable_column_mapping_delta(t)  # legacy (2,5)
    _m, _a, _x, p = _snapshot_actions(os.path.abspath(t), return_protocol=True)
    assert (p["minReaderVersion"], p["minWriterVersion"]) == (2, 5)
    delete_where_delta(spark, t, "id = 2")
    _m, _a, _x, p = _snapshot_actions(os.path.abspath(t), return_protocol=True)
    assert (p["minReaderVersion"], p["minWriterVersion"]) == (3, 7)
    assert {"columnMapping", "deletionVectors"} <= set(p["readerFeatures"])
    assert {
        "appendOnly",
        "invariants",
        "checkConstraints",
        "changeDataFeed",
        "generatedColumns",
        "columnMapping",
        "deletionVectors",
    } <= set(p["writerFeatures"])
    assert sorted(r["id"] for r in read_delta(spark, t).collect()) == [1, 3, 4]

    t2 = str(tmp_path / "t2")
    write_delta(people, t2)
    enable_cdf_delta(t2)  # legacy (1,4)
    delete_where_delta(spark, t2, "id = 1")
    _m, _a, _x, p2 = _snapshot_actions(
        os.path.abspath(t2), return_protocol=True
    )
    assert (p2["minReaderVersion"], p2["minWriterVersion"]) == (3, 7)
    assert {
        "appendOnly",
        "invariants",
        "checkConstraints",
        "changeDataFeed",
        "generatedColumns",
        "deletionVectors",
    } <= set(p2["writerFeatures"])
    assert "columnMapping" not in p2["readerFeatures"]  # never active
    # the upgraded-mapped table stays readable after a further rename
    assert sorted(r["id"] for r in read_delta(spark, t2).collect()) == [
        2,
        3,
        4,
    ]


def test_incremental_changes_refuse_dv_commits(spark, tmp_path, people):
    t = str(tmp_path / "t")
    write_delta(people, t)
    delete_where_delta(spark, t, "id = 1")
    assert read_delta_changes(spark, t, 0, 0).count() == 4
    with pytest.raises(NotImplementedError, match="(?i)delete"):
        read_delta_changes(spark, t, 0).count()


def test_vacuum_keeps_active_dv_drops_stale(spark, tmp_path, people):
    t = str(tmp_path / "t")
    write_delta(people, t)
    delete_where_delta(spark, t, "id = 1")
    delete_where_delta(spark, t, "id = 2")  # replaces the first vector
    bins = lambda: {  # noqa: E731
        n for n in os.listdir(t) if n.startswith("deletion_vector_")
    }
    assert len(bins()) == 2
    deleted = vacuum_delta(t)
    assert deleted["data_files"] >= 1  # the stale vector vacuumed
    assert len(bins()) == 1
    assert sorted(r["id"] for r in read_delta(spark, t).collect()) == [3, 4]


def test_update_where_tombstones_and_rewrites_in_one_commit(
    spark, tmp_path, people
):
    """UPDATE via DVs: matched rows disappear from their original
    positions (vector) and reappear transformed (staged add) in ONE
    commit; unmatched rows untouched; time travel shows the
    pre-update state; partition-moving updates land in the new
    partition directory."""
    from archetype_spark.sources import update_where_delta
    from archetype_spark.sources.delta import _latest_version

    t = str(tmp_path / "t")
    write_delta(people, t)
    v0 = _latest_version(t)
    out = update_where_delta(
        spark, t, "country = 'us'", {"name": "upper(name)", "id": "id + 100"}
    )
    assert out["rows_updated"] == 2 and out["files_added"] >= 1
    got = sorted(tuple(r) for r in read_delta(spark, t).collect())
    assert got == [
        (3, "cho", "jp"),
        (4, "dee", "jp"),
        (101, "ANN", "us"),
        (102, "BOB", "us"),
    ]
    assert _latest_version(t) == v0 + 1  # ONE commit for the whole update
    assert read_delta(spark, t, version=v0).count() == 4
    assert sorted(
        r["id"] for r in read_delta(spark, t, version=v0).collect()
    ) == [1, 2, 3, 4]
    # partition-moving update on a partitioned table
    t2 = str(tmp_path / "t2")
    write_delta(people, t2, partition_by=["country"])
    update_where_delta(spark, t2, "id = 3", {"country": "'us'"})
    got2 = {
        r["id"]: r["country"] for r in read_delta(spark, t2).collect()
    }
    assert got2[3] == "us" and len(got2) == 4
    # unknown SET column refuses
    with pytest.raises(ValueError, match="unknown column"):
        update_where_delta(spark, t, "id = 4", {"nope": "1"})


def test_wide_mask_executor_path_semantics(spark, tmp_path, people, monkeypatch):
    """Past DV_DRIVER_COLLECT_MAX the per-file bitmaps build
    EXECUTOR-side: the driver handles one descriptor row per masked
    file, never the position set. Same commit semantics as the
    driver path — DV merge with existing vectors, idempotent
    re-delete under the blob-filtered dead guard, UPDATE staging,
    full-file removal."""
    from archetype_spark.sources import delta as delta_mod
    from archetype_spark.sources import update_where_delta

    t = str(tmp_path / "t")
    write_delta(people, t)
    monkeypatch.setattr(delta_mod, "DV_DRIVER_COLLECT_MAX", 0)
    out = delete_where_delta(spark, t, "id IN (1, 2)")
    assert delta_mod._LAST_MASK_PATH == "executor"
    assert out == {"rows_deleted": 2, "files_updated": 1, "files_removed": 0}
    assert sorted(r["id"] for r in read_delta(spark, t).collect()) == [3, 4]
    # repeat: dead rows never re-match, even with the executor-side
    # (blob-broadcast) dead guard
    monkeypatch.setattr(delta_mod, "DV_DEAD_BROADCAST_MAX", 0)
    again = delete_where_delta(spark, t, "id IN (1, 2)")
    assert again == {"rows_deleted": 0, "files_updated": 0, "files_removed": 0}
    # UPDATE through the executor path merges with the existing DV
    out2 = update_where_delta(spark, t, "id = 3", {"name": "'CHO'"})
    assert delta_mod._LAST_MASK_PATH == "executor"
    assert out2["rows_updated"] == 1 and out2["files_added"] == 1
    rows = sorted((r["id"], r["name"]) for r in read_delta(spark, t).collect())
    assert rows == [(3, "CHO"), (4, "dee")]
    # masking the original file's last live row -> pure remove
    out3 = delete_where_delta(spark, t, "id = 4")
    assert delta_mod._LAST_MASK_PATH == "executor"
    assert out3["files_removed"] == 1 and out3["rows_deleted"] == 1
    assert sorted(r["id"] for r in read_delta(spark, t).collect()) == [3]


def test_wide_mask_executor_path_with_cdf(spark, tmp_path, people, monkeypatch):
    """The executor bitmap path must keep writing Change Data Feed
    files: a wide UPDATE's pre/post images land in _change_data and
    read back through read_delta_cdf."""
    from archetype_spark.sources import delta as delta_mod
    from archetype_spark.sources import update_where_delta
    from archetype_spark.sources.delta import enable_cdf_delta, read_delta_cdf

    t = str(tmp_path / "t")
    write_delta(people, t)
    enable_cdf_delta(t)
    monkeypatch.setattr(delta_mod, "DV_DRIVER_COLLECT_MAX", 0)
    update_where_delta(spark, t, "country = 'us'", {"name": "upper(name)"})
    assert delta_mod._LAST_MASK_PATH == "executor"
    ch = read_delta_cdf(spark, t, 2, 2)
    got = sorted(
        (r["_change_type"], r["id"], r["name"]) for r in ch.collect()
    )
    assert got == [
        ("update_postimage", 1, "ANN"),
        ("update_postimage", 2, "BOB"),
        ("update_preimage", 1, "ann"),
        ("update_preimage", 2, "bob"),
    ]


def test_compact_materializes_deletes(spark, tmp_path, people):
    """OPTIMIZE after DELETE: the rewrite reads the DV-filtered rows,
    so the new snapshot has no deletion vectors and the same data."""
    t = str(tmp_path / "t")
    write_delta(people, t)
    delete_where_delta(spark, t, "country = 'us'")
    compact_delta(spark, t, target_files=1)
    _meta, active, _ = _snapshot_actions(t)
    assert all(not add.get("deletionVector") for add in active.values())
    assert sorted(r["id"] for r in read_delta(spark, t).collect()) == [3, 4]


def test_update_does_not_resurrect_dv_deleted_rows(spark, tmp_path):
    """Regression (found r11): the mask scan reads raw files, so an
    UPDATE whose predicate also matches a previously-DV-deleted row
    staged that dead row as a live replacement. The already-deleted
    positions must be anti-joined out before the predicate."""
    from archetype_spark.sources import (
        delete_where_delta,
        read_delta,
        update_where_delta,
        write_delta,
    )

    t = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, "us"), (2, "us"), (3, "jp")], "id long, c string"
    ).coalesce(1)
    write_delta(df, t)
    delete_where_delta(spark, t, "id = 1")
    out = update_where_delta(spark, t, "c = 'us'", {"c": "'uk'"})
    assert out["rows_updated"] == 1  # only the LIVE us-row
    rows = sorted(tuple(r) for r in read_delta(spark, t).collect())
    assert rows == [(2, "uk"), (3, "jp")]
    # and a second DELETE over the same predicate stays a no-op
    again = delete_where_delta(spark, t, "id = 1")
    assert again["rows_deleted"] == 0


def test_delete_by_key_and_upsert_by_key_delta(spark, tmp_path):
    """The Delta CDC-apply faces: key-frame DV delete, and the
    one-commit key-batch upsert (mask + staged inserts) — replaced
    rows never duplicate, fresh keys insert, repeats are no-ops, and
    the txn stamp rides the same commit."""
    from archetype_spark.sources import (
        delete_by_key_delta,
        read_delta,
        upsert_by_key_delta,
        write_delta,
    )
    from archetype_spark.sources.delta import _latest_version, last_txn_version

    t = str(tmp_path / "t")
    write_delta(
        spark.createDataFrame(
            [(1, "ann", 10), (2, "bob", 20), (3, "cho", 30)],
            "id long, name string, v long",
        ).coalesce(1),
        t,
    )
    out = delete_by_key_delta(
        spark, t, spark.createDataFrame([(2,)], "id long")
    )
    assert out["rows_deleted"] == 1
    assert sorted(r["id"] for r in read_delta(spark, t).collect()) == [1, 3]
    # repeat: dead keys never re-match
    again = delete_by_key_delta(
        spark, t, spark.createDataFrame([(2,)], "id long")
    )
    assert again["rows_deleted"] == 0
    # upsert: replace id=1, insert id=4 — ONE commit, txn-stamped
    v0 = _latest_version(t)
    ups = spark.createDataFrame(
        [(1, "ANN", 11), (4, "dee", 40)], "id long, name string, v long"
    ).coalesce(1)
    res = upsert_by_key_delta(spark, t, ups, ["id"], txn=("cdc-app", 7))
    assert res["rows_deleted"] == 1 and res["files_added"] >= 1
    assert _latest_version(t) == v0 + 1
    assert last_txn_version(t, "cdc-app") == 7
    got = sorted(tuple(r) for r in read_delta(spark, t).collect())
    assert got == [(1, "ANN", 11), (3, "cho", 30), (4, "dee", 40)]
    with __import__("pytest").raises(ValueError, match="not in table"):
        delete_by_key_delta(
            spark, t, spark.createDataFrame([(1,)], "nope long")
        )


def test_upsert_by_key_delta_writes_net_change_files(spark, tmp_path):
    """Under the CDF, a key-batch upsert lands as the net-changes
    form: masked rows as 'delete', staged rows as 'insert'."""
    from archetype_spark.sources import (
        read_delta,
        upsert_by_key_delta,
        write_delta,
    )
    from archetype_spark.sources.delta import enable_cdf_delta, read_delta_cdf

    t = str(tmp_path / "t")
    write_delta(
        spark.createDataFrame(
            [(1, "ann"), (2, "bob")], "id long, name string"
        ).coalesce(1),
        t,
    )
    enable_cdf_delta(t)
    ups = spark.createDataFrame(
        [(2, "BOB"), (3, "cho")], "id long, name string"
    ).coalesce(1)
    upsert_by_key_delta(spark, t, ups, ["id"])
    v = 2
    ch = sorted(
        (r["_change_type"], r["id"], r["name"])
        for r in read_delta_cdf(spark, t, v, v).collect()
    )
    assert ch == [
        ("delete", 2, "bob"),
        ("insert", 2, "BOB"),
        ("insert", 3, "cho"),
    ]
    assert sorted(r["id"] for r in read_delta(spark, t).collect()) == [1, 2, 3]
