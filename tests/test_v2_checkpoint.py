"""Delta V2 (UUID-named) checkpoint READ support (delta.io
PROTOCOL.md "V2 Checkpoints") — the form current Databricks writers
produce. Hand-built fixtures, never our own writer: a parquet
top-level checkpoint whose file actions live in a _sidecars/ parquet,
and a json top-level checkpoint with inline adds. Both must replay
correctly with the pre-checkpoint JSON commits deleted (proving the
checkpoint, not the log, served the snapshot), and a UUID-named file
without checkpointMetadata must refuse."""

from __future__ import annotations

import json
import os
import uuid

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from archetype_spark.sources import read_delta, write_delta
from archetype_spark.sources.delta import _LOG_DIR, _snapshot_actions


@pytest.fixture()
def table(spark, tmp_path):
    """Partitioned two-commit table (partitionValues non-empty keeps
    pyarrow struct inference honest)."""
    t = str(tmp_path / "t")
    write_delta(
        spark.createDataFrame(
            [(1, "ann", "us"), (2, "bob", "jp")], "id long, name string, country string"
        ).coalesce(1),
        t,
        partition_by=["country"],
    )
    write_delta(
        spark.createDataFrame(
            [(3, "cho", "us"), (4, "dee", "jp")], "id long, name string, country string"
        ).coalesce(1),
        t,
        mode="append",
        partition_by=["country"],
    )
    return t


def _checkpoint_parts(table):
    meta, active, txns, protocol = _snapshot_actions(
        os.path.abspath(table), return_protocol=True
    )
    meta_clean = dict(meta)
    # parquet cannot hold EMPTY struct columns: null out empty maps
    # (the reader's `or {}` guards accept null)
    if not meta_clean.get("configuration"):
        meta_clean["configuration"] = None
    fmt = dict(meta_clean.get("format") or {"provider": "parquet"})
    if not fmt.get("options"):
        fmt["options"] = None
    meta_clean["format"] = fmt
    proto = protocol or {"minReaderVersion": 1, "minWriterVersion": 2}
    return meta_clean, list(active.values()), txns, proto


def _drop_json_commits(table):
    log = os.path.join(table, _LOG_DIR)
    for n in os.listdir(log):
        if n.endswith(".json") and n[:20].isdigit() and ".checkpoint." not in n:
            os.remove(os.path.join(log, n))


def test_parquet_v2_checkpoint_with_sidecar(spark, table):
    meta, adds, _txns, proto = _checkpoint_parts(table)
    log = os.path.join(table, _LOG_DIR)
    sidecars = os.path.join(log, "_sidecars")
    os.makedirs(sidecars, exist_ok=True)
    sc_name = f"{uuid.uuid4()}.parquet"
    pq.write_table(
        pa.Table.from_pylist([{"add": a} for a in adds]),
        os.path.join(sidecars, sc_name),
    )
    sz = os.path.getsize(os.path.join(sidecars, sc_name))
    top = [
        {"checkpointMetadata": {"version": 1}},
        {"sidecar": {"path": sc_name, "sizeInBytes": sz, "modificationTime": 1}},
        {"protocol": proto},
        {"metaData": meta},
    ]
    # pyarrow infers the pylist schema from leading rows: every row
    # must carry every action column (null where absent)
    keys = ["checkpointMetadata", "sidecar", "protocol", "metaData"]
    top = [{k: r.get(k) for k in keys} for r in top]
    pq.write_table(
        pa.Table.from_pylist(top),
        os.path.join(log, f"{1:020d}.checkpoint.{uuid.uuid4()}.parquet"),
    )
    with open(os.path.join(log, "_last_checkpoint"), "w") as fh:
        json.dump({"version": 1, "size": len(top) + len(adds)}, fh)
    _drop_json_commits(table)
    got = sorted(tuple(r) for r in read_delta(spark, table).collect())
    assert got == [
        (1, "ann", "us"),
        (2, "bob", "jp"),
        (3, "cho", "us"),
        (4, "dee", "jp"),
    ]


def test_json_v2_checkpoint_inline_adds(spark, table):
    meta, adds, _txns, proto = _checkpoint_parts(table)
    log = os.path.join(table, _LOG_DIR)
    lines = (
        [{"checkpointMetadata": {"version": 1}}]
        + [{"add": a} for a in adds]
        + [{"protocol": proto}, {"metaData": meta}]
    )
    with open(
        os.path.join(log, f"{1:020d}.checkpoint.{uuid.uuid4()}.json"), "w"
    ) as fh:
        for line in lines:
            fh.write(json.dumps(line) + "\n")
    with open(os.path.join(log, "_last_checkpoint"), "w") as fh:
        json.dump({"version": 1, "size": len(lines)}, fh)
    _drop_json_commits(table)
    df = read_delta(spark, table)
    assert sorted(r["id"] for r in df.collect()) == [1, 2, 3, 4]
    # appends on top of the v2 checkpoint replay normally
    write_delta(
        spark.createDataFrame(
            [(5, "eve", "us")], "id long, name string, country string"
        ).coalesce(1),
        table,
        mode="append",
        partition_by=["country"],
    )
    assert sorted(r["id"] for r in read_delta(spark, table).collect()) == [
        1,
        2,
        3,
        4,
        5,
    ]


def test_v2_checkpoint_without_metadata_action_refuses(spark, table):
    meta, adds, _txns, proto = _checkpoint_parts(table)
    log = os.path.join(table, _LOG_DIR)
    lines = [{"add": a} for a in adds] + [
        {"protocol": proto},
        {"metaData": meta},
    ]
    with open(
        os.path.join(log, f"{1:020d}.checkpoint.{uuid.uuid4()}.json"), "w"
    ) as fh:
        for line in lines:
            fh.write(json.dumps(line) + "\n")
    with open(os.path.join(log, "_last_checkpoint"), "w") as fh:
        json.dump({"version": 1, "size": len(lines)}, fh)
    with pytest.raises(ValueError, match="checkpointMetadata"):
        read_delta(spark, table).collect()


def test_missing_sidecar_refuses(spark, table):
    meta, _adds, _txns, proto = _checkpoint_parts(table)
    log = os.path.join(table, _LOG_DIR)
    lines = [
        {"checkpointMetadata": {"version": 1}},
        {"sidecar": {"path": "gone.parquet", "sizeInBytes": 1, "modificationTime": 1}},
        {"protocol": proto},
        {"metaData": meta},
    ]
    with open(
        os.path.join(log, f"{1:020d}.checkpoint.{uuid.uuid4()}.json"), "w"
    ) as fh:
        for line in lines:
            fh.write(json.dumps(line) + "\n")
    with open(os.path.join(log, "_last_checkpoint"), "w") as fh:
        json.dump({"version": 1, "size": len(lines)}, fh)
    with pytest.raises(FileNotFoundError, match="sidecar"):
        read_delta(spark, table).collect()


# ----------------------------------------------------------- WRITE side
def test_checkpoint_v2_write_roundtrip(spark, table):
    """Our own V2 write (checkpoint_delta(v2=True)): UUID-named file,
    leading checkpointMetadata action, a one-time protocol upgrade
    adding the v2Checkpoint feature (legacy-implied features carried),
    and a replay that survives deleting every JSON commit."""
    import glob

    from archetype_spark.sources.delta import checkpoint_delta

    v = checkpoint_delta(table, v2=True)
    # the upgrade commit bumped the version by one (2 commits -> v2)
    assert v == 2
    cps = glob.glob(
        os.path.join(table, _LOG_DIR, f"{v:020d}.checkpoint.*.parquet")
    )
    assert len(cps) == 1 and len(os.path.basename(cps[0]).split(".")) == 4
    rows = pq.read_table(cps[0]).to_pylist()
    assert any(r.get("checkpointMetadata") is not None for r in rows)
    protos = [r["protocol"] for r in rows if r.get("protocol") is not None]
    assert len(protos) == 1
    feats = set(protos[0]["readerFeatures"])
    assert "v2Checkpoint" in feats
    # legacy minWriterVersion 2 implied features survive the upgrade
    wfeats = set(protos[0]["writerFeatures"])
    assert {"appendOnly", "invariants", "v2Checkpoint"} <= wfeats
    _drop_json_commits(table)
    out = read_delta(spark, table).orderBy("id").collect()
    assert [r.id for r in out] == [1, 2, 3, 4]
    # a second v2 checkpoint does NOT stack another protocol commit
    assert checkpoint_delta(table, v2=True) == v


def test_checkpoint_v2_write_sidecars(spark, table):
    """sidecars=2 splits the add actions across two sidecar parquet
    files; the top level carries only sidecar references (no inline
    adds) and the snapshot replays from checkpoint + sidecars alone."""
    import glob

    from archetype_spark.sources.delta import checkpoint_delta

    v = checkpoint_delta(table, v2=True, sidecars=2)
    cps = glob.glob(
        os.path.join(table, _LOG_DIR, f"{v:020d}.checkpoint.*.parquet")
    )
    rows = pq.read_table(cps[0]).to_pylist()
    assert all(r.get("add") is None for r in rows)
    scs = [r["sidecar"] for r in rows if r.get("sidecar") is not None]
    assert len(scs) == 2
    for sc in scs:
        sp = os.path.join(table, _LOG_DIR, "_sidecars", sc["path"])
        assert os.path.getsize(sp) == sc["sizeInBytes"]
    _drop_json_commits(table)
    out = read_delta(spark, table).orderBy("id").collect()
    assert [r.id for r in out] == [1, 2, 3, 4]


def test_checkpoint_sidecars_require_v2():
    from archetype_spark.sources.delta import checkpoint_delta

    with pytest.raises(ValueError, match="V2"):
        checkpoint_delta("/nope", sidecars=2)
