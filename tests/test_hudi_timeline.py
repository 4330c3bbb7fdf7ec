"""Hudi timeline hardening (sources/hudi.py): the ARCHIVED timeline
(archive_hudi writer + merged archived/active reads — long-lived real
tables move old instants into .hoodie/archived/, and a timeline-only
reader that ignored them would silently drop file groups) and
ROLLBACK handling (command log blocks masking a crashed-then-rolled-
back instant's MOR log entries, same-file and cross-file via
.rollback instants), plus the loud refusals for archive shapes this
module cannot prove it reads correctly.

Reference anchors: the [D] lake-format surface (SURVEY.md §2.2,
/root/reference/pyproject.toml:7-10); layout per the public Hudi
storage spec (hudi.apache.org) — hoodie.keep.max.commits archival,
HoodieRollbackMetadata.rollbackLogFiles, HoodieCommandBlock
ROLLBACK_PREVIOUS_BLOCK.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from archetype_spark.sources import hudi_log
from archetype_spark.sources.hudi import (
    _avro_schema_for,
    _file_slices,
    _publish_commit,
    archive_hudi,
    compact_hudi,
    hudi_history,
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


def _upd(spark, iid, name, grp, v):
    return spark.createDataFrame(
        [(iid, name, grp, v)], "id long, name string, grp string, v long"
    )


# ------------------------------------------------------------------- archive


def test_archive_keeps_snapshot_complete(spark, tmp_path, people):
    """The silent-wrong the archive reader closes: groups whose ONLY
    write stats live in archived instants must stay visible."""
    t = str(tmp_path / "t")
    write_hudi(people, t, record_key="id", partition_by="grp")
    upsert_hudi(spark, t, _upd(spark, 2, "bob2", "b", 21))
    upsert_hudi(spark, t, _upd(spark, 9, "zed", "c", 90))
    upsert_hudi(spark, t, _upd(spark, 2, "bob3", "b", 22))
    before = _rows(spark, t)
    line = hudi_timeline(t)
    assert len(line) == 4
    out = archive_hudi(t, keep_last=2)
    assert out["archived"] == 2
    # grp=a's file group was written ONLY by the (now archived)
    # create instant — without archive reads it would vanish
    assert _rows(spark, t) == before
    assert hudi_timeline(t) == line  # merged archived + active
    # active dir holds just the retained two
    hd = os.path.join(t, ".hoodie")
    active = [n for n in os.listdir(hd) if n.endswith(".commit")]
    assert len(active) == 2
    # re-archiving is a no-op (idempotent)
    assert archive_hudi(t, keep_last=2)["archived"] == 0


def test_archive_time_travel_and_incremental(spark, tmp_path, people):
    """Archived instants stay addressable: as_of an archived instant
    resolves (data files untouched), and the incremental face reads
    across the archive boundary without a gap."""
    t = str(tmp_path / "t")
    write_hudi(people, t, record_key="id", partition_by="grp")
    upsert_hudi(spark, t, _upd(spark, 2, "bob2", "b", 21))
    upsert_hudi(spark, t, _upd(spark, 2, "bob3", "b", 22))
    line = hudi_timeline(t)
    archive_hudi(t, keep_last=1)
    asof = {
        r["id"]: r["name"]
        for r in read_hudi(spark, t, as_of=line[1]).collect()
    }
    assert asof[2] == "bob2"  # archived instant, exact snapshot
    inc = read_hudi_changes(spark, t, begin_instant=line[0]).collect()
    got = {(r["_commit_instant"], r["id"]) for r in inc}
    assert got == {(line[1], 2), (line[2], 2)}
    # history spans the whole merged timeline
    hist = hudi_history(spark, t).collect()
    assert [r["instant"] for r in hist] == line


def test_archive_mor_log_chains(spark, tmp_path, people):
    """MOR: archived deltacommits still anchor their slices' log
    chains — the snapshot merge is unchanged by archival."""
    t = str(tmp_path / "t")
    write_hudi(
        people, t, record_key="id", partition_by="grp",
        table_type="MERGE_ON_READ",
    )
    upsert_hudi(spark, t, _upd(spark, 2, "bob2", "b", 21))
    upsert_hudi(spark, t, _upd(spark, 4, "dee2", "b", 41))
    before = _rows(spark, t)
    archive_hudi(t, keep_last=1)
    assert _rows(spark, t) == before
    # and the table still compacts after archival
    compact_hudi(spark, t)
    assert _rows(spark, t) == before


def test_archive_then_upsert_routes_correctly(spark, tmp_path, people):
    """Post-archive writes keep working: group resolution reads the
    snapshot's meta columns, which the merged timeline still names."""
    t = str(tmp_path / "t")
    write_hudi(people, t, record_key="id", partition_by="grp")
    upsert_hudi(spark, t, _upd(spark, 2, "bob2", "b", 21))
    upsert_hudi(spark, t, _upd(spark, 3, "cho2", "a", 31))
    archive_hudi(t, keep_last=1)
    upsert_hudi(spark, t, _upd(spark, 1, "ann2", "a", 11))
    assert _rows(spark, t) == [
        (1, "ann2", "a", 11), (2, "bob2", "b", 21),
        (3, "cho2", "a", 31), (4, "dee", "b", 40),
    ]
    # no duplicate record keys (the stale-routing failure mode)
    ids = read_hudi(spark, t).groupBy("id").count().collect()
    assert all(r["count"] == 1 for r in ids)


def test_archive_crash_window_active_copy_wins(spark, tmp_path, people):
    """Crash between archive publish and active unlink leaves an
    instant in BOTH places; the reader dedups (identical payloads) —
    the timeline must not double-count."""
    t = str(tmp_path / "t")
    write_hudi(people, t, record_key="id", partition_by="grp")
    upsert_hudi(spark, t, _upd(spark, 2, "bob2", "b", 21))
    upsert_hudi(spark, t, _upd(spark, 2, "bob3", "b", 22))
    line = hudi_timeline(t)
    hd = os.path.join(t, ".hoodie")
    saved = {}
    for n in os.listdir(hd):
        if n.startswith(line[0]) or n.startswith(line[1]):
            with open(os.path.join(hd, n), "rb") as fh:
                saved[n] = fh.read()
    archive_hudi(t, keep_last=1)
    for n, raw in saved.items():  # simulate the crash: restore active
        with open(os.path.join(hd, n), "wb") as fh:
            fh.write(raw)
    assert hudi_timeline(t) == line  # deduped, not doubled
    assert len(_rows(spark, t)) == 4
    assert archive_hudi(t, keep_last=1)["archived"] == 2  # re-archive


def test_foreign_archive_typed_subrecord_reads(spark, tmp_path, people):
    """A real writer's archive embeds the commit metadata as a typed
    Avro sub-record (HoodieArchivedMetaEntry.hoodieCommitMetadata),
    not this module's metadataJson — the reader accepts both."""
    t = str(tmp_path / "t")
    write_hudi(people, t, record_key="id", partition_by="grp")
    upsert_hudi(spark, t, _upd(spark, 2, "bob2", "b", 21))
    line = hudi_timeline(t)
    hd = os.path.join(t, ".hoodie")
    with open(os.path.join(hd, f"{line[0]}.commit")) as fh:
        meta = json.load(fh)
    stat_schema = {
        "type": "record",
        "name": "HoodieWriteStat",
        "fields": [
            {"name": "fileId", "type": ["null", "string"]},
            {"name": "path", "type": ["null", "string"]},
            {"name": "numWrites", "type": ["null", "long"]},
            {"name": "numUpdateWrites", "type": ["null", "long"]},
            {"name": "numDeletes", "type": ["null", "long"]},
            {"name": "prevCommit", "type": ["null", "string"]},
        ],
    }
    entry_schema = {
        "type": "record",
        "name": "HoodieArchivedMetaEntry",
        "fields": [
            {"name": "commitTime", "type": ["null", "string"]},
            {"name": "actionType", "type": ["null", "string"]},
            {
                "name": "hoodieCommitMetadata",
                "type": [
                    "null",
                    {
                        "type": "record",
                        "name": "HoodieCommitMetadata",
                        "fields": [
                            {
                                "name": "operationType",
                                "type": ["null", "string"],
                            },
                            {
                                "name": "partitionToWriteStats",
                                "type": [
                                    "null",
                                    {
                                        "type": "map",
                                        "values": {
                                            "type": "array",
                                            "items": stat_schema,
                                        },
                                    },
                                ],
                            },
                        ],
                    },
                ],
            },
        ],
    }
    keep = {
        "operationType": meta.get("operationType", "UPSERT"),
        "partitionToWriteStats": {
            p: [
                {
                    "fileId": s["fileId"],
                    "path": s["path"],
                    "numWrites": int(s.get("numWrites", 0)),
                    "numUpdateWrites": int(s.get("numUpdateWrites", 0)),
                    "numDeletes": int(s.get("numDeletes", 0)),
                    "prevCommit": str(s.get("prevCommit", "")),
                }
                for s in stats
            ]
            for p, stats in meta["partitionToWriteStats"].items()
        },
    }
    rec = {
        "commitTime": line[0],
        "actionType": "commit",
        "hoodieCommitMetadata": keep,
    }
    adir = os.path.join(hd, "archived")
    os.makedirs(adir)
    with open(
        os.path.join(adir, ".commits_.archive.1_1-0-1"), "wb"
    ) as fh:
        fh.write(hudi_log.avro_data_block([rec], entry_schema, line[0]))
    for n in list(os.listdir(hd)):  # drop the active copy
        if n.startswith(line[0]):
            os.remove(os.path.join(hd, n))
    assert hudi_timeline(t) == line
    assert _rows(spark, t) == [
        (1, "ann", "a", 10), (2, "bob2", "b", 21),
        (3, "cho", "a", 30), (4, "dee", "b", 40),
    ]


def test_foreign_archive_unknown_shape_refuses(spark, tmp_path, people):
    """An archive record carrying neither metadataJson nor a typed
    sub-record refuses loudly — never a silently short snapshot."""
    t = str(tmp_path / "t")
    write_hudi(people, t, record_key="id", partition_by="grp")
    schema = {
        "type": "record",
        "name": "HoodieArchivedMetaEntry",
        "fields": [
            {"name": "commitTime", "type": ["null", "string"]},
            {"name": "actionType", "type": ["null", "string"]},
        ],
    }
    adir = os.path.join(t, ".hoodie", "archived")
    os.makedirs(adir)
    with open(os.path.join(adir, ".commits_.archive.1_1-0-1"), "wb") as fh:
        fh.write(
            hudi_log.avro_data_block(
                [{"commitTime": "0" * 17, "actionType": "commit"}],
                schema,
                "0" * 17,
            )
        )
    with pytest.raises(NotImplementedError, match="archived entry"):
        hudi_timeline(t)


def test_archive_refuses_bad_keep(tmp_path, spark, people):
    t = str(tmp_path / "t")
    write_hudi(people, t, record_key="id", partition_by="grp")
    with pytest.raises(ValueError, match="keep_last"):
        archive_hudi(t, keep_last=0)


# ------------------------------------------------------------------ rollback


def _mor_with_log(spark, tmp_path, people):
    """MOR table + one committed log (id=2 -> bob2) on grp=b's group.
    Returns (table, fileId, base_instant, partition, avro_schema)."""
    t = str(tmp_path / "mor")
    write_hudi(
        people, t, record_key="id", partition_by="grp",
        table_type="MERGE_ON_READ",
    )
    upsert_hudi(spark, t, _upd(spark, 2, "bob2", "b", 21))
    slices = _file_slices(t)
    fg = next(fid for fid, sl in slices.items() if sl["logs"])
    sl = slices[fg]
    schema = _avro_schema_for(read_hudi(spark, t, with_meta=True).schema)
    return t, fg, sl["instant"], sl["partition"], schema


def _rec(fg, iid, name, grp, v, instant):
    return {
        "_hoodie_commit_time": instant,
        "_hoodie_commit_seqno": f"{instant}_0_1",
        "_hoodie_record_key": str(iid),
        "_hoodie_partition_path": f"grp={grp}",
        "_hoodie_file_name": fg,
        "id": iid,
        "name": name,
        "grp": grp,
        "v": v,
    }


def _publish_log(t, part, logname, fg, base_instant, instant):
    _publish_commit(
        t,
        instant,
        {
            "operationType": "UPSERT",
            "partitionToWriteStats": {
                part: [
                    {
                        "fileId": fg,
                        "path": f"{part}/{logname}" if part else logname,
                        "numWrites": 0,
                        "numUpdateWrites": 1,
                        "numDeletes": 0,
                        "prevCommit": base_instant,
                    }
                ]
            },
        },
        action=".deltacommit",
    )


def test_rollback_block_masks_dead_instant_same_file(
    spark, tmp_path, people
):
    """Foreign-writer shape: one log file holds a crashed instant's
    data block, the rollback command masking it, and a later
    committed block — the dead update must not surface."""
    t, fg, base, part, schema = _mor_with_log(spark, tmp_path, people)
    last = int(hudi_timeline(t)[-1])
    dead, rb, live = str(last + 1), str(last + 2), str(last + 3)
    blob = (
        hudi_log.avro_data_block(
            [_rec(fg, 4, "zombie", "b", 999, dead)], schema, dead
        )
        + hudi_log.rollback_block(dead, rb)
        + hudi_log.avro_data_block(
            [_rec(fg, 2, "bob3", "b", 22, live)], schema, live
        )
    )
    logname = hudi_log.log_file_name(fg, base, 2, "1-0-1")
    with open(os.path.join(t, part, logname), "wb") as fh:
        fh.write(blob)
    _publish_log(t, part, logname, fg, base, live)
    got = {r[0]: r for r in _rows(spark, t)}
    assert got[4] == (4, "dee", "b", 40)  # zombie masked
    assert got[2] == (2, "bob3", "b", 22)  # committed block lives


def test_rollback_instant_masks_across_log_files(spark, tmp_path, people):
    """The rollback command can land in a LATER log file named by a
    .rollback instant (object-storage writers can't append) — the
    mask still applies chain-wide, and the dead instant's block in
    the earlier file never surfaces even though it is the newest
    record version."""
    t, fg, base, part, schema = _mor_with_log(spark, tmp_path, people)
    last = int(hudi_timeline(t)[-1])
    live, dead, rb = str(last + 1), str(last + 2), str(last + 3)
    # log.2: committed update (live) + a LATER crashed update (dead)
    blob = hudi_log.avro_data_block(
        [_rec(fg, 2, "bob3", "b", 22, live)], schema, live
    ) + hudi_log.avro_data_block(
        [_rec(fg, 2, "ZOMBIE", "b", 999, dead)], schema, dead
    )
    log2 = hudi_log.log_file_name(fg, base, 2, "1-0-1")
    with open(os.path.join(t, part, log2), "wb") as fh:
        fh.write(blob)
    _publish_log(t, part, log2, fg, base, live)
    # sanity: without the rollback, the dead (newest) version wins
    assert dict((r[0], r[1]) for r in _rows(spark, t))[2] == "ZOMBIE"
    # the rollback instant names log.3 carrying only the command
    log3 = hudi_log.log_file_name(fg, base, 3, "1-0-1")
    with open(os.path.join(t, part, log3), "wb") as fh:
        fh.write(hudi_log.rollback_block(dead, rb))
    _publish_commit(
        t,
        rb,
        {
            "operationType": "ROLLBACK",
            "instantsRollback": [dead],
            "partitionMetadata": {
                part: {
                    "rollbackLogFiles": [
                        f"{part}/{log3}" if part else log3
                    ]
                }
            },
        },
        action=".rollback",
    )
    got = {r[0]: r for r in _rows(spark, t)}
    assert got[2] == (2, "bob3", "b", 22)  # mask applied cross-file
    # history surfaces the rollback instant
    hist = {r["instant"]: r["action"] for r in hudi_history(spark, t).collect()}
    assert hist[rb] == "rollback"
    # but the DATA timeline (time travel / incremental) excludes it
    assert rb not in hudi_timeline(t)


# ------------------------------------------------- foreign-written MOR layout


def test_foreign_log_layout_and_version_rollover(spark, tmp_path, people):
    """A log file assembled byte-by-byte the way the real writer lays
    it out — magic, BE sizes, headers in NON-sorted map order, the
    trailing reverse pointer — parses identically, and rolled-over
    log versions (.log.2, .log.3 from separate commits) resolve in
    chain order."""
    import struct

    t, fg, base, part, schema = _mor_with_log(spark, tmp_path, people)

    def hand_block(btype, headers, content):
        # headers written in GIVEN order (real writers use a HashMap
        # — ordering is not part of the format)
        import io

        hdr = io.BytesIO()
        hdr.write(struct.pack(">i", len(headers)))
        for k, v in headers:
            raw = v.encode()
            hdr.write(struct.pack(">ii", k, len(raw)))
            hdr.write(raw)
        hdr = hdr.getvalue()
        ftr = struct.pack(">i", 0)
        blocksize = 4 + 4 + len(hdr) + 8 + len(content) + len(ftr) + 8
        total = 6 + 8 + blocksize
        out = io.BytesIO()
        out.write(b"#HUDI#")
        out.write(struct.pack(">q", blocksize))
        out.write(struct.pack(">ii", 1, btype))
        out.write(hdr)
        out.write(struct.pack(">q", len(content)))
        out.write(content)
        out.write(ftr)
        out.write(struct.pack(">q", total))
        return out.getvalue()

    last = int(hudi_timeline(t)[-1])
    i2, i3 = str(last + 1), str(last + 2)
    # reuse the codec's avro body but reframe with reversed headers
    ref = hudi_log.avro_data_block(
        [_rec(fg, 2, "v2", "b", 2, i2)], schema, i2
    )
    blocks = hudi_log.read_blocks(ref)
    content = blocks[0][2]
    hand = hand_block(
        hudi_log.AVRO_DATA_BLOCK,
        [  # SCHEMA before INSTANT_TIME: reversed map order
            (hudi_log.SCHEMA, json.dumps(schema)),
            (hudi_log.INSTANT_TIME, i2),
        ],
        content,
    )
    log2 = hudi_log.log_file_name(fg, base, 2, "1-0-1")
    with open(os.path.join(t, part, log2), "wb") as fh:
        fh.write(hand)
    _publish_log(t, part, log2, fg, base, i2)
    # a third rolled-over version from another commit
    log3 = hudi_log.log_file_name(fg, base, 3, "2-0-2")
    with open(os.path.join(t, part, log3), "wb") as fh:
        fh.write(
            hudi_log.avro_data_block(
                [_rec(fg, 2, "v3", "b", 3, i3)], schema, i3
            )
        )
    _publish_log(t, part, log3, fg, base, i3)
    got = {r[0]: r for r in _rows(spark, t)}
    assert got[2] == (2, "v3", "b", 3)  # chain resolved in order
    sl = _file_slices(t)[fg]
    assert [p.split(".log.")[1].split("_")[0] for _i, p in sl["logs"]] == [
        "1", "2", "3"
    ]


def test_log_chain_version_gap_refuses(spark, tmp_path, people):
    """A timeline that names .log.1 and .log.3 but no .log.2 lost a
    commit — merging around the hole would be silently wrong."""
    t, fg, base, part, schema = _mor_with_log(spark, tmp_path, people)
    last = int(hudi_timeline(t)[-1])
    i3 = str(last + 1)
    log3 = hudi_log.log_file_name(fg, base, 3, "1-0-1")  # skips v2
    with open(os.path.join(t, part, log3), "wb") as fh:
        fh.write(
            hudi_log.avro_data_block(
                [_rec(fg, 2, "v3", "b", 3, i3)], schema, i3
            )
        )
    _publish_log(t, part, log3, fg, base, i3)
    with pytest.raises(ValueError, match="version"):
        read_hudi(spark, t).collect()


def test_rollback_of_inflight_write_leaves_acceptable_gap(
    spark, tmp_path, people
):
    """A write that dies INFLIGHT leaves its physical log.2 named by
    no completed instant; the rollback appends log.3 — so the chain
    sees versions [1, 3]. That hole is exactly the dead write the
    rollback's command block masks: the reader must accept it (the
    r14 advisor's false-positive — the contiguity refusal rejected
    the very rolled-back shape the feature models)."""
    t, fg, base, part, schema = _mor_with_log(spark, tmp_path, people)
    last = int(hudi_timeline(t)[-1])
    dead, rb = str(last + 1), str(last + 2)
    # log.2: the crashed write's data — physically present, named by
    # NO completed instant (it died inflight, stats never published)
    log2 = hudi_log.log_file_name(fg, base, 2, "1-0-1")
    with open(os.path.join(t, part, log2), "wb") as fh:
        fh.write(
            hudi_log.avro_data_block(
                [_rec(fg, 2, "ZOMBIE", "b", 999, dead)], schema, dead
            )
        )
    log3 = hudi_log.log_file_name(fg, base, 3, "1-0-1")
    with open(os.path.join(t, part, log3), "wb") as fh:
        fh.write(hudi_log.rollback_block(dead, rb))
    _publish_commit(
        t,
        rb,
        {
            "operationType": "ROLLBACK",
            "instantsRollback": [dead],
            "partitionMetadata": {
                part: {
                    "rollbackLogFiles": [
                        f"{part}/{log3}" if part else log3
                    ]
                }
            },
        },
        action=".rollback",
    )
    got = {r[0]: r for r in _rows(spark, t)}
    assert got[2] == (2, "bob2", "b", 21)  # committed log.1 survives
    assert all(r[1] != "ZOMBIE" for r in got.values())


def test_rollback_gap_wider_than_dead_set_refuses(spark, tmp_path, people):
    """The gap acceptance is COUNTED (r15 review): a rollback masking
    ONE dead write can explain at most one hole per slice — a second
    hole below its log version is a COMPLETED commit's log the
    timeline lost, which no mask covers; refusing beats silently
    merging around missing committed rows."""
    t, fg, base, part, schema = _mor_with_log(spark, tmp_path, people)
    last = int(hudi_timeline(t)[-1])
    dead, rb = str(last + 1), str(last + 2)
    for v in (2, 3):  # TWO physical unnamed logs
        logn = hudi_log.log_file_name(fg, base, v, "1-0-1")
        with open(os.path.join(t, part, logn), "wb") as fh:
            fh.write(
                hudi_log.avro_data_block(
                    [_rec(fg, 2, f"Z{v}", "b", 999, dead)], schema, dead
                )
            )
    log4 = hudi_log.log_file_name(fg, base, 4, "1-0-1")
    with open(os.path.join(t, part, log4), "wb") as fh:
        fh.write(hudi_log.rollback_block(dead, rb))
    _publish_commit(
        t,
        rb,
        {
            "operationType": "ROLLBACK",
            "instantsRollback": [dead],  # ONE dead instant
            "partitionMetadata": {
                part: {
                    "rollbackLogFiles": [
                        f"{part}/{log4}" if part else log4
                    ]
                }
            },
        },
        action=".rollback",
    )
    with pytest.raises(ValueError, match="dead write"):
        read_hudi(spark, t).collect()


def test_rollback_mask_survives_archival(spark, tmp_path, people):
    """Archiving the .rollback instant must not lose the mask: the
    dead-instant set reads from the ARCHIVED rollback metadata too
    (real tables archive rollbacks like any other instant)."""
    from archetype_spark.sources.hudi import archive_hudi, upsert_hudi

    t, fg, base, part, schema = _mor_with_log(spark, tmp_path, people)
    last = int(hudi_timeline(t)[-1])
    live, dead, rb = str(last + 1), str(last + 2), str(last + 3)
    blob = hudi_log.avro_data_block(
        [_rec(fg, 2, "bob3", "b", 22, live)], schema, live
    ) + hudi_log.avro_data_block(
        [_rec(fg, 2, "ZOMBIE", "b", 999, dead)], schema, dead
    )
    log2 = hudi_log.log_file_name(fg, base, 2, "1-0-1")
    with open(os.path.join(t, part, log2), "wb") as fh:
        fh.write(blob)
    _publish_log(t, part, log2, fg, base, live)
    log3 = hudi_log.log_file_name(fg, base, 3, "1-0-1")
    with open(os.path.join(t, part, log3), "wb") as fh:
        fh.write(hudi_log.rollback_block(dead, rb))
    _publish_commit(
        t,
        rb,
        {
            "operationType": "ROLLBACK",
            "instantsRollback": [dead],
            "partitionMetadata": {
                part: {
                    "rollbackLogFiles": [f"{part}/{log3}" if part else log3]
                }
            },
        },
        action=".rollback",
    )
    # keep writing so the rollback instant falls behind the cut
    upsert_hudi(
        spark, t,
        spark.createDataFrame(
            [(1, "ann2", "a", 11)], "id long, name string, grp string, v long"
        ),
    )
    out = archive_hudi(t, keep_last=1)
    assert out["archived"] >= 3  # incl. the rollback instant
    hd = os.path.join(t, ".hoodie")
    assert not any(n.endswith(".rollback") for n in os.listdir(hd))
    got = {r[0]: r for r in _rows(spark, t)}
    assert got[2] == (2, "bob3", "b", 22)  # mask read from the archive
    assert got[1] == (1, "ann2", "a", 11)
