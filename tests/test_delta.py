"""Protocol-native Delta Lake backend (sources/delta.py): round-trip,
time travel, partition reconstruction + pruning, checkpoint replay,
and loud refusal of unsupported reader features. The log files the
hand-crafted cases write follow the public PROTOCOL.md shapes — this
suite is the jar-free substitute for a connector integration test.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from archetype_spark.sources import read_delta, read_table, write_delta, write_table
from archetype_spark.sources.delta import _snapshot_actions


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture()
def people(spark):
    return spark.createDataFrame(
        [(1, "ann", "us"), (2, "bob", "us"), (3, "cho", "jp"), (4, "dee", "jp")],
        "id long, name string, country string",
    )


def test_delta_roundtrip_append_overwrite(spark, tmp_path, people):
    t = str(tmp_path / "t")
    write_delta(people, t)
    got = read_delta(spark, t)
    assert got.schema == people.schema
    assert _rows(got) == _rows(people)

    more = spark.createDataFrame([(5, "eve", "fr")], people.schema)
    write_delta(more, t, mode="append")
    assert read_delta(spark, t).count() == 5

    write_delta(more, t, mode="overwrite")
    assert _rows(read_delta(spark, t)) == _rows(more)


def test_delta_time_travel(spark, tmp_path, people):
    t = str(tmp_path / "t")
    write_delta(people, t)
    write_delta(
        spark.createDataFrame([(5, "eve", "fr")], people.schema), t, mode="append"
    )
    assert read_delta(spark, t, version=0).count() == 4
    assert read_delta(spark, t, version=1).count() == 5
    # via the uniform reader's connector-compatible option
    assert read_table(spark, t, fmt="delta", versionAsOf="0").count() == 4
    with pytest.raises(FileNotFoundError):
        read_delta(spark, t, version=7)


def test_delta_partitioned_roundtrip_and_pruning(spark, tmp_path, people):
    t = str(tmp_path / "t")
    write_delta(people, t, partition_by=["country"])
    got = read_delta(spark, t)
    # partition column reconstructed with its declared type and values
    assert dict(got.dtypes)["country"] == "string"
    assert _rows(got.select("id", "name", "country")) == _rows(people)
    # hive-consistent layout takes the single-scan fast path: ONE
    # FileScan whose PartitionFilters carry the country predicate
    # natively (plan width O(1) in the partition count)
    plan = (
        got.filter(F.col("country") == "jp")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("FileScan parquet") == 1
    assert "PartitionFilters" in plan and "jp" in plan
    assert (
        _rows(got.filter(F.col("country") == "jp").select("id"))
        == [(3,), (4,)]
    )


def test_delta_foreign_layout_falls_back_to_grouped_unions(spark, tmp_path, people):
    """A log whose partitionValues do NOT match hive dir segments
    (legal per the protocol) must still read correctly via the
    grouped-union fallback — values come from the LOG, not the
    paths."""
    import shutil as _sh

    t = str(tmp_path / "t")
    write_delta(people, t, partition_by=["country"])
    _meta, active, _ = _snapshot_actions(t)
    # flatten: move every data file to the table root and rewrite the
    # log with flat paths (partitionValues untouched)
    actions = []
    for p, add in active.items():
        flat = p.replace("/", "__")
        _sh.move(os.path.join(t, p), os.path.join(t, flat))
        actions.append({"remove": {"path": p, "dataChange": False}})
        actions.append({"add": {**add, "path": flat}})
    with open(os.path.join(t, "_delta_log", f"{1:020d}.json"), "w") as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")
    got = read_delta(spark, t)
    assert _rows(got.select("id", "name", "country")) == _rows(people)
    # the fallback prunes via constant folding instead
    assert _rows(got.filter("country = 'jp'").select("id")) == [(3,), (4,)]


def test_delta_partitioned_append_inherits_partitioning(spark, tmp_path, people):
    t = str(tmp_path / "t")
    write_delta(people, t, partition_by=["country"])
    write_delta(
        spark.createDataFrame([(5, "eve", "fr")], people.schema), t, mode="append"
    )
    got = read_delta(spark, t)
    assert got.filter("country = 'fr'").count() == 1
    # declaring a DIFFERENT partitioning on append is rejected
    with pytest.raises(ValueError):
        write_delta(
            spark.createDataFrame([(6, "fin", "fi")], people.schema),
            t,
            mode="append",
            partition_by=["name"],
        )


def test_delta_via_uniform_writer_modes(spark, tmp_path, people):
    t = str(tmp_path / "t")
    write_table(people, t, fmt="delta")
    with pytest.raises(FileExistsError):
        write_table(people, t, fmt="delta")  # default mode=error
    write_table(people, t, fmt="delta", mode="append")
    assert read_table(spark, t, fmt="delta").count() == 8


def test_delta_handwritten_log_remove_and_urlencoding(spark, tmp_path, people):
    """A log written by ANOTHER writer (remove action, URL-encoded
    path) replays correctly: removed file's rows are gone."""
    t = str(tmp_path / "t")
    write_delta(people.coalesce(1), t)  # one data file holds all rows
    _meta, active, _ = _snapshot_actions(t)
    victim = sorted(active)[0]
    log = os.path.join(t, "_delta_log", f"{1:020d}.json")
    with open(log, "w") as fh:
        fh.write(json.dumps({"remove": {"path": victim, "dataChange": True}}) + "\n")
    before = read_delta(spark, t, version=0).count()
    after = read_delta(spark, t).count()
    assert after < before


def test_delta_checkpoint_replay(spark, tmp_path, people):
    """A parquet checkpoint + _last_checkpoint short-circuits the JSON
    replay; commits after the checkpoint still apply."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = str(tmp_path / "t")
    write_delta(people, t)  # version 0
    meta, active, _ = _snapshot_actions(t)
    # build checkpoint rows: protocol, metaData, and every active add
    # empty structs (options/configuration) omitted: pyarrow cannot
    # write child-less struct columns, and the reader treats them as
    # optional exactly as the protocol does
    rows = [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2},
         "metaData": None, "add": None},
        {"protocol": None,
         "metaData": {
             "id": meta["id"],
             "format": {"provider": "parquet"},
             "schemaString": meta["schemaString"],
             "partitionColumns": [],
         },
         "add": None},
    ] + [
        {"protocol": None, "metaData": None,
         "add": {"path": p, "partitionValues": None, "size": a["size"],
                 "modificationTime": a["modificationTime"], "dataChange": True}}
        for p, a in active.items()
    ]
    cp = os.path.join(t, "_delta_log", f"{0:020d}.checkpoint.parquet")
    pq.write_table(pa.Table.from_pylist(rows), cp)
    with open(os.path.join(t, "_delta_log", "_last_checkpoint"), "w") as fh:
        json.dump({"version": 0, "size": len(rows)}, fh)
    # hide the JSON commit: replay must come from the checkpoint alone
    os.rename(
        os.path.join(t, "_delta_log", f"{0:020d}.json"),
        os.path.join(t, "_delta_log", "hidden"),
    )
    assert read_delta(spark, t).count() == 4
    # a post-checkpoint commit still applies on top
    write_delta(
        spark.createDataFrame([(5, "eve", "fr")], people.schema), t, mode="append"
    )
    assert read_delta(spark, t).count() == 5
    # the checkpoint IS version 0, so version-0 time travel serves
    # from it even with the JSON gone...
    assert read_delta(spark, t, version=0).count() == 4
    # ...but a version BEHIND any checkpoint/commit coverage would
    # need vacuumed JSONs: with the checkpoint marker removed, replay
    # finds no commit 0 and must fail loudly, not silently misread
    os.remove(os.path.join(t, "_delta_log", "_last_checkpoint"))
    with pytest.raises(FileNotFoundError):
        read_delta(spark, t, version=0)


def test_delta_unsupported_features_refused(spark, tmp_path, people):
    """deletionVectors, columnMapping and v2Checkpoint are
    implemented now (reader version 3 tables read fine when every
    listed feature is known); any UNKNOWN feature, and the version-2
    protocol WITHOUT a declared column-mapping mode, still refuse
    loudly."""
    t = str(tmp_path / "t")
    write_delta(people, t)
    log = os.path.join(t, "_delta_log", f"{1:020d}.json")
    with open(log, "w") as fh:
        fh.write(
            json.dumps(
                {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                              "readerFeatures": ["deletionVectors",
                                                 "typeWidening"]}}
            )
            + "\n"
        )
    with pytest.raises(NotImplementedError, match="typeWidening"):
        read_delta(spark, t)
    with open(log, "w") as fh:
        fh.write(
            json.dumps(
                {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}}
            )
            + "\n"
        )
    with pytest.raises(NotImplementedError):
        read_delta(spark, t)
    # DV-only feature list at reader version 3: accepted
    with open(log, "w") as fh:
        fh.write(
            json.dumps(
                {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                              "readerFeatures": ["deletionVectors"]}}
            )
            + "\n"
        )
    assert read_delta(spark, t).count() == 4


def test_delta_empty_table_after_full_remove(spark, tmp_path, people):
    t = str(tmp_path / "t")
    write_delta(people, t)
    _meta, active, _ = _snapshot_actions(t)
    with open(os.path.join(t, "_delta_log", f"{1:020d}.json"), "w") as fh:
        for p in active:
            fh.write(json.dumps({"remove": {"path": p, "dataChange": True}}) + "\n")
    got = read_delta(spark, t)
    assert got.count() == 0
    assert got.schema == people.schema  # schema survives an empty snapshot


def test_delta_streaming_sink_exactly_once(spark, tmp_path, people):
    """Structured Streaming -> Delta: one txn-stamped commit per
    micro-batch; a replayed batch id is skipped (the protocol's txn
    idempotence handshake), a fresh one appends."""
    from archetype_spark.sources import last_txn_version, streaming_delta_sink

    src = tmp_path / "src"
    for i in range(3):
        people.filter(F.col("id") % 3 == i).coalesce(1).write.parquet(
            str(src / f"b{i}")
        )
    t = str(tmp_path / "t")
    sink = streaming_delta_sink(t, app_id="curation-v1", checkpoint_every=2)
    stream = (
        spark.readStream.schema(people.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "b*"))
    )
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert _rows(read_delta(spark, t)) == _rows(people)
    hwm = last_txn_version(t, "curation-v1")
    assert hwm == 2  # three micro-batches: ids 0..2
    assert last_txn_version(t, "other-app") is None
    # replay of an already-committed batch: no new commit, no new rows
    sink(people, 1)
    assert read_delta(spark, t).count() == 4
    assert last_txn_version(t, "curation-v1") == 2
    # a genuinely new batch appends and advances the high-water mark
    sink(spark.createDataFrame([(9, "zoe", "nz")], people.schema), 3)
    assert read_delta(spark, t).count() == 5
    assert last_txn_version(t, "curation-v1") == 3


def test_delta_merge_upsert_and_time_travel(spark, tmp_path, people):
    """merge_delta: io.merge_table's semantics as one overwrite
    commit; the pre-merge snapshot stays reachable via time travel."""
    from archetype_spark.sources import merge_delta

    t = str(tmp_path / "t")
    write_delta(people, t)
    ups = spark.createDataFrame(
        [(2, "bobby", "uk"), (9, "zoe", "nz")], people.schema
    )
    merge_delta(spark, t, ups, keys=["id"])
    got = {r["id"]: (r["name"], r["country"]) for r in read_delta(spark, t).collect()}
    assert got[2] == ("bobby", "uk")  # matched -> updated
    assert got[9] == ("zoe", "nz")  # unmatched -> inserted
    assert len(got) == 5 and got[1] == ("ann", "us")
    # pre-merge state intact at version 0
    before = {r["id"] for r in read_delta(spark, t, version=0).collect()}
    assert before == {1, 2, 3, 4}
    # delete mode drops matched keys, ignores the rest
    merge_delta(
        spark, t,
        spark.createDataFrame([(1, "x", "x"), (77, "y", "y")], people.schema),
        keys=["id"], when_matched="delete", when_not_matched="ignore",
    )
    assert {r["id"] for r in read_delta(spark, t).collect()} == {2, 3, 4, 9}


def test_delta_append_schema_drift_refused(spark, tmp_path, people):
    """Review late-r8: committing a narrower/renamed/retyped frame is
    refused at commit time (silent NULL columns otherwise); a
    nullability-only difference is tolerated."""
    t = str(tmp_path / "t")
    write_delta(people, t)
    with pytest.raises(ValueError, match="schema mismatch"):
        write_delta(people.drop("country"), t, mode="append")
    with pytest.raises(ValueError, match="schema mismatch"):
        write_delta(
            people.withColumn("id", F.col("id").cast("int")), t, mode="overwrite"
        )
    # same columns, different nullability flags: fine
    relaxed = spark.createDataFrame(people.collect(), people.schema)
    write_delta(relaxed, t, mode="append")
    assert read_delta(spark, t).count() == 8


def test_delta_commit_gap_refused(spark, tmp_path, people):
    """Review late-r8: a missing middle commit (botched copy) must
    refuse to serve the stale pre-gap snapshot."""
    t = str(tmp_path / "t")
    write_delta(people, t)
    write_delta(people, t, mode="append")  # v1
    write_delta(people, t, mode="append")  # v2
    os.remove(os.path.join(t, "_delta_log", f"{1:020d}.json"))
    with pytest.raises(FileNotFoundError, match="missing commit 1"):
        read_delta(spark, t)
    # time travel BEFORE the gap still works
    assert read_delta(spark, t, version=0).count() == 4


def test_delta_unsafe_partition_value_uses_fallback(spark, tmp_path):
    """Review late-r8: a partition value containing %XX (which Spark's
    discovery would unescape) must take the log-authoritative
    fallback, not the hive fast path."""
    d = spark.createDataFrame(
        [(1, "a%20b"), (2, "plain")], "id long, tag string"
    )
    t = str(tmp_path / "t")
    write_delta(d, t, partition_by=["tag"])
    got = {r["id"]: r["tag"] for r in read_delta(spark, t).collect()}
    # values come from the log verbatim — never unescaped
    assert got == {1: "a%20b", 2: "plain"}


def test_delta_reader_refuses_schema_and_options(spark, tmp_path, people):
    t = str(tmp_path / "t")
    write_delta(people, t)
    with pytest.raises(ValueError, match="unsupported reader args"):
        read_table(spark, t, fmt="delta", schema=people.schema)
    with pytest.raises(ValueError, match="unsupported reader args"):
        read_table(spark, t, fmt="delta", mergeSchema="true")


def test_delta_checkpoint_vacuum_lifecycle(spark, tmp_path, people):
    """The full maintenance cycle: commits -> checkpoint_delta ->
    vacuum_delta(clean_log) leaves a table that resolves from the
    checkpoint alone, keeps txn high-water marks, reads the same
    rows, and refuses (loudly) time travel behind the retention
    horizon."""
    from archetype_spark.sources import (
        checkpoint_delta,
        last_txn_version,
        streaming_delta_sink,
        vacuum_delta,
    )

    t = str(tmp_path / "t")
    write_delta(people, t, partition_by=["country"])  # v0
    streaming_delta_sink(t, app_id="app")(  # v1, txn-stamped
        spark.createDataFrame([(5, "eve", "fr")], people.schema), 0
    )
    write_delta(people, t, mode="overwrite")  # v2: tombstones v0+v1 files
    assert checkpoint_delta(t) == 2

    got = vacuum_delta(t, clean_log=True)
    assert got["data_files"] > 0 and got["log_files"] == 3
    # snapshot resolves from the checkpoint alone, values intact
    assert _rows(read_delta(spark, t).select("id", "name", "country")) == _rows(
        people
    )
    # the txn high-water mark survived the checkpoint (idempotence
    # would silently break otherwise)
    assert last_txn_version(t, "app") == 0
    # post-cleanup commits still apply on top
    write_delta(
        spark.createDataFrame([(9, "zoe", "nz")], people.schema), t, mode="append"
    )
    assert read_delta(spark, t).count() == 5
    # time travel behind the horizon: loud, not silently wrong
    with pytest.raises(FileNotFoundError):
        read_delta(spark, t, version=1)


def test_q104_builder_rebuilds_on_corpus_change(spark, tmp_path, monkeypatch):
    """The driver regenerates testdata between rounds (CLAUDE.md);
    q104's table must rebuild when the documents parquet changes and
    reuse (no new commits) when it does not."""
    from archetype_spark.queries.northstar import _ensure_delta_documents
    from archetype_spark.sources.delta import _latest_version

    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path / "idx"))
    sf = tmp_path / "sf"
    docs = spark.createDataFrame(
        [(1, "alpha beta", "en"), (2, "gamma", "de")],
        "doc_id long, text string, lang string",
    )
    docs.write.parquet(str(sf / "documents.parquet"))
    t1 = _ensure_delta_documents(spark, str(sf))
    assert _latest_version(t1) == 2  # two appends + compaction
    rows1 = read_delta(spark, t1).count()
    # unchanged corpus: reuse, no new build (version still 2)
    assert _ensure_delta_documents(spark, str(sf)) == t1
    assert _latest_version(t1) == 2
    # regenerated corpus (one more doc): fingerprint mismatch -> the
    # slot swaps atomically to a fresh three-commit table
    docs.unionByName(
        spark.createDataFrame([(3, "delta", "fr")], docs.schema)
    ).write.mode("overwrite").parquet(str(sf / "documents.parquet"))
    t2 = _ensure_delta_documents(spark, str(sf))
    assert t2 == t1
    assert _latest_version(t2) == 2
    assert read_delta(spark, t2).count() == rows1 + 1


def test_delta_checkpoint_spec_schema(spark, tmp_path, people):
    """The checkpoint parquet uses the spec's column shapes —
    add.partitionValues / metaData.configuration / format.options as
    map<string,string>, not inferred structs — so a spec-compliant
    Delta reader can consume it, and our own replay reads the maps
    back as dicts."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from archetype_spark.sources import checkpoint_delta

    t = str(tmp_path / "t")
    write_delta(people, t, partition_by=["country"])
    v = checkpoint_delta(t)
    sch = pq.read_schema(
        os.path.join(t, "_delta_log", f"{v:020d}.checkpoint.parquet")
    )
    add_t = sch.field("add").type
    by_name = {add_t.field(i).name: add_t.field(i).type for i in range(add_t.num_fields)}
    assert pa.types.is_map(by_name["partitionValues"])
    meta_t = sch.field("metaData").type
    meta_by = {meta_t.field(i).name: meta_t.field(i).type for i in range(meta_t.num_fields)}
    assert pa.types.is_map(meta_by["configuration"])
    fmt_t = meta_by["format"]
    fmt_by = {fmt_t.field(i).name: fmt_t.field(i).type for i in range(fmt_t.num_fields)}
    assert pa.types.is_map(fmt_by["options"])
    # replay from the checkpoint alone: partition values survive the
    # map round-trip (list-of-tuples -> dict normalization)
    from archetype_spark.sources import vacuum_delta

    vacuum_delta(t, clean_log=True)
    assert _rows(read_delta(spark, t).select("id", "name", "country")) == _rows(
        people
    )


def test_merge_duplicate_source_keys_refused(spark, people):
    """SQL MERGE INTO semantics: multiple source rows per merge key
    are an error, not a silent double-insert; the opt-out keeps the
    pre-r9 behavior for pre-deduplicated callers."""
    from archetype_spark.sources.delta import resolve_merge

    dup = people.limit(2).unionAll(people.limit(2))
    with pytest.raises(ValueError, match="duplicate merge keys"):
        resolve_merge(people, dup, ["id"]).count()
    # opt-out path still resolves (documented undefined-winner)
    n = resolve_merge(people, dup, ["id"], check_duplicate_keys=False).count()
    assert n >= people.count()


def test_delta_incremental_changes(spark, tmp_path, people):
    """read_delta_changes: per-commit adds with _commit_version,
    inclusive range, overwrite contributes its rewrite (not a diff),
    and a cleaned-away commit fails loudly instead of emitting a
    silent hole."""
    from archetype_spark.sources import (
        checkpoint_delta,
        read_delta_changes,
        vacuum_delta,
    )

    t = str(tmp_path / "t")
    write_delta(people, t, partition_by=["country"])  # v0: 4 rows
    write_delta(
        spark.createDataFrame([(5, "eve", "fr")], people.schema), t, mode="append"
    )  # v1: 1 row
    write_delta(people.limit(2), t, mode="overwrite")  # v2: rewrite, 2 rows

    ch = read_delta_changes(spark, t, 1, 2)
    per_v = {
        r["_commit_version"]: r["n"]
        for r in ch.groupBy("_commit_version").agg(F.count("*").alias("n")).collect()
    }
    assert per_v == {1: 1, 2: 2}
    # inclusive of version 0; default end = latest
    assert read_delta_changes(spark, t, 0).count() == 4 + 1 + 2
    # partition column reconstructed on incremental reads too
    assert set(
        r["country"] for r in read_delta_changes(spark, t, 1, 1).collect()
    ) == {"fr"}
    # range validation
    with pytest.raises(ValueError):
        read_delta_changes(spark, t, 1, 99)
    # log cleaned past the range start -> loud, not empty
    checkpoint_delta(t)
    vacuum_delta(t, clean_log=True)
    with pytest.raises(FileNotFoundError, match="incremental"):
        read_delta_changes(spark, t, 0, 2)


def test_delta_add_column_evolution(spark, tmp_path, people):
    """Additive evolution: one metadata-only commit; pre-evolution
    files read the new column as NULL, post-evolution appends carry
    it, time travel behind the evolution serves the OLD schema, and
    the old narrow schema is now refused on append (drift check
    enforces the widened schema)."""
    from archetype_spark.sources import add_column_delta

    t = str(tmp_path / "t")
    write_delta(people, t, partition_by=["country"])  # v0
    v = add_column_delta(t, "score", "double")
    assert v == 1
    got = read_delta(spark, t)
    assert got.schema["score"].dataType.simpleString() == "double"
    assert got.count() == 4 and got.filter("score IS NULL").count() == 4
    # append with the widened schema
    wide = spark.createDataFrame(
        [(5, "eve", "fr", 0.9)], "id long, name string, country string, score double"
    )
    write_delta(wide, t, mode="append")
    assert read_delta(spark, t).filter("score IS NOT NULL").count() == 1
    # narrow appends now refused; duplicate column refused
    with pytest.raises(ValueError, match="schema mismatch"):
        write_delta(people, t, mode="append")
    with pytest.raises(ValueError, match="already exists"):
        add_column_delta(t, "score", "double")
    # time travel behind the evolution: original schema
    assert "score" not in read_delta(spark, t, version=0).columns


def test_delta_compact_binpacks_small_files(spark, tmp_path, people):
    """compact_delta merges a streaming sink's many per-batch files
    into few, preserves rows/partitioning, tombstones the old files
    (vacuum reclaims them), and keeps pre-compaction time travel."""
    import glob

    from archetype_spark.sources import compact_delta, vacuum_delta

    t = str(tmp_path / "t")
    for i in range(5):
        write_delta(
            spark.createDataFrame([(i, f"p{i}", "us")], people.schema),
            t,
            mode="append" if i else "overwrite",
            partition_by=["country"] if i == 0 else None,
        )
    n_before = len(glob.glob(f"{t}/*/*.parquet"))
    assert n_before >= 5
    compact_delta(spark, t, target_files=1, sort_by=["id"])
    got = read_delta(spark, t)
    assert got.count() == 5
    assert set(got.columns) == set(people.columns)
    # pre-compaction snapshot still resolves
    assert read_delta(spark, t, version=4).count() == 5
    deleted = vacuum_delta(t)
    assert deleted["data_files"] >= n_before
    active = len(glob.glob(f"{t}/*/*.parquet"))
    assert active < n_before


def test_delta_multipart_checkpoint_read(spark, tmp_path, people):
    """Connector writers split large checkpoints into N parts
    (`_last_checkpoint` {"parts": N}); the reader must assemble all
    parts. Hand-build a two-part checkpoint (protocol+metaData in
    part 1, adds in part 2) and hide the JSON commits: the snapshot
    must resolve from the parts alone."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = str(tmp_path / "t")
    write_delta(people, t, partition_by=["country"])
    meta, active, _txns = _snapshot_actions(t)

    rows1 = [
        {
            "protocol": {"minReaderVersion": 1, "minWriterVersion": 2},
            "metaData": None,
            "add": None,
        },
        {
            "protocol": None,
            "metaData": {
                "id": meta["id"],
                "format": {"provider": "parquet", "options": None},
                "schemaString": meta["schemaString"],
                "partitionColumns": meta["partitionColumns"],
                "configuration": None,
            },
            "add": None,
        },
    ]
    rows2 = [
        {"protocol": None, "metaData": None, "add": add}
        for add in active.values()
    ]
    log = os.path.join(t, "_delta_log")
    for part, rows in ((1, rows1), (2, rows2)):
        pq.write_table(
            pa.Table.from_pylist(rows),
            os.path.join(
                log, f"{0:020d}.checkpoint.{part:010d}.{2:010d}.parquet"
            ),
        )
    with open(os.path.join(log, "_last_checkpoint"), "w") as fh:
        json.dump({"version": 0, "size": len(rows1) + len(rows2), "parts": 2}, fh)
    os.remove(os.path.join(log, f"{0:020d}.json"))
    got = read_delta(spark, t).select("id", "name", "country")
    assert _rows(got) == _rows(people)


def test_delta_stats_skipping_and_metadata_count(spark, tmp_path):
    """r15: add actions carry protocol stats (numRecords, minValues/
    maxValues, nullCount); read_delta(scan_filter=...) prunes files
    by them driver-side (zone-map skipping, no partitioning needed),
    results stay exact, count_rows_delta answers COUNT(*) from the
    log alone — DV cardinalities subtracted after a delete — and
    stat-less foreign adds stay conservative."""
    import datetime

    from archetype_spark.sources.delta import (
        count_rows_delta,
        delete_where_delta,
    )

    df = spark.range(0, 1000).select(
        F.col("id").cast("long").alias("id"),
        F.timestamp_seconds(F.col("id") * 3600).alias("ts"),
        F.concat(F.lit("doc-"), F.col("id")).alias("name"),
    )
    t = str(tmp_path / "t")
    write_delta(df.repartitionByRange(8, "id").sortWithinPartitions("id"), t)
    # stats present in the log
    import json as _json

    log = os.path.join(t, "_delta_log", f"{0:020d}.json")
    adds = [
        _json.loads(line)["add"]
        for line in open(log)
        if '"add"' in line
    ]
    st = _json.loads(adds[0]["stats"])
    assert st["numRecords"] > 0
    assert "id" in st["minValues"] and "ts" in st["minValues"]
    assert "name" not in st.get("minValues", {})  # strings: no bounds
    assert st["nullCount"]["id"] == 0

    full = read_delta(spark, t)
    n_all = len(full.inputFiles())
    assert n_all >= 6
    pruned = read_delta(spark, t, scan_filter={"id": (100, 200)})
    assert len(pruned.inputFiles()) < n_all
    assert sorted(r.id for r in pruned.collect()) == list(range(100, 200))
    probe = read_delta(spark, t, scan_filter={"id": 500})
    assert len(probe.inputFiles()) <= 2
    assert [r.id for r in probe.collect()] == [500]
    # timestamp range prunes and stays exact
    lo = datetime.datetime(1970, 1, 5)
    hi = datetime.datetime(1970, 1, 9)
    ts_rows = read_delta(spark, t, scan_filter={"ts": (lo, hi)})
    assert len(ts_rows.inputFiles()) < n_all
    assert ts_rows.count() == 96  # 4 days * 24
    with pytest.raises(ValueError, match="scan_filter"):
        read_delta(spark, t, scan_filter={"nope": 1})

    # metadata-only COUNT, before and after a DV delete
    assert count_rows_delta(t) == 1000
    delete_where_delta(spark, t, "id % 10 = 0")
    assert count_rows_delta(t) == 900
    assert read_delta(spark, t).count() == 900
    # DV files keep their (superset) bounds: pruning still exact
    pruned2 = read_delta(spark, t, scan_filter={"id": (100, 200)})
    assert sorted(r.id for r in pruned2.collect()) == [
        i for i in range(100, 200) if i % 10 != 0
    ]

    # a stat-less add (foreign/old writer) keeps every file and
    # refuses the metadata count loudly
    t2 = str(tmp_path / "t2")
    write_delta(df.repartitionByRange(4, "id"), t2)
    log2 = os.path.join(t2, "_delta_log", f"{0:020d}.json")
    out = []
    for line in open(log2).read().splitlines():
        a = _json.loads(line)
        if "add" in a:
            a["add"].pop("stats", None)
        out.append(_json.dumps(a))
    with open(log2, "w") as fh:
        fh.write("\n".join(out))
    nostats = read_delta(spark, t2, scan_filter={"id": (100, 200)})
    assert len(nostats.inputFiles()) == len(read_delta(spark, t2).inputFiles())
    assert sorted(r.id for r in nostats.collect()) == list(range(100, 200))
    with pytest.raises(NotImplementedError, match="numRecords"):
        count_rows_delta(t2)


def test_delta_partition_value_pruning_via_scan_filter(spark, tmp_path):
    """scan_filter on a PARTITION column prunes adds by their typed
    partitionValues (the log stores strings) — equality and range."""
    df = spark.createDataFrame(
        [(i, i % 4, f"r{i}") for i in range(100)],
        "id long, bucket long, payload string",
    )
    t = str(tmp_path / "t")
    write_delta(df, t, partition_by=["bucket"])
    full_files = len(read_delta(spark, t).inputFiles())
    one = read_delta(spark, t, scan_filter={"bucket": 2})
    assert len(one.inputFiles()) < full_files
    assert sorted(r.id for r in one.collect()) == [
        i for i in range(100) if i % 4 == 2
    ]
    rng = read_delta(spark, t, scan_filter={"bucket": (1, 3)})
    assert sorted(set(r.bucket for r in rng.collect())) == [1, 2]


def test_delta_checkpoint_preserves_stats(spark, tmp_path):
    """A checkpointed snapshot keeps serving add-action stats: data
    skipping and the metadata-only COUNT both survive checkpoint_delta
    dropping the JSON tail."""
    from archetype_spark.sources.delta import (
        checkpoint_delta,
        count_rows_delta,
    )

    df = spark.range(0, 400).select(F.col("id").cast("long").alias("id"))
    t = str(tmp_path / "t")
    write_delta(df.repartitionByRange(4, "id").sortWithinPartitions("id"), t)
    write_delta(
        spark.range(400, 500).select(F.col("id").cast("long").alias("id")),
        t,
        mode="append",
    )
    checkpoint_delta(t)
    n_all = len(read_delta(spark, t).inputFiles())
    pruned = read_delta(spark, t, scan_filter={"id": (50, 120)})
    assert len(pruned.inputFiles()) < n_all
    assert sorted(r.id for r in pruned.collect()) == list(range(50, 120))
    assert count_rows_delta(t) == 500


def test_delta_distributed_vacuum_matches_driver_walk(spark, tmp_path):
    """vacuum_delta(distributed=True): the executor-side reclaim
    (per-partition listing tasks, keep-frame anti-join, executor
    deletes; _delta_log excluded by name) reclaims exactly what the
    driver walk would on twin tables — tombstoned files AND stale
    superseded deletion-vector bins — survivors read exactly, the
    log directory is untouched, and re-running is a zero no-op."""
    from archetype_spark.sources.delta import (
        delete_where_delta,
        vacuum_delta,
    )

    def build(t):
        df = spark.createDataFrame(
            [(i, "x" if i % 2 else "y", i * 10) for i in range(1, 9)],
            "id long, p string, v long",
        ).coalesce(1)
        write_delta(df, t, partition_by=["p"])
        write_delta(df, t, mode="overwrite")  # tombstones v0's files
        delete_where_delta(spark, t, "id = 2")  # DV 1
        delete_where_delta(spark, t, "id = 4")  # supersedes: stale bin
        return t

    ta = build(str(tmp_path / "driver"))
    tb = build(str(tmp_path / "dist"))
    n_log_before = len(os.listdir(os.path.join(tb, "_delta_log")))
    want = vacuum_delta(ta)
    got = vacuum_delta(tb, spark=spark, distributed=True)
    assert got == want and got["data_files"] > 0
    assert _rows(read_delta(spark, tb)) == _rows(read_delta(spark, ta))
    assert len(os.listdir(os.path.join(tb, "_delta_log"))) == n_log_before
    again = vacuum_delta(tb, spark=spark, distributed=True)
    assert again["data_files"] == 0
    with pytest.raises(ValueError, match="SparkSession"):
        vacuum_delta(tb, distributed=True)
