"""Protocol-native Iceberg v1 backend (sources/iceberg.py) + the
stdlib Avro codec beneath it (sources/avro_io.py): round-trip,
snapshot time travel, typed partition reconstruction + pruning, and
loud refusal of v2 features. Mirrors tests/test_delta.py."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from archetype_spark.sources import (
    read_iceberg,
    snapshots_iceberg,
    write_iceberg,
)
from archetype_spark.sources import avro_io


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture()
def people(spark):
    return spark.createDataFrame(
        [(1, "ann", "us"), (2, "bob", "us"), (3, "cho", "jp"), (4, "dee", "jp")],
        "id long, name string, country string",
    )


def test_avro_unions_arrays_maps_roundtrip(tmp_path):
    """The codec subset manifests need: nested records, nullable
    unions, arrays, maps, both codecs."""
    schema = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "s", "type": "string"},
            {"name": "n", "type": ["null", "long"], "default": None},
            {"name": "a", "type": {"type": "array", "items": "int"}},
            {"name": "m", "type": {"type": "map", "values": "string"}},
            {"name": "d", "type": "double"},
            {"name": "b", "type": "boolean"},
            {"name": "raw", "type": "bytes"},
        ],
    }
    recs = [
        {"s": "x", "n": None, "a": [], "m": {}, "d": 0.0, "b": False, "raw": b""},
        {"s": "y" * 500, "n": -(2**40), "a": [1, -2, 3], "m": {"k": "v"},
         "d": -1.5, "b": True, "raw": bytes(range(256))},
    ]
    for codec in ("null", "deflate"):
        p = str(tmp_path / f"t-{codec}.avro")
        avro_io.write_container(p, schema, recs, codec=codec)
        got_schema, got = avro_io.read_container(p)
        assert got == recs
        assert got_schema["name"] == "r"


def test_avro_block_runs_and_skipped_sizes(tmp_path):
    """Foreign writers may emit negative block counts (size-prefixed
    runs) and multi-block arrays — the decoder honors both."""
    import io

    out = io.BytesIO()
    # hand-encode an array<long> as two blocks, the second with a
    # negative count carrying its byte size
    avro_io._write_long(out, 2)
    avro_io._encode("long", 7, out, {})
    avro_io._encode("long", 8, out, {})
    block2 = io.BytesIO()
    avro_io._encode("long", 9, block2, {})
    avro_io._write_long(out, -1)
    avro_io._write_long(out, len(block2.getvalue()))
    out.write(block2.getvalue())
    avro_io._write_long(out, 0)
    got = avro_io._decode(
        {"type": "array", "items": "long"}, io.BytesIO(out.getvalue()), {}
    )
    assert got == [7, 8, 9]


def test_iceberg_roundtrip_append_overwrite(spark, tmp_path, people):
    t = str(tmp_path / "t")
    write_iceberg(people, t)
    got = read_iceberg(spark, t)
    assert [f.name for f in got.schema.fields] == ["id", "name", "country"]
    assert _rows(got) == _rows(people)

    more = spark.createDataFrame([(5, "eve", "fr")], people.schema)
    write_iceberg(more, t, mode="append")
    assert read_iceberg(spark, t).count() == 5

    write_iceberg(more, t, mode="overwrite")
    assert _rows(read_iceberg(spark, t)) == _rows(more)


def test_iceberg_snapshot_time_travel(spark, tmp_path, people):
    t = str(tmp_path / "t")
    write_iceberg(people, t)
    write_iceberg(
        spark.createDataFrame([(5, "eve", "fr")], people.schema), t, mode="append"
    )
    write_iceberg(
        spark.createDataFrame([(9, "zoe", "nz")], people.schema),
        t,
        mode="overwrite",
    )
    log = snapshots_iceberg(t)
    assert [s["operation"] for s in log] == ["append", "append", "overwrite"]
    ids = [s["snapshot-id"] for s in log]
    assert read_iceberg(spark, t, snapshot_id=ids[0]).count() == 4
    assert read_iceberg(spark, t, snapshot_id=ids[1]).count() == 5
    assert read_iceberg(spark, t).count() == 1  # current = overwrite
    with pytest.raises(FileNotFoundError):
        read_iceberg(spark, t, snapshot_id=777)


def test_iceberg_partitioned_typed_reconstruction_and_pruning(spark, tmp_path):
    """Partition values live TYPED in the manifest partition struct;
    a long partition column reconstructs as long, and a partition
    filter rides the single-scan fast path's PartitionFilters."""
    d = spark.createDataFrame(
        [(1, 10, "a"), (2, 10, "b"), (3, 20, "c")],
        "id long, bucket long, payload string",
    )
    t = str(tmp_path / "t")
    write_iceberg(d, t, partition_by=["bucket"])
    got = read_iceberg(spark, t)
    assert dict(got.dtypes)["bucket"] == "bigint"
    assert _rows(got.select("id", "bucket", "payload")) == _rows(d)
    plan = (
        got.filter(F.col("bucket") == 10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("FileScan parquet") == 1
    assert "PartitionFilters" in plan
    assert _rows(got.filter("bucket = 10").select("id")) == [(1,), (2,)]
    # partitioning is inherited on append and divergence is refused
    with pytest.raises(ValueError):
        write_iceberg(d, t, mode="append", partition_by=["payload"])


def test_iceberg_schema_drift_refused(spark, tmp_path, people):
    t = str(tmp_path / "t")
    write_iceberg(people, t)
    with pytest.raises(ValueError, match="schema mismatch"):
        write_iceberg(people.drop("country"), t, mode="append")


def test_iceberg_v2_v3_readable_v4_refused(spark, tmp_path, people):
    """format-version 2 is supported since r11 (position deletes,
    sequence scoping — tests/test_iceberg_deletes.py) and 3 since r14
    (deletion vectors — tests/test_iceberg_v3.py); a bare version
    stamp on a delete-free table reads normally either way, while an
    unknown future version still refuses."""
    t = str(tmp_path / "t")
    write_iceberg(people, t)
    mdir = os.path.join(t, "metadata")
    with open(os.path.join(mdir, "v1.metadata.json")) as fh:
        meta = json.load(fh)
    meta["format-version"] = 2
    with open(os.path.join(mdir, "v2.metadata.json"), "w") as fh:
        json.dump(meta, fh)
    with open(os.path.join(mdir, "version-hint.text"), "w") as fh:
        fh.write("2")
    assert read_iceberg(spark, t).count() == 4
    meta["format-version"] = 3
    with open(os.path.join(mdir, "v2.metadata.json"), "w") as fh:
        json.dump(meta, fh)
    assert read_iceberg(spark, t).count() == 4
    meta["format-version"] = 4
    with open(os.path.join(mdir, "v2.metadata.json"), "w") as fh:
        json.dump(meta, fh)
    with pytest.raises(NotImplementedError, match="format-version"):
        read_iceberg(spark, t)


def test_iceberg_foreign_nonhive_layout_falls_back(spark, tmp_path):
    """Manifests whose data files do NOT sit under hive dirs (legal —
    the manifest partition struct is authoritative) read via the
    grouped-union fallback with values from the manifest."""
    import shutil as _sh

    d = spark.createDataFrame(
        [(1, 10), (2, 20)], "id long, bucket long"
    )
    t = str(tmp_path / "t")
    write_iceberg(d, t, partition_by=["bucket"])
    # flatten the data files and rewrite the manifest paths
    meta_dir = os.path.join(t, "metadata")
    with open(os.path.join(meta_dir, "version-hint.text")) as fh:
        v = int(fh.read())
    with open(os.path.join(meta_dir, f"v{v}.metadata.json")) as fh:
        meta = json.load(fh)
    from archetype_spark.sources.iceberg import _abs

    snap = meta["snapshots"][-1]
    _s, manifests = avro_io.read_container(_abs(t, snap["manifest-list"]))
    for m in manifests:
        mpath = _abs(t, m["manifest_path"])
        schema, rows = avro_io.read_container(mpath)
        for r in rows:
            old = _abs(t, r["data_file"]["file_path"])
            flat = os.path.join(t, "data", os.path.basename(old))
            _sh.move(old, flat)
            # foreign writers record absolute paths — keep this one
            # absolute to exercise that resolution branch too
            r["data_file"]["file_path"] = flat
        avro_io.write_container(mpath, schema, rows)
    got = read_iceberg(spark, t)
    assert _rows(got.select("id", "bucket")) == [(1, 10), (2, 20)]


def test_iceberg_via_uniform_reader_writer(spark, tmp_path, people):
    from archetype_spark.sources import read_table, write_table

    t = str(tmp_path / "t")
    write_table(people, t, fmt="iceberg")
    with pytest.raises(FileExistsError):
        write_table(people, t, fmt="iceberg")  # default mode=error
    write_table(people, t, fmt="iceberg", mode="append")
    assert read_table(spark, t, fmt="iceberg").count() == 8
    first = snapshots_iceberg(t)[0]["snapshot-id"]
    assert (
        read_table(spark, t, fmt="iceberg", **{"snapshot-id": str(first)}).count()
        == 4
    )
    with pytest.raises(ValueError, match="unsupported reader args"):
        read_table(spark, t, fmt="iceberg", schema=people.schema)


def test_iceberg_expire_vacuum_lifecycle(spark, tmp_path, people):
    """expire_snapshots -> vacuum: overwritten files become
    physically deletable once no retained snapshot references them;
    the current snapshot keeps reading exactly its rows and expired
    time travel fails loudly."""
    from archetype_spark.sources import (
        expire_snapshots_iceberg,
        vacuum_iceberg,
    )

    t = str(tmp_path / "t")
    write_iceberg(people, t, partition_by=["country"])
    write_iceberg(
        spark.createDataFrame([(5, "eve", "fr")], people.schema), t, mode="append"
    )
    write_iceberg(
        spark.createDataFrame([(9, "zoe", "nz")], people.schema),
        t,
        mode="overwrite",
    )
    old_ids = [s["snapshot-id"] for s in snapshots_iceberg(t)][:2]
    # nothing to delete yet: the old snapshots still reference the files
    assert vacuum_iceberg(t)["data_files"] == 0
    assert expire_snapshots_iceberg(t, keep_last=1) == old_ids
    got = vacuum_iceberg(t)
    assert got["data_files"] > 0 and got["manifests"] > 0
    assert _rows(read_iceberg(spark, t).select("id")) == [(9,)]
    with pytest.raises(FileNotFoundError):
        read_iceberg(spark, t, snapshot_id=old_ids[0])


def test_iceberg_snapshot_ids_never_collide_after_expiry(spark, tmp_path, people):
    """Review late-r8: snapshot ids are max+1, not count+1 — after
    expiry a count-based id would shadow a retained snapshot and
    silently drop the intervening files from the current snapshot."""
    from archetype_spark.sources import expire_snapshots_iceberg

    t = str(tmp_path / "t")
    write_iceberg(people, t)
    one = spark.createDataFrame([(5, "eve", "fr")], people.schema)
    write_iceberg(one, t, mode="append")
    write_iceberg(one, t, mode="append")  # ids 1,2,3
    expire_snapshots_iceberg(t, keep_last=1)  # retained: [3]
    write_iceberg(one, t, mode="append")  # must get id 4, not 2
    write_iceberg(one, t, mode="append")  # must get id 5, not 3
    ids = [s["snapshot-id"] for s in snapshots_iceberg(t)]
    assert ids == [3, 4, 5]
    # no rows lost: 4 original + 4 appended singles
    assert read_iceberg(spark, t).count() == 8


def test_avro_random_schema_roundtrip_fuzz(tmp_path):
    """Seeded fuzz (repo parity-fuzz style): random record schemas
    over the supported type algebra — primitives, nullable unions,
    arrays, maps, one level of nested record — round-trip exactly
    through both codecs."""
    import random

    rng = random.Random(20260814)
    PRIMS = ["string", "long", "int", "double", "boolean", "bytes"]

    def rand_value(t):
        if isinstance(t, list):  # nullable union
            return None if rng.random() < 0.3 else rand_value(t[1])
        if isinstance(t, dict):
            if t["type"] == "array":
                return [rand_value(t["items"]) for _ in range(rng.randrange(4))]
            if t["type"] == "map":
                return {
                    f"k{i}": rand_value(t["values"])
                    for i in range(rng.randrange(4))
                }
            if t["type"] == "record":
                return {f["name"]: rand_value(f["type"]) for f in t["fields"]}
        if t == "string":
            return "".join(
                rng.choice("abc é漢") for _ in range(rng.randrange(12))
            )
        if t == "long":
            return rng.randrange(-(2**62), 2**62)
        if t == "int":
            return rng.randrange(-(2**31), 2**31)
        if t == "double":
            return rng.choice([0.0, -1.5, 1e300, -1e-300, 12345.6789])
        if t == "boolean":
            return rng.random() < 0.5
        if t == "bytes":
            return bytes(rng.randrange(256) for _ in range(rng.randrange(8)))
        raise AssertionError(t)

    def rand_field_type(depth):
        roll = rng.random()
        if roll < 0.45:
            return rng.choice(PRIMS)
        if roll < 0.6:
            return ["null", rng.choice(PRIMS)]
        if roll < 0.75:
            return {"type": "array", "items": rng.choice(PRIMS)}
        if roll < 0.9 or depth > 0:
            return {"type": "map", "values": rng.choice(PRIMS)}
        return {
            "type": "record",
            "name": f"nested{rng.randrange(10**6)}",
            "fields": [
                {"name": f"g{i}", "type": rand_field_type(depth + 1)}
                for i in range(1 + rng.randrange(3))
            ],
        }

    for trial in range(25):
        schema = {
            "type": "record",
            "name": f"fuzz{trial}",
            "fields": [
                {"name": f"f{i}", "type": rand_field_type(0)}
                for i in range(1 + rng.randrange(6))
            ],
        }
        recs = [rand_value(schema) for _ in range(rng.randrange(1, 8))]
        codec = rng.choice(["null", "deflate"])
        p = str(tmp_path / f"fz{trial}.avro")
        avro_io.write_container(p, schema, recs, codec=codec)
        _s, got = avro_io.read_container(p)
        assert got == recs, f"trial {trial} ({codec}): {got} != {recs}"


def test_iceberg_merge_upsert_and_time_travel(spark, tmp_path, people):
    """merge_iceberg: the shared MERGE resolution as one overwrite
    snapshot; the pre-merge snapshot stays time-travelable."""
    from archetype_spark.sources import merge_iceberg

    t = str(tmp_path / "t")
    write_iceberg(people, t)
    ups = spark.createDataFrame(
        [(2, "bobby", "uk"), (9, "zoe", "nz")], people.schema
    )
    merge_iceberg(spark, t, ups, keys=["id"])
    got = {r["id"]: (r["name"], r["country"]) for r in read_iceberg(spark, t).collect()}
    assert got[2] == ("bobby", "uk") and got[9] == ("zoe", "nz")
    assert len(got) == 5 and got[1] == ("ann", "us")
    first = snapshots_iceberg(t)[0]["snapshot-id"]
    assert {
        r["id"] for r in read_iceberg(spark, t, snapshot_id=first).collect()
    } == {1, 2, 3, 4}


def test_iceberg_manifest_spec_fields(spark, tmp_path, people):
    """Manifests carry TRUE record counts (from parquet footers) plus
    the v1-required data_file fields and the manifest-list summary
    counts — a spec-compliant planner answering COUNT(*) from
    metadata would get the right number, not -1."""
    from archetype_spark.sources import avro_io
    from archetype_spark.sources.iceberg import write_iceberg

    t = str(tmp_path / "t")
    write_iceberg(people, t, mode="overwrite", partition_by=["country"])
    write_iceberg(people.limit(1), t, mode="append")
    mdir = os.path.join(t, "metadata")
    mlists = sorted(
        f for f in os.listdir(mdir) if f.startswith("snap-") and f.endswith(".avro")
    )
    _s, entries = avro_io.read_container(os.path.join(mdir, mlists[-1]))
    assert sum(e["added_rows_count"] for e in entries) == people.count() + 1
    assert all(e["added_data_files_count"] >= 1 for e in entries)
    assert all(e["deleted_rows_count"] == 0 for e in entries)
    seen_rows = 0
    for e in entries:
        _s2, ments = avro_io.read_container(
            os.path.join(t, e["manifest_path"])
        )
        for m in ments:
            df_meta = m["data_file"]
            assert df_meta["record_count"] >= 0
            assert df_meta["block_size_in_bytes"] > 0
            seen_rows += df_meta["record_count"]
    assert seen_rows == people.count() + 1


def test_iceberg_append_to_pre_counts_table(spark, tmp_path, people):
    """Appending to a table whose existing manifest-list entries lack
    the (newer) optional count fields re-encodes them with nulls —
    back-compat for tables written before r9."""
    from archetype_spark.sources import avro_io
    from archetype_spark.sources.iceberg import (
        _MANIFEST_LIST_SCHEMA,
        read_iceberg,
        write_iceberg,
    )

    t = str(tmp_path / "t")
    write_iceberg(people, t, mode="overwrite")
    # strip the count fields from the current manifest list, as a
    # pre-r9 writer would have left it
    mdir = os.path.join(t, "metadata")
    mlists = sorted(
        f for f in os.listdir(mdir) if f.startswith("snap-") and f.endswith(".avro")
    )
    p = os.path.join(mdir, mlists[-1])
    _s, entries = avro_io.read_container(p)
    legacy_schema = {
        **_MANIFEST_LIST_SCHEMA,
        "fields": [
            f
            for f in _MANIFEST_LIST_SCHEMA["fields"]
            if not f["name"].endswith("_count")
        ],
    }
    legacy = [
        {k: v for k, v in e.items() if not k.endswith("_count")} for e in entries
    ]
    avro_io.write_container(p, legacy_schema, legacy)
    write_iceberg(people.limit(1), t, mode="append")
    assert read_iceberg(spark, t).count() == people.count() + 1
    _s2, merged = avro_io.read_container(
        os.path.join(
            mdir,
            sorted(
                f
                for f in os.listdir(mdir)
                if f.startswith("snap-") and f.endswith(".avro")
            )[-1],
        )
    )
    carried = [e for e in merged if e["added_rows_count"] is None]
    fresh = [e for e in merged if e["added_rows_count"] is not None]
    assert carried and fresh  # old entry carried with nulls, new with counts


def test_avro_union_branch_by_python_type(tmp_path):
    """Union encoding picks the branch by value TYPE, not null-ness:
    an int in a [null, double, long] union round-trips as an int, a
    float as a float, and an unencodable type raises."""
    from archetype_spark.sources import avro_io

    p = str(tmp_path / "u.avro")
    schema = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "x", "type": ["null", "double", "long"]},
            {"name": "y", "type": ["null", "double"]},
        ],
    }
    rows = [{"x": 7, "y": 3}, {"x": 1.5, "y": None}, {"x": None, "y": 2.5}]
    avro_io.write_container(p, schema, rows)
    _s, got = avro_io.read_container(p)
    assert got[0]["x"] == 7 and isinstance(got[0]["x"], int)
    assert isinstance(got[0]["y"], float)  # no long branch: widened
    assert got[1]["x"] == 1.5 and isinstance(got[1]["x"], float)
    assert got[2]["x"] is None
    with pytest.raises(ValueError, match="no union branch"):
        avro_io.write_container(
            str(tmp_path / "bad.avro"), schema, [{"x": "oops", "y": None}]
        )


def test_iceberg_metadata_only_count(spark, tmp_path, people):
    """count_rows_iceberg answers COUNT(*) from manifests alone and
    matches the scan, per snapshot; a live entry without a usable
    record_count is refused (wrong-count prevention), and DELETED
    entries drop out after an overwrite."""
    from archetype_spark.sources import avro_io, snapshots_iceberg
    from archetype_spark.sources.iceberg import count_rows_iceberg

    t = str(tmp_path / "t")
    write_iceberg(people, t, mode="overwrite", partition_by=["country"])
    write_iceberg(people.limit(1), t, mode="append")
    snaps = snapshots_iceberg(t)
    assert count_rows_iceberg(t) == read_iceberg(spark, t).count() == 5
    assert count_rows_iceberg(t, snaps[0]["snapshot-id"]) == 4
    # overwrite: old entries become DELETED in the new manifest set
    write_iceberg(people.limit(2), t, mode="overwrite")
    assert count_rows_iceberg(t) == 2
    # corrupt one record_count to the pre-r9 placeholder: loud
    mdir = os.path.join(t, "metadata")
    snaps = snapshots_iceberg(t)
    import json as _json

    with open(
        os.path.join(mdir, f"version-hint.text")
    ) as fh:
        v = int(fh.read())
    with open(os.path.join(mdir, f"v{v}.metadata.json")) as fh:
        meta = _json.load(fh)
    cur = next(
        s for s in meta["snapshots"]
        if s["snapshot-id"] == meta["current-snapshot-id"]
    )
    mlist = cur["manifest-list"]
    mlist_path = mlist if os.path.isabs(mlist) else os.path.join(t, mlist)
    _s, entries = avro_io.read_container(mlist_path)
    mpath = entries[-1]["manifest_path"]
    mpath = mpath if os.path.isabs(mpath) else os.path.join(t, mpath)
    ms, rows = avro_io.read_container(mpath)
    for r in rows:
        if r.get("status") != 2:
            r["data_file"]["record_count"] = -1
    avro_io.write_container(mpath, ms, rows)
    with pytest.raises(ValueError, match="record_count"):
        count_rows_iceberg(t)


def test_iceberg_streaming_sink_exactly_once(spark, tmp_path, people):
    """Structured Streaming -> Iceberg: one snapshot per micro-batch
    with the app's high-water mark in the SAME metadata commit; a
    replayed batch id is skipped, a fresh one appends — and the mark
    SURVIVES snapshot expiry (table properties, not summary stamps),
    so retention can never re-open the exactly-once window."""
    from archetype_spark.sources import (
        last_streaming_batch_iceberg,
        snapshots_iceberg,
        streaming_iceberg_sink,
    )

    src = tmp_path / "src"
    for i in range(3):
        people.filter(F.col("id") % 3 == i).coalesce(1).write.parquet(
            str(src / f"b{i}")
        )
    t = str(tmp_path / "t")
    sink = streaming_iceberg_sink(t, app_id="curation-v1")
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
    got = read_iceberg(spark, t).select("id", "name", "country")
    assert sorted(tuple(r) for r in got.collect()) == sorted(
        tuple(r) for r in people.collect()
    )
    assert last_streaming_batch_iceberg(t, "curation-v1") == 2
    assert last_streaming_batch_iceberg(t, "other-app") is None
    # replay: no new snapshot, no new rows
    n_snaps = len(snapshots_iceberg(t))
    sink(people, 1)
    assert read_iceberg(spark, t).count() == 4
    assert len(snapshots_iceberg(t)) == n_snaps
    # fresh batch appends and advances the mark
    sink(spark.createDataFrame([(9, "zoe", "nz")], people.schema), 3)
    assert read_iceberg(spark, t).count() == 5
    assert last_streaming_batch_iceberg(t, "curation-v1") == 3
    # expiry keeps the mark: expire all but the newest snapshot
    from archetype_spark.sources import expire_snapshots_iceberg

    expire_snapshots_iceberg(t, keep_last=1)
    assert last_streaming_batch_iceberg(t, "curation-v1") == 3
    sink(people, 2)  # still a replay after expiry
    assert read_iceberg(spark, t).count() == 5


def test_iceberg_sink_expire_every_bounds_metadata(spark, tmp_path, people):
    """expire_every trims retained snapshots + vacuums unreferenced
    files as the stream runs — metadata stays O(keep_last), and the
    final table still reads every appended row."""
    from archetype_spark.sources import snapshots_iceberg, streaming_iceberg_sink

    t = str(tmp_path / "t")
    sink = streaming_iceberg_sink(
        t, app_id="app", expire_every=2, keep_last=2
    )
    for b in range(6):
        sink(people.limit(1), b)
    assert len(snapshots_iceberg(t)) <= 3
    assert read_iceberg(spark, t).count() == 6


def test_iceberg_add_column_evolution(spark, tmp_path, people):
    """Additive evolution via the schemas list + current-schema-id
    flip: metadata-only, pre-evolution files read NULL, appends carry
    the new column, duplicate/unknown-type refused."""
    from archetype_spark.sources import add_column_iceberg

    t = str(tmp_path / "t")
    write_iceberg(people, t, partition_by=["country"])
    add_column_iceberg(t, "score", "double")
    got = read_iceberg(spark, t)
    assert got.schema["score"].dataType.simpleString() == "double"
    assert got.count() == 4 and got.filter("score IS NULL").count() == 4
    wide = spark.createDataFrame(
        [(5, "eve", "fr", 0.9)], "id long, name string, country string, score double"
    )
    write_iceberg(wide, t, mode="append")
    assert read_iceberg(spark, t).filter("score IS NOT NULL").count() == 1
    with pytest.raises(ValueError, match="schema mismatch"):
        write_iceberg(people, t, mode="append")
    with pytest.raises(ValueError, match="already exists"):
        add_column_iceberg(t, "score", "double")
    with pytest.raises(NotImplementedError):
        add_column_iceberg(t, "x", "uuid")
    # decimal add (r15): metadata round-trips and reads as NULL cohort
    add_column_iceberg(t, "amount", "decimal(38, 0)")
    got = read_iceberg(spark, t)
    assert got.schema["amount"].dataType.simpleString() == "decimal(38,0)"
    assert got.filter("amount IS NULL").count() == 5


def test_iceberg_incremental_changes(spark, tmp_path, people):
    """read_iceberg_changes: per-snapshot ADDED rows tagged with
    _snapshot_id, inclusive ranges, overwrite contributes its full
    rewrite, and an expired snapshot in the range fails loudly."""
    from archetype_spark.sources import (
        expire_snapshots_iceberg,
        read_iceberg_changes,
    )

    t = str(tmp_path / "t")
    write_iceberg(people, t, partition_by=["country"])  # snap 1: 4 rows
    write_iceberg(
        spark.createDataFrame([(5, "eve", "fr")], people.schema), t, mode="append"
    )  # snap 2: 1 row
    write_iceberg(people.limit(2), t, mode="overwrite")  # snap 3: 2 rows

    ch = read_iceberg_changes(spark, t, 2, 3)
    per = {
        r["_snapshot_id"]: r["n"]
        for r in ch.groupBy("_snapshot_id").agg(F.count("*").alias("n")).collect()
    }
    assert per == {2: 1, 3: 2}
    assert read_iceberg_changes(spark, t, 1).count() == 4 + 1 + 2
    assert set(
        r["country"] for r in read_iceberg_changes(spark, t, 2, 2).collect()
    ) == {"fr"}
    with pytest.raises(FileNotFoundError, match="incremental"):
        read_iceberg_changes(spark, t, 1, 99)
    expire_snapshots_iceberg(t, keep_last=1)
    with pytest.raises(FileNotFoundError, match="incremental"):
        read_iceberg_changes(spark, t, 1, 3)


def test_iceberg_changes_with_foreign_random_snapshot_ids(spark, tmp_path, people):
    """Spec-compliant engines use random 64-bit snapshot ids, not
    this writer's max+1 scheme: rewrite a table's ids to huge random
    values and read_iceberg_changes must still resolve the range
    POSITIONALLY (a dense numeric range would try to materialize
    ~10^18 ids), attributing rows via snapshot_id or the manifest's
    added_snapshot_id inheritance."""
    from archetype_spark.sources import avro_io, read_iceberg_changes

    t = str(tmp_path / "t")
    write_iceberg(people, t)  # snap 1: 4 rows
    write_iceberg(people.limit(1), t, mode="append")  # snap 2: 1 row

    remap = {1: 7274183864843139417, 2: 9023372036854775807}
    mdir = os.path.join(t, "metadata")
    with open(os.path.join(mdir, "version-hint.text")) as fh:
        v = int(fh.read())
    mpath = os.path.join(mdir, f"v{v}.metadata.json")
    with open(mpath) as fh:
        meta = json.load(fh)
    for s in meta["snapshots"]:
        s["snapshot-id"] = remap[s["snapshot-id"]]
    for e in meta["snapshot-log"]:
        e["snapshot-id"] = remap[e["snapshot-id"]]
    meta["current-snapshot-id"] = remap[meta["current-snapshot-id"]]
    with open(mpath, "w") as fh:
        json.dump(meta, fh)
    for name in os.listdir(mdir):
        p = os.path.join(mdir, name)
        if name.startswith("snap-") and name.endswith(".avro"):
            sch, rows = avro_io.read_container(p)
            for r in rows:
                r["added_snapshot_id"] = remap[r["added_snapshot_id"]]
            avro_io.write_container(p, sch, rows)
        elif name.startswith("manifest-") and name.endswith(".avro"):
            sch, rows = avro_io.read_container(p)
            for r in rows:
                # half the entries exercise the added_snapshot_id
                # inheritance path (spec: snapshot_id is optional)
                r["snapshot_id"] = (
                    None if r["snapshot_id"] == 1 else remap[r["snapshot_id"]]
                )
            avro_io.write_container(p, sch, rows)

    a, b = remap[1], remap[2]
    ch = read_iceberg_changes(spark, t, a, b)
    per = {
        r["_snapshot_id"]: r["n"]
        for r in ch.groupBy("_snapshot_id").agg(F.count("*").alias("n")).collect()
    }
    assert per == {a: 4, b: 1}
    assert read_iceberg_changes(spark, t, b, b).count() == 1
    with pytest.raises(ValueError, match="newer"):
        read_iceberg_changes(spark, t, b, a)


def test_iceberg_compact_binpacks_small_files(spark, tmp_path, people):
    """compact_iceberg: same OPTIMIZE contract on the Iceberg face —
    rows preserved, one overwrite snapshot, expiry+vacuum reclaims
    the small files, streaming marks untouched."""
    from archetype_spark.sources import (
        compact_iceberg,
        expire_snapshots_iceberg,
        last_streaming_batch_iceberg,
        streaming_iceberg_sink,
        vacuum_iceberg,
    )

    t = str(tmp_path / "t")
    sink = streaming_iceberg_sink(t, app_id="app")
    for b in range(5):
        sink(spark.createDataFrame([(b, f"p{b}", "us")], people.schema), b)
    compact_iceberg(spark, t, target_files=1, sort_by=["id"])
    assert read_iceberg(spark, t).count() == 5
    assert last_streaming_batch_iceberg(t, "app") == 4  # marks survive
    expire_snapshots_iceberg(t, keep_last=1)
    got = vacuum_iceberg(t)
    assert got["data_files"] >= 5
    assert read_iceberg(spark, t).count() == 5


def test_iceberg_nested_and_decimal_roundtrip(spark, tmp_path):
    """struct / list / map / decimal columns round-trip through the
    protocol-native writer with spec field-id assignment (direct
    children first, then each child's nested ids — the
    assignFreshIds order); appends, time travel, positional deletes
    and the changes reader all compose over the nested table."""
    from decimal import Decimal

    from archetype_spark.sources import read_iceberg_changes
    from archetype_spark.sources.iceberg import (
        _current_ice_schema,
        _load_metadata,
        delete_where_iceberg,
    )

    ddl = (
        "id long, emb array<float>, m map<string,long>, "
        "s struct<a:long,b:string>, amt decimal(10,2)"
    )
    t = str(tmp_path / "t")
    df = spark.createDataFrame(
        [
            (1, [0.5, 1.5], {"k": 1}, (10, "x"), Decimal("1.50")),
            (2, [2.0], {"k": 2, "j": 3}, (20, "y"), Decimal("2.25")),
            (3, None, None, None, None),
        ],
        ddl,
    )
    write_iceberg(df.coalesce(1), t)
    meta = _load_metadata(t)
    snap1 = meta["current-snapshot-id"]
    # field-id assignment: top-level 1..5, then emb.element=6,
    # m.key=7, m.value=8, s.a=9, s.b=10
    fields = {f["name"]: f for f in _current_ice_schema(meta)["fields"]}
    assert [fields[n]["id"] for n in ("id", "emb", "m", "s", "amt")] == [
        1, 2, 3, 4, 5,
    ]
    assert fields["emb"]["type"]["element-id"] == 6
    assert fields["m"]["type"]["key-id"] == 7
    assert fields["m"]["type"]["value-id"] == 8
    assert [f["id"] for f in fields["s"]["type"]["fields"]] == [9, 10]
    assert fields["amt"]["type"] == "decimal(10, 2)"
    assert meta["last-column-id"] == 10
    got = read_iceberg(spark, t)
    assert got.schema.simpleString() == df.schema.simpleString()
    by_id = {r.id: r for r in got.collect()}
    assert by_id[1].emb == [0.5, 1.5] and by_id[1].m == {"k": 1}
    assert tuple(by_id[2].s) == (20, "y")
    assert by_id[2].amt == Decimal("2.25") and by_id[3].amt is None
    # append + positional delete compose
    write_iceberg(
        spark.createDataFrame(
            [(4, [9.0], {"z": 9}, (40, "z"), Decimal("4.00"))], ddl
        ).coalesce(1),
        t,
        mode="append",
    )
    delete_where_iceberg(spark, t, F.col("id") == 2)
    assert sorted(r.id for r in read_iceberg(spark, t).collect()) == [1, 3, 4]
    # time travel sees the pre-delete nested values
    tt = {r.id: r for r in read_iceberg(spark, t, snapshot_id=snap1).collect()}
    assert sorted(tt) == [1, 2, 3] and tt[2].m == {"k": 2, "j": 3}
    # changelog over the delete emits the nested tombstone row
    ch = read_iceberg_changes(
        spark, t, from_snapshot=snap1, include_deletes=True
    )
    dels = [r for r in ch.collect() if r._change_type == "delete"]
    assert len(dels) == 1 and dels[0].id == 2 and dels[0].emb == [2.0]


def test_iceberg_embeddings_roundtrip(spark, tmp_path):
    """The engine's own embeddings table (array<float>) — the r14
    verdict's named gap — writes, appends, reads and time-travels."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    t = str(tmp_path / "emb")
    write_iceberg(emb.filter(F.col("vec_id") % 2 == 0), t)
    from archetype_spark.sources.iceberg import _load_metadata

    snap1 = _load_metadata(t)["current-snapshot-id"]
    write_iceberg(emb.filter(F.col("vec_id") % 2 == 1), t, mode="append")
    got = read_iceberg(spark, t)
    assert got.count() == emb.count()
    assert (
        got.schema["embedding"].dataType.simpleString() == "array<float>"
    )
    # value fidelity: first component sums match exactly
    s_ice = got.select(
        F.sum(F.element_at("embedding", 1).cast("double")).alias("s")
    ).first()["s"]
    s_src = emb.select(
        F.sum(F.element_at("embedding", 1).cast("double")).alias("s")
    ).first()["s"]
    assert abs(s_ice - s_src) < 1e-6
    assert read_iceberg(spark, t, snapshot_id=snap1).count() == emb.filter(
        F.col("vec_id") % 2 == 0
    ).count()


def test_iceberg_distributed_vacuum_matches_driver_walk(
    spark, tmp_path, people
):
    """vacuum_iceberg(distributed=True): the executor-side listing +
    anti-join + deletion (sources/maintenance.py) reclaims exactly
    the same files the driver walk would — identical counts on twin
    tables, survivors read exactly, superseded v3 deletion vectors
    (puffin, non-parquet suffix) reclaimed too, and re-running is a
    zero no-op."""
    from archetype_spark.sources import (
        expire_snapshots_iceberg,
        vacuum_iceberg,
    )
    from archetype_spark.sources.iceberg import (
        delete_where_iceberg,
        upgrade_iceberg,
    )

    def build(path):
        df = spark.createDataFrame(
            [(i, "x" if i % 2 else "y", i * 10) for i in range(1, 9)],
            "id long, p string, v long",
        ).coalesce(1)
        write_iceberg(df, path, partition_by=["p"])
        upgrade_iceberg(path, 3)
        delete_where_iceberg(spark, path, F.col("id") == 2)  # DV 1
        delete_where_iceberg(spark, path, F.col("id") == 4)  # supersedes
        write_iceberg(
            spark.createDataFrame(
                [(20, "x", 200)], "id long, p string, v long"
            ).coalesce(1),
            path,
            mode="append",
        )
        expire_snapshots_iceberg(path, keep_last=1)

    ta, tb = str(tmp_path / "driver"), str(tmp_path / "dist")
    build(ta)
    build(tb)
    want = vacuum_iceberg(ta)
    got = vacuum_iceberg(tb, spark=spark, distributed=True)
    assert got == want and got["data_files"] > 0
    assert sorted(r.id for r in read_iceberg(spark, tb).collect()) == sorted(
        r.id for r in read_iceberg(spark, ta).collect()
    )
    # no superseded puffin blob survived the distributed reclaim
    import glob as _glob

    live_puffin = _glob.glob(os.path.join(tb, "data", "**", "*.puffin"),
                             recursive=True)
    assert len(live_puffin) == len(
        _glob.glob(os.path.join(ta, "data", "**", "*.puffin"), recursive=True)
    )
    # idempotent
    again = vacuum_iceberg(tb, spark=spark, distributed=True)
    assert again["data_files"] == 0
    with pytest.raises(ValueError, match="SparkSession"):
        vacuum_iceberg(tb, distributed=True)


def test_iceberg_column_bounds_prune_scan(spark, tmp_path):
    """Manifest lower/upper column bounds (r15): a range-clustered
    write records per-file MIN/MAX for primitive columns, and
    scan_filter prunes data files by bound intersection WITHOUT any
    partition spec — the sorted-100 TB point/range probe shape. The
    row-level filter re-applies, so results stay exact; string
    columns record no bounds (parquet may truncate their stats)."""
    from archetype_spark.sources.iceberg import (
        _current_ice_schema,
        _live_entries,
        _load_metadata,
    )

    df = spark.range(0, 1000).select(
        F.col("id").cast("long").alias("id"),
        F.date_add(
            F.lit("2024-01-01").cast("date"),
            (F.col("id") / 20).cast("int"),
        ).alias("d"),
        F.timestamp_seconds(F.col("id") * 3600).alias("ts"),
        F.concat(F.lit("doc-"), F.col("id")).alias("name"),
    )
    t = str(tmp_path / "t")
    write_iceberg(df.repartitionByRange(8, "id").sortWithinPartitions("id"), t)
    meta = _load_metadata(t)
    snap = {s["snapshot-id"]: s for s in meta["snapshots"]}[
        meta["current-snapshot-id"]
    ]
    data, _d, _e = _live_entries(t, snap, meta, with_bounds=True)
    assert all(e[5] is not None and e[6] is not None for e in data)
    ids = {
        f["name"]: int(f["id"]) for f in _current_ice_schema(meta)["fields"]
    }
    recorded = {kv["key"] for kv in data[0][5]}
    assert ids["id"] in recorded and ids["ts"] in recorded
    assert ids["name"] not in recorded  # strings: no bounds by design

    full = read_iceberg(spark, t)
    n_all = len(full.inputFiles())
    assert n_all >= 6
    pruned = read_iceberg(spark, t, scan_filter={"id": (100, 200)})
    assert len(pruned.inputFiles()) < n_all
    assert sorted(r.id for r in pruned.collect()) == list(range(100, 200))
    probe = read_iceberg(spark, t, scan_filter={"id": 500})
    assert len(probe.inputFiles()) <= 2
    assert [r.id for r in probe.collect()] == [500]
    # date + timestamp bounds prune too, exactly
    import datetime

    dr = read_iceberg(
        spark,
        t,
        scan_filter={
            "d": (datetime.date(2024, 1, 11), datetime.date(2024, 1, 16))
        },
    )
    assert len(dr.inputFiles()) < n_all
    assert sorted(r.id for r in dr.collect()) == list(range(200, 300))
    # a predicate matching nothing prunes everything
    none = read_iceberg(spark, t, scan_filter={"id": (5000, 6000)})
    assert none.count() == 0


def test_iceberg_bounds_conservative_and_foreign_strings(spark, tmp_path):
    """Bound-less entries (older writers, ORC commits) keep every
    file — scan_filter stays exact; FOREIGN string bounds decode and
    prune; undecodable bounds keep the file."""
    from archetype_spark.sources.iceberg import _entry_survives_bounds

    # ORC commit records no bounds; the filter still answers exactly
    t = str(tmp_path / "orc")
    df = spark.range(0, 100).select(F.col("id").cast("long").alias("id"))
    write_iceberg(df, t, file_format="orc")
    got = read_iceberg(spark, t, scan_filter={"id": (10, 20)})
    assert sorted(r.id for r in got.collect()) == list(range(10, 20))

    fi = {"name": (2, "string"), "n": (3, "long")}
    lower = [{"key": 2, "value": b"aaa"}]
    upper = [{"key": 2, "value": b"mmm"}]
    assert not _entry_survives_bounds(lower, upper, {"name": "zzz"}, fi)
    assert _entry_survives_bounds(lower, upper, {"name": "bbb"}, fi)
    # range form on strings
    assert not _entry_survives_bounds(
        lower, upper, {"name": ("nnn", None)}, fi
    )
    # undecodable bound bytes keep the file
    bad = [{"key": 3, "value": b"\x01"}]  # too short for a long
    assert _entry_survives_bounds(bad, bad, {"n": 7}, fi)
    # unfiltered columns' bounds are irrelevant
    assert _entry_survives_bounds(lower, upper, {"n": 7}, fi)


def test_timestamp_bounds_exact_micros_past_double_precision():
    """_bound_bytes/_to_bound_domain must derive epoch micros from
    integer timedelta components: the old total_seconds()*1e6 path
    rounds through one double, which is off by up to several micros
    past 2^53 us (~year 2255) — a wrongly-rounded bound can prune a
    file whose true range intersects the probe."""
    import datetime as dt
    import struct

    from archetype_spark.sources.iceberg import (
        _bound_bytes,
        _epoch_micros,
        _to_bound_domain,
    )

    # 2^53 us past epoch lands in 2255; +1 us is not representable in
    # double, so the float path misrounds it to an even neighbor.
    base = dt.datetime(1970, 1, 1) + dt.timedelta(microseconds=2**53)
    for odd_off in (1, 3, 5):
        ts = base + dt.timedelta(microseconds=odd_off)
        exact = 2**53 + odd_off
        assert _epoch_micros(ts) == exact
        assert _to_bound_domain(ts, "timestamp") == exact
        packed = _bound_bytes(ts, "timestamp")
        assert struct.unpack("<q", packed)[0] == exact
        # the double path provably differs on these inputs
        assert int((ts - dt.datetime(1970, 1, 1)).total_seconds() * 1e6) != exact

    # sanity: ordinary modern timestamps are unchanged
    ts = dt.datetime(2026, 8, 18, 1, 2, 3, 123456)
    assert _to_bound_domain(ts, "timestamp") == int(
        (ts - dt.datetime(1970, 1, 1)) / dt.timedelta(microseconds=1)
    )
