"""Protocol-native Hudi COPY_ON_WRITE (sources/hudi.py): layout pins
(timeline transition files, hoodie.properties, spec file names, meta
columns), snapshot isolation (newest file slice only; uncommitted and
obsolete base files invisible), copy-on-write upsert/delete incl. the
empty-file shadow for fully-deleted groups, time travel, metadata-only
counts, and the loud refusals (MERGE_ON_READ, replacecommit)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from archetype_spark.sources.hudi import (
    count_rows_hudi,
    delete_by_key_hudi,
    hudi_timeline,
    read_hudi,
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


def test_create_layout_and_read(spark, tmp_path, people):
    t = str(tmp_path / "t")
    out = write_hudi(people, t, record_key="id", partition_by="grp")
    assert out["files_written"] == 2  # one group per grp partition
    # timeline transition files + completed commit
    instant = out["instant"]
    hd = os.path.join(t, ".hoodie")
    assert os.path.isfile(os.path.join(hd, f"{instant}.commit"))
    assert os.path.isfile(os.path.join(hd, f"{instant}.commit.requested"))
    assert os.path.isfile(os.path.join(hd, f"{instant}.inflight"))
    props = open(os.path.join(hd, "hoodie.properties")).read()
    assert "hoodie.table.type=COPY_ON_WRITE" in props
    assert "hoodie.table.recordkey.fields=id" in props
    # hive-style partition dirs, spec-shaped file names
    names = [
        n
        for n in os.listdir(os.path.join(t, "grp=a"))
        if n.endswith(".parquet")
    ]
    assert len(names) == 1
    file_id, token, stamp = names[0][: -len(".parquet")].split("_")
    assert token == "0-0-0" and stamp == instant
    assert _rows(spark, t) == [
        (1, "ann", "a", 10), (2, "bob", "b", 20),
        (3, "cho", "a", 30), (4, "dee", "b", 40),
    ]
    # meta columns stamped in the data files
    m = read_hudi(spark, t, with_meta=True)
    r = m.filter(F.col("id") == 1).collect()[0]
    assert r["_hoodie_commit_time"] == instant
    assert r["_hoodie_record_key"] == "1"
    assert r["_hoodie_partition_path"] == "grp=a"
    assert r["_hoodie_file_name"].endswith(f"_{instant}.parquet")
    assert count_rows_hudi(t) == 4


def test_upsert_rewrites_slice_and_inserts_fresh(spark, tmp_path, people):
    t = str(tmp_path / "t")
    write_hudi(people, t, record_key="id", partition_by="grp")
    upsert_hudi(
        spark,
        t,
        spark.createDataFrame(
            [(2, "bob2", "b", 21), (9, "zed", "c", 90)],
            "id long, name string, grp string, v long",
        ),
    )
    assert _rows(spark, t) == [
        (1, "ann", "a", 10), (2, "bob2", "b", 21),
        (3, "cho", "a", 30), (4, "dee", "b", 40), (9, "zed", "c", 90),
    ]
    # the obsolete base file is still on disk (copy-on-write) but the
    # snapshot never opens it
    b_files = [
        n
        for n in os.listdir(os.path.join(t, "grp=b"))
        if n.endswith(".parquet")
    ]
    assert len(b_files) == 2  # old slice + rewrite
    assert count_rows_hudi(t) == 5
    # fresh partition dir for the new key
    assert os.path.isdir(os.path.join(t, "grp=c"))


def test_delete_with_empty_group_shadow(spark, tmp_path, people):
    t = str(tmp_path / "t")
    write_hudi(people, t, record_key="id", partition_by="grp")
    # kill EVERY row of partition a's single group
    delete_by_key_hudi(
        spark, t, spark.createDataFrame([(1,), (3,)], "id long")
    )
    assert _rows(spark, t) == [(2, "bob", "b", 20), (4, "dee", "b", 40)]
    assert count_rows_hudi(t) == 2
    # the shadow is an explicit EMPTY base file, not an absent slice
    a_files = sorted(
        n
        for n in os.listdir(os.path.join(t, "grp=a"))
        if n.endswith(".parquet")
    )
    assert len(a_files) == 2
    # no-op delete: nothing matches
    out = delete_by_key_hudi(
        spark, t, spark.createDataFrame([(77,)], "id long")
    )
    assert out["files_written"] == 0


def test_time_travel_and_timeline(spark, tmp_path, people):
    t = str(tmp_path / "t")
    write_hudi(people, t, record_key="id", partition_by="grp")
    t0 = hudi_timeline(t)[0]
    upsert_hudi(
        spark,
        t,
        spark.createDataFrame(
            [(1, "ann2", "a", 11)], "id long, name string, grp string, v long"
        ),
    )
    assert len(hudi_timeline(t)) == 2
    assert _rows(spark, t, as_of=t0) == [
        (1, "ann", "a", 10), (2, "bob", "b", 20),
        (3, "cho", "a", 30), (4, "dee", "b", 40),
    ]
    assert count_rows_hudi(t, as_of=t0) == 4
    assert _rows(spark, t)[0] == (1, "ann2", "a", 11)


def test_uncommitted_instant_is_invisible(spark, tmp_path, people):
    """A crashed write: data file + requested/inflight markers but no
    completed .commit — the timeline-only reader never sees it."""
    import shutil

    t = str(tmp_path / "t")
    write_hudi(people, t, record_key="id", partition_by="grp")
    before = _rows(spark, t)
    # simulate the crash: clone a base file under a newer instant and
    # leave only transition markers on the timeline
    a_dir = os.path.join(t, "grp=a")
    name = next(n for n in os.listdir(a_dir) if n.endswith(".parquet"))
    fid, tok, stamp = name[: -len(".parquet")].split("_")
    ghost = str(int(stamp) + 1)
    shutil.copy(
        os.path.join(a_dir, name),
        os.path.join(a_dir, f"{fid}_{tok}_{ghost}.parquet"),
    )
    for suffix in (".commit.requested", ".inflight"):
        open(os.path.join(t, ".hoodie", f"{ghost}{suffix}"), "w").close()
    assert _rows(spark, t) == before
    assert count_rows_hudi(t) == 4


def test_unpartitioned_table(spark, tmp_path, people):
    t = str(tmp_path / "t")
    write_hudi(people, t, record_key="id", buckets=2)
    assert _rows(spark, t) == sorted(tuple(r) for r in people.collect())
    m = read_hudi(spark, t, with_meta=True).limit(1).collect()[0]
    assert m["_hoodie_partition_path"] == ""
    # base files live directly under the table root
    root_parquets = [
        n for n in os.listdir(t) if n.endswith(".parquet")
    ]
    assert len(root_parquets) == 2


def test_refusals_are_loud(spark, tmp_path, people):
    t = str(tmp_path / "t")
    write_hudi(people, t, record_key="id")
    with pytest.raises(FileExistsError):
        write_hudi(people, t, record_key="id")
    with pytest.raises(FileNotFoundError, match="not a Hudi table"):
        read_hudi(spark, str(tmp_path / "nope"))
    # an unknown table type refuses by name
    pfile = os.path.join(t, ".hoodie", "hoodie.properties")
    body = open(pfile).read().replace("COPY_ON_WRITE", "MERGE_ON_TREE")
    open(pfile, "w").write(body)
    with pytest.raises(NotImplementedError, match="MERGE_ON_TREE"):
        read_hudi(spark, t)
    body = body.replace("MERGE_ON_TREE", "COPY_ON_WRITE")
    open(pfile, "w").write(body)
    # compaction refuses a COPY_ON_WRITE table
    from archetype_spark.sources.hudi import compact_hudi

    with pytest.raises(ValueError, match="MERGE_ON_READ"):
        compact_hudi(spark, t)


def test_streaming_sink_exactly_once(spark, tmp_path):
    """The foreachBatch body: bootstrap on batch 0, append on later
    batches, SKIP a replayed batch id (the crash-recovery path) —
    the mark rides the same atomic .commit file as the rows."""
    from archetype_spark.sources.hudi import (
        last_streaming_batch_hudi,
        streaming_hudi_sink,
    )

    t = str(tmp_path / "t")
    sink = streaming_hudi_sink(t, "id", app_id="cur-v1")
    b0 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string")
    b1 = spark.createDataFrame([(3, "c")], "id long, s string")
    sink(b0, 0)
    assert last_streaming_batch_hudi(t, "cur-v1") == 0
    sink(b1, 1)
    assert last_streaming_batch_hudi(t, "cur-v1") == 1
    n_before = len(hudi_timeline(t))
    # replay batch 1 (restart semantics): must be a no-op
    sink(b1, 1)
    assert len(hudi_timeline(t)) == n_before
    assert count_rows_hudi(t) == 3
    rows = sorted(
        tuple(r) for r in read_hudi(spark, t).select("id", "s").collect()
    )
    assert rows == [(1, "a"), (2, "b"), (3, "c")]
    # a different app's mark is independent
    assert last_streaming_batch_hudi(t, "other") is None


def test_upsert_duplicate_keys_refuse_or_precombine(spark, tmp_path, people):
    """Two update rows for one record key: without a precombine field
    the upsert refuses loudly (both landing would leave duplicate
    keys in the snapshot); with one, the largest precombine value
    wins — real Hudi's precombine semantics."""
    t = str(tmp_path / "t")
    write_hudi(people, t, record_key="id", partition_by="grp")
    dup = spark.createDataFrame(
        [(2, "bob-old", "b", 21), (2, "bob-new", "b", 22)],
        "id long, name string, grp string, v long",
    )
    with pytest.raises(ValueError, match="duplicate record keys"):
        upsert_hudi(spark, t, dup)
    upsert_hudi(spark, t, dup, precombine="v")
    assert _rows(spark, t) == [
        (1, "ann", "a", 10), (2, "bob-new", "b", 22),
        (3, "cho", "a", 30), (4, "dee", "b", 40),
    ]
    with pytest.raises(ValueError, match="precombine field"):
        upsert_hudi(spark, t, dup, precombine="nope")


def test_insert_mode_key_mismatch_refuses(spark, tmp_path, people):
    """mode='insert' must not silently re-key: a caller-passed
    record_key or partition_by that disagrees with the table's
    hoodie.properties raises instead of keying rows by a field the
    caller did not choose."""
    t = str(tmp_path / "t")
    write_hudi(people, t, record_key="id", partition_by="grp")
    with pytest.raises(ValueError, match="disagrees with the table"):
        write_hudi(people, t, record_key="v", mode="insert")
    with pytest.raises(ValueError, match="disagrees with the table"):
        write_hudi(
            people, t, record_key="id", partition_by="name", mode="insert"
        )
    # matching (or defaulted) fields still insert
    more = spark.createDataFrame(
        [(9, "zed", "c", 90)], "id long, name string, grp string, v long"
    )
    write_hudi(more, t, record_key="id", mode="insert")
    assert count_rows_hudi(t) == 5


def test_write_hudi_overwrites_foreign_meta(spark, tmp_path, people):
    """Public ingest faces stamp ALL five meta columns fresh: feeding
    read_hudi(..., with_meta=True) output into write_hudi must not
    smuggle the SOURCE table's commit times / file names into the new
    table (stale _hoodie_file_name would route later upserts to
    non-existent file groups -> silent duplicate keys)."""
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    write_hudi(people, src, record_key="id", partition_by="grp")
    write_hudi(
        read_hudi(spark, src, with_meta=True), dst,
        record_key="id", partition_by="grp",
    )
    instants = hudi_timeline(dst)
    assert len(instants) == 1
    rows = read_hudi(spark, dst, with_meta=True).collect()
    on_disk = {
        n
        for _r, _d, files in os.walk(dst)
        for n in files
        if n.endswith(".parquet")
    }
    for r in rows:
        assert r["_hoodie_commit_time"] == instants[0]  # not src's
        assert r["_hoodie_file_name"] in on_disk  # names a REAL file
    # the re-keyed table stays upsert-consistent: no duplicates
    upsert_hudi(
        spark, dst,
        spark.createDataFrame(
            [(2, "bob2", "b", 21)], "id long, name string, grp string, v long"
        ),
    )
    assert _rows(spark, dst) == [
        (1, "ann", "a", 10), (2, "bob2", "b", 21),
        (3, "cho", "a", 30), (4, "dee", "b", 40),
    ]


def test_cow_rewrite_restamps_survivor_file_name(spark, tmp_path, people):
    """Rewrite survivors keep commit_time/seqno/key/partition but
    _hoodie_file_name must name the file the row NOW lives in (the
    post-rewrite base file), matching real merge-handle output."""
    t = str(tmp_path / "t")
    write_hudi(people, t, record_key="id", partition_by="grp")
    first = hudi_timeline(t)[0]
    upsert_hudi(
        spark, t,
        spark.createDataFrame(
            [(2, "bob2", "b", 21)], "id long, name string, grp string, v long"
        ),
    )
    second = hudi_timeline(t)[-1]
    m = {r["id"]: r for r in read_hudi(spark, t, with_meta=True).collect()}
    # id=4 shares grp=b's file group with id=2: rewritten as survivor
    assert m[4]["_hoodie_commit_time"] == first  # meta preserved
    assert m[4]["_hoodie_file_name"].endswith(f"_{second}.parquet")
    assert m[4]["_hoodie_file_name"] == m[2]["_hoodie_file_name"]
    # untouched group (grp=a) keeps its original file name
    assert m[1]["_hoodie_file_name"].endswith(f"_{first}.parquet")
