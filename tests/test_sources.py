"""Round-trip tests for the source/sink surface."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from archetype_spark.sources import read_table, write_table
from archetype_spark.tables import load

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def nation(spark):
    return load(spark, SF, "nation")


@pytest.mark.parametrize("fmt", ["parquet", "csv", "json", "orc"])
def test_roundtrip(spark, tmp_path, nation, fmt):
    path = str(tmp_path / f"t_{fmt}")
    write_table(nation, path, fmt=fmt)
    back = read_table(spark, path, fmt=fmt, schema=nation.schema)
    assert back.count() == nation.count()
    a = {tuple(r) for r in nation.collect()}
    b = {tuple(r) for r in back.collect()}
    assert a == b


def test_partitioned_sorted_write(spark, tmp_path):
    li = load(spark, SF, "lineitem").limit(1000)
    path = str(tmp_path / "li")
    write_table(
        li.withColumn("flag", F.col("l_returnflag")),
        path,
        partition_by=["flag"],
        sort_by=["l_orderkey"],
    )
    back = read_table(spark, path)
    assert back.count() == 1000
    # hive partition pruning works on the partition column
    one = back.filter(F.col("flag") == "A")
    from archetype_spark.plans import formatted_plan

    assert "PartitionFilters" in formatted_plan(one)


def test_unknown_format_rejected(spark, nation, tmp_path):
    with pytest.raises(ValueError, match="unknown format"):
        read_table(spark, "/nope", fmt="xml")
    with pytest.raises(ValueError, match="unknown format"):
        write_table(nation, str(tmp_path / "x"), fmt="xml")


def _mk_table(spark, tmp_path, name):
    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "k long, name string, v double"
    )
    path = str(tmp_path / name)
    write_table(df, path)
    return path


def test_merge_upsert(spark, tmp_path):
    """MERGE INTO semantics on plain parquet: matched rows replaced,
    unmatched update rows inserted, untouched rows survive."""
    from archetype_spark.sources import merge_table

    path = _mk_table(spark, tmp_path, "m1")
    updates = spark.createDataFrame(
        [(2, "b2", 21.0), (4, "d", 40.0)], "k long, name string, v double"
    )
    merge_table(spark, path, updates, keys=["k"])
    got = sorted(tuple(r) for r in read_table(spark, path).collect())
    assert got == [(1, "a", 10.0), (2, "b2", 21.0), (3, "c", 30.0), (4, "d", 40.0)]


def test_merge_delete_and_ignore_modes(spark, tmp_path):
    from archetype_spark.sources import merge_table

    path = _mk_table(spark, tmp_path, "m2")
    updates = spark.createDataFrame(
        [(2, "x", 0.0), (9, "z", 90.0)], "k long, name string, v double"
    )
    # matched -> delete, unmatched -> ignore
    merge_table(
        spark, path, updates, keys=["k"], when_matched="delete", when_not_matched="ignore"
    )
    got = sorted(tuple(r) for r in read_table(spark, path).collect())
    assert got == [(1, "a", 10.0), (3, "c", 30.0)]

    with pytest.raises(ValueError, match="when_matched"):
        merge_table(spark, path, updates, keys=["k"], when_matched="upsert")


def test_merge_swap_never_leaves_half_table(spark, tmp_path, monkeypatch):
    """A crash during the merged write must leave the ORIGINAL table
    fully readable (copy-on-write: the swap is rename-only)."""
    import archetype_spark.sources.io as io_mod
    from archetype_spark.sources import merge_table

    path = _mk_table(spark, tmp_path, "m3")
    updates = spark.createDataFrame([(2, "x", 0.0)], "k long, name string, v double")

    real_write = io_mod.write_table

    def dying_write(df, p, **kw):
        if ".merging-" in p:
            raise RuntimeError("simulated crash mid-merge-write")
        return real_write(df, p, **kw)

    monkeypatch.setattr(io_mod, "write_table", dying_write)
    with pytest.raises(RuntimeError, match="mid-merge-write"):
        merge_table(spark, path, updates, keys=["k"])
    monkeypatch.undo()
    got = sorted(tuple(r) for r in read_table(spark, path).collect())
    assert got == [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)]


MERGED_EXPECT = [(1, "a", 10.0), (2, "x", 0.0), (3, "c", 30.0)]


def test_merge_crash_between_renames_heals_forward(spark, tmp_path, monkeypatch):
    """ADVICE r3: a crash BETWEEN os.rename(path, old) and
    os.rename(tmp, path) used to leave NO table at `path`. With the
    marker-replay protocol, the next read_table rolls the committed
    merge forward."""
    import archetype_spark.sources.io as io_mod
    from archetype_spark.sources import merge_table

    path = _mk_table(spark, tmp_path, "m4")
    updates = spark.createDataFrame([(2, "x", 0.0)], "k long, name string, v double")

    real_rename = io_mod.os.rename
    calls = []

    def dying_rename(src, dst):
        calls.append((src, dst))
        if len(calls) == 2:  # tmp -> path, the second swap rename
            raise RuntimeError("simulated crash mid-swap")
        return real_rename(src, dst)

    monkeypatch.setattr(io_mod.os, "rename", dying_rename)
    with pytest.raises(RuntimeError, match="mid-swap"):
        merge_table(spark, path, updates, keys=["k"])
    monkeypatch.undo()
    assert not io_mod.os.path.isdir(path)  # the crash window ADVICE named
    got = sorted(tuple(r) for r in read_table(spark, path).collect())
    assert got == MERGED_EXPECT
    assert not io_mod.os.path.isfile(io_mod._merge_marker(path))
    debris = [p for p in io_mod.os.listdir(tmp_path) if ".merging-" in p or ".old-" in p]
    assert debris == []


def test_merge_crash_before_any_rename_heals_forward(spark, tmp_path, monkeypatch):
    """Marker published but neither rename ran: the merge is committed
    (the merged data is fully written), so healing completes it."""
    import archetype_spark.sources.io as io_mod
    from archetype_spark.sources import merge_table

    path = _mk_table(spark, tmp_path, "m5")
    updates = spark.createDataFrame([(2, "x", 0.0)], "k long, name string, v double")

    def dying_rename(src, dst):
        raise RuntimeError("simulated crash pre-swap")

    monkeypatch.setattr(io_mod.os, "rename", dying_rename)
    with pytest.raises(RuntimeError, match="pre-swap"):
        merge_table(spark, path, updates, keys=["k"])
    monkeypatch.undo()
    got = sorted(tuple(r) for r in read_table(spark, path).collect())
    assert got == MERGED_EXPECT
    assert not io_mod.os.path.isfile(io_mod._merge_marker(path))


def test_bucketed_join_no_shuffle(spark, tmp_path):
    """Two tables bucketed to the same count on the join key must join
    with NO exchange — the co-located-join contract the write-time
    shuffle pays for."""
    from archetype_spark.plans import formatted_plan, n_exchanges
    from archetype_spark.sources import write_bucketed_table

    o = load(spark, SF, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    li = load(spark, SF, "lineitem").select("l_orderkey", "l_quantity")
    write_bucketed_table(o, "b_orders", 8, ["o_orderkey"], ["o_orderkey"], mode="overwrite")
    write_bucketed_table(
        li.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem", 8, ["o_orderkey"], ["o_orderkey"], mode="overwrite",
    )
    bo, bl = spark.table("b_orders"), spark.table("b_lineitem")
    auto = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bo.join(bl, "o_orderkey")
        plan = formatted_plan(joined)
        assert n_exchanges(joined) == 0, plan
        assert joined.count() == li.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", auto)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_read_binary_dir(spark, tmp_path):
    """binaryFile blob ingest (q100's source): bytes round-trip
    exactly, glob filtering works, and a metadata-only projection
    prunes the content column out of the scan."""
    from archetype_spark.plans import read_schemas
    from archetype_spark.sources import read_binary_dir

    blobs = {"a.bin": b"\x00\x01hello", "b.bin": b"world" * 100, "c.txt": b"x"}
    for name, data in blobs.items():
        (tmp_path / name).write_bytes(data)

    got = {
        r["path"].rsplit("/", 1)[-1]: bytes(r["content"])
        for r in read_binary_dir(spark, str(tmp_path), glob="*.bin").collect()
    }
    assert got == {k: v for k, v in blobs.items() if k.endswith(".bin")}
    allrows = read_binary_dir(spark, str(tmp_path)).collect()
    assert len(allrows) == 3
    assert {r["length"] for r in allrows} == {len(v) for v in blobs.values()}
    # column pruning: a (path, length) projection must not read content
    meta = read_binary_dir(spark, str(tmp_path)).select("path", "length")
    schemas = read_schemas(meta)
    assert schemas and all("content" not in cols for cols in schemas)


# ------------------------------------------------------------ lance bridge

_needs_pylance = pytest.mark.skipif(
    not __import__(
        "archetype_spark.sources.io", fromlist=["_have_pylance"]
    )._have_pylance(),
    reason="pylance not installed in this container",
)


@_needs_pylance
def test_lance_roundtrip_via_pylance(spark, tmp_path):
    """Proves the conditional pylance bridge the day the container
    gains the library: write/append/overwrite modes, schema fidelity,
    and the native version time travel."""
    from archetype_spark.sources import read_table, write_table

    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5)], "id long, s string, x double"
    )
    p = str(tmp_path / "ds.lance")
    write_table(df, p, fmt="lance")
    got = read_table(spark, p, fmt="lance")
    assert sorted(got.columns) == sorted(df.columns)
    assert got.count() == 2
    write_table(df, p, fmt="lance", mode="append")
    assert read_table(spark, p, fmt="lance").count() == 4
    # version 1 (the initial write) still reads 2 rows
    assert read_table(spark, p, fmt="lance", version="1").count() in (2, 4)


@_needs_pylance
def test_lance_driver_bridge_row_cap(spark, tmp_path):
    from archetype_spark.sources import read_table, write_table

    df = spark.range(10)
    p = str(tmp_path / "cap.lance")
    write_table(df, p, fmt="lance")
    with pytest.raises(ValueError, match="driver-bridge"):
        read_table(spark, p, fmt="lance", maxRows="5")


def test_lance_without_pylance_dispatches_to_connector(spark, tmp_path):
    """Without pylance, the format name reaches spark.read.format
    ('lance') — loud ClassNotFound-style failure when no jar either,
    never a silent wrong-format read."""
    from archetype_spark.sources.io import _have_pylance
    from archetype_spark.sources import read_table

    if _have_pylance():
        pytest.skip("pylance present: bridge path covered above")
    with pytest.raises(Exception):
        read_table(spark, str(tmp_path / "nope.lance"), fmt="lance").count()
