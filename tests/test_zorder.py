"""Z-order clustering: Morton correctness vs the pure-Python
reference, rewrite fidelity, and the actual pruning claim — a 2-D box
over a z-ordered layout must overlap fewer files (by footer min/max)
than the same data linearly sorted on one key."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from archetype_spark.operators import zorder


def test_zvalue_matches_python_morton(spark):
    # ranks are the values themselves when min=0/max=top: craft rows
    # hitting the scale endpoints exactly
    top = (1 << zorder.ZORDER_BITS) - 1
    rows = [(0, 0), (top, top), (1, 2), (255, 256), (top, 0), (0, top)]
    df = spark.createDataFrame(rows, "a long, b long")
    got = {
        (r["a"], r["b"]): r["_z"]
        for r in zorder.with_zvalue(df, ["a", "b"]).collect()
    }
    for a, b in rows:
        assert got[(a, b)] == zorder.morton2(a, b), (a, b)


def test_zvalue_handles_nulls_and_constant_columns(spark):
    df = spark.createDataFrame(
        [(None, 5), (3, 5), (7, 5)], "a int, b int"
    )
    out = zorder.with_zvalue(df, ["a", "b"]).collect()
    z = {r["a"]: r["_z"] for r in out}
    assert z[None] == z[3] == 0  # null ranks at the origin, b constant
    assert z[7] > 0


def _overlapping_files(path: str, qlo, qhi, plo, phi) -> int:
    """Files whose (q, p) footer min/max box intersects the query
    box — exactly the set a stats-based scan must read."""
    import pyarrow.parquet as pq

    n = 0
    for root, _d, files in os.walk(path):
        for f in files:
            if not f.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(root, f)).metadata
            qmin, qmax = float("inf"), float("-inf")
            pmin, pmax = float("inf"), float("-inf")
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                for ci in range(g.num_columns):
                    col = g.column(ci)
                    name = col.path_in_schema
                    st = col.statistics
                    if st is None:
                        continue
                    if name == "q":
                        qmin, qmax = min(qmin, st.min), max(qmax, st.max)
                    if name == "p":
                        pmin, pmax = min(pmin, st.min), max(pmax, st.max)
            if qmin <= qhi and qmax >= qlo and pmin <= phi and pmax >= plo:
                n += 1
    return n


def test_zorder_prunes_where_linear_sort_cannot(spark, tmp_path):
    """Uniform 64x64 grid; query box = FULL q range x narrow p band.
    Linear sort on q gives every file the full p range (nothing
    prunes); the Morton layout keeps per-file p ranges tight, so most
    files miss the band."""
    n_files = 16
    grid = spark.range(64 * 64).select(
        (F.col("id") % 64).alias("q"), (F.col("id") / F.lit(64)).cast("long").alias("p")
    )
    lin_dir = str(tmp_path / "linear")
    grid.repartitionByRange(n_files, "q").sortWithinPartitions(
        "q"
    ).write.parquet(lin_dir)
    z_dir = str(tmp_path / "zorder")
    zorder.zorder_repartition(grid, ["q", "p"], n_files).write.parquet(z_dir)
    box = (0, 63, 10, 13)  # all q, p in [10, 13]
    lin = _overlapping_files(lin_dir, *box)
    zed = _overlapping_files(z_dir, *box)
    assert lin >= n_files  # linear layout cannot prune this box
    assert zed <= lin // 2, (zed, lin)
    # both layouts hold identical rows
    import pyspark.sql.functions as _F

    a = spark.read.parquet(lin_dir)
    b = spark.read.parquet(z_dir)
    assert a.count() == b.count() == 64 * 64
    assert a.exceptAll(b).count() == 0


def test_compact_delta_zorder_rewrite_fidelity(spark, tmp_path):
    from archetype_spark.sources.delta import (
        compact_delta,
        read_delta,
        write_delta,
    )

    table = str(tmp_path / "t")
    df = spark.range(1000).select(
        F.col("id").alias("k"),
        (F.col("id") % 37).cast("double").alias("q"),
        (F.col("id") % 53).cast("double").alias("p"),
    )
    write_delta(df.filter("k % 2 = 0"), table)
    write_delta(df.filter("k % 2 = 1"), table, mode="append")
    compact_delta(spark, table, target_files=4, zorder_by=("q", "p"))
    back = read_delta(spark, table)
    assert back.count() == 1000
    assert back.exceptAll(df).count() == 0 and df.exceptAll(back).count() == 0
    with pytest.raises(ValueError, match="not both"):
        compact_delta(spark, table, sort_by=["q"], zorder_by=("q", "p"))


def test_zorder_requires_two_columns(spark):
    df = spark.range(4).select(F.col("id").alias("a"))
    with pytest.raises(ValueError, match="2-D"):
        zorder.with_zvalue(df, ["a"])
