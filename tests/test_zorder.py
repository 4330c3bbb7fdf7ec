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


def test_quantile_rank_beats_minmax_on_heavy_tail(spark, tmp_path):
    """The failure mode zorder.py's docstring names: one outlier at
    1e9 compresses a min-max-ranked column into bucket 0, so EVERY
    file's q-range covers the whole typical mass and a typical-range
    box prunes nothing on q. Quantile ranking buckets by row mass —
    the outlier costs one bucket, the rest keep their resolution —
    so the same box overlaps at most half the files. Both layouts
    must hold identical rows."""
    n_files = 16
    base = spark.range(64 * 64).select(
        (F.col("id") % 64).alias("q"),
        (F.col("id") / F.lit(64)).cast("long").alias("p"),
    )
    outlier = spark.createDataFrame([(10**9, 0)], "q long, p long")
    skewed = base.unionByName(outlier)

    mm_dir = str(tmp_path / "minmax")
    zorder.zorder_repartition(skewed, ["q", "p"], n_files).write.parquet(
        mm_dir
    )
    qt_dir = str(tmp_path / "quantile")
    zorder.zorder_repartition(
        skewed, ["q", "p"], n_files, rank="quantile"
    ).write.parquet(qt_dir)

    box = (10, 13, 0, 63)  # narrow typical-q band, all p
    mm = _overlapping_files(mm_dir, *box)
    qt = _overlapping_files(qt_dir, *box)
    # min-max: the outlier flattens q ranks to ~0, q carries no order
    assert mm >= n_files - 2, (mm, qt)
    assert qt <= mm // 2, (mm, qt)
    a = spark.read.parquet(mm_dir)
    b = spark.read.parquet(qt_dir)
    assert a.count() == b.count() == 64 * 64 + 1
    assert a.exceptAll(b).count() == 0


def test_quantile_rank_nulls_and_validation(spark):
    from pyspark.sql import Row

    df = spark.createDataFrame(
        [Row(a=None, b=1), Row(a=5, b=2), Row(a=9, b=3)],
        "a int, b int",
    )
    out = zorder.with_zvalue(df, ["a", "b"], rank="quantile").collect()
    zs = {r["a"]: r["_z"] for r in out}
    assert zs[None] is not None  # NULL ranks 0, still gets a z-value
    with pytest.raises(ValueError, match="minmax|quantile"):
        zorder.with_zvalue(df, ["a", "b"], rank="median")


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


def test_zorder_requires_two_to_four_columns(spark):
    df = spark.range(4).select(
        F.col("id").alias("a"),
        F.col("id").alias("b"),
        F.col("id").alias("c"),
        F.col("id").alias("d"),
        F.col("id").alias("e"),
    )
    with pytest.raises(ValueError, match="2-4"):
        zorder.with_zvalue(df, ["a"])
    with pytest.raises(ValueError, match="2-4"):
        zorder.with_zvalue(df, ["a", "b", "c", "d", "e"])


# ------------------------------------------------------------------ N-D
def test_zvalue_3d_4d_match_python_morton(spark):
    """The Spark shift-or spread must equal the pure-Python N-D
    reference at the scale endpoints and mixed interior points, for
    both the 21-bit 3-D and 15-bit 4-D budgets."""
    top3 = (1 << zorder.BITS_BY_DIM[3]) - 1
    rows3 = [
        (0, 0, 0),
        (top3, top3, top3),
        (1, 2, 4),
        (255, 256, 1 << 20),
        (top3, 0, 1),
    ]
    df3 = spark.createDataFrame(rows3, "a long, b long, c long")
    got3 = {
        (r["a"], r["b"], r["c"]): r["_z"]
        for r in zorder.with_zvalue(df3, ["a", "b", "c"]).collect()
    }
    for t in rows3:
        assert got3[t] == zorder.morton_n(t), t

    top4 = (1 << zorder.BITS_BY_DIM[4]) - 1
    rows4 = [(0, 0, 0, 0), (top4, top4, top4, top4), (1, 2, 4, 8), (top4, 0, 255, 1)]
    df4 = spark.createDataFrame(rows4, "a long, b long, c long, d long")
    got4 = {
        (r["a"], r["b"], r["c"], r["d"]): r["_z"]
        for r in zorder.with_zvalue(df4, ["a", "b", "c", "d"]).collect()
    }
    for t in rows4:
        assert got4[t] == zorder.morton_n(t), t
    # every z stays a non-negative bigint (63-bit budget claim)
    assert all(v >= 0 for v in got3.values()) and all(
        v >= 0 for v in got4.values()
    )


def _overlapping_files_nd(path: str, boxes: dict) -> int:
    """Files whose footer min/max box intersects the query box on
    EVERY named column — the set a stats-based scan must read."""
    import pyarrow.parquet as pq

    n = 0
    for root, _d, files in os.walk(path):
        for f in files:
            if not f.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(root, f)).metadata
            mins = {c: float("inf") for c in boxes}
            maxs = {c: float("-inf") for c in boxes}
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                for ci in range(g.num_columns):
                    col = g.column(ci)
                    name = col.path_in_schema
                    st = col.statistics
                    if st is None or name not in boxes:
                        continue
                    mins[name] = min(mins[name], st.min)
                    maxs[name] = max(maxs[name], st.max)
            if all(
                mins[c] <= hi and maxs[c] >= lo
                for c, (lo, hi) in boxes.items()
            ):
                n += 1
    return n


def _count_parquet_files(path: str) -> int:
    return sum(
        1
        for root, _d, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    )


def test_zorder_3d_prunes_on_all_three_columns(spark, tmp_path):
    """Uniform 32^3 grid z-ordered on (q, p, r) vs linearly sorted on
    q: a narrow band on EACH single column must prune files under the
    z layout, including the two columns the linear sort cannot prune
    at all — the 3-D OPTIMIZE ZORDER claim. 64 z-files = 2 high bits
    of the z-split per column (with fewer files a 3-way interleave
    gives each column ~1 bit and any band straddling the domain
    midpoint overlaps every file — the honest resolution floor: file
    count must reach 2^(bits_needed * n_cols)), and the band [10,13]
    sits inside one quarter of the 32-value domain. Each layout is
    judged against ITS OWN file count (range-partitioning by q can
    only mint as many files as q has distinct values)."""
    n_files = 64
    grid = spark.range(32 * 32 * 32).select(
        (F.col("id") % 32).alias("q"),
        ((F.col("id") / 32).cast("long") % 32).alias("p"),
        (F.col("id") / 1024).cast("long").alias("r"),
    )
    lin_dir = str(tmp_path / "linear")
    grid.repartitionByRange(n_files, "q").sortWithinPartitions("q").write.parquet(
        lin_dir
    )
    z_dir = str(tmp_path / "zorder")
    zorder.zorder_repartition(grid, ["q", "p", "r"], n_files).write.parquet(z_dir)
    lin_total = _count_parquet_files(lin_dir)
    z_total = _count_parquet_files(z_dir)
    full = (0, 31)
    for narrow_col in ("p", "r"):  # the columns linear-on-q can't prune
        box = {"q": full, "p": full, "r": full}
        box[narrow_col] = (10, 13)
        lin = _overlapping_files_nd(lin_dir, box)
        zed = _overlapping_files_nd(z_dir, box)
        assert lin == lin_total, (narrow_col, lin, lin_total)
        assert zed <= z_total // 2, (narrow_col, zed, z_total)
    # narrow q: both layouts prune; z must still skip files
    boxq = {"q": (10, 13), "p": full, "r": full}
    assert _overlapping_files_nd(z_dir, boxq) < z_total
    # and a 3-D box composes the pruning of all three
    box3 = {"q": (10, 13), "p": (10, 13), "r": (10, 13)}
    assert _overlapping_files_nd(z_dir, box3) <= z_total // 4
    # both layouts hold identical rows
    a = spark.read.parquet(lin_dir)
    b = spark.read.parquet(z_dir)
    assert a.count() == b.count() == 32 * 32 * 32
    assert a.exceptAll(b).count() == 0


def test_compact_delta_zorder_3d(spark, tmp_path):
    """compact_delta(zorder_by=3 columns) rewrites losslessly (the
    OPTIMIZE ZORDER surface users expect on >2 columns)."""
    from archetype_spark.sources.delta import (
        compact_delta,
        read_delta,
        write_delta,
    )

    table = str(tmp_path / "t3")
    df = spark.range(600).select(
        F.col("id").alias("k"),
        (F.col("id") % 7).cast("double").alias("q"),
        (F.col("id") % 11).cast("double").alias("p"),
        (F.col("id") % 13).cast("double").alias("r"),
    )
    write_delta(df, table)
    compact_delta(spark, table, target_files=4, zorder_by=("q", "p", "r"))
    back = read_delta(spark, table)
    assert back.count() == 600
    assert back.exceptAll(df).count() == 0 and df.exceptAll(back).count() == 0
