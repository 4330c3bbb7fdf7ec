"""Z-order (Morton) clustering for multi-column scan pruning.

`compact_delta/compact_iceberg(sort_by=...)` gives tight row-group
min/max stats on ONE leading key — a range filter on any other column
prunes nothing. Interleaving the bits of two rank-scaled columns into
one Morton value and range-partitioning + sorting on IT gives every
output file a small RECTANGLE of the 2-D key space, so a box
predicate on EITHER column (or both) skips most files on footer
stats alone — the Databricks OPTIMIZE ZORDER design, and the same
trade Delta/Iceberg users expect from a lake engine at 100 TB: one
clustered rewrite at maintenance time buys every later scan's
pruning.

Everything is whole-stage-codegen column arithmetic: min/max bounds
come from one aggregate broadcast as a single row; rank scaling is a
multiply + floor; the bit spread is the classic mask ladder
(shift-or-and five times per column). No UDF, no shuffle beyond the
one range-partition the rewrite intends to do anyway.

Scaling note: min-max ranking is distribution-sensitive (one outlier
compresses everyone else into few buckets); for heavy-tailed keys
rank by range-partition id or quantile instead (percentile_approx is
mergeable) — the Morton interleave is unchanged. 16 bits per column
(65536 buckets) out-resolves any practical file count.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Column
from pyspark.sql import functions as F

#: Bits per column in the 2-D interleave (z fits in 32 bits of a
#: bigint; file-level pruning saturates far below this resolution).
ZORDER_BITS = 16


def _spread16(x: Column) -> Column:
    """Spread the low 16 bits of `x` to even bit positions 0,2,..,30
    (the Morton mask ladder) — plain codegen shifts/masks."""
    x = x.bitwiseAND(F.lit(0xFFFF))
    x = (x.bitwiseOR(F.shiftleft(x, 8))).bitwiseAND(F.lit(0x00FF00FF))
    x = (x.bitwiseOR(F.shiftleft(x, 4))).bitwiseAND(F.lit(0x0F0F0F0F))
    x = (x.bitwiseOR(F.shiftleft(x, 2))).bitwiseAND(F.lit(0x33333333))
    x = (x.bitwiseOR(F.shiftleft(x, 1))).bitwiseAND(F.lit(0x55555555))
    return x


def with_zvalue(
    df: DataFrame, cols: Sequence[str], out_col: str = "_z"
) -> DataFrame:
    """Append the 2-D Morton value of `cols` as `out_col`: each column
    min-max rank-scales to [0, 2^16) against ITS corpus bounds (one
    broadcast aggregate row), then the two 16-bit ranks interleave.
    NULLs rank 0 (they cluster together at the z-origin); a constant
    column ranks 0 everywhere (no discrimination to encode)."""
    if len(cols) != 2:
        raise ValueError(f"z-order interleave is 2-D here; got {list(cols)}")
    top = (1 << ZORDER_BITS) - 1
    bounds = df.agg(
        *[
            a
            for i, c in enumerate(cols)
            for a in (
                F.min(c).cast("double").alias(f"_zlo_{i}"),
                F.max(c).cast("double").alias(f"_zhi_{i}"),
            )
        ]
    )
    j = df.crossJoin(F.broadcast(bounds))
    ranks = []
    for i, c in enumerate(cols):
        lo, hi = F.col(f"_zlo_{i}"), F.col(f"_zhi_{i}")
        v = F.coalesce(F.col(c).cast("double"), lo)
        u = F.when(
            hi > lo, F.floor((v - lo) / (hi - lo) * F.lit(float(top)))
        ).otherwise(F.lit(0))
        # v == hi lands exactly on top+... guard the closed upper edge
        ranks.append(F.least(u.cast("bigint"), F.lit(top)))
    z = _spread16(ranks[0]).bitwiseOR(F.shiftleft(_spread16(ranks[1]), 1))
    return j.select(*df.columns, z.alias(out_col))


def zorder_repartition(
    df: DataFrame, cols: Sequence[str], n_files: int
) -> DataFrame:
    """`df` range-partitioned into `n_files` contiguous Morton slices
    and sorted by the z-value within each — the clustered layout a
    compaction rewrite should emit. The z column is dropped; callers
    write the result directly."""
    z = with_zvalue(df, cols)
    return (
        z.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
    )


def morton2(a: int, b: int) -> int:
    """Pure-Python 2-D Morton reference (tests + tooling)."""

    def spread(x: int) -> int:
        x &= 0xFFFF
        x = (x | (x << 8)) & 0x00FF00FF
        x = (x | (x << 4)) & 0x0F0F0F0F
        x = (x | (x << 2)) & 0x33333333
        x = (x | (x << 1)) & 0x55555555
        return x

    return spread(a) | (spread(b) << 1)
