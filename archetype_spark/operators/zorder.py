"""Z-order (Morton) clustering for multi-column scan pruning.

`compact_delta/compact_iceberg(sort_by=...)` gives tight row-group
min/max stats on ONE leading key — a range filter on any other column
prunes nothing. Interleaving the bits of 2-4 rank-scaled columns into
one Morton value and range-partitioning + sorting on IT gives every
output file a small HYPER-RECTANGLE of the key space, so a box
predicate on ANY subset of the columns skips most files on footer
stats alone — the Databricks OPTIMIZE ZORDER design, and the same
trade Delta/Iceberg users expect from a lake engine at 100 TB: one
clustered rewrite at maintenance time buys every later scan's
pruning.

Everything is whole-stage-codegen column arithmetic: min/max bounds
come from one aggregate broadcast as a single row; rank scaling is a
multiply + floor; the 2-D bit spread is the classic mask ladder
(shift-or-and five times per column), the 3-/4-D spreads are a
constant per-bit shift-or chain. No UDF, no shuffle beyond the one
range-partition the rewrite intends to do anyway.

Bit budget by dimensionality: the interleaved value must stay inside
a NON-NEGATIVE bigint (63 usable bits), so 2-D packs 16+16 (the
classic 32-bit z), 3-D packs 21+21+21 = 63, 4-D packs 15x4 = 60.
Even 15 bits = 32768 buckets per column out-resolves any practical
file count. Past 4 columns each column's share of the sort order
dilutes to where per-file ranges stop being tight — the curse that
makes wide Z-orders prune poorly everywhere — so >4 raises rather
than silently under-delivering.

Scaling note: min-max ranking is distribution-sensitive (one outlier
compresses everyone else into few buckets). `rank="quantile"` fixes
exactly that: each column ranks by its position among
`percentile_approx` boundaries (a MERGEABLE sketch — one map-combined
aggregate pass at any scale), so every bucket holds ~equal row mass
regardless of tails; the Morton interleave is unchanged. The
boundary-search expressions are higher-order array functions
(interpreted, not codegen) — acceptable because z-ordering runs in
the maintenance rewrite, not the query path; min-max stays the
default for uniform keys and for the oracle-pinned q116 layout.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Column
from pyspark.sql import functions as F

#: Bits per column in the 2-D interleave (z fits in 32 bits of a
#: bigint; file-level pruning saturates far below this resolution).
ZORDER_BITS = 16

#: Bits per column by dimensionality (total always <= 63 so the
#: interleaved bigint stays non-negative and orders correctly).
BITS_BY_DIM = {2: 16, 3: 21, 4: 15}


def _spread16(x: Column) -> Column:
    """Spread the low 16 bits of `x` to even bit positions 0,2,..,30
    (the Morton mask ladder) — plain codegen shifts/masks."""
    x = x.bitwiseAND(F.lit(0xFFFF))
    x = (x.bitwiseOR(F.shiftleft(x, 8))).bitwiseAND(F.lit(0x00FF00FF))
    x = (x.bitwiseOR(F.shiftleft(x, 4))).bitwiseAND(F.lit(0x0F0F0F0F))
    x = (x.bitwiseOR(F.shiftleft(x, 2))).bitwiseAND(F.lit(0x33333333))
    x = (x.bitwiseOR(F.shiftleft(x, 1))).bitwiseAND(F.lit(0x55555555))
    return x


def _spread_every_nth(x: Column, bits: int, stride: int) -> Column:
    """Spread the low `bits` bits of `x` to positions 0, stride,
    2*stride, ... — the general n-way Morton spread as a constant
    per-bit shift-or chain (bits <= 21 terms, all plain codegen
    shifts/masks/ors; built once into the plan, zero per-row
    interpretation)."""
    x = x.bitwiseAND(F.lit((1 << bits) - 1))
    out = None
    for b in range(bits):
        t = F.shiftleft(F.shiftright(x, b).bitwiseAND(F.lit(1)), b * stride)
        out = t if out is None else out.bitwiseOR(t)
    return out


#: quantile-rank bucket count: 1024 equal-mass buckets out-resolve any
#: practical file count and keep the broadcast boundary arrays small.
QUANTILE_BUCKETS = 1024


def with_zvalue(
    df: DataFrame,
    cols: Sequence[str],
    out_col: str = "_z",
    rank: str = "minmax",
) -> DataFrame:
    """Append the N-D Morton value of `cols` (2-4 columns) as
    `out_col`: each column rank-scales to an integer bucket against
    ITS corpus statistics (one broadcast aggregate row), then the
    ranks bit-interleave. NULLs rank 0 (they cluster together at the
    z-origin); a constant column ranks 0 everywhere (no
    discrimination to encode).

    `rank="minmax"` (default): linear scale to [0, 2^bits) between
    the column's min and max — pure codegen arithmetic, right for
    roughly uniform keys. `rank="quantile"`: bucket = position among
    QUANTILE_BUCKETS-1 percentile_approx boundaries — equal ROW MASS
    per bucket, so one outlier cannot compress the rest of the column
    into a handful of buckets (the heavy-tail failure the module
    docstring names)."""
    n = len(cols)
    if n not in BITS_BY_DIM:
        raise ValueError(
            f"z-order interleave supports 2-4 columns; got {list(cols)} "
            "(1 column is a plain sort_by; >4 dilutes per-file ranges "
            "until pruning stops paying)"
        )
    if rank not in ("minmax", "quantile"):
        raise ValueError(f"rank must be minmax|quantile, got {rank!r}")
    bits = BITS_BY_DIM[n]
    top = (1 << bits) - 1
    ranks = []
    if rank == "quantile":
        nq = min(QUANTILE_BUCKETS, top + 1)
        qs = [i / nq for i in range(1, nq)]
        bounds = df.agg(
            *[
                F.percentile_approx(
                    F.col(c).cast("double"), qs, 10_000
                ).alias(f"_zq_{i}")
                for i, c in enumerate(cols)
            ]
        )
        j = df.crossJoin(F.broadcast(bounds))
        for i, c in enumerate(cols):
            v = F.col(c).cast("double")
            u = F.size(
                F.filter(F.col(f"_zq_{i}"), lambda b: b <= v)  # noqa: B023
            ).cast("bigint")
            ranks.append(
                F.when(v.isNull(), F.lit(0).cast("bigint")).otherwise(
                    F.least(u, F.lit(top))
                )
            )
        return j.select(*df.columns, _interleave(ranks, n, bits).alias(out_col))
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
    for i, c in enumerate(cols):
        lo, hi = F.col(f"_zlo_{i}"), F.col(f"_zhi_{i}")
        v = F.coalesce(F.col(c).cast("double"), lo)
        u = F.when(
            hi > lo, F.floor((v - lo) / (hi - lo) * F.lit(float(top)))
        ).otherwise(F.lit(0))
        # v == hi lands exactly on top+... guard the closed upper edge
        ranks.append(F.least(u.cast("bigint"), F.lit(top)))
    return j.select(*df.columns, _interleave(ranks, n, bits).alias(out_col))


def _interleave(ranks: list, n: int, bits: int):
    """Morton-interleave the rank columns (column i at bit offset i)."""
    if n == 2:
        return _spread16(ranks[0]).bitwiseOR(
            F.shiftleft(_spread16(ranks[1]), 1)
        )
    z = None
    for i, r in enumerate(ranks):
        t = F.shiftleft(_spread_every_nth(r, bits, n), i)
        z = t if z is None else z.bitwiseOR(t)
    return z


def zorder_repartition(
    df: DataFrame, cols: Sequence[str], n_files: int, rank: str = "minmax"
) -> DataFrame:
    """`df` range-partitioned into `n_files` contiguous Morton slices
    and sorted by the z-value within each — the clustered layout a
    compaction rewrite should emit. The z column is dropped; callers
    write the result directly. `rank` as in with_zvalue ("quantile"
    for heavy-tailed key distributions)."""
    z = with_zvalue(df, cols, rank=rank)
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


def morton_n(vals: Sequence[int]) -> int:
    """Pure-Python N-D Morton reference (tests + tooling): interleave
    the low BITS_BY_DIM[len(vals)] bits of each value, value i at bit
    offset i."""
    n = len(vals)
    bits = BITS_BY_DIM[n]
    z = 0
    for i, v in enumerate(vals):
        v &= (1 << bits) - 1
        for b in range(bits):
            z |= ((v >> b) & 1) << (b * n + i)
    return z
