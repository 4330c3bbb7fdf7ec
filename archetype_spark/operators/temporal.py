"""Temporal joins Spark lacks first-party: as-of and range joins.

SURVEY §2.2 (joins row) notes neither Daft nor Spark ships an as-of
join — the reference's users would compose one. These are the
scalable compositions:

- `asof_join`: for each left row, the right row with the greatest
  right.ts <= left.ts per key. Implemented as the classic merge:
  union both sides, one window sorted by (ts, side) per key, carry
  the last non-null right values forward. ONE shuffle on the key —
  no inequality join, no per-key explosion; at 100 TB this is a
  single sort-merge pass, the same shape a time-series database uses.
- `range_join`: pairs (left, right) with right.ts in
  [left.ts, left.ts + width). A naive theta join is a nested loop
  over every key pair; instead both sides are bucketed to
  floor(ts / width) and the left side probes its own and the next
  bucket (equi-join on (key, bucket)), then the exact predicate
  filters. Candidates per row ~ 2x the rows per bucket — linear, not
  quadratic, and the equi-join shuffles hash-partitioned like any
  other join (AQE skew-split applies if one bucket is hot).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    right_cols: Sequence[str],
    prefix: str = "r_",
) -> DataFrame:
    """Left rows + the most recent right row per key (right.ts <=
    left.ts; ties at equal ts match, like DuckDB ASOF's >=). Left rows
    with no prior right row are dropped (inner as-of). `right_cols`
    are exposed with `prefix` to avoid clashes."""
    keys = list(keys)
    # One struct per right row, carried forward as a unit. Two reasons
    # this beats carrying each projected column separately:
    # (1) NULL-correctness — last(ignorenulls) over a column that is
    #     legitimately NULL in the newest right row would skip back to
    #     an OLDER row's value; the struct is never NULL as a whole, so
    #     the newest right ROW always wins and its per-column NULLs
    #     survive intact. The matched filter keys on the struct, not on
    #     right_cols[0] (which may be NULL).
    # (2) one window expression instead of len(right_cols).
    r = right.select(
        *keys,
        F.col(ts_col).alias(ts_col),
        F.struct(*[F.col(c).alias(prefix + c) for c in right_cols]).alias("_rrow"),
    ).withColumn("_side", F.lit(0))
    l = left.withColumn("_side", F.lit(1))
    u = l.unionByName(r, allowMissingColumns=True)

    # right rows sort before left rows at the same ts => a right row
    # with ts == left.ts is visible to that left row ('>=' semantics)
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(ts_col).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.withColumn("_rrow", F.last("_rrow", ignorenulls=True).over(w))
    return (
        carried.filter(F.col("_side") == 1)
        .filter(F.col("_rrow").isNotNull())
        .select(
            *[c for c in carried.columns if c not in ("_rrow", "_side")],
            *[F.col(f"_rrow.{prefix}{c}").alias(prefix + c) for c in right_cols],
        )
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str,
    right_ts: str,
    width_seconds: int,
) -> DataFrame:
    """Candidate pairs with right_ts in [left_ts, left_ts + width).
    Returns the joined frame (left columns + right columns); caller
    aggregates. Both sides bucketed by floor(epoch/width); left probes
    bucket b and b+1 — every true pair shares one of those buckets."""
    keys = list(keys)
    lb = F.floor(F.unix_timestamp(F.col(left_ts)) / width_seconds)
    rb = F.floor(F.unix_timestamp(F.col(right_ts)) / width_seconds)
    l = left.withColumn(
        "_bucket", F.explode(F.array(lb.cast("long"), (lb + 1).cast("long")))
    )
    r = right.withColumn("_bucket", rb.cast("long"))
    cond = [l["_bucket"] == r["_bucket"]] + [l[k] == r[k] for k in keys]
    # the exact bound must be timestamp arithmetic, not unix_timestamp:
    # unix_timestamp truncates to seconds and would mis-include pairs
    # within the truncation slack at the window edge
    joined = l.join(r, cond).filter(
        (F.col(right_ts) >= F.col(left_ts))
        & (
            F.col(right_ts)
            < F.timestamp_add("SECOND", F.lit(width_seconds), F.col(left_ts))
        )
    )
    return joined.drop(l["_bucket"]).drop(r["_bucket"]).drop(*[r[k] for k in keys])
