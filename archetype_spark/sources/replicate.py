"""Cross-format lake replication: Delta commits -> Iceberg mirror.

The medallion/CDC pattern a heterogeneous lakehouse needs: a Delta
source keeps committing, an Iceberg mirror follows at O(changes) per
sync — never O(table). Three existing primitives compose into it:

- `read_delta_changes` resolves exactly the rows each source commit
  ADDED (O(new data) scan, loud on gaps and on delete commits the
  adds-only read cannot express);
- a latest-wins cut per key collapses multi-commit batches so a key
  rewritten twice in the range lands once, with its newest row;
- `upsert_by_key_iceberg` applies the batch as ONE v2 row-delta
  snapshot (equality delete + inserts at one sequence number), with
  the source version high-water mark written to the mirror's TABLE
  PROPERTIES in the SAME atomic metadata commit — the exactly-once
  handshake: a crashed-and-retried sync re-reads the mark and skips
  everything already applied; there is no window where rows are
  applied but the mark is not (or vice versa).

At 100 TB the asymmetry is the whole point: each sync moves only the
changed rows plus a KB-scale equality-delete file; the mirror's
history stays time-travelable per sync; compact_iceberg materializes
the accumulated deletes on maintenance schedule.

Declared limits (loud, inherited from the adds-only changes reader):
source commits that remove rows (row-level/whole-file DELETE, DV
rewrites) refuse — replicating deletes needs the Change Data Feed's
change-data files, which the public log alone does not carry.
"""

from __future__ import annotations

import os
from typing import Sequence

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from archetype_spark.sources.delta import _latest_version, read_delta_changes
from archetype_spark.sources.iceberg import (
    _current_metadata_version,
    _load_metadata,
    upsert_by_key_iceberg,
)

_MARK = "replication.delta.last-version"


def replicated_delta_version(dst: str) -> int | None:
    """The highest source commit version already applied to the
    mirror (None for a fresh mirror) — read from the mirror's table
    properties, so snapshot expiry can never re-open the window."""
    table = os.path.abspath(dst)
    if _current_metadata_version(table) is None:
        return None
    props = _load_metadata(table).get("properties") or {}
    v = props.get(_MARK)
    return int(v) if v is not None else None


def replicate_delta_to_iceberg(
    spark: SparkSession,
    src: str,
    dst: str,
    keys: Sequence[str],
    end_version: int | None = None,
) -> dict:
    """Sync the Iceberg mirror at `dst` with every Delta commit of
    `src` newer than the mirror's recorded high-water mark (module
    docstring). `keys` identifies rows across commits (latest commit
    wins inside a batch). Idempotent: re-running after success is a
    no-op; re-running after a crash replays only the unacknowledged
    range. Returns {'from_version', 'to_version', 'rows_applied'}."""
    src = os.path.abspath(src)
    latest = _latest_version(src)
    if latest is None:
        raise FileNotFoundError(f"not a Delta table: {src}")
    end = latest if end_version is None else int(end_version)
    last = replicated_delta_version(dst)
    start = 0 if last is None else last + 1
    out = {"from_version": start, "to_version": end, "rows_applied": 0}
    if start > end:
        return out
    changes = read_delta_changes(spark, src, start, end)
    # latest-wins per key across the batch: one surviving row per key
    # (keyed ties inside ONE commit are a source modeling error —
    # refuse via the marker column's uniqueness rather than pick
    # arbitrarily? No: _commit_version ties broken deterministically
    # is impossible without a row order, so the window keeps the
    # commit-version order only — same-commit duplicate keys follow
    # the upsert's own dropDuplicates on the delete side and land
    # once per (key, batch) on the insert side by this row_number)
    w = Window.partitionBy(*keys).orderBy(F.desc("_commit_version"))
    batch = (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "_commit_version")
    )
    res = upsert_by_key_iceberg(
        spark,
        dst,
        batch,
        list(keys),
        properties_update={_MARK: str(end)},
    )
    out["rows_applied"] = res.get("rows_inserted", 0)
    return out
