"""Cross-format lake replication: Delta commits -> Iceberg mirror.

The medallion/CDC pattern a heterogeneous lakehouse needs: a Delta
source keeps committing, an Iceberg mirror follows at O(changes) per
sync — never O(table). Three existing primitives compose into it:

- `read_delta_cdf` resolves every row-level CHANGE each source
  commit made (O(changes) scan): plain appends derive as inserts,
  and DELETE/UPDATE commits under the Change Data Feed serve their
  _change_data files — deletes and update post-images replicate too;
- a latest-wins cut per key collapses multi-commit batches (commit
  version, then post-image over pre-image) so a key touched twice in
  the range lands once, in its newest state;
- `apply_cdc_iceberg` applies the batch as ONE v2 row-delta snapshot
  (one equality-delete file covering deleted AND upserted keys, the
  upsert rows as data files at the same sequence number), with the
  source version high-water mark written to the mirror's TABLE
  PROPERTIES in the SAME atomic metadata commit — the exactly-once
  handshake: a crashed-and-retried sync re-reads the mark and skips
  everything already applied; there is no window where rows are
  applied but the mark is not (or vice versa).

At 100 TB the asymmetry is the whole point: each sync moves only the
changed rows plus a KB-scale equality-delete file; the mirror's
history stays time-travelable per sync; compact_iceberg materializes
the accumulated deletes on maintenance schedule.

Declared limits (loud, inherited from the CDF reader): source
commits that mutated rows BEFORE enable_cdf_delta carry no
change-data files and refuse — nothing on disk says which rows died.
"""

from __future__ import annotations

import os
from typing import Sequence

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from archetype_spark.sources.delta import (
    _latest_version,
    _snapshot_actions,
    read_delta_cdf,
    read_delta_changes,
)
from archetype_spark.sources.iceberg import (
    _current_metadata_version,
    _load_metadata,
    apply_cdc_iceberg,
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
    meta_src, _active, _txns = _snapshot_actions(src)
    cdf_on = (
        str((meta_src.get("configuration") or {}).get(
            "delta.enableChangeDataFeed", ""
        )).lower()
        == "true"
    )
    if cdf_on:
        # full-fidelity CDC: deletes and update images replicate
        changes = read_delta_cdf(spark, src, start, end)
        # latest-wins per key: newest commit first, and within a
        # commit rank change types by finality — pre-image (0) loses
        # to delete (1) loses to insert/post-image (2). The middle
        # rank matters: upsert_by_key_delta emits a 'delete' AND an
        # 'insert' for the same key in ONE commit (net-changes form),
        # and an arbitrary tie-break could record a live key as
        # deleted in the mirror. The same-commit insert must win.
        pri = (
            F.when(F.col("_change_type") == "update_preimage", 0)
            .when(F.col("_change_type") == "delete", 1)
            .otherwise(2)
        )
        w = Window.partitionBy(*keys).orderBy(
            F.desc("_commit_version"), F.desc(pri)
        )
        latest = (
            changes.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        ups = latest.filter(
            F.col("_change_type").isin("insert", "update_postimage")
        ).drop("_change_type", "_commit_version")
        gone = latest.filter(F.col("_change_type") == "delete").select(
            *keys
        )
    else:
        # source without the Change Data Feed: the adds-only reader —
        # upserts replicate (incl. overwrite rewrites), row deletes
        # refuse loudly inside read_delta_changes
        changes = read_delta_changes(spark, src, start, end)
        w = Window.partitionBy(*keys).orderBy(F.desc("_commit_version"))
        ups = (
            changes.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn", "_commit_version")
        )
        gone = ups.select(*keys).limit(0)
    res = apply_cdc_iceberg(
        spark,
        dst,
        gone,
        ups,
        list(keys),
        properties_update={_MARK: str(end)},
    )
    out["rows_applied"] = res.get("rows_inserted", 0)
    return out
