"""Protocol-native Delta Lake backend — no connector jars required.

The reference ships lake-format readers as first-class sources
(Daft `read_deltalake`, reference pyproject.toml:7-10); this container
has no delta-spark jar, so `sources/io.py` could only dispatch the
format name. This module implements the READ side of the public Delta
transaction-log protocol (delta.io PROTOCOL.md) directly — the log is
just JSON lines plus optional parquet checkpoints, both readable with
stdlib + pyarrow — and a minimal single-writer append/overwrite WRITE
side, enough for round-trip tests and local pipelines, plus an
exactly-once Structured Streaming sink built on the protocol's `txn`
action (streaming_delta_sink).

Scale notes (why this shape survives a real cluster):
- The log replay is driver-side metadata work proportional to the
  number of COMMITS since the last checkpoint, never to data size —
  the same asymmetry the real connector exploits.
- Partition reconstruction: hive-consistent layouts (every
  mainstream writer) read as ONE basePath scan with native
  PartitionFilters pushdown; foreign layouts fall back to per-
  partition-group unions whose literal partition columns prune via
  constant folding (both pinned by tests/test_delta.py).
- Deletion vectors (reader version 3's deletionVectors feature) are
  READ and WRITTEN: sources/dv.py implements the public Z85 +
  portable-Roaring DV format, read_delta anti-joins each masked
  file's deleted positions on `_metadata.row_index`, and
  delete_where_delta commits row-level DELETEs without rewriting
  data.
- Column mapping mode 'name' (legacy reader 2 or the columnMapping
  table feature) is READ and WRITTEN: scans run under each column's
  pinned physicalName and rename to the logical view, so
  rename_column_delta / drop_column_delta are metadata-only commits
  that never rewrite data (enable_column_mapping_delta upgrades in
  place). Mode 'id' and remaining unsupported reader features (v2
  checkpoints, ...) raise loudly instead of returning silently wrong
  rows.

Write-side concurrency contract: SINGLE WRITER. Commits are published
by atomic rename into `_delta_log/`, so a lost race surfaces as
FileExistsError rather than a corrupted log, but there is no retry
loop — multi-writer coordination is the hosted connector's job.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import urllib.parse
import uuid
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from archetype_spark.sources import dv as _dv

try:  # the wide-mask executor path ships dv's codec inside closures
    from pyspark.cloudpickle import register_pickle_by_value
except ImportError:  # pragma: no cover - older pyspark layouts
    from cloudpickle import register_pickle_by_value
register_pickle_by_value(_dv)

_LOG_DIR = "_delta_log"

#: partition values the hive fast path may trust: characters Spark's
#: path escaping passes through verbatim (no %XX ambiguity).
_GLOB_SAFE = re.compile(r"^[A-Za-z0-9._-]+$")


# --------------------------------------------------------------------- replay


def _commit_path(table: str, version: int) -> str:
    return os.path.join(table, _LOG_DIR, f"{version:020d}.json")


def _checkpoint_start(table: str, version: int | None):
    """(start_version, checkpoint_actions) — read `_last_checkpoint`
    when it exists and is usable for the requested version, else
    replay from version 0. Checkpoint parquet is read with pyarrow
    (driver-side; checkpoints are metadata-sized)."""
    lc_path = os.path.join(table, _LOG_DIR, "_last_checkpoint")
    if not os.path.exists(lc_path):
        return 0, []
    with open(lc_path) as fh:
        lc = json.load(fh)
    cp_version = int(lc["version"])
    if version is not None and cp_version > version:
        # time travel behind the checkpoint: replay JSONs from 0
        return 0, []
    import pyarrow.parquet as pq

    if lc.get("parts"):
        names = [
            os.path.join(
                table,
                _LOG_DIR,
                f"{cp_version:020d}.checkpoint.{p:010d}.{int(lc['parts']):010d}.parquet",
            )
            for p in range(1, int(lc["parts"]) + 1)
        ]
    else:
        classic = os.path.join(
            table, _LOG_DIR, f"{cp_version:020d}.checkpoint.parquet"
        )
        if not os.path.exists(classic):
            # UUID-named V2 checkpoint (PROTOCOL.md "V2 Checkpoints"):
            # current Databricks writers produce these; the classic
            # name is absent and the actions may live in sidecars
            import glob as _glob

            stem = os.path.join(
                table, _LOG_DIR, f"{cp_version:020d}.checkpoint.*."
            )
            cand = sorted(
                _glob.glob(stem + "parquet") + _glob.glob(stem + "json")
            )
            if not cand:
                raise FileNotFoundError(
                    f"_last_checkpoint names version {cp_version} but no "
                    f"checkpoint file exists for it in {table}"
                )
            return cp_version + 1, _read_v2_checkpoint(table, cand[-1])
        names = [classic]
    actions = []
    for name in names:
        for row in pq.read_table(name).to_pylist():
            for key in ("protocol", "metaData", "add", "remove", "txn"):
                if row.get(key) is not None:
                    actions.append({key: _demap(row[key])})
    return cp_version + 1, actions


def _read_v2_checkpoint(table: str, path: str) -> list[dict]:
    """Actions of a UUID-named V2 checkpoint (delta.io PROTOCOL.md
    "V2 Checkpoints"): the top-level file (parquet or json) carries
    `checkpointMetadata`, protocol/metaData/txn and possibly inline
    file actions; add/remove actions may instead live in SIDECAR
    parquet files under _delta_log/_sidecars/, referenced by
    `sidecar` actions. Driver-side reads — checkpoints and sidecars
    are metadata-sized relative to the data they index."""
    import pyarrow.parquet as pq

    if path.endswith(".json"):
        with open(path) as fh:
            rows = [json.loads(line) for line in fh if line.strip()]
    else:
        rows = pq.read_table(path).to_pylist()
    actions: list[dict] = []
    sidecars: list[dict] = []
    saw_meta = False
    for row in rows:
        for key in ("protocol", "metaData", "add", "remove", "txn"):
            if row.get(key) is not None:
                actions.append({key: _demap(row[key])})
        if row.get("sidecar") is not None:
            sidecars.append(_demap(row["sidecar"]))
        if row.get("checkpointMetadata") is not None:
            saw_meta = True
    if not saw_meta:
        raise ValueError(
            f"UUID-named checkpoint {path!r} has no checkpointMetadata "
            "action: not a spec-compliant V2 checkpoint"
        )
    for sc in sidecars:
        rel = sc["path"]
        sp = (
            rel
            if os.path.isabs(rel)
            else os.path.join(table, _LOG_DIR, "_sidecars", rel)
        )
        if not os.path.exists(sp):
            raise FileNotFoundError(
                f"V2 checkpoint {path!r} references missing sidecar {rel!r}"
            )
        for row in pq.read_table(sp).to_pylist():
            for key in ("add", "remove"):
                if row.get(key) is not None:
                    actions.append({key: _demap(row[key])})
    return actions


def _demap(obj):
    """pyarrow reads parquet map<k,v> columns back as lists of
    (key, value) tuples; the log-replay code (and the JSON commits)
    speak dicts. Empty maps read back as [] and are handled by the
    consumers' `or {}` guards."""
    if isinstance(obj, dict):
        return {k: _demap(v) for k, v in obj.items()}
    if isinstance(obj, list):
        if obj and all(isinstance(x, tuple) and len(x) == 2 for x in obj):
            return {k: _demap(v) for k, v in obj}
        return [_demap(x) for x in obj]
    return obj


#: reader features (minReaderVersion=3 tables) this module implements
_READER_FEATURES = {"deletionVectors", "columnMapping", "v2Checkpoint"}

#: writer features implied by each LEGACY minWriterVersion level
#: (delta.io PROTOCOL.md "Table Features" upgrade rule): cumulative —
#: a legacy writer version implies its level and every level below.
_LEGACY_WRITER_FEATURES = {
    2: {"appendOnly", "invariants"},
    3: {"checkConstraints"},
    4: {"changeDataFeed", "generatedColumns"},
    5: {"columnMapping"},
    6: {"identityColumns"},
}


def _table_features_protocol(
    protocol: dict | None,
    meta: dict | None,
    extra_reader=(),
    extra_writer=(),
) -> dict:
    """The (minReader 3, minWriter 7) table-features protocol action
    for an upgrade, carrying over (a) every explicit feature of the
    prior protocol, (b) every feature the prior LEGACY versions
    implied (PROTOCOL.md: upgrading to table features must list the
    implied set — legacy minWriterVersion 2..6 cumulatively implies
    appendOnly/invariants/checkConstraints/changeDataFeed/
    generatedColumns/columnMapping/identityColumns; legacy
    minReaderVersion 2 implies the columnMapping reader feature), and
    (c) the features ACTIVE metadata demands (delta.columnMapping.mode
    set -> columnMapping; delta.enableChangeDataFeed -> changeDataFeed).
    Dropping an implied feature emits a log connector readers/writers
    (delta-spark, delta-rs) reject or mishandle — e.g. a legacy (2,5)
    column-mapped table upgraded for deletion vectors must keep
    columnMapping in BOTH feature lists."""
    p = protocol or {"minReaderVersion": 1, "minWriterVersion": 2}
    mrv = int(p.get("minReaderVersion", 1))
    mwv = int(p.get("minWriterVersion", 2))
    rfeats = set(p.get("readerFeatures") or []) | set(extra_reader)
    wfeats = set(p.get("writerFeatures") or []) | set(extra_writer)
    if mwv < 7:
        for level, implied in _LEGACY_WRITER_FEATURES.items():
            if mwv >= level:
                wfeats |= implied
    if mrv == 2:
        rfeats.add("columnMapping")
    cfg = ((meta or {}).get("configuration")) or {}
    if cfg.get("delta.columnMapping.mode", "none") != "none":
        rfeats.add("columnMapping")
        wfeats.add("columnMapping")
    if str(cfg.get("delta.enableChangeDataFeed", "")).lower() == "true":
        wfeats.add("changeDataFeed")
    # reader-affecting writer features must appear in BOTH lists
    if "deletionVectors" in wfeats:
        rfeats.add("deletionVectors")
    if "columnMapping" in rfeats:
        wfeats.add("columnMapping")
    return {
        "minReaderVersion": 3,
        "minWriterVersion": 7,
        "readerFeatures": sorted(rfeats),
        "writerFeatures": sorted(wfeats),
    }


def _snapshot_actions(
    table: str, version: int | None = None, return_protocol: bool = False
):
    """Replay the log to `version` (latest when None). Returns
    (metaData, active add-actions dict keyed by path, txn high-water
    marks {appId: version}) — plus the protocol action when
    `return_protocol` (checkpoint/delete writers must carry it
    forward, not re-invent it)."""
    log_dir = os.path.join(table, _LOG_DIR)
    if not os.path.isdir(log_dir):
        raise FileNotFoundError(f"not a Delta table (no {_LOG_DIR}): {table}")
    start, actions = _checkpoint_start(table, version)
    v = start
    saw_commit = start > 0
    while True:
        if version is not None and v > version:
            break
        p = _commit_path(table, v)
        if not os.path.exists(p):
            break
        with open(p) as fh:
            for line in fh:
                line = line.strip()
                if line:
                    actions.append(json.loads(line))
        saw_commit = True
        v += 1
    if not saw_commit:
        raise FileNotFoundError(
            f"Delta log at {table} has no commit {'0' if version is None else version}"
            " (log may have been vacuumed past the requested version)"
        )
    if version is None:
        # a GAP in the sequence (commit v missing but later commits on
        # disk — a botched copy/rsync) must fail loudly: replaying up
        # to the gap would serve a silently stale snapshot while the
        # writer's _latest_version still sees the later commits.
        beyond = [
            n
            for n in os.listdir(log_dir)
            if n.endswith(".json") and n[:20].isdigit() and int(n[:20]) >= v
        ]
        if beyond:
            raise FileNotFoundError(
                f"Delta log at {table} is missing commit {v} but later "
                f"commits exist ({sorted(beyond)[:3]}...) — refusing to "
                "serve a stale snapshot"
            )
    if version is not None and v <= version:
        raise FileNotFoundError(
            f"requested version {version} but log ends at {v - 1}: {table}"
        )
    meta = None
    protocol = None
    active: dict[str, dict] = {}
    txns: dict[str, int] = {}
    for a in actions:
        if "metaData" in a:
            meta = a["metaData"]
        elif "protocol" in a:
            protocol = a["protocol"]
        elif "txn" in a:
            t = a["txn"]
            txns[t["appId"]] = max(
                int(t["version"]), txns.get(t["appId"], -1)
            )
        elif "add" in a:
            active[a["add"]["path"]] = a["add"]
        elif "remove" in a:
            active.pop(a["remove"]["path"], None)
    if protocol is not None and int(protocol.get("minReaderVersion", 1)) > 1:
        # Reader version 3 is the table-features protocol: readable
        # exactly when every listed reader feature is implemented
        # here — deletionVectors (sources/dv.py) and columnMapping
        # (name mode, _mapping_info). Version 2 is the legacy
        # column-mapping protocol: readable exactly when the metadata
        # declares a mapping mode. Anything else (timestampNtz,
        # v2Checkpoint, ...) still refuses loudly — silently ignoring
        # an unknown reader feature is how wrong rows happen.
        feats = set(protocol.get("readerFeatures") or [])
        unsupported = feats - _READER_FEATURES
        mrv = int(protocol["minReaderVersion"])
        legacy_cm = mrv == 2 and (
            (meta or {}).get("configuration") or {}
        ).get("delta.columnMapping.mode") in ("name", "id")
        if not legacy_cm and (mrv != 3 or unsupported):
            raise NotImplementedError(
                f"Delta minReaderVersion={protocol['minReaderVersion']} "
                f"(readerFeatures={sorted(feats)}) exceeds the "
                "protocol-native reader "
                f"(unsupported: {sorted(unsupported) or feats}); "
                "use a connector-enabled cluster"
            )
    if meta is None:
        raise ValueError(f"Delta log at {table} contains no metaData action")
    if (meta.get("format") or {}).get("provider", "parquet") != "parquet":
        raise NotImplementedError(
            f"Delta data format {meta['format']!r} is not parquet"
        )
    if return_protocol:
        return meta, active, txns, protocol
    return meta, active, txns


def _mapping_info(meta: dict, for_write: bool = True):
    """Column-mapping resolution (Delta protocol, "Column Mapping"):
    -> (mode, logical StructType, physical StructType, logical->
    physical name dict). Mode 'name' stores each column's PHYSICAL
    name in the field metadata (`delta.columnMapping.physicalName`);
    parquet files, add-action partitionValues, and statistics all use
    physical names, while the logical schema is free to rename
    without touching a byte of data.

    Mode 'id' (parquet field-id matching): conforming writers stamp
    BOTH the field id and the physical name into metadata and files,
    so the scan resolves by the pinned physicalName exactly like mode
    'name' — read_delta verifies one data file's footer carries
    matching PARQUET:field_id stamps and refuses if not (a pure-id
    layout this resolution cannot serve). WRITES stage under physical
    names with `parquet.field.id` alias metadata, which Spark's
    parquet writer (fieldId.write.enabled) turns into PARQUET:field_id
    footer stamps — so appended files satisfy both this reader's
    verification and a conforming id-matching reader
    (`_physical_select`)."""
    schema = StructType.fromJson(json.loads(meta["schemaString"]))
    mode = ((meta.get("configuration") or {})).get(
        "delta.columnMapping.mode", "none"
    )
    if mode == "none":
        return mode, schema, schema, {f.name: f.name for f in schema.fields}
    if mode not in ("name", "id"):
        raise NotImplementedError(
            f"Delta column mapping mode {mode!r} (only 'name' and "
            "'id' are supported by the protocol-native reader/writer)"
        )
    from pyspark.sql.types import StructField

    l2p, phys = {}, []
    for f in schema.fields:
        md = f.metadata or {}
        pn = md.get("delta.columnMapping.physicalName")
        if not pn:
            raise NotImplementedError(
                f"column {f.name!r} lacks delta.columnMapping."
                f"physicalName under mapping mode {mode!r}"
            )
        if mode == "id" and md.get("delta.columnMapping.id") is None:
            raise NotImplementedError(
                f"column {f.name!r} lacks delta.columnMapping.id "
                "under mapping mode 'id'"
            )
        l2p[f.name] = pn
        phys.append(StructField(pn, f.dataType, f.nullable))
    return mode, schema, StructType(phys), l2p


def _physical_select(logical, l2p: dict, mode: str) -> list:
    """Logical->physical rename selector for STAGING data files on a
    column-mapped table. Mode 'id' additionally stamps each alias
    with `parquet.field.id` metadata — Spark's parquet writer
    (spark.sql.parquet.fieldId.write.enabled, default on) emits it as
    the PARQUET:field_id footer stamp conforming id-mode readers (and
    this module's own `_verify_field_ids` guard) match on."""
    sel = []
    for f in logical.fields:
        if mode == "id":
            fid = int((f.metadata or {})["delta.columnMapping.id"])
            sel.append(
                F.col(f.name).alias(
                    l2p[f.name], metadata={"parquet.field.id": fid}
                )
            )
        else:
            sel.append(F.col(f.name).alias(l2p[f.name]))
    return sel


def _verify_field_ids(table: str, active: dict, meta: dict) -> None:
    """Mode-'id' read guard: one data file's parquet footer must
    carry a PARQUET:field_id stamp matching delta.columnMapping.id
    for every physical column present — proof the physicalName
    resolution serves the same columns an id-matching reader would.
    O(1 footer) driver-side; refuses loudly on a pure-id layout."""
    if not active:
        return
    import pyarrow.parquet as pq

    schema = StructType.fromJson(json.loads(meta["schemaString"]))
    rel = next(iter(active))
    path = os.path.join(table, urllib.parse.unquote(rel))
    arrow = pq.ParquetFile(path).schema_arrow
    part_cols = set(meta.get("partitionColumns") or [])
    for f in schema.fields:
        md = f.metadata or {}
        pn = md.get("delta.columnMapping.physicalName")
        want = int(md.get("delta.columnMapping.id"))
        if pn in part_cols or arrow.get_field_index(pn) == -1:
            continue  # partition values / post-evolution columns
        field = arrow.field(pn)
        fid = (field.metadata or {}).get(b"PARQUET:field_id")
        if fid is None or int(fid) != want:
            raise NotImplementedError(
                f"mode-'id' table stores column {f.name!r} with "
                f"field id {fid!r} where metadata says {want} — the "
                "physicalName resolution cannot serve this layout"
            )


def _physical_read(meta: dict, for_write: bool = True):
    """What the SCAN must use vs what the USER sees: -> (logical
    schema, scan schema, physical partition cols, rename selector or
    None). partitionColumns entries are normalized to physical
    (tolerating logs that record either side of the mapping)."""
    mode, logical, physical, l2p = _mapping_info(meta, for_write=for_write)
    part_cols = list(meta.get("partitionColumns") or [])
    if mode == "none":
        return logical, logical, part_cols, None
    phys_names = {f.name for f in physical.fields}
    norm = []
    for c in part_cols:
        if c in l2p:
            norm.append(l2p[c])
        elif c in phys_names:
            norm.append(c)
        else:
            raise ValueError(
                f"partition column {c!r} matches neither a logical nor "
                "a physical column of the mapped schema"
            )
    sel = [F.col(l2p[f.name]).alias(f.name) for f in logical.fields]
    return logical, physical, norm, sel


def read_delta(
    spark: SparkSession,
    path: str,
    version: int | None = None,
    scan_filter: dict | None = None,
) -> DataFrame:
    """Read a Delta table snapshot (latest, or `version` for time
    travel) without any connector jar — see module docstring.

    Partition columns are reconstructed from each file's
    `partitionValues` (the log is authoritative; hive-style dirs are
    not assumed). Two plan shapes, picked per snapshot:

    - FAST PATH (hive-consistent layout, the shape every mainstream
      writer produces): when each active file sits under directory
      segments that literally spell its partitionValues
      (`lang=en/part-....parquet`), the whole snapshot is ONE
      basePath scan with the full user schema — Spark derives the
      partition columns from the paths, casts them to the declared
      types, and partition-column filters push down as native
      PartitionFilters. Plan width is O(1) in the number of
      partitions — the shape that survives a 100k-partition table.
    - FALLBACK (protocol-correct for any writer): group files by
      partition-value tuple and union one scan per group with the
      values attached as literal columns; filters then prune groups
      via constant folding. Width is O(#distinct partition tuples) —
      fine for foreign layouts, which are rare and small here.

    Files whose add action carries a `deletionVector` (reader
    version 3 / deletionVectors feature — DELETE/UPDATE/MERGE
    without rewriting data files) are scanned separately with
    `_metadata.row_index` and anti-joined against their vectors'
    deleted row positions (sources/dv.py parses the public Z85 +
    portable-Roaring DV format) — see _apply_deletion_vectors."""
    table = os.path.abspath(path)
    meta, active, _txns = _snapshot_actions(table, version)
    logical, schema, part_cols, rename = _physical_read(
        meta, for_write=False
    )
    if (meta.get("configuration") or {}).get(
        "delta.columnMapping.mode"
    ) == "id":
        _verify_field_ids(table, active, meta)
    if scan_filter:
        # file skipping on the log's per-add stats (minValues/
        # maxValues) + typed partitionValues — driver-side O(adds),
        # the zone-map layer; the predicate re-applies row-level
        # below, so pruning can only skip files that cannot match
        unknown = set(scan_filter) - {f.name for f in logical.fields}
        if unknown:
            raise ValueError(
                f"scan_filter column(s) {sorted(unknown)} not in table "
                f"schema {logical.fieldNames()}"
            )
        _mode, _lg, _ph, l2p = _mapping_info(meta, for_write=False)
        phys_filter = {l2p.get(c, c): v for c, v in scan_filter.items()}
        types = {
            l2p.get(f.name, f.name): f.dataType.simpleString()
            for f in logical.fields
        }
        active = {
            p: a
            for p, a in active.items()
            if _add_survives_filter(a, phys_filter, types, part_cols)
        }
    if not active:
        return spark.createDataFrame([], logical)
    plain: list[tuple[str, dict]] = []
    masked: list[tuple[tuple[str, dict], dict]] = []
    for add in active.values():
        e = (
            os.path.join(table, urllib.parse.unquote(add["path"])),
            add.get("partitionValues") or {},
        )
        if add.get("deletionVector"):
            masked.append((e, add["deletionVector"]))
        else:
            plain.append(e)
    parts = []
    if plain:
        parts.append(_scan_snapshot(spark, table, schema, part_cols, plain))
    if masked:
        parts.append(
            _apply_deletion_vectors(spark, table, schema, part_cols, masked)
        )
    out = parts[0] if len(parts) == 1 else parts[0].unionByName(parts[1])
    # column mapping: the files were scanned under physical names;
    # hand back the logical view
    out = out.select(*rename) if rename is not None else out
    if scan_filter:
        out = out.filter(_scan_filter_predicate(scan_filter))
    return out


def _apply_deletion_vectors(
    spark: SparkSession,
    table: str,
    schema: StructType,
    part_cols: Sequence[str],
    masked: Sequence[tuple[tuple[str, dict], dict]],
) -> DataFrame:
    """Rows of the DV-bearing files minus their deleted positions:
    scan with `_metadata.row_index`, LEFT ANTI join on the exact
    (file, row position) pairs each vector tombstones. The descriptor
    parse is driver-side METADATA work (a DV is a compressed bitmap,
    KB-scale for millions of deletes; delta-spark parses them on the
    driver too), the deleted-key set ships as one broadcast local
    relation, and the join itself is a broadcast anti-join below the
    parquet scan — no shuffle of table data, files without DVs never
    pay anything."""
    from archetype_spark.sources import dv as _dv

    entries: list[tuple[str, dict]] = []
    deleted: list[tuple[str, int]] = []
    for (p, pv), desc in masked:
        entries.append((p, pv))
        ap = os.path.abspath(p)
        deleted.extend((ap, int(r)) for r in _dv.read_descriptor(table, desc))
    scan = _scan_snapshot(
        spark, table, schema, part_cols, entries, keep_meta=True
    )
    del_df = spark.createDataFrame(
        deleted, "__dv_file string, __dv_ridx bigint"
    )
    cols = [f.name for f in schema.fields]
    return scan.join(
        F.broadcast(del_df), ["__dv_file", "__dv_ridx"], "left_anti"
    ).select(*cols)


def read_delta_changes(
    spark: SparkSession,
    path: str,
    starting_version: int,
    ending_version: int | None = None,
) -> DataFrame:
    """Incremental (CDC-style) read: the rows ADDED by each commit in
    `starting_version..ending_version` (inclusive, latest when None),
    tagged with a `_commit_version` column — the append/insert subset
    of Delta's Change Data Feed, resolved from the same public log.

    This is the scale path for incremental pipelines: a downstream
    consumer processes only the files the new commits added — cost
    O(new data), not O(table) — instead of diffing two full
    snapshots. Commits that only tombstone files (pure removes, e.g.
    a vacuumed compaction's source) contribute no rows; an overwrite
    commit contributes its full rewritten file set, exactly what its
    `dataChange` adds claim.

    Loud failures, never silent gaps: a requested version whose JSON
    commit is gone (log cleaned past it) raises FileNotFoundError —
    an incremental consumer silently skipping a missing commit would
    emit a hole as if it were empty."""
    table = os.path.abspath(path)
    latest = _latest_version(table)
    if latest is None:
        raise FileNotFoundError(f"not a Delta table: {table}")
    end = latest if ending_version is None else ending_version
    if not 0 <= starting_version <= end <= latest:
        raise ValueError(
            f"bad version range [{starting_version}, {end}] for table "
            f"at version {latest}"
        )
    # schema + partitioning from the end-of-range snapshot (schema
    # drift inside the range is refused at commit time, so one
    # metaData governs every commit in it)
    meta, _active, _txns = _snapshot_actions(table, end)
    logical, schema, part_cols, rename = _physical_read(
        meta, for_write=False
    )

    per_version: list[DataFrame] = []
    for v in range(starting_version, end + 1):
        p = _commit_path(table, v)
        if not os.path.exists(p):
            raise FileNotFoundError(
                f"commit {v} missing from {table} (log cleaned?): "
                "incremental read cannot skip versions"
            )
        entries = []
        removed_data = False
        with open(p) as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                action = json.loads(line)
                add = action.get("add")
                rm = action.get("remove")
                if rm and rm.get("dataChange", True):
                    removed_data = True
                if add and add.get("deletionVector"):
                    raise NotImplementedError(
                        f"commit {v} rewrites a deletion vector: the "
                        "incremental adds-only read cannot express "
                        "row-level deletes (that needs the Change Data "
                        "Feed's change-data files); read full snapshots "
                        "instead"
                    )
                if add and add.get("dataChange", True):
                    entries.append(
                        (
                            os.path.join(
                                table, urllib.parse.unquote(add["path"])
                            ),
                            add.get("partitionValues") or {},
                        )
                    )
        if removed_data and not entries:
            # a commit that tombstones data WITHOUT adding any (a
            # whole-file DELETE) is a data change the adds-only read
            # cannot express — skipping it would emit the delete as a
            # silent nothing. Overwrites/compactions are fine: their
            # rewritten adds land in the same commit.
            raise NotImplementedError(
                f"commit {v} removes data files without adding rows "
                "(row-level/whole-file DELETE): the incremental "
                "adds-only read cannot express deletes; read full "
                "snapshots instead"
            )
        if entries:
            scan = _scan_snapshot(spark, table, schema, part_cols, entries)
            if rename is not None:
                scan = scan.select(*rename)
            per_version.append(
                scan.withColumn("_commit_version", F.lit(v).cast("bigint"))
            )
    if not per_version:
        return (
            spark.createDataFrame([], logical)
            .withColumn("_commit_version", F.lit(None).cast("bigint"))
        )
    out = per_version[0]
    for df in per_version[1:]:
        out = out.unionByName(df)
    return out


# ---------------------------------------------------------------------- write


def _stage_data_files(
    df: DataFrame, dest_root: str, part_cols: Sequence[str],
    fmt: str = "parquet",
) -> list[dict]:
    """Write `df` as parquet (or ORC — Iceberg tables may elect it)
    via a staging dir and move the files under `dest_root` preserving
    hive partition dirs. Returns one {rel_path, partition_values,
    size, mtime_ms, num_rows} per data file — the lake-format-neutral
    half of a commit (Delta and Iceberg writers both build their
    metadata from this; Delta is parquet-only by spec)."""
    import pyarrow.parquet as pq

    if fmt not in ("parquet", "orc"):
        raise ValueError(f"stageable data file format {fmt!r}")
    stage = os.path.join(dest_root, f".stage-{uuid.uuid4().hex}")
    writer = df.write.mode("overwrite")
    if part_cols:
        writer = writer.partitionBy(*part_cols)
    writer.format(fmt).save(stage)
    out = []
    for root, _dirs, files in os.walk(stage):
        for name in files:
            if not name.endswith("." + fmt):
                continue
            src = os.path.join(root, name)
            rel_dir = os.path.relpath(root, stage)
            pv: dict[str, str | None] = {}
            if rel_dir != ".":
                for seg in rel_dir.split(os.sep):
                    col, _, raw = seg.partition("=")
                    pv[col] = (
                        None
                        if raw == "__HIVE_DEFAULT_PARTITION__"
                        else urllib.parse.unquote(raw)
                    )
            rel_path = name if rel_dir == "." else f"{rel_dir}/{name}"
            dst = os.path.join(dest_root, rel_path)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            os.rename(src, dst)
            out.append(
                {
                    "rel_path": rel_path,
                    "partition_values": pv,
                    "size": os.path.getsize(dst),
                    "mtime_ms": int(os.path.getmtime(dst) * 1000),
                    # true row count from the parquet footer — Iceberg
                    # manifests require record_count and spec-compliant
                    # readers may answer COUNT(*) from it without
                    # touching data files; a placeholder would be
                    # silently wrong there. Footer-only read, O(KB).
                    "num_rows": (
                        pq.ParquetFile(dst).metadata.num_rows
                        if fmt == "parquet"
                        else __import__(
                            "pyarrow.orc", fromlist=["ORCFile"]
                        ).ORCFile(dst).nrows
                    ),
                }
            )
    shutil.rmtree(stage, ignore_errors=True)
    return out


def _file_stats_json(abs_path: str, part_cols: Sequence[str]) -> str | None:
    """The Delta protocol's per-file `stats` JSON from the parquet
    footer: numRecords, minValues/maxValues for numeric/date/
    timestamp columns (strings record nullCount only — parquet may
    TRUNCATE string min/max and a truncated max would prune wrong),
    and nullCount. Keys are the footer's own (physical) column
    names, which is what the protocol stores under column mapping.
    Footer-only read, O(KB) — the same tier as the size/mtime the
    add action already records. None when the footer yields nothing
    (non-parquet staging never reaches here)."""
    import datetime as _dt

    import pyarrow.parquet as pq

    md = pq.ParquetFile(abs_path).metadata
    mins: dict[str, object] = {}
    maxs: dict[str, object] = {}
    nulls: dict[str, int] = {}
    dropped: set[str] = set()
    no_nulls: set[str] = set()
    for g in range(md.num_row_groups):
        rg = md.row_group(g)
        for c in range(rg.num_columns):
            col = rg.column(c)
            name = col.path_in_schema
            if "." in name or name in part_cols:
                continue  # nested leaves / partition cols: no stats
            st = col.statistics
            if st is None:
                dropped.add(name)
                no_nulls.add(name)
                mins.pop(name, None)
                maxs.pop(name, None)
                nulls.pop(name, None)  # a partial count would be wrong
                continue
            if st.null_count is None:
                no_nulls.add(name)
                nulls.pop(name, None)
            elif name not in no_nulls:
                nulls[name] = nulls.get(name, 0) + int(st.null_count)
            if (
                name in dropped
                or not st.has_min_max
                or isinstance(st.min, (bytes, str))
            ):
                dropped.add(name)
                mins.pop(name, None)
                maxs.pop(name, None)
                continue
            if name not in mins or st.min < mins[name]:
                mins[name] = st.min
            if name not in maxs or st.max > maxs[name]:
                maxs[name] = st.max

    def ser(v):
        if isinstance(v, _dt.datetime):
            if v.tzinfo is not None:
                v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
            return v.isoformat() + "Z"
        if isinstance(v, _dt.date):
            return v.isoformat()
        if isinstance(v, bool) or not isinstance(v, (int, float)):
            return None  # decimal/bool/unknown: record no bound
        return v

    stats: dict = {"numRecords": md.num_rows}
    if mins:
        lo = {k: ser(v) for k, v in sorted(mins.items())}
        hi = {k: ser(v) for k, v in sorted(maxs.items())}
        keep = {k for k in lo if lo[k] is not None and hi.get(k) is not None}
        if keep:
            stats["minValues"] = {k: lo[k] for k in sorted(keep)}
            stats["maxValues"] = {k: hi[k] for k in sorted(keep)}
    if nulls:
        stats["nullCount"] = dict(sorted(nulls.items()))
    return json.dumps(stats)


def _stat_domain(v, dt_name: str):
    """A stats-JSON or scan_filter value -> one comparable python
    domain per column type (dates/timestamps to their objects,
    numerics as-is). None = incomparable, keep the file."""
    import datetime as _dt

    if v is None:
        return None
    try:
        if dt_name in ("bigint", "int", "smallint", "tinyint"):
            return int(v)
        if dt_name in ("double", "float"):
            return float(v)
        if dt_name == "date":
            if isinstance(v, _dt.datetime):
                return v.date()
            if isinstance(v, _dt.date):
                return v
            return _dt.date.fromisoformat(str(v))
        if dt_name in ("timestamp", "timestamp_ntz"):
            if isinstance(v, _dt.datetime):
                ts = v
            else:
                ts = _dt.datetime.fromisoformat(
                    str(v).replace("Z", "+00:00")
                )
            if ts.tzinfo is not None:
                ts = ts.astimezone(_dt.timezone.utc).replace(tzinfo=None)
            return ts
        if dt_name == "string":
            return str(v)
    except (ValueError, TypeError):
        return None
    return None


def _add_survives_filter(
    add: dict, scan_filter: dict, types: dict, part_cols: Sequence[str]
) -> bool:
    """Driver-side file skipping for one add action: partitionValues
    equality/range (typed through the schema — the log stores
    strings) AND the protocol's per-file stats minValues/maxValues.
    Conservative: a missing value, unparseable stats, or an
    incomparable domain keeps the file; the scan re-applies the
    predicate row-level. A DV on the file only removes rows, so its
    recorded bounds stay a valid superset."""
    pv = add.get("partitionValues") or {}
    raw = add.get("stats")
    mins: dict = {}
    maxs: dict = {}
    if raw:
        try:
            st = json.loads(raw)
            mins = st.get("minValues") or {}
            maxs = st.get("maxValues") or {}
        except (ValueError, TypeError):
            pass
    for col, flt in scan_filter.items():
        tn = types.get(col)
        if tn is None:
            continue
        if col in part_cols:
            if col not in pv:
                continue
            lo = hi = _stat_domain(pv[col], tn)
        else:
            lo = _stat_domain(mins.get(col), tn)
            hi = _stat_domain(maxs.get(col), tn)
        if lo is None and hi is None:
            continue
        try:
            if isinstance(flt, tuple):
                f_lo = _stat_domain(flt[0], tn)
                f_hi = _stat_domain(flt[1], tn)
                if f_lo is not None and hi is not None and hi < f_lo:
                    return False
                if f_hi is not None and lo is not None and lo >= f_hi:
                    return False
            else:
                v = _stat_domain(flt, tn)
                if v is None:
                    continue
                if lo is not None and v < lo:
                    return False
                if hi is not None and v > hi:
                    return False
        except TypeError:
            continue
    return True


def _scan_filter_predicate(scan_filter: dict):
    """Row-level Column predicate for scan_filter: scalar equality;
    (lo, hi) half-open, None unbounding a side — the re-application
    that makes pruning an optimization, never the answer."""
    pred = F.lit(True)
    for col, flt in scan_filter.items():
        if isinstance(flt, tuple):
            lo, hi = flt
            if lo is not None:
                pred = pred & (F.col(col) >= F.lit(lo))
            if hi is not None:
                pred = pred & (F.col(col) < F.lit(hi))
        else:
            pred = pred & (F.col(col) == F.lit(flt))
    return pred


def count_rows_delta(path: str, version: int | None = None) -> int:
    """Metadata-only COUNT(*): sum of the active adds' stats
    numRecords minus their deletion vectors' cardinalities — zero
    data files opened, the same O(log) answer delta-spark serves.
    Refuses loudly when any active file lacks numRecords (tables
    written before stats landed — compact or rewrite to stamp them);
    a guessed count would be silently wrong."""
    table = os.path.abspath(path)
    _meta, active, _txns = _snapshot_actions(table, version)
    total = 0
    for rel, add in active.items():
        raw = add.get("stats")
        n = None
        if raw:
            try:
                n = json.loads(raw).get("numRecords")
            except (ValueError, TypeError):
                n = None
        if n is None:
            raise NotImplementedError(
                f"active file {rel!r} records no numRecords stats: "
                "metadata-only COUNT would be a guess (rewrite or "
                "compact the table to stamp stats)"
            )
        total += int(n)
        dv = add.get("deletionVector")
        if dv is not None:
            total -= int(dv.get("cardinality") or 0)
    return total


def _scan_snapshot(
    spark: SparkSession,
    base_root: str,
    schema: StructType,
    part_cols: Sequence[str],
    entries: Sequence[tuple[str, dict]],
    keep_meta: bool = False,
    fmt: str = "parquet",
):
    """Assemble the snapshot scan for `entries` = [(abs_file_path,
    {partition col: value})]. Fast path: when every file sits under
    hive dirs literally spelling its (glob-safe) partition values,
    ONE basePath scan with native PartitionFilters — plan width O(1)
    in partition count. Fallback: per-partition-tuple unions with
    literal columns pruned by constant folding. Shared by the Delta
    and Iceberg readers; partition values here are AUTHORITATIVE
    (from each format's metadata), paths only an optimization.

    `keep_meta` appends `__dv_file` (the scheme-stripped OS path of
    each row's source file — Spark reports `file:/...` URIs locally)
    and `__dv_ridx` (`_metadata.row_index`, the physical row position
    deletion vectors and positional deletes address) — the join key
    for row-level delete application.

    `fmt` selects the native Spark reader ('parquet' or 'orc' — both
    stay JVM-side with pushdown; Iceberg tables may carry ORC data
    files). Spark's ORC scan exposes no `_metadata.row_index`, so
    with keep_meta an ORC `__dv_ridx` is NULL — callers needing REAL
    ORC positions route those entries through the pyarrow scan
    instead (iceberg._scan_orc_files_positional)."""
    part_fields = {f.name: f for f in schema.fields if f.name in part_cols}
    data_schema = StructType(
        [f for f in schema.fields if f.name not in part_cols]
    )
    cols = [f.name for f in schema.fields]
    meta_cols = (
        [
            F.regexp_replace(
                F.col("_metadata.file_path"), r"^[a-zA-Z][\w+.-]*:/+", "/"
            ).alias("__dv_file"),
            (
                F.col("_metadata.row_index")
                if fmt == "parquet"
                else F.lit(None).cast("bigint")
            ).alias("__dv_ridx"),
        ]
        if keep_meta
        else []
    )

    def hive_ok(path: str, pv: dict) -> bool:
        segs = []
        for c in part_cols:
            v = pv.get(c)
            if v is None or not _GLOB_SAFE.match(str(v)):
                return False
            segs.append(f"{c}={v}")
        prefix = os.path.join(base_root, *segs) + os.sep
        return path.startswith(prefix)

    if part_cols and all(hive_ok(p, pv) for p, pv in entries):
        return (
            spark.read.schema(schema)
            .option("basePath", base_root)
            .format(fmt)
            .load([p for p, _ in entries])
            .select(*cols, *meta_cols)
        )

    groups: dict[tuple, list[str]] = {}
    for p, pv in entries:
        key = tuple(pv.get(c) for c in part_cols)
        groups.setdefault(key, []).append(p)
    parts = []
    for key, files in sorted(groups.items(), key=lambda kv: str(kv[0])):
        df = spark.read.schema(data_schema).format(fmt).load(files)
        for col, raw in zip(part_cols, key):
            typed = (F.lit(None) if raw is None else F.lit(raw)).cast(
                part_fields[col].dataType
            )
            df = df.withColumn(col, typed)
        parts.append(df.select(*cols, *meta_cols))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _publish_commit(table: str, version: int, actions: list[dict]) -> None:
    """Atomic single-writer commit: write to a temp name, rename into
    place. os.rename onto an existing path would clobber on POSIX, so
    existence is checked first and the window is the documented
    single-writer contract."""
    log_dir = os.path.join(table, _LOG_DIR)
    os.makedirs(log_dir, exist_ok=True)
    final = _commit_path(table, version)
    if os.path.exists(final):
        raise FileExistsError(
            f"Delta commit {version} already exists (concurrent writer?): {final}"
        )
    tmp = os.path.join(log_dir, f".tmp-{uuid.uuid4().hex}.json")
    with open(tmp, "w") as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")
    os.rename(tmp, final)


def _latest_version(table: str) -> int | None:
    """Highest committed version: max over JSON commits AND the last
    checkpoint — a table whose pre-checkpoint JSONs were vacuumed must
    not hand out already-used version numbers to the writer."""
    log_dir = os.path.join(table, _LOG_DIR)
    if not os.path.isdir(log_dir):
        return None
    versions = [
        int(n[:20])
        for n in os.listdir(log_dir)
        if n.endswith(".json") and n[:20].isdigit()
    ]
    lc_path = os.path.join(log_dir, "_last_checkpoint")
    if os.path.exists(lc_path):
        with open(lc_path) as fh:
            versions.append(int(json.load(fh)["version"]))
    return max(versions) if versions else None


def write_delta(
    df: DataFrame,
    path: str,
    mode: str = "append",
    partition_by: Sequence[str] | None = None,
    txn: tuple[str, int] | None = None,
) -> None:
    """Append/overwrite a DataFrame as a Delta commit (single-writer;
    module docstring). The data files are written by Spark's parquet
    writer into a staging dir, moved under the table root, and
    published as one commit of `add` actions (+ `remove` of every
    previously-active file for overwrite).

    `txn=(app_id, version)` stamps the protocol's transaction
    identifier into the commit — the idempotence handshake streaming
    sinks use (see streaming_delta_sink): a replayed micro-batch is
    detected by comparing its batch id against the app's logged
    high-water mark."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append|overwrite, got {mode!r}")
    table = os.path.abspath(path)
    prev = _latest_version(table)
    part_cols = list(partition_by or [])

    if prev is None:
        actions: list[dict] = [
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            {
                "metaData": {
                    "id": uuid.uuid4().hex,
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": df.schema.json(),
                    "partitionColumns": part_cols,
                    "configuration": {},
                }
            },
        ]
        removes: dict[str, dict] = {}
        version = 0
    else:
        meta, removes, _txns = _snapshot_actions(table)
        logged = list(meta.get("partitionColumns") or [])
        if part_cols and part_cols != logged:
            raise ValueError(
                f"partition_by {part_cols} != table partitioning {logged}"
            )
        part_cols = logged
        # schema drift is refused at commit time (the module's
        # loud-failure contract, like connector writers): silently
        # committing a narrower/renamed/retyped frame would read back
        # as NULL columns or late task-side conversion errors.
        # Nullability differences are tolerated (Spark frames vary).
        def _key(schema: StructType):
            return sorted((f.name, f.dataType.simpleString()) for f in schema.fields)

        logged_schema = StructType.fromJson(json.loads(meta["schemaString"]))
        if _key(df.schema) != _key(logged_schema):
            raise ValueError(
                f"schema mismatch vs table {table}: writing "
                f"{df.schema.simpleString()} into {logged_schema.simpleString()}"
            )
        # column-mapped tables store PHYSICAL names in the parquet
        # files and in add-action partitionValues (protocol rule);
        # the caller's frame speaks logical names
        cm_mode, logical, _phys, l2p = _mapping_info(meta)
        if cm_mode != "none":
            df = df.select(*_physical_select(logical, l2p, cm_mode))
            part_cols_stage = [l2p.get(c, c) for c in part_cols]
        else:
            part_cols_stage = part_cols
        actions = []
        version = prev + 1

    if prev is None:
        part_cols_stage = part_cols
    # stage the data files, then move them under the table root
    adds = [
        {
            "add": {
                # percent-encode per the protocol, but keep '/' and
                # '=' literal as connector writers do (partition dirs
                # stay 'lang=en/...')
                "path": urllib.parse.quote(f["rel_path"], safe="/="),
                "partitionValues": {
                    c: f["partition_values"].get(c) for c in part_cols_stage
                },
                "size": f["size"],
                "modificationTime": f["mtime_ms"],
                "dataChange": True,
                "stats": _file_stats_json(
                    os.path.join(table, f["rel_path"]), part_cols_stage
                ),
            }
        }
        for f in _stage_data_files(df, table, part_cols_stage)
    ]

    if mode == "overwrite" and prev is not None:
        for p in removes:
            actions.append(
                {"remove": {"path": p, "dataChange": True}}
            )
    if txn is not None:
        actions.append({"txn": {"appId": txn[0], "version": int(txn[1])}})
    actions.extend(adds)
    _publish_commit(table, version, actions)


# ------------------------------------------------------------------ streaming


def compact_delta(
    spark: SparkSession,
    path: str,
    target_files: int | None = None,
    sort_by: Sequence[str] | None = None,
    zorder_by: Sequence[str] | None = None,
) -> None:
    """OPTIMIZE-style bin-packing: rewrite the active file set as ONE
    overwrite commit — small files from many appends (or a streaming
    sink's per-batch commits) merge into `target_files` outputs per
    partition directory (Spark's default parallelism when None).
    `sort_by` sorts within the rewritten files so parquet row-group
    min/max stats support skipping on ONE leading key — the linear
    clustering. `zorder_by` (2-4 columns, mutually exclusive with
    sort_by) is the real OPTIMIZE ZORDER: Morton-interleave the
    rank-scaled columns, range-partition + sort on the z-value
    (operators/zorder.py), so box predicates on ANY subset of the
    columns prune files on footer stats.

    The rewrite costs one full read+write of the ACTIVE data (not
    the history); the old files are tombstoned, stay time-travelable
    until `vacuum_delta`, and the streaming sink's txn marks are
    unaffected (they live in the log, not the files)."""
    if sort_by and zorder_by:
        raise ValueError("pass sort_by or zorder_by, not both")
    df = read_delta(spark, path)
    if zorder_by:
        from archetype_spark.operators.zorder import zorder_repartition

        df = zorder_repartition(
            df,
            list(zorder_by),
            target_files or spark.sparkContext.defaultParallelism,
        )
        write_delta(df, path, mode="overwrite")
        return
    if target_files is not None:
        df = df.repartition(target_files)
    if sort_by:
        df = df.sortWithinPartitions(*sort_by)
    write_delta(df, path, mode="overwrite")


def add_column_delta(path: str, name: str, spark_type: str) -> int:
    """Additive schema evolution: append a nullable column as a
    METADATA-ONLY commit (one updated metaData action — zero data
    rewritten, the spec's evolution path). Data files written before
    the evolution simply lack the column and read back as NULL (the
    scan passes the logged schema explicitly, so Spark fills absent
    parquet columns). Appends after the evolution must carry the new
    column — the existing drift check now enforces the WIDER schema.
    Only additive evolution is offered: renames/drops/retypes change
    the meaning of existing bytes and stay refused loudly."""
    from pyspark.sql.types import StructField, _parse_datatype_string

    table = os.path.abspath(path)
    version = _latest_version(table)
    if version is None:
        raise FileNotFoundError(f"not a Delta table: {table}")
    meta, _active, _txns = _snapshot_actions(table)
    schema = StructType.fromJson(json.loads(meta["schemaString"]))
    if name in schema.fieldNames():
        raise ValueError(f"column {name!r} already exists in {table}")
    new_meta = dict(meta)
    mode = (meta.get("configuration") or {}).get(
        "delta.columnMapping.mode", "none"
    )
    md = None
    if mode in ("name", "id"):
        # mapped tables: a NEW column gets a fresh field id and a
        # never-reusable physical name (the spec's rule — reusing a
        # dropped column's physical name would resurrect its bytes)
        conf = dict(meta["configuration"])
        next_id = int(conf.get("delta.columnMapping.maxColumnId", 0)) + 1
        md = {
            "delta.columnMapping.id": next_id,
            "delta.columnMapping.physicalName": f"col-{uuid.uuid4().hex}",
        }
        conf["delta.columnMapping.maxColumnId"] = str(next_id)
        new_meta["configuration"] = conf
    new_schema = StructType(
        list(schema.fields)
        + [StructField(name, _parse_datatype_string(spark_type), True, md or {})]
    )
    new_meta["schemaString"] = new_schema.json()
    _publish_commit(table, version + 1, [{"metaData": new_meta}])
    return version + 1


def enable_column_mapping_delta(path: str) -> int:
    """Upgrade a table to column mapping mode 'name' (metadata-only
    commit): every existing column's physicalName becomes its CURRENT
    name — so every parquet byte already on disk still matches — and
    the protocol is raised to the mapping-capable level (legacy
    reader 2 / writer 5, or the columnMapping feature flags when the
    table already speaks table-features). From then on the logical
    schema can rename without rewriting data (`rename_column_delta`)
    and drop columns without touching files (`drop_column_delta`).
    Returns the committed version."""
    from pyspark.sql.types import StructField

    table = os.path.abspath(path)
    version = _latest_version(table)
    if version is None:
        raise FileNotFoundError(f"not a Delta table: {table}")
    meta, _active, _txns, protocol = _snapshot_actions(
        table, return_protocol=True
    )
    conf = dict(meta.get("configuration") or {})
    if conf.get("delta.columnMapping.mode", "none") != "none":
        raise ValueError(f"column mapping already enabled on {table}")
    schema = StructType.fromJson(json.loads(meta["schemaString"]))
    fields = []
    for i, f in enumerate(schema.fields):
        md = dict(f.metadata or {})
        md["delta.columnMapping.id"] = i + 1
        md["delta.columnMapping.physicalName"] = f.name
        fields.append(StructField(f.name, f.dataType, f.nullable, md))
    conf["delta.columnMapping.mode"] = "name"
    conf["delta.columnMapping.maxColumnId"] = str(len(fields))
    new_meta = dict(meta)
    new_meta["schemaString"] = StructType(fields).json()
    new_meta["configuration"] = conf
    actions: list[dict] = []
    mrv = int((protocol or {}).get("minReaderVersion", 1))
    mwv = int((protocol or {}).get("minWriterVersion", 2))
    if mrv >= 3 or mwv >= 7:
        # already (or partially) on table features: merge, carrying
        # legacy-implied features forward (a (1,7) writer-features
        # table must not lose them to a reader upgrade)
        feats = set((protocol or {}).get("readerFeatures") or [])
        if "columnMapping" not in feats or mrv < 3:
            actions.append(
                {
                    "protocol": _table_features_protocol(
                        protocol,
                        new_meta,
                        extra_reader=("columnMapping",),
                        extra_writer=("columnMapping",),
                    )
                }
            )
    elif mrv < 2:
        # legacy column-mapping protocol; never lower the writer level
        actions.append(
            {
                "protocol": {
                    "minReaderVersion": 2,
                    "minWriterVersion": max(mwv, 5),
                }
            }
        )
    actions.append({"metaData": new_meta})
    _publish_commit(table, version + 1, actions)
    return version + 1


def rename_column_delta(path: str, old: str, new: str) -> int:
    """Rename a column WITHOUT rewriting a byte of data — the whole
    point of column mapping: only the logical name in the schema
    changes; the physicalName pinned at upgrade keeps matching every
    parquet file and every partitionValues key already committed.
    Metadata-only commit; returns the version."""
    table = os.path.abspath(path)
    version = _latest_version(table)
    if version is None:
        raise FileNotFoundError(f"not a Delta table: {table}")
    meta, _active, _txns = _snapshot_actions(table)
    mode, schema, _phys, _l2p = _mapping_info(meta)
    if mode != "name":
        raise ValueError(
            f"rename needs column mapping (run enable_column_mapping_delta "
            f"first); table {table} has mode {mode!r}"
        )
    if old not in schema.fieldNames():
        raise ValueError(f"no column {old!r} in {schema.fieldNames()}")
    if new in schema.fieldNames():
        raise ValueError(f"column {new!r} already exists")
    from pyspark.sql.types import StructField

    fields = [
        StructField(new if f.name == old else f.name, f.dataType, f.nullable, f.metadata)
        for f in schema.fields
    ]
    new_meta = dict(meta)
    new_meta["schemaString"] = StructType(fields).json()
    new_meta["partitionColumns"] = [
        new if c == old else c for c in (meta.get("partitionColumns") or [])
    ]
    _publish_commit(table, version + 1, [{"metaData": new_meta}])
    return version + 1


def drop_column_delta(path: str, name: str) -> int:
    """Drop a column without rewriting data (column mapping): the
    field leaves the logical schema; its bytes stay in the files,
    unread (a later compaction physically sheds them). Partition
    columns refuse — their values structure the layout. Metadata-only
    commit; returns the version."""
    table = os.path.abspath(path)
    version = _latest_version(table)
    if version is None:
        raise FileNotFoundError(f"not a Delta table: {table}")
    meta, _active, _txns = _snapshot_actions(table)
    mode, schema, _phys, _l2p = _mapping_info(meta)
    if mode != "name":
        raise ValueError(
            f"drop needs column mapping (run enable_column_mapping_delta "
            f"first); table {table} has mode {mode!r}"
        )
    if name not in schema.fieldNames():
        raise ValueError(f"no column {name!r} in {schema.fieldNames()}")
    if name in (meta.get("partitionColumns") or []):
        raise ValueError(f"cannot drop partition column {name!r}")
    if len(schema.fields) == 1:
        raise ValueError("cannot drop the last column")
    new_meta = dict(meta)
    new_meta["schemaString"] = StructType(
        [f for f in schema.fields if f.name != name]
    ).json()
    _publish_commit(table, version + 1, [{"metaData": new_meta}])
    return version + 1


def enable_cdf_delta(path: str) -> int:
    """Turn on the Change Data Feed (metadata-only commit): sets the
    delta.enableChangeDataFeed table property and raises the writer
    protocol to the CDF-capable level (legacy minWriterVersion 4, or
    the changeDataFeed writer feature on table-features tables). From
    the NEXT commit on, DELETE/UPDATE statements write their touched
    rows into _change_data/ files and read_delta_cdf can serve
    row-level changes — including deletes — instead of refusing.
    Returns the committed version."""
    table = os.path.abspath(path)
    version = _latest_version(table)
    if version is None:
        raise FileNotFoundError(f"not a Delta table: {table}")
    meta, _active, _txns, protocol = _snapshot_actions(
        table, return_protocol=True
    )
    conf = dict(meta.get("configuration") or {})
    if str(conf.get("delta.enableChangeDataFeed", "")).lower() == "true":
        raise ValueError(f"Change Data Feed already enabled on {table}")
    conf["delta.enableChangeDataFeed"] = "true"
    new_meta = dict(meta)
    new_meta["configuration"] = conf
    actions: list[dict] = []
    p = protocol or {"minReaderVersion": 1, "minWriterVersion": 2}
    mwv = int(p.get("minWriterVersion", 2))
    if mwv >= 7:
        wfeats = set(p.get("writerFeatures") or [])
        if "changeDataFeed" not in wfeats:
            actions.append(
                {
                    "protocol": {
                        **p,
                        "writerFeatures": sorted(
                            wfeats | {"changeDataFeed"}
                        ),
                    }
                }
            )
    elif mwv < 4:
        actions.append(
            {
                "protocol": {
                    "minReaderVersion": int(p.get("minReaderVersion", 1)),
                    "minWriterVersion": 4,
                }
            }
        )
    actions.append({"metaData": new_meta})
    _publish_commit(table, version + 1, actions)
    return version + 1


def read_delta_cdf(
    spark: SparkSession,
    path: str,
    starting_version: int,
    ending_version: int | None = None,
) -> DataFrame:
    """Row-level CHANGE read — the Change Data Feed consumer: every
    change each commit in the range made, as table columns plus
    `_change_type` ('insert' | 'delete' | 'update_preimage' |
    'update_postimage') and `_commit_version`. Commits that wrote
    change-data files (DELETE/UPDATE under the CDF property) serve
    them verbatim; plain append commits derive their rows as inserts
    from the add actions (the protocol's rule — blind appends need no
    change files); a commit that REMOVES rows without change files
    (mutations from before enable_cdf_delta) refuses loudly — there
    is nothing on disk that can say WHICH rows died.

    This is what lifts read_delta_changes' adds-only limit: CDC
    consumers (replicate_delta_to_iceberg among them) get deletes and
    update pre/post images at O(changes) cost."""
    table = os.path.abspath(path)
    latest = _latest_version(table)
    if latest is None:
        raise FileNotFoundError(f"not a Delta table: {table}")
    end = latest if ending_version is None else ending_version
    if not 0 <= starting_version <= end <= latest:
        raise ValueError(
            f"bad version range [{starting_version}, {end}] for table "
            f"at version {latest}"
        )
    meta, _active, _txns = _snapshot_actions(table, end)
    logical, schema, part_cols, rename = _physical_read(
        meta, for_write=False
    )
    from pyspark.sql.types import StringType, StructField

    cdc_schema = StructType(
        list(schema.fields) + [StructField("_change_type", StringType(), False)]
    )
    out_cols = [f.name for f in logical.fields] + ["_change_type"]
    per_version: list[DataFrame] = []
    for v in range(starting_version, end + 1):
        p = _commit_path(table, v)
        if not os.path.exists(p):
            raise FileNotFoundError(
                f"commit {v} missing from {table} (log cleaned?): "
                "CDF read cannot skip versions"
            )
        adds, cdcs = [], []
        removed_data = dv_add = False
        with open(p) as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                action = json.loads(line)
                add = action.get("add")
                rm = action.get("remove")
                cdc = action.get("cdc")
                if cdc:
                    cdcs.append(
                        (
                            os.path.join(
                                table, urllib.parse.unquote(cdc["path"])
                            ),
                            cdc.get("partitionValues") or {},
                        )
                    )
                if rm and rm.get("dataChange", True):
                    removed_data = True
                if add and add.get("deletionVector"):
                    dv_add = True
                if add and add.get("dataChange", True):
                    adds.append(
                        (
                            os.path.join(
                                table, urllib.parse.unquote(add["path"])
                            ),
                            add.get("partitionValues") or {},
                        )
                    )
        if cdcs:
            scan = _scan_snapshot(
                spark,
                os.path.join(table, "_change_data"),
                cdc_schema,
                part_cols,
                cdcs,
            )
            if rename is not None:
                scan = scan.select(*rename, "_change_type")
            per_version.append(
                scan.select(*out_cols).withColumn(
                    "_commit_version", F.lit(v).cast("bigint")
                )
            )
            continue
        if removed_data or dv_add:
            raise NotImplementedError(
                f"commit {v} changes rows without change-data files "
                "(mutation from before enable_cdf_delta): the CDF read "
                "cannot reconstruct which rows changed; read full "
                "snapshots instead"
            )
        if adds:
            scan = _scan_snapshot(spark, table, schema, part_cols, adds)
            if rename is not None:
                scan = scan.select(*rename)
            per_version.append(
                scan.withColumn("_change_type", F.lit("insert"))
                .select(*out_cols)
                .withColumn("_commit_version", F.lit(v).cast("bigint"))
            )
    if not per_version:
        return (
            spark.createDataFrame([], logical)
            .withColumn("_change_type", F.lit(None).cast("string"))
            .withColumn("_commit_version", F.lit(None).cast("bigint"))
        )
    out = per_version[0]
    for df in per_version[1:]:
        out = out.unionByName(df)
    return out


def last_txn_version(path: str, app_id: str) -> int | None:
    """The highest `txn` version this app has committed to the table
    (None for a fresh table or unseen app) — the streaming sink's
    replay detector."""
    table = os.path.abspath(path)
    if not os.path.isdir(os.path.join(table, _LOG_DIR)):
        return None
    _meta, _active, txns = _snapshot_actions(table)
    return txns.get(app_id)


def streaming_delta_sink(
    path: str,
    app_id: str,
    partition_by: Sequence[str] | None = None,
    checkpoint_every: int | None = None,
):
    """`foreachBatch` body for an exactly-once streaming Delta sink:
    one Delta commit per micro-batch, stamped with the protocol's
    `txn` action. On failure/restart Structured Streaming REPLAYS the
    last unacknowledged batch; the sink compares the incoming batch id
    against the app's logged high-water mark and skips already-
    committed batches — the same idempotence contract the hosted
    connector's streaming sink implements, expressed over the public
    log format.

    Usage:
        q = (df.writeStream.foreachBatch(
                 streaming_delta_sink(table, app_id="curation-v1"))
             .option("checkpointLocation", ckpt).start())
    """

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        last = last_txn_version(path, app_id)
        if last is not None and batch_id <= last:
            return  # replayed batch: its commit is already in the log
        write_delta(
            batch_df,
            path,
            mode="append",
            partition_by=partition_by,
            txn=(app_id, batch_id),
        )
        # `checkpoint_every` bounds the per-batch replay cost for a
        # long-running stream: without it the sink's idempotence check
        # replays O(commits) JSON per batch — O(commits^2) over the
        # stream's life; a checkpoint every K batches caps it at O(K).
        if checkpoint_every and (batch_id + 1) % checkpoint_every == 0:
            checkpoint_delta(path)

    return sink


def merge_delta(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    keys: Sequence[str],
    when_matched: str = "update",
    when_not_matched: str = "insert",
) -> None:
    """MERGE INTO for Delta tables — io.merge_table's semantics
    (update/delete/ignore × insert/ignore per merge key) landed as ONE
    overwrite commit. Simpler AND safer than the parquet-dir variant:
    no marker/swap protocol is needed because the data files the merge
    reads are never physically touched — the staged rewrite publishes
    atomically as a log rename, concurrent readers keep resolving the
    old snapshot until the commit lands, and the pre-merge state stays
    reachable via time travel.

    Shape at scale: one shuffle (the key join) + a copy-on-write
    rewrite, same as merge_table; for high-frequency small upserts
    prefer append + latest-wins resolution (ECS store pattern)."""
    merged = resolve_merge(
        read_delta(spark, path), updates, keys, when_matched, when_not_matched
    )
    write_delta(merged, path, mode="overwrite")


def resolve_merge(
    target: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    when_matched: str = "update",
    when_not_matched: str = "insert",
    check_duplicate_keys: bool = True,
) -> DataFrame:
    """The format-neutral MERGE resolution (update/delete/ignore ×
    insert/ignore per key) — shared by merge_delta, merge_iceberg,
    and usable on any pair of frames. One shuffle (the key join).

    Like SQL MERGE INTO, duplicate merge keys in `updates` are an
    error (two update copies would otherwise BOTH land in the table):
    an aggregation over the source asserts key uniqueness up front.
    Source frames are the small side of a merge, so the extra pass is
    metadata-cheap; disable via `check_duplicate_keys=False` only
    when the caller has already deduplicated (then the last-write
    winner among duplicates is UNDEFINED, per partition order)."""
    if when_matched not in ("update", "delete", "ignore"):
        raise ValueError(
            f"when_matched must be update/delete/ignore, got {when_matched!r}"
        )
    if when_not_matched not in ("insert", "ignore"):
        raise ValueError(
            f"when_not_matched must be insert/ignore, got {when_not_matched!r}"
        )
    keys = list(keys)
    if check_duplicate_keys:
        dup = (
            updates.groupBy(*keys)
            .count()
            .filter(F.col("count") > 1)
            .limit(1)
            .collect()
        )
        if dup:
            key_vals = {k: dup[0][k] for k in keys}
            raise ValueError(
                "MERGE source contains duplicate merge keys (e.g. "
                f"{key_vals}): like SQL MERGE INTO, multiple source "
                "matches per target row are refused. Deduplicate the "
                "source or pass check_duplicate_keys=False."
            )
    if when_matched == "ignore":
        kept = target
    else:  # update/delete both drop matched target rows here
        kept = target.join(updates.select(*keys), keys, "left_anti")
    parts = [kept]
    if when_matched == "update":
        matched = updates.join(target.select(*keys), keys, "left_semi")
        parts.append(matched.select(*target.columns))
    if when_not_matched == "insert":
        fresh = updates.join(target.select(*keys), keys, "left_anti")
        parts.append(fresh.select(*target.columns))
    merged = parts[0]
    for p in parts[1:]:
        merged = merged.unionByName(p)
    return merged


def delete_where_delta(spark: SparkSession, path: str, condition) -> dict:
    """Row-level `DELETE FROM <table> WHERE condition` as DELETION
    VECTORS — no data file is rewritten (the copy-on-write alternative
    is `merge_delta(when_matched='delete')`). Matching row POSITIONS
    are found by scanning the active files with `_metadata.row_index`,
    merged with each file's existing vector, and committed as
    remove+re-add actions whose adds carry spec-compliant storageType
    "u" descriptors (sources/dv.py); a file whose every row is deleted
    is tombstoned outright. First DV on a table upgrades the protocol
    to the table-features form (readerVersion 3 / writerVersion 7,
    deletionVectors in both feature lists) in the same commit.

    Returns {'rows_deleted', 'files_updated', 'files_removed'}.

    Shape at scale: the position scan is a predicate-pushdown read of
    the active files; only the MATCHED (file, position) pairs come
    back to the driver — O(rows this statement deletes), the same
    driver-side bitmap materialization delta-spark's DV writer does —
    and each file's bitmap write is O(its deletes). Already-deleted
    rows never re-match (the scan applies existing vectors), so the
    returned count is exact and repeated deletes are no-ops."""
    return _mask_rows_commit(spark, path, condition, None)


def update_where_delta(
    spark: SparkSession, path: str, condition, set_exprs: dict[str, str]
) -> dict:
    """Row-level `UPDATE <table> SET col = expr, ... WHERE condition`
    the deletion-vector way (delta-spark's modern UPDATE shape): the
    matched rows' positions tombstone IN PLACE via DVs — no data file
    rewritten — while their updated versions land as freshly staged
    data files, all in ONE commit, so a reader sees either the old
    rows or the new, never both and never neither. `set_exprs` maps
    column name -> SQL expression evaluated over the matched rows
    (e.g. {"score": "score * 2", "tag": "'hot'"}); each result is
    cast back to the column's logged type, unknown columns refuse.
    An update moving a row across a partition value is fine — the
    replacement stages under its new partition directory.

    Returns {'rows_updated', 'files_updated', 'files_removed',
    'files_added'}.

    Same scale shape as delete_where_delta plus one write of
    O(matched rows) — copy-on-write rewrites of whole files are what
    this avoids."""
    return _mask_rows_commit(spark, path, condition, set_exprs)


def delete_by_key_delta(spark: SparkSession, path: str, keys: DataFrame) -> dict:
    """Row-level delete by VALUE, Delta face: `keys` is a DataFrame
    whose columns name the match columns; every live row equal to
    some key row on ALL of them tombstones via deletion vectors —
    the CDC-apply shape (the Iceberg twin is delete_by_key_iceberg).
    Unlike the Iceberg equality-delete form, Delta deletes are
    POSITIONAL, so this face pays one key-semi-join position scan of
    the table per batch (inherent to the format: there is nothing on
    disk that can defer a value match to read time); the commit
    itself stays O(matched rows).

    Returns {'rows_deleted', 'files_updated', 'files_removed'}."""
    return _mask_rows_commit(spark, path, None, None, keys=keys)


def upsert_by_key_delta(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    keys: Sequence[str],
    txn: tuple[str, int] | None = None,
) -> dict:
    """CDC upsert, Delta face: ONE commit tombstones every live row
    matching an update key (deletion vectors, no rewrite) AND stages
    the update rows as new data files — a reader sees the old rows or
    the new, never both. Rows with fresh keys simply insert (no mask
    match). `txn` stamps the protocol's transaction identifier into
    the same commit — the exactly-once hook replication/streaming
    consumers use. Under the Change Data Feed the masked rows land as
    'delete' and the staged rows as 'insert' change files (the net-
    changes form a key-batch apply can state honestly — it has no
    per-row pre/post pairing).

    Returns {'rows_deleted', 'files_updated', 'files_removed',
    'files_added'}."""
    missing = [k for k in keys if k not in updates.columns]
    if missing:
        raise ValueError(
            f"upsert keys {missing} absent from the updates frame "
            f"(has {updates.columns})"
        )
    return _mask_rows_commit(
        spark,
        path,
        None,
        None,
        keys=updates.select(*keys),
        inserts=updates,
        txn=txn,
    )


def apply_cdc_delta(
    spark: SparkSession,
    path: str,
    deletes: DataFrame,
    upserts: DataFrame,
    keys: Sequence[str],
    txn: tuple[str, int] | None = None,
) -> dict:
    """Apply one CDC batch — deletes AND upserts — as ONE Delta
    commit: the Delta face of apply_cdc_iceberg. Every live row
    matching a key in `deletes` (a key-only frame) OR an upsert key
    tombstones via deletion vectors, the upsert rows stage as new
    data files, and `txn` stamps the protocol's transaction
    identifier — all in the same commit, so a reader sees the batch
    fully applied or not at all, and a replication consumer gets the
    exactly-once handshake (there is no window where rows are applied
    but the mark is not). On a table that does not exist yet the
    deletes are a no-op and the upserts bootstrap it as a plain
    create-append carrying the same `txn`.

    Returns the upsert engine's counts ({'rows_deleted',
    'files_updated', 'files_removed', 'files_added'}); bootstrap
    returns {'rows_inserted'}."""
    missing = [k for k in keys if k not in upserts.columns]
    missing_d = [k for k in keys if k not in deletes.columns]
    if missing or missing_d:
        raise ValueError(
            f"CDC keys {missing or missing_d} absent from the "
            f"{'upserts' if missing else 'deletes'} frame"
        )
    table = os.path.abspath(path)
    if _latest_version(table) is None:
        write_delta(upserts, table, txn=txn)
        return {"rows_inserted": read_delta(spark, table).count()}
    mask_keys = (
        upserts.select(*keys).unionByName(deletes.select(*keys)).dropDuplicates()
    )
    return _mask_rows_commit(
        spark, table, None, None, keys=mask_keys, inserts=upserts, txn=txn
    )


#: matched-position budget the DRIVER will materialize during a
#: row-level DELETE/UPDATE commit. At or below it (the KB-scale
#: CDC-apply faces) positions collect and bitmaps build driver-side;
#: above it the bitmaps build executor-side and the driver handles
#: one descriptor row per masked FILE. 200k positions ≈ a few MB of
#: Row objects — well under driver memory, well above any sane
#: key-batch.
DV_DRIVER_COLLECT_MAX = 200_000

#: already-deleted positions at or below this TOTAL cardinality (sum
#: of descriptor `cardinality` fields — no deserialization needed to
#: decide) broadcast to the resurrection-guard anti-join; larger dead
#: sets filter executor-side against the raw roaring blobs.
DV_DEAD_BROADCAST_MAX = 1_000_000

#: "driver" or "executor" — which position path the last
#: _mask_rows_commit took (stress-test instrumentation).
_LAST_MASK_PATH: str | None = None


def _drop_dead_positions(
    spark: SparkSession,
    table: str,
    matched: DataFrame,
    existing_desc: dict[str, dict],
    existing_positions,
) -> DataFrame:
    """Resurrection guard: rows a previous commit already tombstoned
    must not match a new DELETE/UPDATE (staging a dead row as a live
    replacement resurrects it — the r11 bug class). Small dead sets
    broadcast to a JVM anti-join; large ones are filtered
    executor-side against the raw roaring blobs, so the driver holds
    O(masked files) blobs, never a position set."""
    total = sum(
        int(d.get("cardinality") or 0) for d in existing_desc.values()
    )
    if total <= DV_DEAD_BROADCAST_MAX:
        dead = spark.createDataFrame(
            [
                (f, int(i))
                for f in existing_desc
                for i in existing_positions(f)
            ],
            "__dv_file string, __dv_ridx bigint",
        )
        return matched.join(
            F.broadcast(dead), ["__dv_file", "__dv_ridx"], "left_anti"
        )
    blobs = spark.sparkContext.broadcast(
        {f: _dv.descriptor_bitmap(table, d) for f, d in existing_desc.items()}
    )
    schema = matched.schema

    def drop_dead(batches):
        import numpy as np

        cache: dict[str, object] = {}
        for pdf in batches:
            if len(pdf) == 0:
                yield pdf
                continue
            keep = np.ones(len(pdf), dtype=bool)
            ridx = pdf["__dv_ridx"].to_numpy()
            for f, idx in pdf.groupby("__dv_file").indices.items():
                blob = blobs.value.get(f)
                if blob is None:
                    continue
                if f not in cache:
                    cache[f] = np.asarray(
                        _dv.roaring64_deserialize(blob), dtype="int64"
                    )
                keep[idx] = ~np.isin(ridx[idx], cache[f])
            yield pdf[keep]

    return matched.mapInPandas(drop_dead, schema)


def _mask_bitmaps_executor(
    spark: SparkSession,
    table: str,
    pos: DataFrame,
    existing_desc: dict[str, dict],
) -> list[tuple[str, dict | None, int, int]]:
    """Per-file deletion bitmaps for a WIDE mask, built executor-side:
    one applyInPandas group per data file unions the file's fresh
    positions with its existing blob, writes the DV file from the
    worker, and emits a single descriptor row — the driver collects
    O(masked files) rows, never O(matched rows). Returns the same
    (file, descriptor|None, fresh, total) tuples the driver path
    produces."""
    blobs = spark.sparkContext.broadcast(
        {f: _dv.descriptor_bitmap(table, d) for f, d in existing_desc.items()}
    )
    out_schema = (
        "file string, path_or_inline string, offset int, "
        "size_in_bytes int, cardinality bigint, fresh bigint, "
        "full_file boolean"
    )
    cols = [
        "file",
        "path_or_inline",
        "offset",
        "size_in_bytes",
        "cardinality",
        "fresh",
        "full_file",
    ]

    def build(pdf):
        import numpy as np
        import pandas as pd
        import pyarrow.parquet as papq

        f = pdf["__dv_file"].iat[0]
        fresh = np.unique(pdf["__dv_ridx"].to_numpy(dtype="int64"))
        blob = blobs.value.get(f)
        if blob is not None:
            ex = np.asarray(_dv.roaring64_deserialize(blob), dtype="int64")
            fresh = fresh[~np.isin(fresh, ex)]
            all_deleted = np.union1d(fresh, ex)
        else:
            all_deleted = fresh
        if fresh.size == 0:
            return pd.DataFrame({c: [] for c in cols})
        if all_deleted.size >= papq.ParquetFile(f).metadata.num_rows:
            row = [f, None, None, None, int(all_deleted.size), int(fresh.size), True]
        else:
            desc = _dv.write_descriptor(table, all_deleted.tolist())
            row = [
                f,
                desc["pathOrInlineDv"],
                desc["offset"],
                desc["sizeInBytes"],
                desc["cardinality"],
                int(fresh.size),
                False,
            ]
        return pd.DataFrame([row], columns=cols)

    results: list[tuple[str, dict | None, int, int]] = []
    for r in pos.groupBy("__dv_file").applyInPandas(build, out_schema).collect():
        desc = None
        if not r["full_file"]:
            desc = {
                "storageType": "u",
                "pathOrInlineDv": r["path_or_inline"],
                "offset": int(r["offset"]),
                "sizeInBytes": int(r["size_in_bytes"]),
                "cardinality": int(r["cardinality"]),
            }
        results.append(
            (r["file"], desc, int(r["fresh"]), int(r["cardinality"]))
        )
    return results


def _mask_rows_commit(
    spark: SparkSession,
    path: str,
    condition,
    set_exprs: dict[str, str] | None,
    keys: DataFrame | None = None,
    inserts: DataFrame | None = None,
    txn: tuple[str, int] | None = None,
) -> dict:
    """Shared DELETE/UPDATE/CDC-apply engine: mask the matched
    positions with deletion vectors and, for UPDATE (`set_exprs`) or
    a key-batch upsert (`inserts`), stage the replacement rows as new
    adds in the same commit. Matching is either a predicate
    (`condition`) or a key-frame semi-join (`keys`).

    Scale shape: a probe caps what the driver will materialize at
    DV_DRIVER_COLLECT_MAX matched positions — at or below it (the
    KB-scale CDC faces) the positions collect and the bitmaps build
    driver-side exactly as before; above it (a wide DELETE/UPDATE
    WHERE) the per-file bitmaps build EXECUTOR-side
    (_mask_bitmaps_executor) and the driver handles one descriptor
    row per masked file, never the position set."""
    import pyarrow.parquet as pq

    table = os.path.abspath(path)
    version = _latest_version(table)
    if version is None:
        raise FileNotFoundError(f"not a Delta table: {table}")
    meta, active, _txns, protocol = _snapshot_actions(
        table, return_protocol=True
    )
    logical, schema, part_cols, rename = _physical_read(meta)
    cm_mode, _logical2, _phys2, l2p = _mapping_info(meta)
    rows_key = "rows_deleted" if set_exprs is None else "rows_updated"
    out = {rows_key: 0, "files_updated": 0, "files_removed": 0}
    if set_exprs is not None:
        out["files_added"] = 0
        unknown = set(set_exprs) - set(logical.fieldNames())
        if unknown:
            raise ValueError(
                f"UPDATE sets unknown column(s) {sorted(unknown)}; table "
                f"has {logical.fieldNames()}"
            )
    if keys is not None:
        key_cols = list(keys.columns)
        bad = [c for c in key_cols if c not in logical.fieldNames()]
        if not key_cols or bad:
            raise ValueError(
                f"key columns {bad or '[]'} not in table schema "
                f"{logical.fieldNames()}"
            )
        keys = keys.select(
            *[
                F.col(c).cast(logical[c].dataType).alias(c)
                for c in key_cols
            ]
        ).dropDuplicates()
    if inserts is not None:
        out["files_added"] = 0
        extra = set(inserts.columns) - set(logical.fieldNames())
        if extra:
            raise ValueError(
                f"upsert frame has column(s) {sorted(extra)} absent "
                f"from the table schema {logical.fieldNames()}"
            )
        inserts = inserts.select(
            *[
                F.col(f.name).cast(f.dataType).alias(f.name)
                if f.name in inserts.columns
                else F.lit(None).cast(f.dataType).alias(f.name)
                for f in logical.fields
            ]
        )
    if not active and inserts is None:
        return out

    adds_by_abs: dict[str, tuple[str, dict]] = {}
    entries: list[tuple[str, dict]] = []
    existing_desc: dict[str, dict] = {}  # abs path -> DV descriptor
    matched = None
    for rel, add in active.items():
        p = os.path.abspath(os.path.join(table, urllib.parse.unquote(rel)))
        adds_by_abs[p] = (rel, add)
        entries.append((p, add.get("partitionValues") or {}))
        if add.get("deletionVector"):
            existing_desc[p] = add["deletionVector"]
    existing_cache: dict[str, set[int]] = {}

    def _existing_positions(f: str) -> set[int]:
        """Deserialized dead positions for one file — loaded on
        demand, only for files something actually touches."""
        if f not in existing_cache:
            existing_cache[f] = set(
                _dv.read_descriptor(table, existing_desc[f])
            )
        return existing_cache[f]

    if not entries:
        scan = None  # empty table: an upsert batch is pure inserts
    else:
        scan = _scan_snapshot(
            spark, table, schema, part_cols, entries, keep_meta=True
        )
    if scan is not None and rename is not None:
        # logical view for the predicate; the meta columns ride along
        scan = scan.select(*rename, "__dv_file", "__dv_ridx")
    if scan is not None:
        if keys is not None:
            matched = scan.join(
                F.broadcast(keys), list(keys.columns), "left_semi"
            )
        else:
            matched = scan.filter(condition)
        if existing_desc:
            # the raw file scan still CONTAINS previously-deleted
            # rows; they must not match — an UPDATE whose predicate
            # hits a dead row would otherwise stage it as a live
            # replacement (resurrection). Applied AFTER the match so
            # the guard sees only matched rows.
            matched = _drop_dead_positions(
                spark, table, matched, existing_desc, _existing_positions
            )
    # --- per-file deletion bitmaps: driver path under the cap,
    # executor path above it ----------------------------------------
    global _LAST_MASK_PATH
    _LAST_MASK_PATH = None
    mask_results: list[tuple[str, dict | None, int, int]] = []
    #   (abs file, DV descriptor or None when the file lost every
    #    row, freshly-masked count, total masked cardinality)
    if matched is not None:
        pos = matched.select("__dv_file", "__dv_ridx")
        probe = pos.limit(DV_DRIVER_COLLECT_MAX + 1).collect()
        if len(probe) <= DV_DRIVER_COLLECT_MAX:
            _LAST_MASK_PATH = "driver"
            by_file: dict[str, set[int]] = {}
            for r in probe:
                by_file.setdefault(r["__dv_file"], set()).add(
                    int(r["__dv_ridx"])
                )
            for f, fresh in sorted(by_file.items()):
                ex = (
                    _existing_positions(f) if f in existing_desc else set()
                )
                fresh -= ex  # dead-guard leftovers: moot, idempotent
                if not fresh:
                    continue
                all_deleted = sorted(ex | fresh)
                if len(all_deleted) >= pq.ParquetFile(f).metadata.num_rows:
                    mask_results.append(
                        (f, None, len(fresh), len(all_deleted))
                    )
                else:
                    mask_results.append(
                        (
                            f,
                            _dv.write_descriptor(table, all_deleted),
                            len(fresh),
                            len(all_deleted),
                        )
                    )
        else:
            _LAST_MASK_PATH = "executor"
            mask_results = _mask_bitmaps_executor(
                spark, table, pos, existing_desc
            )
    if not mask_results and inserts is None:
        return out

    staged: list[dict] = []
    if set_exprs is not None:
        updated = matched
        for col, expr in set_exprs.items():
            updated = updated.withColumn(
                col, F.expr(expr).cast(logical[col].dataType)
            )
        staged = _stage_data_files(
            updated.select(*_physical_select(logical, l2p, cm_mode)),
            table,
            part_cols,
        )
    elif inserts is not None:
        staged = _stage_data_files(
            inserts.select(*_physical_select(logical, l2p, cm_mode)),
            table,
            part_cols,
        )

    # Change Data Feed (protocol "Add CDC File"): when the table
    # property is on, every row this statement touches lands in
    # _change_data/ parquet carrying _change_type — DELETE writes the
    # removed rows as 'delete'; UPDATE writes 'update_preimage' +
    # 'update_postimage'. CDF readers consume these instead of
    # reverse-engineering the DV diff; the files are dataChange=false
    # (snapshot readers never see them).
    cdc_actions: list[dict] = []
    if (
        str((meta.get("configuration") or {}).get(
            "delta.enableChangeDataFeed", ""
        )).lower()
        == "true"
    ):
        changes = None
        if matched is not None and mask_results:
            changes = matched.select(
                *[F.col(f.name) for f in logical.fields]
            ).withColumn(
                "_change_type",
                F.lit(
                    "delete" if set_exprs is None else "update_preimage"
                ),
            )
        if set_exprs is not None:
            changes = changes.unionByName(
                updated.select(
                    *[F.col(f.name) for f in logical.fields]
                ).withColumn("_change_type", F.lit("update_postimage"))
            )
        elif inserts is not None:
            # key-batch apply: the net-changes form (deletes +
            # inserts; there is no per-row pre/post pairing to state)
            ins = inserts.select(
                *[F.col(f.name) for f in logical.fields]
            ).withColumn("_change_type", F.lit("insert"))
            changes = ins if changes is None else changes.unionByName(ins)
        changes = changes.select(
            *_physical_select(logical, l2p, cm_mode),
            "_change_type",
        )
        for f in _stage_data_files(
            changes, os.path.join(table, "_change_data"), part_cols
        ):
            cdc_actions.append(
                {
                    "cdc": {
                        "path": "_change_data/"
                        + urllib.parse.quote(f["rel_path"], safe="/="),
                        "partitionValues": {
                            c: f["partition_values"].get(c)
                            for c in part_cols
                        },
                        "size": f["size"],
                        "dataChange": False,
                    }
                }
            )

    actions: list[dict] = cdc_actions
    feats = set((protocol or {}).get("readerFeatures") or [])
    if mask_results and (
        protocol is None
        or int(protocol.get("minReaderVersion", 1)) < 3
        or "deletionVectors" not in feats
    ):
        actions.append(
            {
                "protocol": _table_features_protocol(
                    protocol,
                    meta,
                    extra_reader=("deletionVectors",),
                    extra_writer=("deletionVectors",),
                )
            }
        )
    for f, desc, fresh_n, _total in sorted(mask_results):
        rel, add = adds_by_abs[f]
        out[rows_key] += fresh_n
        actions.append({"remove": {"path": rel, "dataChange": True}})
        if desc is None:  # the file lost every row
            out["files_removed"] += 1
            continue
        new_add = dict(add)
        new_add["deletionVector"] = desc
        new_add["dataChange"] = True
        actions.append({"add": new_add})
        out["files_updated"] += 1
    for f in staged:
        actions.append(
            {
                "add": {
                    "path": urllib.parse.quote(f["rel_path"], safe="/="),
                    "partitionValues": {
                        c: f["partition_values"].get(c) for c in part_cols
                    },
                    "size": f["size"],
                    "modificationTime": f["mtime_ms"],
                    "dataChange": True,
                    "stats": _file_stats_json(
                        os.path.join(table, f["rel_path"]), part_cols
                    ),
                }
            }
        )
        out["files_added"] += 1
    if txn is not None:
        actions.append({"txn": {"appId": txn[0], "version": int(txn[1])}})
    _publish_commit(table, version + 1, actions)
    return out


# ---------------------------------------------------------------- maintenance


def checkpoint_delta(path: str, v2: bool = False, sidecars: int = 0) -> int:
    """Write a parquet checkpoint of the CURRENT snapshot plus the
    `_last_checkpoint` marker, returning the checkpointed version.
    Afterwards snapshot resolution replays O(commits since this
    checkpoint) instead of the whole history — the maintenance step
    that keeps a long-lived table's metadata cost flat. The checkpoint
    retains protocol, metaData, every active add, AND the txn
    high-water marks (dropping txns would break the streaming sink's
    idempotence after log cleanup).

    `v2=True` writes the spec's V2 form current Delta writers emit
    (PROTOCOL.md "V2 Checkpoints"): a UUID-named top-level file
    leading with a `checkpointMetadata` action, with the file actions
    either inline or — `sidecars=N` — split across N parquet SIDECAR
    files under _delta_log/_sidecars/ referenced by `sidecar`
    actions. V2 checkpoints require the `v2Checkpoint` reader table
    feature, so a table whose protocol lacks it first gets ONE
    protocol-upgrade commit through the legacy-feature-carrying
    upgrade helper (the same rule the DV writer follows); the
    checkpoint then covers that commit.

    Driver-side pyarrow write under the spec's explicit checkpoint
    schema (partitionValues/configuration/options/tags as
    map<string,string>, not inferred structs), so spec-compliant
    Delta readers can consume the checkpoint. Checkpoint size is
    O(active files), metadata-scale. Single-writer contract as for
    commits."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    if sidecars and not v2:
        raise ValueError("sidecar files are a V2-checkpoint form")
    table = os.path.abspath(path)
    version = _latest_version(table)
    if version is None:
        raise FileNotFoundError(f"not a Delta table: {table}")
    meta, active, txns, protocol = _snapshot_actions(
        table, return_protocol=True
    )
    if v2 and "v2Checkpoint" not in set(
        (protocol or {}).get("readerFeatures") or []
    ):
        version += 1
        protocol = _table_features_protocol(
            protocol,
            meta,
            extra_reader=("v2Checkpoint",),
            extra_writer=("v2Checkpoint",),
        )
        _publish_commit(table, version, [{"protocol": protocol}])

    str_map = pa.map_(pa.string(), pa.string())
    cp_schema = pa.schema(
        [
            (
                "protocol",
                pa.struct(
                    [
                        ("minReaderVersion", pa.int32()),
                        ("minWriterVersion", pa.int32()),
                        ("readerFeatures", pa.list_(pa.string())),
                        ("writerFeatures", pa.list_(pa.string())),
                    ]
                ),
            ),
            (
                "metaData",
                pa.struct(
                    [
                        ("id", pa.string()),
                        ("name", pa.string()),
                        ("description", pa.string()),
                        (
                            "format",
                            pa.struct(
                                [
                                    ("provider", pa.string()),
                                    ("options", str_map),
                                ]
                            ),
                        ),
                        ("schemaString", pa.string()),
                        ("partitionColumns", pa.list_(pa.string())),
                        ("configuration", str_map),
                        ("createdTime", pa.int64()),
                    ]
                ),
            ),
            (
                "txn",
                pa.struct(
                    [("appId", pa.string()), ("version", pa.int64())]
                ),
            ),
            (
                "add",
                pa.struct(
                    [
                        ("path", pa.string()),
                        ("partitionValues", str_map),
                        ("size", pa.int64()),
                        ("modificationTime", pa.int64()),
                        ("dataChange", pa.bool_()),
                        ("stats", pa.string()),
                        ("tags", str_map),
                        (
                            "deletionVector",
                            pa.struct(
                                [
                                    ("storageType", pa.string()),
                                    ("pathOrInlineDv", pa.string()),
                                    ("offset", pa.int32()),
                                    ("sizeInBytes", pa.int32()),
                                    ("cardinality", pa.int64()),
                                ]
                            ),
                        ),
                    ]
                ),
            ),
        ]
    )

    def shape(action: dict, field: pa.StructType) -> dict:
        """Project an action onto the checkpoint struct's fields,
        recursing into nested structs (drops writer-specific extras;
        absent fields become null — both directions keep
        foreign-written logs checkpointable)."""
        out = {}
        for f in field:
            v = action.get(f.name)
            if isinstance(v, dict) and pa.types.is_struct(f.type):
                v = shape(v, f.type)
            out[f.name] = v
        return out

    rows: list[dict] = [
        {
            # the CURRENT protocol, not a hardcoded floor: a DV table
            # checkpointed at (1,2) would let a feature-unaware reader
            # resurrect deleted rows from the checkpoint alone
            "protocol": shape(
                protocol or {"minReaderVersion": 1, "minWriterVersion": 2},
                cp_schema.field("protocol").type,
            )
        },
        {"metaData": shape(meta, cp_schema.field("metaData").type)},
    ]
    rows += [
        {"txn": {"appId": app, "version": int(v)}} for app, v in txns.items()
    ]
    add_t = cp_schema.field("add").type
    add_rows = [{"add": shape(add, add_t)} for add in active.values()]

    if not v2:
        rows += add_rows
        keys = ("protocol", "metaData", "txn", "add")
        cp = os.path.join(
            table, _LOG_DIR, f"{version:020d}.checkpoint.parquet"
        )
        tmp = cp + f".tmp-{uuid.uuid4().hex}"
        pq.write_table(
            pa.Table.from_pylist(
                [{k: r.get(k) for k in keys} for r in rows], schema=cp_schema
            ),
            tmp,
        )
        os.rename(tmp, cp)
    else:
        str_map2 = pa.map_(pa.string(), pa.string())
        v2_schema = pa.schema(
            list(cp_schema)
            + [
                (
                    "checkpointMetadata",
                    pa.struct(
                        [("version", pa.int64()), ("tags", str_map2)]
                    ),
                ),
                (
                    "sidecar",
                    pa.struct(
                        [
                            ("path", pa.string()),
                            ("sizeInBytes", pa.int64()),
                            ("modificationTime", pa.int64()),
                            ("tags", str_map2),
                        ]
                    ),
                ),
            ]
        )
        rows = [{"checkpointMetadata": {"version": version}}] + rows
        if sidecars:
            sdir = os.path.join(table, _LOG_DIR, "_sidecars")
            os.makedirs(sdir, exist_ok=True)
            sc_schema = pa.schema([cp_schema.field("add")])
            for i in range(sidecars):
                chunk = add_rows[i::sidecars]
                name = f"{uuid.uuid4().hex}.parquet"
                sp = os.path.join(sdir, name)
                tmp = sp + f".tmp-{uuid.uuid4().hex}"
                pq.write_table(
                    pa.Table.from_pylist(
                        [{"add": r["add"]} for r in chunk], schema=sc_schema
                    ),
                    tmp,
                )
                os.rename(tmp, sp)
                rows.append(
                    {
                        "sidecar": {
                            "path": name,
                            "sizeInBytes": os.path.getsize(sp),
                            "modificationTime": int(
                                os.path.getmtime(sp) * 1000
                            ),
                        }
                    }
                )
        else:
            rows += add_rows
        keys = tuple(f.name for f in v2_schema)
        cp = os.path.join(
            table,
            _LOG_DIR,
            f"{version:020d}.checkpoint.{uuid.uuid4().hex}.parquet",
        )
        tmp = cp + f".tmp-{uuid.uuid4().hex}"
        pq.write_table(
            pa.Table.from_pylist(
                [{k: r.get(k) for k in keys} for r in rows], schema=v2_schema
            ),
            tmp,
        )
        os.rename(tmp, cp)
    lc_tmp = os.path.join(table, _LOG_DIR, f".lc-tmp-{uuid.uuid4().hex}")
    with open(lc_tmp, "w") as fh:
        json.dump({"version": version, "size": len(rows)}, fh)
    os.rename(lc_tmp, os.path.join(table, _LOG_DIR, "_last_checkpoint"))
    return version


def vacuum_delta(
    path: str,
    clean_log: bool = False,
    spark: SparkSession | None = None,
    distributed: bool = False,
) -> dict:
    """Physically delete data files no active snapshot references
    (tombstoned by remove actions — overwrites, merges) and, with
    `clean_log=True`, drop the JSON commits a checkpoint already
    covers. Returns {'data_files': n, 'log_files': m} deleted.

    After a vacuum, time travel to versions whose files are gone
    fails LOUDLY (the reader's missing-commit / missing-file errors),
    never silently wrong — the protocol's own retention trade.
    `clean_log` requires a checkpoint (refused otherwise: deleting
    commits with no checkpoint would orphan the table).

    `distributed=True` (requires `spark`) runs the table walk in
    EXECUTORS via sources/maintenance.py — the Iceberg twin's shape:
    per-partition-dir listing tasks, a shuffle anti-join against the
    keep frame, executor-side deletes. _delta_log is excluded from
    the walk by name; the keep-set resolution (snapshot replay + CDF
    retention + live DV descriptors) stays driver-side O(log)."""
    from archetype_spark.sources import dv as _dv

    if distributed and spark is None:
        raise ValueError("distributed vacuum needs the SparkSession")
    table = os.path.abspath(path)
    _meta, active, _txns = _snapshot_actions(table)
    keep = {
        os.path.normpath(urllib.parse.unquote(p)) for p in active
    }
    # change-data files are referenced by cdc actions in the commit
    # JSONs, never by the active add set: keep every one a RETAINED
    # commit names (clean_log dropping old commits is what retires
    # them — the protocol's own CDF retention coupling)
    log_dir_path = os.path.join(table, _LOG_DIR)
    for name in os.listdir(log_dir_path):
        if not (name.endswith(".json") and name[:20].isdigit()):
            continue
        with open(os.path.join(log_dir_path, name)) as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                action = json.loads(line)
                if "cdc" in action:
                    keep.add(
                        os.path.normpath(
                            urllib.parse.unquote(action["cdc"]["path"])
                        )
                    )
    # deletion-vector files referenced by the ACTIVE adds stay; stale
    # ones (replaced by a later delete, or tombstoned with their file)
    # are unreferenced metadata and vacuum like data files
    keep_dv = set()
    for add in active.values():
        desc = add.get("deletionVector")
        if desc and desc.get("storageType") == "u":
            keep_dv.add(
                os.path.normpath(
                    os.path.relpath(
                        _dv.dv_path(table, desc["pathOrInlineDv"]), table
                    )
                )
            )
    deleted = {"data_files": 0, "log_files": 0}

    def _is_victim(name: str) -> bool:
        return name.endswith(".parquet") or (
            name.startswith("deletion_vector_") and name.endswith(".bin")
        )

    if distributed:
        from archetype_spark.sources.maintenance import distributed_reclaim

        # one abs keep frame: parquet paths and DV paths are disjoint
        # name classes, so the union makes the same decisions as the
        # driver walk's two-set check
        keep_abs = {
            os.path.normpath(os.path.join(table, p))
            for p in (keep | keep_dv)
        }
        deleted["data_files"] = distributed_reclaim(
            spark,
            table,
            keep_abs,
            (".parquet",),
            exclude_dirs=(_LOG_DIR,),
            name_ok=_is_victim,
        )
    else:
        for root, dirs, files in os.walk(table):
            dirs[:] = [
                d for d in dirs if d != _LOG_DIR and not d.startswith(".")
            ]
            for name in files:
                is_dv = name.startswith("deletion_vector_") and name.endswith(
                    ".bin"
                )
                if not name.endswith(".parquet") and not is_dv:
                    continue
                rel = os.path.normpath(
                    os.path.relpath(os.path.join(root, name), table)
                )
                if rel not in (keep_dv if is_dv else keep):
                    os.remove(os.path.join(root, name))
                    deleted["data_files"] += 1
    if clean_log:
        lc_path = os.path.join(table, _LOG_DIR, "_last_checkpoint")
        if not os.path.exists(lc_path):
            raise FileNotFoundError(
                f"clean_log requires a checkpoint (none at {table})"
            )
        with open(lc_path) as fh:
            cp_version = int(json.load(fh)["version"])
        log_dir = os.path.join(table, _LOG_DIR)
        for name in os.listdir(log_dir):
            if (
                name.endswith(".json")
                and name[:20].isdigit()
                and int(name[:20]) <= cp_version
            ):
                os.remove(os.path.join(log_dir, name))
                deleted["log_files"] += 1
    return deleted
