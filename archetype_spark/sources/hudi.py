"""Protocol-native Apache Hudi COPY-ON-WRITE tables — no hudi-spark
bundle, no JVM extensions: the timeline and file-layout conventions
from the public Hudi table format (hudi.apache.org "Table & Query
Types" + the storage layout docs, table version 6 — the pre-1.0
layout current fleets run) implemented over plain JSON + parquet,
the same design stance as sources/delta.py and sources/iceberg.py.

Layout written and read:

- `.hoodie/hoodie.properties` — table name/type/version and the
  record-key + partition-path fields (the upsert faces read them
  back, so a table is self-describing).
- `.hoodie/<instant>.commit` — COMPLETED commit metadata (JSON):
  `partitionToWriteStats` maps each partition path to one stat per
  written base file {fileId, path, numWrites, numUpdateWrites,
  numDeletes, prevCommit}. `<instant>.commit.requested` and
  `<instant>.inflight` mark the transition states like the real
  writer. Instants are 17-digit millisecond timestamps, strictly
  monotonic per table.
- data files: `<partitionpath>/<fileId>_<writeToken>_<instant>.parquet`
  — a FILE GROUP is all base files sharing a fileId; copy-on-write
  UPDATE/DELETE rewrites a group as a new base file at the new
  instant (a new FILE SLICE) and never touches the old one.
- every row carries the five Hudi meta columns
  (`_hoodie_commit_time`, `_hoodie_commit_seqno`,
  `_hoodie_record_key`, `_hoodie_partition_path`,
  `_hoodie_file_name`), stamped executor-side at write.

Snapshot resolution is TIMELINE-ONLY, never a directory listing: the
completed commits' write stats name every base file, so the reader
picks the newest slice per file group from O(timeline JSON) and
uncommitted/crashed writes (data files whose instant never completed)
are invisible by construction — the same O(metadata) planning shape
as the Delta log replay and the Iceberg manifest walk. Time travel =
truncating the completed-instant list at `as_of`.

Scale shape: writes stage through Spark's parquet writer partitioned
by file group (one shuffle on the record key), the driver handles
O(written files) renames + stats — never row data; upsert/delete
join the updates against ONLY the affected file groups' rows
(copy-on-write's inherent cost), with the group->file resolution at
O(timeline). Declared limits (loud, never silently wrong):
MERGE_ON_READ tables (log files need the HFile/avro readers), multi-
level partition paths, and replacecommit/clustering instants refuse
by name.

Reference parity: SURVEY.md §2.2 Sources row — the reference's
dependency surface reads lakehouse tables through its connector tier;
Delta + Iceberg + Hudi covers the three open table formats that tier
serves.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

_HOODIE = ".hoodie"
_META_COLS = (
    "_hoodie_commit_time",
    "_hoodie_commit_seqno",
    "_hoodie_record_key",
    "_hoodie_partition_path",
    "_hoodie_file_name",
)
_WRITE_TOKEN = "0-0-0"


# ------------------------------------------------------------------ timeline


def _hoodie_dir(path: str) -> str:
    return os.path.join(os.path.abspath(path), _HOODIE)


def _load_properties(path: str) -> dict[str, str]:
    pfile = os.path.join(_hoodie_dir(path), "hoodie.properties")
    if not os.path.isfile(pfile):
        raise FileNotFoundError(f"not a Hudi table (no hoodie.properties): {path}")
    props: dict[str, str] = {}
    with open(pfile) as fh:
        for line in fh:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            k, _, v = line.partition("=")
            props[k] = v
    ttype = props.get("hoodie.table.type", "COPY_ON_WRITE")
    if ttype != "COPY_ON_WRITE":
        raise NotImplementedError(
            f"Hudi table type {ttype}: only COPY_ON_WRITE is implemented "
            "(MERGE_ON_READ log files need the avro/HFile log readers)"
        )
    return props


def hudi_timeline(path: str) -> list[str]:
    """COMPLETED commit instants, ascending — the timeline the
    snapshot reader resolves against. Replacecommit/clustering
    instants refuse loudly (their replaced-group semantics are not
    modeled); transition files (.requested/.inflight) are ignored."""
    hd = _hoodie_dir(path)
    if not os.path.isdir(hd):
        raise FileNotFoundError(f"not a Hudi table: {path}")
    out = []
    for name in os.listdir(hd):
        if name.endswith(".replacecommit"):
            raise NotImplementedError(
                f"Hudi replacecommit instant {name!r}: clustering/"
                "insert_overwrite resolution is not implemented"
            )
        if name.endswith(".commit"):
            out.append(name[: -len(".commit")])
    return sorted(out)


def _next_instant(path: str) -> str:
    """Strictly monotonic 17-digit millisecond instant."""
    hd = _hoodie_dir(path)
    prev = ""
    if os.path.isdir(hd):
        stamps = [
            n.split(".", 1)[0]
            for n in os.listdir(hd)
            if n[:1].isdigit()
        ]
        prev = max(stamps, default="")
    now = time.strftime("%Y%m%d%H%M%S") + f"{int(time.time()*1000)%1000:03d}"
    return now if now > prev else str(int(prev) + 1)


def _read_commit(path: str, instant: str) -> dict:
    with open(os.path.join(_hoodie_dir(path), f"{instant}.commit")) as fh:
        return json.load(fh)


def _publish_commit(path: str, instant: str, metadata: dict) -> None:
    """requested -> inflight -> completed, the completed file written
    atomically (tmp + rename) so a crash never leaves a readable
    half-commit."""
    hd = _hoodie_dir(path)
    os.makedirs(hd, exist_ok=True)
    for suffix in (".commit.requested", ".inflight"):
        with open(os.path.join(hd, f"{instant}{suffix}"), "w"):
            pass
    tmp = os.path.join(hd, f".{uuid.uuid4().hex}.tmp")
    with open(tmp, "w") as fh:
        json.dump(metadata, fh)
    os.rename(tmp, os.path.join(hd, f"{instant}.commit"))


def _file_slices(path: str, as_of: str | None = None) -> dict[str, dict]:
    """Latest base file per FILE GROUP from the completed timeline
    alone: {fileId: {path, partition, instant}}. A group whose latest
    rewrite carries no file (every row deleted writes an empty base
    file instead, see _write_commit) never reaches here without one."""
    slices: dict[str, dict] = {}
    for instant in hudi_timeline(path):
        if as_of is not None and instant > str(as_of):
            break
        meta = _read_commit(path, instant)
        for part, stats in (meta.get("partitionToWriteStats") or {}).items():
            for st in stats:
                slices[st["fileId"]] = {
                    "path": st["path"],
                    "partition": part,
                    "instant": instant,
                }
    return slices


# --------------------------------------------------------------------- write


def _stamp_meta(
    df: DataFrame, instant: str, record_key: str, fg_partitions: dict[str, str]
) -> DataFrame:
    """Add the five Hudi meta columns; `__hoodie_fg` must already
    name each row's file group (it becomes the file name). The
    partition path comes from the GROUP's physical partition, not the
    row's field value: an upsert that changes the partition field
    keeps the row in its original file group (global-index
    update.partition.path=false semantics), so the meta column must
    agree with where the file actually lives."""
    spark = df.sparkSession
    pp_map = spark.createDataFrame(
        list(fg_partitions.items()) or [("", "")],
        "__hoodie_fg string, __hoodie_pp string",
    )
    df = df.join(F.broadcast(pp_map), "__hoodie_fg", "left")
    part_path = F.coalesce(F.col("__hoodie_pp"), F.lit(""))
    seq = F.row_number().over(
        Window.partitionBy("__hoodie_fg").orderBy(
            F.col(record_key).cast("string")
        )
    )
    return (
        df.withColumn("_hoodie_commit_time", F.lit(instant))
        .withColumn(
            "_hoodie_commit_seqno",
            F.concat_ws("_", F.lit(instant), F.lit("0"), seq.cast("string")),
        )
        .withColumn("_hoodie_record_key", F.col(record_key).cast("string"))
        .withColumn("_hoodie_partition_path", part_path)
        .withColumn(
            "_hoodie_file_name",
            F.concat(
                F.concat_ws(
                    "_",
                    F.col("__hoodie_fg"),
                    F.lit(_WRITE_TOKEN),
                    F.lit(instant),
                ),
                F.lit(".parquet"),
            ),
        )
        .drop("__hoodie_pp")
    )


def _write_commit(
    df: DataFrame,
    path: str,
    instant: str,
    record_key: str,
    fg_partitions: dict[str, str],
    rewritten: dict[str, dict] | None = None,
    op: str = "upsert",
    extra_metadata: dict[str, str] | None = None,
) -> dict:
    """Stage `df` (carrying __hoodie_fg) partitioned by file group,
    move each staged file to its spec name under its partition dir
    (`fg_partitions` maps fileId -> hive-style partition path, ''
    unpartitioned — partition COLUMNS stay in the data files, the
    Hudi default), and publish the commit. `rewritten` maps fileId ->
    its PRIOR slice for groups this commit rewrites; a rewritten
    group that produced no staged output (all rows deleted) gets an
    explicit EMPTY base file — the new slice must shadow the old."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    table = os.path.abspath(path)
    rewritten = rewritten or {}
    stamped = _stamp_meta(df, instant, record_key, fg_partitions)
    data_cols = [c for c in stamped.columns if c != "__hoodie_fg"]
    ordered = stamped.select(
        *_META_COLS,
        *[c for c in data_cols if c not in _META_COLS],
        "__hoodie_fg",
    )
    stage = os.path.join(table, f".stage-{uuid.uuid4().hex}")
    ordered.write.mode("overwrite").partitionBy("__hoodie_fg").parquet(stage)

    stats: dict[str, list[dict]] = {}
    seen: set[str] = set()
    for root, _dirs, files in os.walk(stage):
        parquets = [n for n in files if n.endswith(".parquet")]
        if not parquets:
            continue
        rel = os.path.relpath(root, stage).split(os.sep)
        fg = next(
            s.split("=", 1)[1] for s in rel if s.startswith("__hoodie_fg=")
        )
        part = fg_partitions.get(fg, "")
        if len(parquets) != 1:
            # one base file per file group per commit is the format's
            # invariant; Spark may split a group only if the caller
            # repartitioned incorrectly — refuse rather than mis-name
            raise RuntimeError(
                f"file group {fg} staged {len(parquets)} files; "
                "expected exactly one base file"
            )
        name = f"{fg}_{_WRITE_TOKEN}_{instant}.parquet"
        dst_dir = os.path.join(table, part) if part else table
        os.makedirs(dst_dir, exist_ok=True)
        src = os.path.join(root, parquets[0])
        dst = os.path.join(dst_dir, name)
        n_rows = pq.read_metadata(src).num_rows
        os.rename(src, dst)
        seen.add(fg)
        rel_path = f"{part}/{name}" if part else name
        prior = rewritten.get(fg)
        stats.setdefault(part, []).append(
            {
                "fileId": fg,
                "path": rel_path,
                "numWrites": n_rows,
                "numUpdateWrites": n_rows if prior else 0,
                "numDeletes": 0,
                "prevCommit": prior["instant"] if prior else "null",
            }
        )
    # rewritten groups whose every row died: write an EMPTY base file
    # with the prior slice's schema so the new slice shadows the old
    for fg, prior in rewritten.items():
        if fg in seen:
            continue
        schema = pq.read_schema(os.path.join(table, prior["path"]))
        part = prior["partition"]
        name = f"{fg}_{_WRITE_TOKEN}_{instant}.parquet"
        dst_dir = os.path.join(table, part) if part else table
        os.makedirs(dst_dir, exist_ok=True)
        pq.write_table(
            pa.Table.from_pylist([], schema=schema),
            os.path.join(dst_dir, name),
        )
        stats.setdefault(part, []).append(
            {
                "fileId": fg,
                "path": f"{part}/{name}" if part else name,
                "numWrites": 0,
                "numUpdateWrites": 0,
                "numDeletes": prior.get("numDeletes", 0),
                "prevCommit": prior["instant"],
            }
        )
    import shutil

    shutil.rmtree(stage, ignore_errors=True)
    meta: dict = {
        "partitionToWriteStats": stats,
        "operationType": op.upper(),
        "compacted": False,
    }
    if extra_metadata:
        meta["extraMetadata"] = dict(extra_metadata)
    _publish_commit(table, instant, meta)
    return {
        "instant": instant,
        "files_written": sum(len(v) for v in stats.values()),
    }


def _assign_new_groups(
    df: DataFrame, part_field: str | None, buckets: int
) -> tuple[DataFrame, dict[str, str]]:
    """Bucket fresh rows into NEW file groups: uuid fileIds assigned
    per (partition value, bucket) — the distinct pairs are
    O(partitions x buckets) driver-side metadata, broadcast back.
    Returns (frame with __hoodie_fg, {fileId: hive partition path})."""
    spark = df.sparkSession
    bucket = F.pmod(F.xxhash64(F.col("__hoodie_key")), F.lit(buckets))
    df = df.withColumn("__bucket", bucket)
    part_expr = (
        F.col(part_field).cast("string") if part_field else F.lit("")
    )
    df = df.withColumn("__pv", part_expr)
    pairs = [
        (r["__pv"], r["__bucket"])
        for r in df.select("__pv", "__bucket").distinct().collect()
    ]
    rows = [
        (pv, b, uuid.uuid4().hex[:8] + "-" + uuid.uuid4().hex[:4])
        for pv, b in pairs
    ]
    fg_parts = {
        fg: (f"{part_field}={pv}" if part_field else "")
        for pv, _b, fg in rows
    }
    mapping = spark.createDataFrame(
        rows, "__pv string, __bucket bigint, __hoodie_fg string"
    )
    return (
        df.join(F.broadcast(mapping), ["__pv", "__bucket"]).drop(
            "__pv", "__bucket"
        ),
        fg_parts,
    )


def write_hudi(
    df: DataFrame,
    path: str,
    record_key: str,
    partition_by: str | None = None,
    buckets: int = 1,
    mode: str = "create",
    extra_metadata: dict[str, str] | None = None,
) -> dict:
    """Create a Hudi COPY_ON_WRITE table (mode='create') or bulk-
    insert into an existing one as NEW file groups (mode='insert' —
    the append shape; key collisions with existing groups are the
    upsert face's job, not checked here). One shuffle (the bucket
    assignment window); `buckets` file groups per partition value."""
    table = os.path.abspath(path)
    exists = os.path.isdir(_hoodie_dir(table))
    if mode == "create":
        if exists:
            raise FileExistsError(f"Hudi table already exists: {table}")
        if record_key not in df.columns:
            raise ValueError(f"record key {record_key!r} not in {df.columns}")
        if partition_by is not None and partition_by not in df.columns:
            raise ValueError(f"partition field {partition_by!r} not in frame")
        os.makedirs(_hoodie_dir(table), exist_ok=True)
        props = {
            "hoodie.table.name": os.path.basename(table),
            "hoodie.table.type": "COPY_ON_WRITE",
            "hoodie.table.version": "6",
            "hoodie.timeline.layout.version": "1",
            "hoodie.table.recordkey.fields": record_key,
        }
        if partition_by:
            props["hoodie.table.partition.fields"] = partition_by
        with open(
            os.path.join(_hoodie_dir(table), "hoodie.properties"), "w"
        ) as fh:
            fh.write("#Updated at " + time.strftime("%c") + "\n")
            for k, v in props.items():
                fh.write(f"{k}={v}\n")
    elif mode == "insert":
        props = _load_properties(table)
        table_key = props["hoodie.table.recordkey.fields"]
        table_part = props.get("hoodie.table.partition.fields")
        if record_key != table_key:
            raise ValueError(
                f"record key {record_key!r} disagrees with the table's "
                f"hoodie.properties ({table_key!r}); the table's key "
                "governs inserts"
            )
        if partition_by is not None and partition_by != table_part:
            raise ValueError(
                f"partition field {partition_by!r} disagrees with the "
                f"table's hoodie.properties ({table_part!r})"
            )
        record_key, partition_by = table_key, table_part
    else:
        raise ValueError(f"write_hudi mode {mode!r}: create or insert")
    instant = _next_instant(table)
    keyed = df.withColumn("__hoodie_key", F.col(record_key).cast("string"))
    assigned, fg_parts = _assign_new_groups(keyed, partition_by, buckets)
    return _write_commit(
        assigned.drop("__hoodie_key"), table, instant, record_key, fg_parts,
        op="insert" if mode == "insert" else "bulk_insert",
        extra_metadata=extra_metadata,
    )


def _snapshot_with_groups(
    spark: SparkSession, path: str
) -> tuple[DataFrame, dict[str, dict], str, str | None]:
    props = _load_properties(path)
    record_key = props["hoodie.table.recordkey.fields"]
    part_field = props.get("hoodie.table.partition.fields")
    slices = _file_slices(path)
    if not slices:
        raise FileNotFoundError(f"Hudi table has no completed commits: {path}")
    table = os.path.abspath(path)
    paths = [os.path.join(table, s["path"]) for s in slices.values()]
    cur = spark.read.parquet(*paths)
    return cur, slices, record_key, part_field


def upsert_hudi(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    precombine: str | None = None,
) -> dict:
    """CDC upsert, copy-on-write: file groups owning an updated key
    are rewritten at the new instant (surviving rows + update rows,
    one base file each); fresh keys insert as new groups. Rewrites
    read ONLY the affected groups — the group resolution is one
    semi-join against the snapshot's key->group map, and the commit
    publishes atomically after all base files land.

    Duplicate record keys WITHIN the updates batch collapse via
    `precombine` (largest value wins, real Hudi's
    hoodie.datasource.write.precombine.field semantics); without one
    a duplicated key raises loudly — writing both rows would leave
    duplicate record keys in the snapshot, silently wrong."""
    table = os.path.abspath(path)
    cur, slices, record_key, part_field = _snapshot_with_groups(spark, table)
    if record_key not in updates.columns:
        raise ValueError(
            f"record key {record_key!r} not in updates frame {updates.columns}"
        )
    if precombine is not None:
        if precombine not in updates.columns:
            raise ValueError(
                f"precombine field {precombine!r} not in updates frame "
                f"{updates.columns}"
            )
        rank = F.row_number().over(
            Window.partitionBy(F.col(record_key).cast("string")).orderBy(
                F.col(precombine).desc()
            )
        )
        updates = (
            updates.withColumn("__pc_rank", rank)
            .filter(F.col("__pc_rank") == 1)
            .drop("__pc_rank")
        )
    else:
        dup = (
            updates.groupBy(F.col(record_key).cast("string"))
            .count()
            .filter(F.col("count") > 1)
            .limit(1)
            .count()
        )
        if dup:
            raise ValueError(
                "updates batch carries duplicate record keys; pass "
                "precombine=<field> to collapse them (largest wins) — "
                "writing both would leave duplicate keys in the snapshot"
            )
    # key -> owning file group, from the meta columns (no listing)
    fg_expr = F.split(F.col("_hoodie_file_name"), "_").getItem(0)
    keyed = cur.withColumn("__cur_fg", fg_expr)
    upd_keys = updates.select(
        F.col(record_key).cast("string").alias("__k")
    ).dropDuplicates()
    owners = (
        keyed.join(
            upd_keys, keyed["_hoodie_record_key"] == upd_keys["__k"], "inner"
        )
        .select("__cur_fg")
        .distinct()
        .collect()
    )
    affected = {r["__cur_fg"] for r in owners}
    rewritten = {fg: slices[fg] for fg in affected if fg in slices}
    data_cols = [c for c in cur.columns if c not in _META_COLS]
    # survivors of the affected groups (their key not updated)
    survivors = (
        keyed.filter(F.col("__cur_fg").isin(list(affected)))
        .join(
            upd_keys,
            keyed["_hoodie_record_key"] == upd_keys["__k"],
            "left_anti",
        )
        .select(*data_cols, F.col("__cur_fg").alias("__hoodie_fg"))
        if affected
        else None
    )
    # updated rows land in their CURRENT group; fresh keys get new ones
    key_to_fg = keyed.select(
        F.col("_hoodie_record_key").alias("__k"), "__cur_fg"
    ).dropDuplicates(["__k"])
    upd = updates.select(*data_cols).withColumn(
        "__k", F.col(record_key).cast("string")
    )
    matched = upd.join(key_to_fg, "__k").select(
        *data_cols, F.col("__cur_fg").alias("__hoodie_fg")
    )
    fresh = upd.join(key_to_fg, "__k", "left_anti").withColumnRenamed(
        "__k", "__hoodie_key"
    )
    parts = [matched]
    if survivors is not None:
        parts.append(survivors)
    combined = parts[0]
    for p in parts[1:]:
        combined = combined.unionByName(p)
    fg_parts = {fg: sl["partition"] for fg, sl in rewritten.items()}
    if fresh.limit(1).count() > 0:
        assigned, new_parts = _assign_new_groups(fresh, part_field, 1)
        combined = combined.unionByName(assigned.drop("__hoodie_key"))
        fg_parts.update(new_parts)
    combined = combined.repartition("__hoodie_fg")
    instant = _next_instant(table)
    return _write_commit(
        combined, table, instant, record_key, fg_parts,
        rewritten=rewritten, op="upsert",
    )


def delete_by_key_hudi(
    spark: SparkSession, path: str, keys: DataFrame
) -> dict:
    """Row-level delete by VALUE, Hudi face: file groups owning a
    doomed key are rewritten WITHOUT those rows (copy-on-write); a
    group losing every row gets an empty base file so its new slice
    shadows the old. Untouched groups are never read or written."""
    table = os.path.abspath(path)
    cur, slices, record_key, part_field = _snapshot_with_groups(spark, table)
    key_col = keys.columns[0]
    doomed = keys.select(
        F.col(key_col).cast("string").alias("__k")
    ).dropDuplicates()
    fg_expr = F.split(F.col("_hoodie_file_name"), "_").getItem(0)
    keyed = cur.withColumn("__cur_fg", fg_expr)
    affected = {
        r["__cur_fg"]
        for r in keyed.join(
            doomed, keyed["_hoodie_record_key"] == doomed["__k"], "inner"
        )
        .select("__cur_fg")
        .distinct()
        .collect()
    }
    if not affected:
        return {"instant": None, "files_written": 0}
    data_cols = [c for c in cur.columns if c not in _META_COLS]
    survivors = (
        keyed.filter(F.col("__cur_fg").isin(list(affected)))
        .join(doomed, keyed["_hoodie_record_key"] == doomed["__k"], "left_anti")
        .select(*data_cols, F.col("__cur_fg").alias("__hoodie_fg"))
        .repartition("__hoodie_fg")
    )
    rewritten = {fg: slices[fg] for fg in affected if fg in slices}
    instant = _next_instant(table)
    return _write_commit(
        survivors, table, instant, record_key,
        {fg: sl["partition"] for fg, sl in rewritten.items()},
        rewritten=rewritten, op="delete",
    )


# ---------------------------------------------------------------------- read


def read_hudi(
    spark: SparkSession,
    path: str,
    as_of: str | None = None,
    with_meta: bool = False,
) -> DataFrame:
    """Snapshot read: the newest FILE SLICE per file group, resolved
    from the completed timeline alone (module docstring) — crashed or
    in-flight writes are invisible, obsolete base files are never
    opened. `as_of` time-travels to any completed instant; the five
    meta columns are dropped unless `with_meta`."""
    table = os.path.abspath(path)
    _load_properties(table)  # existence + COW check
    slices = _file_slices(table, as_of=as_of)
    if not slices:
        raise FileNotFoundError(
            f"Hudi table has no completed commits"
            + (f" at or before {as_of}" if as_of else "")
            + f": {table}"
        )
    df = spark.read.parquet(
        *[os.path.join(table, s["path"]) for s in slices.values()]
    )
    if not with_meta:
        df = df.drop(*_META_COLS)
    return df


def count_rows_hudi(path: str, as_of: str | None = None) -> int:
    """Metadata-only COUNT: the newest slice per group sums its
    commit stat's numWrites — O(timeline JSON), zero data reads (the
    Hudi twin of count_rows_iceberg)."""
    table = os.path.abspath(path)
    slices: dict[str, int] = {}
    for instant in hudi_timeline(table):
        if as_of is not None and instant > str(as_of):
            break
        meta = _read_commit(table, instant)
        for _part, stats in (meta.get("partitionToWriteStats") or {}).items():
            for st in stats:
                slices[st["fileId"]] = int(st["numWrites"])
    return sum(slices.values())


# ------------------------------------------------------------------ streaming

_STREAM_KEY = "streaming.batch.{app_id}"


def last_streaming_batch_hudi(path: str, app_id: str) -> int | None:
    """The app's highest committed micro-batch id, from commit
    metadata's extraMetadata (the field Hudi's own streaming writers
    stamp checkpoints into) — newest commit wins; None for a fresh
    table or unseen app."""
    table = os.path.abspath(path)
    key = _STREAM_KEY.format(app_id=app_id)
    for instant in reversed(hudi_timeline(table)):
        extra = _read_commit(table, instant).get("extraMetadata") or {}
        if key in extra:
            return int(extra[key])
    return None


def streaming_hudi_sink(
    path: str,
    record_key: str,
    app_id: str,
    partition_by: str | None = None,
    buckets: int = 1,
):
    """`foreachBatch` body for an exactly-once streaming Hudi sink —
    the Hudi face of streaming_delta_sink / streaming_iceberg_sink:
    one timeline commit per micro-batch, the app's batch high-water
    mark stamped into the SAME commit's extraMetadata (the completed
    .commit file publishes atomically, so there is no window where
    rows are applied but the mark is not). On restart Structured
    Streaming replays the last unacknowledged batch; the sink skips
    batch ids at or below the logged mark. The first batch bootstraps
    the table.

    Usage:
        q = (df.writeStream.foreachBatch(
                 streaming_hudi_sink(table, "event_id", app_id="cur"))
             .option("checkpointLocation", ckpt).start())
    """

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        table = os.path.abspath(path)
        exists = os.path.isdir(_hoodie_dir(table))
        if exists:
            last = last_streaming_batch_hudi(table, app_id)
            if last is not None and batch_id <= last:
                return  # replayed batch: its commit already landed
        write_hudi(
            batch_df,
            table,
            record_key=record_key,
            partition_by=partition_by,
            buckets=buckets,
            mode="insert" if exists else "create",
            extra_metadata={
                _STREAM_KEY.format(app_id=app_id): str(batch_id)
            },
        )

    return sink
