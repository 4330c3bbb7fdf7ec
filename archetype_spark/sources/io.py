"""Source/sink surface (SURVEY §2.2 Sources/Sinks rows).

The reference hands processors Daft's reader/writer family
(read_parquet/csv/json/lance/iceberg/deltalake, write_*;
pyproject.toml:7-10). Spark equivalents are one dispatch away; this
module is the uniform entry point plus the defaults that matter at
scale:

- parquet: snappy, v2 pages; the only format for data at rest.
- csv/json: header + schema handling and a REQUIRED explicit-or-
  sampled schema at scale (schema inference reads the data twice).
- delta: served by the protocol-native log reader/writer in
  `sources/delta.py` (public `_delta_log` spec; no jars needed),
  including `versionAsOf` time travel.
- iceberg: served by the protocol-native v1 reader/writer in
  `sources/iceberg.py` (public table spec; Avro metadata decoded by
  the stdlib codec in `sources/avro_io.py`), including `snapshot-id`
  time travel.
- lance: conditional native bridge — when the Python `lance`
  package (pylance) is importable, reads go through
  `lance.dataset(...)` → Arrow → DataFrame and writes through
  `lance.write_dataset` (driver-side Arrow transfer, row-capped
  loudly: Lance is the reference's index/metadata store, not the
  100 TB data plane). Without pylance, the format name dispatches
  to `spark.read.format("lance")`, which engages when the connector
  jar is on the classpath; this container ships neither, so the
  bridge is exercised by skipif-gated tests the day either lands.

Writers default to snappy parquet with optional partition columns and
sortWithinPartitions, which is what substitutes for the reference's
BTree indexes (parquet min/max row-group stats; store.py:107-108).
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

_FORMATS = {"parquet", "csv", "json", "orc", "delta", "iceberg", "lance", "avro"}

#: (sorted (path, mtime_ns, size) tuples) -> StructType. Plain
#: `spark.read.parquet` pays a ~75-90 ms driver-side footer/inference
#: pass per call; lake snapshot readers open the same immutable data
#: files many times per session (per query, per bench rep). The memo
#: holds METADATA only (never rows), is keyed on every file's
#: identity so any rewrite invalidates it, and dies with the process —
#: the engine-side stand-in for a catalog that already knows the
#: schema. Bounded: cleared wholesale past _PQ_CACHE_MAX entries.
_PQ_SCHEMA_CACHE: dict[tuple, StructType] = {}
_PQ_CACHE_MAX = 4096


def parquet_cached(spark: SparkSession, *paths: str) -> DataFrame:
    """`spark.read.parquet(*paths)` with a process-local schema memo.
    Semantics identical to the plain reader (first-file schema, no
    mergeSchema) — on a cache hit the schema is supplied explicitly,
    skipping only the redundant footer inference."""
    try:
        key = tuple(
            sorted(
                (p, os.stat(p).st_mtime_ns, os.stat(p).st_size)
                for p in paths
            )
        )
    except OSError:
        return spark.read.parquet(*paths)
    schema = _PQ_SCHEMA_CACHE.get(key)
    if schema is not None:
        return spark.read.schema(schema).parquet(*paths)
    df = spark.read.parquet(*paths)
    if len(_PQ_SCHEMA_CACHE) >= _PQ_CACHE_MAX:
        _PQ_SCHEMA_CACHE.clear()
    _PQ_SCHEMA_CACHE[key] = df.schema
    return df


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: StructType | str | None = None,
    **options: str,
) -> DataFrame:
    """Uniform reader. csv defaults: header=true. json: one object per
    line (spark's jsonl default). Explicit `schema` skips inference —
    mandatory practice on large inputs."""
    if fmt not in _FORMATS:
        raise ValueError(f"unknown format {fmt!r}; expected one of {sorted(_FORMATS)}")
    if fmt == "delta":
        # protocol-native path (sources/delta.py): works with zero
        # connector jars; honors the connector's versionAsOf option.
        # The schema comes from the table's own log — a caller schema
        # or other reader options would be silently ignored, so they
        # are refused instead.
        from archetype_spark.sources.delta import read_delta

        v = options.pop("versionAsOf", None)
        if schema is not None or options:
            raise ValueError(
                "delta derives its schema from the transaction log; "
                f"unsupported reader args: schema={schema!r}, "
                f"options={sorted(options)}"
            )
        return read_delta(spark, path, version=None if v is None else int(v))
    if fmt == "iceberg":
        # protocol-native v1 path (sources/iceberg.py); honors the
        # connector's snapshot-id option, same loud-arg contract.
        from archetype_spark.sources.iceberg import read_iceberg

        v = options.pop("snapshot-id", options.pop("snapshotId", None))
        if schema is not None or options:
            raise ValueError(
                "iceberg derives its schema from the table metadata; "
                f"unsupported reader args: schema={schema!r}, "
                f"options={sorted(options)}"
            )
        return read_iceberg(
            spark, path, snapshot_id=None if v is None else int(v)
        )
    if fmt == "lance" and _have_pylance():
        v = options.pop("version", None)
        max_rows = int(options.pop("maxRows", _LANCE_MAX_ROWS))
        if schema is not None or options:
            raise ValueError(
                "lance derives its schema from the dataset; "
                f"unsupported reader args: schema={schema!r}, "
                f"options={sorted(options)}"
            )
        return _read_lance_pylance(
            spark, path, version=v, max_rows=max_rows
        )
    _heal_merge(path)  # replay a committed-but-unswapped merge, if any
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv":
        options.setdefault("header", "true")
    return reader.format(fmt).options(**options).load(path)


def read_binary_dir(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    recursive: bool = False,
) -> DataFrame:
    """Opaque-blob ingest via Spark's built-in `binaryFile` source —
    the from-glob-path face of the multimodal pipeline (Daft
    `from_glob_path` / `.url.download()` parity; the reference's
    media tables start as directories of encoded files). Returns
    (path, modificationTime, length, content); feed `content` to
    operators/multimodal.decode_media.

    Scale: listing is distributed, each file is one row in one task
    (files > 2 GB are rejected by the source — store such media as
    chunked payloads or URIs instead), and column pruning means a
    metadata-only query (length, path) never reads the bytes."""
    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    return reader.load(path)


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "error",
    partition_by: Sequence[str] | None = None,
    sort_by: Sequence[str] | None = None,
    **options: str,
) -> None:
    """Uniform writer. `sort_by` sorts within partitions before the
    write so parquet row-group stats support skipping on those keys."""
    if fmt not in _FORMATS:
        raise ValueError(f"unknown format {fmt!r}; expected one of {sorted(_FORMATS)}")
    if sort_by:
        df = df.sortWithinPartitions(*sort_by)
    if fmt == "delta":
        from archetype_spark.sources.delta import _latest_version, write_delta

        if mode in ("error", "errorifexists"):
            if _latest_version(path) is not None:
                raise FileExistsError(f"Delta table already exists: {path}")
            mode = "append"
        write_delta(df, path, mode=mode, partition_by=partition_by)
        return
    if fmt == "iceberg":
        from archetype_spark.sources.iceberg import (
            _current_metadata_version,
            write_iceberg,
        )

        if mode in ("error", "errorifexists"):
            if _current_metadata_version(path) is not None:
                raise FileExistsError(f"Iceberg table already exists: {path}")
            mode = "append"
        write_iceberg(df, path, mode=mode, partition_by=partition_by)
        return
    if fmt == "lance" and _have_pylance():
        if partition_by:
            raise ValueError(
                "lance datasets are not hive-partitioned; use its "
                "native indices instead of partition_by"
            )
        _write_lance_pylance(df, path, mode=mode)
        return
    writer = df.write.format(fmt).mode(mode).options(**options)
    if fmt == "csv":
        writer = writer.option("header", "true")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


# ------------------------------------------------------------ lance bridge

#: Row cap for the driver-side pylance Arrow bridge. Lance serves the
#: reference as the entity/index store (metadata-scale); bulk data
#: stays parquet. Reading more than this through the driver is almost
#: certainly a mistake, so it fails loudly instead of OOMing.
_LANCE_MAX_ROWS = 10_000_000


def _have_pylance() -> bool:
    try:
        import lance  # noqa: F401

        return True
    except ImportError:
        return False


def _read_lance_pylance(
    spark: SparkSession,
    path: str,
    version: str | int | None = None,
    max_rows: int = _LANCE_MAX_ROWS,
) -> DataFrame:
    """Driver-side Arrow bridge: lance.dataset → pa.Table →
    DataFrame. count_rows() is metadata-only, so the row-cap check
    costs nothing; `version` engages Lance's native time travel."""
    import lance

    ds = lance.dataset(path, version=None if version is None else int(version))
    n = ds.count_rows()
    if n > max_rows:
        raise ValueError(
            f"lance dataset {path} has {n} rows > the driver-bridge "
            f"cap {max_rows}; use the Spark connector jar for "
            "data-plane reads, or raise maxRows explicitly"
        )
    # Arrow table straight into createDataFrame (pyspark 4): a pandas
    # hop would coerce nullable int64 to float64 (NaN-for-null) and
    # lose >2^53 precision — a silent type change vs the write path
    return spark.createDataFrame(ds.to_table())


def _write_lance_pylance(df: DataFrame, path: str, mode: str = "error") -> None:
    """Driver-side write through lance.write_dataset. Connector mode
    names map onto Lance's create/append/overwrite."""
    import lance

    lance_mode = {
        "error": "create",
        "errorifexists": "create",
        "append": "append",
        "overwrite": "overwrite",
    }.get(mode)
    if lance_mode is None:
        raise ValueError(f"unsupported lance write mode {mode!r}")
    lance.write_dataset(df.toArrow(), path, mode=lance_mode)


def write_bucketed_table(
    df: DataFrame,
    name: str,
    buckets: int,
    bucket_cols: Sequence[str],
    sort_cols: Sequence[str] | None = None,
    mode: str = "error",
) -> None:
    """Bucketed managed table (SURVEY §4: co-located joins). Two
    tables bucketed to the SAME count on the join key hash-land their
    matching rows in the same bucket file, so a join between them is
    shuffle-free — the exchange that dominates a big fact-fact join
    disappears (pinned by tests/test_sources.py's no-Exchange plan
    assertion). The pre-paid cost is one shuffle at WRITE time: the
    classic trade for a join that runs repeatedly.

    Spark's bucketing lives in the session catalog, so this writes a
    managed table (`saveAsTable`), not a bare path; read it back with
    `spark.table(name)`."""
    writer = df.write.bucketBy(buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.mode(mode).format("parquet").saveAsTable(name)


def merge_table(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    keys: Sequence[str],
    when_matched: str = "update",
    when_not_matched: str = "insert",
) -> None:
    """MERGE INTO for plain-parquet tables (SURVEY §4.3): the lakehouse
    formats run their own `MERGE INTO` when their jars are on the
    classpath (delta/iceberg dispatch above); this is the
    copy-on-write equivalent for tables that are just a parquet dir.

    Semantics per merge key:
    - when_matched='update': the update row replaces the target row;
      'delete': the target row is dropped; 'ignore': target kept.
    - when_not_matched='insert': unmatched update rows are appended;
      'ignore': dropped.

    Shape at scale: one shuffle (the anti/semi join on `keys` —
    hash-partitioned like any join, AQE skew handling applies), then a
    full rewrite. Copy-on-write is the right trade for bulk merges
    (the reference's LanceDB merge_insert is the same model); for
    high-frequency small upserts prefer the ECS store's append +
    latest-wins resolution, which never rewrites history.

    Durability (same marker-replay protocol as ArchetypeStore.compact):
    the merged table is written to a temp dir, then a commit marker
    naming the temp/old dirs is published atomically BEFORE the two
    swap renames. A crash at any point leaves either the old table
    (no marker yet -> temp is discarded debris) or a replayable swap
    (marker present -> `_heal_merge`, invoked from read_table and from
    the next merge_table call, rolls the committed merge forward), so
    a reader never observes a missing or half-rewritten table."""
    if when_matched not in ("update", "delete", "ignore"):
        raise ValueError(f"when_matched must be update/delete/ignore, got {when_matched!r}")
    if when_not_matched not in ("insert", "ignore"):
        raise ValueError(f"when_not_matched must be insert/ignore, got {when_not_matched!r}")
    keys = list(keys)
    target = read_table(spark, path)  # read_table heals any prior crash first

    if when_matched == "ignore":
        kept = target
    elif when_matched == "delete":
        kept = target.join(updates.select(*keys), keys, "left_anti")
    else:  # update: unmatched target rows survive; matched get replaced
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

    # the write to tmp EXECUTES the plan (which reads `path`) and
    # completes before any rename below — no read/swap race
    tmp = f"{path}.merging-{uuid.uuid4().hex}"
    try:
        write_table(merged, tmp, sort_by=keys)
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    old = f"{path}.old-{uuid.uuid4().hex}"
    marker = _merge_marker(path)
    marker_tmp = marker + ".tmp"
    with open(marker_tmp, "w") as fh:
        json.dump({"tmp": tmp, "old": old}, fh)
    os.replace(marker_tmp, marker)  # commit point (atomic)
    _heal_merge(path)  # performs the swap; crash-resumable from here


def _merge_marker(path: str) -> str:
    return os.path.normpath(path) + ".merge-commit.json"


def _heal_merge(path: str) -> None:
    """(Re)play a committed merge swap. Idempotent and safe at ANY
    crash point past the marker publish:

    - tmp still present: the merged table is tmp; move the live table
      (if any) aside to `old` and rename tmp into place;
    - tmp gone: the swap already happened; only cleanup remains.

    No marker (the overwhelmingly common case) = one os.path stat."""
    marker = _merge_marker(path)
    if not os.path.isfile(marker):
        return
    with open(marker) as fh:
        meta = json.load(fh)
    tmp, old = meta["tmp"], meta["old"]
    if os.path.isdir(tmp):
        if os.path.isdir(path):
            if os.path.isdir(old):  # defensive: half-moved old
                shutil.rmtree(old)
            os.rename(path, old)
        os.rename(tmp, path)
    shutil.rmtree(old, ignore_errors=True)
    os.remove(marker)
