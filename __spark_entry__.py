"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Query implementations live in archetype_spark/queries/ (relational
corpus Q01-Q28, north-star q29-q49, ECS/temporal/streaming q50-q52 +
q45-q47, extended surface q53-q83, curation tier q84-q99 + q102-q103,
sources q100/q104-q111 (binaryFile ingest; Delta-log and
Iceberg-manifest snapshot scans; Delta MERGE INTO; incremental
per-commit Delta and per-snapshot Iceberg changes reads; the
three-source lake federation; Iceberg metadata-only COUNT; the
Delta schema-evolution scan), index-tier q101, retrieval/tokenization tier
q112-q115 + q117-q118 (BM25 top-k; hybrid RRF fusion, exact and
bounded-depth faces; PQ asymmetric-distance and composite IVF_PQ
top-k over persisted indexes; learned-BPE token counts over the
persisted merge/segmentation artifact),
layout tier q116 (2-D box scan over a Z-ORDERed Delta rewrite),
row-level-delete tier q119-q120 + q122 (Delta deletion-vector scan;
Iceberg v2 position-delete scan with oracle-gated sequence scoping;
Iceberg EQUALITY deletes + the one-commit CDC upsert with strict
scoping), partition-transform tier q123 (day(ts) spec with
manifest-level pruning through read_iceberg(scan_filter=...)),
column-mapping tier q124 (Delta mode 'name': metadata-only partition
rename + DV delete + cross-boundary time travel), refined-retrieval
q125 (IVF_PQ + exact rerank over the persisted index), replication
tier q126/q128 (Delta commits into an Iceberg mirror; the CDF source
propagates deletes), change-feed tier q127 (Delta CDF read: derived
inserts + _change_data delete/update images), real-pixel tier q121
(baseline-JPEG/PNG/P6/GIF entropy decode hash-gated against the
fixture generator's source-array manifest), and spectral tier q129
(frame-level rfft over PCM WAV, analytic-manifest oracle), lake tier
q130-q145 (Iceberg changelog + equality-delete changelog; mixed
parquet/ORC/Avro snapshots; HTML/PDF/WARC extraction; image
near-dups; video frames; the reverse Delta mirror; Hudi CoW +
MERGE_ON_READ snapshot/incremental/read-optimized/clustered/cleaned
faces), and the r14 Hudi hardening tier q146-q147 (the Hudi-sourced
tri-format replication mesh; archived-timeline scans)); oracles
are colocated with each query module.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (Q12, TPC-H Q1 shape) on /root/testdata/sf0.001.

    Also warm-builds the CORRECTNESS-scale ANN indexes: the smoke
    phase runs before the correctness protocol, so by the time q61's
    oracle (which reads the persisted IVF index parquet) is evaluated
    the index exists on disk even on a cold checkout. Guarded — the
    smoke check never fails on index-build issues."""
    from archetype_spark.queries.relational import q12_grouped_agg

    try:
        from archetype_spark.queries.northstar import (
            CORRECTNESS_SF_DIR,
            ensure_ann_indexes,
        )

        ensure_ann_indexes(spark, CORRECTNESS_SF_DIR)
    except Exception:
        pass
    return q12_grouped_agg(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from archetype_spark.queries import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query (omitted for hash-family/
    UDF operators, which get the rows-only check + property tests)."""
    from archetype_spark.queries import all_oracles

    return all_oracles()
