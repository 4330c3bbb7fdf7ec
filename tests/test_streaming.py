"""Streaming lift tests: the window builders, stateful accumulator,
and foreachBatch world driver run in REAL streaming mode (file source
-> availableNow trigger -> memory sink) and agree with their batch
faces (which are oracle-gated in tests/test_oracle_corpus.py).
"""

from __future__ import annotations

from dataclasses import dataclass

import pytest
from pyspark.sql import functions as F

from archetype_spark.streaming.stateful import running_totals
from archetype_spark.streaming.windows import (
    dedup_within_watermark,
    tumbling_agg,
)
from archetype_spark.tables import load

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def events_batch(spark, tmp_path):
    """The events table rewritten as microsecond-timestamp parquet —
    the raw driver file is TIMESTAMP(NANOS), which Spark's streaming
    file source cannot read (tables.load handles it for batch)."""
    out = tmp_path / "events_us"
    load(spark, SF, "events").coalesce(1).write.parquet(str(out))
    return spark.read.parquet(str(out))


@pytest.fixture()
def events_stream(spark, tmp_path, events_batch):
    """File-source stream over the rewritten events (one parquet file
    = one micro-batch under availableNow)."""
    return spark.readStream.schema(events_batch.schema).parquet(
        str(tmp_path / "events_us")
    )


def _run_to_memory(spark, df, name, mode="append"):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


def test_tumbling_stream_matches_batch(spark, events_batch, events_stream):
    batch = events_batch
    expect = {
        (r["user_id"], r["win_start"], r["n_events"])
        for r in tumbling_agg(batch).collect()
    }
    streamed = _run_to_memory(
        spark,
        tumbling_agg(events_stream, watermark="10 minutes"),
        "tumbling_sink",
        mode="append",
    )
    got = {
        (r["user_id"], r["win_start"], r["n_events"]) for r in streamed.collect()
    }
    # Append mode emits a window only once the watermark passes its
    # end; windows still open when the stream drains are withheld —
    # that holdback IS the late-data policy. Everything emitted must
    # match batch, and only tail windows (those the final watermark
    # couldn't close: end > max_ts - 10min) may be missing.
    assert got <= expect
    max_ts = max(r["ts"] for r in batch.select("ts").collect())
    import datetime

    horizon = max_ts - datetime.timedelta(minutes=10)
    for user_id, win_start, n in expect - got:
        assert win_start + datetime.timedelta(hours=1) > horizon
    assert len(got) > 0.9 * len(expect)


def test_sliding_and_session_stream_match_batch(spark, events_batch, events_stream):
    """The overlapping-window and session-window builders must agree
    between their batch and streaming faces on everything the final
    watermark can close (same holdback rule as tumbling)."""
    import datetime

    from archetype_spark.streaming.windows import session_agg, sliding_agg

    max_ts = max(r["ts"] for r in events_batch.select("ts").collect())
    horizon = max_ts - datetime.timedelta(minutes=10)

    b_slide = {
        (r["user_id"], r["win_start"], r["n_events"])
        for r in sliding_agg(events_batch).collect()
    }
    s_slide = _run_to_memory(
        spark, sliding_agg(events_stream, watermark="10 minutes"), "slide_sink"
    )
    got = {(r["user_id"], r["win_start"], r["n_events"]) for r in s_slide.collect()}
    assert got <= b_slide
    for _, win_start, _ in b_slide - got:
        assert win_start + datetime.timedelta(hours=1) > horizon
    assert len(got) > 0.9 * len(b_slide)

    b_sess = {
        (r["user_id"], r["sess_start"], r["n_events"])
        for r in session_agg(events_batch).collect()
    }
    s_sess = _run_to_memory(
        spark, session_agg(events_stream, watermark="10 minutes"), "sess_sink"
    )
    got_s = {
        (r["user_id"], r["sess_start"], r["n_events"]) for r in s_sess.collect()
    }
    assert got_s <= b_sess
    for _, sess_start, _ in b_sess - got_s:
        # a session still open at drain (last event within gap+watermark
        # of the end) is withheld
        assert sess_start > horizon - datetime.timedelta(minutes=30)
    assert len(got_s) > 0.9 * len(b_sess)


def test_stateful_running_totals(spark, events_batch, events_stream):
    out = _run_to_memory(
        spark, running_totals(events_stream), "running_sink", mode="update"
    )
    batch = events_batch
    expect = {
        (r["user_id"], r["n"], round(r["s"], 6))
        for r in batch.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    got = {
        (r["user_id"], r["n_events"], round(r["sum_value"], 6))
        for r in out.collect()
    }
    assert got == expect


def test_dedup_within_watermark_stream(spark, tmp_path):
    src = tmp_path / "dup_src"
    src.mkdir()
    ev = load(spark, SF, "events").limit(100)
    ev.union(ev).coalesce(1).write.parquet(str(src / "batch0"))
    schema = ev.schema
    stream = spark.readStream.schema(schema).parquet(str(src / "batch0"))
    out = _run_to_memory(
        spark,
        dedup_within_watermark(stream, ["event_id"], watermark="1 hour"),
        "dedup_sink",
    )
    assert out.count() == 100


def test_world_stream_steps(spark, tmp_path):
    """foreachBatch drives real simulation steps from a stream."""
    from archetype_spark.ecs import Component, Processor, make_world, processor
    from archetype_spark.streaming.world_stream import run_stream_steps

    @dataclass
    class Position(Component):
        x: float
        y: float

    @dataclass
    class Velocity(Component):
        vx: float
        vy: float

    @processor(Position, Velocity, priority=1)
    class Movement(Processor):
        def process(self, df, dt):
            return df.withColumns(
                {
                    "position__x": F.col("position__x")
                    + F.col("velocity__vx") * dt,
                    "position__y": F.col("position__y")
                    + F.col("velocity__vy") * dt,
                }
            )

    src = tmp_path / "cmds"
    src.mkdir()
    ev = load(spark, SF, "events")
    ev.limit(3).coalesce(1).write.parquet(str(src / "b0"))

    world = make_world(spark, str(tmp_path / "wh"), simulation="stream")
    world.add_processor(Movement())

    def to_entities(batch_df):
        return [
            [Position(x=float(r["value"]), y=0.0), Velocity(vx=1.0, vy=0.0)]
            for r in batch_df.collect()
        ]

    stream = spark.readStream.schema(ev.schema).parquet(str(src / "b0"))
    q = run_stream_steps(
        stream, world, to_entities, dt=0.5,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)

    assert world.current_step >= 1
    (latest_df,) = world.latest(Position).values()
    rows = latest_df.collect()
    assert len(rows) == 3
    # one step applied: x = value + 1.0*0.5
    src_vals = sorted(float(r["value"]) for r in ev.limit(3).collect())
    got_vals = sorted(round(r["position__x"] - 0.5, 6) for r in rows)
    assert got_vals == [round(v, 6) for v in src_vals]


def test_world_stream_multi_batch_matches_batch_loop(spark, tmp_path):
    """A multi-micro-batch stream (maxFilesPerTrigger=1) must drive the
    SAME simulation the plain driver-side step loop produces — one
    spawn group + one step per micro-batch, identical Position history
    (VERDICT r3 ask #8: the §7-phase-7 seam exercised end-to-end)."""
    from dataclasses import dataclass

    from archetype_spark.ecs import Component, Processor, make_world, processor
    from archetype_spark.streaming.world_stream import run_stream_steps

    @dataclass
    class Position(Component):
        x: float
        y: float

    @dataclass
    class Velocity(Component):
        vx: float
        vy: float

    @processor(Position, Velocity, priority=1)
    class Movement(Processor):
        def process(self, df, dt):
            return df.withColumns(
                {
                    "position__x": F.col("position__x") + F.col("velocity__vx") * dt,
                    "position__y": F.col("position__y") + F.col("velocity__vy") * dt,
                }
            )

    import os
    import pyarrow as pa
    import pyarrow.parquet as pq

    batches = [[1.0, 2.0], [3.0], [4.0, 5.0]]
    src = tmp_path / "stream_src"
    src.mkdir()
    for i, vals in enumerate(batches):
        f = str(src / f"b{i}.parquet")
        pq.write_table(pa.table({"value": pa.array(vals, pa.float64())}), f)
        os.utime(f, (1_700_000_000 + i * 10, 1_700_000_000 + i * 10))

    def to_entities(batch_df):
        return [
            [Position(x=float(v), y=0.0), Velocity(vx=1.0, vy=0.0)]
            for v in sorted(r["value"] for r in batch_df.collect())
        ]

    sworld = make_world(spark, str(tmp_path / "wh_s"), simulation="ms_stream")
    sworld.add_processor(Movement())
    stream = (
        spark.readStream.schema("value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = run_stream_steps(
        stream, sworld, to_entities, dt=0.5,
        checkpoint_dir=str(tmp_path / "ckpt_ms"),
    )
    q.awaitTermination(180)
    assert sworld.current_step == len(batches)

    bworld = make_world(spark, str(tmp_path / "wh_b"), simulation="ms_batch")
    bworld.add_processor(Movement())
    for vals in batches:
        bworld.spawn_many(
            [
                [Position(x=float(v), y=0.0), Velocity(vx=1.0, vy=0.0)]
                for v in sorted(vals)
            ]
        )
        bworld.step(dt=0.5)

    def hist(world):
        (hdf,) = world.get_history(Position).values()
        return sorted(
            (r["entity_id"], r["step"], round(r["position__x"], 6),
             round(r["position__y"], 6), r["is_active"])
            for r in hdf.collect()
        )

    assert hist(sworld) == hist(bworld)


def test_stream_ingest_dedup_matches_batch(spark, tmp_path):
    """Streaming ingest-dedup: a file stream drained one file per
    micro-batch through foreachBatch(ingest_dedup) must land the same
    deduped table as one batch ingest of the full corpus — the
    composition a production pipeline runs on arriving data."""
    from pyspark.sql import functions as F

    from archetype_spark.operators import dedup

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
    )
    src = str(tmp_path / "arrivals")
    # three arrival files in doc_id order (lexicographic listing order)
    for i, (lo, hi) in enumerate([(0, 150), (150, 300), (300, 10**9)]):
        docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi)).coalesce(
            1
        ).write.parquet(f"{src}/batch={i:02d}")
    tbl = str(tmp_path / "stream_tbl")

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/batch=*")
    )
    q = (
        stream.writeStream.foreachBatch(
            lambda b, _id: dedup.ingest_dedup(spark, b, tbl)
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r["doc_id"], r["fingerprint"])
        for r in spark.read.parquet(tbl).select("doc_id", "fingerprint").collect()
    }
    expect_tbl = str(tmp_path / "batch_tbl")
    dedup.ingest_dedup(spark, docs, expect_tbl)
    expect = {
        (r["doc_id"], r["fingerprint"])
        for r in spark.read.parquet(expect_tbl)
        .select("doc_id", "fingerprint")
        .collect()
    }
    assert got == expect and got


def test_streaming_scrub_and_chunk_match_batch(spark, tmp_path):
    """The stateless curation passes (PII scrub, token-window
    chunking) run unchanged on a readStream — narrow column work has
    no batch/stream semantic gap — and agree row-for-row with their
    batch results."""
    from archetype_spark.operators import cleaning, packing

    rows = [
        (1, "mail a@b.co now and " + " ".join(f"t{i}" for i in range(40))),
        (2, "call 555-123-4567 from 10.0.0.1"),
    ]
    src = tmp_path / "docs"
    spark.createDataFrame(rows, "doc_id int, text string").coalesce(
        1
    ).write.parquet(str(src))
    batch = spark.read.parquet(str(src))
    stream = spark.readStream.schema(batch.schema).parquet(str(src))

    def pipeline(df):
        return packing.chunk_documents(
            cleaning.scrub_pii(df), window=16, stride=16
        )

    want = {tuple(r) for r in pipeline(batch).collect()}
    got = {
        tuple(r)
        for r in _run_to_memory(spark, pipeline(stream), "scrub_chunks").collect()
    }
    assert got == want and len(want) > 0


def test_stream_curation_matches_batch(spark, tmp_path):
    """The q95 pipeline's stateless subset composed over the
    ingest-dedup stream (streaming/curation.py): draining the corpus
    one file per micro-batch through foreachBatch(curate_batch) lands
    the same curated table as one batch pass — SURVEY §7 phase 7's
    arriving-data lift of the curation tier."""
    from pyspark.sql import functions as F

    from archetype_spark.streaming import curation

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text", "lang")
    )
    # plant cross-batch duplicates: batch 2 re-ships some batch-0 texts
    dupes = docs.filter(F.col("doc_id") < 20).select(
        (F.col("doc_id") + 10**6).alias("doc_id"), "text", "lang"
    )
    src = str(tmp_path / "arrivals")
    splits = [
        docs.filter(F.col("doc_id") < 150),
        docs.filter((F.col("doc_id") >= 150) & (F.col("doc_id") < 300)),
        docs.filter(F.col("doc_id") >= 300).unionAll(dupes),
    ]
    for i, part in enumerate(splits):
        part.coalesce(1).write.parquet(f"{src}/batch={i:02d}")

    stream_dir = str(tmp_path / "stream")
    stream = (
        spark.readStream.schema("doc_id long, text string, lang string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/batch=*")
    )
    q = (
        stream.writeStream.foreachBatch(
            lambda b, _id: curation.curate_batch(spark, b, stream_dir)
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    batch_dir = str(tmp_path / "batch")
    curation.curate_corpus(spark, docs.unionAll(dupes), batch_dir)

    cols = ["doc_id", "fingerprint", "text", "lang"]
    got = {
        tuple(r)
        for r in spark.read.parquet(f"{stream_dir}/curated")
        .select(*cols)
        .collect()
    }
    want = {
        tuple(r)
        for r in spark.read.parquet(f"{batch_dir}/curated")
        .select(*cols)
        .collect()
    }
    assert got == want and len(got) > 100
    # the planted duplicates were dropped by the cross-batch anti-join
    assert not any(r[0] >= 10**6 for r in got)


def test_line_flatten_identity(spark):
    """The algebraic identity stateless_curation relies on:
    flatten(line_chunked(t, k)) == replace(t, '\\n', ' ') for any k —
    including texts with embedded newlines, doubled spaces, and empty
    strings."""
    from pyspark.sql import functions as F

    from archetype_spark.streaming import curation

    rows = [
        (1, "plain three token text here"),
        (2, "embedded\nnewline token"),
        (3, "double  space  tokens"),
        (4, ""),
        (5, "\n"),
        (6, "a"),
    ]
    d = spark.createDataFrame(rows, "doc_id int, text string")
    for k in (2, 3, 5):
        lined = curation.line_chunked(d, k)
        flat = {
            r["doc_id"]: r["text"]
            for r in lined.select(
                "doc_id", F.regexp_replace("text", "\n", " ").alias("text")
            ).collect()
        }
        want = {
            r["doc_id"]: r["text"]
            for r in d.select(
                "doc_id", F.regexp_replace("text", "\n", " ").alias("text")
            ).collect()
        }
        assert flat == want, (k, flat, want)
        # and the structural gate agrees: length(lined)>0 == length(t)>0
        gl = {r["doc_id"]: len(r["text"]) > 0 for r in lined.collect()}
        gt = {r["doc_id"]: len(r["text"]) > 0 for r in d.collect()}
        assert gl == gt
