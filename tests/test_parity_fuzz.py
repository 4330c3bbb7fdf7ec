"""Seeded randomized parity checks for the engine-vs-oracle seams
that bit us once already (see .claude/skills/verify/SKILL.md):

- round_like_duckdb vs DuckDB ROUND on adversarial half-boundary
  doubles — the q04 hash depends on exact agreement.
- asof_join vs DuckDB's native ASOF JOIN on random key/ts frames,
  including duplicate timestamps per key.

Deterministic (fixed seeds), batch-style: one Spark job per test, the
whole batch compared elementwise.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from archetype_spark.operators.temporal import asof_join
from archetype_spark.queries.relational import round_like_duckdb


def test_round_parity_adversarial(spark):
    rng = np.random.default_rng(42)
    # uniform magnitudes + explicit half-cent boundary values (k+0.005)
    # + TPC-H-style price*discount*tax products
    uniform = rng.uniform(0, 200000, 20000)
    halves = (rng.integers(0, 2_000_000, 20000) / 100.0) + 0.005
    prices = rng.uniform(900, 105000, 20000)
    disc = rng.integers(0, 11, 20000) / 100.0
    tax = rng.integers(0, 9, 20000) / 100.0
    products = prices * (1 - disc) * (1 + tax)
    vals = np.concatenate([uniform, halves, products])

    df = spark.createDataFrame([(float(v),) for v in vals], "v double")
    got = [
        r["r"]
        for r in df.select(round_like_duckdb(F.col("v"), 2).alias("r"))
        .collect()
    ]

    con = duckdb.connect()
    con.execute("CREATE TABLE t (i INTEGER, v DOUBLE)")
    con.executemany(
        "INSERT INTO t VALUES (?, ?)", list(enumerate(float(v) for v in vals))
    )
    want = [r[0] for r in con.execute("SELECT ROUND(v, 2) FROM t ORDER BY i").fetchall()]

    mismatches = [
        (v, g, w) for v, g, w in zip(vals, got, want) if abs(g - w) > 1e-12
    ]
    assert not mismatches, f"{len(mismatches)} of {len(vals)}: {mismatches[:5]}"


def test_approx_count_distinct_tolerance(spark):
    """[D] approx_count_distinct row: HLL++ estimate within 3x the
    requested relative standard deviation of the exact count."""
    from archetype_spark.tables import load

    o = load(spark, "/root/testdata/sf0.01", "orders")
    exact = o.agg(F.countDistinct("o_custkey").alias("e")).collect()[0]["e"]
    for rsd in (0.05, 0.01):
        approx = o.agg(
            F.approx_count_distinct("o_custkey", rsd=rsd).alias("a")
        ).collect()[0]["a"]
        assert abs(approx - exact) / exact <= 3 * rsd, (rsd, approx, exact)


def test_asof_parity_random(spark):
    rng = np.random.default_rng(7)
    n_left, n_right = 2000, 3000
    # duplicate-heavy integer timestamps force tie handling; keys 0-19
    lrows = [
        (int(k), int(t), int(i))
        for i, (k, t) in enumerate(
            zip(rng.integers(0, 20, n_left), rng.integers(0, 500, n_left))
        )
    ]
    rrows = [
        (int(k), int(t), int(i) + 10_000)
        for i, (k, t) in enumerate(
            zip(rng.integers(0, 20, n_right), rng.integers(0, 500, n_right))
        )
    ]
    # make right (key, ts) unique so the as-of match is well-defined
    seen: set[tuple[int, int]] = set()
    rrows = [r for r in rrows if not ((r[0], r[1]) in seen or seen.add((r[0], r[1])))]

    ldf = spark.createDataFrame(lrows, "k long, t long, lid long").withColumn(
        "ts", F.timestamp_seconds("t")
    )
    rdf = spark.createDataFrame(rrows, "k long, t long, rid long").withColumn(
        "ts", F.timestamp_seconds("t")
    )
    out = asof_join(
        ldf.select("k", "ts", "lid"),
        rdf.select("k", "ts", "rid"),
        keys=["k"],
        ts_col="ts",
        right_cols=["rid"],
    )
    got = sorted((r["lid"], r["r_rid"]) for r in out.collect())

    con = duckdb.connect()
    con.execute("CREATE TABLE l (k BIGINT, t BIGINT, lid BIGINT)")
    con.execute("CREATE TABLE r (k BIGINT, t BIGINT, rid BIGINT)")
    con.executemany("INSERT INTO l VALUES (?,?,?)", lrows)
    con.executemany("INSERT INTO r VALUES (?,?,?)", rrows)
    want = sorted(
        con.execute(
            """SELECT l.lid, r.rid FROM l ASOF JOIN r
               ON l.k = r.k AND l.t >= r.t"""
        ).fetchall()
    )
    assert got == want, f"sizes {len(got)} vs {len(want)}"


def test_asof_parity_null_payload(spark):
    """Right rows whose FIRST projected column is legitimately NULL
    must still match (and surface their NULL) — the newest right row
    wins as a unit; an older row's non-null value must never bleed
    through (VERDICT r2 'What's wrong' #5)."""
    rng = np.random.default_rng(13)
    n_left, n_right = 1500, 2000
    lrows = [
        (int(k), int(t), int(i))
        for i, (k, t) in enumerate(
            zip(rng.integers(0, 10, n_left), rng.integers(0, 300, n_left))
        )
    ]
    # ~half the right payloads NULL, including entire keys' newest rows
    rrows = []
    seen: set[tuple[int, int]] = set()
    for i, (k, t, nullit) in enumerate(
        zip(
            rng.integers(0, 10, n_right),
            rng.integers(0, 300, n_right),
            rng.random(n_right) < 0.5,
        )
    ):
        if (int(k), int(t)) in seen:
            continue
        seen.add((int(k), int(t)))
        rrows.append((int(k), int(t), None if nullit else int(i) + 10_000, int(i)))

    ldf = spark.createDataFrame(lrows, "k long, t long, lid long").withColumn(
        "ts", F.timestamp_seconds("t")
    )
    rdf = spark.createDataFrame(rrows, "k long, t long, v long, rid long").withColumn(
        "ts", F.timestamp_seconds("t")
    )
    out = asof_join(
        ldf.select("k", "ts", "lid"),
        rdf.select("k", "ts", "v", "rid"),
        keys=["k"],
        ts_col="ts",
        right_cols=["v", "rid"],  # v (nullable) deliberately first
    )
    got = sorted(
        (r["lid"], r["r_v"], r["r_rid"]) for r in out.collect()
    )

    con = duckdb.connect()
    con.execute("CREATE TABLE l (k BIGINT, t BIGINT, lid BIGINT)")
    con.execute("CREATE TABLE r (k BIGINT, t BIGINT, v BIGINT, rid BIGINT)")
    con.executemany("INSERT INTO l VALUES (?,?,?)", lrows)
    con.executemany("INSERT INTO r VALUES (?,?,?,?)", rrows)
    want = sorted(
        con.execute(
            """SELECT l.lid, r.v, r.rid FROM l ASOF JOIN r
               ON l.k = r.k AND l.t >= r.t"""
        ).fetchall()
    )
    assert got == want, f"sizes {len(got)} vs {len(want)}; first diff: " + str(
        next((a, b) for a, b in zip(got, want) if a != b)
    )


def test_contamination_parity_random(spark):
    """Randomized decontamination parity: operator vs a pure-Python
    reference on word-soup docs drawn from a small vocabulary (so
    train/eval shingle overlap actually occurs). Pins the whole
    semantics — distinct-shingle universe, shared counts, rounded
    fraction, keep verdict."""
    from archetype_spark.operators.decontam import contamination

    rng = np.random.default_rng(2026)
    vocab = [f"w{i}" for i in range(30)]
    docs = {
        i: " ".join(rng.choice(vocab, size=rng.integers(1, 12)))
        for i in range(120)
    }
    train_ids = [i for i in docs if i % 3 != 0]
    eval_ids = [i for i in docs if i % 3 == 0]
    n = 2

    def shingle_set(t):
        w = t.split(" ")
        return {" ".join(w[k : k + n]) for k in range(len(w) - n + 1)}

    eval_union = set().union(*(shingle_set(docs[i]) for i in eval_ids))
    expect = {}
    for i in train_ids:
        s = shingle_set(docs[i])
        shared = len(s & eval_union)
        frac = round(shared / len(s), 6) if s else 0.0
        expect[i] = (len(s), shared, frac, frac <= 0.2)

    train_df = spark.createDataFrame(
        [(i, docs[i]) for i in train_ids], "doc_id long, text string"
    )
    eval_df = spark.createDataFrame(
        [(i, docs[i]) for i in eval_ids], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (
            r["n_shingles"],
            r["n_shared"],
            r["contam_frac"],
            r["keep"],
        )
        for r in contamination(train_df, eval_df, n=n, max_frac=0.2).collect()
    }
    assert got == expect


def test_delta_lifecycle_model_fuzz(spark, tmp_path):
    """Model-based fuzz of the Delta backend: a seeded random
    sequence of append / overwrite / merge / DELETE-WHERE (deletion
    vectors) / add-column / compact / checkpoint / vacuum ops runs
    against BOTH the real table and an in-memory model; after every
    op the snapshot must equal the model, and a random retained
    historical version must equal its recorded model state. Catches
    interaction bugs (evolution then delete then compact then vacuum
    then time travel) no single-op test sees."""
    import random

    from archetype_spark.sources import (
        add_column_delta,
        checkpoint_delta,
        compact_delta,
        delete_where_delta,
        read_delta,
        vacuum_delta,
        write_delta,
    )
    from archetype_spark.sources.delta import _latest_version, resolve_merge

    rng = random.Random(1234)
    t = str(tmp_path / "t")
    cols = ["id", "grp", "val"]
    schema = "id long, grp string, val long"

    def mk_rows(n, id_start):
        return [
            (id_start + i, rng.choice(["a", "b"]), rng.randrange(1000))
            for i in range(n)
        ]

    def widen(rows):
        return [r + (None,) * (len(cols) - len(r)) for r in rows]

    next_id = 0
    model: list[tuple] = []
    history: dict[int, list[tuple]] = {}  # version -> model snapshot

    rows = mk_rows(4, next_id)
    next_id += 4
    write_delta(spark.createDataFrame(rows, schema), t, partition_by=["grp"])
    model = list(rows)
    history[_latest_version(t)] = list(model)
    evolved = False

    def sdf(rows):
        s = schema + (", extra double" if evolved else "")
        return spark.createDataFrame(rows, s)

    for step in range(14):
        op = rng.choice(
            ["append", "append", "overwrite", "merge", "delete", "evolve",
             "compact", "checkpoint", "vacuum"]
        )
        if op == "append":
            rows = mk_rows(rng.randrange(1, 4), next_id)
            next_id += len(rows)
            if evolved:
                rows = [r + (float(r[0]),) for r in rows]
            write_delta(sdf(rows), t, mode="append")
            model += rows
        elif op == "overwrite":
            rows = mk_rows(rng.randrange(1, 5), next_id)
            next_id += len(rows)
            if evolved:
                rows = [r + (float(r[0]),) for r in rows]
            write_delta(sdf(rows), t, mode="overwrite")
            model = list(rows)
        elif op == "merge":
            if not model:
                continue
            # update one existing key, insert one new
            upd_key = rng.choice(model)[0]
            urows = [
                (upd_key, "z", 777) + ((7.0,) if evolved else ()),
                (next_id, "z", 888) + ((8.0,) if evolved else ()),
            ]
            next_id += 1
            merged = resolve_merge(
                read_delta(spark, t), sdf(urows), ["id"]
            )
            write_delta(merged, t, mode="overwrite")
            model = [r for r in _pad(model, evolved) if r[0] != upd_key] + urows
        elif op == "delete":
            if not model:
                continue
            key = rng.choice(model)[0]
            out = delete_where_delta(spark, t, f"id = {key}")
            assert out["rows_deleted"] == sum(
                1 for r in model if r[0] == key
            ), f"step {step}: {out}"
            model = [r for r in model if r[0] != key]
        elif op == "evolve" and not evolved:
            add_column_delta(t, "extra", "double")
            cols.append("extra")
            evolved = True
            model = _pad(model, True)
        elif op == "compact":
            compact_delta(spark, t, target_files=1, sort_by=["id"])
        elif op == "checkpoint":
            checkpoint_delta(t)
        elif op == "vacuum":
            vacuum_delta(t)
            history.clear()  # versions referencing removed files are gone
        else:
            continue
        model = _pad(model, evolved)
        v = _latest_version(t)
        history[v] = list(model)
        got = sorted(tuple(r) for r in read_delta(spark, t).collect())
        assert got == sorted(model), f"step {step} op {op}: {got} != {sorted(model)}"
        # a random retained recorded version must match its model
        if history and rng.random() < 0.5:
            hv = rng.choice(sorted(history))
            hgot = sorted(
                tuple(r)[: len(history[hv][0]) if history[hv] else None]
                for r in read_delta(spark, t, version=hv).collect()
            )
            want = sorted(
                tuple(r)[: len(hgot[0]) if hgot else None] for r in history[hv]
            )
            assert hgot == want, f"time travel v{hv} after {op}"


def _pad(rows, evolved):
    width = 4 if evolved else 3
    return [tuple(r) + (None,) * (width - len(r)) for r in rows]


import pytest


@pytest.mark.parametrize("v3", [False, True])
def test_iceberg_lifecycle_model_fuzz(spark, tmp_path, v3):
    """The Iceberg mirror of the Delta lifecycle fuzz: random
    append / overwrite / merge / DELETE-WHERE / evolve / compact /
    expire+vacuum / streaming-batch sequences vs the in-memory model.
    Time travel here reads with the CURRENT schema (documented
    add_column behavior), so historical comparisons pad the recorded
    model to the current width. The v3 leg (r14) runs the SAME seeded
    sequence on an upgraded table, so every DELETE lands as a puffin
    deletion vector (with the merge-and-supersede replace rule under
    compaction/retention interleavings) and row lineage advances —
    the model must not see any difference."""
    import random

    from archetype_spark.sources import (
        add_column_iceberg,
        compact_iceberg,
        delete_where_iceberg,
        expire_snapshots_iceberg,
        read_iceberg,
        snapshots_iceberg,
        streaming_iceberg_sink,
        vacuum_iceberg,
        write_iceberg,
    )
    from archetype_spark.sources.delta import resolve_merge
    from archetype_spark.sources.iceberg import merge_iceberg

    rng = random.Random(4321)
    t = str(tmp_path / "t")
    # r15: a nested column rides the whole lifecycle — every op
    # (merge, DV delete, compact, stream, time travel) must carry
    # array values byte-faithfully through the nested-typed writer
    schema = "id long, grp string, val long, tags array<long>"

    def _pad(rows, evolved):  # shadows the 3-wide module helper
        width = 5 if evolved else 4
        return [tuple(r) + (None,) * (width - len(r)) for r in rows]

    def mk_rows(n, id_start):
        return [
            (
                id_start + i,
                rng.choice(["a", "b"]),
                rng.randrange(1000),
                [id_start + i, rng.randrange(10)],
            )
            for i in range(n)
        ]

    next_id = 0
    evolved = False

    def sdf(rows):
        s = schema + (", extra double" if evolved else "")
        return spark.createDataFrame(rows, s)

    rows = mk_rows(4, next_id)
    next_id += 4
    write_iceberg(sdf(rows), t, partition_by=["grp"])
    if v3:
        from archetype_spark.sources.iceberg import upgrade_iceberg

        upgrade_iceberg(t, 3)
    model = list(rows)
    history = {snapshots_iceberg(t)[-1]["snapshot-id"]: list(model)}
    sink = streaming_iceberg_sink(t, app_id="fuzz")
    batch = 0

    for step in range(14):
        op = rng.choice(
            ["append", "append", "overwrite", "merge", "delete", "evolve",
             "compact", "retention", "stream"]
        )
        if op == "append" or op == "stream":
            rows = mk_rows(rng.randrange(1, 4), next_id)
            next_id += len(rows)
            if evolved:
                rows = [r + (float(r[0]),) for r in rows]
            if op == "append":
                write_iceberg(sdf(rows), t, mode="append")
            else:
                sink(sdf(rows), batch)
                batch += 1
            model += rows
        elif op == "overwrite":
            rows = mk_rows(rng.randrange(1, 5), next_id)
            next_id += len(rows)
            if evolved:
                rows = [r + (float(r[0]),) for r in rows]
            write_iceberg(sdf(rows), t, mode="overwrite")
            model = list(rows)
        elif op == "merge":
            if not model:
                continue
            upd_key = rng.choice(model)[0]
            urows = [
                (upd_key, "z", 777, [upd_key]) + ((7.0,) if evolved else ()),
                (next_id, "z", 888, [next_id]) + ((8.0,) if evolved else ()),
            ]
            next_id += 1
            merge_iceberg(spark, t, sdf(urows), keys=["id"])
            model = [r for r in _pad(model, evolved) if r[0] != upd_key] + urows
        elif op == "delete":
            if not model:
                continue
            key = rng.choice(model)[0]
            out = delete_where_iceberg(spark, t, f"id = {key}")
            assert out["rows_deleted"] == sum(
                1 for r in model if r[0] == key
            ), f"step {step}: {out}"
            model = [r for r in model if r[0] != key]
        elif op == "evolve" and not evolved:
            add_column_iceberg(t, "extra", "double")
            evolved = True
            model = _pad(model, True)
        elif op == "compact":
            compact_iceberg(spark, t, target_files=1, sort_by=["id"])
        elif op == "retention":
            expire_snapshots_iceberg(t, keep_last=1)
            vacuum_iceberg(t)
            history.clear()
        else:
            continue
        model = _pad(model, evolved)
        history[snapshots_iceberg(t)[-1]["snapshot-id"]] = list(model)
        got = sorted(tuple(r) for r in read_iceberg(spark, t).collect())
        assert got == sorted(model), f"step {step} op {op}"
        retained = {s["snapshot-id"] for s in snapshots_iceberg(t)}
        checkable = sorted(set(history) & retained)
        if checkable and rng.random() < 0.5:
            hv = rng.choice(checkable)
            hgot = sorted(
                tuple(r) for r in read_iceberg(spark, t, snapshot_id=hv).collect()
            )
            # current-schema read: pad the recorded model to width
            want = sorted(_pad(history[hv], evolved))
            assert hgot == want, f"time travel snap {hv} after {op}"


def test_hudi_mor_lifecycle_model_fuzz(spark, tmp_path):
    """The Hudi MERGE_ON_READ mirror of the lake lifecycle fuzzes: a
    seeded random sequence of upsert (log blocks) / fresh-key insert /
    delete-by-key (delete blocks) / compaction / clustering runs
    against BOTH the real table and a dict model; after every op the
    merged snapshot must equal the model, a random recorded instant
    must time-travel to its model state, and the metadata-only count
    must agree. Catches chain-interaction bugs (delete then re-upsert
    then compact then cluster then time travel) no single-op test
    sees. r14 adds 'archive' to the op mix: timeline archival is pure
    metadata movement, so the model is UNCHANGED by it — snapshot,
    time travel (including to archived instants) and metadata counts
    must all read identically after any archive point."""
    import random

    from archetype_spark.sources.hudi import (
        archive_hudi,
        cluster_hudi,
        compact_hudi,
        count_rows_hudi,
        delete_by_key_hudi,
        hudi_timeline,
        read_hudi,
        upsert_hudi,
        write_hudi,
    )

    import datetime as _dt

    rng = random.Random(20260816)
    t = str(tmp_path / "t")
    # r15: a struct-nested timestamp rides every op — log blocks,
    # delete/compact/cluster/archive and time travel must carry the
    # epoch wire conversion through the container at each step
    schema = "id long, grp string, val long, ev struct<at:timestamp,n:long>"

    def mk_rows(n, id_start):
        return [
            (
                id_start + i,
                rng.choice(["a", "b"]),
                rng.randrange(1000),
                (
                    _dt.datetime(2024, 1, 1)
                    + _dt.timedelta(minutes=rng.randrange(100000)),
                    id_start + i,
                ),
            )
            for i in range(n)
        ]

    next_id = 0
    rows = mk_rows(5, next_id)
    next_id += 5
    write_hudi(
        spark.createDataFrame(rows, schema), t, record_key="id",
        partition_by="grp", buckets=2, table_type="MERGE_ON_READ",
    )
    model = {r[0]: r for r in rows}
    history = {hudi_timeline(t)[-1]: dict(model)}

    def check(step, op):
        got = sorted(
            tuple(r)
            for r in read_hudi(spark, t).select("id", "grp", "val", "ev").collect()
        )
        want = sorted(model.values())
        assert got == want, f"step {step} op {op}: {got} != {want}"
        assert count_rows_hudi(t) == len(model), f"step {step} op {op} count"
        instant = hudi_timeline(t)[-1]
        history[instant] = dict(model)
        if history and rng.random() < 0.5:
            hv = rng.choice(sorted(history))
            hgot = sorted(
                tuple(r)
                for r in read_hudi(spark, t, as_of=hv)
                .select("id", "grp", "val", "ev")
                .collect()
            )
            assert hgot == sorted(history[hv].values()), (
                f"time travel {hv} after step {step} op {op}"
            )

    for step in range(12):
        op = rng.choice(
            ["upsert", "upsert", "insert", "delete", "delete",
             "compact", "cluster", "archive"]
        )
        if op == "upsert":
            if not model:
                continue
            keys = rng.sample(sorted(model), min(2, len(model)))
            urows = [
                (
                    k,
                    model[k][1],
                    rng.randrange(1000),
                    (
                        _dt.datetime(2024, 1, 1)
                        + _dt.timedelta(minutes=rng.randrange(100000)),
                        k,
                    ),
                )
                for k in keys
            ]
            upsert_hudi(
                spark, t, spark.createDataFrame(urows, schema)
            )
            for r in urows:
                model[r[0]] = r
        elif op == "insert":
            rows = mk_rows(rng.randrange(1, 3), next_id)
            next_id += len(rows)
            write_hudi(
                spark.createDataFrame(rows, schema), t,
                record_key="id", mode="insert",
            )
            for r in rows:
                model[r[0]] = r
        elif op == "delete":
            if not model:
                continue
            key = rng.choice(sorted(model))
            delete_by_key_hudi(
                spark, t, spark.createDataFrame([(key,)], "id long")
            )
            del model[key]
        elif op == "compact":
            out = compact_hudi(spark, t)
            if out["instant"] is None:
                continue  # nothing to fold; no new instant
            # read-optimized == snapshot right after compaction
            ro = sorted(
                tuple(r)
                for r in read_hudi(spark, t, read_optimized=True)
                .select("id", "grp", "val", "ev")
                .collect()
            )
            assert ro == sorted(model.values()), f"step {step} RO"
        elif op == "cluster":
            try:
                cluster_hudi(spark, t, buckets=1)
            except NotImplementedError:
                continue  # pending logs: the declared refusal
        elif op == "archive":
            out = archive_hudi(t, keep_last=2)
            if out["archived"] == 0:
                continue  # nothing old enough; no state change
            # archival adds no instant: verify against the CURRENT
            # model immediately (check() would log a new history key)
            got = sorted(
                tuple(r)
                for r in read_hudi(spark, t)
                .select("id", "grp", "val", "ev")
                .collect()
            )
            assert got == sorted(model.values()), f"step {step} archive"
            # every recorded instant must still time-travel exactly,
            # including the ones whose metadata just moved
            hv = rng.choice(sorted(history))
            hgot = sorted(
                tuple(r)
                for r in read_hudi(spark, t, as_of=hv)
                .select("id", "grp", "val", "ev")
                .collect()
            )
            assert hgot == sorted(history[hv].values()), (
                f"archived time travel {hv} at step {step}"
            )
            continue
        check(step, op)
