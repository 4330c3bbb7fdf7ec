"""Deterministic random projection of embedding columns — the
dimensionality-reduction pre-step of a large-scale similarity stack
(project 64-dim vectors to k dims before LSH/IVF candidate
generation; Johnson-Lindenstrauss distance preservation with a
sign-matrix, Achlioptas 2003).

Design constraints, in order:

1. **Portable determinism.** The projection matrix is derived from
   sha256 of "rp:<seed>:<d>:<j>" — any engine reproduces the exact
   matrix from the seed alone, so a DuckDB oracle (or a future
   re-ingest on different hardware) replays the projection
   bit-for-bit. No RNG state is stored or shipped.
2. **Integer exactness.** Inputs quantize to integer micro-units
   (round(x * 1e6), DuckDB ROUND half-away-from-zero semantics,
   mirrored exactly below) and the projection is an INTEGER
   sign-sum — no float accumulation, so the result is
   order-independent and identical across engines, batch sizes and
   partitionings. (A float dot product differs in the last ulp by
   summation order — the q57 lesson, solved the same way: micro-unit
   integers.)
3. **Narrow at scale.** The production path is one Arrow-batched
   mapInPandas GEMM per partition (int64 matmul against the k×d sign
   matrix) — zero shuffles, zero joins; the matrix is rebuilt from
   the seed inside each worker (512 ints — cheaper to rederive than
   to broadcast).

The reference's stack delegates vector indexing to LanceDB, which
applies (opaque, trained) PQ transforms to the same end; this is the
engine-portable, seed-reproducible counterpart.
"""

from __future__ import annotations

import hashlib
import sys

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # pyspark vendors cloudpickle; plain cloudpickle as fallback
    from pyspark.cloudpickle import register_pickle_by_value
except ImportError:  # pragma: no cover
    from cloudpickle import register_pickle_by_value

register_pickle_by_value(sys.modules[__name__])


def sign_matrix(dim: int, k: int, seed: int = 0) -> np.ndarray:
    """The (dim, k) ±1 matrix: entry (d, j) is +1 iff the first hex
    nibble of sha256('rp:<seed>:<d>:<j>') is even. DuckDB computes the
    identical entry as
    ('0x' || substr(sha256('rp:<seed>:' || d || ':' || j), 1, 1))
    ::UBIGINT % 2 = 0."""
    m = np.empty((dim, k), dtype=np.int64)
    for d in range(dim):
        for j in range(k):
            nib = hashlib.sha256(f"rp:{seed}:{d}:{j}".encode()).hexdigest()[0]
            m[d, j] = 1 if int(nib, 16) % 2 == 0 else -1
    return m


def _quantize(x: np.ndarray) -> np.ndarray:
    """round(x * 1e6) with DuckDB ROUND semantics (half away from
    zero), as exact int64."""
    scaled = x.astype(np.float64) * 1e6
    return np.where(
        scaled >= 0, np.floor(scaled + 0.5), np.ceil(scaled - 0.5)
    ).astype(np.int64)


def random_sign_projection(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    seed: int = 0,
) -> DataFrame:
    """Project `vec_col` (array<float>) to k integer dimensions:
    proj[j] = sum_d round(vec[d] * 1e6) * sign(d, j). Returns
    (id_col, proj: array<bigint>) — micro-unit scale; divide by 1e6
    (and 1/sqrt(k) if unit-norm JL scaling is wanted) downstream.

    One narrow mapInPandas stage; the plan adds no exchange, so the
    projection fuses onto whatever scan/stage already reads the
    vectors — the shape that matters when this runs ahead of ANN
    indexing over 100 TB of embeddings."""
    out_schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("proj", T.ArrayType(T.LongType(), False), False),
        ]
    )

    def project(batches):
        mat = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            vecs = np.stack(pdf[vec_col].to_numpy())
            if mat is None:
                mat = sign_matrix(vecs.shape[1], k, seed)
            proj = _quantize(vecs) @ mat
            yield pd.DataFrame(
                {id_col: pdf[id_col].to_numpy(), "proj": list(proj)}
            )

    return df.select(id_col, vec_col).mapInPandas(project, schema=out_schema)


def projection_distance_preserved(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    seed: int = 0,
) -> DataFrame:
    """Diagnostic: per-row squared norms in original vs projected
    space (micro-unit scale) for JL-quality eyeballing; E[|Px|^2] =
    k * |x|^2 for a ±1 sign matrix."""
    proj = random_sign_projection(df, id_col, vec_col, k, seed)
    orig = df.select(
        id_col,
        F.aggregate(
            F.transform(
                vec_col, lambda x: (x * 1e6).cast("bigint") * (x * 1e6).cast("bigint")
            ),
            F.lit(0).cast("decimal(38,0)"),
            lambda acc, v: acc + v.cast("decimal(38,0)"),
        ).alias("orig_sq"),
    )
    pr = proj.select(
        id_col,
        F.aggregate(
            F.transform("proj", lambda p: p * p),
            F.lit(0).cast("decimal(38,0)"),
            lambda acc, v: acc + v.cast("decimal(38,0)"),
        ).alias("proj_sq"),
    )
    return orig.join(pr, id_col)
