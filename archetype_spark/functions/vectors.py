"""Vector math over array<float> columns as native Column expressions.

The reference stores embeddings as LanceDB vector columns and leans on
Lance's ANN indexes (SURVEY §2.2 multimodal row). Spark has no vector
index, so the primitives live here as whole-stage-codegen'd
higher-order functions — `zip_with`/`aggregate` run inside the JVM on
the array values, no Python crossing, no UDF. At 100 TB these
expressions are the per-row kernel inside a blocked (LSH/IVF) join,
never a bare cross join.

All math is double-precision regardless of the (float32) storage type
so results match a double-computing oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column | str, b: Column | str) -> Column:
    """Double-precision dot product of two equal-length array columns."""
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column | str) -> Column:
    """Euclidean (L2) norm."""
    a = F.col(a) if isinstance(a, str) else a
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; NaN-free for zero vectors (returns NULL)."""
    d = dot(a, b)
    denom = norm(a) * norm(b)
    return F.when(denom > 0, d / denom)


def micro_quantize(a: Column | str, scale: float = 1e6) -> Column:
    """Per-component half-away-from-zero integer quantization
    (round(x * scale) as bigint, DuckDB ROUND semantics — the
    round_like_duckdb rule applied elementwise). Cross-engine float
    determinism primitive: dot products of micro-quantized 64-dim
    vectors are EXACT integers in double (partial sums ≪ 2^53 in any
    summation order), so a cosine computed as dot/(sqrt(nA)*sqrt(nQ))
    from these integers is bit-identical in every IEEE engine —
    no 1-ulp rank boundary exists (the q113 lesson)."""
    from archetype_spark.queries.relational import round_like_duckdb

    a = F.col(a) if isinstance(a, str) else a

    def q(x: Column) -> Column:
        return round_like_duckdb(x.cast("double") * F.lit(float(scale)), 0).cast(
            "bigint"
        )

    return F.transform(a, q)


def cosine_prenormed(dot_col: Column, norm_a: Column, norm_b: Column) -> Column:
    """Cosine from a precomputed dot and per-row norms — use this in
    pairwise joins so each row's norm is computed once, not per pair."""
    denom = norm_a * norm_b
    return F.when(denom > 0, dot_col / denom)
