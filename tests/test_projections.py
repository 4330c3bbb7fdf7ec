"""Random sign projection (operators/projections.py): portable
matrix derivation, DuckDB-exact quantization, integer projection."""

from __future__ import annotations

import numpy as np

from archetype_spark.operators import projections


def test_sign_matrix_deterministic_and_balanced():
    m = projections.sign_matrix(64, 8, seed=0)
    assert m.shape == (64, 8)
    assert set(np.unique(m)) == {-1, 1}
    assert (m == projections.sign_matrix(64, 8, seed=0)).all()
    assert (m != projections.sign_matrix(64, 8, seed=1)).any()
    # sha256 nibble parity is ~uniform: no column collapses to one sign
    col_means = m.mean(axis=0)
    assert (np.abs(col_means) < 0.5).all(), col_means


def test_quantize_matches_duckdb_round_semantics():
    """Half-away-from-zero on the DOUBLE-promoted value — the exact
    contract the oracle's CAST(... AS DOUBLE) multiplication pins."""
    import duckdb

    xs = np.array([0.0000005, -0.0000005, 0.0000015, -0.0000015, 0.1234567],
                  dtype=np.float64)
    got = projections._quantize(xs)
    want = [
        r[0]
        for x in xs
        for r in duckdb.sql(
            f"SELECT CAST(ROUND(CAST({x!r} AS DOUBLE) * 1000000) AS BIGINT)"
        ).fetchall()
    ]
    assert list(got) == want, (list(got), want)


def test_projection_values_and_narrow_plan(spark):
    from archetype_spark.plans import n_exchanges

    rng = np.random.default_rng(42)
    vecs = rng.normal(size=(10, 16)).astype(np.float32)
    rows = [(i, [float(v) for v in vecs[i]]) for i in range(10)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = projections.random_sign_projection(df, k=4, seed=3)
    assert n_exchanges(out) == 0, "projection must add no exchange"
    got = {r["vec_id"]: list(r["proj"]) for r in out.collect()}
    mat = projections.sign_matrix(16, 4, seed=3)
    want = projections._quantize(vecs) @ mat
    for i in range(10):
        assert got[i] == list(want[i]), i


def test_projection_norm_preservation(spark):
    """E[|Px|^2] = k * |x|^2 for the sign matrix — check the
    diagnostic stays within a loose JL band over real-ish vectors."""
    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(200, 64)).astype(np.float32)
    rows = [(i, [float(v) for v in vecs[i]]) for i in range(200)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    d = projections.projection_distance_preserved(df, k=8, seed=0)
    rowvals = d.collect()
    ratio = sum(float(r["proj_sq"]) for r in rowvals) / (
        8 * sum(float(r["orig_sq"]) for r in rowvals)
    )
    assert 0.5 < ratio < 2.0, ratio
