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


def test_signcode_topk_recall_and_plan(spark, sf_dir):
    """Candidates must block on the (band, code) equi-join (no
    cartesian), scores must equal the exact cosine for emitted pairs,
    and top-1 recall vs exact brute force is measured, not assumed —
    a single 4-bit code recalls ~0.12 on this corpus (~2x chance);
    4-band OR-amplification must lift it well past that."""
    from pyspark.sql import functions as F

    from archetype_spark.operators import projections, similarity
    from archetype_spark.plans import formatted_plan
    from archetype_spark.tables import load

    emb = load(spark, sf_dir, "embeddings")
    approx = projections.signcode_topk(emb, k=3, code_bits=4)
    plan = formatted_plan(approx)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    got = approx.collect()
    exact = {
        (r["vec_id"], r["other_vec_id"]): r["cos_sim"]
        for r in similarity.topk_bruteforce(emb, k=5).collect()
    }
    ex1 = {
        r["vec_id"]: r["other_vec_id"]
        for r in similarity.topk_bruteforce(emb, k=1).collect()
    }
    ap = {}
    for r in got:
        ap.setdefault(r["vec_id"], set()).add(r["other_vec_id"])
    # scores agree with the exact kernel on emitted pairs (spot-check
    # via the brute-force table where the pair appears there too)
    for r in got[:50]:
        key = (r["vec_id"], r["other_vec_id"])
        if key in exact:
            assert abs(r["cos_sim"] - exact[key]) < 1e-9
    # note: topk_bruteforce pairs are undirected (vec_id < other);
    # recall counts a hit if the exact top-1 appears in the approx
    # candidate set of the query vector
    hits = sum(1 for v, o in ex1.items() if o in ap.get(v, set()))
    recall = hits / len(ex1)
    assert recall > 0.25, recall


def test_exact_pairs_budget_gate(spark, sf_dir):
    """ADVICE r7: the candidate re-score stage must drop its broadcast
    hint past the budget and degrade to id-keyed shuffle joins with
    identical values — signcode_topk's comment now matches the code."""
    from pyspark.sql import functions as F

    from archetype_spark.operators import similarity
    from archetype_spark.plans import formatted_plan
    from archetype_spark.tables import load

    emb = load(spark, sf_dir, "embeddings")
    cand = (
        emb.select(F.col("vec_id").alias("_cand_a"))
        .withColumn("_cand_b", F.col("_cand_a") + 1)
        .join(
            emb.select(F.col("vec_id").alias("_cand_b")),
            "_cand_b",
            "semi",
        )
    )
    hinted = similarity._exact_pairs_from_candidates(
        emb, cand, "vec_id", "embedding"
    )
    gated = similarity._exact_pairs_from_candidates(
        emb, cand, "vec_id", "embedding", max_bytes=0
    )
    # disable Catalyst's own size-based auto-broadcast so the plans
    # show exactly what the HINT decides (at 100 TB the stats exceed
    # the auto threshold anyway — this is the at-scale picture)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        assert "BroadcastHashJoin" in formatted_plan(hinted)
        assert "BroadcastHashJoin" not in formatted_plan(gated)
        a = {tuple(r) for r in hinted.collect()}
        b = {tuple(r) for r in gated.collect()}
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert a == b and len(a) > 0
