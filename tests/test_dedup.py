"""Property tests for the approximate dedup/similarity family —
the operators whose hash families aren't portable to the DuckDB
oracle (q40-q42 rows-only checks point here).

Invariants:
- MinHash est_jaccard approximates exact n-gram Jaccard (bounded
  error on candidate pairs; high-similarity pairs are found).
- LSH top-k achieves recall >= 0.8 of brute-force top-k.
- SimHash candidates respect the hamming bound by construction.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from archetype_spark.operators import dedup, similarity
from archetype_spark.tables import load

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return load(spark, SF, "documents")


@pytest.fixture(scope="module")
def emb(spark):
    return load(spark, SF, "embeddings")


def test_minhash_estimates_jaccard(spark, docs):
    exact = dedup.ngram_jaccard_pairs(docs, threshold=0.0).withColumnRenamed(
        "jaccard", "exact_j"
    )
    est = dedup.minhash_lsh_pairs(docs, threshold=0.0)
    joined = est.join(exact, ["doc_id", "other_doc_id"]).collect()
    assert joined, "no candidate pairs to compare"
    errs = [abs(r["est_jaccard"] - r["exact_j"]) for r in joined]
    # 64 hashes -> stderr ~ sqrt(j(1-j)/64) <= 0.0625; allow 4 sigma
    assert max(errs) < 0.25, max(errs)
    assert sum(errs) / len(errs) < 0.08


def test_minhash_finds_high_jaccard_pairs(spark, docs):
    """Every pair with exact jaccard >= 0.7 must be an LSH candidate
    (16 bands x 4 rows: P[miss] = (1-j^4)^16 <= 0.013 at j=0.7; the
    deterministic corpus has no pair in the unlucky tail)."""
    exact = dedup.ngram_jaccard_pairs(docs, threshold=0.7)
    cand = dedup.minhash_lsh_pairs(docs, threshold=0.0).select(
        "doc_id", "other_doc_id"
    )
    missed = exact.join(cand, ["doc_id", "other_doc_id"], "left_anti").count()
    assert missed == 0


def test_lsh_finds_planted_near_dups(spark, emb):
    """Sign-bit LSH must recover planted high-cosine pairs.

    Recall@k against ALL brute-force neighbors is the wrong property
    for this corpus: the embeddings are random and near-orthogonal
    (max pairwise cosine ~0.5), so a vector's 5th-nearest neighbor is
    barely closer than any other — no LSH family can find those, by
    design. What LSH promises is collision for genuinely close pairs,
    so we plant them: a jittered copy of each corpus vector
    (cos ~0.995; per 8-plane table P[collide] = (1-theta/pi)^8 ~ 0.77,
    so 6 tables miss with p ~ 1.5e-4)."""
    import numpy as np

    rows = emb.select("vec_id", "embedding").collect()
    dim = len(rows[0]["embedding"])
    rng = np.random.default_rng(7)
    planted = []
    for r in rows:
        v = np.array(r["embedding"], dtype=np.float64)
        v2 = v + 0.05 * np.linalg.norm(v) / np.sqrt(dim) * rng.standard_normal(dim)
        planted.append((int(r["vec_id"]) + 100000, [float(x) for x in v2]))
    both = emb.select("vec_id", "embedding").unionByName(
        spark.createDataFrame(planted, emb.select("vec_id", "embedding").schema)
    )
    approx = similarity.lsh_topk(both, dim=dim, k=5, n_planes=8, n_tables=6)
    found = {(r["vec_id"], r["other_vec_id"]) for r in approx.collect()}
    expected = {(int(r["vec_id"]), int(r["vec_id"]) + 100000) for r in rows}
    recall = len(expected & found) / len(expected)
    assert recall >= 0.9, recall


def test_ivf_finds_planted_near_dups(spark, emb):
    """IVF must place a vector and its jittered copy in the same
    k-means cell (they're ~identical, so they quantize together) and
    rank the copy first — same planted-pair protocol as the LSH test."""
    import numpy as np

    rows = emb.select("vec_id", "embedding").collect()
    dim = len(rows[0]["embedding"])
    rng = np.random.default_rng(11)
    planted = []
    for r in rows:
        v = np.array(r["embedding"], dtype=np.float64)
        v2 = v + 0.05 * np.linalg.norm(v) / np.sqrt(dim) * rng.standard_normal(dim)
        planted.append((int(r["vec_id"]) + 100000, [float(x) for x in v2]))
    both = emb.select("vec_id", "embedding").unionByName(
        spark.createDataFrame(planted, emb.select("vec_id", "embedding").schema)
    )
    approx = similarity.ivf_topk(both, k=5, n_clusters=8, n_probe=3)
    found = {(r["vec_id"], r["other_vec_id"]) for r in approx.collect()}
    expected = {(int(r["vec_id"]), int(r["vec_id"]) + 100000) for r in rows}
    recall = len(expected & found) / len(expected)
    assert recall >= 0.9, recall


def test_simhash_hamming_bound(spark, docs):
    pairs = dedup.simhash_dup_pairs(docs, max_hamming=3).collect()
    assert all(r["hamming"] <= 3 for r in pairs)


def test_ingest_dedup_idempotent(spark, tmp_path):
    """ingest_dedup appends only never-seen fingerprints; re-ingesting
    any already-seen batch appends nothing (idempotent ingest)."""
    tbl = str(tmp_path / "docs_tbl")
    b1 = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "delta epsilon"), (3, "ALPHA  beta gamma")],
        "doc_id long, text string",
    )
    first = dedup.ingest_dedup(spark, b1, tbl)
    # doc 3 normalizes to doc 1's text -> in-batch collapsed to min id
    assert sorted(r["doc_id"] for r in first.collect()) == [1, 2]

    again = dedup.ingest_dedup(spark, b1, tbl)
    assert again.count() == 0
    assert spark.read.parquet(tbl).count() == 2

    b2 = spark.createDataFrame(
        [(4, "delta epsilon"), (5, "zeta eta")], "doc_id long, text string"
    )
    second = dedup.ingest_dedup(spark, b2, tbl)
    assert [r["doc_id"] for r in second.collect()] == [5]
    final = spark.read.parquet(tbl)
    assert sorted(r["doc_id"] for r in final.collect()) == [1, 2, 5]
    # portable family writes the oracle-reproducible fingerprint
    tbl_p = str(tmp_path / "docs_tbl_p")
    dedup.ingest_dedup(spark, b1, tbl_p, portable=True)
    got = {r["doc_id"]: r["fingerprint"] for r in spark.read.parquet(tbl_p).collect()}
    import duckdb

    exp = dict(
        duckdb.sql(
            "SELECT doc_id, CAST(('0x' || substr(sha256(lower(regexp_replace(text, '\\s+', ' ', 'g'))), 1, 15))::UBIGINT AS BIGINT)"
            " FROM (VALUES (1, 'alpha beta gamma'), (2, 'delta epsilon')) t(doc_id, text)"
        ).fetchall()
    )
    assert got == exp


def _py_jaccard_pairs(texts: dict[int, str], n: int, max_df: int | None):
    """Pure-Python reference: exact Jaccard over distinct n-gram
    shingles, optionally over the stop-shingle-reduced universe."""
    sh = {
        i: {
            " ".join(w[k : k + n])
            for k in range(len(w) - n + 1)
        }
        for i, t in texts.items()
        for w in [t.split(" ")]
    }
    if max_df is not None:
        df_count: dict[str, int] = {}
        for s in sh.values():
            for g in s:
                df_count[g] = df_count.get(g, 0) + 1
        sh = {i: {g for g in s if df_count[g] <= max_df} for i, s in sh.items()}
    out = {}
    ids = sorted(sh)
    for i in ids:
        for j in ids:
            if i < j and sh[i] & sh[j]:
                inter = len(sh[i] & sh[j])
                out[(i, j)] = round(inter / (len(sh[i]) + len(sh[j]) - inter), 6)
    return out


def test_stop_shingle_filtering_matches_reference(spark):
    """max_shingle_df drops boilerplate shingles from the whole
    universe: pairs sharing ONLY boilerplate vanish, surviving pairs
    score Jaccard over the reduced sets — pinned against a
    pure-Python reference implementation."""
    texts = {
        1: "the quick fox a b c d",
        2: "the quick fox a b c e",
        3: "the quick fox x y z w",
        4: "the quick fox p q r s",
    }
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    got_all = {
        (r["doc_id"], r["other_doc_id"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(df, n=3, threshold=0.0).collect()
    }
    assert got_all == _py_jaccard_pairs(texts, 3, None)
    # boilerplate trigram appears in all 4 docs -> dropped at max_df=3
    got = {
        (r["doc_id"], r["other_doc_id"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(
            df, n=3, threshold=0.0, max_shingle_df=3
        ).collect()
    }
    expect = _py_jaccard_pairs(texts, 3, 3)
    assert got == expect
    # the boilerplate-only pairs are exactly the ones that vanished
    assert set(got_all) - set(got) == {(1, 3), (1, 4), (2, 3), (2, 4), (3, 4)}


def test_containment_catches_subset_dup_jaccard_misses(spark):
    """A short doc fully embedded in a long one: containment of the
    short side ~1 while Jaccard stays below a dedup threshold."""
    from archetype_spark.operators import dedup

    short = "alpha beta gamma delta epsilon"
    longdoc = short + " " + " ".join(f"w{i}" for i in range(40))
    df = spark.createDataFrame(
        [(1, short), (2, longdoc)], "doc_id int, text string"
    )
    pairs = dedup.containment_pairs(df, n=3, threshold=0.9).collect()
    assert len(pairs) == 1
    r = pairs[0]
    assert (r["doc_id"], r["other_doc_id"]) == (1, 2)
    assert r["containment"] == 1.0          # short fully inside long
    assert r["other_containment"] < 0.2     # long barely covered
    jac = dedup.ngram_jaccard_pairs(df, n=3, threshold=0.5).collect()
    assert jac == []                         # Jaccard misses it


def test_minhash_containment_classifies_pair_type(spark, tmp_path):
    """Exact duplicates score est_jaccard 1.0 and both containments
    1.0; a moderate-overlap pair's containment estimates follow the
    m-based algebra exactly."""
    from archetype_spark.operators import ann_index, dedup

    base = " ".join(f"w{i}" for i in range(40))
    rows = [
        (1, base),
        (2, base),                                       # exact dup of 1
        (3, base + " " + " ".join(f"x{i}" for i in range(12))),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    sigs = ann_index.ensure_minhash(
        df, str(tmp_path / "mh"), num_hashes=64, shingle_n=3,
        hash_family="xxhash64",
    )
    out = {
        (r["doc_id"], r["other_doc_id"]): r.asDict()
        for r in dedup.minhash_containment_from_signatures(sigs, df).collect()
    }
    assert out[(1, 2)]["est_jaccard"] == 1.0
    assert out[(1, 2)]["est_containment"] == 1.0
    assert out[(1, 2)]["other_est_containment"] == 1.0
    for (a, b), r in out.items():
        if a == 3 or b == 3:
            # superset doc 3: the smaller side's containment must
            # exceed the symmetric jaccard estimate
            assert max(
                r["est_containment"], r["other_est_containment"]
            ) > r["est_jaccard"]


def test_shingles_null_text_is_empty_array(spark):
    """shingles(NULL) must return [] (the pre-r16 contract), not NULL:
    F.size() consumers (minhash set size, ann n_sh, containment and
    Jaccard denominators) rely on 0 for NULL/short text (ADVICE r16)."""
    from archetype_spark.functions.text import shingles

    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "a b"), (4, "a b c d")],
        "doc_id long, text string",
    ).select("doc_id", shingles("text", 3).alias("sh"), F.size(shingles("text", 3)).alias("n"))
    got = {r["doc_id"]: (r["sh"], r["n"]) for r in df.collect()}
    assert got[1] == ([], 0)
    assert got[2] == ([], 0)
    assert got[3] == ([], 0)  # shorter than n
    assert got[4] == (["a b c", "b c d"], 2)
