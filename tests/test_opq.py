"""OPQ-lite (similarity/opq): eigenvalue allocation balance, exact
cosine preservation under the rotation, measured recall DOMINANCE
over plain PQ on a correlated corpus (the entire point), full-refine
equality with brute force, and the filtered path."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from etl_data_lake_spark.similarity.bruteforce import cosine_topk
from etl_data_lake_spark.similarity.opq import (
    allocate_eigenvalues,
    fit_rotation,
    opq_topk,
    rotate_vectors,
)
from etl_data_lake_spark.similarity.pq import pq_topk


@pytest.fixture(scope="module")
def correlated(spark):
    """Rank-8 latent factors mixed across all 64 dims — every raw PQ
    slice straddles the same shared variance, the corpus shape OPQ
    exists for."""
    rng = np.random.default_rng(11)
    mix = rng.normal(size=(8, 64))
    Z = rng.normal(size=(600, 8))
    X = Z @ mix + rng.normal(scale=0.05, size=(600, 64))
    rows = [(i, [float(v) for v in X[i]]) for i in range(600)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _pairs(df):
    return {(r.query_id, r.neighbor_id) for r in df.collect()}


def _rows(df):
    return sorted(
        (r.query_id, r.neighbor_id, r.cos_sim, r.rank) for r in df.collect()
    )


def test_allocation_spreads_top_eigenvalues():
    """One of the m largest eigenvalues lands in EVERY bucket — the
    degenerate bare greedy (all λ < 1 ⇒ first bucket swallows the top
    of the spectrum) is exactly what this pins against."""
    ev = np.array([0.17, 0.16, 0.14, 0.12, 0.12, 0.11, 0.10, 0.06] + [1e-5] * 56)
    order = allocate_eigenvalues(ev, 8).reshape(8, 8)
    # bucket-major: each bucket's first assignment is one of dims 0..7
    assert sorted(int(b[0]) for b in order) == list(range(8))
    # capacity exact, permutation total
    assert sorted(order.reshape(-1).tolist()) == list(range(64))
    with pytest.raises(ValueError, match="divisible"):
        allocate_eigenvalues(ev, 7)


def test_allocation_scale_invariant():
    rng = np.random.default_rng(5)
    ev = rng.uniform(0.001, 0.4, size=64)
    a = allocate_eigenvalues(ev, 8)
    b = allocate_eigenvalues(ev * 1e6, 8)
    assert np.array_equal(a, b)


def test_rotation_is_orthonormal(spark, correlated):
    R = fit_rotation(correlated, m=8)
    assert R.shape == (64, 64)
    assert np.allclose(R @ R.T, np.eye(64), atol=1e-10)


def test_rotation_preserves_cosines_exactly(spark, correlated):
    R = fit_rotation(correlated, m=8)
    sub = correlated.where(F.col("vec_id") < 40)
    orig = {r.vec_id: np.array(r.embedding) for r in sub.collect()}
    rot = {
        r.vec_id: np.array(r.embedding)
        for r in rotate_vectors(sub, R).collect()
    }

    def cos(d, i, j):
        a, b = d[i], d[j]
        return a @ b / (np.linalg.norm(a) * np.linalg.norm(b))

    ids = sorted(orig)
    for i in ids[:10]:
        for j in ids[10:20]:
            assert abs(cos(orig, i, j) - cos(rot, i, j)) < 1e-12


def test_rotation_keeps_metadata_columns(spark, correlated):
    R = fit_rotation(correlated, m=8)
    with_meta = correlated.withColumn("lang", F.lit("en"))
    out = rotate_vectors(with_meta, R)
    assert set(out.columns) == {"vec_id", "embedding", "lang"}
    assert out.where(F.col("lang") == "en").count() == correlated.count()


def test_opq_dominates_pq_on_correlated_corpus(spark, correlated):
    """The measured gap (0.82 → 0.985 at m=8/ks=16/refine 2) pinned
    with margin: the rotation must BEAT plain PQ, not just match it —
    otherwise the module is overhead."""
    queries = correlated.where(F.col("vec_id") < 20)
    exact = _pairs(cosine_topk(correlated, queries, k=10))

    def recall(df):
        got = _pairs(df)
        return len(got & exact) / len(exact)

    r_pq = recall(pq_topk(correlated, queries, k=10, m=8, ks=16, refine_factor=2))
    r_opq = recall(opq_topk(correlated, queries, k=10, m=8, ks=16, refine_factor=2))
    assert r_opq >= 0.9, r_opq
    assert r_opq > r_pq, (r_opq, r_pq)


def test_full_refine_is_exact_and_rotation_reusable(spark, correlated):
    queries = correlated.where(F.col("vec_id") < 5)
    n = correlated.count()
    exact = _rows(cosine_topk(correlated, queries, k=10))
    full = _rows(
        opq_topk(correlated, queries, k=10, m=8, ks=16, refine_factor=n)
    )
    assert full == exact
    R = fit_rotation(correlated, m=8)
    again = _rows(
        opq_topk(
            correlated, queries, k=10, m=8, ks=16, refine_factor=n, rotation=R
        )
    )
    assert again == exact


def test_filtered_query_matches_filtered_exact(spark, correlated):
    pred = F.col("vec_id") % 3 == 0
    queries = correlated.where(F.col("vec_id") < 5)
    n = correlated.count()
    got = _rows(
        opq_topk(
            correlated, queries, k=8, m=8, ks=16,
            refine_factor=n, predicate=pred,
        )
    )
    want = _rows(cosine_topk(correlated.where(pred), queries, k=8))
    assert got == want and len(got) > 0
    assert all(nid % 3 == 0 for _, nid, _, _ in got)


def test_empty_corpus_rotation_rejected(spark, correlated):
    with pytest.raises(ValueError, match="empty corpus"):
        fit_rotation(correlated.where(F.col("vec_id") < 0), m=8)
    with pytest.raises(ValueError, match="square"):
        rotate_vectors(correlated, np.ones((3, 4)))
