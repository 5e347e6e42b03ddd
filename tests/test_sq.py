"""Scalar quantization SQ8 (similarity/sq): reconstruction fidelity
within half a quantization level, recall floors against brute force,
exact-equality under full refine, and the filtered-query path — pq's
test shape (round-10 verdict #6)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from etl_data_lake_spark.similarity.bruteforce import cosine_topk
from etl_data_lake_spark.similarity.sq import (
    sq_encode,
    sq_reconstruct,
    sq_topk,
    train_sq,
)
from etl_data_lake_spark.sources.catalog import load_table
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_DIR, "embeddings")


def _rows(df):
    return sorted(
        (r.query_id, r.neighbor_id, r.cos_sim, r.rank)
        for r in df.collect()
    )


def test_bounds_are_exact_normalized_extrema(spark, emb):
    bounds = train_sq(emb)
    rows = emb.select("embedding").collect()
    V = np.array([list(r.embedding) for r in rows], dtype=np.float64)
    V = V / np.linalg.norm(V, axis=1, keepdims=True)
    assert np.allclose(bounds[0], V.min(axis=0))
    assert np.allclose(bounds[1], V.max(axis=0))


def test_reconstruction_within_half_level(spark, emb):
    """Per-dimension |reconstructed - normalized| <= span/510 + eps —
    the fidelity bound that makes SQ8 an archival codec, not just a
    scoring trick (PQ has no per-component bound at all)."""
    bounds = train_sq(emb)
    span = np.maximum(bounds[1] - bounds[0], 1e-30)
    tol = span / 510.0 + 1e-12
    coded = sq_encode(emb, bounds)
    rec = {
        r.neighbor_id: np.array(r.vector)
        for r in sq_reconstruct(coded, bounds).collect()
    }
    rows = emb.select("vec_id", "embedding").collect()
    for r in rows:
        v = np.array(list(r.embedding), dtype=np.float64)
        v = v / np.linalg.norm(v)
        assert np.all(np.abs(rec[r.vec_id] - v) <= tol), r.vec_id


def test_codes_are_single_bytes(spark, emb):
    coded = sq_encode(emb, train_sq(emb))
    assert dict(coded.dtypes)["codes"] == "array<tinyint>"
    sample = coded.limit(20).collect()
    assert all(
        -128 <= c <= 127 for r in sample for c in r.codes
    )


def test_recall_floor_and_full_refine_is_exact(spark, emb):
    """8 bits per dimension barely perturbs the ranking: recall@10
    >= 0.95 at refine_factor=4 even on random vectors (the
    quantizer's worst case); refine covering the corpus reproduces
    brute force EXACTLY (scores come from the exact JVM fold)."""
    queries = emb.where(F.col("vec_id") < 20)
    exact = _rows(cosine_topk(emb, queries, k=10))
    exact_pairs = {(q, n) for q, n, _, _ in exact}
    got = _rows(sq_topk(emb, queries, k=10, refine_factor=4))
    got_pairs = {(q, n) for q, n, _, _ in got}
    recall = len(got_pairs & exact_pairs) / len(exact_pairs)
    assert recall >= 0.95, recall
    n = emb.count()
    full = _rows(sq_topk(emb, queries, k=10, refine_factor=n))
    assert full == exact


def test_precomputed_bounds_skip_training_scan(spark, emb):
    bounds = train_sq(emb)
    queries = emb.where(F.col("vec_id") < 3)
    a = _rows(sq_topk(emb, queries, k=5, refine_factor=4))
    b = _rows(sq_topk(emb, queries, k=5, refine_factor=4, bounds=bounds))
    assert a == b


def test_filtered_query_matches_filtered_exact(spark, emb):
    """predicate masks the CODE scan (bounds stay predicate-agnostic):
    every neighbor satisfies the filter, k holds, and full refine
    equals filtered brute force exactly — the contract every ANN
    method in this package shares."""
    pred = F.col("vec_id") % 3 == 0
    queries = emb.where(F.col("vec_id") < 5)
    n = emb.count()
    got = _rows(sq_topk(emb, queries, k=8, refine_factor=n, predicate=pred))
    want = _rows(
        cosine_topk(emb.where(pred), queries, k=8)
    )
    assert got == want and len(got) > 0
    assert all(nid % 3 == 0 for _, nid, _, _ in got)
    counts = {}
    for qid, *_ in got:
        counts[qid] = counts.get(qid, 0) + 1
    assert set(counts.values()) == {8}


def test_validation_and_empty(spark, emb):
    with pytest.raises(ValueError, match="k must"):
        sq_topk(emb, emb.limit(1), k=0)
    with pytest.raises(ValueError, match="refine_factor"):
        sq_topk(emb, emb.limit(1), k=5, refine_factor=0)
    got = sq_topk(emb, emb.where(F.col("vec_id") < 0), k=5)
    assert got.count() == 0
    assert got.columns == ["query_id", "neighbor_id", "cos_sim", "rank"]
    with pytest.raises(ValueError, match="empty corpus"):
        train_sq(emb.where(F.col("vec_id") < 0))
