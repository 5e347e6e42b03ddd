"""Binary (sign) quantization (similarity/bq): code size, Hamming
scorer correctness vs pure-Python popcount, recall floors against
brute force (measured on the random-vector worst case AND a clustered
corpus where orientation bits genuinely separate), exact-equality
under full refine, and the filtered-query path — sq's test shape one
notch down the byte budget."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from etl_data_lake_spark.similarity.bq import (
    bq_encode,
    bq_topk,
    hamming_distances,
    train_bq,
)
from etl_data_lake_spark.similarity.bruteforce import cosine_topk
from etl_data_lake_spark.sources.catalog import load_table
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_DIR, "embeddings")


@pytest.fixture(scope="module")
def clustered(spark):
    """16 well-separated random directions, 25 small-noise members
    each — the corpus shape BQ is FOR (orientation carries the
    signal)."""
    rng = np.random.default_rng(7)
    centers = rng.normal(size=(16, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    vid = 0
    for c in centers:
        for _ in range(25):
            v = c + rng.normal(scale=0.08, size=64)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _rows(df):
    return sorted(
        (r.query_id, r.neighbor_id, r.cos_sim, r.rank) for r in df.collect()
    )


def _pairs(df):
    return {(r.query_id, r.neighbor_id) for r in df.collect()}


def test_thresholds_are_normalized_means(spark, emb):
    thr = train_bq(emb)
    rows = emb.select("embedding").collect()
    V = np.array([list(r.embedding) for r in rows], dtype=np.float64)
    V = V / np.linalg.norm(V, axis=1, keepdims=True)
    assert np.allclose(thr, V.mean(axis=0))


def test_codes_are_packed_bytes(spark, emb):
    coded = bq_encode(emb, train_bq(emb))
    assert dict(coded.dtypes)["codes"] == "array<tinyint>"
    d = len(emb.select("embedding").first()[0])
    sample = coded.limit(20).collect()
    assert all(len(r.codes) == math.ceil(d / 8) for r in sample)
    assert all(-128 <= c <= 127 for r in sample for c in r.codes)


def test_hamming_matches_pure_python():
    rng = np.random.default_rng(3)
    codes = rng.integers(0, 256, size=(40, 8), dtype=np.uint8)
    qbits = rng.integers(0, 256, size=(5, 8), dtype=np.uint8)
    got = hamming_distances(codes, qbits)
    for i in range(40):
        for j in range(5):
            want = sum(
                bin(int(a) ^ int(b)).count("1")
                for a, b in zip(codes[i], qbits[j])
            )
            assert got[i, j] == want


def test_recall_floors_and_full_refine_is_exact(spark, emb):
    """One bit per dimension ranks coarsely on RANDOM vectors (the
    worst case: no orientation structure to capture) — measured
    0.78/0.905 at refine 8/16; pinned with margin. Refine covering
    the corpus reproduces brute force EXACTLY regardless."""
    queries = emb.where(F.col("vec_id") < 20)
    exact = _rows(cosine_topk(emb, queries, k=10))
    exact_pairs = {(q, n) for q, n, _, _ in exact}
    r8 = _pairs(bq_topk(emb, queries, k=10, refine_factor=8))
    assert len(r8 & exact_pairs) / len(exact_pairs) >= 0.70
    r16 = _pairs(bq_topk(emb, queries, k=10, refine_factor=16))
    assert len(r16 & exact_pairs) / len(exact_pairs) >= 0.85
    n = emb.count()
    full = _rows(bq_topk(emb, queries, k=10, refine_factor=n))
    assert full == exact


def test_clustered_corpus_high_recall_at_small_refine(spark, clustered):
    """On an orientation-separable corpus the sign bits carry nearly
    the whole ranking: recall@10 >= 0.9 already at refine_factor=2."""
    queries = clustered.where(F.col("vec_id") % 25 == 0)
    exact_pairs = _pairs(cosine_topk(clustered, queries, k=10))
    got = _pairs(bq_topk(clustered, queries, k=10, refine_factor=2))
    assert len(got & exact_pairs) / len(exact_pairs) >= 0.9


def test_precomputed_thresholds_skip_training_scan(spark, emb):
    thr = train_bq(emb)
    queries = emb.where(F.col("vec_id") < 3)
    a = _rows(bq_topk(emb, queries, k=5, refine_factor=8))
    b = _rows(bq_topk(emb, queries, k=5, refine_factor=8, thresholds=thr))
    assert a == b


def test_filtered_query_matches_filtered_exact(spark, emb):
    pred = F.col("vec_id") % 3 == 0
    queries = emb.where(F.col("vec_id") < 5)
    n = emb.count()
    got = _rows(bq_topk(emb, queries, k=8, refine_factor=n, predicate=pred))
    want = _rows(cosine_topk(emb.where(pred), queries, k=8))
    assert got == want and len(got) > 0
    assert all(nid % 3 == 0 for _, nid, _, _ in got)
    counts = {}
    for qid, *_ in got:
        counts[qid] = counts.get(qid, 0) + 1
    assert set(counts.values()) == {8}


def test_layout_invariance(spark, emb):
    queries = emb.where(F.col("vec_id") < 5)
    n = emb.count()
    a = _rows(bq_topk(emb, queries, k=5, refine_factor=n))
    b = _rows(bq_topk(emb.repartition(7), queries, k=5, refine_factor=n))
    assert a == b


def test_validation_and_empty(spark, emb):
    with pytest.raises(ValueError, match="k must"):
        bq_topk(emb, emb.limit(1), k=0)
    with pytest.raises(ValueError, match="refine_factor"):
        bq_topk(emb, emb.limit(1), k=5, refine_factor=0)
    got = bq_topk(emb, emb.where(F.col("vec_id") < 0), k=5)
    assert got.count() == 0
    assert got.columns == ["query_id", "neighbor_id", "cos_sim", "rank"]
    with pytest.raises(ValueError, match="empty corpus"):
        train_bq(emb.where(F.col("vec_id") < 0))
