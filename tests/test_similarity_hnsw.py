"""Sharded HNSW ANN (similarity/hnsw): exactness at exhaustive ef
(connected graphs + full beam ≡ per-shard scan), recall at working
ef, layout determinism, and the shared result contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_data_lake_spark.similarity.bruteforce import cosine_topk
from etl_data_lake_spark.similarity.hnsw import hnsw_topk
from etl_data_lake_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.01"
N_QUERIES = 20


def _by_query(rows):
    out = {}
    for r in rows:
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF, "embeddings")


@pytest.fixture(scope="module")
def queries(emb):
    return emb.where(F.col("vec_id") < N_QUERIES)


def test_exhaustive_ef_equals_brute_force(spark, emb, queries):
    """ef_search >= shard size turns each shard's beam into a full
    scan of its connected graph, so the sharded merge must equal the
    exact baseline — the algebraic oracle that validates the whole
    build/search machinery at once."""
    exact = _by_query(cosine_topk(emb, queries, k=10).collect())
    got = _by_query(
        hnsw_topk(
            emb, queries, k=10, m=8, ef_search=1000, n_parts=4
        ).collect()
    )
    assert got == exact


def test_recall_at_working_ef(spark, emb, queries):
    exact = _by_query(cosine_topk(emb, queries, k=10).collect())
    got = _by_query(
        hnsw_topk(emb, queries, k=10, m=8, ef_search=32, n_parts=4).collect()
    )
    hits = sum(len(got.get(q, set()) & nbrs) for q, nbrs in exact.items())
    possible = sum(len(v) for v in exact.values())
    recall = hits / possible
    assert recall >= 0.9, f"recall@10 {recall:.3f} below floor"


def test_layout_deterministic_and_rank_contract(spark, emb, queries):
    a = sorted(
        map(tuple, hnsw_topk(emb, queries, k=5, n_parts=4).collect())
    )
    b = sorted(
        map(
            tuple,
            hnsw_topk(
                emb.repartition(13), queries, k=5, n_parts=4
            ).collect(),
        )
    )
    assert a == b
    per_q = {}
    for qid, nid, sim, rank in a:
        per_q.setdefault(qid, []).append((rank, sim, nid))
        assert nid != qid  # self-matches excluded
    for qid, rows in per_q.items():
        rows.sort()
        assert [r[0] for r in rows] == list(range(1, len(rows) + 1))
        sims = [r[1] for r in rows]
        assert sims == sorted(sims, reverse=True)


def test_validation(spark, emb, queries):
    with pytest.raises(ValueError, match="k must"):
        hnsw_topk(emb, queries, k=0)
    with pytest.raises(ValueError, match="m must"):
        hnsw_topk(emb, queries, m=1)
    with pytest.raises(ValueError, match="n_parts"):
        hnsw_topk(emb, queries, n_parts=0)
    empty = hnsw_topk(emb, queries.limit(0))
    assert empty.count() == 0
    assert empty.columns == ["query_id", "neighbor_id", "cos_sim", "rank"]


def test_query_batch_bound_is_loud(spark, emb, queries):
    """VERDICT r8 hygiene: the query side collects to the driver, so an
    oversized batch must raise loudly (the IvfIndex.query guard), not
    silently OOM the driver."""
    with pytest.raises(ValueError, match="max_query_batch"):
        hnsw_topk(emb, queries, max_query_batch=3)
    # at the bound: runs fine
    got = hnsw_topk(
        emb, queries.limit(3), k=2, max_query_batch=3
    )
    assert got.select("query_id").distinct().count() == 3
