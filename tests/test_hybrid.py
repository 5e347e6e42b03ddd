"""Hybrid retrieval (functions/hybrid): BM25→cosine rerank against an
independent numpy reference, candidate/missing-embedding semantics,
and hand-computed reciprocal-rank fusion. The DuckDB twin
(hybrid_bm25_cosine) is parity-checked in test_parity."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from etl_data_lake_spark.functions.hybrid import hybrid_search, rrf_fuse
from etl_data_lake_spark.functions.relevance import bm25_score
from etl_data_lake_spark.sources.catalog import load_table
from tests.conftest import SF_DIR

_TERMS = ["join", "spark", "window"]


def test_hybrid_matches_numpy_rerank(spark):
    """hybrid_search ≡ (BM25 candidates) reranked by numpy cosine —
    an independent reference for the whole composition."""
    import numpy as np

    docs = load_table(spark, SF_DIR, "documents")
    emb = load_table(spark, SF_DIR, "embeddings")
    qvec = (
        emb.where(F.col("vec_id") == 0)
        .select(F.col("embedding").cast("array<double>"))
        .collect()[0][0]
    )
    got = sorted(
        (r.doc_id, r.bm25, r.cos_sim, r.rank)
        for r in hybrid_search(
            docs, emb, _TERMS, list(qvec), k=10, n_candidates=50
        ).collect()
    )
    # reference: library BM25 top-50, numpy cosine, python sort
    cand = {
        r.doc_id: r.score
        for r in bm25_score(docs, _TERMS, limit=50).collect()
    }
    vecs = {
        r.vec_id: np.asarray(r.v, dtype=np.float64)
        for r in emb.select(
            "vec_id", F.col("embedding").cast("array<double>").alias("v")
        ).collect()
    }
    q = np.asarray(qvec, dtype=np.float64)
    rer = []
    for did, s in cand.items():
        if did not in vecs:
            continue
        v = vecs[did]
        cos = float(v @ q / (np.linalg.norm(v) * np.linalg.norm(q)))
        rer.append((did, round(s, 6), round(cos, 6)))
    rer.sort(key=lambda t: (-t[2], t[0]))
    want = sorted(
        (did, b, c, i + 1) for i, (did, b, c) in enumerate(rer[:10])
    )
    assert got == want and len(got) == 10


def test_hybrid_drops_candidates_without_embeddings(spark):
    """A lexically perfect doc with no embedding row cannot be
    reranked — it is dropped, and the emitted rows still rank
    densely."""
    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "alpha beta"), (3, "alpha beta")],
        "doc_id long, text string",
    )
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (3, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    got = hybrid_search(
        docs, emb, ["alpha"], [1.0, 0.0], k=3, n_candidates=3
    ).collect()
    assert sorted(r.doc_id for r in got) == [1, 3]
    assert sorted(r.rank for r in got) == [1, 2]
    assert [r.doc_id for r in got if r.rank == 1] == [1]  # cos 1.0


def test_hybrid_validation(spark):
    docs = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    emb = spark.createDataFrame(
        [(1, [1.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="k must be"):
        hybrid_search(docs, emb, ["a"], [1.0], k=0)
    with pytest.raises(ValueError, match="n_candidates"):
        hybrid_search(docs, emb, ["a"], [1.0], k=5, n_candidates=3)


def test_rrf_hand_computed(spark):
    """Two rankings, k_rrf=60: every fused score verifiable by hand;
    a doc present in only one ranking contributes only that term."""
    r1 = spark.createDataFrame(
        [(10, 1), (20, 2), (30, 3)], "doc_id long, rank long"
    )
    r2 = spark.createDataFrame(
        [(20, 1), (10, 2)], "doc_id long, rank long"
    )
    got = {
        r.doc_id: (r.rrf_score, r.rank)
        for r in rrf_fuse([r1, r2]).collect()
    }
    s10 = 1 / 61 + 1 / 62
    s20 = 1 / 62 + 1 / 61
    s30 = 1 / 63
    assert math.isclose(got[10][0], s10)
    assert math.isclose(got[20][0], s20)
    assert math.isclose(got[30][0], s30)
    # 10 and 20 tie exactly (same terms, fixed order) → id tiebreak
    assert got[10][1] == 1 and got[20][1] == 2 and got[30][1] == 3


def test_rrf_limit_and_validation(spark):
    r1 = spark.createDataFrame(
        [(i, i) for i in range(1, 6)], "doc_id long, rank long"
    )
    top = rrf_fuse([r1], limit=2).collect()
    assert sorted((r.doc_id, r.rank) for r in top) == [(1, 1), (2, 2)]
    with pytest.raises(ValueError, match="at least one"):
        rrf_fuse([])
    with pytest.raises(ValueError, match="k_rrf"):
        rrf_fuse([r1], k_rrf=0)


def test_rrf_fuses_lexical_and_semantic(spark):
    """The composition RRF exists for: fuse the BM25 ranking with the
    cosine ranking; a doc strong in BOTH beats a doc strong in one
    (pinned on a constructed corpus where lexical and semantic
    rankings disagree)."""
    from etl_data_lake_spark.similarity.bruteforce import cosine_topk

    docs = spark.createDataFrame(
        [
            (1, "apple apple apple"),          # lexical best
            (2, "apple banana"),               # good at both
            (3, "cherry"),                     # semantic best
        ],
        "doc_id long, text string",
    )
    emb = spark.createDataFrame(
        [
            (1, [0.0, 1.0]),
            (2, [1.0, 0.05]),  # exactly the query direction
            (3, [1.0, 0.3]),
            (99, [1.0, 0.05]),  # the query row
        ],
        "vec_id long, embedding array<double>",
    )
    lex = bm25_score(docs, ["apple"], limit=3).withColumn(
        "rank",
        F.row_number().over(
            __import__("pyspark.sql.window", fromlist=["Window"])
            .Window.orderBy(F.desc("score"), F.asc("doc_id"))
        ).cast("long"),
    ).select("doc_id", "rank")
    sem = cosine_topk(
        emb, emb.where(F.col("vec_id") == 99), k=3
    ).select(F.col("neighbor_id").alias("doc_id"), "rank")
    fused = {r.doc_id: r.rank for r in rrf_fuse([lex, sem]).collect()}
    # doc 2: lex rank 2 (tf 1 < doc 1's 3) + sem rank 1 → 1/62 + 1/61,
    # beating doc 1 (lex 1 + sem 3 → 1/61 + 1/63) and doc 3 (sem 2
    # only → 1/62): strong-in-both wins the fusion
    assert fused[2] == 1


def test_hybrid_rerank_broadcasts_candidates(spark):
    """The rerank join must broadcast the candidate side — a
    sort-merge join here would shuffle the entire embeddings table
    for a 50-row rerank."""
    docs = load_table(spark, SF_DIR, "documents")
    emb = load_table(spark, SF_DIR, "embeddings")
    qvec = (
        emb.where(F.col("vec_id") == 0)
        .select(F.col("embedding").cast("array<double>"))
        .collect()[0][0]
    )
    plan = (
        hybrid_search(docs, emb, _TERMS, list(qvec), k=5, n_candidates=20)
        ._jdf.queryExecution().executedPlan().toString()
    )
    rerank_joins = [
        ln for ln in plan.splitlines()
        if "Join [doc_id" in ln or ("Join" in ln and "doc_id#" in ln)
    ]
    assert any("BroadcastHashJoin" in ln for ln in rerank_joins)
    assert not any("SortMergeJoin" in ln for ln in plan.splitlines())
