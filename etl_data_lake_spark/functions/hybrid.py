"""Hybrid retrieval — lexical recall, semantic precision.

The retrieval shape a curation/RAG pipeline actually runs: BM25 over
the corpus for RECALL (cheap, posting-pruned — functions/relevance),
then an exact embedding-cosine RERANK of just those candidates for
PRECISION, plus reciprocal-rank fusion (RRF, Cormack et al. 2009) for
combining any rankings (BM25 + ANN, multiple ANN probes, …) without
score normalization.

Scale shape, built for 100 TB:

* :func:`hybrid_search` — stage 1 is ``bm25_score``'s posting-pruned
  plan (cost ∝ matching postings, not corpus size); stage 2 joins the
  ``n_candidates``-row result against the embeddings table, so ONLY
  candidates ever read the fat vector column, and the query vector is
  a literal array (broadcast by construction, no collect). The rerank
  window runs over ≤ ``n_candidates`` rows.
* :func:`rrf_fuse` — one union of the (id, rank) frames (ranks, never
  payloads), one id-keyed aggregation. Per-id scores sum in FIXED
  ranking order via per-source conditional aggregates (the
  ``bm25_score`` construction), so the float result is reproducible
  across partitionings and engines.

The BM25→cosine composition is parity-checked against DuckDB end to
end (queries/vector_queries.hybrid_bm25_cosine, test_parity).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from etl_data_lake_spark.functions.relevance import bm25_score
from etl_data_lake_spark.functions.vectors import as_double, cosine


def hybrid_search(
    docs: DataFrame,
    embeddings: DataFrame,
    query_terms: list[str],
    query_vec: list[float],
    k: int = 10,
    n_candidates: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
    emb_id_col: str = "vec_id",
    vec_col: str = "embedding",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """→ top-``k`` (doc_id, bm25, cos_sim, rank): BM25's top
    ``n_candidates`` reranked by exact cosine against ``query_vec``
    (rank = cosine desc, id asc — the ANN tie-break contract).

    Candidates missing an embedding row are DROPPED by the inner join
    (they cannot be semantically reranked); if that matters, backfill
    vectors upstream. ``query_vec`` must match the embedding
    dimensionality — a mismatch surfaces as null cos_sim (zip_with
    pads with nulls), not a wrong score."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if n_candidates < k:
        raise ValueError(
            f"n_candidates ({n_candidates}) must be >= k ({k})"
        )
    cand = bm25_score(
        docs, list(query_terms), text_col=text_col, id_col=id_col,
        k1=k1, b=b, limit=n_candidates,
    )
    qv = F.array(*[F.lit(float(x)) for x in query_vec])
    emb = embeddings.select(
        F.col(emb_id_col).alias("doc_id"),
        as_double(vec_col).alias("_v"),
    )
    # the candidate side is n_candidates rows by construction —
    # broadcast it EXPLICITLY so the rerank never degrades to a
    # sort-merge join shuffling the whole embeddings table when the
    # size estimate is unavailable (plan-pinned in test_hybrid)
    reranked = F.broadcast(cand).join(emb, "doc_id").select(
        "doc_id",
        F.round(F.col("score"), 6).alias("bm25"),
        F.round(cosine(F.col("_v"), qv), 6).alias("cos_sim"),
    )
    w = Window.orderBy(F.desc("cos_sim"), F.asc("doc_id"))
    return (
        reranked.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
    )


def rrf_fuse(
    rankings: list[DataFrame],
    k_rrf: int = 60,
    id_col: str = "doc_id",
    rank_col: str = "rank",
    limit: int | None = None,
) -> DataFrame:
    """Reciprocal-rank fusion: score(d) = Σ_i 1/(k_rrf + rank_i(d)),
    summed over the rankings that contain ``d`` (absence contributes
    0 — RRF's whole point is that no score normalization is needed).
    → (id_col, rrf_score, rank), rank = score desc, id asc; ``limit``
    caps the output (TakeOrderedAndProject instead of a full window).

    The tiny-frame global window/sort is deliberate: fusion inputs
    are top-k rankings, ≤ Σ|rankings| rows."""
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    if k_rrf < 1:
        raise ValueError(f"k_rrf must be >= 1, got {k_rrf}")
    tagged = [
        r.select(
            F.col(id_col),
            F.col(rank_col).cast("long").alias("_rk"),
            F.lit(i).alias("_src"),
        )
        for i, r in enumerate(rankings)
    ]
    u = reduce(lambda a, c: a.unionByName(c), tagged)
    # fixed-order float sum: one conditional aggregate per source,
    # added left-to-right (bm25_score's reproducibility construction)
    per_src = u.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(
                    F.col("_src") == i,
                    F.lit(1.0) / (F.lit(float(k_rrf)) + F.col("_rk")),
                )
            ).alias(f"_c{i}")
            for i in range(len(rankings))
        ]
    )
    score = F.coalesce(F.col("_c0"), F.lit(0.0))
    for i in range(1, len(rankings)):
        score = score + F.coalesce(F.col(f"_c{i}"), F.lit(0.0))
    scored = per_src.select(F.col(id_col), score.alias("rrf_score"))
    if limit is not None:
        from etl_data_lake_spark.operators.topk import top_k

        scored = top_k(
            scored, [F.desc("rrf_score"), F.asc(id_col)], limit
        )
    w = Window.orderBy(F.desc("rrf_score"), F.asc(id_col))
    return scored.withColumn(
        "rank", F.row_number().over(w).cast("long")
    )
