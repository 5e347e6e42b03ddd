"""Retrieval evaluation — recall/precision@k, MRR@k, nDCG@k over a
ranked-results frame and a relevance-judgment (qrels) frame.

The measurement half of the ANN/hybrid family: every retrieval path
here emits ``(query_id, neighbor_id, …, rank)``; given judgments
``(query_id, doc_id[, rel])`` this computes the standard IR metrics
per query and in aggregate, entirely as DataFrame aggregations:

* results ⋈ qrels is an equi-join on (query, doc) — the results side
  is |queries|·k rows (tiny by the ANN batch contract), so it
  BROADCASTS into the judgments;
* per-query metrics are ONE groupBy over the joined rows plus one
  over qrels (ideal DCG / relevant counts), joined back on query_id;
* binary qrels (no ``rel`` column) grade every judged doc 1 — nDCG
  then reduces to the binary form.

Tie-free by construction: ranks come from the retrieval operators'
deterministic row_number contracts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def retrieval_metrics(
    results: DataFrame,
    qrels: DataFrame,
    k: int,
    query_col: str = "query_id",
    doc_col: str = "neighbor_id",
    rank_col: str = "rank",
    rel_col: str | None = None,
) -> DataFrame:
    """→ one row per judged query: ``(query_id, n_rel, hits,
    recall_at_k, precision_at_k, mrr_at_k, ndcg_at_k)``. Queries with
    judgments but NO retrieved rows score zeros (a retrieval that
    returns nothing must not vanish from the average); queries with
    results but no judgments are excluded (no evidence). ``rel_col``
    names a graded-relevance column on qrels (missing = binary)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if rel_col is not None and rel_col not in qrels.columns:
        raise ValueError(f"qrels has no column {rel_col!r}")
    rel = (
        F.col(rel_col).cast("double")
        if rel_col is not None
        else F.lit(1.0)
    )
    if doc_col in qrels.columns:
        qrel_doc = doc_col
    elif "doc_id" in qrels.columns:
        qrel_doc = "doc_id"
    else:
        raise ValueError(
            f"qrels needs a {doc_col!r} or 'doc_id' column; has "
            f"{qrels.columns}"
        )
    j = qrels.select(
        F.col(query_col).alias("_q"),
        F.col(qrel_doc).alias("_d"),
        rel.alias("_rel"),
    ).where(F.col("_rel") > 0)
    # ideal DCG: the query's top-k grades in descending order
    w = Window.partitionBy("_q").orderBy(F.desc("_rel"), F.asc("_d"))
    ideal = (
        j.withColumn("_r", F.row_number().over(w))
        .where(F.col("_r") <= k)
        .groupBy("_q")
        .agg(
            F.sum(
                (F.pow(F.lit(2.0), F.col("_rel")) - 1)
                / F.log2(F.col("_r") + 1)
            ).alias("_idcg"),
        )
    )
    n_rel = j.groupBy("_q").agg(F.count(F.lit(1)).alias("n_rel"))
    res = results.select(
        F.col(query_col).alias("_q"),
        F.col(doc_col).alias("_d"),
        F.col(rank_col).cast("long").alias("_rank"),
    ).where(F.col("_rank") <= k)
    hits = F.broadcast(res).join(j, ["_q", "_d"])
    per_q = hits.groupBy("_q").agg(
        F.count(F.lit(1)).alias("hits"),
        (F.lit(1.0) / F.min("_rank")).alias("_rr"),
        F.sum(
            (F.pow(F.lit(2.0), F.col("_rel")) - 1)
            / F.log2(F.col("_rank") + 1)
        ).alias("_dcg"),
    )
    out = (
        n_rel.join(ideal, "_q")
        .join(per_q, "_q", "left")
        .select(
            F.col("_q").alias(query_col),
            "n_rel",
            F.coalesce(F.col("hits"), F.lit(0)).alias("hits"),
            # textbook recall@k: hits / |relevant| (NOT capped at k —
            # a query with more relevants than k honestly cannot
            # reach 1.0; cap upstream if the BEIR convention is
            # wanted)
            (
                F.coalesce(F.col("hits"), F.lit(0)) / F.col("n_rel")
            ).alias("recall_at_k"),
            (
                F.coalesce(F.col("hits"), F.lit(0)) / F.lit(float(k))
            ).alias("precision_at_k"),
            F.coalesce(F.col("_rr"), F.lit(0.0)).alias("mrr_at_k"),
            (
                F.coalesce(F.col("_dcg"), F.lit(0.0)) / F.col("_idcg")
            ).alias("ndcg_at_k"),
        )
    )
    return out


def retrieval_summary(
    results: DataFrame,
    qrels: DataFrame,
    k: int,
    **kwargs,
) -> DataFrame:
    """One row: the per-query metrics macro-averaged over judged
    queries (the TREC convention), plus the query count."""
    per_q = retrieval_metrics(results, qrels, k, **kwargs)
    return per_q.agg(
        F.count(F.lit(1)).alias("n_queries"),
        F.avg("recall_at_k").alias("recall_at_k"),
        F.avg("precision_at_k").alias("precision_at_k"),
        F.avg("mrr_at_k").alias("mrr_at_k"),
        F.avg("ndcg_at_k").alias("ndcg_at_k"),
    )
