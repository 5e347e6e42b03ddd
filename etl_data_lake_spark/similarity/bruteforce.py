"""Brute-force cosine top-k — the exact ANN baseline.

broadcast(queries) × corpus → per-pair cosine → per-query rank →
keep k. The crossJoin is embarrassingly parallel (no shuffle of the
corpus; queries ship with the task), and the rank is a window over
|queries|·|corpus| rows partitioned by query — at 100 TB this is the
plan you run when queries are few; LSH (lsh.py) when they aren't.

Ranking is over the ROUNDED score with vec_id tiebreak so the result
SET is deterministic and engine-independent even where two neighbors
are equally similar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from etl_data_lake_spark.functions.vectors import as_double, cosine
from etl_data_lake_spark.sources.catalog import fan_out


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
    predicate=None,
) -> DataFrame:
    """→ (query_id, neighbor_id, cos_sim, rank); self-matches excluded.

    ``predicate`` (Column or SQL string) restricts the CORPUS side —
    metadata-constrained search ("nearest neighbors among docs where
    lang='en'"): the filter applies BEFORE candidate generation, so
    the result is the true top-k of the filtered corpus, never a
    post-filtered under-k remnant. Applied ahead of the projection, it
    reaches the parquet scan (predicate pushdown) — the filtered scan
    reads less, not more."""
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(vec_col).alias("qv")
    )
    if predicate is not None:
        corpus = corpus.where(predicate)
    c = fan_out(
        corpus.select(
            F.col(id_col).alias("neighbor_id"), as_double(vec_col).alias("cv")
        )
    )
    pairs = c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("qv"), F.col("cv")), round_digits).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
    )
