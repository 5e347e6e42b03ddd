"""IVF (inverted-file) ANN — coarse quantize, probe, re-score.

The other approximate path besides sign-random-projection LSH
(lsh.py): partition the corpus into cells around coarse centroids;
a query scores only the cells its ``nprobe`` nearest centroids own.

Centroids are a deterministic sample of the corpus itself (first
``n_cells`` vectors by id) — real IVF trains k-means, but corpus
samples already land in the data's distribution, need no fit
iterations, and keep runs reproducible. The sample is the ONLY
driver-side collect: n_cells × dims floats, broadcast back as
literals — at 100 TB you would sample ids instead of taking a prefix,
the rest is unchanged.

Cell assignment is one narrow JVM-side pass (array_max over
struct(sim, cid) — no shuffle, no Python); the candidate join shuffles
only on the cell id; exact cosine re-scores candidates. Recall vs the
brute-force baseline is asserted in tests/test_similarity.py, not
assumed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from etl_data_lake_spark.functions.vectors import as_double, cosine
from etl_data_lake_spark.sources.catalog import fan_out


def _centroid_sims(v: Column, centroids: list[list[float]]) -> Column:
    """array<struct<sim,cid>> of similarities to every centroid."""
    return F.array(
        *[
            F.struct(
                cosine(v, F.array(*[F.lit(x) for x in c])).alias("sim"),
                F.lit(i).alias("cid"),
            )
            for i, c in enumerate(centroids)
        ]
    )


def sample_centroids(
    corpus: DataFrame, n_cells: int, id_col: str, vec_col: str
) -> list[list[float]]:
    rows = (
        corpus.select(F.col(id_col).alias("i"), as_double(vec_col).alias("v"))
        .orderBy("i")
        .limit(n_cells)
        .collect()
    )
    return [list(r.v) for r in rows]


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """→ (query_id, neighbor_id, cos_sim, rank); self-matches excluded."""
    centroids = sample_centroids(corpus, n_cells, id_col, vec_col)
    if not centroids:
        # empty corpus: empty result with the contract schema
        return (
            queries.select(
                F.col(id_col).alias("query_id"),
                F.col(id_col).alias("neighbor_id"),
                F.lit(0.0).alias("cos_sim"),
                F.lit(0).cast("long").alias("rank"),
            ).limit(0)
        )

    c = fan_out(
        corpus.select(
            F.col(id_col).alias("neighbor_id"), as_double(vec_col).alias("cv")
        )
    )
    # corpus side: each vector lives in exactly ONE cell (its argmax
    # centroid; struct ordering breaks sim ties toward the higher cid)
    cb = c.withColumn(
        "cell", F.array_max(_centroid_sims(F.col("cv"), centroids)).getField("cid")
    )

    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(vec_col).alias("qv")
    )
    # query side: probe the nprobe nearest cells
    qb = (
        q.withColumn(
            "probes",
            F.slice(
                F.reverse(F.array_sort(_centroid_sims(F.col("qv"), centroids))),
                1,
                nprobe,
            ),
        )
        .select("query_id", "qv", F.explode("probes.cid").alias("cell"))
    )

    cand = (
        cb.join(F.broadcast(qb), "cell")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w).cast("long")).where(
        F.col("rank") <= k
    )
