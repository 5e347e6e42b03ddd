"""Semantic (embedding-space) dedup at scale — blocked near-dup pairs
plus SemDeDup-style canonical pruning.

``queries/vector_queries.embedding_near_dup_pairs`` is the exact
baseline: an all-pairs cosine join, O(n²) — correct, oracle-checked,
and unusable at 100 TB. The scale path here blocks the corpus with the
IVF coarse quantizer (similarity/ivf.py — deterministic k-means over a
bounded sample) and compares only vectors sharing a cell: the
candidate join shuffles on the cell id, so pair work collapses from
|corpus|² to Σ_cells |cell|², the blocked-similarity-join shape every
production semantic dedup uses (SemDeDup, Abbas et al. 2023, prunes
within k-means clusters for exactly this reason).

Near-boundary pairs can straddle cells; ``n_assign`` > 1 multi-assigns
each vector to its nearest cells (the IVF multi-probe trick on the
INDEX side), which recovers boundary pairs at ``n_assign×`` storage —
the standard recall/cost knob. With ``n_assign = n_cells`` every pair
shares a cell and the result equals the exact baseline, which the
tests pin; the emitted cosine is always the exact JVM fold (numpy only
blocks), so scores are bit-deterministic.

The dedup step composes the existing machinery: pairs ≥ threshold →
connected components (dedup/cluster.py) → keep the lowest-id doc per
semantic cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_data_lake_spark.functions.vectors import as_double, cosine
from etl_data_lake_spark.similarity.ivf import (
    _probe_udf,
    refine_centroids,
    sample_centroids,
)
from etl_data_lake_spark.sources.catalog import fan_out


def blocked_near_dup_pairs(
    corpus: DataFrame,
    threshold: float = 0.45,
    n_cells: int = 16,
    n_assign: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    kmeans_iters: int = 2,
    train_factor: int = 64,
) -> DataFrame:
    """→ (vec_a, vec_b, cos_sim), vec_a < vec_b, cos_sim ≥ threshold,
    for pairs sharing at least one of their ``n_assign`` nearest
    cells. Exact within the blocking; misses only pairs whose members
    share no cell."""
    train = sample_centroids(
        corpus, n_cells * max(train_factor, 1), id_col, vec_col
    )
    centroids = refine_centroids(train, train[:n_cells], iters=kmeans_iters)
    if not centroids:
        return corpus.select(
            F.col(id_col).alias("vec_a"),
            F.col(id_col).alias("vec_b"),
            F.lit(0.0).alias("cos_sim"),
        ).limit(0)
    n_assign = min(max(n_assign, 1), len(centroids))
    probe = _probe_udf(centroids, n_assign)
    blocked = fan_out(
        corpus.select(F.col(id_col).alias("id"), as_double(vec_col).alias("v"))
    ).select("id", "v", F.explode(probe(F.col("v"))).alias("cell"))
    a = blocked.select(
        F.col("cell"), F.col("id").alias("vec_a"), F.col("v").alias("va")
    )
    b = blocked.select(
        F.col("cell"), F.col("id").alias("vec_b"), F.col("v").alias("vb")
    )
    cand = (
        a.join(b, ["cell"])
        .where(F.col("vec_a") < F.col("vec_b"))
        # multi-assignment duplicates a pair once per shared cell
        .dropDuplicates(["vec_a", "vec_b"])
    )
    sim = F.round(cosine(F.col("va"), F.col("vb")), 6)
    return cand.select("vec_a", "vec_b", sim.alias("cos_sim")).where(
        F.col("cos_sim") >= threshold
    )


def semantic_dedup_keep(
    corpus: DataFrame,
    threshold: float = 0.45,
    n_cells: int = 16,
    n_assign: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-style pruning: → the corpus rows that SURVIVE semantic
    dedup (one canonical — lowest id — per near-duplicate cluster).
    Pairs from the blocked join, clusters from the iterative
    connected-components operator, losers anti-joined away."""
    from etl_data_lake_spark.dedup.cluster import connected_components

    pairs = blocked_near_dup_pairs(
        corpus, threshold, n_cells, n_assign, id_col, vec_col
    )
    comps = connected_components(
        pairs.select(
            F.col("vec_a").alias("doc_a"), F.col("vec_b").alias("doc_b")
        )
    )
    losers = comps.where(F.col("doc_id") != F.col("cluster_id")).select(
        F.col("doc_id").alias(id_col)
    )
    return corpus.join(F.broadcast(losers), id_col, "left_anti")
