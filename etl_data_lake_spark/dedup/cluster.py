"""Duplicate clustering: connected components over near-dup pairs.

Pair detection (jaccard/minhash/simhash) emits EDGES; deduplication
needs GROUPS — "these 5 docs are all the same article, keep one".
That's connected components, an inherently iterative algorithm (the
category SURVEY §2 marks non-SQL-expressible in general; the oracle
uses DuckDB's recursive CTE, which works because LSH candidate graphs
are tiny relative to the corpus).

Algorithm: min-label propagation ("hash-to-min"). Every doc starts
labeled with its own id; each round every node adopts the minimum
label in its neighborhood; converged when no label changes. Rounds ≤
graph diameter; near-dup components are small and dense, so 2-4
rounds in practice. Each round is one join + one aggregation, with
``localCheckpoint`` cutting the lineage so plans don't grow with the
iteration count — the standard Spark pattern for loops (same shape
GraphX/GraphFrames uses under the hood).

At 100 TB: the edge table (LSH candidates) is orders of magnitude
smaller than the corpus; label propagation shuffles only |edges| +
|touched nodes| per round. The large-diameter adversarial case (a
long chain of near-dups) is bounded by ``max_rounds``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_rounds: int = 20,
) -> DataFrame:
    """→ (doc_id, cluster_id): every node appearing in ``pairs``,
    labeled with the minimum doc id reachable from it."""
    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .union(pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("cluster_id", F.col("doc_id"))
    )
    for _ in range(max_rounds):
        neighbor_min = (
            edges.join(
                labels.withColumnRenamed("doc_id", "dst").withColumnRenamed(
                    "cluster_id", "dst_label"
                ),
                "dst",
            )
            .groupBy("src")
            .agg(F.min("dst_label").alias("nbr_min"))
            .withColumnRenamed("src", "doc_id")
        )
        updated = (
            labels.join(neighbor_min, "doc_id", "left")
            .select(
                "doc_id",
                F.least(
                    F.col("cluster_id"),
                    F.coalesce(F.col("nbr_min"), F.col("cluster_id")),
                ).alias("cluster_id"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            updated.alias("u")
            .join(labels.alias("l"), "doc_id")
            .where(F.col("u.cluster_id") != F.col("l.cluster_id"))
            .count()
        )
        labels = updated
        if changed == 0:
            break
    edges.unpersist()
    return labels


def dedup_keep_canonical(
    docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Drop every near-duplicate except its cluster's minimum-id
    representative; docs in no cluster pass through untouched."""
    comp = connected_components(pairs)
    losers = comp.where(F.col("cluster_id") != F.col(id_col)).select(
        F.col(id_col)
    )
    return docs.join(losers, id_col, "left_anti")
