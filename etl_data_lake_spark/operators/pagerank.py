"""PageRank over an edge table — link-graph authority as a curation
signal.

Web-scale corpus curation ranks documents by link authority before
(or alongside) content quality; the package's quality family (NB /
logreg scores, perplexity, heuristics) is purely content-side, and
its one graph algorithm (dedup/cluster.py's connected components)
answers reachability, not importance. This adds the standard damped
PageRank (Brin & Page 1998; the formulation every public engine —
GraphX, GraphFrames, igraph — implements):

    r'(v) = (1-d)/N + d·( Σ_{u→v} r(u)/outdeg(u) + dangling/N )

with dangling mass (nodes with no out-edges) redistributed uniformly,
so Σ r = 1 is an exact invariant every iteration (test-pinned to
float tolerance).

Spark shape per iteration: ONE node-sized join of ranks onto the
edge list (shuffle on src), one groupBy(dst) aggregation — both map-
side combined — plus a 2-scalar driver collect (dangling mass + L1
delta). Each iteration's ranks are ``localCheckpoint``-ed (eager):
iterative plans NEST — persist caches data but the logical plan still
grows by one join+agg layer per iteration, and past ~30 layers
Catalyst analysis time explodes (measured here: a 50-iteration run
hung in the driver before any executor work). Checkpointing truncates
the lineage to the materialized blocks, which is how every public
iterative-on-Spark implementation (GraphX, GraphFrames' PageRank,
MLlib's ALS) survives its own loop.

At 100 TB: the edge list never replicates (contribs are edge-sized,
ranks node-sized); a super-node's in-edges skew the groupBy(dst) —
AQE's skew split handles the aggregation, and the rank/degree join
side is hash-partitioned on src, where web graphs skew far less.
Driver traffic is 2 scalars × iterations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    max_iters: int = 20,
    tol: float = 1e-6,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | None = None,
) -> DataFrame:
    """→ (node, rank) for every node appearing as source OR target;
    ranks sum to 1. Unweighted (default): duplicate edges count once
    (a link is a link) and a node's rank splits evenly over its
    out-neighbors. With ``weight_col`` (link multiplicity, anchor-text
    score, …): parallel edges SUM their weights and rank splits
    proportionally — ``r(u)·w(u,v)/Σ_x w(u,x)``; non-positive and
    null/NaN weights are dropped (NaN > 0 is TRUE in Spark ordering —
    the round-7 lesson, filtered explicitly). Null endpoints are
    dropped. Converges when the L1 rank change ≤ ``tol`` or after
    ``max_iters`` iterations, whichever first."""
    if not (0.0 < damping < 1.0):
        raise ValueError(f"damping must be in (0, 1), got {damping}")
    if max_iters < 1:
        raise ValueError(f"max_iters must be >= 1, got {max_iters}")
    if weight_col is None:
        e = (
            edges.select(
                F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
            )
            .where(F.col("src").isNotNull() & F.col("dst").isNotNull())
            .dropDuplicates(["src", "dst"])
            .withColumn("w", F.lit(1.0))
            .persist()
        )
    else:
        wc = F.col(weight_col).cast("double")
        e = (
            edges.select(
                F.col(src_col).alias("src"),
                F.col(dst_col).alias("dst"),
                wc.alias("w"),
            )
            .where(
                F.col("src").isNotNull()
                & F.col("dst").isNotNull()
                & F.col("w").isNotNull()
                & ~F.isnan("w")
                & (F.col("w") > 0)
            )
            .groupBy("src", "dst")
            .agg(F.sum("w").alias("w"))
            .persist()
        )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()
    if n == 0:
        e.unpersist()
        nodes.unpersist()
        return nodes.withColumn("rank", F.lit(0.0))
    degrees = (
        e.groupBy(F.col("src").alias("node"))
        .agg(F.sum("w").alias("outdeg"))
        .persist()
    )
    ranks = nodes.withColumn("rank", F.lit(1.0 / n)).localCheckpoint()
    # Dangling mass for the FIRST iteration is the only one computed
    # by its own action; every later iteration's comes out of the same
    # collect as the convergence delta (see below), so the steady
    # state is two actions per iteration — the checkpoint
    # materialization and the combined (delta, dangling) aggregate —
    # and the ranks⋈degrees join runs once per iteration, inside the
    # contribs branch only.
    dangling = (
        ranks.join(degrees, "node", "left")
        .where(F.col("outdeg").isNull())
        .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("m"))
        .collect()[0]["m"]
    )

    for _ in range(max_iters):
        contribs = (
            ranks.join(degrees, "node", "left")
            .where(F.col("outdeg").isNotNull())
            .join(e, F.col("node") == e["src"])
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") * F.col("w") / F.col("outdeg")).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("c"))
        )
        base = (1.0 - damping) / n + damping * dangling / n
        new_ranks = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping) * F.coalesce("c", F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint()  # eager: truncates the iterative lineage
        )
        # one combined collect: convergence delta AND the next
        # iteration's dangling mass, both over checkpointed node-sized
        # frames (round-11 advice: the separate dangling action
        # re-evaluated the ranks⋈degrees join every iteration).
        row = (
            new_ranks.withColumnRenamed("rank", "new")
            .join(ranks.withColumnRenamed("rank", "old"), "node")
            .join(degrees, "node", "left")
            .agg(
                F.sum(F.abs(F.col("new") - F.col("old"))).alias("d"),
                F.coalesce(
                    F.sum(F.when(F.col("outdeg").isNull(), F.col("new"))),
                    F.lit(0.0),
                ).alias("m"),
            )
            .collect()[0]
        )
        delta, dangling = row["d"], row["m"]
        ranks = new_ranks
        if delta <= tol:
            break

    e.unpersist()
    degrees.unpersist()
    nodes.unpersist()
    return ranks
