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
rounds in practice. Each round is one edges⋈labels join + one
min-aggregation + one node-sized join that both applies the update
and detects convergence (the old label rides along as a column, so no
separate compare join). ``localCheckpoint`` cuts the lineage so plans
don't grow with the iteration count — the standard Spark pattern for
loops (same shape GraphX/GraphFrames uses under the hood).

Sizing: the candidate graph is orders of magnitude smaller than the
corpus (LSH emitted it precisely because few pairs collide), so the
iterative stages run at a parallelism derived from |edges|, not the
session's corpus-sized ``spark.sql.shuffle.partitions`` — a 256-edge
graph on 32 shuffle partitions spends its whole runtime scheduling
near-empty tasks (measured 5.1 s → ~1 s at sf0.1). Both inputs are
hash-repartitioned once on the join key, so every per-round shuffle
after that moves |edges| rows at worst.

At 100 TB: label propagation shuffles only |edges| + |touched nodes|
per round; the parallelism formula scales back up with the graph. The
large-diameter adversarial case (a long chain of near-dups) is
bounded by ``max_rounds``.

Pointer-doubling (label-of-label shortcutting, O(log diameter)
rounds) was considered and measured AGAINST: the sf0.1 LSH graph —
and any near-dup graph, since similarity is near-transitive —
converges in 2 rounds (233 components, all size 2-4; one round to
label, one to detect quiescence). Shortcutting adds a labels⋈labels
join per round to save rounds that dense dup-cliques never need; it
only wins on long chains, which the loud ``max_rounds`` guard already
surfaces explicitly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# target edges per task for the iterative stages; well below a task's
# comfortable capacity, but small graphs collapse to one task and huge
# graphs still fan out
_EDGES_PER_PARTITION = 250_000


def connected_components(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_rounds: int = 20,
    strict: bool = True,
    local_max_edges: int = 250_000,
) -> DataFrame:
    """→ (doc_id, cluster_id): every node appearing in ``pairs``,
    labeled with the minimum doc id reachable from it.

    A component whose diameter exceeds ``max_rounds`` (a pathological
    chain of near-dups) would come back SPLIT — near-duplicates
    silently retained. That must never be silent: with ``strict``
    (default) non-convergence raises; ``strict=False`` downgrades to a
    ``RuntimeWarning`` for callers that prefer partial clusters over a
    failed job. Either way the remedy is a larger ``max_rounds`` —
    rounds ≈ component diameter, so 20 covers any realistic dup graph.

    ``local_max_edges`` (round 14): a candidate graph at or below this
    many directed edges is solved DRIVER-SIDE by union-find after one
    bounded collect — exact, always-converged (max_rounds is
    irrelevant on this path), and it replaces the per-round
    join+aggregate jobs plus their checkpoints with a single action.
    The bound is the same boundedness contract as the repo's
    model/sketch collects: the edge list is already counted before the
    decision, 250k edges is a few MB of ids, and near-dup graphs are
    orders of magnitude smaller than their corpus by construction
    (LSH emitted them precisely because few pairs collide). Graphs
    above the bound run the distributed label-propagation loop
    unchanged — set ``local_max_edges=0`` to force it (the tests
    exercising loop convergence do)."""
    # both directions in ONE pass over pairs — a union of two selects
    # would compute the (possibly expensive, usually uncached) pair
    # pipeline twice
    both = pairs.select(
        F.explode(
            F.array(
                F.struct(F.col(a_col).alias("src"), F.col(b_col).alias("dst")),
                F.struct(F.col(b_col).alias("src"), F.col(a_col).alias("dst")),
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    staged = both.distinct().persist()
    n_edges = staged.count()  # also materializes the persist
    if n_edges == 0:
        staged.unpersist()
        # no nodes to label — lazily-empty frame, zero further jobs
        return pairs.select(
            F.col(a_col).alias("doc_id"), F.col(a_col).alias("cluster_id")
        ).limit(0)
    session = pairs.sparkSession
    rows = None
    if n_edges <= local_max_edges:
        rows = staged.collect()  # bounded by the guard just checked
        # null ids cannot take the driver path: `node < label[r]`
        # would compare None with a concrete id (TypeError), and the
        # distributed loop's null semantics are join-order-specific
        # (null-keyed edges drop from neighbor propagation but a null
        # node still self-labels through the aggregation) — rather
        # than replicate that corner here, route any graph containing
        # a null endpoint to the distributed loop, which remains the
        # semantics of record (round-14 ADVICE fix).
        if any(
            row["src"] is None or row["dst"] is None for row in rows
        ):
            rows = None
    if rows is not None:
        staged.unpersist()
        parent: dict = {}

        def find(x):
            r = x
            while parent[r] != r:
                r = parent[r]
            while parent[x] != r:
                parent[x], x = r, parent[x]
            return r

        for row in rows:
            s, d = row["src"], row["dst"]
            parent.setdefault(s, s)
            parent.setdefault(d, d)
            rs, rd = find(s), find(d)
            if rs != rd:
                parent[rs] = rd
        label: dict = {}
        for node in parent:
            r = find(node)
            if r not in label or node < label[r]:
                label[r] = node
        out = [(node, label[find(node)]) for node in parent]
        id_type = pairs.schema[a_col].dataType
        from pyspark.sql.types import StructField, StructType

        return session.createDataFrame(
            out,
            StructType(
                [
                    StructField("doc_id", id_type),
                    StructField("cluster_id", id_type),
                ]
            ),
        )
    default_par = int(session.conf.get("spark.sql.shuffle.partitions", "200"))
    n_part = max(1, min(default_par, n_edges // _EDGES_PER_PARTITION + 1))
    # checkpoint the right-sized edge table eagerly so the sizing-stage
    # cache can be dropped immediately (it would otherwise pin the
    # un-repartitioned copy for the whole loop)
    edges = staged.repartition(n_part, "dst").localCheckpoint(eager=True)
    staged.unpersist()

    # FUSED ROUND 1 (round 14): under identity initial labels the first
    # propagation is least(self, min over neighbors) — pure aggregation
    # over the edge table, no labels frame to build, no join. This
    # replaces three driver-synchronized jobs (initial-labels
    # checkpoint, round-1 update checkpoint, round-1 changed count)
    # with one; the explicit repartition keeps the loop's
    # co-partitioning contract (labels hash-partitioned by doc_id at
    # n_part, matching edges on dst). Round 1's changed count is not
    # observed — with any non-self edge it is nonzero, and convergence
    # is detected from round 2 exactly as before (max_rounds total
    # propagation rounds either way).
    labels = (
        edges.groupBy("src")
        .agg(F.least(F.col("src"), F.min("dst")).alias("cluster_id"))
        .withColumnRenamed("src", "doc_id")
        .repartition(n_part, "doc_id")
        .localCheckpoint(eager=True)
    )
    changed = n_edges  # sentinel: round 1 counts as still-moving
    for _ in range(max_rounds - 1):
        neighbor_min = (
            edges.join(
                labels.select(
                    F.col("doc_id").alias("dst"),
                    F.col("cluster_id").alias("dst_label"),
                ),
                "dst",
            )
            .groupBy("src")
            .agg(F.min("dst_label").alias("nbr_min"))
            .withColumnRenamed("src", "doc_id")
        )
        # lazy checkpoint: the changed-count action below materializes
        # the checkpoint AND folds the convergence probe into the same
        # job — one driver round-trip per round instead of two
        updated = (
            labels.join(neighbor_min, "doc_id", "left")
            .select(
                "doc_id",
                F.col("cluster_id").alias("old_label"),
                F.least(
                    F.col("cluster_id"),
                    F.coalesce(F.col("nbr_min"), F.col("cluster_id")),
                ).alias("cluster_id"),
            )
            .localCheckpoint(eager=False)
        )
        changed = updated.where(F.col("cluster_id") != F.col("old_label")).count()
        labels = updated.drop("old_label")
        if changed == 0:
            break
    # (edges is a localCheckpoint — its blocks are released by the
    # ContextCleaner once unreferenced; no explicit unpersist handle)
    if changed != 0:
        msg = (
            f"connected_components did not converge in {max_rounds} rounds "
            f"({changed} labels still changing): a component's diameter "
            "exceeds max_rounds and its cluster would be split. Raise "
            "max_rounds."
        )
        if strict:
            raise RuntimeError(msg)
        import warnings

        warnings.warn(msg, RuntimeWarning, stacklevel=2)
    return labels


def dedup_keep_canonical(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    scores: DataFrame | None = None,
    score_col: str = "score",
) -> DataFrame:
    """Drop every near-duplicate except its cluster's canonical
    representative; docs in no cluster pass through untouched.

    Default canonical = the minimum-id member (cheap, deterministic).
    With ``scores`` — an ``(id_col, score_col)`` frame, e.g. the
    model-based quality scorer's output (round-8 verdict #8) — the
    canonical is the HIGHEST-scoring member instead (ties → min id;
    unscored members rank after scored ones), so dedup keeps the best
    copy of each duplicate group, not an arbitrary one. Scale shape is
    unchanged: the score join and the rank window run on the
    graph-sized component frame, never the corpus.

    ``scores`` may also be a CALLABLE (round 15): it receives the
    member-id frame (one ``id_col`` row per pair-graph node — bounded
    by the graph, not the corpus) and returns the score frame. A
    scorer whose plan would otherwise score the whole corpus can
    semi-join on those ids and stay graph-sized — only members are
    ever ranked, so the kept set is identical."""
    comp = connected_components(pairs)
    if scores is None:
        losers = comp.where(F.col("cluster_id") != F.col(id_col)).select(
            F.col(id_col)
        )
        return docs.join(losers, id_col, "left_anti")
    if callable(scores):
        scores = scores(comp.select(F.col("doc_id").alias(id_col)))
    from pyspark.sql import Window

    member_scores = comp.join(
        scores.select(F.col(id_col), F.col(score_col).alias("_score")),
        id_col,
        "left",
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("_score").desc_nulls_last(), F.col(id_col).asc()
    )
    losers = (
        member_scores.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") > 1)
        .select(F.col(id_col))
    )
    return docs.join(losers, id_col, "left_anti")
