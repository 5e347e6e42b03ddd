"""Distributed spherical k-means over an embedding column — the
full-corpus companion of IVF's bounded-sample Lloyd refinement
(ivf.refine_centroids) and the cluster stage SemDeDup-style pipelines
run before per-cell dedup (dedup/semantic.py consumes exactly this
shape of clustering).

Where IVF trains on a bounded sample because its centroids only steer
probe pruning, a clustering OPERATOR must assign — and therefore
iterate over — the whole corpus. The Spark shape per Lloyd iteration:

* assignment: broadcast the k×d centroid matrix in a pandas-UDF
  closure and argmax a batch×k BLAS matmul per Arrow batch (ivf.py's
  assigner — one corpus scan, NO shuffle);
* update: ``posexplode`` each assigned vector and aggregate
  ``sum/count`` by (cluster, dimension) — Spark's partial (map-side)
  aggregation means the shuffle carries ~k·d rows PER TASK, not the
  corpus, and the driver collects exactly k·d aggregate rows to form
  the new means. No iteration ever moves corpus rows.

Cosine ("spherical") geometry matches the rest of the repo's
similarity stack: vectors and centroids are L2-normalized for
assignment, centroid updates are means of the NORMALIZED members —
the spherical-k-means maximizer of the cosine objective (a raw mean
would be magnitude-weighted: one large-norm outlier could out-vote a
majority direction). Empty clusters keep their previous centroid. Convergence is
max centroid movement (L2) < ``tol`` or ``max_iters``, whichever
first; k-means is inherently a driver-looped iterative algorithm, so
the loop is bounded and each round's cost is stated above.

Determinism: seeds are the hash-ordered corpus sample (ivf.py), ties
argmax toward the lower cluster id, and per-iteration means are
float64 aggregates — across identical layouts runs repeat exactly;
across different partitionings the means can differ by float ulps
(aggregation order), which tests treat as tolerance, not identity.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_data_lake_spark.functions.vectors import as_double
from etl_data_lake_spark.similarity.ivf import _probe_udf, sample_centroids


def assign_clusters(
    corpus: DataFrame,
    centroids: list[list[float]],
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """(id, cluster) for every corpus row: nearest centroid by cosine,
    one Arrow-batched scan, no shuffle (the k×d matrix broadcasts in
    the UDF closure)."""
    assign = _probe_udf(centroids, 1)
    return corpus.select(
        F.col(id_col),
        F.element_at(assign(as_double(vec_col)), 1).alias("cluster"),
    )


def _mean_update(
    assigned: DataFrame, old: list[list[float]]
) -> tuple[list[list[float]], float]:
    """New centroids = per-cluster dimension means of the L2-NORMALIZED
    members (empty clusters keep their old centroid), plus the max L2
    shift. Normalizing before the mean is what makes the update the
    maximizer of the cosine objective — a raw mean is magnitude-
    weighted, so one large-norm outlier could drag a centroid off the
    majority direction and the objective could loosen between
    iterations. One k·d-row driver collect; the shuffle is map-side
    combined. The HOF normalization lives DOWNSTREAM of the
    assignment UDF's stage and only JVM operators consume it (the
    r3 lambda-into-pandas-UDF trap does not apply)."""
    norm = F.sqrt(
        F.aggregate(
            F.col("_v"), F.lit(0.0), lambda a, x: a + x * x
        )
    )
    vn = F.transform(
        F.col("_v"), lambda x: x / F.greatest(norm, F.lit(1e-300))
    )
    rows = (
        assigned.select(
            "cluster", F.posexplode(vn).alias("pos", "val")
        )
        .groupBy("cluster", "pos")
        .agg(F.sum("val").alias("s"), F.count("*").alias("n"))
        .collect()
    )
    c = np.asarray(old, dtype=np.float64)
    sums = np.zeros_like(c)
    counts = np.zeros(len(old), dtype=np.int64)
    for r in rows:
        sums[r["cluster"], r["pos"]] = r["s"]
        counts[r["cluster"]] = r["n"]
    new = c.copy()
    nonempty = counts > 0
    new[nonempty] = sums[nonempty] / counts[nonempty, None]
    shift = float(np.sqrt(((new - c) ** 2).sum(axis=1)).max())
    return [list(map(float, row)) for row in new], shift


def kmeans_fit(
    corpus: DataFrame,
    n_clusters: int,
    id_col: str,
    vec_col: str,
    max_iters: int = 8,
    tol: float = 1e-6,
) -> tuple[list[list[float]], DataFrame]:
    """Fit spherical k-means over the full corpus; returns
    ``(centroids, assignments)`` where assignments is the lazily
    evaluated (id, cluster) frame under the FINAL centroids. The
    corpus projection is persisted for the duration of the driver
    loop (each iteration re-scans it) and unpersisted before
    returning — the returned assignment frame re-derives from the
    caller's corpus, so no cache ownership leaks."""
    if n_clusters < 1:
        raise ValueError(f"n_clusters must be >= 1, got {n_clusters}")
    prepared = corpus.select(
        F.col(id_col), as_double(vec_col).alias("_v")
    ).persist()
    try:
        centroids = sample_centroids(prepared, n_clusters, id_col, "_v")
        if not centroids:
            raise ValueError("empty corpus")
        for _ in range(max_iters):
            assigned = prepared.select(
                F.element_at(
                    _probe_udf(centroids, 1)(F.col("_v")), 1
                ).alias("cluster"),
                "_v",
            )
            centroids, shift = _mean_update(assigned, centroids)
            if shift < tol:
                break
    finally:
        prepared.unpersist()
    return centroids, assign_clusters(corpus, centroids, id_col, vec_col)


def clustering_inertia(
    corpus: DataFrame,
    centroids: list[list[float]],
    id_col: str,
    vec_col: str,
) -> float:
    """Mean cosine similarity of each vector to its assigned centroid
    — the spherical analog of (negative) k-means inertia; higher is
    tighter. One scan, one scalar."""
    from pyspark.sql.functions import pandas_udf

    c = np.asarray(centroids, dtype=np.float64)
    cn = c / np.maximum(np.linalg.norm(c, axis=1, keepdims=True), 1e-300)

    def best(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series([], dtype="float64")
        v = np.stack(vs.to_numpy()).astype(np.float64)
        vn = v / np.maximum(
            np.linalg.norm(v, axis=1, keepdims=True), 1e-300
        )
        return pd.Series((vn @ cn.T).max(axis=1))

    sim = pandas_udf(best, "double")
    row = (
        corpus.select(sim(as_double(vec_col)).alias("s"))
        .agg(F.avg("s").alias("m"))
        .collect()[0]
    )
    return float(row["m"])
