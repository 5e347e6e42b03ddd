"""Distributed spherical k-means (similarity/kmeans.py): full-corpus
Lloyd iterations whose assignment pass never shuffles and whose update
shuffle carries k·d aggregate rows, not the corpus."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from etl_data_lake_spark.similarity.kmeans import (
    assign_clusters,
    clustering_inertia,
    kmeans_fit,
    sample_centroids,
)

DIMS = 8


@pytest.fixture(scope="module")
def planted(spark):
    """300 vectors in 3 well-separated direction clusters (spherical
    k-means separates by ANGLE, so the planted centers are orthogonal
    axes with small in-cluster jitter)."""
    rows = []
    rng = np.random.RandomState(7)
    for i in range(300):
        center = i % 3
        v = rng.normal(0, 0.05, DIMS)
        v[center] += 1.0
        rows.append((i, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_recovers_planted_clusters(spark, planted):
    cents, assigned = kmeans_fit(planted, 3, "vec_id", "embedding")
    rows = assigned.collect()
    assert sorted(r["vec_id"] for r in rows) == list(range(300))
    # every planted group maps to ONE fitted cluster, and the three
    # groups map to three distinct clusters (pure recovery)
    by_group: dict[int, set] = {}
    for r in rows:
        by_group.setdefault(r["vec_id"] % 3, set()).add(r["cluster"])
    assert all(len(s) == 1 for s in by_group.values())
    assert len(set().union(*by_group.values())) == 3
    # each centroid points along its cluster's planted axis
    for ci in set().union(*by_group.values()):
        c = np.asarray(cents[ci])
        assert np.argmax(np.abs(c)) in (0, 1, 2)


def test_iterations_tighten_the_clustering(spark, planted):
    seeds = sample_centroids(
        planted.select("vec_id", F.col("embedding").alias("_v")),
        3,
        "vec_id",
        "_v",
    )
    before = clustering_inertia(planted, seeds, "vec_id", "embedding")
    cents, _ = kmeans_fit(planted, 3, "vec_id", "embedding")
    after = clustering_inertia(planted, cents, "vec_id", "embedding")
    assert after >= before - 1e-9  # Lloyd never loosens the objective


def test_more_clusters_than_points_survives(spark):
    tiny = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [1.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    cents, assigned = kmeans_fit(tiny, 5, "vec_id", "embedding")
    # seeds come from a 3-row corpus: k collapses to what exists
    assert 1 <= len(cents) <= 5
    assert assigned.count() == 3
    assert assigned.where(F.col("cluster").isNull()).count() == 0


def test_assignment_is_layout_invariant(spark, planted):
    cents, _ = kmeans_fit(planted, 3, "vec_id", "embedding")
    a = assign_clusters(planted, cents, "vec_id", "embedding")
    b = assign_clusters(
        planted.repartition(11), cents, "vec_id", "embedding"
    )
    # FIXED centroids: assignment is a pure row function — identical
    # under any partitioning
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_validation(spark, planted):
    with pytest.raises(ValueError, match="n_clusters"):
        kmeans_fit(planted, 0, "vec_id", "embedding")


def test_update_is_magnitude_invariant(spark):
    """The centroid update averages NORMALIZED members: one large-norm
    outlier must not out-vote a majority direction (review
    regression — a raw mean is magnitude-weighted)."""
    rows = [(0, [100.0, 0.0, 0.0])] + [
        (i, [0.01, 1.0, 0.0]) for i in range(1, 4)
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    )
    cents, _ = kmeans_fit(df, 1, "vec_id", "embedding")
    c = np.asarray(cents[0])
    # 3 of 4 members point along axis 1; the normalized mean follows
    # the majority even though the axis-0 member has 100x the norm
    assert np.argmax(np.abs(c)) == 1
