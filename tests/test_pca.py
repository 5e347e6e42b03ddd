"""Distributed PCA (similarity/pca.py): one-pass covariance partials,
agreement with local numpy PCA, orthonormal deterministic components,
monotone reconstruction error."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from etl_data_lake_spark.similarity.pca import (
    pca_fit,
    pca_reconstruct,
    pca_transform,
)

SF_DIR = "/root/testdata/sf0.001"


def _emb(spark):
    from etl_data_lake_spark.sources.catalog import load_table

    return load_table(spark, SF_DIR, "embeddings")


def _local(spark):
    rows = _emb(spark).select("embedding").collect()
    return np.asarray([r["embedding"] for r in rows], dtype=np.float64)


def test_matches_local_numpy_pca(spark):
    x = _local(spark)
    model = pca_fit(_emb(spark), "embedding", k=8)
    mean = x.mean(axis=0)
    assert np.allclose(model.mean, mean, atol=1e-9)
    cov = np.cov(x, rowvar=False)
    evals, evecs = np.linalg.eigh(cov)
    top = np.argsort(evals)[::-1][:8]
    assert np.allclose(
        model.explained_variance, evals[top], rtol=1e-9, atol=1e-9
    )
    # axes agree up to sign
    for i, o in enumerate(top):
        c = np.asarray(model.components[i])
        assert abs(float(c @ evecs[:, o])) > 1 - 1e-9
    assert abs(model.total_variance - np.trace(cov)) < 1e-9
    # ratios sum below 1 and descend
    r = model.explained_variance_ratio
    assert all(a >= b for a, b in zip(r, r[1:])) and 0 < sum(r) <= 1 + 1e-12


def test_components_orthonormal_and_layout_invariant(spark):
    emb = _emb(spark)
    m1 = pca_fit(emb, "embedding", k=6)
    w = np.asarray(m1.components)
    assert np.allclose(w @ w.T, np.eye(6), atol=1e-9)
    m2 = pca_fit(emb.repartition(13), "embedding", k=6)
    assert np.allclose(m1.components, m2.components, atol=1e-6)
    assert np.allclose(m1.mean, m2.mean, atol=1e-9)


def test_transform_and_reconstruction_error_monotone(spark):
    emb = _emb(spark)
    x = _local(spark)
    errs = []
    for k in (2, 8, 32, 64):
        model = pca_fit(emb, "embedding", k=k)
        rec = pca_reconstruct(
            pca_transform(emb, model, "embedding", "z"), model, "z", "xr"
        )
        row = rec.select(
            F.avg(
                F.aggregate(
                    F.zip_with(
                        "embedding",
                        "xr",
                        lambda a, b: (a.cast("double") - b) ** 2,
                    ),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                )
            ).alias("mse")
        ).collect()[0]
        errs.append(row["mse"])
    assert errs == sorted(errs, reverse=True)
    assert errs[-1] < 1e-15  # k = d reconstructs exactly
    # transform agrees with local projection
    model = pca_fit(emb, "embedding", k=4)
    got = {
        r["vec_id"]: np.asarray(r["z"])
        for r in pca_transform(emb, model, "embedding", "z")
        .select("vec_id", "z")
        .collect()
    }
    ids = [r["vec_id"] for r in _emb(spark).select("vec_id").collect()]
    w = np.asarray(model.components)
    mu = np.asarray(model.mean)
    want = (x - mu) @ w.T
    for i, vid in enumerate(ids):
        assert np.allclose(got[vid], want[i], atol=1e-9)


def test_null_vectors_and_validation(spark):
    emb = _emb(spark).withColumn(
        "embedding",
        F.when(F.col("vec_id") % 7 == 0, F.lit(None)).otherwise(
            F.col("embedding")
        ),
    )
    model = pca_fit(emb, "embedding", k=3)  # nulls skipped in fit
    out = pca_transform(emb, model, "embedding", "z")
    nulls = out.where(F.col("z").isNull()).count()
    assert nulls == out.where(F.col("embedding").isNull()).count() > 0
    with pytest.raises(ValueError, match="k must be"):
        pca_fit(emb, "embedding", k=0)
    with pytest.raises(ValueError, match="exceeds"):
        pca_fit(emb, "embedding", k=65)
    empty = emb.where(F.lit(False))
    with pytest.raises(ValueError, match="empty corpus"):
        pca_fit(empty, "embedding", k=2)
