"""Distributed PCA over an embedding column — the dimensionality
reducer that sits between raw encoder output and the ANN / semantic
dedup stack (PQ codebooks, IVF cells and SemDeDup blocking all get
cheaper and often *better* after dropping the noise tail of the
spectrum; OPQ-style pipelines are literally PCA → PQ).

Algorithm — the one-pass covariance shape:

* each partition folds its vectors into ``(count, sum, Gram)`` with a
  single BLAS ``X.T @ X`` per Arrow batch (``mapInPandas``) and emits
  ONE row of d + d² doubles;
* the driver sums the ≤ num_partitions partials (kilobytes at d=64 —
  the classic treeAggregate shape: traffic is O(partitions · d²),
  independent of corpus size), forms the covariance
  ``(G − n·μμᵀ)/(n−1)``, and eigendecomposes the d×d symmetric matrix
  locally (``numpy.linalg.eigh`` — d is embedding width, never data
  size);
* components are sign-normalized (largest-|loading| coordinate made
  positive) so the model is deterministic up to float-sum ordering;
* ``pca_transform`` projects in-plan via one Arrow-batched pandas UDF
  per row-batch: ``(x − μ) @ Wᵀ`` — no shuffle, no driver involvement,
  composes with everything downstream (the output is a plain
  attribute column).

At 100 TB: fit = one full scan with map-side folding and a
partition-count-sized collect; transform = embarrassingly parallel
scan. Nothing here is quadratic in rows.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

_PARTIAL_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("s", ArrayType(DoubleType())),
        StructField("g", ArrayType(DoubleType())),
    ]
)


@dataclass(frozen=True)
class PcaModel:
    """Fitted projection: ``mean`` (d,), ``components`` (k, d) rows =
    principal axes in variance order, ``explained_variance`` (k,) the
    matching eigenvalues, ``total_variance`` = trace of the covariance
    (so ratios don't need a second pass)."""

    mean: tuple[float, ...]
    components: tuple[tuple[float, ...], ...]
    explained_variance: tuple[float, ...]
    total_variance: float

    @property
    def explained_variance_ratio(self) -> tuple[float, ...]:
        t = self.total_variance
        return tuple(v / t for v in self.explained_variance) if t else tuple(
            0.0 for _ in self.explained_variance
        )


def pca_fit(df: DataFrame, vec_col: str, k: int) -> PcaModel:
    """Fit a ``k``-component PCA over ``vec_col`` (array<float|double>,
    fixed width). One distributed pass; null vectors are skipped."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")

    def partials(batches):
        n, s, g = 0, None, None
        for pdf in batches:
            vecs = pdf[vec_col].dropna()
            if not len(vecs):
                continue
            x = np.asarray(list(vecs), dtype=np.float64)
            n += x.shape[0]
            s = x.sum(axis=0) if s is None else s + x.sum(axis=0)
            gram = x.T @ x
            g = gram if g is None else g + gram
        if n:
            yield pd.DataFrame(
                {"n": [n], "s": [s.tolist()], "g": [g.ravel().tolist()]}
            )

    rows = (
        df.select(vec_col)
        .mapInPandas(partials, schema=_PARTIAL_SCHEMA)
        .collect()
    )
    if not rows:
        raise ValueError("empty corpus (no non-null vectors)")
    n = sum(r["n"] for r in rows)
    d = len(rows[0]["s"])
    if k > d:
        raise ValueError(f"k={k} exceeds vector width d={d}")
    if n < 2:
        raise ValueError("PCA needs at least 2 vectors")
    s = np.zeros(d)
    g = np.zeros((d, d))
    for r in rows:
        s += np.asarray(r["s"])
        g += np.asarray(r["g"]).reshape(d, d)
    mean = s / n
    cov = (g - n * np.outer(mean, mean)) / (n - 1)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T  # (k, d)
    # sign convention: the largest-|loading| coordinate of each
    # component is positive — eigh's sign is arbitrary otherwise
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return PcaModel(
        mean=tuple(mean.tolist()),
        components=tuple(tuple(c) for c in comps.tolist()),
        explained_variance=tuple(
            max(float(evals[o]), 0.0) for o in order
        ),
        total_variance=float(np.trace(cov)),
    )


def pca_transform(
    df: DataFrame,
    model: PcaModel,
    vec_col: str,
    out_col: str = "pca",
) -> DataFrame:
    """Append ``out_col`` = the k-dim projection of ``vec_col``
    (centered, then rotated onto the principal axes). Null vectors
    project to null. Pure per-row Arrow-batched math — no shuffle."""
    mean = np.asarray(model.mean)
    w = np.asarray(model.components)  # (k, d)

    @F.pandas_udf(ArrayType(DoubleType()))
    def project(vs: pd.Series) -> pd.Series:
        def one(v):
            if v is None:
                return None
            return ((np.asarray(v, dtype=np.float64) - mean) @ w.T).tolist()

        return vs.map(one)

    return df.withColumn(out_col, project(F.col(vec_col)))


def pca_reconstruct(
    df: DataFrame,
    model: PcaModel,
    proj_col: str,
    out_col: str = "reconstructed",
) -> DataFrame:
    """Inverse transform: lift a projection back to the original space
    (``z @ W + μ``) — the decode half for archival/compression use,
    mirroring pq_reconstruct."""
    mean = np.asarray(model.mean)
    w = np.asarray(model.components)

    @F.pandas_udf(ArrayType(DoubleType()))
    def lift(zs: pd.Series) -> pd.Series:
        def one(z):
            if z is None:
                return None
            return (np.asarray(z, dtype=np.float64) @ w + mean).tolist()

        return zs.map(one)

    return df.withColumn(out_col, lift(F.col(proj_col)))
