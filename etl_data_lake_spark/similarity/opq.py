"""OPQ-lite: PCA rotation in front of product quantization.

PQ (pq.py) quantizes fixed, blind subspace slices ``[0:d/m)``,
``[d/m:2d/m)``, … — when dimensions are correlated ACROSS slice
boundaries, every sub-codebook wastes its budget re-encoding shared
variance, and ADC candidate quality drops. The public fix (Ge et al.,
"Optimized Product Quantization", CVPR 2013) alternates rotation and
codebook learning; its standard initialization — and the bulk of the
win on natural embeddings — is simply rotating into the PCA
eigenbasis first, which decorrelates dimensions globally so each
slice carries independent energy. This module implements exactly that
composition over the pieces the package already has:

* the rotation is the FULL-d eigenbasis of the normalized corpus
  (pca_fit with k=d — one distributed Gram pass, O(partitions·d²)
  driver traffic, nothing new to maintain) with the paper's
  EIGENVALUE ALLOCATION on top: raw variance ordering would dump all
  the energy into PQ's FIRST slice (measured here: recall@10 fell
  0.82 → 0.29 at m=8/ks=16/refine 2 — worse than no rotation at
  all), so dimensions are greedily dealt to the m slices balancing
  each slice's log-variance product (Ge et al. §3.2), which is what
  actually equalizes the sub-quantizers' workloads;
* rotation is applied WITHOUT centering or truncation: an orthonormal
  change of basis preserves every inner product EXACTLY, so cosine in
  rotated space IS cosine in the original space — the exact-refine
  scores pq_topk emits are unchanged (test-pinned to 6dp), only the
  CANDIDATE GENERATION improves;
* ``opq_topk`` is then literally rotate-both-sides + ``pq_topk`` —
  same contract, same filtered-query semantics, same structural-k.

At 100 TB: the rotation adds one Arrow-batched matmul per scan of
each side (d×d broadcast in the UDF closure — 32 KB at d=64) and
changes no shuffle. Fit once, serve forever: pass ``rotation=`` to
amortize, exactly like sq's ``bounds=`` / bq's ``thresholds=``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_data_lake_spark.functions.vectors import as_double
from etl_data_lake_spark.similarity.pca import pca_fit
from etl_data_lake_spark.similarity.pq import pq_topk


def _normalized_col(corpus: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    v = as_double(vec_col)
    nrm = F.greatest(
        F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x)),
        F.lit(1e-300),
    )
    return corpus.select(
        F.col(id_col),
        F.transform(v, lambda x: x / nrm).alias(vec_col),
    )


def allocate_eigenvalues(evals: np.ndarray, m: int) -> np.ndarray:
    """Ge et al.'s eigenvalue allocation, round-constrained: deal the
    variance-sorted dimensions to ``m`` equal-capacity buckets so the
    per-bucket log-variance PRODUCTS balance. The paper's bare
    min-product greedy silently degenerates on normalized-embedding
    spectra (every λ < 1 ⇒ the first bucket's product drops below the
    empty buckets' 1 and it swallows the whole top of the spectrum —
    measured: reproduces variance ordering exactly); constraining the
    greedy to equal bucket counts per round (assign the m largest
    remaining eigenvalues to the m buckets, largest → smallest current
    log-sum) makes the product comparison meaningful at any scale and
    is scale-INVARIANT (multiplying all λ by c shifts every bucket sum
    equally within a round).
    → (d,) index array: position i holds the eigenbasis row assigned
    to output dimension i (bucket-major: slice j = rows j·d/m …)."""
    d = len(evals)
    if d % m != 0:
        raise ValueError(f"d={d} must be divisible by m={m}")
    cap = d // m
    logs = np.log(np.maximum(np.asarray(evals, dtype=np.float64), 1e-30))
    buckets: list[list[int]] = [[] for _ in range(m)]
    sums = np.zeros(m)
    order = np.argsort(logs)[::-1]  # largest variance first
    for r in range(cap):
        taken: set[int] = set()
        for dim in order[r * m : (r + 1) * m]:
            j = min(
                (j for j in range(m) if j not in taken),
                key=lambda j: (sums[j], j),
            )
            buckets[j].append(int(dim))
            sums[j] += logs[dim]
            taken.add(j)
    return np.array([dim for b in buckets for dim in b], dtype=np.int64)


def fit_rotation(
    corpus: DataFrame,
    m: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """→ (d, d) orthonormal rotation: the full eigenbasis of the
    L2-normalized corpus's covariance, rows PERMUTED by eigenvalue
    allocation for ``m`` PQ slices — decorrelated dimensions with the
    variance balanced across the sub-quantizers. A permutation of an
    orthonormal basis is still orthonormal, so inner products stay
    exact."""
    first = corpus.select(F.size(as_double(vec_col)).alias("d")).first()
    if first is None:
        raise ValueError("cannot fit a rotation on an empty corpus")
    d = int(first["d"])
    model = pca_fit(
        _normalized_col(corpus, id_col, vec_col), vec_col, k=d
    )
    R = np.asarray(model.components, dtype=np.float64)  # (d, d)
    order = allocate_eigenvalues(
        np.asarray(model.explained_variance, dtype=np.float64), m
    )
    return R[order]


def rotate_vectors(
    df: DataFrame,
    rotation: np.ndarray,
    vec_col: str = "embedding",
) -> DataFrame:
    """Every vector replaced by ``x @ Rᵀ`` in place (all other columns
    kept) — no centering, no truncation, so all inner products (hence
    all cosines) are preserved exactly. One Arrow-batched matmul per
    batch; the d×d matrix rides the UDF closure."""
    from pyspark.sql.functions import pandas_udf

    R = np.asarray(rotation, dtype=np.float64)
    if R.ndim != 2 or R.shape[0] != R.shape[1]:
        raise ValueError(f"rotation must be square (d, d), got {R.shape}")

    def rot(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series([], dtype=object)
        x = np.stack(vs.to_numpy()).astype(np.float64)
        return pd.Series(list(x @ R.T))

    u = pandas_udf(rot, "array<double>")
    # replace vec_col IN PLACE, keep every other column — predicates
    # on metadata columns must survive the rotation (filtered ANN)
    return df.select(
        *[
            u(as_double(c)).alias(c) if c == vec_col else F.col(c)
            for c in df.columns
        ]
    )


def opq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    m: int = 8,
    ks: int = 32,
    refine_factor: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_size: int = 2048,
    kmeans_iters: int = 8,
    predicate=None,
    rotation: np.ndarray | None = None,
) -> DataFrame:
    """PQ top-k in the PCA-rotated basis — pq_topk's exact contract
    ((query_id, neighbor_id, cos_sim, rank), self-matches excluded,
    full refine ≡ brute force, ``predicate`` masks the code scan)
    with better ADC candidates on correlated corpora. ``rotation``
    (from :func:`fit_rotation`) skips the fitting scan when serving
    many batches off one basis."""
    if rotation is None:
        rotation = fit_rotation(corpus, m, id_col, vec_col)
    # rotation preserves metadata columns, so the predicate passes
    # straight through and pq_topk's contract (codebooks trained
    # predicate-agnostic on the full corpus, filter masks the code
    # scan) holds unchanged
    rc = rotate_vectors(corpus, rotation, vec_col)
    rq = rotate_vectors(queries, rotation, vec_col)
    return pq_topk(
        rc,
        rq,
        k=k,
        m=m,
        ks=ks,
        refine_factor=refine_factor,
        id_col=id_col,
        vec_col=vec_col,
        train_size=train_size,
        kmeans_iters=kmeans_iters,
        predicate=predicate,
    )
