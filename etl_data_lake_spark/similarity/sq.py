"""Scalar quantization (SQ8) — one byte per DIMENSION, the simplest
memory-residency codec for embeddings.

The fourth compression/serving path beside sign-LSH (lsh.py), IVF
(ivf.py), and PQ (pq.py) — FAISS's ScalarQuantizer QT_8bit in its
public formulation: each dimension of the L2-normalized vector maps
linearly onto 256 levels between that dimension's corpus-wide
[min, max]. Where PQ buys m bytes/vector by quantizing SUBSPACES
against learned codebooks, SQ8 spends d bytes/vector, needs no
codebook training at all, and reconstructs far tighter (per-dim error
≤ span/510 vs PQ's cluster radius) — the right trade when vectors are
low-dimensional (d ≤ a few hundred) or when the archive must round-trip
with bounded per-component error, and the easiest first step off
float32 (4× smaller, no recall cliff).

Spark-first training: the quantizer is just per-dimension [min, max]
over the normalized corpus, so it trains as ONE distributed
aggregation — 2·d scalar aggregates, map-side combined, the shuffle
carries 2·d numbers regardless of corpus size. No sampling, no
iteration, exact (contrast pq.train_codebooks' bounded-sample Lloyd —
k-means needs the sample; min/max doesn't).

Scoring: the reconstruction is affine in the code
(``vmin + (code+128)/255·span``), so the approximate inner product
is ``dot(q, vmin) + (codes+128)·W`` with ``W = q·span/255`` — a
single numpy matmul per Arrow batch over the 1-byte codes, never
touching the original floats. The map-side partial top-k keeps only
``k·refine_factor`` candidates per query per batch (pq's
scale discipline: the shuffle carries candidates, not the corpus),
and the exact JVM-fold cosine re-scores the survivors, so emitted
scores are bit-deterministic and ``refine_factor`` covering the
corpus reproduces brute force exactly (test-pinned).

``predicate`` = filtered ANN: bounds stay predicate-agnostic (trained
on the full corpus — one codec serves every filter) while the filter
masks the CODE scan before scoring, so the partial top-k competes
only among matching vectors and k is guaranteed structurally whenever
the filtered corpus holds k rows (pq_topk's contract).

Storage honesty: codes are ``array<tinyint>`` — truly one byte per
dimension on the wire and in parquet (offset by −128 into the signed
range), 4× under float32 and 8× under float64.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from etl_data_lake_spark.functions.vectors import as_double, cosine
from etl_data_lake_spark.sources.catalog import fan_out

_EPS = 1e-30


def _normalize(x: np.ndarray) -> np.ndarray:
    return x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-300)


def train_sq(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """→ (2, d) bounds [vmin; vmax] — per-dimension min/max of the
    L2-NORMALIZED corpus, computed exactly in one scan.

    Shape: ``posexplode`` + groupBy(pos) — the map-side combine
    reduces each task to d (lo, hi) partials before the shuffle, so
    the shuffle carries O(partitions·d) rows and the driver reads d
    rows, at ANY corpus size. The previous form built 2·d named
    aggregate expressions, which bloated codegen compilation linearly
    in d (seconds of driver time per execution at d in the hundreds,
    the realistic embedding regime)."""
    first = corpus.select(
        F.size(as_double(vec_col)).alias("d")
    ).first()
    if first is None:
        raise ValueError("cannot train SQ bounds on an empty corpus")
    d = int(first["d"])
    # fan_out BEFORE the normalize+explode: the training scan inherits
    # the source's file partitioning — a single-file corpus (or a
    # 1-partition cache of it) runs the whole d-way explode + partial
    # min/max in ONE task (measured 434 ms serial at bench scale, the
    # largest serial segment of the SQ plan). The repartition carries
    # the raw vectors only; min/max are order-independent, so the
    # changed grouping of partial aggregates is bit-neutral.
    c = fan_out(corpus.select(as_double(vec_col).alias("_v")))
    v = F.col("_v")
    nrm = F.greatest(
        F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x)),
        F.lit(1e-300),
    )
    rows = (
        c.select(
            F.posexplode(F.transform(v, lambda x: x / nrm)).alias("pos", "x")
        )
        .groupBy("pos")
        .agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
        .collect()
    )
    lo = np.zeros(d, dtype=np.float64)
    hi = np.zeros(d, dtype=np.float64)
    for r in rows:
        lo[r["pos"]] = r["lo"]
        hi[r["pos"]] = r["hi"]
    return np.stack([lo, hi])


def _sq_encode_udf(bounds: np.ndarray):
    """array<double> → array<tinyint> pandas UDF for the trained
    bounds — shared by :func:`sq_encode` and the persisted index's
    posting writer (similarity/index.py)."""
    from pyspark.sql.functions import pandas_udf

    lo, hi = bounds[0], bounds[1]
    span = np.maximum(hi - lo, _EPS)

    def encode(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series([], dtype=object)
        v = _normalize(np.stack(vs.to_numpy()).astype(np.float64))
        levels = np.rint((v - lo) / span * 255.0)
        codes = (np.clip(levels, 0, 255) - 128).astype(np.int8)
        return pd.Series(list(codes))

    return pandas_udf(encode, "array<tinyint>")


def sq_encode(
    corpus: DataFrame,
    bounds: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """→ (neighbor_id, codes array<tinyint>): the d-byte-per-vector
    compressed corpus. Values OUTSIDE the trained bounds (vectors
    added after training) clamp to the nearest level — degraded, not
    wrong, exactly like any deployed scalar quantizer."""
    enc = _sq_encode_udf(bounds)
    c = fan_out(
        corpus.select(
            F.col(id_col).alias("neighbor_id"),
            as_double(vec_col).alias("cv"),
        )
    )
    return c.select("neighbor_id", enc(F.col("cv")).alias("codes"))


def sq_reconstruct(
    coded: DataFrame,
    bounds: np.ndarray,
    codes_col: str = "codes",
) -> DataFrame:
    """Inverse of :func:`sq_encode` up to quantization: each code
    expands to ``vmin + (code+128)/255·span`` in normalized space —
    per-dimension absolute error ≤ span/510 (half a level), the
    fidelity bound the tests pin. Arrow-batched, no shuffle."""
    from pyspark.sql.functions import pandas_udf

    lo = bounds[0]
    span = np.maximum(bounds[1] - bounds[0], _EPS)

    def decode(cs: pd.Series) -> pd.Series:
        if len(cs) == 0:
            return pd.Series([], dtype=object)
        codes = np.stack(cs.to_numpy()).astype(np.float64) + 128.0
        return pd.Series(list(lo + codes / 255.0 * span))

    dec = pandas_udf(decode, "array<double>")
    keep = [c for c in coded.columns if c != codes_col]
    return coded.select(*keep, dec(F.col(codes_col)).alias("vector"))


def _encode_score_partial_topk(
    bounds: np.ndarray, W: np.ndarray, const: np.ndarray, n_keep: int
):
    """mapInPandas generator: (neighbor_id, cv) RAW-VECTOR batches →
    per-batch top-``n_keep`` approximate-score candidates per query —
    :func:`_sq_encode_udf`'s quantization and :func:`_sq_partial_topk`'s
    scoring fused into ONE Python pass. Separate operators plan as
    ArrowEvalPython → MapInPandas chained inside one stage: two
    JVM↔Python round-trips per task and two pinned Python workers per
    core (the measured pq stall — see pq._encode_score_partial_topk).
    The byte codes are identical int8 levels re-offset to the same
    float64 values, so emitted candidates are bit-equal to the
    two-operator form."""
    lo = bounds[0]
    span = np.maximum(bounds[1] - bounds[0], _EPS)

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            v = _normalize(np.stack(pdf["cv"].to_numpy()).astype(np.float64))
            levels = np.rint((v - lo) / span * 255.0)
            codes = (np.clip(levels, 0, 255) - 128).astype(np.int8)
            codes = codes.astype(np.float64) + 128.0
            scores = codes @ W + const[None, :]  # (n, n_q)
            n_q = W.shape[1]
            sc_t = scores.T
            long = pd.DataFrame(
                {
                    "neighbor_id": np.tile(
                        pdf["neighbor_id"].to_numpy(), n_q
                    ),
                    "q_i": np.repeat(
                        np.arange(n_q, dtype=np.int32), len(codes)
                    ),
                    "adc": sc_t.reshape(-1),
                }
            )
            yield (
                long.sort_values(
                    ["q_i", "adc", "neighbor_id"],
                    ascending=[True, False, True],
                )
                .groupby("q_i", sort=False)
                .head(n_keep)
            )

    return gen


def _sq_partial_topk(
    W: np.ndarray, const: np.ndarray, n_keep: int, cell_sets=None
):
    """mapInPandas generator: (neighbor_id, codes) batches → per-batch
    top-``n_keep`` approximate-score candidates PER QUERY as
    (neighbor_id, q_i, adc) rows — pq's map-side partial top-k with
    the m·ks table gather replaced by one (batch × d)·(d × n_q)
    matmul over the byte codes (the affine-reconstruction identity in
    the module docstring).

    ``cell_sets`` (IVF-SQ composition, similarity/index.py): per-query
    sets of probed IVF cells; batches must then carry a ``cell``
    column, and a row only scores for queries whose probe set owns
    its cell — same per-query semantics as pq._adc_partial_topk."""

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            codes = (
                np.stack(pdf["codes"].to_numpy()).astype(np.float64)
                + 128.0
            )
            scores = codes @ W + const[None, :]  # (n, n_q)
            n_q = W.shape[1]
            sc_t = scores.T  # (n_q, n)
            if cell_sets is not None:
                cells = pdf["cell"].to_numpy()
                for qi, cs in enumerate(cell_sets):
                    sc_t[qi, ~np.isin(cells, sorted(cs))] = -np.inf
            long = pd.DataFrame(
                {
                    "neighbor_id": np.tile(
                        pdf["neighbor_id"].to_numpy(), n_q
                    ),
                    "q_i": np.repeat(
                        np.arange(n_q, dtype=np.int32), len(codes)
                    ),
                    "adc": sc_t.reshape(-1),
                }
            )
            if cell_sets is not None:
                long = long[np.isfinite(long["adc"].to_numpy())]
            yield (
                long.sort_values(
                    ["q_i", "adc", "neighbor_id"],
                    ascending=[True, False, True],
                )
                .groupby("q_i", sort=False)
                .head(n_keep)
            )

    return gen


def sq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    refine_factor: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    predicate=None,
    bounds: np.ndarray | None = None,
) -> DataFrame:
    """→ (query_id, neighbor_id, cos_sim, rank); self-matches excluded
    — the contract shared with cosine_topk / lsh / ivf / pq / hnsw.
    Pass precomputed ``bounds`` (from :func:`train_sq`) to skip the
    training scan when serving many batches off one codec."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if refine_factor < 1:
        raise ValueError(
            f"refine_factor must be >= 1, got {refine_factor}"
        )
    if bounds is None:
        bounds = train_sq(corpus, id_col, vec_col)
    lo, hi = bounds[0], bounds[1]
    span = np.maximum(hi - lo, _EPS)

    q_rows = (
        queries.select(
            F.col(id_col).alias("query_id"),
            as_double(vec_col).alias("qv"),
        )
        .orderBy("query_id")
        .collect()
    )
    spark = corpus.sparkSession
    id_type = queries.schema[id_col].dataType
    if not q_rows:
        return spark.createDataFrame(
            [],
            StructType(
                [
                    StructField("query_id", id_type),
                    StructField("neighbor_id", id_type),
                    StructField("cos_sim", DoubleType()),
                    StructField("rank", LongType()),
                ]
            ),
        )
    query_mat = _normalize(
        np.asarray([list(r.qv) for r in q_rows], dtype=np.float64)
    )
    q_ids = [r.query_id for r in q_rows]
    # affine identity: score = dot(q, vmin) + (code+128) @ (q·span/255)
    W = (query_mat * span[None, :] / 255.0).T  # (d, n_q)
    const = query_mat @ lo  # (n_q,)
    q_idx = spark.createDataFrame(
        [(i, qid) for i, qid in enumerate(q_ids)],
        StructType(
            [
                StructField("q_i", IntegerType()),
                StructField("query_id", id_type),
            ]
        ),
    )
    filtered = corpus if predicate is None else corpus.where(predicate)
    n_keep = k * refine_factor + 1
    partial = fan_out(
        filtered.select(
            F.col(id_col).alias("neighbor_id"),
            as_double(vec_col).alias("cv"),
        )
    ).mapInPandas(
        _encode_score_partial_topk(bounds, W, const, n_keep),
        schema=StructType(
            [
                StructField("neighbor_id", id_type),
                StructField("q_i", IntegerType()),
                StructField("adc", DoubleType()),
            ]
        ),
    )
    scored = partial.join(F.broadcast(q_idx), "q_i")
    cand_w = Window.partitionBy("query_id").orderBy(
        F.desc("adc"), F.asc("neighbor_id")
    )
    # materialized, lineage-cut candidate set (bounded at
    # queries · k · refine_factor rows): left lazy, AQE's broadcast
    # planning re-executes the Arrow scan per reference — see
    # pq_topk's identical note
    cands = (
        scored.where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("_r", F.row_number().over(cand_w))
        .where(F.col("_r") <= k * refine_factor)
        .select("query_id", "neighbor_id")
        .localCheckpoint(eager=True)
    )
    # exact refine: only the candidates read the fat vector column
    cv = filtered.select(
        F.col(id_col).alias("neighbor_id"),
        as_double(vec_col).alias("cv"),
    )
    qv = spark.createDataFrame(
        [
            (qid, [float(x) for x in np.asarray(list(r.qv))])
            for qid, r in zip(q_ids, q_rows)
        ],
        StructType(
            [
                StructField("query_id", id_type),
                StructField("qv", ArrayType(DoubleType())),
            ]
        ),
    )
    exact = (
        cands.join(cv, "neighbor_id")
        .join(F.broadcast(qv), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return exact.withColumn(
        "rank", F.row_number().over(w).cast("long")
    ).where(F.col("rank") <= k)
