"""Binary (sign) quantization — ONE BIT per dimension, the extreme
end of the embedding-compression family.

The fifth compression/serving path beside sign-LSH (lsh.py), IVF
(ivf.py), PQ (pq.py), and SQ8 (sq.py) — FAISS's public
``LSH``/``binary flat`` formulation: each dimension of the
L2-normalized vector keeps only its SIGN against that dimension's
corpus-wide mean, packed 8 bits to the byte. d=64 floats become 8
bytes — 32× under float32 — and the approximate score is a Hamming
distance (XOR + popcount), the cheapest similarity any codec can
offer. Where SQ8 preserves magnitudes to half a level and PQ learns
subspace codebooks, BQ throws away everything except orientation:
it is the right codec when memory is the binding constraint and an
exact refine pass follows (which this operator always runs).

Why per-dimension MEAN centering: sign(v_i) alone wastes a bit on any
dimension whose values share a sign (common after normalization);
centering at the corpus mean splits every dimension's population,
maximizing per-bit entropy. Training is therefore ONE distributed
aggregation — d scalar means over the normalized corpus, map-side
combined, exact (no sampling, no iteration; cheaper than even SQ8's
min/max pass).

Scoring: Hamming(q, v) on packed bytes is a 256-entry popcount LUT
over ``codes XOR qbits`` — one vectorized numpy gather per Arrow
batch, never touching floats. The map-side partial top-k keeps only
``k·refine_factor`` candidates per query per batch (the discipline
shared with pq/sq: the shuffle carries candidates, not the corpus),
and the exact JVM-fold cosine re-scores survivors, so emitted scores
are bit-deterministic and ``refine_factor`` covering the corpus
reproduces brute force exactly (test-pinned). One bit per dimension
ranks coarsely — Hamming over d bits approximates ANGLE with ~√d
resolution — so the honest operating point is a LARGER
``refine_factor`` than SQ8 needs; the tests pin the measured floor.

``predicate`` = filtered ANN: thresholds stay predicate-agnostic
(trained on the full corpus — one codec serves every filter) while
the filter masks the CODE scan before scoring, so the partial top-k
competes only among matching vectors and k is guaranteed structurally
whenever the filtered corpus holds k rows (the contract every method
in this package shares).

Storage honesty: codes are ``array<tinyint>`` of length ceil(d/8) —
truly one bit per dimension on the wire and in parquet (bytes offset
by −128 into the signed range; trailing pad bits are zero on BOTH
sides, so they never contribute to a XOR).
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

_POPCOUNT = np.array([bin(i).count("1") for i in range(256)], dtype=np.int32)


def _normalize(x: np.ndarray) -> np.ndarray:
    return x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-300)


def _pack_signs(v: np.ndarray, thresholds: np.ndarray) -> np.ndarray:
    """(n, d) floats → (n, ceil(d/8)) uint8 sign bytes (bit i of byte
    j = dimension 8j+i above threshold; numpy big-endian bit order —
    identical on both sides, so the convention cancels in the XOR)."""
    return np.packbits(v > thresholds[None, :], axis=1)


def train_bq(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """→ (d,) per-dimension MEANS of the L2-normalized corpus — the
    sign thresholds. ONE distributed aggregation, d rows of driver
    traffic, exact.

    Shape: ``posexplode`` + groupBy(pos), not d named avg expressions
    — the column-per-dimension form bloated codegen compilation
    linearly in d (fine at d=64, seconds of driver time at 768/1536);
    the grouped form's map-side combine keeps the shuffle at
    O(partitions·d) rows regardless of corpus size."""
    first = corpus.select(F.size(as_double(vec_col)).alias("d")).first()
    if first is None:
        raise ValueError("cannot train BQ thresholds on an empty corpus")
    d = int(first["d"])
    # fan_out BEFORE the normalize+explode (same single-task fit scan
    # train_sq had: a 1-file / 1-partition-cached corpus runs the whole
    # d-way explode + partial avg serially). avg's partial sums regroup
    # under the repartition — a ≤1-ulp mean shift in principle — and
    # the bit-parity of every downstream result is verified against the
    # unpartitioned form in tests plus the sf0.01/sf0.1 oracle runs.
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
        .agg(F.avg("x").alias("m"))
        .collect()
    )
    out = np.zeros(d, dtype=np.float64)
    for r in rows:
        out[r["pos"]] = r["m"]
    return out


def _bq_encode_udf(thresholds: np.ndarray):
    """array<double> → packed sign bytes pandas UDF — shared by
    :func:`bq_encode` and the persisted index's posting writer."""
    from pyspark.sql.functions import pandas_udf

    thr = np.asarray(thresholds, dtype=np.float64)

    def encode(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series([], dtype=object)
        v = _normalize(np.stack(vs.to_numpy()).astype(np.float64))
        packed = _pack_signs(v, thr)
        return pd.Series(list((packed.astype(np.int16) - 128).astype(np.int8)))

    return pandas_udf(encode, "array<tinyint>")


def bq_encode(
    corpus: DataFrame,
    thresholds: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """→ (neighbor_id, codes array<tinyint> of ceil(d/8) bytes): the
    one-bit-per-dimension compressed corpus."""
    thr = np.asarray(thresholds, dtype=np.float64)
    enc = _bq_encode_udf(thr)
    c = fan_out(
        corpus.select(
            F.col(id_col).alias("neighbor_id"),
            as_double(vec_col).alias("cv"),
        )
    )
    return c.select("neighbor_id", enc(F.col("cv")).alias("codes"))


def hamming_distances(codes: np.ndarray, qbits: np.ndarray) -> np.ndarray:
    """(n, B) uint8 × (n_q, B) uint8 → (n, n_q) int32 Hamming
    distances — one LUT gather over the XOR, fully vectorized."""
    return _POPCOUNT[codes[:, None, :] ^ qbits[None, :, :]].sum(axis=2)


def _encode_score_partial_topk(
    thr: np.ndarray, qbits: np.ndarray, n_keep: int
):
    """mapInPandas generator: (neighbor_id, cv) RAW-VECTOR batches →
    per-batch top-``n_keep`` nearest-by-Hamming candidates per query —
    :func:`_bq_encode_udf`'s sign packing and :func:`_bq_partial_topk`'s
    XOR+popcount fused into ONE Python pass (the pq/sq round-14
    fusion: chained ArrowEvalPython → MapInPandas in one stage pays
    two JVM↔Python round-trips per task). ``_pack_signs`` output IS
    the uint8 form the scorer consumed after its +128 re-offset, so
    candidates are bit-equal to the two-operator form."""

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            v = _normalize(np.stack(pdf["cv"].to_numpy()).astype(np.float64))
            codes = _pack_signs(v, thr).astype(np.uint8)
            dist = hamming_distances(codes, qbits)  # (n, n_q)
            n_q = qbits.shape[0]
            neg = -dist.T.astype(np.float64)
            long = pd.DataFrame(
                {
                    "neighbor_id": np.tile(
                        pdf["neighbor_id"].to_numpy(), n_q
                    ),
                    "q_i": np.repeat(
                        np.arange(n_q, dtype=np.int32), len(codes)
                    ),
                    "neg_hamming": neg.reshape(-1),
                }
            )
            yield (
                long.sort_values(
                    ["q_i", "neg_hamming", "neighbor_id"],
                    ascending=[True, False, True],
                )
                .groupby("q_i", sort=False)
                .head(n_keep)
            )

    return gen


def _bq_partial_topk(qbits: np.ndarray, n_keep: int, cell_sets=None):
    """mapInPandas generator: (neighbor_id, codes) batches → per-batch
    top-``n_keep`` nearest-by-Hamming candidates PER QUERY as
    (neighbor_id, q_i, neg_hamming) rows — pq/sq's map-side partial
    top-k with the score table replaced by XOR+popcount.
    ``cell_sets`` composes under IVF cell pruning exactly as in
    pq._adc_partial_topk (batches then carry a ``cell`` column)."""

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            codes = (
                np.stack(pdf["codes"].to_numpy()).astype(np.int16) + 128
            ).astype(np.uint8)
            dist = hamming_distances(codes, qbits)  # (n, n_q)
            n_q = qbits.shape[0]
            neg = -dist.T.astype(np.float64)  # (n_q, n)
            if cell_sets is not None:
                cells = pdf["cell"].to_numpy()
                for qi, cs in enumerate(cell_sets):
                    neg[qi, ~np.isin(cells, sorted(cs))] = -np.inf
            long = pd.DataFrame(
                {
                    "neighbor_id": np.tile(
                        pdf["neighbor_id"].to_numpy(), n_q
                    ),
                    "q_i": np.repeat(
                        np.arange(n_q, dtype=np.int32), len(codes)
                    ),
                    "neg_hamming": neg.reshape(-1),
                }
            )
            if cell_sets is not None:
                long = long[np.isfinite(long["neg_hamming"].to_numpy())]
            yield (
                long.sort_values(
                    ["q_i", "neg_hamming", "neighbor_id"],
                    ascending=[True, False, True],
                )
                .groupby("q_i", sort=False)
                .head(n_keep)
            )

    return gen


def bq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    refine_factor: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    predicate=None,
    thresholds: np.ndarray | None = None,
) -> DataFrame:
    """→ (query_id, neighbor_id, cos_sim, rank); self-matches excluded
    — the contract shared with cosine_topk / lsh / ivf / pq / sq /
    hnsw. Pass precomputed ``thresholds`` (from :func:`train_bq`) to
    skip the training scan when serving many batches off one codec.
    Default ``refine_factor`` is 8 (vs sq's 4): one bit per dimension
    ranks coarsely, so BQ buys its memory savings with a deeper exact
    refine."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if refine_factor < 1:
        raise ValueError(f"refine_factor must be >= 1, got {refine_factor}")
    if thresholds is None:
        thresholds = train_bq(corpus, id_col, vec_col)
    thr = np.asarray(thresholds, dtype=np.float64)

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
    qbits = _pack_signs(query_mat, thr)
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
        _encode_score_partial_topk(thr, qbits, n_keep),
        schema=StructType(
            [
                StructField("neighbor_id", id_type),
                StructField("q_i", IntegerType()),
                StructField("neg_hamming", DoubleType()),
            ]
        ),
    )
    scored = partial.join(F.broadcast(q_idx), "q_i")
    cand_w = Window.partitionBy("query_id").orderBy(
        F.desc("neg_hamming"), F.asc("neighbor_id")
    )
    # materialized, lineage-cut candidate set (bounded) — see
    # pq_topk's identical note on AQE re-executing the Arrow scan
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
