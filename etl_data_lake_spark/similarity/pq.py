"""Product-quantization ANN — the memory-compression scale path.

(Jégou, Douze, Schmid, "Product Quantization for Nearest Neighbor
Search", TPAMI 2011 — the public formulation used by every large-scale
vector index.)

The third approximate path beside sign-LSH (lsh.py) and IVF (ivf.py),
attacking a different constraint: at 100 TB of embeddings the problem
is not only scan cost but RESIDENCY — a 64-dim float32 vector is
256 bytes; its PQ code is ``m`` bytes (one codebook id per subspace).
Split each normalized vector into ``m`` subvectors, k-means each
subspace into ``ks`` centroids (driver-side Lloyd over a bounded
hash-ordered sample — same determinism recipe as ivf.refine_centroids:
fixed sample order, ties toward the lower centroid id, fixed-order
float64 means), and store only the per-subspace nearest-centroid ids.
Scoring never touches the original vectors: a query builds an
``m × ks`` inner-product table against the codebooks (asymmetric
distance computation, ADC), and each corpus code scores as the sum of
``m`` table lookups — a numpy gather over Arrow batches, no shuffle.

Approximation → refinement: ADC ranks are quantized, so the top
``k·refine_factor`` ADC candidates per query are re-scored with the
EXACT JVM-fold cosine and re-ranked (numpy only selects candidates;
every emitted score is bit-deterministic — the same contract as
ivf.py/lsh.py). With ``refine_factor`` covering the whole corpus the
result is exactly brute force, which the tests pin.

Measured ADC-only recall@10 (sf0.01 embeddings, 500 random 64-d
vectors — the quantizer's worst case, no cluster structure):

    m=8  ks=16   0.23      m=8  ks=32   0.33
    m=8  ks=64   0.42      m=16 ks=32   0.51

Random data quantizes poorly (every subspace is isotropic); real
embedding corpora concentrate on low-dimensional manifolds where the
same code budget buys far higher recall. The refine stage lifts
recall@k to ADC-recall@(k·refine_factor), which the recall test
exercises.

At 100 TB: codes live in memory (m bytes/vector — 32 GB per 4G
vectors at m=8), the scan is one narrow Arrow pass, and the exact
refine touches only |queries|·k·refine_factor full vectors — the only
stage that reads the fat column, joined by id against the (pruned)
vector table.
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
    StructField,
    StructType,
)

from etl_data_lake_spark.functions.vectors import as_double, cosine
from etl_data_lake_spark.sources.catalog import fan_out


def sample_vectors(
    corpus: DataFrame, n: int, id_col: str, vec_col: str
) -> np.ndarray:
    """Bounded training sample, hash-ordered for corpus-wide spread
    (one scan, TakeOrderedAndProject — the ivf.py seeding rule)."""
    rows = (
        corpus.select(F.col(id_col).alias("i"), as_double(vec_col).alias("v"))
        .orderBy(F.hash("i"), "i")
        .limit(n)
        .collect()
    )
    return np.asarray([list(r.v) for r in rows], dtype=np.float64)


def _normalize(x: np.ndarray) -> np.ndarray:
    return x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-300)


def train_codebooks(
    train: np.ndarray, m: int, ks: int, iters: int = 8
) -> np.ndarray:
    """→ (m, ks, dims/m) codebooks from L2-normalized training
    vectors; per-subspace Lloyd, deterministic (hash-ordered sample in,
    argmin ties toward the lower id, fixed-order float64 means, seeds =
    the first ks subvectors). Empty cells keep their previous centroid.
    Driver-side on the bounded sample — zero extra Spark jobs."""
    if train.ndim != 2 or train.shape[1] % m:
        raise ValueError(f"dims {train.shape} not divisible into {m} subspaces")
    t = _normalize(train)
    sd = t.shape[1] // m
    if len(t) < ks:
        raise ValueError(f"training sample {len(t)} smaller than ks={ks}")
    books = np.empty((m, ks, sd))
    for s in range(m):
        x = t[:, s * sd : (s + 1) * sd]
        c = x[:ks].copy()
        for _ in range(iters):
            d = ((x[:, None, :] - c[None, :, :]) ** 2).sum(-1)
            assign = d.argmin(1)  # ties toward the lower centroid id
            for ci in range(ks):
                members = x[assign == ci]
                if len(members):
                    c[ci] = members.mean(axis=0)
        books[s] = c
    return books


def _encode_udf(books: np.ndarray):
    """vector → array<int> of per-subspace nearest-centroid ids; one
    batch × ks matmul per subspace (the wide-matrix regime where numpy
    beats a JVM fold by an order of magnitude — see ivf.py)."""
    from pyspark.sql.functions import pandas_udf

    m, ks, sd = books.shape

    def encode(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series([], dtype=object)
        v = _normalize(np.stack(vs.to_numpy()).astype(np.float64))
        codes = np.empty((len(v), m), dtype=np.int32)
        for s in range(m):
            x = v[:, s * sd : (s + 1) * sd]
            d = ((x[:, None, :] - books[s][None, :, :]) ** 2).sum(-1)
            codes[:, s] = d.argmin(1)
        return pd.Series(list(codes))

    return pandas_udf(encode, "array<int>")


def _adc_tables(books: np.ndarray, query_mat: np.ndarray) -> np.ndarray:
    """→ tabs[qi, s, code] = <q_s, c_{s,code}>: per query an m × ks
    inner-product table; each corpus code then scores as a sum of m
    gathers. Ships once per task in the UDF closure."""
    m, ks, sd = books.shape
    q = _normalize(query_mat)
    return np.stack(
        [q[:, s * sd : (s + 1) * sd] @ books[s].T for s in range(m)], axis=1
    )


def _encode_score_partial_topk(
    books: np.ndarray, tabs: np.ndarray, n_keep: int
):
    """mapInPandas generator: (neighbor_id, cv) RAW-VECTOR batches →
    the per-batch top-``n_keep`` ADC candidates per query as
    (neighbor_id, q_i, adc) rows — :func:`_encode_udf`'s quantization
    and :func:`_adc_partial_topk`'s scoring FUSED into one Python
    pass.

    Why fused (round 14): as separate operators they plan as
    ArrowEvalPython → MapInPandas chained INSIDE ONE STAGE — every
    task pays two JVM↔Python round-trips and the executor pins two
    Python workers per core (measured: 32 tasks × ~4 s wall at ~0.1 s
    CPU each, the workers blocking on each other's Arrow pipes). The
    codes here are intermediate by construction — identical int32
    argmins feeding identical table gathers — so emitted candidates
    are bit-equal to the two-operator form (tests pin refine ≡ brute
    force either way). ``pq_encode`` keeps the standalone encoder for
    index persistence."""
    m, ks, sd = books.shape

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            v = _normalize(np.stack(pdf["cv"].to_numpy()).astype(np.float64))
            codes = np.empty((len(v), m), dtype=np.int64)
            for s in range(m):
                x = v[:, s * sd : (s + 1) * sd]
                d = ((x[:, None, :] - books[s][None, :, :]) ** 2).sum(-1)
                codes[:, s] = d.argmin(1)
            n_q = tabs.shape[0]
            scores = np.zeros((len(codes), n_q))
            for s in range(m):
                scores += tabs[:, s, :][:, codes[:, s]].T
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


def _adc_partial_topk(
    tabs: np.ndarray, m: int, n_keep: int, cell_sets=None
):
    """mapInPandas generator: (neighbor_id, codes) batches → the
    per-batch top-``n_keep`` ADC candidates PER QUERY as
    (neighbor_id, q_i, adc) rows.

    This is the map-side partial top-k that makes PQ scale-safe: the
    ADC score of every corpus code is computed HERE, inside the narrow
    Arrow pass, and only ≤ batches × n_queries × n_keep candidate rows
    ever reach the downstream exchange — the shuffle carries
    candidates, not the corpus (at 100 TB the difference between
    shuffling kilobytes and shuffling the index). Per-batch top-n is a
    correct partial for the global top-n because batch membership
    partitions the corpus; ties break exactly like the global cut
    (adc desc, neighbor_id asc), so union-of-partials ⊇ global top-n
    deterministically.

    ``cell_sets`` (IVF-PQ composition): per-query sets of probed IVF
    cells; batches must then carry a ``cell`` column, and a row only
    scores for the queries whose probe set owns its cell — each query
    sees ITS cells, not the batch union (index.query_adc's per-query
    semantics, matching plain `IvfIndex.query`)."""

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            codes = np.stack(pdf["codes"].to_numpy()).astype(np.int64)
            n_q = tabs.shape[0]
            scores = np.zeros((len(codes), n_q))
            for s in range(m):
                # tabs[:, s, codes[:, s]] → (n_q, n); accumulate
                # transposed, fixed subspace order (determinism)
                scores += tabs[:, s, :][:, codes[:, s]].T
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


def pq_encode(
    corpus: DataFrame,
    books: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """→ (neighbor_id, codes): the m-byte-per-vector compressed corpus
    — the representation that actually ships to a 100 TB index."""
    enc = _encode_udf(books)
    c = fan_out(
        corpus.select(
            F.col(id_col).alias("neighbor_id"), as_double(vec_col).alias("cv")
        )
    )
    return c.select("neighbor_id", enc(F.col("cv")).alias("codes"))


def pq_reconstruct(
    coded: DataFrame,
    books: np.ndarray,
    codes_col: str = "codes",
) -> DataFrame:
    """Inverse of :func:`pq_encode`: each code word expands to the
    concatenation of its per-subspace centroids — the approximate
    (normalized-space) vector a compressed archive can serve without
    ever storing the original floats. Reconstruction error is the
    quantization error ADC scoring already embodies; more subspaces /
    larger codebooks → tighter reconstruction. Arrow-batched gather,
    no shuffle; the codebooks ship once per task in the closure."""
    from pyspark.sql.functions import pandas_udf

    m, ks, sd = books.shape
    flat = books.reshape(m * ks, sd)

    def decode(cs: pd.Series) -> pd.Series:
        if len(cs) == 0:
            return pd.Series([], dtype=object)
        codes = np.stack(cs.to_numpy()).astype(np.int64)
        # gather row (s*ks + code) per subspace and concatenate
        idx = codes + np.arange(m)[None, :] * ks
        vecs = flat[idx].reshape(len(codes), m * sd)
        return pd.Series(list(vecs))

    dec = pandas_udf(decode, "array<double>")
    keep = [c for c in coded.columns if c != codes_col]
    return coded.select(*keep, dec(F.col(codes_col)).alias("vector"))


def pq_topk(
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
) -> DataFrame:
    """→ (query_id, neighbor_id, cos_sim, rank); self-matches
    excluded. ADC over PQ codes selects ``k·refine_factor`` candidates
    per query; the exact JVM-fold cosine re-scores and ranks them, so
    emitted scores are bit-deterministic. ``refine_factor`` large
    enough to cover the corpus ⇒ exactly brute force.

    ``predicate`` = filtered ANN search: codebooks stay predicate-
    agnostic (trained on the full corpus — one index serves every
    filter), and the filter masks the CODE scan, so the ADC partial
    top-k competes only among matching vectors. k is guaranteed
    structurally: the partial keeps k·refine_factor ≥ k candidates
    per query whenever the filtered corpus holds that many — no
    refill pass needed (unlike IVF, there are no cells to come up
    short)."""
    train = sample_vectors(corpus, max(train_size, ks), id_col, vec_col)
    if len(train) == 0:
        return queries.select(
            F.col(id_col).alias("query_id"),
            F.col(id_col).alias("neighbor_id"),
            F.lit(0.0).alias("cos_sim"),
            F.lit(0).cast("long").alias("rank"),
        ).limit(0)
    books = train_codebooks(train, m, ks, iters=kmeans_iters)

    # bounded collect: ANN queries are a handful of probe vectors (the
    # same boundedness contract as lsh/ivf's broadcast query side)
    q_rows = (
        queries.select(F.col(id_col).alias("query_id"), as_double(vec_col).alias("qv"))
        .orderBy("query_id")
        .collect()
    )
    if not q_rows:
        return pq_encode(corpus, books, id_col, vec_col).select(
            F.col("neighbor_id").alias("query_id"),
            "neighbor_id",
            F.lit(0.0).alias("cos_sim"),
            F.lit(0).cast("long").alias("rank"),
        ).limit(0)
    query_mat = np.asarray([list(r.qv) for r in q_rows], dtype=np.float64)
    q_ids = [r.query_id for r in q_rows]
    spark = corpus.sparkSession
    # id type follows the caller's schema (string ids are as valid as
    # longs — lsh/ivf are type-agnostic, so is this)
    id_type = queries.schema[id_col].dataType
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
    tabs = _adc_tables(books, query_mat)
    # +1 keeps a full candidate set even when a query's own row wins a
    # partial slot (self-matches are dropped after the partial)
    n_keep = k * refine_factor + 1
    partial = fan_out(
        filtered.select(
            F.col(id_col).alias("neighbor_id"),
            as_double(vec_col).alias("cv"),
        )
    ).mapInPandas(
        _encode_score_partial_topk(books, tabs, n_keep),
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
    # Materialize the candidate set (≤ queries · k · refine_factor
    # rows — bounded and tiny) and CUT THE LINEAGE: left lazy, the
    # refine join's planner-side broadcast/probe decisions re-execute
    # the whole encode + ADC Arrow scan per reference (measured: the
    # 32-task MapInPandas stage ran 3× per query under AQE, the
    # overlapping broadcast builds thrashing the Python worker pool).
    # After the checkpoint the expensive pass runs exactly once and
    # the refine plans against a local-sized leaf.
    cands = (
        scored.where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("_r", F.row_number().over(cand_w))
        .where(F.col("_r") <= k * refine_factor)
        .select("query_id", "neighbor_id")
        .localCheckpoint(eager=True)
    )

    # exact refine: only the candidates read the fat vector column
    # (from the FILTERED corpus — same predicate pushdown as the codes)
    cv = filtered.select(
        F.col(id_col).alias("neighbor_id"), as_double(vec_col).alias("cv")
    )
    qv = spark.createDataFrame(
        [(qid, list(map(float, query_mat[i]))) for i, qid in enumerate(q_ids)],
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
