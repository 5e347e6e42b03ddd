"""Persisted IVF index — train once, assign incrementally, query many.

``ivf.ivf_topk`` re-trains its coarse quantizer on every call, which
is right for a one-shot query but wrong for a served index: at 100 TB
the quantizer is trained ONCE (bounded sample, minutes), while
assignment and querying run for months against it. This module
persists the index as two transactional tables and turns the classic
"inverted lists" into something Spark-native:

* ``<path>/centroids`` — (cell, centroid) rows, n_cells of them; the
  whole quantizer is a driver-side collect.
* ``<path>/postings`` — (id, cell, vector), written RANGE-CLUSTERED
  BY CELL with per-file manifest stats on ``cell``. The inverted
  list for a cell is therefore not a bespoke data structure but a
  contiguous run of parquet files, and "scan only the probed cells"
  is exactly :meth:`TxnTable.snapshot_where_any` manifest pruning —
  a query planning over 10⁶ files opens only the handful owning its
  probed cells, before a single footer is read.

Querying reuses the ivf.py scoring contract (deterministic JVM-fold
cosine on candidates, rounded scores, id tiebreaks), so
``IvfIndex.build(...).query(q, k, nprobe)`` is bit-identical to
``ivf_topk(corpus, q, ...)`` at the same parameters — pinned in
tests/test_vector_index.py.

Incremental maintenance: :meth:`add` assigns new vectors against the
FROZEN quantizer and appends them (ACID, stats-tracked, idempotent
with (app_id, txn_seq)) — no retrain, no rewrite of existing
postings; cells drift only as far as real-world distribution drift,
the standard served-IVF trade (rebuild when recall decays, which
:meth:`cell_sizes` makes observable). ``optimize_small_files`` keeps
append-heavy postings compact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from etl_data_lake_spark.functions.vectors import as_double, cosine
from etl_data_lake_spark.similarity.ivf import (
    _probe_udf,
    refine_centroids,
    sample_centroids,
)
from etl_data_lake_spark.sources.txn import TxnTable


class IvfIndex:
    """Handle to a persisted IVF index rooted at ``path``."""

    def __init__(self, spark, path: str, id_col: str = "vec_id"):
        self.spark = spark
        self.path = str(path)
        self.id_col = id_col
        self.centroids_tbl = TxnTable(spark, f"{self.path}/centroids")
        self.postings_tbl = TxnTable(spark, f"{self.path}/postings")

    # ------------------------------------------------------- build --

    @staticmethod
    def build(
        spark,
        path: str,
        corpus: DataFrame,
        n_cells: int = 16,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        kmeans_iters: int = 2,
        train_factor: int = 64,
        shards: int | None = None,
    ) -> "IvfIndex":
        """Train the quantizer on a bounded hash-spread sample (same
        deterministic rule as ivf_topk — one scan, tiny collect),
        persist it, and write the cell-clustered postings. ``shards``
        bounds the posting file count (default min(n_cells, 32));
        range-partitioning by cell + within-file sort keeps every
        file's cell-span tight, which is what makes probe-time
        manifest pruning sharp."""
        idx = IvfIndex(spark, path, id_col)
        train = sample_centroids(
            corpus, n_cells * max(train_factor, 1), id_col, vec_col
        )
        centroids = refine_centroids(
            train, train[:n_cells], iters=kmeans_iters
        )
        if not centroids:
            raise ValueError("cannot build an IVF index over an empty corpus")
        cdf = spark.createDataFrame(
            [(i, list(c)) for i, c in enumerate(centroids)],
            "cell int, centroid array<double>",
        )
        idx.centroids_tbl.overwrite(cdf)
        assigned = idx._assign(corpus, centroids, vec_col)
        shards = shards if shards is not None else min(max(n_cells, 1), 32)
        idx.postings_tbl.overwrite(
            assigned.repartitionByRange(shards, "cell")
            .sortWithinPartitions("cell"),
            stats_cols=("cell",),
        )
        return idx

    def _assign(self, df: DataFrame, centroids, vec_col: str) -> DataFrame:
        assign = _probe_udf(centroids, 1)
        return df.select(
            F.col(self.id_col).alias("id"),
            as_double(vec_col).alias("vec"),
        ).withColumn("cell", F.element_at(assign(F.col("vec")), 1))

    def centroids(self) -> list[list[float]]:
        rows = self.centroids_tbl.snapshot().orderBy("cell").collect()
        return [list(r.centroid) for r in rows]

    # ------------------------------------------------- maintenance --

    def add(
        self,
        vectors: DataFrame,
        vec_col: str = "embedding",
        app_id: str | None = None,
        txn_seq: int | None = None,
    ) -> int:
        """Assign ``vectors`` against the frozen quantizer and append
        them — O(new vectors), existing postings untouched. Idempotent
        under (app_id, txn_seq) like any txn append, so a streaming
        foreachBatch can maintain the index exactly-once."""
        assigned = self._assign(vectors, self.centroids(), vec_col)
        return self.postings_tbl.append(
            assigned, app_id=app_id, txn_seq=txn_seq, stats_cols=("cell",)
        )

    def optimize(self, target_bytes: int = 128 << 20) -> int:
        """Re-compact append-fragmented postings (cell stats kept)."""
        return self.postings_tbl.optimize_small_files(
            target_bytes=target_bytes, stats_cols=("cell",)
        )

    def cell_sizes(self) -> DataFrame:
        """(cell, n_vectors) — the skew/drift observability that tells
        an operator when a rebuild is due."""
        return (
            self.postings_tbl.snapshot()
            .groupBy("cell")
            .agg(F.count("*").alias("n_vectors"))
        )

    # ------------------------------------------------------- query --

    def probed_files(self, cells: list[int]) -> tuple[list[str], int]:
        """(files any probed cell can live in, total files) — the
        manifest-pruning readout tests assert on."""
        return (
            self.postings_tbl.files_matching_any(
                "cell", [(c, c) for c in sorted(set(cells))]
            ),
            len(self.postings_tbl.snapshot_meta().files),
        )

    def query(
        self,
        queries: DataFrame,
        k: int = 10,
        nprobe: int = 4,
        vec_col: str = "embedding",
    ) -> DataFrame:
        """→ (query_id, neighbor_id, cos_sim, rank); same contract and
        same bit-deterministic scoring as ivf.ivf_topk, but the corpus
        scan is restricted — at the FILE level, via manifest stats —
        to the cells this query batch probes."""
        centroids = self.centroids()
        probe = _probe_udf(centroids, nprobe)
        q = queries.select(
            F.col(self.id_col).alias("query_id"),
            as_double(vec_col).alias("qv"),
        )
        qb = q.select(
            "query_id", "qv", F.explode(probe(F.col("qv"))).alias("cell")
        )
        probed = sorted(
            r.cell for r in qb.select("cell").distinct().collect()
        )
        postings = self.postings_tbl.snapshot_where_any(
            "cell", [(c, c) for c in probed]
        ).select(
            F.col("id").alias("neighbor_id"), F.col("vec").alias("cv"), "cell"
        )
        cand = (
            postings.join(F.broadcast(qb), "cell")
            .where(F.col("neighbor_id") != F.col("query_id"))
            .dropDuplicates(["query_id", "neighbor_id"])
        )
        scored = cand.select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cos_sim"),
        )
        w = Window.partitionBy("query_id").orderBy(
            F.desc("cos_sim"), F.asc("neighbor_id")
        )
        return scored.withColumn(
            "rank", F.row_number().over(w).cast("long")
        ).where(F.col("rank") <= k)
