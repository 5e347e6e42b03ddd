"""Persisted sharded-HNSW index — build the graphs once, query many.

``hnsw.hnsw_topk`` rebuilds every shard graph on every call; right
for a one-shot query, wrong for serving (the build is the quadratic
part — at a fixed corpus it dwarfs the search). This module persists
the graphs the way ``IvfIndex`` persists postings:

* ``<path>/graphs`` — one row per NODE: (build, shard, node, vec_id,
  vec, level, adj, is_entry) where ``adj[layer]`` is the node's
  neighbor list (node indices within the shard) and ``node`` is the
  id-sorted position the build assigned. A shard's rows ARE its
  graph; reconstruction at query time is a columnar load, zero build
  work.
* ``<path>/meta`` — (build, m, ef_construction, n_shards): the
  single-row publish point. Rebuilds append graphs under a fresh
  build number FIRST (invisible) and publish meta LAST in one atomic
  commit — IvfIndex's build-epoch rule, so readers always see a
  complete index; :meth:`gc` reclaims superseded builds.

Shard membership uses Spark's own Murmur3 (``pmod(hash(id),
n_shards)``) — the SAME assignment ``repartition(n, col)`` performs —
so a persisted query is BIT-IDENTICAL to ``hnsw_topk`` at equal
parameters (test-pinned): the index changes where the build cost is
paid, never the answer.

Serving wins this buys:

* ``ef_search`` is a QUERY-time knob: tune recall/latency without
  touching the stored graphs (the graph depends only on m /
  ef_construction);
* rebuild atomicity + time travel + vacuum come free from the txn
  layer.

Incremental adds are deliberately absent: HNSW insertion needs the
whole graph, so "add" would mean per-shard rebuilds — call
:meth:`HnswIndex.build` again (epochs make that safe); for
insert-heavy corpora the IVF index is the right structure.

Filtered queries (``filter_ids``) search the FULL stored graphs with
an over-fetch factor and mask the candidates afterwards — masking the
graph's nodes themselves would sever its edges — and guarantee k the
way the IVF index does: queries the masked candidates leave short
re-run as exact brute force over the stored vectors semi-joined with
the filter. (The on-the-fly ``hnsw_topk(predicate=...)`` remains the
alternative that builds graphs over the filtered corpus directly.)
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from etl_data_lake_spark.similarity.hnsw import (
    _Graph,
    _level,
    _normalize,
)
from etl_data_lake_spark.sources.txn import TxnTable

_GRAPH_SCHEMA = (
    "build long, shard int, node int, vec_id long, "
    "vec array<double>, level int, adj array<array<int>>, "
    "is_entry boolean"
)


def _graph_rows(build_no: int, shard: int, ids, X, g: "_Graph"):
    """Serialize a built shard graph: one row per node, adjacency as
    per-layer neighbor lists (node indices)."""
    rows = []
    for i in range(len(ids)):
        adj = [
            [int(v) for v in g.adj[layer].get(i, [])]
            for layer in range(g.levels[i] + 1)
        ]
        rows.append(
            (
                build_no,
                shard,
                i,
                int(ids[i]),
                [float(x) for x in X[i]],
                int(g.levels[i]),
                adj,
                i == g.entry,
            )
        )
    return rows


def _graph_from_rows(pdf: pd.DataFrame, m: int) -> tuple:
    """(ids, Graph) reconstructed from one shard's stored rows —
    columnar load, no insertion pass."""
    pdf = pdf.sort_values("node", ignore_index=True)
    ids = pdf["vec_id"].to_numpy(dtype=np.int64)
    X = np.array(pdf["vec"].tolist(), dtype=np.float64)
    levels = [int(v) for v in pdf["level"]]
    g = _Graph.__new__(_Graph)
    g.X = X
    g.m = m
    g.m0 = 2 * m
    g.levels = levels
    n_layers = (max(levels) + 1) if levels else 0
    g.adj = [{} for _ in range(n_layers)]
    entry = -1
    for i, (adj, is_entry) in enumerate(
        zip(pdf["adj"], pdf["is_entry"])
    ):
        for layer, nbrs in enumerate(adj):
            g.adj[layer][i] = [int(v) for v in nbrs]
        if is_entry:
            entry = i
    g.entry = entry
    return ids, g


class HnswIndex:
    """Handle to a persisted sharded-HNSW index rooted at ``path``."""

    def __init__(self, spark, path: str, id_col: str = "vec_id"):
        self.spark = spark
        self.path = str(path)
        self.id_col = id_col
        self.graphs_tbl = TxnTable(spark, f"{self.path}/graphs")
        self.meta_tbl = TxnTable(spark, f"{self.path}/meta")

    # ------------------------------------------------------- build --

    @staticmethod
    def build(
        spark,
        path: str,
        corpus: DataFrame,
        m: int = 8,
        ef_construction: int = 64,
        n_shards: int = 4,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> "HnswIndex":
        """Build the per-shard graphs (hnsw_topk's construction,
        verbatim: id-sorted insertion, splitmix levels) and persist
        them under a fresh build epoch; the meta overwrite is the
        atomic publish."""
        if m < 2:
            raise ValueError(f"m must be >= 2, got {m}")
        if n_shards < 1:
            raise ValueError(f"n_shards must be >= 1, got {n_shards}")
        idx = HnswIndex(spark, path, id_col)
        build_no = idx._next_build()
        m_l = 1.0 / math.log(m)

        def build_shards(
            it: Iterator[pd.DataFrame],
        ) -> Iterator[pd.DataFrame]:
            parts = [p for p in it if len(p)]
            if not parts:
                return
            pdf = pd.concat(parts, ignore_index=True)
            cols = [
                "build", "shard", "node", "vec_id", "vec", "level",
                "adj", "is_entry",
            ]
            for shard_val, grp in pdf.groupby("shard"):
                grp = grp.sort_values("vec_id", ignore_index=True)
                ids = grp["vec_id"].to_numpy(dtype=np.int64)
                X = _normalize(
                    np.array(grp["vec"].tolist(), dtype=np.float64)
                )
                g = _Graph(
                    X, m, ef_construction,
                    [_level(i, m_l) for i in ids],
                )
                yield pd.DataFrame(
                    _graph_rows(build_no, int(shard_val), ids, X, g),
                    columns=cols,
                )

        # the SAME membership repartition(n, col) would produce —
        # pmod(Murmur3(id), n) — so the persisted answer matches
        # hnsw_topk(n_parts=n_shards) bit-for-bit
        src = corpus.select(
            F.col(id_col).cast("long").alias("vec_id"),
            F.col(vec_col).cast("array<double>").alias("vec"),
            F.pmod(F.hash(F.col(id_col).cast("long")), F.lit(n_shards))
            .cast("int")
            .alias("shard"),
        ).repartition(n_shards, "shard")
        rows = src.mapInPandas(build_shards, schema=_GRAPH_SCHEMA)
        idx.graphs_tbl.append(
            rows.sortWithinPartitions("shard", "node"),
            stats_cols=("shard", "build"),
        )
        meta = spark.createDataFrame(
            [(build_no, m, ef_construction, n_shards)],
            "build long, m int, ef_construction int, n_shards int",
        )
        idx.meta_tbl.overwrite(meta)  # the publish point
        return idx

    def _next_build(self) -> int:
        if self.graphs_tbl.latest_version() == 0:
            return 1
        row = self.graphs_tbl.snapshot().agg(
            F.max("build").alias("b")
        ).collect()[0]
        return int(row.b or 0) + 1

    def _meta(self):
        rows = self.meta_tbl.snapshot().collect()
        if not rows:
            raise FileNotFoundError(f"no published index at {self.path}")
        r = rows[0]
        return int(r.build), int(r.m), int(r.ef_construction), int(
            r.n_shards
        )

    def current_build(self) -> int:
        return self._meta()[0]

    def gc(self) -> int:
        """Drop graphs of superseded builds (stats-pruned delete)."""
        cur = self.current_build()
        return self.graphs_tbl.delete_where(
            "build", 0, cur - 1, stats_cols=("shard", "build")
        )

    # ------------------------------------------------------- query --

    def query(
        self,
        queries: DataFrame,
        k: int = 10,
        ef_search: int = 64,
        vec_col: str = "embedding",
        max_query_batch: int = 10_000,
        filter_ids: DataFrame | None = None,
        filter_overfetch: int = 4,
    ) -> DataFrame:
        """→ (query_id, neighbor_id, cos_sim, rank) — hnsw_topk's
        exact contract (and, at equal parameters, its exact ANSWER),
        with the build cost already paid: each stored shard
        reconstructs columnar-fast inside one applyInPandas group and
        searches at the caller's ``ef_search``.

        ``filter_ids`` (an id frame, IvfIndex.query's convention) =
        filtered ANN on the stored graphs: each shard over-fetches
        ``k·filter_overfetch`` candidates from the FULL graph, the
        mask semi-joins them away, and queries left short re-run as
        exact brute force over the filtered stored vectors —
        guaranteed k, never a silently under-k answer."""
        if k < 1:
            raise ValueError(f"k must be >= 1, got {k}")
        if filter_overfetch < 1:
            raise ValueError(
                f"filter_overfetch must be >= 1, got {filter_overfetch}"
            )
        build_no, m, _efc, _n_shards = self._meta()
        q_rows = (
            queries.select(
                F.col(self.id_col).cast("long").alias("query_id"),
                F.col(vec_col).cast("array<double>").alias("qv"),
            )
            .limit(max_query_batch + 1)
            .collect()
        )
        if len(q_rows) > max_query_batch:
            raise ValueError(
                f"query batch exceeds max_query_batch="
                f"{max_query_batch}; split the batch (or raise the "
                "bound)"
            )
        if not q_rows:
            return self.spark.createDataFrame(
                [],
                "query_id long, neighbor_id long, cos_sim double, "
                "rank long",
            )
        q_ids = np.array(
            [r["query_id"] for r in q_rows], dtype=np.int64
        )
        Q = _normalize(
            np.array([r["qv"] for r in q_rows], dtype=np.float64)
        )

        fetch = k + 1 if filter_ids is None else k * filter_overfetch + 1
        ef_eff = max(ef_search, fetch)

        def search(pdf: pd.DataFrame) -> pd.DataFrame:
            ids, g = _graph_from_rows(pdf, m)
            qs, ns, ss = [], [], []
            for qi in range(len(q_ids)):
                qid = int(q_ids[qi])
                for s, idx in g.search(Q[qi], fetch, ef_eff):
                    nid = int(ids[idx])
                    if nid == qid:
                        continue
                    qs.append(qid)
                    ns.append(nid)
                    ss.append(round(s, 6))
            return pd.DataFrame(
                {"query_id": qs, "neighbor_id": ns, "cos_sim": ss}
            )

        stored = self.graphs_tbl.snapshot().where(
            F.col("build") == build_no
        )
        cand = stored.groupBy("shard").applyInPandas(
            search,
            schema="query_id long, neighbor_id long, cos_sim double",
        )
        if filter_ids is not None:
            from etl_data_lake_spark.similarity.index import IvfIndex

            cand = cand.join(
                IvfIndex._id_mask(filter_ids, self.id_col, "neighbor_id"),
                "neighbor_id",
                "left_semi",
            )
        w = Window.partitionBy("query_id").orderBy(
            F.desc("cos_sim"), F.asc("neighbor_id")
        )
        ranked = cand.withColumn(
            "rank", F.row_number().over(w).cast("long")
        ).where(F.col("rank") <= k)
        if filter_ids is None:
            return ranked
        from etl_data_lake_spark.similarity.index import IvfIndex as _I
        from etl_data_lake_spark.similarity.ivf import _guarantee_k
        from pyspark.sql.types import (
            ArrayType,
            DoubleType,
            LongType,
            StructField,
            StructType,
        )

        corpus = (
            stored.select(
                F.col("vec_id").alias(self.id_col),
                F.col("vec").alias(vec_col),
            )
            .join(
                _I._id_mask(filter_ids, self.id_col, self.id_col),
                self.id_col,
                "left_semi",
            )
        )
        q_local = self.spark.createDataFrame(
            [(int(r["query_id"]), [float(x) for x in r["qv"]])
             for r in q_rows],
            StructType(
                [
                    StructField(self.id_col, LongType()),
                    StructField(vec_col, ArrayType(DoubleType())),
                ]
            ),
        )
        return _guarantee_k(
            ranked, corpus, q_local, k, self.id_col, vec_col,
            max_query_batch,
        )
