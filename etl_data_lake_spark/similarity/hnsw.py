"""Sharded HNSW ANN — per-partition hierarchical small-world graphs,
global top-k merge. The graph-based member of the ANN family (lsh.py
buckets, ivf.py cells, pq.py codes): highest recall per candidate
scanned at high k, at the cost of a Python build pass.

No graph library exists in this environment, so the HNSW algorithm
itself (Malkov & Yashunin 2016, the public paper) is implemented here
in numpy: exponentially-distributed layer levels, greedy descent
through the upper layers, beam (ef) search at layer 0, bidirectional
M-links with closest-kept pruning.

Distribution model — the standard sharded-graph design (how every
production vector store distributes HNSW, since the graph itself
doesn't partition):

* the corpus hash-partitions by the vector id (Spark's hash
  partitioner — a pure function of the id value, so shard membership
  is layout/retry invariant), each partition builds ITS OWN small
  graph inside one ``mapInPandas`` pass and searches it for every
  query — the corpus never shuffles, and the graph never exists as a
  global object;
* each partition emits its local top-k per query; the global answer
  is a window rank over P·k·|Q| candidate rows — candidates-only
  shuffle, exactly the IVF/LSH discipline;
* the query batch broadcasts into the UDF closure (an ANN query
  batch is bounded by construction — thousands, not corpus-sized).

Determinism: levels derive from a splitmix of the vector id (no RNG
state), insertion order is id-sorted, every tie breaks toward the
lower index, and the partition assignment is content-hashed — the
result is a pure function of (corpus, queries, parameters), pinned
under repartitioning in tests/test_similarity_hnsw.py.

Scale shape: build is O(n/P · log(n/P) · M · d) numpy work per
partition with nothing collected; search adds O(|Q| · ef · M · d)
per partition. At 100 TB the per-partition graphs are the IVF cells'
moral equivalent — bounded shards, each exhaustively good locally,
merged by rank. ``ef_search >= partition size`` degenerates to exact
per-shard scan (the graphs are connected by construction), which the
tests exploit as an equivalence oracle against brute force.
"""

from __future__ import annotations

import heapq
import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)


def _level(vec_id: int, m_l: float) -> int:
    """Deterministic 'exponential' level from a splitmix64 of the id
    (u in (0, 1]; no RNG state, so builds replay bit-identically)."""
    z = (int(vec_id) + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    z = z ^ (z >> 31)
    u = (z + 1) / 2.0**64
    return int(-math.log(u) * m_l)


class _Graph:
    """One shard's HNSW over row-normalized vectors (similarity =
    dot = cosine). Index-addressed; ids map outside."""

    def __init__(self, X: np.ndarray, m: int, ef_construction: int,
                 levels: list[int]):
        self.X = X
        self.m = m
        self.m0 = 2 * m
        self.efc = max(ef_construction, m + 1)
        self.levels = levels
        # adj[layer][node] -> list of neighbor indices
        self.adj: list[dict[int, list[int]]] = []
        self.entry = -1
        for i in range(len(X)):
            self._insert(i)

    # ---- primitives ----

    def _sim(self, q: np.ndarray, i: int) -> float:
        return float(self.X[i] @ q)

    def _greedy(self, q: np.ndarray, ep: int, layer: int) -> int:
        """Hill-climb to a local similarity maximum on one layer."""
        best, best_s = ep, self._sim(q, ep)
        improved = True
        while improved:
            improved = False
            for nb in self.adj[layer].get(best, ()):
                s = self._sim(q, nb)
                if s > best_s or (s == best_s and nb < best):
                    best, best_s, improved = nb, s, True
        return best

    def _beam(self, q: np.ndarray, ep: int, ef: int, layer: int):
        """ef-bounded best-first search; → [(sim, idx)] best-first."""
        s0 = self._sim(q, ep)
        visited = {ep}
        cand = [(-s0, ep)]  # max-heap on sim
        out = [(s0, ep)]  # min-heap keeps the ef best
        while cand:
            cs, ci = heapq.heappop(cand)
            if -cs < out[0][0] and len(out) >= ef:
                break
            for nb in self.adj[layer].get(ci, ()):
                if nb in visited:
                    continue
                visited.add(nb)
                s = self._sim(q, nb)
                if len(out) < ef or s > out[0][0]:
                    heapq.heappush(cand, (-s, nb))
                    heapq.heappush(out, (s, nb))
                    if len(out) > ef:
                        heapq.heappop(out)
        return sorted(out, key=lambda t: (-t[0], t[1]))

    def _connect(self, layer: int, a: int, b: int) -> None:
        cap = self.m0 if layer == 0 else self.m
        for u, v in ((a, b), (b, a)):
            lst = self.adj[layer].setdefault(u, [])
            if v in lst:
                continue
            lst.append(v)
            if len(lst) > cap:
                # closest-kept prune, ties toward the lower index
                qu = self.X[u]
                lst.sort(key=lambda w: (-(self.X[w] @ qu), w))
                del lst[cap:]

    # ---- build ----

    def _insert(self, i: int) -> None:
        lvl = self.levels[i]
        while len(self.adj) <= lvl:
            self.adj.append({})
        if self.entry < 0:
            self.entry = i
            for layer in range(lvl + 1):
                self.adj[layer].setdefault(i, [])
            return
        q = self.X[i]
        ep = self.entry
        ep_lvl = self.levels[self.entry]
        for layer in range(ep_lvl, lvl, -1):
            ep = self._greedy(q, ep, layer)
        for layer in range(min(lvl, ep_lvl), -1, -1):
            found = self._beam(q, ep, self.efc, layer)
            for s, idx in found[: self.m]:
                self._connect(layer, i, idx)
            self.adj[layer].setdefault(i, [])
            ep = found[0][1]
        if lvl > ep_lvl:
            self.entry = i

    # ---- query ----

    def search(self, q: np.ndarray, k: int, ef: int):
        if self.entry < 0:
            return []
        ep = self.entry
        for layer in range(len(self.adj) - 1, 0, -1):
            ep = self._greedy(q, ep, layer)
        found = self._beam(q, ep, max(ef, k), 0)
        return found[:k]


def _normalize(M: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(M, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return M / n


def hnsw_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    m: int = 8,
    ef_construction: int = 64,
    ef_search: int = 64,
    n_parts: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_query_batch: int = 10_000,
    predicate=None,
) -> DataFrame:
    """→ (query_id, neighbor_id, cos_sim, rank); self-matches
    excluded — the contract shared with cosine_topk / lsh / ivf / pq.

    The query side is a driver-resident batch (broadcast to every
    shard); batches beyond ``max_query_batch`` rows raise loudly
    instead of silently collecting an unbounded frame to the driver —
    the same guard IvfIndex.query carries (similarity/index.py).

    ``predicate`` (Column or SQL string) restricts the corpus BEFORE
    sharding: the per-partition graphs are built over matching vectors
    only, so every emitted neighbor satisfies the filter and the rank
    merge competes within the filtered population — filtered ANN, not
    post-filtered under-k."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if m < 2:
        raise ValueError(f"m must be >= 2, got {m}")
    if n_parts < 1:
        raise ValueError(f"n_parts must be >= 1, got {n_parts}")
    q_rows = (
        queries.select(
            F.col(id_col).cast("long").alias("query_id"),
            F.col(vec_col).cast("array<double>").alias("qv"),
        )
        .limit(max_query_batch + 1)
        .collect()
    )
    if len(q_rows) > max_query_batch:
        raise ValueError(
            f"query batch exceeds max_query_batch={max_query_batch}; "
            "split the batch (or raise the bound)"
        )
    if not q_rows:
        return corpus.sparkSession.createDataFrame(
            [], "query_id long, neighbor_id long, cos_sim double, rank long"
        )
    q_ids = np.array([r["query_id"] for r in q_rows], dtype=np.int64)
    Q = _normalize(np.array([r["qv"] for r in q_rows], dtype=np.float64))
    m_l = 1.0 / math.log(m)
    out_schema = StructType(
        [
            StructField("query_id", LongType()),
            StructField("neighbor_id", LongType()),
            StructField("cos_sim", DoubleType()),
        ]
    )

    def shard(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        parts = [p for p in pdfs if len(p)]
        if not parts:
            return
        pdf = pd.concat(parts, ignore_index=True)
        # id-sorted insertion: the graph is a pure function of the
        # shard's CONTENT, not its arrival order
        pdf = pdf.sort_values("neighbor_id", ignore_index=True)
        ids = pdf["neighbor_id"].to_numpy(dtype=np.int64)
        X = _normalize(
            np.array(pdf["cv"].tolist(), dtype=np.float64)
        )
        g = _Graph(
            X, m, ef_construction,
            [_level(i, m_l) for i in ids],
        )
        qs, ns, ss = [], [], []
        for qi in range(len(q_ids)):
            qid = int(q_ids[qi])
            # +1 head-room so dropping a self-match still leaves k
            for s, idx in g.search(Q[qi], k + 1, ef_search):
                nid = int(ids[idx])
                if nid == qid:
                    continue
                qs.append(qid)
                ns.append(nid)
                ss.append(round(s, 6))
        yield pd.DataFrame(
            {"query_id": qs, "neighbor_id": ns, "cos_sim": ss}
        )

    # repartition by the id COLUMN directly: Spark's hash partitioner
    # is already a content-deterministic uniform spread. (Hashing a
    # precomputed pmod(xxhash64(id), P) shard id AGAIN — the earlier
    # form — collides the P shard ids onto fewer physical partitions:
    # some tasks build ~2x graphs at ~4x quadratic-ish cost while
    # others idle.)
    if predicate is not None:
        corpus = corpus.where(predicate)
    c = corpus.select(
        F.col(id_col).cast("long").alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    ).repartition(n_parts, F.col("neighbor_id"))
    cand = c.mapInPandas(shard, schema=out_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return cand.withColumn(
        "rank", F.row_number().over(w).cast("long")
    ).where(F.col("rank") <= k)
