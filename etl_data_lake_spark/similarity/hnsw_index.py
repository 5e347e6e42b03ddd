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
* ``<path>/meta`` — (build, m, ef_construction, n_shards, reserved,
  shard_builds): the single-row publish point. Rebuilds append graphs
  under a fresh build number FIRST (invisible) and publish meta LAST
  in one atomic commit — IvfIndex's build-epoch rule, so readers
  always see a complete index; :meth:`gc` reclaims superseded builds.
  Build numbers are CAS-ALLOCATED through the meta table (the
  ``reserved`` high-water mark bumps under an ``expected_base``
  overwrite), so two concurrent builds can never append graph rows
  under the same number — the corruption a max(build)+1 scan allowed
  (round-10 advice item). ``shard_builds[s]`` records which build's
  rows are live for shard ``s``: a full build points every shard at
  its own number; an :meth:`add` rewrites only the AFFECTED shards
  under a fresh number and repoints just those entries, so readers
  assemble the index from (shard, build) pairs and never see a
  half-applied add.

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

Incremental adds (:meth:`HnswIndex.add`, round 10) insert new nodes
into their shard's EXISTING graph — the Malkov-Yashunin insert is the
same greedy descent + beam the build runs, so an add costs
O(new·log(shard)·M·d) insertion work on the affected shards only,
never a full-corpus rebuild. Unaffected shards are not even copied:
the add appends the rewritten shards under a fresh build number and
the meta publish repoints only their ``shard_builds`` entries.
Idempotent under (app_id, txn_seq) like ``IvfIndex.add``, so a
streaming foreachBatch maintains the index exactly-once. When added
ids sort AFTER every existing id in their shard (the append-only
ingest pattern), the grown graph is BIT-IDENTICAL to a from-scratch
build over the union (insertion order and splitmix levels are pure
functions of the ids); interleaved ids yield a valid HNSW that is
exact under ``ef_search >= shard size`` like any build.

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
from etl_data_lake_spark.sources.txn import ConcurrentWriteError, TxnTable

_GRAPH_SCHEMA = (
    "build long, shard int, node int, vec_id long, "
    "vec array<double>, level int, adj array<array<int>>, "
    "is_entry boolean"
)

_META_SCHEMA = (
    "build long, m int, ef_construction int, n_shards int, "
    "reserved long, shard_builds array<long>"
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
        base_state = idx._meta_state()
        base_build = base_state["build"] if base_state else 0
        build_no = idx._reserve_build(m, ef_construction, n_shards)
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
        idx._publish(  # the publish point
            build_no, m, ef_construction, n_shards,
            [build_no] * n_shards, base_build,
        )
        return idx

    # ------------------------------------------- meta protocol --

    def _meta_state(self) -> dict | None:
        """The meta row as a dict, or None if never written. Tolerates
        pre-round-10 rows (no reserved/shard_builds columns)."""
        if self.meta_tbl.latest_version() == 0:
            return None
        rows = self.meta_tbl.snapshot().collect()
        if not rows:
            return None
        r = rows[0].asDict()
        build = int(r["build"])
        n_shards = int(r["n_shards"])
        reserved = int(r.get("reserved") or build)
        shard_builds = r.get("shard_builds") or [build] * n_shards
        return {
            "build": build,
            "m": int(r["m"]),
            "ef_construction": int(r["ef_construction"]),
            "n_shards": n_shards,
            "reserved": max(reserved, build),
            "shard_builds": [int(b) for b in shard_builds],
        }

    def _reserve_build(
        self, m: int, ef_construction: int, n_shards: int,
        retries: int = 5,
    ) -> int:
        """CAS-allocate a build number nobody else can get: bump the
        ``reserved`` high-water mark under expected_base, keeping the
        published fields untouched (concurrent readers are unaffected
        — ``build`` stays whatever is live). Two concurrent builders
        conflict on the overwrite and the loser re-reads, so allocated
        numbers are unique per reservation."""
        for _ in range(retries):
            mv = self.meta_tbl.latest_version()
            st = self._meta_state()
            if st is None:
                # fresh index: a build=0 reservation row; _meta() keeps
                # raising "no published index" until the first publish
                st = {
                    "build": 0, "m": m,
                    "ef_construction": ef_construction,
                    "n_shards": n_shards, "reserved": 0,
                    "shard_builds": [0] * n_shards,
                }
            new_build = st["reserved"] + 1
            meta = self.spark.createDataFrame(
                [(
                    st["build"], st["m"], st["ef_construction"],
                    st["n_shards"], new_build, st["shard_builds"],
                )],
                _META_SCHEMA,
            )
            try:
                self.meta_tbl.overwrite(meta, expected_base=mv)
                return new_build
            except ConcurrentWriteError:
                continue
        raise ConcurrentWriteError(
            f"could not reserve a build number at {self.path} after "
            f"{retries} attempts — concurrent writers are thrashing"
        )

    def _publish(
        self,
        build: int,
        m: int,
        ef_construction: int,
        n_shards: int,
        shard_builds: list[int],
        base_build: int,
        app_id: str | None = None,
        txn_seq: int | None = None,
        retries: int = 5,
    ) -> int:
        """Atomically publish ``shard_builds`` — but only if the
        published build is still ``base_build`` (what this operation
        read when it started). A concurrent PUBLISH in the window
        raises ConcurrentWriteError (the orphaned rows are gc-able —
        their build number is unique, so they can never contaminate
        the winner); a concurrent RESERVATION merely rebases, keeping
        the highest reserved mark."""
        for _ in range(retries):
            mv = self.meta_tbl.latest_version()
            st = self._meta_state()
            cur_pub = st["build"] if st else 0
            cur_res = st["reserved"] if st else 0
            if cur_pub != base_build:
                raise ConcurrentWriteError(
                    f"index at {self.path} was published (build "
                    f"{cur_pub}) while this operation (based on build "
                    f"{base_build}) was running — rerun against the "
                    "new index"
                )
            meta = self.spark.createDataFrame(
                [(
                    build, m, ef_construction, n_shards,
                    max(cur_res, build), [int(b) for b in shard_builds],
                )],
                _META_SCHEMA,
            )
            try:
                return self.meta_tbl.overwrite(
                    meta, expected_base=mv, app_id=app_id,
                    txn_seq=txn_seq,
                )
            except ConcurrentWriteError:
                continue
        raise ConcurrentWriteError(
            f"could not publish build {build} at {self.path} after "
            f"{retries} attempts — concurrent writers are thrashing"
        )

    def _meta(self):
        st = self._meta_state()
        if st is None or st["build"] == 0:
            raise FileNotFoundError(f"no published index at {self.path}")
        return (
            st["build"], st["m"], st["ef_construction"], st["n_shards"],
        )

    def _meta_full(self) -> dict:
        st = self._meta_state()
        if st is None or st["build"] == 0:
            raise FileNotFoundError(f"no published index at {self.path}")
        return st

    def current_build(self) -> int:
        return self._meta()[0]

    def _stored(self, shard_builds: list[int]) -> DataFrame:
        """Graph rows live under the published mapping: exactly the
        (shard, build) pairs meta points at — orphans from aborted or
        superseded builds are invisible by construction."""
        from functools import reduce as _reduce

        conds = [
            (F.col("shard") == s) & (F.col("build") == b)
            for s, b in enumerate(shard_builds)
        ]
        return self.graphs_tbl.snapshot().where(
            F.col("build").isin(sorted(set(shard_builds)))
            & _reduce(lambda x, y: x | y, conds)
        )

    def gc(self) -> int:
        """Drop graph rows of builds the published mapping no longer
        references (stats-pruned row-level deletes). Superseded full
        builds, shards an add rewrote, and aborted builds BELOW the
        published number all go; an aborted build numbered above it
        survives until a later publish passes it. Run quiesced — an
        in-flight add's not-yet-published rows look exactly like an
        aborted build."""
        st = self._meta_full()
        live = set(st["shard_builds"])
        garbage = [
            b for b in range(0, st["build"]) if b not in live
        ]
        if not garbage:
            return self.graphs_tbl.latest_version()
        # compress into contiguous [lo, hi] ranges
        ranges: list[tuple[int, int]] = []
        for b in garbage:
            if ranges and ranges[-1][1] == b - 1:
                ranges[-1] = (ranges[-1][0], b)
            else:
                ranges.append((b, b))
        return self.graphs_tbl.delete_where_ranges(
            "build", ranges, stats_cols=("shard", "build")
        )

    # --------------------------------------------------------- add --

    def add(
        self,
        vectors: DataFrame,
        vec_col: str = "embedding",
        app_id: str | None = None,
        txn_seq: int | None = None,
    ) -> int:
        """Insert ``vectors`` into their shards' stored graphs —
        O(new·log(shard)·M·d) insertion work on AFFECTED shards only
        (the Malkov-Yashunin insert: greedy descent through the upper
        layers, beam at the lower, bidirectional M-links with
        closest-kept pruning — exactly what the build runs per node).
        Unaffected shards are untouched: the rewritten shards land
        under a fresh CAS-reserved build number and the meta publish
        repoints only their ``shard_builds`` entries.

        Idempotent under (app_id, txn_seq): a replayed seq no-ops at
        whichever step it previously reached (graph append and meta
        publish are each txn-stamped, and a crash between them is
        recovered by reading the append's build number back from its
        manifest), so a streaming foreachBatch maintains the index
        exactly-once. Adding a vec_id the index already holds raises —
        HNSW nodes are not upsertable; delete + rebuild, or use the
        IVF index for churn-heavy corpora."""
        st = self._meta_full()
        m, efc = st["m"], st["ef_construction"]
        n_shards = st["n_shards"]
        shard_builds = list(st["shard_builds"])
        if app_id is not None and txn_seq is not None:
            msnap = self.meta_tbl.snapshot_meta()
            if (
                msnap is not None
                and msnap.writer_txns.get(app_id, -1) >= txn_seq
            ):
                return msnap.version  # fully applied earlier
        new = vectors.select(
            F.col(self.id_col).cast("long").alias("vec_id"),
            F.col(vec_col).cast("array<double>").alias("vec"),
            F.pmod(
                F.hash(F.col(self.id_col).cast("long")),
                F.lit(n_shards),
            ).cast("int").alias("shard"),
        )
        replayed = self._replayed_add_build(app_id, txn_seq)
        if replayed is not None:
            b_new, affected = replayed
        else:
            affected = sorted(
                int(r.shard)
                for r in new.select("shard").distinct().collect()
            )
            if not affected:
                return self.meta_tbl.latest_version()
            stored_aff = self._stored(shard_builds).where(
                F.col("shard").isin(affected)
            )
            n_dup = (
                stored_aff.select("vec_id")
                .join(new.select("vec_id"), "vec_id", "inner")
                .count()
            )
            if n_dup:
                raise ValueError(
                    f"{n_dup} of the added vec_ids already exist in the "
                    "index — HNSW nodes are not upsertable (delete and "
                    "rebuild, or use IvfIndex for churn)"
                )
            b_new = self._reserve_build(m, efc, n_shards)
            new_rows = new.select(
                F.lit(b_new).cast("long").alias("build"),
                "shard",
                F.lit(-1).cast("int").alias("node"),
                "vec_id",
                "vec",
                F.lit(-1).cast("int").alias("level"),
                F.lit(None).cast("array<array<int>>").alias("adj"),
                F.lit(False).alias("is_entry"),
            )
            m_l = 1.0 / math.log(m)
            cols = [
                "build", "shard", "node", "vec_id", "vec", "level",
                "adj", "is_entry",
            ]

            def grow(pdf: pd.DataFrame) -> pd.DataFrame:
                shard_val = int(pdf["shard"].iloc[0])
                newp = pdf[pdf["node"] < 0].sort_values(
                    "vec_id", ignore_index=True
                )
                base = pdf[pdf["node"] >= 0]
                new_ids = newp["vec_id"].to_numpy(dtype=np.int64)
                Xn = _normalize(
                    np.array(newp["vec"].tolist(), dtype=np.float64)
                )
                if not len(base):
                    # shard was empty at build time: fresh graph,
                    # exactly what build_shards would produce
                    g = _Graph(
                        Xn, m, efc,
                        [_level(int(i), m_l) for i in new_ids],
                    )
                    all_ids = new_ids
                else:
                    ids, g = _graph_from_rows(base, m)
                    g.efc = max(efc, m + 1)
                    g.X = np.vstack([g.X, Xn])
                    n0 = len(ids)
                    for j, nid in enumerate(new_ids):
                        g.levels.append(_level(int(nid), m_l))
                        g._insert(n0 + j)
                    all_ids = np.concatenate([ids, new_ids])
                return pd.DataFrame(
                    _graph_rows(b_new, shard_val, all_ids, g.X, g),
                    columns=cols,
                )

            grown = (
                stored_aff.unionByName(new_rows)
                .groupBy("shard")
                .applyInPandas(grow, schema=_GRAPH_SCHEMA)
            )
            self.graphs_tbl.append(
                grown.sortWithinPartitions("shard", "node"),
                app_id=app_id,
                txn_seq=txn_seq,
                stats_cols=("shard", "build"),
                op_params={
                    "hnsw_add": {
                        "app_id": app_id,
                        "txn_seq": txn_seq,
                        "build": b_new,
                        "shards": affected,
                    }
                },
            )
        for s in affected:
            shard_builds[s] = b_new
        return self._publish(
            b_new, m, efc, n_shards, shard_builds, st["build"],
            app_id=app_id, txn_seq=txn_seq,
        )

    def _replayed_add_build(
        self, app_id: str | None, txn_seq: int | None
    ) -> tuple[int, list[int]] | None:
        """If this (app_id, txn_seq) already appended its grown shards
        (crash between append and publish), recover (build, shards)
        from the append's manifest instead of re-reserving — the
        publish must point at the rows that actually exist."""
        if app_id is None or txn_seq is None:
            return None
        gsnap = self.graphs_tbl.snapshot_meta()
        if gsnap is None or gsnap.writer_txns.get(app_id, -1) < txn_seq:
            return None
        for v in range(gsnap.version, 0, -1):
            params = self.graphs_tbl._read_manifest(v).get("params") or {}
            rec = params.get("hnsw_add")
            if (
                rec
                and rec.get("app_id") == app_id
                and rec.get("txn_seq") == txn_seq
            ):
                return int(rec["build"]), [int(s) for s in rec["shards"]]
        raise RuntimeError(
            f"graphs table records (app_id={app_id!r}, txn_seq="
            f"{txn_seq}) as applied but no manifest carries its "
            "hnsw_add record — the table was written by something "
            "other than HnswIndex.add under this app_id"
        )

    def upsert_sink(self, vec_col: str = "embedding", app_id: str = "hnswidx"):
        """``foreachBatch`` function maintaining this index from a
        vector stream, batch id as the txn seq — replayed batches
        no-op (IvfIndex.upsert_sink's composition)."""

        def fn(batch: DataFrame, batch_id: int) -> None:
            self.add(batch, vec_col=vec_col, app_id=app_id,
                     txn_seq=batch_id)

        return fn

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
        guaranteed k, never a silently under-k answer.

        ``filter_ids`` MUST be deterministic — it feeds both the
        candidate mask and the refill corpus (IvfIndex.query's
        contract, see its docstring): materialize a non-deterministic
        mask (localCheckpoint) before passing it."""
        if k < 1:
            raise ValueError(f"k must be >= 1, got {k}")
        if filter_overfetch < 1:
            raise ValueError(
                f"filter_overfetch must be >= 1, got {filter_overfetch}"
            )
        st = self._meta_full()
        m = st["m"]
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

        stored = self._stored(st["shard_builds"])
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
