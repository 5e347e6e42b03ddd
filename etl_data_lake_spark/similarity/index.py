"""Persisted IVF index — train once, assign incrementally, query many.

``ivf.ivf_topk`` re-trains its coarse quantizer on every call, which
is right for a one-shot query but wrong for a served index: at 100 TB
the quantizer is trained ONCE (bounded sample, minutes), while
assignment and querying run for months against it. This module
persists the index as two transactional tables and turns the classic
"inverted lists" into something Spark-native:

* ``<path>/centroids`` — (build, cell, centroid) rows; the whole
  quantizer is a driver-side collect.
* ``<path>/postings`` — (build, id, cell, vector), written
  RANGE-CLUSTERED BY CELL with per-file manifest stats on ``cell``
  and ``build``. The inverted list for a cell is therefore not a
  bespoke data structure but a contiguous run of parquet files, and
  "scan only the probed cells" is manifest-stats file pruning — a
  query planning over 10⁶ files opens only the handful owning its
  probed cells, before a single footer is read.

Rebuild atomicity across the two tables comes from BUILD EPOCHS, not
a cross-table transaction (which no lake offers): a rebuild first
APPENDS postings under a fresh build number — invisible, because
readers resolve the current build from the centroids table — and
publishes the centroids for that build last, in one atomic commit.
A crash (or a concurrent reader) between the two commits sees the
complete OLD index; the new one appears only when its centroid
commit lands. Old builds are garbage-collected by :meth:`gc` (a
stats-pruned ``delete_where`` on the build column).

Querying reuses the ivf.py scoring contract (deterministic JVM-fold
cosine on candidates, rounded scores, id tiebreaks), so
``IvfIndex.build(...).query(q, k, nprobe)`` is bit-identical to
``ivf_topk(corpus, q, ...)`` at the same parameters — pinned in
tests/test_vector_index.py. The query batch is materialized ONCE
(one bounded collect serves both cell probing and the candidate
join), so a non-deterministic queries DataFrame cannot probe one set
of cells and join another; batch size is bounded by
``max_query_batch`` to keep that collect honest.

Incremental maintenance: :meth:`add` assigns new vectors against the
FROZEN quantizer and appends them (ACID, stats-tracked, idempotent
with (app_id, txn_seq)) — no retrain, no rewrite of existing
postings; cells drift only as far as real-world distribution drift,
the standard served-IVF trade (rebuild when recall decays, which
:meth:`cell_sizes` makes observable). ``optimize`` keeps
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
from etl_data_lake_spark.similarity.pq import (
    _adc_partial_topk,
    _adc_tables,
    _encode_udf,
    train_codebooks,
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
        self.books_tbl = TxnTable(spark, f"{self.path}/codebooks")
        self.codec_tbl = TxnTable(spark, f"{self.path}/codec")
        self.rotation_tbl = TxnTable(spark, f"{self.path}/rotation")

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
        pq_m: int | None = None,
        pq_ks: int = 32,
        pq_iters: int = 8,
        codec: str | None = None,
        rotate: bool = False,
    ) -> "IvfIndex":
        """Train the quantizer on a bounded hash-spread sample (same
        deterministic rule as ivf_topk — one scan, tiny collect),
        write the cell-clustered postings under a fresh build epoch,
        then publish the quantizer — the commit order that makes the
        rebuild atomic to every reader (see module docstring).
        ``shards`` bounds the posting file count (default
        min(n_cells, 32)); range-partitioning by cell + within-file
        sort keeps every file's cell-span tight, which is what makes
        probe-time manifest pruning sharp.

        ``pq_m`` turns the index into IVF-PQ (the FAISS composite,
        Jégou 2011): product-quantization codebooks train on the SAME
        bounded sample and every posting also stores its ``pq_m``-byte
        code, so ADC queries scan probed cells reading ONLY
        (id, cell, codes) — the fat vector column stays unread until
        the exact refine touches the few candidates. Codebooks publish
        between postings and centroids; the centroid commit remains
        the single atomic switch.

        ``codec`` stores the round-10 byte codecs in the postings
        instead of PQ codes (mutually exclusive with ``pq_m``):
        ``"sq8"`` = 8-bit scalar quantization (d-byte codes; the
        per-dim [min,max] trains as ONE exact distributed aggregation
        over the FULL corpus, so :meth:`query_codes` at full probe is
        bit-identical to ``sq_topk(corpus, ..., bounds=...)``),
        ``"bq"`` = 1-bit sign quantization (ceil(d/8)-byte codes,
        per-dim mean thresholds). The trained codec parameters persist
        under the same build-epoch rules as PQ codebooks.

        ``rotate=True`` upgrades an IVF-PQ build to IVF-OPQ (round 12;
        Ge et al. CVPR 2013 via similarity/opq.py): the eigenvalue-
        allocated PCA rotation fits on the corpus, the WHOLE index —
        coarse quantizer, codebooks, postings — then lives in the
        rotated basis, and the (d, d) matrix persists in its own
        epoch-ruled table so :meth:`add` and every query path apply
        the FROZEN rotation forever after. Rotation is orthonormal, so
        exact-refine cosines are unchanged (same 6-dp scores); only
        ADC candidate quality improves. The build is bit-identical to
        building a plain IVF-PQ index over ``rotate_vectors(corpus,
        R)`` and querying with rotated queries — test-pinned."""
        import numpy as np

        if pq_m is not None and codec is not None:
            raise ValueError(
                "pq_m and codec are mutually exclusive — a served "
                "index stores one code family per build"
            )
        if codec not in (None, "sq8", "bq"):
            raise ValueError(f"unknown codec {codec!r} (sq8, bq)")
        if rotate and pq_m is None:
            raise ValueError(
                "rotate=True requires pq_m — OPQ is a rotation in "
                "front of product quantization (Ge et al. 2013)"
            )
        rotation = None
        if rotate:
            from etl_data_lake_spark.similarity.opq import (
                fit_rotation,
                rotate_vectors,
            )

            rotation = fit_rotation(corpus, pq_m, id_col, vec_col)
            corpus = rotate_vectors(corpus, rotation, vec_col)
        idx = IvfIndex(spark, path, id_col)
        train = sample_centroids(
            corpus, n_cells * max(train_factor, 1), id_col, vec_col
        )
        centroids = refine_centroids(
            train, train[:n_cells], iters=kmeans_iters
        )
        if not centroids:
            raise ValueError("cannot build an IVF index over an empty corpus")
        books = None
        if pq_m is not None:
            books = train_codebooks(
                np.asarray(train, dtype=np.float64), pq_m, pq_ks,
                iters=pq_iters,
            )
        codec_params = None
        if codec == "sq8":
            from etl_data_lake_spark.similarity.sq import train_sq

            codec_params = train_sq(corpus, id_col, vec_col)  # (2, d)
        elif codec == "bq":
            from etl_data_lake_spark.similarity.bq import train_bq

            codec_params = train_bq(corpus, id_col, vec_col)[None, :]
        build_no = idx._next_build()
        assigned = idx._assign(
            corpus, centroids, vec_col, build_no, books,
            codec=codec, codec_params=codec_params,
        )
        shards = shards if shards is not None else min(max(n_cells, 1), 32)
        idx.postings_tbl.append(
            assigned.repartitionByRange(shards, "cell")
            .sortWithinPartitions("cell"),
            stats_cols=("cell", "build"),
        )
        if books is not None:
            m, ks, _ = books.shape
            bdf = spark.createDataFrame(
                [
                    (build_no, s, c, [float(x) for x in books[s, c]])
                    for s in range(m)
                    for c in range(ks)
                ],
                "build long, s int, code int, centroid array<double>",
            )
            # APPEND per epoch (not overwrite): a crash before the
            # centroid publish must leave the OLD build's codebooks
            # intact, or its ADC path would break — same epoch rule as
            # postings; gc() reclaims superseded builds' books
            idx.books_tbl.append(bdf, stats_cols=("build",))
        if codec_params is not None:
            cpdf = spark.createDataFrame(
                [
                    (build_no, codec, i, [float(x) for x in row])
                    for i, row in enumerate(codec_params)
                ],
                "build long, kind string, row int, vals array<double>",
            )
            # same epoch rule as codebooks
            idx.codec_tbl.append(cpdf, stats_cols=("build",))
        if rotation is not None:
            rdf = spark.createDataFrame(
                [
                    (build_no, i, [float(x) for x in row])
                    for i, row in enumerate(rotation)
                ],
                "build long, row int, vals array<double>",
            )
            # same epoch rule as codebooks: the old build's rotation
            # must survive until the new centroid publish
            idx.rotation_tbl.append(rdf, stats_cols=("build",))
        cdf = spark.createDataFrame(
            [(build_no, i, list(c)) for i, c in enumerate(centroids)],
            "build long, cell int, centroid array<double>",
        )
        idx.centroids_tbl.overwrite(cdf)  # the publish point
        return idx

    def _next_build(self) -> int:
        """Next build epoch: one past the highest ever STAGED into
        postings (not the highest published — a crashed build left
        orphan postings whose number must not be reused)."""
        if self.postings_tbl.latest_version() == 0:
            return 1
        row = self.postings_tbl.snapshot().agg(
            F.max("build").alias("b")
        ).collect()[0]
        return int(row.b or 0) + 1

    def _assign(
        self, df: DataFrame, centroids, vec_col: str, build_no: int,
        books=None, codec: str | None = None, codec_params=None,
    ) -> DataFrame:
        assign = _probe_udf(centroids, 1)
        out = (
            df.select(
                F.col(self.id_col).alias("id"),
                as_double(vec_col).alias("vec"),
            )
            .withColumn("cell", F.element_at(assign(F.col("vec")), 1))
            .withColumn("build", F.lit(build_no).cast("long"))
        )
        if books is not None:
            out = out.withColumn("codes", _encode_udf(books)(F.col("vec")))
        elif codec == "sq8":
            from etl_data_lake_spark.similarity.sq import _sq_encode_udf

            out = out.withColumn(
                "codes", _sq_encode_udf(codec_params)(F.col("vec"))
            )
        elif codec == "bq":
            from etl_data_lake_spark.similarity.bq import _bq_encode_udf

            out = out.withColumn(
                "codes", _bq_encode_udf(codec_params[0])(F.col("vec"))
            )
        return out

    def _codec(self, build_no: int):
        """(kind, params) for ``build_no`` — params is (2, d) bounds
        for sq8, (1, d) thresholds for bq — or None for an index with
        no byte codec."""
        import numpy as np

        if self.codec_tbl.latest_version() == 0:
            return None
        rows = (
            self.codec_tbl.snapshot()
            .where(F.col("build") == build_no)
            .orderBy("row")
            .collect()
        )
        if not rows:
            return None
        return rows[0].kind, np.asarray(
            [list(r.vals) for r in rows], dtype=np.float64
        )

    def _rotation(self, build_no: int):
        """(d, d) OPQ rotation for ``build_no``, or None for an
        unrotated index."""
        import numpy as np

        if self.rotation_tbl.latest_version() == 0:
            return None
        rows = (
            self.rotation_tbl.snapshot()
            .where(F.col("build") == build_no)
            .orderBy("row")
            .collect()
        )
        if not rows:
            return None
        return np.asarray([list(r.vals) for r in rows], dtype=np.float64)

    def _rotated(self, df: DataFrame, R, vec_col: str) -> DataFrame:
        """``df`` with ``vec_col`` rotated into the index basis (no-op
        when the build has no rotation)."""
        if R is None:
            return df
        from etl_data_lake_spark.similarity.opq import rotate_vectors

        return rotate_vectors(df, R, vec_col)

    def _codebooks(self, build_no: int):
        """PQ codebooks for ``build_no`` as an (m, ks, sd) array, or
        None for a plain-IVF index."""
        import numpy as np

        if self.books_tbl.latest_version() == 0:
            return None
        rows = (
            self.books_tbl.snapshot()
            .where(F.col("build") == build_no)
            .orderBy("s", "code")
            .collect()
        )
        if not rows:
            return None
        m = rows[-1].s + 1
        ks = rows[-1].code + 1
        sd = len(rows[0].centroid)
        books = np.empty((m, ks, sd))
        for r in rows:
            books[r.s, r.code] = r.centroid
        return books

    def _quantizer(self) -> tuple[int, list[list[float]]]:
        """(current build, centroids) — resolved from the centroids
        table, the single publish point."""
        rows = self.centroids_tbl.snapshot().orderBy("cell").collect()
        if not rows:
            raise FileNotFoundError(f"no published index at {self.path}")
        return int(rows[0].build), [list(r.centroid) for r in rows]

    def centroids(self) -> list[list[float]]:
        return self._quantizer()[1]

    def current_build(self) -> int:
        return self._quantizer()[0]

    def _postings(self, build_no: int, cells: list[int]) -> DataFrame:
        """Current-build postings restricted — at the manifest level —
        to files that can hold any probed cell AND the build."""
        cell_files = set(
            self.postings_tbl.files_matching_any(
                "cell", [(c, c) for c in sorted(set(cells))]
            )
        )
        build_files, _ = self.postings_tbl.files_matching(
            {"build": (build_no, build_no)}
        )
        keep = sorted(cell_files & set(build_files))
        meta = self.postings_tbl.snapshot_meta()
        return self.postings_tbl.read_files(meta, keep).where(
            F.col("build") == build_no
        )

    def _build_postings(self, build_no: int) -> DataFrame:
        """ALL current-build postings (every cell) — the refill scan
        for guaranteed-k filtered queries; build-pruned at the
        manifest level like :meth:`_postings`."""
        files, _ = self.postings_tbl.files_matching(
            {"build": (build_no, build_no)}
        )
        meta = self.postings_tbl.snapshot_meta()
        return self.postings_tbl.read_files(meta, sorted(files)).where(
            F.col("build") == build_no
        )

    @staticmethod
    def _id_mask(filter_ids: DataFrame, id_col: str, out_name: str):
        """The filter frame as a single-column semi-join mask. Accepts
        either the caller's ``id_col`` name or a one-column frame."""
        if id_col in filter_ids.columns:
            return filter_ids.select(F.col(id_col).alias(out_name))
        if len(filter_ids.columns) == 1:
            return filter_ids.select(
                F.col(filter_ids.columns[0]).alias(out_name)
            )
        raise ValueError(
            f"filter_ids must carry column {id_col!r} or be a "
            f"one-column frame; got {filter_ids.columns}"
        )

    # ------------------------------------------------- maintenance --

    def add(
        self,
        vectors: DataFrame,
        vec_col: str = "embedding",
        app_id: str | None = None,
        txn_seq: int | None = None,
    ) -> int:
        """Assign ``vectors`` against the frozen quantizer and append
        them under the CURRENT build — O(new vectors), existing
        postings untouched. Idempotent under (app_id, txn_seq) like
        any txn append, so a streaming foreachBatch can maintain the
        index exactly-once."""
        build_no, centroids = self._quantizer()
        cdc = self._codec(build_no)
        # frozen-rotation add: new vectors enter the SAME basis the
        # quantizer, codebooks, and existing postings live in
        vectors = self._rotated(vectors, self._rotation(build_no), vec_col)
        assigned = self._assign(
            vectors, centroids, vec_col, build_no,
            books=self._codebooks(build_no),
            codec=cdc[0] if cdc else None,
            codec_params=cdc[1] if cdc else None,
        )
        return self.postings_tbl.append(
            assigned,
            app_id=app_id,
            txn_seq=txn_seq,
            stats_cols=("cell", "build"),
        )

    def optimize(self, target_bytes: int = 128 << 20) -> int:
        """Re-compact append-fragmented postings (stats kept)."""
        return self.postings_tbl.optimize_small_files(
            target_bytes=target_bytes, stats_cols=("cell", "build")
        )

    def gc(self) -> int:
        """Drop postings (and codebooks) of superseded builds —
        stats-pruned row-level deletes, only old builds' files are
        rewritten/removed. Run after a rebuild settles; readers of the
        current build are untouched."""
        cur = self.current_build()
        v = self.postings_tbl.delete_where(
            "build", 0, cur - 1, stats_cols=("cell", "build")
        )
        if self.books_tbl.latest_version() > 0:
            self.books_tbl.delete_where(
                "build", 0, cur - 1, stats_cols=("build",)
            )
        if self.codec_tbl.latest_version() > 0:
            self.codec_tbl.delete_where(
                "build", 0, cur - 1, stats_cols=("build",)
            )
        if self.rotation_tbl.latest_version() > 0:
            self.rotation_tbl.delete_where(
                "build", 0, cur - 1, stats_cols=("build",)
            )
        return v

    def upsert_sink(self, vec_col: str = "embedding", app_id: str = "idx"):
        """``foreachBatch`` function that maintains this index from a
        vector stream: each micro-batch is assigned against the frozen
        quantizer (codes included for PQ builds) and appended with the
        batch id as the txn seq — replayed batches no-op, so the index
        stays exactly-once under at-least-once drivers (the same
        composition as txn_append_sink / merge_upsert_sink)."""

        def fn(batch: DataFrame, batch_id: int) -> None:
            self.add(batch, vec_col=vec_col, app_id=app_id, txn_seq=batch_id)

        return fn

    def cell_sizes(self) -> DataFrame:
        """(cell, n_vectors) for the current build — the skew/drift
        observability that tells an operator when a rebuild is due."""
        cur = self.current_build()
        return (
            self.postings_tbl.snapshot()
            .where(F.col("build") == cur)
            .groupBy("cell")
            .agg(F.count("*").alias("n_vectors"))
        )

    # ------------------------------------------------------- query --

    def probed_files(self, cells: list[int]) -> tuple[list[str], int]:
        """(files any probed current-build cell can live in, total
        files) — the manifest-pruning readout tests assert on."""
        cur = self.current_build()
        cell_files = set(
            self.postings_tbl.files_matching_any(
                "cell", [(c, c) for c in sorted(set(cells))]
            )
        )
        build_files, total = self.postings_tbl.files_matching(
            {"build": (cur, cur)}
        )
        return sorted(cell_files & set(build_files)), total

    def query(
        self,
        queries: DataFrame,
        k: int = 10,
        nprobe: int = 4,
        vec_col: str = "embedding",
        max_query_batch: int = 100_000,
        filter_ids: DataFrame | None = None,
    ) -> DataFrame:
        """→ (query_id, neighbor_id, cos_sim, rank); same contract and
        same bit-deterministic scoring as ivf.ivf_topk, but the corpus
        scan is restricted — at the FILE level, via manifest stats —
        to the cells this query batch probes. The batch is collected
        ONCE (cells and join side come from the same materialized
        rows, so a non-deterministic input cannot probe one cell set
        and join another); batches beyond ``max_query_batch`` rows
        raise rather than silently ballooning the driver.

        ``filter_ids`` = filtered ANN on the SERVED index (the
        ivf_topk ``predicate`` semantics, expressed as an id frame
        because the index stores no metadata columns — derive it from
        any metadata join upstream). The mask semi-joins the probed
        postings, and k is GUARANTEED exactly like ivf_topk's filtered
        path: queries whose probed cells held fewer than ``k`` matches
        re-run as exact brute force over the filtered current build —
        never a silently under-k answer. At scale pass a small mask as
        ``F.broadcast(filter_ids)``; a large one semi-joins on the id
        (narrow shuffle of ids, never vectors).

        ``filter_ids`` MUST be deterministic: it is evaluated twice —
        once as the postings mask and once as the refill corpus's
        semi-join — so a frame whose contents can differ between
        evaluations (a fresh sample, a rand()-derived filter, a read
        of a concurrently-mutating source) could mask one id set and
        refill against another. The one-collect discipline protects
        the QUERIES side only. Materialize a non-deterministic mask
        first (``filter_ids.localCheckpoint()`` — note this drops a
        broadcast hint, re-apply it after) or derive it from stable
        inputs."""
        build_no, centroids = self._quantizer()
        queries = self._rotated(queries, self._rotation(build_no), vec_col)
        probe = _probe_udf(centroids, nprobe)
        q = queries.select(
            F.col(self.id_col).alias("query_id"),
            as_double(vec_col).alias("qv"),
        )
        qrows = q.select(
            "query_id", "qv", probe(F.col("qv")).alias("cells")
        ).limit(max_query_batch + 1).collect()
        if len(qrows) > max_query_batch:
            raise ValueError(
                f"query batch exceeds max_query_batch={max_query_batch}; "
                "split the batch (or raise the bound)"
            )
        if not qrows:
            # empty batch: empty result with the contract schema
            # (query-id-typed like the caller's id column)
            sch = q.select(
                F.col("query_id"),
                F.col("query_id").alias("neighbor_id"),
                F.lit(0.0).alias("cos_sim"),
                F.lit(0).cast("long").alias("rank"),
            ).schema
            return self.spark.createDataFrame([], sch)
        probed = sorted({c for r in qrows for c in r.cells})
        from pyspark.sql.types import ArrayType, IntegerType

        qb_schema = q.schema.add("cells", ArrayType(IntegerType()))
        qb = self.spark.createDataFrame(
            [(r.query_id, list(r.qv), [int(c) for c in r.cells])
             for r in qrows],
            qb_schema,
        ).select("query_id", "qv", F.explode("cells").alias("cell"))
        postings = self._postings(build_no, probed).select(
            F.col("id").alias("neighbor_id"),
            F.col("vec").alias("cv"),
            "cell",
        )
        if filter_ids is not None:
            postings = postings.join(
                self._id_mask(filter_ids, self.id_col, "neighbor_id"),
                "neighbor_id",
                "left_semi",
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
        ranked = scored.withColumn(
            "rank", F.row_number().over(w).cast("long")
        ).where(F.col("rank") <= k)
        if filter_ids is None:
            return ranked
        return self._refill_short(
            ranked, qrows, filter_ids, build_no, k, vec_col,
            max_query_batch,
        )

    def _refill_short(
        self,
        ranked: DataFrame,
        qrows: list,
        filter_ids: DataFrame,
        build_no: int,
        k: int,
        vec_col: str,
        max_query_batch: int,
    ) -> DataFrame:
        """Guaranteed-k for filtered index queries: delegate to
        ivf._guarantee_k with (a) the filtered CURRENT BUILD as the
        refill corpus and (b) a LOCAL queries frame rebuilt from the
        already-collected batch rows — the one-collect contract holds
        (a non-deterministic queries input cannot probe one id set and
        refill another)."""
        from pyspark.sql.types import (
            ArrayType,
            DoubleType,
            StructField,
            StructType,
        )

        from etl_data_lake_spark.similarity.ivf import _guarantee_k

        corpus = self._build_postings(build_no).select(
            F.col("id").alias(self.id_col), F.col("vec").alias(vec_col)
        ).join(
            self._id_mask(filter_ids, self.id_col, self.id_col),
            self.id_col,
            "left_semi",
        )
        id_type = ranked.schema["query_id"].dataType
        q_local = self.spark.createDataFrame(
            [(r.query_id, [float(x) for x in r.qv]) for r in qrows],
            StructType(
                [
                    StructField(self.id_col, id_type),
                    StructField(vec_col, ArrayType(DoubleType())),
                ]
            ),
        )
        return _guarantee_k(
            ranked, corpus, q_local, k, self.id_col, vec_col,
            max_query_batch,
        )

    def query_adc(
        self,
        queries: DataFrame,
        k: int = 10,
        nprobe: int = 4,
        refine_factor: int = 4,
        vec_col: str = "embedding",
        max_query_batch: int = 100_000,
        filter_ids: DataFrame | None = None,
    ) -> DataFrame:
        """IVF-PQ query (requires a ``pq_m`` build): probed cells are
        scanned reading ONLY (id, cell, codes) — the fat vector column
        is untouched by scoring — and each Arrow batch emits its
        per-query ADC top-(k·refine_factor) partial, so the exchange
        carries candidates, not postings (pq.py's map-side-partial
        contract, now composed under the cell pruning). The exact
        JVM-fold cosine re-scores the candidates from the postings'
        vector column, so emitted scores keep the bit-deterministic
        contract of every ANN path here. refine_factor covering the
        probed cells ⇒ identical to :meth:`query` at equal nprobe
        (test-pinned).

        ``filter_ids`` masks the CODE scan (and the refine's vector
        lookup) before the ADC partial, so the candidate
        top-(k·refine_factor) competes only among matching vectors;
        k is guaranteed by the same exact-brute-force refill as
        :meth:`query` (probed cells can come up short under a
        selective filter)."""
        import numpy as np

        build_no, centroids = self._quantizer()
        queries = self._rotated(queries, self._rotation(build_no), vec_col)
        books = self._codebooks(build_no)
        if books is None:
            raise ValueError(
                "query_adc needs an IVF-PQ build (pq_m=...); this index "
                "has no codebooks"
            )
        probe = _probe_udf(centroids, nprobe)
        q = queries.select(
            F.col(self.id_col).alias("query_id"),
            as_double(vec_col).alias("qv"),
        )
        qrows = q.select(
            "query_id", "qv", probe(F.col("qv")).alias("cells")
        ).limit(max_query_batch + 1).collect()
        if len(qrows) > max_query_batch:
            raise ValueError(
                f"query batch exceeds max_query_batch={max_query_batch}"
            )
        if not qrows:
            sch = q.select(
                F.col("query_id"),
                F.col("query_id").alias("neighbor_id"),
                F.lit(0.0).alias("cos_sim"),
                F.lit(0).cast("long").alias("rank"),
            ).schema
            return self.spark.createDataFrame([], sch)
        probed = sorted({c for r in qrows for c in r.cells})
        query_mat = np.asarray([list(r.qv) for r in qrows], dtype=np.float64)

        from pyspark.sql.types import (
            DoubleType,
            IntegerType,
            StructField,
            StructType,
        )

        id_type = q.schema["query_id"].dataType
        q_idx = self.spark.createDataFrame(
            [(i, r.query_id) for i, r in enumerate(qrows)],
            StructType(
                [
                    StructField("q_i", IntegerType()),
                    StructField("query_id", id_type),
                ]
            ),
        )
        # narrow scan: column pruning drops `vec` at the parquet read;
        # `cell` rides along so the partial can enforce PER-QUERY
        # probe sets (a query scores its cells, not the batch union)
        codes = self._postings(build_no, probed).select(
            F.col("id").alias("neighbor_id"), "codes", "cell"
        )
        if filter_ids is not None:
            codes = codes.join(
                self._id_mask(filter_ids, self.id_col, "neighbor_id"),
                "neighbor_id",
                "left_semi",
            )
        tabs = _adc_tables(books, query_mat)
        m = books.shape[0]
        n_keep = k * refine_factor + 1
        cell_sets = [set(int(c) for c in r.cells) for r in qrows]
        partial = codes.mapInPandas(
            _adc_partial_topk(tabs, m, n_keep, cell_sets=cell_sets),
            schema=StructType(
                [
                    StructField("neighbor_id", id_type),
                    StructField("q_i", IntegerType()),
                    StructField("adc", DoubleType()),
                ]
            ),
        )
        cand_w = Window.partitionBy("query_id").orderBy(
            F.desc("adc"), F.asc("neighbor_id")
        )
        cands = (
            partial.join(F.broadcast(q_idx), "q_i")
            .where(F.col("neighbor_id") != F.col("query_id"))
            .withColumn("_r", F.row_number().over(cand_w))
            .where(F.col("_r") <= k * refine_factor)
            .select("query_id", "neighbor_id")
        )
        cv = self._postings(build_no, probed).select(
            F.col("id").alias("neighbor_id"), F.col("vec").alias("cv")
        )
        from pyspark.sql.types import ArrayType

        qv = self.spark.createDataFrame(
            [(r.query_id, [float(x) for x in r.qv]) for r in qrows],
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
        ranked = exact.withColumn(
            "rank", F.row_number().over(w).cast("long")
        ).where(F.col("rank") <= k)
        if filter_ids is None:
            return ranked
        return self._refill_short(
            ranked, qrows, filter_ids, build_no, k, vec_col,
            max_query_batch,
        )

    def query_codes(
        self,
        queries: DataFrame,
        k: int = 10,
        nprobe: int = 4,
        refine_factor: int = 4,
        vec_col: str = "embedding",
        max_query_batch: int = 100_000,
        filter_ids: DataFrame | None = None,
    ) -> DataFrame:
        """Byte-codec query (requires a ``codec=`` build): probed
        cells are scanned reading ONLY (id, cell, codes) — sq8 scores
        each Arrow batch with one byte matmul (the affine identity in
        similarity/sq.py), bq with XOR+popcount Hamming — then the
        exact JVM-fold cosine refines the global
        top-(k·refine_factor) candidates from the postings' vector
        column. Build-once/query-many: the codec trained at build time
        serves every query, exactly like ADC's codebooks.

        With ``nprobe`` covering every cell and equal parameters, the
        result is BIT-IDENTICAL to the on-the-fly ``sq_topk`` /
        ``bq_topk`` at the index's trained parameters (the codec
        trains on the full corpus with the same exact aggregation) —
        test-pinned. ``filter_ids`` masks the code scan and k is
        guaranteed by the same exact refill as :meth:`query`."""
        import numpy as np

        from etl_data_lake_spark.similarity.bq import (
            _bq_partial_topk,
            _pack_signs,
        )
        from etl_data_lake_spark.similarity.sq import (
            _EPS,
            _normalize,
            _sq_partial_topk,
        )

        build_no, centroids = self._quantizer()
        queries = self._rotated(queries, self._rotation(build_no), vec_col)
        cdc = self._codec(build_no)
        if cdc is None:
            raise ValueError(
                "query_codes needs a codec build (codec='sq8'/'bq'); "
                "this index stores no byte codes"
            )
        kind, params = cdc
        probe = _probe_udf(centroids, nprobe)
        q = queries.select(
            F.col(self.id_col).alias("query_id"),
            as_double(vec_col).alias("qv"),
        )
        qrows = q.select(
            "query_id", "qv", probe(F.col("qv")).alias("cells")
        ).limit(max_query_batch + 1).collect()
        if len(qrows) > max_query_batch:
            raise ValueError(
                f"query batch exceeds max_query_batch={max_query_batch}"
            )
        if not qrows:
            sch = q.select(
                F.col("query_id"),
                F.col("query_id").alias("neighbor_id"),
                F.lit(0.0).alias("cos_sim"),
                F.lit(0).cast("long").alias("rank"),
            ).schema
            return self.spark.createDataFrame([], sch)
        probed = sorted({c for r in qrows for c in r.cells})
        query_mat = _normalize(
            np.asarray([list(r.qv) for r in qrows], dtype=np.float64)
        )
        n_keep = k * refine_factor + 1
        cell_sets = [set(int(c) for c in r.cells) for r in qrows]
        if kind == "sq8":
            lo, hi = params[0], params[1]
            span = np.maximum(hi - lo, _EPS)
            W = (query_mat * span[None, :] / 255.0).T
            const = query_mat @ lo
            gen = _sq_partial_topk(W, const, n_keep, cell_sets=cell_sets)
            score_col = "adc"
        else:  # bq
            qbits = _pack_signs(query_mat, params[0])
            gen = _bq_partial_topk(qbits, n_keep, cell_sets=cell_sets)
            score_col = "neg_hamming"

        from pyspark.sql.types import (
            ArrayType,
            DoubleType,
            IntegerType,
            StructField,
            StructType,
        )

        id_type = q.schema["query_id"].dataType
        q_idx = self.spark.createDataFrame(
            [(i, r.query_id) for i, r in enumerate(qrows)],
            StructType(
                [
                    StructField("q_i", IntegerType()),
                    StructField("query_id", id_type),
                ]
            ),
        )
        codes = self._postings(build_no, probed).select(
            F.col("id").alias("neighbor_id"), "codes", "cell"
        )
        if filter_ids is not None:
            codes = codes.join(
                self._id_mask(filter_ids, self.id_col, "neighbor_id"),
                "neighbor_id",
                "left_semi",
            )
        partial = codes.mapInPandas(
            gen,
            schema=StructType(
                [
                    StructField("neighbor_id", id_type),
                    StructField("q_i", IntegerType()),
                    StructField(score_col, DoubleType()),
                ]
            ),
        )
        cand_w = Window.partitionBy("query_id").orderBy(
            F.desc(score_col), F.asc("neighbor_id")
        )
        cands = (
            partial.join(F.broadcast(q_idx), "q_i")
            .where(F.col("neighbor_id") != F.col("query_id"))
            .withColumn("_r", F.row_number().over(cand_w))
            .where(F.col("_r") <= k * refine_factor)
            .select("query_id", "neighbor_id")
        )
        cv = self._postings(build_no, probed).select(
            F.col("id").alias("neighbor_id"), F.col("vec").alias("cv")
        )
        qv = self.spark.createDataFrame(
            [(r.query_id, [float(x) for x in r.qv]) for r in qrows],
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
        w2 = Window.partitionBy("query_id").orderBy(
            F.desc("cos_sim"), F.asc("neighbor_id")
        )
        ranked = exact.withColumn(
            "rank", F.row_number().over(w2).cast("long")
        ).where(F.col("rank") <= k)
        if filter_ids is None:
            return ranked
        return self._refill_short(
            ranked, qrows, filter_ids, build_no, k, vec_col,
            max_query_batch,
        )
