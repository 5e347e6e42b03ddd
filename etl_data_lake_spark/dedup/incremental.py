"""Persisted MinHash-LSH dedup index — incremental near-dup checks.

``dedup.minhash.minhash_lsh_pairs`` re-shingles and re-signs the whole
corpus per call, which is right for one-shot batch dedup but wrong for
the steady-state pipeline shape at 100 TB: a corpus indexed ONCE, then
a stream of new document batches each asking "is this a near-dup of
anything we already have (or of each other)?" without touching the
existing corpus again. This module persists the LSH state as
transactional tables (the text analog of ``similarity.index.IvfIndex``):

* ``<path>/meta``       — one row of the index parameters (n, k,
  bands, rows); re-opening with different parameters fails fast
  instead of silently probing an incompatible banding.
* ``<path>/signatures`` — (doc_id, mh0..mh{k-1}): the per-doc MinHash
  sketch, k longs. Feeds the similarity estimate for candidate pairs.
* ``<path>/postings``   — (doc_id, band, band_key), RANGE-CLUSTERED BY
  band_key with manifest stats: the LSH buckets as parquet file runs.

Probe cost model (the point of the design): a new batch's band keys
are collected once (bounded: bands x batch size, enforced), gap-split
into tight ranges (``txn.largest_gap_ranges``) that prune the postings
scan through manifest stats, and the surviving postings join against a
BROADCAST of the batch's keys — the indexed side never shuffles, and
never re-shingles. Batch-internal candidates reuse the in-memory
``lsh_candidates`` path. Candidate similarity is the classic unbiased
MinHash estimate (fraction of agreeing signature components — the same
integer-arithmetic sketch both engines reproduce); callers needing
exact Jaccard feed the candidate pairs + original texts to
:func:`verify_exact`, which shingles ONLY the pair members.

Maintenance: :meth:`add` appends a batch's postings + signatures
exactly-once ((app_id, txn_seq) on both tables with the same seq);
``optimize()`` compacts append tails; the probe tolerates a crash
between the two appends (a doc present in postings but missing from
signatures yields candidates with null estimates, and re-running the
idempotent add repairs it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_data_lake_spark.dedup.jaccard import jaccard_pairs, shingle_table
from etl_data_lake_spark.dedup.minhash import (
    band_table,
    lsh_candidates,
    minhash_signatures,
)
from etl_data_lake_spark.sources.txn import TxnTable, largest_gap_ranges


class MinHashDedupIndex:
    def __init__(
        self,
        spark: SparkSession,
        path: str,
        n: int = 3,
        k: int = 12,
        bands: int = 4,
        rows: int = 3,
    ):
        from etl_data_lake_spark.dedup.minhash import PERM_A

        if not 1 <= k <= len(PERM_A):
            raise ValueError(f"k must be in [1, {len(PERM_A)}], got {k}")
        if bands * rows > k:
            raise ValueError(
                f"bands*rows ({bands}*{rows}) must be <= k ({k})"
            )
        self.spark = spark
        self.path = str(path)
        self.n, self.k, self.bands, self.rows = n, k, bands, rows
        self.meta_tbl = TxnTable(spark, f"{self.path}/meta")
        self.sig_tbl = TxnTable(spark, f"{self.path}/signatures")
        self.post_tbl = TxnTable(spark, f"{self.path}/postings")
        stored = self._stored_params()
        if stored is not None and stored != (n, k, bands, rows):
            raise ValueError(
                f"index at {self.path} was built with (n, k, bands, "
                f"rows)={stored}; got {(n, k, bands, rows)} — banding "
                f"is frozen at build time"
            )

    def _stored_params(self):
        if self.meta_tbl.snapshot_meta() is None:
            return None
        r = self.meta_tbl.snapshot().collect()[0]
        return (r.n, r.k, r.bands, r.rows)

    # ----------------------------------------------------- building --

    def _sketch(self, docs: DataFrame, text_col: str, id_col: str):
        """(shingles, signatures, postings) for a document set — the
        same integer-arithmetic pipeline minhash_lsh_pairs runs."""
        from pyspark import StorageLevel

        sh = shingle_table(docs, text_col, id_col, self.n, hashed=True).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        # sigs persisted too: the signature aggregate feeds BOTH the
        # signatures write and the postings (banding) write — without
        # this the dominant groupBy-min shuffle runs twice
        sigs = minhash_signatures(sh, self.k).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        posts = band_table(sigs, self.bands, self.rows)
        return sh, sigs, posts

    def build(
        self,
        docs: DataFrame,
        text_col: str = "text",
        id_col: str = "doc_id",
        n_files: int = 8,
    ) -> None:
        """Index ``docs`` from scratch (overwrite). Postings are
        range-clustered by band_key so probe ranges prune files."""
        sh, sigs, posts = self._sketch(docs, text_col, id_col)
        try:
            if self.meta_tbl.snapshot_meta() is None:
                self.meta_tbl.append(
                    self.spark.createDataFrame(
                        [(self.n, self.k, self.bands, self.rows)],
                        "n int, k int, bands int, rows int",
                    ).coalesce(1)
                )
            self.sig_tbl.overwrite(sigs)
            clustered = posts.repartitionByRange(
                n_files, F.col("band_key")
            ).sortWithinPartitions("band_key")
            self.post_tbl.overwrite(clustered, stats_cols=("band_key",))
        finally:
            sigs.unpersist()
            sh.unpersist()

    def add(
        self,
        docs: DataFrame,
        text_col: str = "text",
        id_col: str = "doc_id",
        app_id: str | None = None,
        txn_seq: int | None = None,
        batch_files: int = 4,
    ) -> None:
        """Append a batch's sketch exactly-once: the same (app_id,
        txn_seq) rides both commits, so a replayed batch no-ops on
        whichever table already applied it (crash between the two
        appends is repaired by the replay). The batch's postings are
        range-partitioned by band_key into ``batch_files`` files so
        each appended file covers a prunable subrange — an unsorted
        append would span the whole hash domain and defeat every
        future probe's file skipping; :meth:`optimize` consolidates
        the per-batch runs."""
        sh, sigs, posts = self._sketch(docs, text_col, id_col)
        try:
            # an index populated solely via add() must still freeze its
            # banding params: without this, reopening with different
            # (n, k, bands, rows) found no stored params and silently
            # probed an incompatible banding (round-5 advice)
            if self.meta_tbl.snapshot_meta() is None:
                self.meta_tbl.append(
                    self.spark.createDataFrame(
                        [(self.n, self.k, self.bands, self.rows)],
                        "n int, k int, bands int, rows int",
                    ).coalesce(1)
                )
            self.post_tbl.append(
                posts.repartitionByRange(batch_files, F.col("band_key"))
                .sortWithinPartitions("band_key"),
                app_id=app_id, txn_seq=txn_seq,
                stats_cols=("band_key",),
            )
            self.sig_tbl.append(sigs, app_id=app_id, txn_seq=txn_seq)
        finally:
            sigs.unpersist()
            sh.unpersist()

    def optimize(
        self, n_files: int = 8, target_bytes: int = 64 << 20
    ) -> None:
        """Consolidate append tails. Postings must be RECLUSTERED
        (range-partition + sort by band_key, pinned to the read
        version), never coalesced — a plain small-file compact merges
        range-clustered files without re-sorting, leaving every
        output spanning the whole hash domain and silently destroying
        the manifest-stats pruning the probe depends on."""
        meta = self.post_tbl.snapshot_meta()
        if meta is not None and len(meta.files) > n_files:
            clustered = (
                self.post_tbl.snapshot(meta.version)
                .repartitionByRange(n_files, F.col("band_key"))
                .sortWithinPartitions("band_key")
            )
            self.post_tbl.overwrite(
                clustered,
                stats_cols=("band_key",),
                expected_base=meta.version,
            )
        self.sig_tbl.optimize_small_files(target_bytes=target_bytes)

    # ------------------------------------------------------ probing --

    def probe(
        self,
        docs: DataFrame,
        text_col: str = "text",
        id_col: str = "doc_id",
        max_probe_keys: int = 100_000,
        max_probe_ranges: int = 64,
        bucket_cap: int | None = None,
    ) -> DataFrame:
        """Near-dup candidates of a NEW batch: ``(doc_a, doc_b, kind,
        est_jaccard)`` where kind is ``'cross'`` (new vs indexed,
        doc_a = new id, doc_b = indexed id) or ``'intra'`` (both new,
        doc_a < doc_b). est_jaccard is the MinHash estimate — the
        fraction of agreeing signature components, rounded to 4
        places; exact verification is :func:`verify_exact`'s job.

        Scale shape: the batch's distinct band keys are collected once
        (bounded by ``max_probe_keys``), gap-split into at most
        ``max_probe_ranges`` tight ranges for manifest-stats file
        pruning, and the pruned postings scan inner-joins a BROADCAST
        of the batch's (band, band_key) rows — the indexed side never
        shuffles and is never re-shingled. Does NOT mutate the index:
        dedup-then-add is the intended composition."""
        from pyspark import StorageLevel

        if self.post_tbl.snapshot_meta() is None:
            raise FileNotFoundError(f"no index built at {self.path}")
        sh, sigs, posts = self._sketch(docs, text_col, id_col)
        posts = posts.persist(StorageLevel.MEMORY_AND_DISK)
        try:
            keys = [
                r.band_key
                for r in posts.select("band_key")
                .distinct()
                .limit(max_probe_keys + 1)
                .collect()
            ]
            if len(keys) > max_probe_keys:
                raise ValueError(
                    f"probe batch exceeds max_probe_keys="
                    f"{max_probe_keys}; split the batch"
                )
            if not keys:
                from pyspark.sql.types import (
                    DoubleType,
                    StringType,
                    StructField,
                    StructType,
                )

                id_type = posts.schema["doc_id"].dataType
                return self.spark.createDataFrame(
                    [],
                    StructType(
                        [
                            StructField("doc_a", id_type),
                            StructField("doc_b", id_type),
                            StructField("kind", StringType()),
                            StructField("est_jaccard", DoubleType()),
                        ]
                    ),
                )
            ranges = largest_gap_ranges(sorted(keys), max_probe_ranges)
            stored = self.post_tbl.snapshot_where_any(
                "band_key", ranges
            ).select(
                F.col("doc_id").alias("doc_b"), "band", "band_key"
            )
            new_posts = posts.select(
                F.col("doc_id").alias("doc_a"), "band", "band_key"
            )
            cross = (
                stored.join(
                    F.broadcast(new_posts), ["band", "band_key"]
                )
                .where(F.col("doc_a") != F.col("doc_b"))
                .select("doc_a", "doc_b")
                .distinct()
            )
            intra = lsh_candidates(
                sigs, self.bands, self.rows, bucket_cap=bucket_cap,
                band_tbl=posts,  # the banding is already computed
            )
            old_sigs = self.sig_tbl.snapshot()
            est = self._estimate(
                cross.withColumn("kind", F.lit("cross")),
                sigs,
                old_sigs,
            ).unionByName(
                self._estimate(
                    intra.withColumn("kind", F.lit("intra")),
                    sigs,
                    sigs,
                )
            )
            # materialize before unpersisting the sketch inputs
            out = est.localCheckpoint(eager=True)
            return out
        finally:
            sh.unpersist()
            sigs.unpersist()
            posts.unpersist()

    def _estimate(
        self, pairs: DataFrame, sigs_a: DataFrame, sigs_b: DataFrame
    ) -> DataFrame:
        """MinHash similarity estimate per candidate pair: mean
        component agreement of the two signatures (unbiased for
        Jaccard; resolution 1/k). Left joins keep a pair whose stored
        signature is missing (torn add) with a null estimate."""
        a = sigs_a.select(
            F.col("doc_id").alias("doc_a"),
            *[F.col(f"mh{i}").alias(f"a{i}") for i in range(self.k)],
        )
        # prefilter the (possibly corpus-sized) b side down to the
        # candidate members with a broadcast semi join BEFORE the
        # outer join — a left join cannot broadcast its right side,
        # so without this the whole signatures table would shuffle
        # per probe
        b = (
            sigs_b.join(
                F.broadcast(pairs.select("doc_b").distinct()),
                sigs_b.doc_id == F.col("doc_b"),
                "left_semi",
            )
            .select(
                F.col("doc_id").alias("doc_b"),
                *[F.col(f"mh{i}").alias(f"b{i}") for i in range(self.k)],
            )
        )
        agree = sum(
            F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
            for i in range(self.k)
        )
        return (
            pairs.join(F.broadcast(a), "doc_a", "left")
            .join(b, "doc_b", "left")
            .select(
                "doc_a",
                "doc_b",
                "kind",
                F.when(
                    F.col("a0").isNotNull() & F.col("b0").isNotNull(),
                    F.round(agree / F.lit(self.k), 4),
                ).alias("est_jaccard"),
            )
        )


def verify_exact(
    pairs: DataFrame,
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.0,
) -> DataFrame:
    """Exact-Jaccard verification of candidate ``pairs`` against the
    ORIGINAL texts: only documents that appear in a pair are shingled
    (left-semi prune first), so the cost is candidate-sized, never
    corpus-sized. ``docs`` must cover every id in the pairs (union the
    corpus slice and the new batch)."""
    members = (
        pairs.select(F.col("doc_a").alias("m"))
        .unionByName(pairs.select(F.col("doc_b").alias("m")))
        .distinct()
    )
    needed = docs.join(
        F.broadcast(members),
        docs[id_col] == F.col("m"),
        "left_semi",
    )
    sh = shingle_table(needed, text_col, id_col, n, hashed=True)
    return jaccard_pairs(
        sh, threshold, candidates=pairs.select("doc_a", "doc_b")
    )
