"""Incrementally-maintained aggregate over a transactional table.

The lakehouse pattern the txn layer's change-data-feed exists for:
a downstream GROUP BY table that refreshes from the CHANGES between
two committed versions instead of rescanning the source — at 100 TB
the refresh cost is ∝ |rows changed since last refresh| (table_changes
reads only the files the manifests added/removed), not table size.

With ``range_key`` set the WRITE side is incremental too: the stored
aggregate is range-clustered on that key with per-file manifest
stats, and each refresh publishes through ``TxnTable.replace_where``
over [min, max] of the keys the change feed touched — files disjoint
from the touched range survive byte-identical, so a one-partition
delta rewrites one partition's files, not the whole aggregate.

Maintained aggregates are sums and counts per key — the self-inverse
family (a delete is a negative insert), so the merge is

    new_agg(key) = old_agg(key) + Σ inserts(key) − Σ deletes(key)

with groups dropping out when their count reaches zero. AVG derives
as sum/count downstream; MIN/MAX are NOT self-inverse (a deleted
minimum needs a rescan of its group) and are deliberately out of
scope — the standard incremental-view-maintenance restriction.

Bookkeeping rides on the txn layer's own idempotence machinery: the
materialized table records the source version it reflects as the
writer watermark ``(app_id="__matview__", txn_seq=source_version)``,
so the refreshed-to version travels atomically WITH the data (no side
file to drift), a concurrent refresh loses the overwrite race cleanly
(ConcurrentWriteError → retry reads the new watermark and computes a
smaller delta), and a replayed refresh at the same source version is
a no-op.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_data_lake_spark.sources.txn import TxnTable

_APP_ID = "__matview__"


class MaterializedAgg:
    """A (keys → count + sums) aggregate of ``source``, stored as its
    own transactional table at ``path`` and refreshed incrementally
    from the source's change feed."""

    def __init__(
        self,
        spark: SparkSession,
        source: TxnTable,
        path: str,
        keys: tuple[str, ...],
        sum_cols: tuple[str, ...] = (),
        range_key: str | None = None,
        range_files: int = 4,
        max_ranges: int = 4,
        max_split_keys: int = 10_000,
    ):
        """``range_key`` (one of ``keys``, orderable) turns refresh
        into a PARTITIONED refresh: the stored aggregate is range-
        clustered on that key with per-file manifest stats, and each
        incremental refresh publishes via ``replace_where_ranges``
        over up to ``max_ranges`` TIGHT ranges covering the keys the
        change feed actually touched — so the WRITE side is O(changed
        key ranges) in files rewritten, matching the already-
        incremental read side (without it, every refresh rewrote the
        whole aggregate table even for a one-group delta).

        The ranges come from a driver-side gap split: when the delta
        touches ≤ ``max_split_keys`` distinct NUMERIC keys, they are
        collected (bounded — the delta is the changed groups, which is
        exactly what incremental maintenance keeps small) and cut at
        the ``max_ranges − 1`` largest gaps, so a scattered delta
        (keys {5, 6} and {10⁹}) replaces two tight ranges instead of
        the hull between them. Non-numeric keys or over-cap deltas
        fall back to the single [min, max] hull — correct, just
        coarser."""
        if range_key is not None and range_key not in keys:
            raise ValueError(f"range_key {range_key!r} not in keys {keys}")
        self.spark = spark
        self.source = source
        self.target = TxnTable(spark, path)
        self.keys = list(keys)
        self.sum_cols = list(sum_cols)
        self.range_key = range_key
        self.range_files = max(int(range_files), 1)
        self.max_ranges = max(int(max_ranges), 1)
        self.max_split_keys = max(int(max_split_keys), 1)

    # ------------------------------------------------------- state --

    def refreshed_version(self) -> int:
        """Source version the stored aggregate reflects (0 = never)."""
        meta = self.target.snapshot_meta()
        if meta is None:
            return 0
        return meta.writer_txns.get(_APP_ID, 0)

    def read(self) -> DataFrame:
        return self.target.snapshot()

    # ----------------------------------------------------- refresh --

    def _aggregate(self, rows: DataFrame, sign_col=None) -> DataFrame:
        sign = F.col(sign_col) if sign_col else F.lit(1).cast("long")
        aggs = [F.sum(sign).alias("n_rows")] + [
            F.sum(sign * F.col(c)).alias(f"sum_{c}") for c in self.sum_cols
        ]
        return rows.groupBy(*self.keys).agg(*aggs)

    def refresh(self) -> int:
        """Bring the aggregate up to the source's latest version.
        Returns the source version now reflected. First call computes
        the full aggregate; later calls read ONLY the change feed
        since the recorded watermark and merge signed deltas."""
        src_v = self.source.latest_version()
        # pin the target version whose contents the merge will read, so
        # the overwrite below conflicts (rather than silently basing on
        # stale data) if another refresh lands in between
        prev_meta = self.target.snapshot_meta()
        base_v = prev_meta.version if prev_meta else 0
        last = prev_meta.writer_txns.get(_APP_ID, 0) if prev_meta else 0
        if src_v == 0 or src_v == last:
            return last
        if last == 0:
            # first refresh is ALWAYS a full overwrite, even in range
            # mode: the target may hold foreign rows (adopted path,
            # another writer) that a range-scoped publish would
            # silently retain outside the hull — overwrite purges
            # them, and the range-clustered stats still land for the
            # incremental refreshes that follow
            fresh = self._aggregate(self.source.snapshot(src_v))
            if self.range_key is not None:
                fresh = self._cluster(fresh)
            self.target.overwrite(
                fresh,
                app_id=_APP_ID,
                txn_seq=src_v,
                stats_cols=(
                    (self.range_key,) if self.range_key is not None else ()
                ),
                expected_base=base_v,
            )
            return src_v
        changes = self.source.table_changes(last, src_v)
        delta = self._aggregate(
            changes.withColumn(
                "_sign",
                F.when(F.col("_change_type") == "insert", 1)
                .otherwise(-1)
                .cast("long"),
            ),
            sign_col="_sign",
        )
        if self.range_key is not None:
            return self._refresh_range(delta, base_v, src_v)
        prev = self.target.snapshot(base_v)
        fresh = self._merge(prev, delta)
        self.target.overwrite(
            fresh, app_id=_APP_ID, txn_seq=src_v, expected_base=base_v
        )
        return src_v

    def _merge(self, prev: DataFrame, delta: DataFrame) -> DataFrame:
        merged = prev.unionByName(delta)
        return (
            merged.groupBy(*self.keys)
            .agg(
                F.sum("n_rows").alias("n_rows"),
                *[
                    F.sum(f"sum_{c}").alias(f"sum_{c}")
                    for c in self.sum_cols
                ],
            )
            .where(F.col("n_rows") > 0)  # fully-deleted groups drop
        )

    def _cluster(self, df: DataFrame) -> DataFrame:
        """Range-cluster on the refresh key so each published file has
        a tight, (mostly) disjoint key span — the manifest stats that
        make the NEXT refresh's replace_where prune to the touched
        files only."""
        return df.repartitionByRange(
            self.range_files, F.col(self.range_key)
        ).sortWithinPartitions(self.range_key)

    def _bounds(self, df: DataFrame):
        """→ (min, max, has_unrangeable_keys) of the refresh key, one
        small aggregate. Null group keys can't ride a
        between-predicate, and float NaN keys break both the ordering
        (Python sort is undefined under NaN) and parquet min/max
        stats — either routes the refresh to the full-overwrite
        path."""
        k = self.range_key
        aggs = [
            F.min(k).alias("lo"),
            F.max(k).alias("hi"),
            F.count("*").alias("n"),
            F.count(k).alias("nk"),
        ]
        dt = df.schema[k].dataType.simpleString()
        if dt in ("float", "double"):
            aggs.append(
                F.count(F.when(F.isnan(k), F.lit(1))).alias("n_nan")
            )
        row = df.agg(*aggs).first()
        bad = row.n > row.nk or (dt in ("float", "double") and row.n_nan > 0)
        return row.lo, row.hi, bad

    def _refresh_range(
        self, delta: DataFrame, base_v: int, src_v: int
    ) -> int:
        """Partitioned refresh: merge the delta against ONLY the
        stored groups inside [min, max] of the touched keys, publish
        with replace_where — disjoint files survive untouched, the
        watermark rides the same commit, and expected_base +
        replace_where's predicate guard turn every stale-read race
        into a clean ConcurrentWriteError retry.

        The delta is persisted for the duration: it feeds the bounds
        aggregate, the gap-split key collect, AND the staged merge —
        and its lineage contains table_changes' two exceptAll scans,
        which would otherwise re-run per consumer."""
        delta = delta.persist()
        try:
            lo, hi, unrangeable = self._bounds(delta)
            if lo is None and not unrangeable:
                # the change feed cancelled out (e.g. pure compaction
                # between the versions): nothing to merge, but the
                # watermark must still advance — an empty-feed append
                # commits no files and records the seq
                self.target.append(
                    self.target.snapshot(base_v).limit(0),
                    app_id=_APP_ID,
                    txn_seq=src_v,
                )
                return src_v
            if unrangeable:
                # null or NaN group keys can't ride the
                # between-predicate; this refresh pays a full
                # overwrite (still range-clustered + stats-tracked so
                # later refreshes prune again)
                fresh = self._merge(self.target.snapshot(base_v), delta)
                self.target.overwrite(
                    self._cluster(fresh),
                    app_id=_APP_ID,
                    txn_seq=src_v,
                    stats_cols=(self.range_key,),
                    expected_base=base_v,
                )
                return src_v
            ranges = self._touched_ranges(delta, lo, hi)
            prev_range = self.target.snapshot_where_any(
                self.range_key, ranges, version=base_v
            )
            fresh_range = self._merge(prev_range, delta)
            self.target.replace_where_ranges(
                self._cluster(fresh_range),
                self.range_key,
                ranges,
                stats_cols=(self.range_key,),
                app_id=_APP_ID,
                txn_seq=src_v,
                expected_base=base_v,
            )
            return src_v
        finally:
            delta.unpersist()

    def _touched_ranges(self, delta: DataFrame, lo, hi):
        """Gap-split the delta's distinct keys into ≤ ``max_ranges``
        tight [lo, hi] ranges (largest-gap cuts). Falls back to the
        single hull for non-numeric keys or deltas touching more than
        ``max_split_keys`` distinct keys (the collect stays bounded by
        construction)."""
        hull = [(lo, hi)]
        if self.max_ranges <= 1:
            return hull
        distinct = delta.select(self.range_key).distinct()
        keys = [r[0] for r in distinct.limit(self.max_split_keys + 1).collect()]
        if len(keys) > self.max_split_keys:
            return hull
        # numeric VALUES only: a string key that merely parses as a
        # number would gap-split in numeric order but range-compare in
        # string order inside the between-predicate — wrong ranges
        if not all(
            isinstance(k, (int, float)) and not isinstance(k, bool)
            for k in keys
        ):
            return hull
        from etl_data_lake_spark.sources.txn import largest_gap_ranges

        return largest_gap_ranges(keys, self.max_ranges) or hull


def matview_stream_sink(mv: MaterializedAgg, app_id: str = "__mv_ingest__"):
    """``foreachBatch`` function that keeps a STREAMING materialized
    view: each micro-batch appends to the source txn table (batch id
    as the txn seq → exactly-once under replay) and then refreshes the
    aggregate incrementally. End-to-end replay safety composes from
    the two watermarks: a replayed batch's append no-ops, which leaves
    the source version unchanged, which makes the refresh a no-op too
    — the view never double-counts, even after a checkpoint wipe."""

    def fn(batch: DataFrame, batch_id: int) -> None:
        mv.source.append(batch, app_id=app_id, txn_seq=batch_id)
        mv.refresh()

    return fn


def stream_refresh_query(
    mv: MaterializedAgg,
    checkpoint: str,
    available_now: bool = True,
    query_name: str | None = None,
    max_retries: int = 3,
    **reader_options,
):
    """Drive :meth:`MaterializedAgg.refresh` FROM the ``txnlake``
    STREAMING source (round-8 verdict #4 — the loop between the
    streaming and lakehouse layers, closed): a stream over the source
    table is the change SIGNAL — every committed source version window
    becomes a micro-batch, and each micro-batch runs one incremental
    refresh. Returns the started StreamingQuery (availableNow drains
    the current backlog and stops; ``available_now=False`` runs
    continuously).

    Two properties worth stating precisely:

    * the micro-batch DataFrame is never touched — foreachBatch only
      fires ``refresh()``, which reads the bounded CHANGE FEED under
      its own version watermark, so the trigger stream costs offsets
      and manifests, not a second data read (Spark's source read is
      lazy; an unconsumed batch frame never executes);
    * exactly-once composes from the refresh watermark alone: a
      REPLAYED micro-batch (checkpoint recovery, crash between
      batches) calls refresh() again, which no-ops at the same source
      version — the aggregate can never double-count, even if the
      foreachBatch checkpoint is wiped entirely. The stream checkpoint
      only buys NOT re-planning already-seen version windows.

    The source stream runs with ``ignoreChanges=true``: deletes and
    compactions must not kill the signal stream, because refresh()
    handles them correctly through the signed change feed (that is the
    point of the matview). A concurrent external refresher losing the
    overwrite race surfaces as ConcurrentWriteError; the batch retries
    ``max_retries`` times (each retry reads the new watermark and
    computes a smaller delta) before failing the stream."""
    from etl_data_lake_spark.sources.lake_datasource import (
        register_lake_source,
    )
    from etl_data_lake_spark.sources.txn import ConcurrentWriteError

    register_lake_source(mv.spark)
    stream = (
        mv.spark.readStream.format("txnlake")
        .option("ignoreChanges", "true")
        .options(**reader_options)
        .load(str(mv.source.root))
    )

    def _refresh(batch_df: DataFrame, batch_id: int) -> None:
        for attempt in range(max_retries + 1):
            try:
                mv.refresh()
                return
            except ConcurrentWriteError:
                if attempt == max_retries:
                    raise

    writer = stream.writeStream.foreachBatch(_refresh).option(
        "checkpointLocation", checkpoint
    )
    if query_name is not None:
        writer = writer.queryName(query_name)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
