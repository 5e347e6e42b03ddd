"""Incrementally-maintained aggregate over a transactional table.

The lakehouse pattern the txn layer's change-data-feed exists for:
a downstream GROUP BY table that refreshes from the CHANGES between
two committed versions instead of rescanning the source — at 100 TB
the refresh cost is ∝ |rows changed since last refresh| (table_changes
reads only the files the manifests added/removed), not table size.

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
    ):
        self.spark = spark
        self.source = source
        self.target = TxnTable(spark, path)
        self.keys = list(keys)
        self.sum_cols = list(sum_cols)

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
            fresh = self._aggregate(self.source.snapshot(src_v))
        else:
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
            prev = self.target.snapshot(base_v)
            merged = prev.unionByName(delta)
            fresh = (
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
        self.target.overwrite(
            fresh, app_id=_APP_ID, txn_seq=src_v, expected_base=base_v
        )
        return src_v


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
