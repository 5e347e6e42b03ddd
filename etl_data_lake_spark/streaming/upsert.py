"""Keyed upsert sink for streams: foreachBatch + latest-wins merge.

Parquet has no MERGE; the lake answer is ``foreachBatch`` — each
micro-batch runs an arbitrary BATCH job, here: union the batch with
the current table, keep the newest row per key (row_number over the
order column), atomically swap the result in. That turns an
append-only event stream into a keyed, continuously-corrected table
(CDC-style upsert semantics on plain parquet).

Scale notes: rewrite cost is O(table) per batch — fine for dimension
tables (users, sessions), wrong for the fact table; there you upsert
per PARTITION (sinks.overwrite_partitions_dynamic with the touched
partitions) or move to a table format with merge (Delta/Iceberg —
PAPERS.md "Delta Lake", VLDB 2020). The tmp+swap here is the
object-store-unsafe part a table format replaces with a metadata
commit; everything else transfers.
"""

from __future__ import annotations

import tempfile
from pathlib import Path

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from etl_data_lake_spark.sources.sinks import swap_into_place


def merge_latest(
    existing: DataFrame | None,
    batch: DataFrame,
    key_cols: list[str],
    order_col: str,
) -> DataFrame:
    """Newest row per key across existing ∪ batch (ties break toward
    the batch via a source rank so replays converge)."""
    tagged_batch = batch.withColumn("_src", F.lit(1))
    merged = (
        tagged_batch
        if existing is None
        else existing.withColumn("_src", F.lit(0)).unionByName(tagged_batch)
    )
    w = Window.partitionBy(*key_cols).orderBy(
        F.desc(order_col), F.desc("_src")
    )
    return (
        merged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_src")
    )


def upsert_sink(path: str, key_cols: list[str], order_col: str):
    """foreachBatch function maintaining a latest-wins keyed table."""

    def fn(batch: DataFrame, _batch_id: int) -> None:
        spark = batch.sparkSession
        target = Path(path)
        existing = (
            spark.read.parquet(path)
            if target.exists() and any(target.rglob("*.parquet"))
            else None
        )
        latest = merge_latest(existing, batch, key_cols, order_col)
        # tmp is a SIBLING of the target so the swap is a same-
        # filesystem atomic rename — mkdtemp's default /tmp could sit
        # on another filesystem, degrading the move to a torn-on-crash
        # copy (see sinks.swap_into_place)
        target.parent.mkdir(parents=True, exist_ok=True)
        tmp = tempfile.mkdtemp(
            prefix=f".{target.name}_upsert_", dir=str(target.parent)
        )
        latest.write.mode("overwrite").parquet(tmp)
        # backup-rename swap: no instant at which the table is deleted
        # with the new data stranded in tmp (sinks.swap_into_place)
        swap_into_place(tmp, path)

    return fn


def run_upsert_backfill(
    stream: DataFrame,
    path: str,
    key_cols: list[str],
    order_col: str,
    checkpoint_dir: str | None = None,
) -> None:
    ckpt = checkpoint_dir or tempfile.mkdtemp(prefix="upsert_ckpt_")
    q = (
        stream.writeStream.foreachBatch(upsert_sink(path, key_cols, order_col))
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
