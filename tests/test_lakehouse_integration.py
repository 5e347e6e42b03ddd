"""End-to-end lakehouse composition: merge-driven upserts flowing
through the change feed into (a) an incremental materialized
aggregate and (b) a CDC mirror — the three layers this round built,
exercised TOGETHER, with replay injected at every seam.

The invariant under test: after any interleaving of merge / delete /
replayed batches, the matview equals a full recompute of the source
and the mirror's net effect equals the source — i.e. the incremental
machinery is indistinguishable from recomputation."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_data_lake_spark.sources.cdf import cdc_mirror_sink, process_changes
from etl_data_lake_spark.sources.matview import MaterializedAgg
from etl_data_lake_spark.sources.merge import merge_into, merge_upsert_sink
from etl_data_lake_spark.sources.txn import TxnTable


def _batch(spark, *rows):
    return spark.createDataFrame(
        list(rows), "user_id long, amount long, day long"
    )


def _full_recompute(t):
    return {
        (r.user_id): (r.n_rows, r.sum_amount)
        for r in t.snapshot()
        .groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.sum("amount").alias("sum_amount"),
        )
        .collect()
    }


def _mv_state(mv):
    return {
        (r.user_id): (r.n_rows, r.sum_amount) for r in mv.read().collect()
    }


def test_merge_matview_cdc_pipeline(spark, tmp_path):
    src = TxnTable(spark, str(tmp_path / "src"))
    mv = MaterializedAgg(
        spark,
        src,
        str(tmp_path / "mv"),
        keys=("user_id",),
        sum_cols=("amount",),
    )
    mirror_state = str(tmp_path / "mirror_offset.json")
    mirror_sink = cdc_mirror_sink(str(tmp_path / "mirror"))
    sink = merge_upsert_sink(
        str(tmp_path / "src"), ["user_id", "day"], stats_cols=("user_id",)
    )

    # --- batch 0: initial load (via the merge sink, empty target) ---
    sink(_batch(spark, (1, 10, 1), (2, 20, 1)), 0)
    mv.refresh()
    process_changes(src, mirror_state, mirror_sink)
    assert _mv_state(mv) == _full_recompute(src)

    # --- batch 1: update one key, insert another; REPLAY the batch ---
    b1 = _batch(spark, (1, 99, 1), (3, 30, 1))
    sink(b1, 1)
    sink(b1, 1)  # at-least-once delivery: must be absorbed
    mv.refresh()
    process_changes(src, mirror_state, mirror_sink)
    assert _full_recompute(src) == {1: (1, 99), 2: (1, 20), 3: (1, 30)}
    assert _mv_state(mv) == _full_recompute(src)

    # --- row-level delete flows through both consumers -------------
    src.delete_where("user_id", 2, 2, stats_cols=("user_id",))
    mv.refresh()
    mv.refresh()  # idempotent refresh on an unchanged source
    process_changes(src, mirror_state, mirror_sink)
    assert _mv_state(mv) == _full_recompute(src) == {1: (1, 99), 3: (1, 30)}

    # --- a second day for user 1: aggregate accumulates ------------
    merge_into(
        src, _batch(spark, (1, 5, 2)), ["user_id", "day"],
        stats_cols=("user_id",),
    )
    mv.refresh()
    assert _mv_state(mv) == _full_recompute(src) == {1: (2, 104), 3: (1, 30)}

    # --- the mirror's NET state equals the source ------------------
    process_changes(src, mirror_state, mirror_sink)
    mirror = TxnTable(spark, str(tmp_path / "mirror"))
    net = (
        mirror.snapshot()
        .groupBy("user_id", "amount", "day")
        .agg(
            F.sum(
                F.when(F.col("_change_type") == "insert", 1).otherwise(-1)
            ).alias("alive")
        )
        .where(F.col("alive") > 0)
    )
    got = sorted(
        (r.user_id, r.amount, r.day) for r in net.collect()
        for _ in range(r.alive)
    )
    want = sorted(
        (r.user_id, r.amount, r.day) for r in src.snapshot().collect()
    )
    assert got == want

    # --- time travel still reads every historical state ------------
    assert src.snapshot(version=1).count() == 2
    ops = [h["operation"] for h in src.history()]
    assert ops[0] in ("append", "merge") and "delete" in ops
