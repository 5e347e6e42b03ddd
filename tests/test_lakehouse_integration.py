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


def test_txn_true_concurrent_appends_stress(spark, tmp_path):
    """Deterministic interleavings are pinned in test_txn; this is the
    real thing: 6 threads x 4 appends race os.link-published commits.
    Every commit must land (dense versions, no lost rows, per-file
    stats present), exercising the rebase loop under genuine
    contention."""
    import threading

    path = str(tmp_path / "t")
    errs = []

    def writer(wid: int):
        try:
            t = TxnTable(spark, path)
            for j in range(4):
                t.append(
                    spark.createDataFrame(
                        [(wid * 100 + j, wid)], "id long, w long"
                    ).coalesce(1),
                    stats_cols=("id",),
                )
        except Exception as exc:  # pragma: no cover
            errs.append(exc)

    threads = [threading.Thread(target=writer, args=(w,)) for w in range(6)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errs
    t = TxnTable(spark, path)
    assert t.latest_version() == 24  # every commit won exactly one slot
    rows = sorted(r.id for r in t.snapshot().collect())
    assert rows == sorted(w * 100 + j for w in range(6) for j in range(4))
    meta = t.snapshot_meta()
    assert len(meta.files) == 24
    assert all("id" in meta.file_stats.get(f, {}) for f in meta.files)


def test_merge_concurrent_disjoint_merges_stress(spark, tmp_path):
    """Two threads merge key ranges living in DISJOINT FILES
    concurrently: tight guards + rebase must let both land without
    conflict and without losing either's rows. (Merges rewriting the
    SAME file conflict by design — that case is pinned in
    test_merge.)"""
    import threading

    path = str(tmp_path / "t")
    t0 = TxnTable(spark, path)
    t0.append(_batch(spark, (1, 10, 1)).coalesce(1), stats_cols=("user_id",))
    t0.append(
        _batch(spark, (1000, 20, 1)).coalesce(1), stats_cols=("user_id",)
    )
    errs = []

    def do_merge(lo: int):
        try:
            merge_into(
                TxnTable(spark, path),
                _batch(spark, (lo, 77, 1), (lo + 1, 88, 1)),
                ["user_id", "day"],
                stats_cols=("user_id",),
            )
        except Exception as exc:  # pragma: no cover
            errs.append(exc)

    a = threading.Thread(target=do_merge, args=(1,))
    b = threading.Thread(target=do_merge, args=(1000,))
    a.start(); b.start(); a.join(); b.join()
    assert not errs
    got = {
        r.user_id: r.amount
        for r in TxnTable(spark, path).snapshot().collect()
    }
    assert got == {1: 77, 2: 88, 1000: 77, 1001: 88}
