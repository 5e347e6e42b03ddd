"""Incrementally-maintained aggregates (sources/matview.py): refresh
from the change feed must equal a full recompute at every step, stay
idempotent, and detect concurrent refreshes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_data_lake_spark.sources.matview import MaterializedAgg
from etl_data_lake_spark.sources.txn import ConcurrentWriteError, TxnTable


def _rows(spark, *triples):
    return spark.createDataFrame(
        list(triples), "k string, v long, w double"
    )


def _agg_of(df):
    return {
        (r.k,): (r.n_rows, r.sum_v, r.sum_w)
        for r in df.groupBy("k")
        .agg(
            F.sum(F.lit(1).cast("long")).alias("n_rows"),
            F.sum("v").alias("sum_v"),
            F.sum("w").alias("sum_w"),
        )
        .collect()
    }


def _read_mv(mv):
    return {
        (r.k,): (r.n_rows, r.sum_v, r.sum_w) for r in mv.read().collect()
    }


def test_refresh_matches_full_recompute_across_commits(spark, tmp_path):
    src = TxnTable(spark, str(tmp_path / "src"))
    mv = MaterializedAgg(
        spark, src, str(tmp_path / "mv"), keys=("k",), sum_cols=("v", "w")
    )
    src.append(_rows(spark, ("a", 1, 0.5), ("a", 2, 1.5), ("b", 3, 2.0)))
    v = mv.refresh()
    assert v == 1 and mv.refreshed_version() == 1
    assert _read_mv(mv) == _agg_of(src.snapshot())

    # incremental: appends touch only their groups' deltas
    src.append(_rows(spark, ("b", 4, 0.0), ("c", 5, 5.0)))
    src.append(_rows(spark, ("a", 10, 1.0)))
    assert mv.refresh() == 3
    assert _read_mv(mv) == _agg_of(src.snapshot())

    # a pure compaction is a no-op change feed; the refresh must not
    # double-count rewritten rows
    src.compact(target_files=1)
    assert mv.refresh() == 4
    assert _read_mv(mv) == _agg_of(src.snapshot())

    # overwrite shrinks groups; fully-deleted groups drop out
    src.overwrite(_rows(spark, ("a", 7, 7.0)))
    assert mv.refresh() == 5
    got = _read_mv(mv)
    assert got == _agg_of(src.snapshot())
    assert set(got) == {("a",)}


def test_refresh_is_idempotent_and_lazy(spark, tmp_path):
    src = TxnTable(spark, str(tmp_path / "src"))
    mv = MaterializedAgg(
        spark, src, str(tmp_path / "mv"), keys=("k",), sum_cols=("v",)
    )
    src.append(_rows(spark, ("a", 1, 0.0)))
    assert mv.refresh() == 1
    target_v = mv.target.latest_version()
    # nothing new in the source → no new target commit
    assert mv.refresh() == 1
    assert mv.target.latest_version() == target_v


def test_concurrent_refresh_replay_and_conflict(spark, tmp_path):
    """Two refreshers racing. Same-source-version race: the loser's
    publish is absorbed as an idempotent replay (watermark no-op — the
    refresh it wanted is already reflected). Stale-base race at a NEW
    source version: ConcurrentWriteError, retry converges."""
    import etl_data_lake_spark.sources.matview as m

    src = TxnTable(spark, str(tmp_path / "src"))
    path = str(tmp_path / "mv")
    a = MaterializedAgg(
        spark, src, path, keys=("k",), sum_cols=("v", "w")
    )
    b = MaterializedAgg(
        spark, src, path, keys=("k",), sum_cols=("v", "w")
    )
    src.append(_rows(spark, ("a", 1, 0.0)))
    a.refresh()
    src.append(_rows(spark, ("a", 2, 0.0), ("b", 3, 0.0)))

    # B computes its merge against target v1, A publishes first
    fresh_b = b._aggregate(src.snapshot())
    a.refresh()  # target v2, watermark src=2
    target_v = b.target.latest_version()
    # B's publish for the SAME source version: absorbed as replay
    v = b.target.overwrite(
        fresh_b, app_id=m._APP_ID, txn_seq=2, expected_base=1
    )
    assert v == target_v  # no new commit
    assert _read_mv(b) == _agg_of(src.snapshot())

    # a NEW source version computed against a stale target base must
    # conflict, not silently clobber A's state
    src.append(_rows(spark, ("c", 9, 0.0)))
    fresh_b3 = b._aggregate(src.snapshot())
    with pytest.raises(ConcurrentWriteError):
        b.target.overwrite(
            fresh_b3, app_id=m._APP_ID, txn_seq=3, expected_base=1
        )
    # normal retry path converges
    assert b.refresh() == 3
    assert _read_mv(b) == _agg_of(src.snapshot())


def test_streaming_matview_exactly_once_across_replay(spark, tmp_path):
    """availableNow file stream → matview_stream_sink. Wiping the
    checkpoint and replaying every batch must leave the aggregate
    unchanged — the append and refresh watermarks compose to
    end-to-end exactly-once."""
    import shutil

    from etl_data_lake_spark.sources.matview import matview_stream_sink

    src_files = tmp_path / "in"
    src_files.mkdir()
    _rows(spark, ("a", 1, 1.0), ("b", 2, 2.0)).write.parquet(
        str(src_files / "f1")
    )
    _rows(spark, ("a", 3, 3.0)).write.parquet(str(src_files / "f2"))

    source = TxnTable(spark, str(tmp_path / "src"))
    mv = MaterializedAgg(
        spark, source, str(tmp_path / "mv"), keys=("k",), sum_cols=("v",)
    )
    ckpt = str(tmp_path / "ckpt")

    def run():
        q = (
            spark.readStream.schema("k string, v long, w double")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src_files / "*"))
            .writeStream.foreachBatch(matview_stream_sink(mv))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run()
    expect = {("a",): (2, 4), ("b",): (1, 2)}
    got = {
        (r.k,): (r.n_rows, r.sum_v) for r in mv.read().collect()
    }
    assert got == expect
    src_v = source.latest_version()
    mv_v = mv.target.latest_version()

    shutil.rmtree(ckpt)  # full replay with the same batch ids
    run()
    assert source.latest_version() == src_v
    assert mv.target.latest_version() == mv_v
    got2 = {
        (r.k,): (r.n_rows, r.sum_v) for r in mv.read().collect()
    }
    assert got2 == expect


def _int_rows(spark, *pairs):
    return spark.createDataFrame(list(pairs), "k long, v long")


def _int_agg_of(df):
    return {
        r.k: (r.n_rows, r.sum_v)
        for r in df.groupBy("k")
        .agg(
            F.sum(F.lit(1).cast("long")).alias("n_rows"),
            F.sum("v").alias("sum_v"),
        )
        .collect()
    }


def test_range_refresh_rewrites_only_touched_range(spark, tmp_path):
    """Round-3 verdict #6: with range_key set, a refresh after
    touching one key range publishes via replace_where — files whose
    manifest stats are disjoint from the touched range survive
    byte-identical, and the result still equals a full recompute."""
    src = TxnTable(spark, str(tmp_path / "src"))
    mv = MaterializedAgg(
        spark, src, str(tmp_path / "mv"), keys=("k",), sum_cols=("v",),
        range_key="k", range_files=4,
    )
    src.append(_int_rows(spark, *[(k, k * 10) for k in range(80)]))
    assert mv.refresh() == 1
    meta0 = mv.target.snapshot_meta()
    assert len(meta0.files) >= 3  # range-clustered into several files
    assert all("k" in meta0.file_stats.get(f, {}) for f in meta0.files)

    # touch ONLY keys [10, 19]
    src.append(_int_rows(spark, *[(k, 1) for k in range(10, 20)]))
    assert mv.refresh() == 2
    meta1 = mv.target.snapshot_meta()
    survivors = set(meta0.files) & set(meta1.files)
    rewritten = set(meta0.files) - set(meta1.files)
    assert survivors, "disjoint files must survive untouched"
    assert rewritten, "the touched range's file must be rewritten"
    # every survivor is provably disjoint from [10, 19]
    for f in survivors:
        lo, hi = meta0.file_stats[f]["k"][:2]
        assert hi < 10 or lo > 19
    # every file NOT rewritten-or-added intersects nothing; result exact
    assert {
        r.k: (r.n_rows, r.sum_v) for r in mv.read().collect()
    } == _int_agg_of(src.snapshot())

    # a second disjoint touch prunes again (stats carried forward)
    src.append(_int_rows(spark, (70, 5), (75, 5)))
    assert mv.refresh() == 3
    meta2 = mv.target.snapshot_meta()
    assert set(meta1.files) & set(meta2.files), "pruning persists"
    assert {
        r.k: (r.n_rows, r.sum_v) for r in mv.read().collect()
    } == _int_agg_of(src.snapshot())


def test_range_refresh_stale_base_conflicts(spark, tmp_path):
    """The race matrix holds on the range path: a refresh whose merge
    was computed against a stale target base conflicts instead of
    silently merging stale in-range contents; retry converges."""
    import etl_data_lake_spark.sources.matview as m

    src = TxnTable(spark, str(tmp_path / "src"))
    path = str(tmp_path / "mv")
    a = MaterializedAgg(
        spark, src, path, keys=("k",), sum_cols=("v",), range_key="k"
    )
    b = MaterializedAgg(
        spark, src, path, keys=("k",), sum_cols=("v",), range_key="k"
    )
    src.append(_int_rows(spark, *[(k, 1) for k in range(20)]))
    a.refresh()
    src.append(_int_rows(spark, (5, 100)))
    base_b = b.target.snapshot_meta().version
    a.refresh()  # A lands first
    src.append(_int_rows(spark, (6, 100)))
    delta = b._aggregate(
        src.table_changes(2, 3).withColumn(
            "_sign",
            F.when(F.col("_change_type") == "insert", 1)
            .otherwise(-1)
            .cast("long"),
        ),
        sign_col="_sign",
    )
    with pytest.raises(ConcurrentWriteError):
        b.target.replace_where(
            delta, "k", 6, 6,
            stats_cols=("k",), app_id=m._APP_ID, txn_seq=3,
            expected_base=base_b,
        )
    assert b.refresh() == 3
    assert {
        r.k: (r.n_rows, r.sum_v) for r in b.read().collect()
    } == _int_agg_of(src.snapshot())


def test_range_refresh_watermark_advances_on_cancelled_feed(
    spark, tmp_path
):
    """A pure compaction between refreshes yields an empty change
    feed; the watermark still advances (no-file append) so the next
    refresh doesn't replay the compacted versions."""
    src = TxnTable(spark, str(tmp_path / "src"))
    mv = MaterializedAgg(
        spark, src, str(tmp_path / "mv"), keys=("k",), sum_cols=("v",),
        range_key="k",
    )
    src.append(_int_rows(spark, (1, 1), (2, 2)))
    assert mv.refresh() == 1
    src.compact(target_files=1)
    assert mv.refresh() == 2
    assert mv.refreshed_version() == 2
    assert {
        r.k: (r.n_rows, r.sum_v) for r in mv.read().collect()
    } == _int_agg_of(src.snapshot())


def test_scattered_delta_refreshes_tight_ranges_not_hull(spark, tmp_path):
    """A delta touching two far-apart key clusters must leave the
    files of the untouched middle band in place — the gap split
    publishes tight ranges, not the [min, max] hull."""
    src = TxnTable(spark, str(tmp_path / "src"))
    mv = MaterializedAgg(
        spark, src, str(tmp_path / "mv"), keys=("k",), sum_cols=("v",),
        range_key="k", range_files=8, max_ranges=4,
    )
    src.append(_int_rows(spark, *[(k, k) for k in range(0, 800, 1)]))
    assert mv.refresh() == 1
    meta0 = mv.target.snapshot_meta()
    assert len(meta0.files) >= 6
    # touch keys {5, 6} and {790, 791} — nothing in between
    src.append(_int_rows(spark, (5, 1), (6, 1), (790, 1), (791, 1)))
    assert mv.refresh() == 2
    meta1 = mv.target.snapshot_meta()
    survivors = set(meta0.files) & set(meta1.files)
    # every file fully inside the middle band must survive; under the
    # single-hull behavior [5, 791] NOTHING would have survived
    middle = [
        f for f in meta0.files
        if meta0.file_stats[f]["k"][0] > 6
        and meta0.file_stats[f]["k"][1] < 790
    ]
    assert middle, "fixture must produce middle-band files"
    assert set(middle) <= survivors
    assert {
        r.k: (r.n_rows, r.sum_v) for r in mv.read().collect()
    } == _int_agg_of(src.snapshot())


def test_string_range_key_falls_back_to_hull(spark, tmp_path):
    """String keys never gap-split (between() compares strings); the
    hull fallback stays correct."""
    src = TxnTable(spark, str(tmp_path / "src"))
    mv = MaterializedAgg(
        spark, src, str(tmp_path / "mv"), keys=("k",), sum_cols=("v", "w"),
        range_key="k",
    )
    src.append(_rows(spark, ("a", 1, 1.0), ("b", 2, 2.0), ("z", 3, 3.0)))
    assert mv.refresh() == 1
    src.append(_rows(spark, ("a", 10, 0.0), ("z", 10, 0.0)))
    assert mv.refresh() == 2
    assert _read_mv(mv) == _agg_of(src.snapshot())


def test_first_range_refresh_purges_foreign_rows(spark, tmp_path):
    """The first refresh overwrites even in range mode: pre-existing
    foreign rows at the target path (adopted table) must not survive
    outside the fresh aggregate's key hull."""
    src = TxnTable(spark, str(tmp_path / "src"))
    path = str(tmp_path / "mv")
    # foreign writer left rows at the target with far-away keys
    TxnTable(spark, path).append(
        spark.createDataFrame(
            [(99999, 1, 1)], "k long, n_rows long, sum_v long"
        )
    )
    mv = MaterializedAgg(
        spark, src, path, keys=("k",), sum_cols=("v",), range_key="k"
    )
    src.append(_int_rows(spark, (1, 10), (2, 20)))
    assert mv.refresh() == 1
    got = {r.k: (r.n_rows, r.sum_v) for r in mv.read().collect()}
    assert got == {1: (1, 10), 2: (1, 20)}  # 99999 purged


def test_nan_range_key_falls_back_to_overwrite(spark, tmp_path):
    """Float NaN group keys can't ride a between-predicate or a gap
    split; the refresh must fall back to a full overwrite and stay
    exact (NaN groups like Spark's NaN-normalized grouping)."""
    src = TxnTable(spark, str(tmp_path / "src"))
    mv = MaterializedAgg(
        spark, src, str(tmp_path / "mv"), keys=("k",), sum_cols=("v",),
        range_key="k",
    )
    rows = spark.createDataFrame(
        [(1.0, 1), (2.0, 2)], "k double, v long"
    )
    src.append(rows)
    assert mv.refresh() == 1
    nan_rows = spark.createDataFrame(
        [(float("nan"), 5), (2.0, 7)], "k double, v long"
    )
    src.append(nan_rows)
    assert mv.refresh() == 2
    got = {
        (str(r.k)): (r.n_rows, r.sum_v) for r in mv.read().collect()
    }
    assert got["1.0"] == (1, 1)
    assert got["2.0"] == (2, 9)
    assert got["nan"] == (1, 5)
    # subsequent numeric-only delta goes back to the range path
    src.append(spark.createDataFrame([(1.0, 100)], "k double, v long"))
    assert mv.refresh() == 3
    assert {
        (str(r.k)): (r.n_rows, r.sum_v) for r in mv.read().collect()
    }["1.0"] == (2, 101)


def test_stream_refresh_equals_batch_and_survives_replay(spark, tmp_path):
    """Round-8 verdict #4: the txnlake STREAM drives refresh() in
    foreachBatch. Draining the stream leaves the aggregate exactly ≡
    batch refresh (≡ full recompute); a wiped checkpoint (worst-case
    crash replay — every micro-batch re-fires) re-runs refresh() as
    no-ops, never double-counting; new source commits after a restart
    refresh incrementally from the same checkpoint."""
    from etl_data_lake_spark.sources.matview import stream_refresh_query

    src = TxnTable(spark, str(tmp_path / "src"))
    mv = MaterializedAgg(
        spark, src, str(tmp_path / "mv"), keys=("k",), sum_cols=("v", "w")
    )
    src.append(_rows(spark, ("a", 1, 0.5), ("b", 3, 2.0)))
    src.append(_rows(spark, ("a", 2, 1.5), ("c", 5, 5.0)))

    ckpt = str(tmp_path / "ck")
    q = stream_refresh_query(mv, ckpt, query_name="mv_stream")
    q.awaitTermination()
    assert mv.refreshed_version() == src.latest_version() == 2
    assert _read_mv(mv) == _agg_of(src.snapshot())

    # worst-case crash replay: the ENTIRE checkpoint is lost, so every
    # version window replays from the start — the refresh watermark
    # makes each replayed batch a no-op (counts unchanged)
    import shutil

    shutil.rmtree(ckpt)
    target_v_before = mv.target.latest_version()
    q = stream_refresh_query(mv, ckpt, query_name="mv_stream2")
    q.awaitTermination()
    assert _read_mv(mv) == _agg_of(src.snapshot())
    assert mv.target.latest_version() == target_v_before  # true no-op

    # restart with NEW source work, including a delete — the signal
    # stream (ignoreChanges) survives it and the refresh handles it
    # through the signed change feed
    src.append(_rows(spark, ("b", 7, 1.0)))
    src.delete_where_expr("k = 'a'")
    q = stream_refresh_query(mv, ckpt, query_name="mv_stream3")
    q.awaitTermination()
    assert mv.refreshed_version() == src.latest_version()
    assert _read_mv(mv) == _agg_of(src.snapshot())
    assert ("a",) not in _read_mv(mv)  # fully-deleted group dropped

    # stream-refreshed state ≡ an independent BATCH-refreshed twin
    mv2 = MaterializedAgg(
        spark, src, str(tmp_path / "mv2"), keys=("k",), sum_cols=("v", "w")
    )
    mv2.refresh()
    assert _read_mv(mv) == _read_mv(mv2)
