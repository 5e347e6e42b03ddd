"""Transactional table layer (sources/txn.py): atomic publish,
optimistic concurrency, snapshot isolation, idempotent replays.

The concurrency tests simulate races deterministically: writer B is
forced to base its commit on a version that writer A has already
superseded, by interleaving the internal steps rather than racing
threads (same effect, no flakes)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from etl_data_lake_spark.sources.txn import (
    ConcurrentWriteError,
    TxnTable,
    txn_append_sink,
)


def _df(spark, *vals):
    return spark.createDataFrame([(v, f"r{v}") for v in vals], "id int, s string")


def _ids(df):
    return sorted(r.id for r in df.select("id").collect())


def test_append_read_roundtrip_and_history(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "t"))
    assert t.latest_version() == 0
    v1 = t.append(_df(spark, 1, 2))
    v2 = t.append(_df(spark, 3))
    assert (v1, v2) == (1, 2)
    assert _ids(t.snapshot()) == [1, 2, 3]
    # time travel: v1 unchanged after later commits
    assert _ids(t.snapshot(version=1)) == [1, 2]
    ops = [h["operation"] for h in t.history()]
    assert ops == ["append", "append"]


def test_overwrite_replaces_and_preserves_time_travel(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, 1, 2))
    t.overwrite(_df(spark, 9))
    assert _ids(t.snapshot()) == [9]
    assert _ids(t.snapshot(version=1)) == [1, 2]


def test_snapshot_isolation_reader_pinned_across_commits(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, 1))
    pinned = t.snapshot()  # resolves the v1 file list NOW
    t.overwrite(_df(spark, 2))
    # the pinned plan still reads v1's (immutable, un-vacuumed) files
    assert _ids(pinned) == [1]
    assert _ids(t.snapshot()) == [2]


def test_concurrent_appends_both_survive(spark, tmp_path):
    """Two appends race; the loser rebases and keeps both file sets."""
    path = str(tmp_path / "t")
    a, b = TxnTable(spark, path), TxnTable(spark, path)
    a.append(_df(spark, 1))
    # B stages its files, then A commits first, then B publishes: B's
    # commit loop re-reads the latest snapshot at publish time, so the
    # interleaving below is exactly the lost-race retry path.
    staged_b, schema_b, _ = b._stage(_df(spark, 3))
    a.append(_df(spark, 2))
    vb = b._commit("append", staged_b, schema_b, None, None)
    assert vb == 3
    assert _ids(b.snapshot()) == [1, 2, 3]


def test_overwrite_aborts_on_concurrent_commit(spark, tmp_path):
    path = str(tmp_path / "t")
    a, b = TxnTable(spark, path), TxnTable(spark, path)
    a.append(_df(spark, 1))
    expected = b.latest_version()  # overwrite reads its base…
    staged_b, schema_b, _ = b._stage(_df(spark, 9))
    a.append(_df(spark, 2))  # …and a concurrent commit lands
    with pytest.raises(ConcurrentWriteError):
        b._commit(
            "overwrite", staged_b, schema_b, None, None,
            expected_base=expected,
        )
    # nothing from B leaked into the committed table
    assert _ids(b.snapshot()) == [1, 2]


def test_compact_rebases_over_concurrent_append(spark, tmp_path):
    path = str(tmp_path / "t")
    t = TxnTable(spark, path)
    t.append(_df(spark, 1))
    t.append(_df(spark, 2))
    base = t.snapshot_meta()
    staged, schema_json, _ = t._stage(t.snapshot().coalesce(1))
    TxnTable(spark, path).append(_df(spark, 3))  # lands mid-compaction
    t._commit("compact", staged, schema_json, None, None, replaced=base.files)
    assert _ids(t.snapshot()) == [1, 2, 3]  # append NOT lost
    # the rewritten originals are out of the snapshot; the append's
    # files and the compacted file are in
    after = set(t.snapshot_meta().files)
    assert after.isdisjoint(base.files)
    assert set(staged) <= after


def test_compact_aborts_if_inputs_replaced(spark, tmp_path):
    path = str(tmp_path / "t")
    t = TxnTable(spark, path)
    t.append(_df(spark, 1))
    base = t.snapshot_meta()
    staged, schema_json, _ = t._stage(t.snapshot().coalesce(1))
    TxnTable(spark, path).overwrite(_df(spark, 9))  # rewrites t's inputs
    with pytest.raises(ConcurrentWriteError):
        t._commit(
            "compact", staged, schema_json, None, None, replaced=base.files
        )


def test_idempotent_txn_replay_is_noop(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, 1), app_id="job", txn_seq=0)
    v = t.append(_df(spark, 2), app_id="job", txn_seq=1)
    # replay of seq 1 (and of the stale seq 0) commits nothing
    assert t.append(_df(spark, 2), app_id="job", txn_seq=1) == v
    assert t.append(_df(spark, 1), app_id="job", txn_seq=0) == v
    assert _ids(t.snapshot()) == [1, 2]
    # independent writers have independent watermarks
    t.append(_df(spark, 3), app_id="other", txn_seq=0)
    assert _ids(t.snapshot()) == [1, 2, 3]


def test_crash_artifacts_invisible_and_vacuumed(spark, tmp_path):
    path = tmp_path / "t"
    t = TxnTable(spark, str(path))
    t.append(_df(spark, 1))
    # crashed stage: data dir written, no manifest references it
    orphan, _, _ = t._stage(_df(spark, 99))
    # crashed publish: temp manifest left in the log dir
    (path / "_txnlog" / ".tmp-crashed").write_text(json.dumps({"junk": 1}))
    assert _ids(t.snapshot()) == [1]
    assert t.latest_version() == 1
    removed = t.vacuum(keep_versions=1)
    assert removed == 1  # the orphan dir
    assert not (path / os.path.dirname(orphan[0])).exists()
    assert _ids(t.snapshot()) == [1]


def test_vacuum_respects_retained_versions(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, 1))
    t.overwrite(_df(spark, 2))
    t.overwrite(_df(spark, 3))
    assert t.vacuum(keep_versions=2) == 1  # only v1's dir goes
    assert _ids(t.snapshot(version=2)) == [2]  # retained history readable
    assert _ids(t.snapshot()) == [3]


def test_empty_table_snapshot_keeps_schema(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "t"))
    t.append(_df(spark).limit(0))
    got = t.snapshot()
    assert got.count() == 0
    assert [f.name for f in got.schema.fields] == ["id", "s"]


def test_streaming_exactly_once_append_sink(spark, tmp_path):
    """At-least-once foreachBatch replays commit exactly once."""
    path = str(tmp_path / "t")
    sink = txn_append_sink(path, app_id="ingest")
    sink(_df(spark, 1, 2), 0)
    sink(_df(spark, 3), 1)
    sink(_df(spark, 3), 1)  # replayed micro-batch (restart/retry)
    t = TxnTable(spark, path)
    assert _ids(t.snapshot()) == [1, 2, 3]
    assert t.latest_version() == 2


def test_schema_tracks_latest_commit(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, 1))
    widened = _df(spark, 2).withColumn("extra", F.lit(7))
    t.overwrite(widened)
    assert "extra" in t.snapshot().columns
    assert "extra" not in t.snapshot(version=1).columns


def test_stream_replay_end_to_end_exactly_once(spark, tmp_path):
    """Real Structured Streaming path: availableNow file stream →
    foreachBatch txn appends. Wiping the CHECKPOINT and re-running —
    the worst at-least-once failure, a full replay with the same batch
    ids — must commit nothing the second time."""
    import shutil

    src = tmp_path / "src"
    src.mkdir()
    _df(spark, 1, 2).write.mode("overwrite").parquet(str(src / "a"))
    _df(spark, 3).write.mode("overwrite").parquet(str(src / "b"))
    table = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")

    def run():
        q = (
            spark.readStream.schema("id int, s string")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src / "*"))
            .writeStream.foreachBatch(txn_append_sink(table, app_id="e2e"))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run()
    t = TxnTable(spark, table)
    v_first = t.latest_version()
    assert _ids(t.snapshot()) == [1, 2, 3]
    shutil.rmtree(ckpt)  # lose all progress tracking → full replay
    run()
    assert t.latest_version() == v_first  # no new commits
    assert _ids(t.snapshot()) == [1, 2, 3]


def test_schema_evolution_append_widens_and_conflicts_raise(spark, tmp_path):
    from etl_data_lake_spark.sources.txn import SchemaEvolutionError

    t = TxnTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, 1))
    t.append(_df(spark, 2).withColumn("extra", F.lit(7)))
    got = t.snapshot()
    # union schema; pre-evolution files read the new column as null
    assert got.columns == ["id", "s", "extra"]
    vals = {r["id"]: r["extra"] for r in got.collect()}
    assert vals == {1: None, 2: 7}
    # type conflict on a shared column must abort before publish
    bad = spark.createDataFrame([("x", "y")], "id string, s string")
    with pytest.raises(SchemaEvolutionError):
        t.append(bad)
    assert t.latest_version() == 2


def test_manifest_stats_skip_files(spark, tmp_path):
    """snapshot_where must plan over only the files whose manifest
    [min,max] intersects the predicate — asserted by counting scanned
    files in the plan, and results must equal the unpruned filter."""
    t = TxnTable(spark, str(tmp_path / "t"))
    # three appends with disjoint id ranges, stats tracked
    for lo in (0, 100, 200):
        df = spark.range(lo, lo + 10).select(
            F.col("id").cast("int").alias("id"),
            F.concat(F.lit("r"), F.col("id")).alias("s"),
        ).coalesce(1)
        t.append(df, stats_cols=("id",))
    meta = t.snapshot_meta()
    assert all("id" in s for s in meta.file_stats.values())

    pruned = t.snapshot_where("id", 100, 105)
    assert _ids(pruned) == list(range(100, 106))
    # the pruned plan reads exactly the one matching file
    n_scan_files = pruned._jdf.queryExecution().executedPlan().toString()
    import re

    m = re.search(r"number of files read: (\d+)", n_scan_files)
    if m:  # plan-string formats vary; fall back to the file-list length
        assert int(m.group(1)) == 1
    keep = [
        f
        for f in meta.files
        if meta.file_stats[f]["id"][0] <= 105
        and meta.file_stats[f]["id"][1] >= 100
    ]
    assert len(keep) == 1
    # compaction carries/recomputes stats and skipping still works
    t.compact(target_files=1, stats_cols=("id",))
    assert _ids(t.snapshot_where("id", 200, 209)) == list(range(200, 210))
    # out-of-range predicate over stats-tracked files → empty, no scan
    assert t.snapshot_where("id", 900, 999).count() == 0


def test_change_data_feed(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, 1, 2))          # v1
    t.append(_df(spark, 3))             # v2
    t.overwrite(_df(spark, 2, 3, 4))    # v3 (drops 1, re-adds 2/3, adds 4)
    t.compact(target_files=1)           # v4 (pure rewrite)

    def feed(v_from, v_to):
        rows = t.table_changes(v_from, v_to).collect()
        return sorted((r["_change_type"], r["id"]) for r in rows)

    assert feed(1, 2) == [("insert", 3)]
    assert feed(2, 3) == [("delete", 1), ("insert", 4)]
    # pure compaction: adds and removes cancel exactly
    assert feed(3, 4) == []
    # spanning feed diffs endpoint MANIFESTS (net change), so the
    # compaction in between contributes nothing
    assert feed(1, 4) == [("delete", 1), ("insert", 3), ("insert", 4)]


def test_checkpoint_bounds_log_replay(spark, tmp_path):
    """25 commits at interval 10: a read resolves from the v20
    checkpoint + ≤5 incremental manifests, never 25; manifests stay
    O(Δfiles); time travel and vacuum still work across the horizon."""
    from etl_data_lake_spark.sources.txn import _ckpt_path, _manifest_path

    path = str(tmp_path / "t")
    t = TxnTable(spark, path)
    for i in range(1, 26):
        t.append(_df(spark, i))
    assert t.latest_version() == 25
    # checkpoints exist exactly at the interval marks
    assert _ckpt_path(t.root, 10).exists() and _ckpt_path(t.root, 20).exists()
    assert not _ckpt_path(t.root, 25).exists()
    # latest read: newest checkpoint + bounded tail
    plan = t.read_plan()
    assert plan.checkpoint == 20 and plan.n_manifests == 5
    # time travel resolves against the older checkpoint
    plan15 = t.read_plan(version=15)
    assert plan15.checkpoint == 10 and plan15.n_manifests == 5
    assert _ids(t.snapshot(version=15)) == list(range(1, 16))
    # pre-checkpoint versions still reconstruct from manifests alone
    plan3 = t.read_plan(version=3)
    assert plan3.checkpoint == 0 and plan3.n_manifests == 3
    # a manifest is O(Δfiles): v25's carries only its own adds
    m25 = json.loads(_manifest_path(t.root, 25).read_text())
    assert "files" not in m25 and len(m25["add"]) >= 1
    early = json.loads(_manifest_path(t.root, 1).read_text())["add"]
    assert set(early).isdisjoint(m25["add"])
    # full state correct after checkpoint + tail replay
    assert _ids(t.snapshot()) == list(range(1, 26))
    # vacuum keeps the latest snapshot readable
    t.compact(target_files=1)
    removed = t.vacuum(keep_versions=1)
    assert removed >= 25
    assert _ids(t.snapshot()) == list(range(1, 26))


def test_checkpoint_carries_stats_and_overwrite_resets(spark, tmp_path):
    """file_stats survive checkpointing (snapshot_where still prunes)
    and an overwrite resets the accumulated file list/stats."""
    path = str(tmp_path / "t")
    t = TxnTable(spark, path, checkpoint_interval=2)
    for i in range(1, 5):
        t.append(
            spark.range(i * 100, i * 100 + 10).selectExpr("id"),
            stats_cols=("id",),
        )
    assert t.read_plan().checkpoint == 4
    meta = t.snapshot_meta()
    assert len(meta.file_stats) > 0
    hit = t.snapshot_where("id", 100, 105)
    assert hit.count() == 6
    # stats-based pruning really dropped non-matching files
    kept = [
        f
        for f in meta.files
        if meta.file_stats.get(f, {}).get("id") is None
        or (
            meta.file_stats[f]["id"][0] <= 105
            and meta.file_stats[f]["id"][1] >= 100
        )
    ]
    assert len(kept) < len(meta.files)
    v = t.overwrite(spark.range(0, 5).selectExpr("id"))
    meta2 = t.snapshot_meta()
    assert meta2.version == v
    assert len(meta2.files) < len(meta.files)
    assert t.snapshot().count() == 5


def test_replace_where_scoped_backfill(spark, tmp_path):
    """replace_where swaps only the rows in range; files provably
    disjoint (by manifest stats) survive untouched; out-of-range rows
    in affected files are preserved."""
    t = TxnTable(spark, str(tmp_path / "t"))
    # three stats-tracked appends: [0,99], [100,199], [200,299]
    for base in (0, 100, 200):
        t.append(
            spark.range(base, base + 100).selectExpr("id"),
            stats_cols=("id",),
        )
    before = set(t.snapshot_meta().files)
    # replace [120, 179] with a sparser backfill
    v = t.replace_where(
        spark.range(120, 180, 2).selectExpr("id"), "id", 120, 179,
        stats_cols=("id",),
    )
    assert v == 4
    got = sorted(r.id for r in t.snapshot().select("id").collect())
    want = sorted(
        list(range(0, 120)) + list(range(120, 180, 2))
        + list(range(180, 300))
    )
    assert got == want
    # the disjoint files ([0,99] and [200,299]) survived byte-identical
    after = set(t.snapshot_meta().files)
    survivors = before & after
    meta = t.snapshot_meta()
    for f in survivors:
        rng = meta.file_stats[f]["id"]
        assert rng[1] < 120 or rng[0] > 179
    assert len(survivors) > 0
    # time travel still shows the pre-backfill state
    assert t.snapshot(version=3).count() == 300


def test_replace_where_rejects_out_of_range_data(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "t"))
    t.append(spark.range(0, 50).selectExpr("id"), stats_cols=("id",))
    with pytest.raises(ValueError):
        t.replace_where(
            spark.range(0, 100).selectExpr("id"), "id", 0, 49
        )


def test_replace_where_conflicts_like_compact(spark, tmp_path):
    """A concurrent overwrite invalidates the files the backfill read
    → ConcurrentWriteError; a concurrent DISJOINT append rebases
    cleanly underneath."""
    path = str(tmp_path / "t")
    t = TxnTable(spark, path)
    t.append(spark.range(0, 100).selectExpr("id"), stats_cols=("id",))

    # disjoint concurrent append: stage the replace, let the append
    # land, then publish — both changes must survive
    base = t.snapshot_meta()
    affected, _ = t.files_matching({"id": (0, 49)}, base.version)
    old = spark.read.schema(base.schema()).parquet(
        *[str(t.root / f) for f in affected]
    )
    out = old.where("id > 49 or id is null").unionByName(
        spark.range(0, 25).selectExpr("id")
    )
    staged, schema_json, stats = t._stage(out, ("id",))
    TxnTable(spark, path).append(
        spark.range(1000, 1010).selectExpr("id"), stats_cols=("id",)
    )
    t._commit(
        "compact", staged, schema_json, None, None,
        replaced=tuple(affected), staged_stats=stats,
    )
    got = sorted(r.id for r in t.snapshot().select("id").collect())
    assert got == sorted(list(range(0, 25)) + list(range(50, 100))
                         + list(range(1000, 1010)))

    # conflicting overwrite: the backfill's inputs are gone → abort
    base2 = t.snapshot_meta()
    affected2, _ = t.files_matching({"id": (0, 9)}, base2.version)
    staged2, schema2, stats2 = t._stage(
        spark.range(0, 5).selectExpr("id"), ("id",)
    )
    TxnTable(spark, path).overwrite(spark.range(0, 3).selectExpr("id"))
    with pytest.raises(ConcurrentWriteError):
        t._commit(
            "compact", staged2, schema2, None, None,
            replaced=tuple(affected2), staged_stats=stats2,
        )


def test_replace_where_concurrent_inrange_append_conflicts(
    spark, tmp_path
):
    """ADVICE r3: an append of rows INSIDE the replaced range landing
    between the backfill's snapshot and its publish must abort — those
    rows would otherwise survive unreplaced, silently violating the
    'all existing rows in range are replaced' contract (Delta raises
    ConcurrentAppendException here)."""
    path = str(tmp_path / "t")
    t = TxnTable(spark, path)
    t.append(spark.range(0, 100).selectExpr("id"), stats_cols=("id",))
    base = t.snapshot_meta()
    affected, _ = t.files_matching({"id": (0, 49)}, base.version)
    staged, schema_json, stats = t._stage(
        spark.range(0, 10).selectExpr("id"), ("id",)
    )
    # concurrent append whose stats PROVE overlap with [0, 49]
    TxnTable(spark, path).append(
        spark.range(20, 30).selectExpr("id"), stats_cols=("id",)
    )
    with pytest.raises(ConcurrentWriteError):
        t._commit(
            "compact", staged, schema_json, None, None,
            replaced=tuple(affected), staged_stats=stats,
            guard_range=("id", 0, 49),
        )


def test_replace_where_concurrent_statless_append_conflicts(
    spark, tmp_path
):
    """A concurrent append WITHOUT stats for the predicate column
    cannot prove disjointness → conservatively conflicts, even though
    its values happen to be out of range."""
    path = str(tmp_path / "t")
    t = TxnTable(spark, path)
    t.append(spark.range(0, 100).selectExpr("id"), stats_cols=("id",))
    base = t.snapshot_meta()
    affected, _ = t.files_matching({"id": (0, 49)}, base.version)
    staged, schema_json, stats = t._stage(
        spark.range(0, 10).selectExpr("id"), ("id",)
    )
    TxnTable(spark, path).append(
        spark.range(1000, 1010).selectExpr("id")  # no stats recorded
    )
    with pytest.raises(ConcurrentWriteError):
        t._commit(
            "compact", staged, schema_json, None, None,
            replaced=tuple(affected), staged_stats=stats,
            guard_range=("id", 0, 49),
        )


def test_replace_where_concurrent_disjoint_append_rebases(
    spark, tmp_path
):
    """A concurrent append provably disjoint by stats still rebases
    cleanly under the guarded commit — the guard only kills appends
    that MAY intersect the range."""
    path = str(tmp_path / "t")
    t = TxnTable(spark, path)
    t.append(spark.range(0, 100).selectExpr("id"), stats_cols=("id",))
    base = t.snapshot_meta()
    affected, _ = t.files_matching({"id": (0, 49)}, base.version)
    old = spark.read.schema(base.schema()).parquet(
        *[str(t.root / f) for f in affected]
    )
    out = old.where("id > 49 or id is null").unionByName(
        spark.range(0, 25).selectExpr("id")
    )
    staged, schema_json, stats = t._stage(out, ("id",))
    TxnTable(spark, path).append(
        spark.range(1000, 1010).selectExpr("id"), stats_cols=("id",)
    )
    t._commit(
        "compact", staged, schema_json, None, None,
        replaced=tuple(affected), staged_stats=stats,
        guard_range=("id", 0, 49),
    )
    got = sorted(r.id for r in t.snapshot().select("id").collect())
    assert got == sorted(
        list(range(0, 25)) + list(range(50, 100)) + list(range(1000, 1010))
    )


def test_replace_where_empty_table_guarded(spark, tmp_path):
    """First-ever replace_where on an empty/nonexistent table commits
    the new rows; the guard makes a concurrent unprovable append
    conflict rather than coexist unreplaced."""
    t = TxnTable(spark, str(tmp_path / "t"))
    v = t.replace_where(
        spark.range(10, 20).selectExpr("id"), "id", 10, 19,
        stats_cols=("id",),
    )
    assert v == 1
    assert t.snapshot().count() == 10


def test_last_checkpoint_pointer_bounds_resolution(spark, tmp_path):
    """Round-3 verdict #3: latest-version resolution reads the
    advisory _last_checkpoint pointer and probes manifests forward —
    O(interval) log entries touched at ~100 committed versions, no
    directory listing. A deleted pointer degrades gracefully (slower,
    same answer); conflict matrix and time travel are exercised by the
    surrounding suite on the same machinery."""
    from etl_data_lake_spark.sources import txn as txn_mod

    t = TxnTable(spark, str(tmp_path / "t"), checkpoint_interval=10)
    one = spark.range(0, 1).selectExpr("id")
    for _ in range(103):
        t.append(one)
    assert t.latest_version() == 103
    # pointer names the newest checkpoint (v100) + writer's interval
    assert t._read_pointer() == (100, 10)

    probes = []
    real = txn_mod._manifest_path

    def counting(root, version):
        probes.append(version)
        return real(root, version)

    txn_mod._manifest_path = counting
    try:
        assert t.latest_version() == 103
        resolution_probes = [v for v in probes if v > 100]
        # forward walk from the pointer: 101, 102, 103, 104(miss)
        assert len(probes) <= t.checkpoint_interval + 2
        assert resolution_probes == [101, 102, 103, 104]
    finally:
        txn_mod._manifest_path = real

    # read path reconstructs from the pointed checkpoint + short tail
    plan = t.read_plan()
    assert plan.checkpoint == 100 and plan.n_manifests == 3
    # stale/missing pointer: same state, longer walk
    (t.root / "_txnlog" / "_last_checkpoint").unlink()
    assert t.latest_version() == 103
    assert t.read_plan().checkpoint == 100
    # time travel unaffected by the pointer (checkpoint probed ≤ v)
    assert t.snapshot(version=95).count() == 95
    assert t.read_plan(version=95).checkpoint == 90


def test_replace_where_ranges_scattered_backfill(spark, tmp_path):
    """Multi-range replaceWhere: two tight ranges replaced in ONE
    commit; files between the ranges survive byte-identical (the
    single-range hull would have rewritten them)."""
    t = TxnTable(spark, str(tmp_path / "t"))
    for base in (0, 100, 200, 300):
        t.append(
            spark.range(base, base + 100).selectExpr("id"),
            stats_cols=("id",),
        )
    before = set(t.snapshot_meta().files)
    new = spark.range(0, 1000).where(
        "(id >= 20 and id <= 29) or (id >= 320 and id <= 329)"
    ).selectExpr("id", "id * 2 as v")
    v = t.replace_where_ranges(
        new, "id", [(20, 29), (320, 329)], stats_cols=("id",)
    )
    assert v == 5
    got = t.snapshot()
    assert got.count() == 400
    assert got.where("v is not null").count() == 20
    # every survivor is provably disjoint from BOTH ranges, and the
    # middle band between them (which the single-range hull [20, 329]
    # would have rewritten wholesale) kept files untouched
    after = set(t.snapshot_meta().files)
    survivors = before & after
    meta = t.snapshot_meta()
    surv_ranges = sorted(
        tuple(meta.file_stats[f]["id"][:2]) for f in survivors
    )
    assert survivors
    for lo_f, hi_f in surv_ranges:
        assert (hi_f < 20 or lo_f > 29) and (hi_f < 320 or lo_f > 329)
    middle_survivors = [
        (lo_f, hi_f) for lo_f, hi_f in surv_ranges
        if lo_f > 29 and hi_f < 320
    ]
    assert middle_survivors
    # out-of-union rows are rejected
    with pytest.raises(ValueError):
        t.replace_where_ranges(
            spark.range(50, 60).selectExpr("id"),
            "id",
            [(20, 29), (320, 329)],
        )


def test_replace_where_ranges_guard_covers_every_range(spark, tmp_path):
    """The concurrent-append guard applies to ALL ranges of a
    multi-range backfill, not just the first."""
    path = str(tmp_path / "t")
    t = TxnTable(spark, path)
    t.append(spark.range(0, 400).selectExpr("id"), stats_cols=("id",))
    base = t.snapshot_meta()
    affected = t.files_matching_any(
        "id", [(20, 29), (320, 329)], base.version
    )
    staged, schema_json, stats = t._stage(
        spark.range(20, 30).selectExpr("id"), ("id",)
    )
    # concurrent append inside the SECOND range
    TxnTable(spark, path).append(
        spark.range(325, 326).selectExpr("id"), stats_cols=("id",)
    )
    with pytest.raises(ConcurrentWriteError):
        t._commit(
            "compact", staged, schema_json, None, None,
            replaced=tuple(affected), staged_stats=stats,
            guard_range=("id", [(20, 29), (320, 329)]),
        )


def test_pointer_robust_to_bogus_documents_and_foreign_intervals(
    spark, tmp_path
):
    """Malformed _last_checkpoint documents (wrong types/shape) must
    degrade to the no-pointer walk, never error; and a reader opened
    with a DIFFERENT checkpoint_interval still finds the writer's
    checkpoints via the interval recorded in the pointer."""
    path = str(tmp_path / "t")
    w = TxnTable(spark, path, checkpoint_interval=5)
    one = spark.range(0, 1).selectExpr("id")
    for _ in range(12):
        w.append(one)
    ptr = w.root / "_txnlog" / "_last_checkpoint"
    # reader with a mismatched interval resolves the v10 checkpoint
    r = TxnTable(spark, path, checkpoint_interval=7)
    plan = r.read_plan()
    assert plan.checkpoint == 10 and plan.n_manifests == 2
    assert r.snapshot().count() == 12
    # bogus pointer documents: degrade, same answers
    for bogus in ('{"version": null}', "[1,2]", '"x"', "{}", "nonsense"):
        ptr.write_text(bogus)
        assert r._read_pointer() is None
        assert r.latest_version() == 12
        assert r.snapshot().count() == 12


def test_replace_where_no_affected_files_keeps_table_schema(
    spark, tmp_path
):
    """A range-scoped publish that touches NO existing file must still
    commit the MERGED schema — publishing only df's narrower schema
    would silently drop the table's other columns from every read."""
    t = TxnTable(spark, str(tmp_path / "t"))
    t.append(
        spark.range(0, 10).selectExpr("id", "id * 2 as extra"),
        stats_cols=("id",),
    )
    # new range [100, 109] is disjoint from every file; df lacks
    # the 'extra' column
    t.replace_where(
        spark.range(100, 110).selectExpr("id"), "id", 100, 109,
        stats_cols=("id",),
    )
    snap = t.snapshot()
    assert set(snap.columns) == {"id", "extra"}
    assert snap.where("extra is not null").count() == 10
    assert snap.count() == 20


def test_null_count_stats_skip_files(spark, tmp_path):
    """Null-count stats ([min, max, nulls, rows] / [None, None, nulls,
    rows] entries): IS NULL skips zero-null files, IS NOT NULL skips
    all-null files, and every range reader treats nulls-only entries
    as conservatively unknown."""
    t = TxnTable(spark, str(tmp_path / "t"))
    mk = lambda rows: spark.createDataFrame(rows, "id int, s string").coalesce(1)
    t.append(mk([(1, "a"), (2, "b")]), stats_cols=("id",))            # no nulls
    t.append(mk([(10, "c"), (None, "d")]), stats_cols=("id",))        # mixed
    t.append(mk([(None, "e"), (None, "f")]), stats_cols=("id",))      # all null
    meta = t.snapshot_meta()
    assert len(meta.files) == 3

    keep, total = t.files_matching_null("id", is_null=True)
    assert total == 3 and len(keep) == 2  # zero-null file skipped
    keep, _ = t.files_matching_null("id", is_null=False)
    assert len(keep) == 2  # all-null file skipped

    assert sorted(
        r.s for r in t.snapshot_where_null("id", is_null=True).collect()
    ) == ["d", "e", "f"]
    assert sorted(
        r.s for r in t.snapshot_where_null("id", is_null=False).collect()
    ) == ["a", "b", "c"]

    # the all-null file has a nulls-only entry: range readers keep it
    # conservatively (it could never match, but they cannot prove it)
    keep, _ = t.files_matching({"id": (0, 100)})
    assert len(keep) == 3
    # file [1,2] intersects (0,5): kept; file [10,10] disjoint:
    # skipped; all-null file kept conservatively -> 2
    assert len(t.files_matching_any("id", [(0, 5)])) == 2

    # stats survive a checkpointed read (ride the same structures)
    for i in range(10):
        t.append(mk([(100 + i, "x")]), stats_cols=("id",))
    keep, _ = t.files_matching_null("id", is_null=True)
    assert len(keep) == 2  # still only mixed + all-null can hold nulls


def test_prefix_predicate_file_skipping(spark, tmp_path):
    """LIKE 'abc%' as a range over string min/max stats: clustered
    string data prunes at the manifest, results stay exact."""
    t = TxnTable(spark, str(tmp_path / "t"))
    mk = lambda rows: spark.createDataFrame(rows, "k string, v int").coalesce(1)
    t.append(mk([("apple", 1), ("apricot", 2)]), stats_cols=("k",))
    t.append(mk([("banana", 3), ("blueberry", 4)]), stats_cols=("k",))
    t.append(mk([("cherry", 5)]), stats_cols=("k",))
    keep, total = t.files_matching({"k": ("b", "b\U0010ffff")})
    assert total == 3 and len(keep) == 1
    got = sorted(r.k for r in t.snapshot_where_prefix("k", "b").collect())
    assert got == ["banana", "blueberry"]
    # prefix spanning a file boundary value still exact
    assert [r.v for r in t.snapshot_where_prefix("k", "apr").collect()] == [2]
    # empty prefix = full table
    assert t.snapshot_where_prefix("k", "").count() == 5
    # no matching file -> empty with schema
    assert t.snapshot_where_prefix("k", "zz").count() == 0


def test_mixed_range_and_null_pruning_one_read(spark, tmp_path):
    """snapshot_where_ranges(null_cols=...) plans a mixed predicate
    (range conjuncts + IS [NOT] NULL conjuncts) with BOTH skipping
    tiers in one call: a file pruned by either tier never reaches the
    scan, the residual filter keeps the result exact."""
    t = TxnTable(spark, str(tmp_path / "t"))
    mk = lambda rows: spark.createDataFrame(
        rows, "id int, ref int, s string"
    ).coalesce(1)
    t.append(mk([(1, 7, "a"), (2, None, "b")]), stats_cols=("id", "ref"))
    t.append(mk([(50, 8, "c"), (51, 9, "d")]), stats_cols=("id", "ref"))  # no ref nulls
    t.append(mk([(90, None, "e"), (91, None, "f")]), stats_cols=("id", "ref"))

    # id BETWEEN 0 AND 60 AND ref IS NULL:
    #   file 2 pruned by null tier (zero ref nulls),
    #   file 3 pruned by range tier (id 90..91)
    keep, total = t.files_matching(
        {"id": (0, 60)}, null_cols={"ref": True}
    )
    assert total == 3 and len(keep) == 1

    got = sorted(
        r.s
        for r in t.snapshot_where_ranges(
            {"id": (0, 60)}, null_cols={"ref": True}
        ).collect()
    )
    assert got == ["b"]

    # IS NOT NULL alone through the same entry point (no ranges)
    got = sorted(
        r.s
        for r in t.snapshot_where_ranges({}, null_cols={"ref": False}).collect()
    )
    assert got == ["a", "c", "d"]
    keep, _ = t.files_matching({}, null_cols={"ref": False})
    assert len(keep) == 2  # all-null ref file skipped


def test_update_where_rewrites_only_intersecting_files(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "t"))
    mk = lambda rows: spark.createDataFrame(rows, "id int, v int, s string").coalesce(1)
    t.append(mk([(1, 10, "a"), (2, 20, "b")]), stats_cols=("id",))
    t.append(mk([(100, 30, "c"), (101, 40, "d")]), stats_cols=("id",))
    before = set(t.snapshot_meta().files)

    v = t.update_where(
        "id", 0, 50, {"v": "v * 10", "s": "concat(s, '!')"},
        stats_cols=("id",),
    )
    assert v == 3
    after = t.snapshot_meta()
    # the disjoint file survived byte-identical (never rewritten)
    assert len(set(after.files) & before) == 1
    rows = sorted((r.id, r.v, r.s) for r in t.snapshot().collect())
    assert rows == [(1, 100, "a!"), (2, 200, "b!"), (100, 30, "c"), (101, 40, "d")]
    # schema invariant, history truthful, time travel intact
    assert after.schema() == t.snapshot_meta(2).schema()
    assert t.history()[-1]["operation"] == "update"
    assert sorted(r.v for r in t.snapshot(2).collect()) == [10, 20, 30, 40]


def test_update_where_noop_and_validation(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "t"))
    mk = lambda rows: spark.createDataFrame(rows, "id int, v int").coalesce(1)
    t.append(mk([(1, 10)]), stats_cols=("id",))
    # disjoint range: no commit
    assert t.update_where("id", 500, 600, {"v": "0"}) == 1
    with pytest.raises(ValueError):
        t.update_where("id", 0, 5, {"nope": "1"})
    with pytest.raises(ValueError):
        t.update_where("id", 0, 5, {})
    # null predicate col rows are never updated
    t.append(
        spark.createDataFrame([(None, 7)], "id int, v int").coalesce(1),
        stats_cols=("id",),
    )
    t.update_where("id", 0, 5, {"v": "v + 1"}, stats_cols=("id",))
    assert sorted(r.v for r in t.snapshot().collect()) == [7, 11]


def test_update_where_exactly_once_replay(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "t"))
    mk = lambda rows: spark.createDataFrame(rows, "id int, v int").coalesce(1)
    t.append(mk([(1, 1)]), stats_cols=("id",))
    v = t.update_where("id", 0, 5, {"v": "v + 1"}, app_id="u", txn_seq=0)
    # replay: same (app_id, txn_seq) must no-op, not double-increment
    assert t.update_where("id", 0, 5, {"v": "v + 1"}, app_id="u", txn_seq=0) == v
    assert [r.v for r in t.snapshot().collect()] == [2]


def test_update_where_appears_as_delete_insert_in_cdf(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "t"))
    mk = lambda rows: spark.createDataFrame(rows, "id int, v int").coalesce(1)
    t.append(mk([(1, 1), (2, 2)]), stats_cols=("id",))
    t.update_where("id", 1, 1, {"v": "v + 100"}, stats_cols=("id",))
    ch = sorted(
        (r.id, r.v, r._change_type) for r in t.table_changes(1, 2).collect()
    )
    assert ch == [(1, 1, "delete"), (1, 101, "insert")]


# ---------------------------------------------------------------------------
# CHECK constraints
# ---------------------------------------------------------------------------


def test_constraint_blocks_violating_append(spark, tmp_path):
    from etl_data_lake_spark.sources.txn import ConstraintViolationError

    t = TxnTable(spark, str(tmp_path / "t"))
    mk = lambda rows: spark.createDataFrame(rows, "id int, v int").coalesce(1)
    t.append(mk([(1, 10)]))
    v = t.add_constraint("v_positive", "v > 0")
    assert t.history()[-1]["operation"] == "constraint"
    with pytest.raises(ConstraintViolationError):
        t.append(mk([(2, -5)]))
    # nothing committed; good rows still land
    assert t.latest_version() == v
    t.append(mk([(2, 5)]))
    assert sorted(r.v for r in t.snapshot().collect()) == [5, 10]
    # SQL CHECK: UNKNOWN (null) passes
    t.append(mk([(3, None)]))
    assert t.snapshot().count() == 3
    # NOT NULL is a CHECK too, and the existing null row blocks adding it
    with pytest.raises(ConstraintViolationError):
        t.add_constraint("v_not_null", "v IS NOT NULL")


def test_constraint_validates_existing_rows_on_add(spark, tmp_path):
    from etl_data_lake_spark.sources.txn import ConstraintViolationError

    t = TxnTable(spark, str(tmp_path / "t"))
    t.append(spark.createDataFrame([(1, -1)], "id int, v int"))
    before = t.latest_version()
    with pytest.raises(ConstraintViolationError):
        t.add_constraint("v_pos", "v > 0")
    assert t.latest_version() == before  # nothing committed


def test_constraint_add_drop_idempotence_and_conflicts(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "t"))
    t.append(spark.createDataFrame([(1, 1)], "id int, v int"))
    v = t.add_constraint("c", "v > 0")
    assert t.add_constraint("c", "v > 0") == v  # same expr: no-op
    with pytest.raises(ValueError):
        t.add_constraint("c", "v > 1")  # different expr under same name
    v2 = t.drop_constraint("c")
    assert v2 == v + 1
    assert t.drop_constraint("c") == v2  # unknown name: no-op
    t.append(spark.createDataFrame([(2, -9)], "id int, v int"))  # now fine
    assert t.snapshot().count() == 2


def test_constraint_survives_checkpoint_and_guards_all_ops(spark, tmp_path):
    from etl_data_lake_spark.sources.txn import ConstraintViolationError
    from etl_data_lake_spark.sources.merge import merge_into

    t = TxnTable(spark, str(tmp_path / "t"), checkpoint_interval=5)
    mk = lambda rows: spark.createDataFrame(rows, "id int, v int").coalesce(1)
    t.append(mk([(1, 1)]), stats_cols=("id",))
    t.add_constraint("v_pos", "v > 0")
    for i in range(12):  # cross at least two checkpoints
        t.append(mk([(10 + i, i + 1)]), stats_cols=("id",))
    assert t.read_plan().checkpoint > 0
    assert t.snapshot_meta().constraints == {"v_pos": "v > 0"}
    # a fresh handle reconstructing from the checkpoint still enforces
    t2 = TxnTable(spark, str(tmp_path / "t"), checkpoint_interval=5)
    with pytest.raises(ConstraintViolationError):
        t2.append(mk([(99, 0)]))
    # merge's staged rewrite is validated too
    with pytest.raises(ConstraintViolationError):
        merge_into(t2, mk([(1, -7)]), "id", stats_cols=("id",))
    # update_where producing a violation is blocked as well
    with pytest.raises(ConstraintViolationError):
        t2.update_where("id", 1, 1, {"v": "-v"}, stats_cols=("id",))


def test_constraint_add_pinned_to_validated_version(spark, tmp_path):
    """The metadata commit is pinned to the snapshot the validation
    scan covered: a concurrent append forces ConcurrentWriteError at
    the _commit layer (add_constraint's public loop then re-validates
    the new rows — here we pin the layer-level behavior)."""
    t = TxnTable(spark, str(tmp_path / "t"))
    t.append(spark.createDataFrame([(1, 1)], "id int, v int"))
    base = t.snapshot_meta()
    t.append(spark.createDataFrame([(2, 2)], "id int, v int"))
    with pytest.raises(ConcurrentWriteError):
        t._commit(
            "constraint", [], base.schema_json, None, None,
            expected_base=base.version,
            constraints={"c": "v > 0"},
        )
    # and the public API succeeds by re-validating on the moved base
    assert t.add_constraint("c", "v > 0") == 3


# ---------------------------------------------------------------------------
# RESTORE
# ---------------------------------------------------------------------------


def test_restore_rolls_back_metadata_only(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "t"))
    mk = lambda rows: spark.createDataFrame(rows, "id int, v int").coalesce(1)
    t.append(mk([(1, 1)]), stats_cols=("id",))
    t.append(mk([(2, 2)]), stats_cols=("id",))
    files_v2 = set(t.snapshot_meta().files)
    t.delete_where("id", 1, 1, stats_cols=("id",))
    t.append(mk([(3, 3)]), stats_cols=("id",))
    assert sorted(r.id for r in t.snapshot().collect()) == [2, 3]

    v = t.restore(2)
    assert v == 5
    assert t.history()[-1]["operation"] == "restore"
    assert t.history()[-1]["params"] == {"to_version": 2}
    # exact file set of v2 — no data copied, just re-referenced
    assert set(t.snapshot_meta().files) == files_v2
    assert sorted(r.id for r in t.snapshot().collect()) == [1, 2]
    # every intermediate version still time-travels
    assert sorted(r.id for r in t.snapshot(4).collect()) == [2, 3]
    # stats rode along: pruning still works on restored files
    keep, total = t.files_matching({"id": (2, 2)})
    assert total == 2 and len(keep) == 1
    # restore to current version: no-op
    assert t.restore(5) == 5


def test_restore_conflicts_with_concurrent_commit(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "t"))
    mk = lambda rows: spark.createDataFrame(rows, "id int, v int").coalesce(1)
    t.append(mk([(1, 1)]))
    t.append(mk([(2, 2)]))
    base = t.snapshot_meta()
    TxnTable(spark, str(tmp_path / "t")).append(mk([(3, 3)]))
    # deterministic race: commit pinned to the stale base
    with pytest.raises(ConcurrentWriteError):
        t._commit(
            "restore", [], t.snapshot_meta(1).schema_json, None, None,
            replaced=tuple(sorted(set(base.files) - set(t.snapshot_meta(1).files))),
            expected_base=base.version,
        )


def test_restore_fails_fast_on_vacuumed_files(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "t"))
    mk = lambda rows: spark.createDataFrame(rows, "id int, v int").coalesce(1)
    t.append(mk([(1, 1)]))
    t.overwrite(mk([(2, 2)]))
    t.vacuum(keep_versions=1)
    with pytest.raises(FileNotFoundError):
        t.restore(1)
    assert t.latest_version() == 2  # nothing committed


def test_restore_validates_against_current_constraints(spark, tmp_path):
    """A constraint added AFTER the target version still guards the
    files a restore re-introduces."""
    from etl_data_lake_spark.sources.txn import ConstraintViolationError

    t = TxnTable(spark, str(tmp_path / "t"))
    mk = lambda rows: spark.createDataFrame(rows, "id int, v int").coalesce(1)
    t.append(mk([(1, -1)]))                      # v1: negative row
    t.delete_where("id", 1, 1)                   # v2: gone
    t.append(mk([(2, 5)]))                       # v3
    t.add_constraint("v_pos", "v > 0")           # v4: valid now
    with pytest.raises(ConstraintViolationError):
        t.restore(1)                             # would resurrect v=-1
    assert t.latest_version() == 4


def test_restore_keeps_writer_watermarks(spark, tmp_path):
    """Exactly-once watermarks survive a restore: a replayed txn_seq
    still no-ops afterwards."""
    t = TxnTable(spark, str(tmp_path / "t"))
    mk = lambda rows: spark.createDataFrame(rows, "id int, v int").coalesce(1)
    t.append(mk([(1, 1)]), app_id="s", txn_seq=0)
    t.append(mk([(2, 2)]), app_id="s", txn_seq=1)
    t.restore(1)
    v = t.latest_version()
    # replay of seq 1 must NOT re-apply after the rollback
    assert t.append(mk([(2, 2)]), app_id="s", txn_seq=1) == v
    assert sorted(r.id for r in t.snapshot().collect()) == [1]


def test_constraint_duckdb_fallback_matches_spark_semantics(spark, tmp_path):
    """The session-less validation path (txnlake writer commits) must
    agree with the Spark path: FALSE violates, UNKNOWN (null) passes,
    column mapping resolves, absent columns read null."""
    from etl_data_lake_spark.sources.txn import ConstraintViolationError

    t = TxnTable(spark, str(tmp_path / "t"))
    mk = lambda rows, s="id int, v int": spark.createDataFrame(rows, s).coalesce(1)
    t.append(mk([(1, 5), (2, None)]))  # null v: UNKNOWN passes
    t.rename_column("v", "val")
    staged, schema_json, _ = t._stage(
        spark.createDataFrame([(3, 7), (4, None)], "id int, val int")
    )
    meta = t.snapshot_meta()
    sessionless = TxnTable(None, str(tmp_path / "t"))
    # passing set: no raise from either engine
    for handle in (t, sessionless):
        handle._enforce_constraints(
            staged, schema_json, {"pos": "val > 0"}, meta.column_map
        )
    # violating set: both engines raise with the same count
    staged_bad, schema_bad, _ = t._stage(
        spark.createDataFrame([(5, -1), (6, -2)], "id int, val int")
    )
    for handle in (t, sessionless):
        with pytest.raises(ConstraintViolationError, match="2"):
            handle._enforce_constraints(
                staged_bad, schema_bad, {"pos": "val > 0"}, meta.column_map
            )
    # a constraint on a column the staged files LACK evaluates null
    from pyspark.sql.types import IntegerType
    wider = meta.schema().add("extra", IntegerType()).json()
    for handle in (t, sessionless):
        handle._enforce_constraints(
            staged, wider, {"x": "extra > 0"}, meta.column_map
        )  # UNKNOWN everywhere: passes in both engines
