"""Deletion vectors (merge-on-read deletes) on txn tables.

delete_where_mor records deleted ROW POSITIONS in per-file sidecars
instead of rewriting files (Delta's deletion vectors / Iceberg's
position deletes). These tests pin the full lifecycle: reads on every
path, idempotent unions, exactly-once replay, rewrite retirement
(compact/COW/merge), CDF visibility, time travel + restore, vacuum,
checkpoint survival, and the concurrency rules that keep two racing
deletes from losing rows.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_data_lake_spark.sources.merge import merge_into
from etl_data_lake_spark.sources.txn import ConcurrentWriteError, TxnTable


def _mk(spark, rows):
    return spark.createDataFrame(rows, "id int, v string").coalesce(1)


def _ids(df):
    return sorted(r.id for r in df.select("id").collect())


def _table(spark, path):
    """Two files: ids 0..4 and 100..104, stats on id."""
    t = TxnTable(spark, path)
    t.append(_mk(spark, [(i, f"a{i}") for i in range(5)]), stats_cols=("id",))
    t.append(
        _mk(spark, [(100 + i, f"b{i}") for i in range(5)]),
        stats_cols=("id",),
    )
    return t


def test_mor_delete_hides_rows_without_rewriting(spark, tmp_path):
    t = _table(spark, str(tmp_path / "t"))
    files_before = set(t.snapshot_meta().files)
    v = t.delete_where_mor("id", 1, 2)
    meta = t.snapshot_meta()
    # NO file was rewritten — only a vector was attached
    assert set(meta.files) == files_before
    assert len(meta.file_dvs) == 1
    assert _ids(t.snapshot()) == [0, 3, 4, 100, 101, 102, 103, 104]
    assert t.history()[-1]["operation"] == "delete"
    assert t.history()[-1]["params"]["mor"] is True
    # time travel: the pre-delete snapshot still shows the rows
    assert len(_ids(t.snapshot(v - 1))) == 10
    # every pruned read path applies the vector
    assert _ids(t.snapshot_where("id", 0, 10)) == [0, 3, 4]
    assert t.snapshot_where_ranges({"id": (1, 1)}).count() == 0
    assert _ids(t.snapshot_where_any("id", [(1, 3)])) == [3]
    assert t.snapshot_where_null("id", is_null=False).count() == 8


def test_mor_delete_union_replay_and_noop(spark, tmp_path):
    t = _table(spark, str(tmp_path / "t"))
    v1 = t.delete_where_mor("id", 1, 1, app_id="d", txn_seq=0)
    # replay of the same txn seq: no-op, no new commit
    assert t.delete_where_mor("id", 1, 1, app_id="d", txn_seq=0) == v1
    # overlapping second delete UNIONS into a new vector
    v2 = t.delete_where_mor("id", 1, 3, app_id="d", txn_seq=1)
    assert v2 == v1 + 1
    assert _ids(t.snapshot()) == [0, 4, 100, 101, 102, 103, 104]
    # deleting already-deleted rows only: nothing new, no commit
    assert t.delete_where_mor("id", 2, 3) == v2
    # disjoint range: no files affected, no commit
    assert t.delete_where_mor("id", 500, 600) == v2


def test_mor_delete_rewrites_retire_vectors(spark, tmp_path):
    t = _table(spark, str(tmp_path / "t"))
    t.delete_where_mor("id", 1, 2)
    # compaction applies the vector physically and retires it
    t.compact(target_files=1, stats_cols=("id",))
    meta = t.snapshot_meta()
    assert meta.file_dvs == {}
    assert _ids(t.snapshot()) == [0, 3, 4, 100, 101, 102, 103, 104]
    # vacuum now reclaims the orphaned DV document
    removed = t.vacuum(keep_versions=1)
    assert removed >= 1
    assert _ids(t.snapshot()) == [0, 3, 4, 100, 101, 102, 103, 104]


def test_mor_delete_then_cow_ops_compose(spark, tmp_path):
    t = _table(spark, str(tmp_path / "t"))
    t.delete_where_mor("id", 1, 1)
    # COW delete on the SAME file must not resurrect id=1
    t.delete_where("id", 2, 2, stats_cols=("id",))
    assert _ids(t.snapshot()) == [0, 3, 4, 100, 101, 102, 103, 104]
    # the rewrite retired the file's vector
    assert t.snapshot_meta().file_dvs == {}
    # update_where after a fresh MOR delete skips deleted rows
    t.delete_where_mor("id", 3, 3)
    t.update_where("id", 0, 10, {"v": "'U'"}, stats_cols=("id",))
    got = {r.id: r.v for r in t.snapshot().collect()}
    assert 3 not in got and 1 not in got
    assert got[0] == "U" and got[4] == "U" and got[100] == "b0"


def test_mor_delete_merge_does_not_resurrect(spark, tmp_path):
    t = _table(spark, str(tmp_path / "t"))
    t.delete_where_mor("id", 1, 1)
    # a merge keyed on the deleted id must INSERT (no hidden match),
    # and the untouched deleted row must stay deleted
    res = merge_into(
        t, _mk(spark, [(1, "NEW"), (4, "UPD")]), "id", stats_cols=("id",)
    )
    assert res.committed
    got = {r.id: r.v for r in t.snapshot().collect()}
    assert got[1] == "NEW" and got[4] == "UPD" and got[0] == "a0"
    assert t.snapshot().count() == 10  # 9 survivors + 1 insert


def test_mor_delete_cdf_visibility(spark, tmp_path):
    from etl_data_lake_spark.sources.cdf import changes_between

    t = _table(spark, str(tmp_path / "t"))
    v = t.delete_where_mor("id", 1, 2)
    ch = t.table_changes(v - 1, v)
    rows = sorted((r.id, r._change_type) for r in ch.collect())
    assert rows == [(1, "delete"), (2, "delete")]
    # per-commit attribution through the consumer path too
    ch2 = changes_between(t, v - 1, v)
    rows2 = sorted(
        (r.id, r._change_type, r._commit_version) for r in ch2.collect()
    )
    assert rows2 == [(1, "delete", v), (2, "delete", v)]
    # and a span covering the appends + the MOR delete nets correctly
    net = changes_between(t, 0, v)
    assert net.where("_change_type = 'insert'").count() == 10
    assert net.where("_change_type = 'delete'").count() == 2


def test_mor_delete_restore_resurrects(spark, tmp_path):
    t = _table(spark, str(tmp_path / "t"))
    pre = t.latest_version()
    t.delete_where_mor("id", 1, 3)
    assert len(_ids(t.snapshot())) == 7
    t.restore(pre)
    # the restore cleared the vector on the still-live file
    assert t.snapshot_meta().file_dvs == {}
    assert len(_ids(t.snapshot())) == 10
    # and restoring BACK to the post-delete version re-applies it
    t.restore(pre + 1)
    assert _ids(t.snapshot()) == [0, 4, 100, 101, 102, 103, 104]


def test_mor_delete_concurrency_rules(spark, tmp_path):
    t = _table(spark, str(tmp_path / "t"))
    t.delete_where_mor("id", 1, 1)
    meta = t.snapshot_meta()
    f = next(iter(meta.file_dvs))
    # (a) a second DV commit that unioned against a STALE vector:
    # expected-DV mismatch -> conflict, not lost deletes
    with pytest.raises(ConcurrentWriteError):
        t._commit(
            "delete", [], meta.schema_json, None, None,
            dv_updates={f: "_dv/bogus.json"},
            expected_dvs={f: None},  # stale: a vector exists now
        )
    # (b) the target file was rewritten concurrently -> conflict
    with pytest.raises(ConcurrentWriteError):
        t._commit(
            "delete", [], meta.schema_json, None, None,
            dv_updates={"data/gone/part-0.parquet": "_dv/bogus.json"},
            expected_dvs={"data/gone/part-0.parquet": None},
        )
    # (c) the public API retries from fresh state and succeeds
    assert t.delete_where_mor("id", 2, 2) == meta.version + 1
    assert _ids(t.snapshot()) == [0, 3, 4, 100, 101, 102, 103, 104]


def test_mor_delete_checkpoint_survival(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "t"), checkpoint_interval=4)
    t.append(_mk(spark, [(i, f"a{i}") for i in range(5)]), stats_cols=("id",))
    t.delete_where_mor("id", 1, 1)
    for i in range(6):  # cross a checkpoint boundary
        t.append(_mk(spark, [(50 + i, "x")]), stats_cols=("id",))
    assert t.read_plan().checkpoint > 0
    t2 = TxnTable(spark, str(tmp_path / "t"), checkpoint_interval=4)
    assert len(t2.snapshot_meta().file_dvs) == 1
    assert 1 not in _ids(t2.snapshot())


def test_mor_delete_bounds_and_bloom_read(spark, tmp_path):
    from etl_data_lake_spark.sources.bloomindex import (
        build_bloom_index,
        snapshot_where_eq,
    )

    t = _table(spark, str(tmp_path / "t"))
    with pytest.raises(ValueError):
        t.delete_where_mor("id", 0, 1000, max_dv_rows=3)
    t.delete_where_mor("id", 1, 1)
    build_bloom_index(t, ("id",))
    assert snapshot_where_eq(t, "id", [1]).count() == 0
    assert snapshot_where_eq(t, "id", [0, 100]).count() == 2


def test_mor_update_appends_and_vectors(spark, tmp_path):
    t = _table(spark, str(tmp_path / "t"))
    files_before = set(t.snapshot_meta().files)
    v = t.update_where_mor(
        "id", 1, 2, {"v": "concat(v, '!')"}, stats_cols=("id",)
    )
    meta = t.snapshot_meta()
    # original files untouched; ONE new file (the updated rows) added
    assert files_before <= set(meta.files)
    assert len(set(meta.files) - files_before) == 1
    assert len(meta.file_dvs) == 1
    got = {r.id: r.v for r in t.snapshot().collect()}
    assert got[1] == "a1!" and got[2] == "a2!" and got[0] == "a0"
    assert t.snapshot().count() == 10  # no dup, no loss
    assert t.history()[-1]["operation"] == "update"
    assert t.history()[-1]["params"]["mor"] is True
    # time travel pre-update intact
    assert {r.v for r in t.snapshot(v - 1).collect()} >= {"a1", "a2"}
    # updating again composes (reads DV-applied: no resurrect/dup)
    t.update_where_mor("id", 1, 1, {"v": "upper(v)"}, stats_cols=("id",))
    got = {r.id: r.v for r in t.snapshot().collect()}
    assert got[1] == "A1!" and t.snapshot().count() == 10
    # CDF sees the update as delete + insert
    ch = sorted(
        (r.id, r.v, r._change_type)
        for r in t.table_changes(v - 1, v).collect()
    )
    assert ch == [
        (1, "a1", "delete"), (1, "a1!", "insert"),
        (2, "a2", "delete"), (2, "a2!", "insert"),
    ]


def test_mor_update_noop_validation_replay(spark, tmp_path):
    t = _table(spark, str(tmp_path / "t"))
    v = t.latest_version()
    assert t.update_where_mor("id", 500, 600, {"v": "'x'"}) == v
    with pytest.raises(ValueError):
        t.update_where_mor("id", 0, 1, {"nope": "'x'"})
    with pytest.raises(ValueError):
        t.update_where_mor("id", 0, 1, {})
    v1 = t.update_where_mor(
        "id", 0, 0, {"v": "concat(v, '+')"}, app_id="u", txn_seq=0
    )
    assert t.update_where_mor(
        "id", 0, 0, {"v": "concat(v, '+')"}, app_id="u", txn_seq=0
    ) == v1
    assert {r.v for r in t.snapshot().where("id = 0").collect()} == {"a0+"}
    # compaction applies + retires everything
    t.compact(target_files=1, stats_cols=("id",))
    assert t.snapshot_meta().file_dvs == {}
    assert t.snapshot().count() == 10


def test_mor_merge_vectors_instead_of_rewrites(spark, tmp_path):
    t = _table(spark, str(tmp_path / "t"))
    files_before = set(t.snapshot_meta().files)
    res = merge_into(
        t, _mk(spark, [(1, "U1"), (101, "U101"), (999, "NEW")]), "id",
        stats_cols=("id",), mor=True,
    )
    assert res.committed and res.files_rewritten == 0
    assert res.files_vectored == 2  # one vector per touched file
    meta = t.snapshot_meta()
    # originals untouched (nothing replaced), small append, two vectors
    assert files_before <= set(meta.files)
    assert 1 <= len(set(meta.files) - files_before) <= 3
    assert len(meta.file_dvs) == 2
    got = {r.id: r.v for r in t.snapshot().collect()}
    assert got[1] == "U1" and got[101] == "U101" and got[999] == "NEW"
    assert got[0] == "a0" and t.snapshot().count() == 11
    assert t.history()[-1]["params"]["mor"] is True
    # equivalent COW merge on a twin table gives identical rows
    t2 = _table(spark, str(tmp_path / "t2"))
    merge_into(
        t2, _mk(spark, [(1, "U1"), (101, "U101"), (999, "NEW")]), "id",
        stats_cols=("id",),
    )
    assert sorted((r.id, r.v) for r in t.snapshot().collect()) == sorted(
        (r.id, r.v) for r in t2.snapshot().collect()
    )


def test_mor_merge_delete_clause_and_condition(spark, tmp_path):
    t = _table(spark, str(tmp_path / "t"))
    # delete-only MOR merge: zero staged files, vectors carry it all
    res = merge_into(
        t, _mk(spark, [(1, None), (3, None)]), "id",
        when_matched="delete", when_not_matched=None,
        stats_cols=("id",), mor=True,
    )
    assert res.committed and res.files_rewritten == 0
    assert res.files_vectored == 1
    assert _ids(t.snapshot()) == [0, 2, 4, 100, 101, 102, 103, 104]
    # matched_condition gates the vectoring: only v='a2' qualifies
    res = merge_into(
        t, _mk(spark, [(2, "x"), (4, "x")]), "id",
        when_matched="delete", when_not_matched=None,
        matched_condition="t.v = 'a2'",
        stats_cols=("id",), mor=True,
    )
    assert res.committed
    assert _ids(t.snapshot()) == [0, 4, 100, 101, 102, 103, 104]


def test_mor_merge_bound_and_compaction_roundtrip(spark, tmp_path):
    t = _table(spark, str(tmp_path / "t"))
    with pytest.raises(ValueError):
        merge_into(
            t, _mk(spark, [(i, "x") for i in range(5)]), "id",
            stats_cols=("id",), mor=True, max_dv_rows=2,
        )
    merge_into(
        t, _mk(spark, [(0, "Z")]), "id", stats_cols=("id",), mor=True
    )
    t.compact(target_files=1, stats_cols=("id",))
    assert t.snapshot_meta().file_dvs == {}
    got = {r.id: r.v for r in t.snapshot().collect()}
    assert got[0] == "Z" and t.snapshot().count() == 10


def test_purge_vectors_rewrites_only_heavy_files(spark, tmp_path):
    t = _table(spark, str(tmp_path / "t"))
    # file A: 3/5 rows deleted (60%); file B: 1/5 (20%)
    t.delete_where_mor("id", 1, 3)
    t.delete_where_mor("id", 100, 100)
    files_before = set(t.snapshot_meta().files)
    v = t.purge_vectors(min_deleted_ratio=0.5, stats_cols=("id",))
    meta = t.snapshot_meta()
    assert v == meta.version
    # only the 60% file was rewritten; the 20% one keeps its vector
    assert len(files_before & set(meta.files)) == 1
    assert len(meta.file_dvs) == 1
    assert _ids(t.snapshot()) == [0, 4, 101, 102, 103, 104]
    # ratio 0 purges everything
    t.purge_vectors(min_deleted_ratio=0.0, stats_cols=("id",))
    assert t.snapshot_meta().file_dvs == {}
    assert _ids(t.snapshot()) == [0, 4, 101, 102, 103, 104]
    # idempotent: nothing left to purge, no commit
    assert t.purge_vectors() == t.latest_version()


def test_read_files_fast_path_has_no_join(spark, tmp_path):
    """The zero-overhead claim, pinned in the plan: without deletion
    vectors, read_files plans a plain scan (no Join, no _metadata
    projection); with one, the anti join appears."""
    t = _table(spark, str(tmp_path / "t"))
    plan = t.snapshot()._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    t.delete_where_mor("id", 1, 1)
    plan = t.snapshot()._jdf.queryExecution().executedPlan().toString()
    assert "Join" in plan


def test_metadata_tables(spark, tmp_path):
    t = _table(spark, str(tmp_path / "t"))
    t.delete_where_mor("id", 1, 1)
    files = {r.path: r for r in t.files_df().collect()}
    assert len(files) == 2
    dv_rows = [r for r in files.values() if r.dv_path is not None]
    assert len(dv_rows) == 1 and dv_rows[0].dv_deleted_rows == 1
    assert all(r.size_bytes > 0 and r.num_rows == 5 for r in files.values())
    assert all(r.stats["id"][0] is not None for r in files.values())

    hist = t.history_df().collect()
    assert [r.operation for r in hist] == ["append", "append", "delete"]
    assert hist[-1].n_added == 0 and hist[-1].n_removed == 0
    assert '"mor": true' in hist[-1].params

    d = t.detail()
    assert d["version"] == 3 and d["num_files"] == 2
    assert d["num_deletion_vectors"] == 1
    assert d["size_bytes"] > 0 and "id" in d["schema"]


def test_cow_rewrite_conflicts_with_concurrent_mor_delete(spark, tmp_path):
    """The lost-update race: a rewrite built from a base WITHOUT a
    vector must conflict when a MOR delete lands before it publishes —
    otherwise the rewrite resurrects the deleted rows and drops the
    vector. (Self-review finding, round 4 part 3.)"""
    path = str(tmp_path / "t")
    t = _table(spark, path)
    base = t.snapshot_meta()
    # the rewrite is BUILT from `base` (no vectors yet)
    staged, _sj, stats = t._stage(t.read_files(base, list(base.files)), ("id",))
    # concurrent MOR delete lands in between
    TxnTable(spark, path).delete_where_mor("id", 1, 1)
    with pytest.raises(ConcurrentWriteError):
        t._commit(
            "compact", staged, base.schema_json, None, None,
            replaced=base.files, staged_stats=stats,
            expected_dvs={f: base.file_dvs.get(f) for f in base.files},
        )
    # the delete survived
    assert 1 not in _ids(t.snapshot())
    # and a fresh rewrite from CURRENT state succeeds and retires it
    t.compact(target_files=1, stats_cols=("id",))
    assert 1 not in _ids(t.snapshot()) and t.snapshot_meta().file_dvs == {}


def test_cdf_empty_for_compaction_of_mor_deleted_file(spark, tmp_path):
    """Compacting a file whose rows were already MOR-deleted is a pure
    layout change: the incremental consumer must see NOTHING at the
    compact version (the removed side reads with its before-vector)."""
    from etl_data_lake_spark.sources.cdf import changes_between

    t = _table(spark, str(tmp_path / "t"))
    t.delete_where_mor("id", 1, 2)
    v_before = t.latest_version()
    t.compact(target_files=1, stats_cols=("id",))
    ch = changes_between(t, v_before, t.latest_version())
    assert ch.count() == 0


def test_bloom_no_false_negative_after_restore(spark, tmp_path):
    """Sidecars are built from the RAW file, so a restore that clears
    a vector cannot leave a stale filter missing resurrected values."""
    from etl_data_lake_spark.sources.bloomindex import (
        build_bloom_index,
        snapshot_where_eq,
    )

    t = _table(spark, str(tmp_path / "t"))
    pre = t.latest_version()
    t.delete_where_mor("id", 1, 1)
    build_bloom_index(t, ("id",))  # built while the vector is active
    assert snapshot_where_eq(t, "id", [1]).count() == 0
    t.restore(pre)  # clears the vector; sidecar survives
    assert snapshot_where_eq(t, "id", [1]).count() == 1


def test_restore_blocked_by_constraint_on_later_column(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "t"))
    t.append(_mk(spark, [(1, "a")]))
    pre = t.latest_version()
    t.append(
        spark.createDataFrame([(2, "b", 5)], "id int, v string, c int")
    )
    t.add_constraint("c_pos", "c > 0")
    with pytest.raises(ValueError):
        t.restore(pre)  # pre-c schema cannot host the constraint
    t.drop_constraint("c_pos")
    t.restore(pre)
    assert t.snapshot().columns == ["id", "v"]


def test_mor_update_multi_range_touches_only_intersecting_files(
    spark, tmp_path
):
    """update_where_mor_ranges (round-4 verdict #8): a scattered
    multi-range update vectors only the intersecting files; the
    middle file keeps its bytes, stats, and no sidecar; CDF sees
    delete+insert per updated row."""
    t = TxnTable(spark, str(tmp_path / "t"))
    t.append(_mk(spark, [(i, f"a{i}") for i in range(3)]), stats_cols=("id",))
    t.append(
        _mk(spark, [(50 + i, f"m{i}") for i in range(3)]),
        stats_cols=("id",),
    )
    t.append(
        _mk(spark, [(100 + i, f"b{i}") for i in range(3)]),
        stats_cols=("id",),
    )
    before = list(t.snapshot_meta().files)
    v = t.update_where_mor_ranges(
        "id",
        [(1, 1), (101, 101)],
        {"v": "upper(v)"},
        stats_cols=("id",),
    )
    meta = t.snapshot_meta()
    # original files all still live (plus the appended update file)
    assert set(before) <= set(meta.files)
    # vectors only on the two intersecting files; middle untouched
    assert len(meta.file_dvs) == 2
    middle = [f for f in before if meta.file_stats[f]["id"][0] == 50][0]
    assert middle not in meta.file_dvs
    rows = {r.id: r.v for r in t.snapshot().collect()}
    assert rows[1] == "A1" and rows[101] == "B1" and rows[50] == "m0"
    assert len(rows) == 9
    ch = t.table_changes(v - 1, v)
    kinds = sorted(
        (r.id, r._change_type)
        for r in ch.select("id", "_change_type").collect()
    )
    assert kinds == [
        (1, "delete"), (1, "insert"), (101, "delete"), (101, "insert"),
    ]


def test_mor_update_multi_range_validation_and_replay(spark, tmp_path):
    t = _table(spark, str(tmp_path / "t"))
    with pytest.raises(ValueError, match="range"):
        t.update_where_mor_ranges("id", [], {"v": "'x'"})
    v1 = t.update_where_mor_ranges(
        "id", [(0, 0), (104, 104)], {"v": "'U'"},
        app_id="u", txn_seq=1,
    )
    v2 = t.update_where_mor_ranges(
        "id", [(1, 1)], {"v": "'W'"}, app_id="u", txn_seq=1,
    )
    assert v1 == v2  # replayed
    rows = {r.id: r.v for r in t.snapshot().collect()}
    assert rows[0] == "U" and rows[104] == "U" and rows[1] == "a1"
