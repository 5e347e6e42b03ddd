"""Incremental MOR-aware OPTIMIZE ZORDER (round-4 verdict #7):
frozen-spec Morton keys, z-interval component selection, pruning on
the reclustered table, deletion-vector retirement, idempotency."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_data_lake_spark.sources.txn import TxnTable


def _grid(spark, x0, x1, y0, y1, tag):
    rows = [
        (x, y, f"{tag}-{x}-{y}")
        for x in range(x0, x1)
        for y in range(y0, y1)
    ]
    return spark.createDataFrame(rows, "x int, y int, v string").coalesce(1)


def _rows(t):
    return sorted(
        (r.x, r.y, r.v) for r in t.snapshot().select("x", "y", "v").collect()
    )


def test_first_optimize_clusters_prunes_and_freezes_spec(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "t"))
    # 4 appends each spanning the FULL x range: no append-level file
    # ever prunes an x predicate before clustering
    for i in range(4):
        t.append(_grid(spark, 0, 16, 4 * i, 4 * i + 4, f"a{i}"),
                 stats_cols=("x", "y"))
    before = _rows(t)
    keep_before, total_before = t.files_matching({"x": (0, 1)})
    assert len(keep_before) == total_before  # nothing prunes yet
    t.optimize_zorder(("x", "y"), bits=4)
    assert _rows(t) == before  # pure layout change
    meta = t.snapshot_meta()
    assert meta.zorder_spec["cols"] == ["x", "y"]
    # every file now carries a _z footer range in the manifest
    assert all(
        meta.file_stats.get(f, {}).get("_z") is not None
        for f in meta.files
    )
    keep, total = t.files_matching({"x": (0, 1)})
    assert len(keep) < total  # clustering made x-pruning real
    keep_y, _ = t.files_matching({"y": (0, 1)})
    assert len(keep_y) < total  # and y-pruning too (the z-order point)
    # _z never leaks into the logical schema
    assert "_z" not in meta.schema().fieldNames()
    assert t.snapshot().columns == ["x", "y", "v"]


def test_optimize_zorder_idempotent_and_incremental(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "t"))
    for i in range(4):
        t.append(_grid(spark, 0, 16, 4 * i, 4 * i + 4, f"a{i}"),
                 stats_cols=("x", "y"))
    v1 = t.optimize_zorder(("x", "y"), bits=4)
    assert t.optimize_zorder(("x", "y"), bits=4) == v1  # no-op
    clustered_files = set(t.snapshot_meta().files)
    # a NARROW corner append overlaps only part of the curve
    t.append(_grid(spark, 0, 2, 0, 2, "new"), stats_cols=("x", "y"))
    t.optimize_zorder(("x", "y"), bits=4)
    after = set(t.snapshot_meta().files)
    survivors = clustered_files & after
    assert survivors  # disjoint runs kept their bytes
    assert len(after - clustered_files) >= 1  # the touched run rewrote
    # and the result still prunes + kept every row
    keep, total = t.files_matching({"x": (15, 15)})
    assert len(keep) < total
    assert len(_rows(t)) == 16 * 16 + 4


def test_optimize_zorder_applies_and_retires_deletion_vectors(
    spark, tmp_path
):
    t = TxnTable(spark, str(tmp_path / "t"))
    for i in range(2):
        t.append(_grid(spark, 0, 8, 4 * i, 4 * i + 4, f"a{i}"),
                 stats_cols=("x", "y"))
    t.delete_where_mor("x", 3, 3)  # vectors 8 rows across both files
    assert t.snapshot_meta().file_dvs
    expect = [(x, y, v) for x, y, v in _rows(t)]
    assert all(x != 3 for x, _, _ in expect)
    t.optimize_zorder(("x", "y"), bits=4)
    meta = t.snapshot_meta()
    assert not meta.file_dvs  # applied physically, retired
    assert _rows(t) == expect  # nothing resurrected, nothing lost


def test_optimize_zorder_validation(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "t"))
    t.append(_grid(spark, 0, 2, 0, 2, "a"), stats_cols=("x",))
    with pytest.raises(ValueError, match="cluster column"):
        t.optimize_zorder(("ghost",))
    with pytest.raises(ValueError, match=">= 1"):
        t.optimize_zorder(())
    t.optimize_zorder(("x", "y"), bits=4)
    with pytest.raises(ValueError, match="z-ordered on"):
        t.optimize_zorder(("y",))
    t2 = TxnTable(spark, str(tmp_path / "z"))
    t2.append(
        spark.createDataFrame([(1, 2)], "a int, _z long").coalesce(1)
    )
    with pytest.raises(ValueError, match="_z"):
        t2.optimize_zorder(("a",))


def test_optimize_zorder_string_column(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "t"))
    rows = [(i, chr(ord("a") + i % 26) * 3) for i in range(200)]
    df = spark.createDataFrame(rows, "id int, name string")
    t.append(df.repartition(4), stats_cols=("id", "name"))
    before = sorted(
        (r.id, r.name) for r in t.snapshot().select("id", "name").collect()
    )
    t.optimize_zorder(("id", "name"), bits=4)
    after = sorted(
        (r.id, r.name) for r in t.snapshot().select("id", "name").collect()
    )
    assert after == before
    keep, total = t.files_matching({"name": ("aaa", "bbb")})
    assert len(keep) < total  # order-preserving string buckets prune


def test_append_clustered_lands_on_curve(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "t"))
    for i in range(2):
        t.append(_grid(spark, 0, 16, 8 * i, 8 * i + 8, f"a{i}"),
                 stats_cols=("x", "y"))
    t.optimize_zorder(("x", "y"), bits=4)
    v_clustered = set(t.snapshot_meta().files)
    # clustered append: new files carry _z stats immediately
    t.append_clustered(
        _grid(spark, 0, 16, 0, 16, "n"), n_files=4, stats_cols=("x", "y")
    )
    meta = t.snapshot_meta()
    new_files = set(meta.files) - v_clustered
    assert len(new_files) >= 2
    assert all(
        meta.file_stats.get(f, {}).get("_z") is not None
        for f in new_files
    )
    assert "_z" not in meta.schema().fieldNames()
    # next optimize treats them as clustered: it merges overlaps (the
    # new batch spans the whole grid) without a from-scratch re-range
    # of an unclustered set — i.e. no file is in the "must" set
    t.optimize_zorder(("x", "y"), bits=4)
    assert len(sorted((r.x, r.y, r.v) for r in t.snapshot().collect())) \
        == 16 * 16 * 2


def test_append_clustered_requires_spec_and_rejects_identity(
    spark, tmp_path
):
    t = TxnTable(spark, str(tmp_path / "t"))
    t.append(_grid(spark, 0, 2, 0, 2, "a"), stats_cols=("x",))
    with pytest.raises(ValueError, match="zorder_spec"):
        t.append_clustered(_grid(spark, 0, 2, 0, 2, "b"))
    t.optimize_zorder(("x", "y"), bits=4)
    with pytest.raises(ValueError, match="cluster columns"):
        t.append_clustered(
            spark.createDataFrame([(1,)], "x int")
        )


def test_analyze_stats_backfills_pruning(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "t"))
    # appends WITHOUT stats: nothing prunes
    t.append(_grid(spark, 0, 4, 0, 4, "a"))
    t.append(_grid(spark, 100, 104, 0, 4, "b"))
    keep, total = t.files_matching({"x": (0, 1)})
    assert len(keep) == total
    v = t.analyze_stats(("x", "y"))
    keep, total = t.files_matching({"x": (0, 1)})
    assert len(keep) < total  # retroactive pruning
    assert t.history()[-1]["operation"] == "stats"
    # idempotent no-op when nothing is missing
    assert t.analyze_stats(("x", "y")) == v
    # merge, not replace: add stats for v later, x entries survive
    t2 = TxnTable(spark, str(tmp_path / "u"))
    t2.append(_grid(spark, 0, 4, 0, 4, "a"))
    t2.analyze_stats(("x",))
    t2.analyze_stats(("v",))
    st = t2.snapshot_meta().file_stats
    f = list(st)[0]
    assert "x" in st[f] and "v" in st[f]
    with pytest.raises(ValueError, match="unknown"):
        t.analyze_stats(("ghost",))


def test_snapshot_where_expr_reads_with_hints(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "t"))
    t.append(_grid(spark, 0, 4, 0, 4, "a"), stats_cols=("x",))
    t.append(_grid(spark, 100, 104, 0, 4, "b"), stats_cols=("x",))
    got = sorted(
        (r.x, r.y)
        for r in t.snapshot_where_expr(
            "x >= 100 AND y < 2", prune_hints={"x": [(100, 200)]}
        ).collect()
    )
    want = [(x, y) for x in range(100, 104) for y in range(2)]
    assert got == want
    # nondeterministic predicates are allowed on the read side
    n = t.snapshot_where_expr("rand() >= 0").count()
    assert n == 32


def test_optimize_zorder_rebases_over_concurrent_append(spark, tmp_path):
    """Compaction conflict rules apply: an append landing between
    selection and publish rebases cleanly; its (unclustered) file
    survives and the NEXT optimize folds it in."""
    path = str(tmp_path / "t")
    t = TxnTable(spark, path)
    for i in range(3):
        t.append(_grid(spark, 0, 8, 2 * i, 2 * i + 2, f"a{i}"),
                 stats_cols=("x", "y"))
    # drive the optimize by hand against a pre-race snapshot
    from etl_data_lake_spark.sources.sinks import (
        compute_zorder_spec,
        zorder_key_with_spec,
    )

    base = t.snapshot_meta()
    spec = compute_zorder_spec(t.snapshot(base.version), ("x", "y"), 4)
    clustered = (
        zorder_key_with_spec(t.read_files(base, list(base.files)), spec)
        .repartitionByRange(3, F.col("_z"))
        .sortWithinPartitions("_z")
    )
    staged, _sj, stats = t._stage(clustered, ("x", "y", "_z"))
    late = _grid(spark, 0, 8, 6, 8, "late")
    TxnTable(spark, path).append(late, stats_cols=("x", "y"))
    v = t._commit(
        "compact", staged, base.schema().json(), None, None,
        replaced=tuple(base.files),
        expected_dvs={f: None for f in base.files},
        staged_stats=stats, zorder_spec=spec,
    )
    assert v == base.version + 2  # rebased over the append
    assert len(_rows(t)) == 8 * 6 + 8 * 2
    # the late file is unclustered; the next optimize folds it in
    t.optimize_zorder(("x", "y"), bits=4)
    meta = t.snapshot_meta()
    assert all(
        meta.file_stats.get(f, {}).get("_z") is not None
        for f in meta.files
    )
    assert len(_rows(t)) == 8 * 6 + 8 * 2


def test_restore_keeps_identity_watermark_and_respec_safe(spark, tmp_path):
    """RESTORE pins file/schema state; identity and zorder metadata
    ride FORWARD (the newest watermark can only over-allocate, never
    collide — and a stale spec would mis-compare z ranges)."""
    t = TxnTable(spark, str(tmp_path / "t"))
    t.append(
        spark.createDataFrame([("a",)], "v string").coalesce(1)
    )
    t.add_identity_column("pk")
    t.append(spark.createDataFrame([("b",)], "v string").coalesce(1))
    t.append(spark.createDataFrame([("c",)], "v string").coalesce(1))
    high = t.snapshot_meta().identity["pk"]["high"]
    v_before_c = t.latest_version() - 1
    t.restore(v_before_c)
    meta = t.snapshot_meta()
    # watermark kept (>= the pre-restore high): new ids never collide
    # with the rolled-away version's rows even if restored forward
    assert meta.identity["pk"]["high"] == high
    t.append(spark.createDataFrame([("d",)], "v string").coalesce(1))
    ids = [r.pk for r in t.snapshot().select("pk").collect()
           if r.pk is not None]
    assert len(ids) == len(set(ids))
    assert max(ids) > high


def test_analyze_stats_cdf_and_convergence(spark, tmp_path):
    """Second-review pins: (a) a 'stats' commit is transparent to the
    CDF/file-diff machinery (it used to raise unknown-operation);
    (b) ANALYZE converges to a no-op even when a column's footers
    cannot answer (column younger than the file), instead of growing
    the log forever."""
    t = TxnTable(spark, str(tmp_path / "t"))
    t.append(_grid(spark, 0, 4, 0, 4, "a"))
    v0 = t.latest_version()
    v1 = t.analyze_stats(("x",))
    assert v1 > v0
    # (a) CDF spans crossing the stats version: empty feed, no crash
    assert t.table_changes(v0, v1).count() == 0
    assert t.file_diffs(v0, v1) == [] or all(
        not added and not removed for _v, added, removed in t.file_diffs(v0, v1)
    )
    # (b) evolve a column the old file's footer cannot answer
    t.append(
        spark.createDataFrame(
            [(999, 999, "n", 7)], "x int, y int, v string, extra int"
        ).coalesce(1)
    )
    v2 = t.analyze_stats(("extra",))  # new file gains stats
    assert t.analyze_stats(("extra",)) == v2  # old file can't: no-op
    assert t.latest_version() == v2


def test_zorder_spec_follows_rename_and_drop(spark, tmp_path):
    """Schema evolution vs the frozen curve: renaming a cluster
    column renames it inside the spec (the curve keeps working under
    the new name); dropping one clears the spec, and the next
    optimize freezes a FRESH spec that distrusts leftover _z stats
    (they were computed under incomparable buckets)."""
    t = TxnTable(spark, str(tmp_path / "t"))
    t.append(_grid(spark, 0, 8, 0, 8, "a"), stats_cols=("x", "y"))
    t.optimize_zorder(("x", "y"), bits=4)
    t.rename_column("x", "col_x")
    spec = t.snapshot_meta().zorder_spec
    assert spec["cols"] == ["col_x", "y"]
    assert "col_x" in spec["num"] and "x" not in spec["num"]
    # the renamed curve still optimizes (no-op: everything clustered)
    v = t.latest_version()
    assert t.optimize_zorder(("col_x", "y"), bits=4) == v
    # dropping a cluster column kills the curve
    t.drop_column("col_x")
    assert t.snapshot_meta().zorder_spec == {}
    # a fresh 1-D curve re-freezes; leftover _z stats are distrusted,
    # so every file reclusters under the new spec and the answer holds
    t.optimize_zorder(("y",), bits=4, files_per_component=4)
    meta = t.snapshot_meta()
    assert meta.zorder_spec["cols"] == ["y"]
    assert t.snapshot().count() == 64
    keep, total = t.files_matching({"y": (0, 0)})
    assert len(keep) < total


def test_optimize_zorder_refreeze_retightens(spark, tmp_path):
    """refreeze=True recomputes the spec from current data and
    reclusters everything under it — drifted data regains bucket
    resolution, and a different column set becomes legal."""
    t = TxnTable(spark, str(tmp_path / "t"))
    t.append(_grid(spark, 0, 4, 0, 4, "a"), stats_cols=("x", "y"))
    t.optimize_zorder(("x", "y"), bits=4)
    lo, hi = t.snapshot_meta().zorder_spec["num"]["x"]
    # drift far outside the frozen bounds
    t.append(_grid(spark, 1000, 1016, 0, 4, "d"), stats_cols=("x", "y"))
    t.optimize_zorder(("x", "y"), bits=4)  # clamps into edge buckets
    assert t.snapshot_meta().zorder_spec["num"]["x"] == [lo, hi]
    t.optimize_zorder(("x", "y"), bits=4, refreeze=True,
                      files_per_component=4)
    new_lo, new_hi = t.snapshot_meta().zorder_spec["num"]["x"]
    assert new_hi > hi  # bounds re-tightened around current data
    assert t.snapshot().count() == 16 + 64
    # with only 4 output files the top interleaved bit (y's) decides
    # the split, so assert pruning on y — the dimension the curve
    # actually separated at this width
    keep, total = t.files_matching({"y": (0, 0)})
    assert len(keep) < total
    # refreeze also switches column sets legally
    t.optimize_zorder(("y",), bits=4, refreeze=True)
    assert t.snapshot_meta().zorder_spec["cols"] == ["y"]


def test_optimize_zorder_conflicts_with_concurrent_mor_delete(
    spark, tmp_path
):
    """The rewrite declares its input vectors: a MOR delete landing
    on a selected file between planning and publish aborts the
    optimize instead of resurrecting the deleted rows."""
    import pytest as _pytest

    from etl_data_lake_spark.sources.sinks import (
        compute_zorder_spec,
        zorder_key_with_spec,
    )
    from etl_data_lake_spark.sources.txn import ConcurrentWriteError

    path = str(tmp_path / "t")
    t = TxnTable(spark, path)
    t.append(_grid(spark, 0, 8, 0, 4, "a"), stats_cols=("x", "y"))
    base = t.snapshot_meta()
    spec = compute_zorder_spec(t.snapshot(base.version), ("x", "y"), 4)
    clustered = (
        zorder_key_with_spec(t.read_files(base, list(base.files)), spec)
        .repartitionByRange(2, F.col("_z"))
        .sortWithinPartitions("_z")
    )
    staged, _sj, stats = t._stage(clustered, ("x", "y", "_z"))
    TxnTable(spark, path).delete_where_mor("x", 3, 3)  # concurrent
    with _pytest.raises(ConcurrentWriteError):
        t._commit(
            "compact", staged, base.schema().json(), None, None,
            replaced=tuple(base.files),
            expected_dvs={f: base.file_dvs.get(f) for f in base.files},
            staged_stats=stats, zorder_spec=spec,
        )
    # the delete survived; a fresh optimize applies + retires it
    t.optimize_zorder(("x", "y"), bits=4)
    assert not t.snapshot_meta().file_dvs
    assert all(r.x != 3 for r in t.snapshot().select("x").collect())


def test_txnlake_reads_zordered_table_without_z(spark, tmp_path):
    """The physical-only _z column never leaks through the txnlake
    datasource either."""
    from etl_data_lake_spark.sources.lake_datasource import (
        register_lake_source,
    )

    register_lake_source(spark)
    t = TxnTable(spark, str(tmp_path / "t"))
    t.append(_grid(spark, 0, 4, 0, 4, "a"), stats_cols=("x", "y"))
    t.optimize_zorder(("x", "y"), bits=4)
    df = spark.read.format("txnlake").load(str(t.root))
    assert df.columns == ["x", "y", "v"]
    assert df.count() == 16


def test_append_clustered_conflicts_with_concurrent_refreeze(
    spark, tmp_path
):
    """Z-spec CAS (third-review pin): a clustered append keyed under
    spec S aborts when a refreeze lands first — its _z stats would be
    interval-compared under the new spec and could silently
    mis-cluster files forever. Rename to the reserved '_z' is also
    rejected."""
    from etl_data_lake_spark.sources.txn import ConcurrentWriteError

    path = str(tmp_path / "t")
    t = TxnTable(spark, path)
    t.append(_grid(spark, 0, 8, 0, 8, "a"), stats_cols=("x", "y"))
    t.optimize_zorder(("x", "y"), bits=4)
    old_spec = dict(t.snapshot_meta().zorder_spec)
    # concurrent drift + refreeze changes the curve (same data would
    # re-freeze an identical spec, which correctly passes the CAS)
    other = TxnTable(spark, path)
    other.append(_grid(spark, 500, 508, 0, 8, "far"), stats_cols=("x", "y"))
    other.optimize_zorder(("x", "y"), bits=4, refreeze=True)
    assert dict(t.snapshot_meta().zorder_spec) != old_spec
    # an append still keyed under the OLD spec must conflict
    from etl_data_lake_spark.sources.sinks import zorder_key_with_spec

    batch = _grid(spark, 0, 8, 0, 8, "n")
    clustered = (
        zorder_key_with_spec(batch, old_spec)
        .repartitionByRange(2, F.col("_z"))
        .sortWithinPartitions("_z")
    )
    staged, _sj, stats = t._stage(clustered, ("x", "y", "_z"))
    with pytest.raises(ConcurrentWriteError, match="zorder_spec"):
        t._commit(
            "append", staged, batch.schema.json(), None, None,
            staged_stats=stats, expected_zorder_spec=old_spec,
        )
    # the public path (re-reading the current spec) succeeds
    t.append_clustered(batch, stats_cols=("x", "y"))
    assert t.snapshot().count() == 64 + 64 + 64
    with pytest.raises(ValueError, match="reserved"):
        t.rename_column("v", "_z")
