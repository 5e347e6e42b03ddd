"""Incremental CDF consumption (sources/cdf.py): per-commit change
attribution, durable offsets, crash-replay exactly-once composition."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_data_lake_spark.sources.cdf import (
    cdc_mirror_sink,
    changes_between,
    incremental_changes,
    process_changes,
    read_offset,
    write_offset,
)
from etl_data_lake_spark.sources.merge import merge_into
from etl_data_lake_spark.sources.txn import TxnTable


def _kv(spark, *pairs):
    return spark.createDataFrame(list(pairs), "id long, v string")


def test_changes_between_attributes_commit_versions(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "t"))
    t.append(_kv(spark, (1, "a")), stats_cols=("id",))          # v1
    t.append(_kv(spark, (2, "b")), stats_cols=("id",))          # v2
    merge_into(t, _kv(spark, (2, "B")), "id", stats_cols=("id",))  # v3
    ch = changes_between(t, 0, t.latest_version()).collect()
    got = sorted((r.id, r.v, r._change_type, r._commit_version) for r in ch)
    assert got == sorted([
        (1, "a", "insert", 1),
        (2, "B", "insert", 3),
        (2, "b", "insert", 2),
        (2, "b", "delete", 3),  # update = delete + insert at v3
    ])
    assert changes_between(t, 3, 3) is None


def test_pure_compaction_contributes_nothing(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "t"))
    t.append(_kv(spark, (1, "a")))
    t.append(_kv(spark, (2, "b")))
    t.compact()
    ch = changes_between(t, 2, 3)
    assert ch.count() == 0


def test_incremental_consumer_offsets(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "t"))
    state = str(tmp_path / "offset.json")
    t.append(_kv(spark, (1, "a")))
    t.append(_kv(spark, (2, "b")))
    ch, v_from, v_to = incremental_changes(t, state)
    assert (v_from, v_to) == (0, 2) and ch.count() == 2
    write_offset(state, v_to)
    # nothing new
    ch, v_from, v_to = incremental_changes(t, state)
    assert ch is None and (v_from, v_to) == (2, 2)
    # new commit -> only its delta
    t.append(_kv(spark, (3, "c")))
    ch, _, v_to = incremental_changes(t, state)
    assert [r.id for r in ch.collect()] == [3] and v_to == 3
    write_offset(state, v_to)
    # backlog capped per batch
    t.append(_kv(spark, (4, "d")))
    t.append(_kv(spark, (5, "e")))
    ch, _, v_to = incremental_changes(t, state, max_versions=1)
    assert v_to == 4 and [r.id for r in ch.collect()] == [4]


def test_process_changes_crash_replay_exactly_once(spark, tmp_path):
    src = TxnTable(spark, str(tmp_path / "src"))
    state = str(tmp_path / "offset.json")
    mirror_path = str(tmp_path / "mirror")
    src.append(_kv(spark, (1, "a")))
    src.append(_kv(spark, (2, "b")))

    fn = cdc_mirror_sink(mirror_path)
    # first consumption: fn runs but the offset write "crashes"
    ch, _, v_to = incremental_changes(src, state)
    fn(ch, v_to)  # effects applied
    # (no write_offset -> replay on restart)
    assert read_offset(state) == 0
    # restart: full loop replays the same span; the mirror's writer
    # watermark makes the duplicate apply a no-op
    off = process_changes(src, state, fn)
    assert off == 2
    mirror = TxnTable(spark, mirror_path)
    assert mirror.snapshot().count() == 2  # not 4
    # steady state: a delete flows through as one change event
    src.delete_where("id", 1, 1, stats_cols=("id",))
    process_changes(src, state, fn)
    ev = sorted(
        (r.id, r._change_type, r._commit_version)
        for r in mirror.snapshot().collect()
    )
    assert ev == [
        (1, "delete", 3), (1, "insert", 1), (2, "insert", 2),
    ]


def test_changes_union_is_schema_evolution_safe(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "t"))
    t.append(_kv(spark, (1, "a")))
    t.append(
        spark.createDataFrame([(2, "b", 9)], "id long, v string, extra long")
    )
    ch = changes_between(t, 0, 2)
    rows = {r.id: (r.v, r.extra) for r in ch.collect()}
    assert rows[1] == ("a", None) and rows[2] == ("b", 9)


# ----------------------------------------------- TIMESTAMP AS OF reads --


def test_timestamp_time_travel(spark, tmp_path):
    import json

    from etl_data_lake_spark.sources.txn import _manifest_path

    t = TxnTable(spark, str(tmp_path / "t"))
    t.append(_kv(spark, (1, "a")))
    t.append(_kv(spark, (2, "b")))
    t.append(_kv(spark, (3, "c")))
    # pin deterministic, gapped stamps (wall clock is too fast/flaky)
    for v, ts in ((1, 1000), (2, 2000), (3, 3000)):
        p = _manifest_path(t.root, v)
        m = json.loads(p.read_text())
        m["ts_ms"] = ts
        p.write_text(json.dumps(m))
    assert t.version_as_of(2500) == 2
    assert t.version_as_of(2000) == 2  # inclusive
    assert t.version_as_of(99999) == 3
    assert sorted(r.id for r in t.snapshot_as_of(1500).collect()) == [1]
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        t.version_as_of(500)
    # history carries the stamps
    assert [h["ts_ms"] for h in t.history()] == [1000, 2000, 3000]
    # unstamped (pre-feature) manifests qualify conservatively
    m = json.loads(_manifest_path(t.root, 1).read_text())
    del m["ts_ms"]
    _manifest_path(t.root, 1).write_text(json.dumps(m))
    assert t.version_as_of(500) == 1


def test_rewrite_rebase_preserves_concurrently_evolved_schema(spark, tmp_path):
    """A compact/merge/delete that rebases over a concurrent schema-
    evolving append must publish the UNION schema — otherwise readers
    silently lose the new column for every file (rebase form of the
    round-4 replace_where schema bug)."""
    path = str(tmp_path / "t")
    t = TxnTable(spark, path)
    t.append(_kv(spark, (1, "a"), (2, "b")))
    base = t.snapshot_meta()
    df = spark.read.schema(base.schema()).parquet(
        *[str(t.root / f) for f in base.files]
    ).coalesce(1)
    staged, schema_json, stats = t._stage(df)
    # concurrent append widens the schema while our compact is staged
    TxnTable(spark, path).append(
        spark.createDataFrame([(3, "c", 9)], "id long, v string, extra long")
    )
    t._commit(
        "compact", staged, schema_json, None, None,
        replaced=tuple(base.files), staged_stats=stats,
    )
    snap = t.snapshot()
    assert "extra" in snap.columns
    got = {r.id: r.extra for r in snap.collect()}
    assert got == {1: None, 2: None, 3: 9}


def test_history_paging(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "t"))
    for i in range(5):
        t.append(_kv(spark, (i, f"r{i}")))
    full = t.history()
    assert [h["version"] for h in full] == [1, 2, 3, 4, 5]
    assert [h["version"] for h in t.history(limit=2)] == [4, 5]
    assert [h["version"] for h in t.history(limit=2, before=4)] == [2, 3]
    assert t.history(limit=10) == full


def test_vacuum_older_than_keeps_retention_window(spark, tmp_path):
    import json

    from etl_data_lake_spark.sources.txn import _manifest_path

    t = TxnTable(spark, str(tmp_path / "t"))
    t.append(_kv(spark, (0, "r0")))   # v1
    t.append(_kv(spark, (1, "r1")))   # v2
    t.compact()                       # v3: old dirs now unreferenced
    t.append(_kv(spark, (2, "r2")))   # v4
    for v, ts in ((1, 1000), (2, 2000), (3, 3000), (4, 4000)):
        p = _manifest_path(t.root, v)
        m = json.loads(p.read_text())
        m["ts_ms"] = ts
        p.write_text(json.dumps(m))
    # retention window opens at 3500: keep v4 and v3 (newest snapshot
    # at-or-before the window start); v1/v2's pre-compact dirs go
    removed = t.vacuum_older_than(retention_ms=500, now_ms=4000)
    assert removed == 2
    assert sorted(r.id for r in t.snapshot(version=3).collect()) == [0, 1]
    assert sorted(r.id for r in t.snapshot().collect()) == [0, 1, 2]
    # everything inside the window -> nothing further reclaimed
    assert t.vacuum_older_than(retention_ms=10_000, now_ms=4000) == 0


def test_history_records_operation_params(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "t"))
    t.append(_kv(spark, (1, "a"), (50, "b")), stats_cols=("id",))
    merge_into(t, _kv(spark, (1, "A")), "id", stats_cols=("id",))
    t.delete_where("id", 40, 60, stats_cols=("id",))
    h = t.history()
    assert h[1]["operation"] == "merge"
    assert h[1]["params"]["keys"] == ["id"]
    assert h[1]["params"]["when_matched"] == "update"
    assert h[2]["operation"] == "delete"
    assert h[2]["params"] == {"col": "id", "ranges": [[40, 60]]}
