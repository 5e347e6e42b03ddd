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
