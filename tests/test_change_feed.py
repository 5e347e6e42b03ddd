"""Table properties (TBLPROPERTIES) and the materialized CHANGE DATA
FEED (enable_cdf): per-DML change files with pre/post attribution,
cdc-aware changes_between, vacuum lifecycle, and the ``txnlake``
readChangeFeed batch + streaming readers.

Design parity target: Delta Lake's ``delta.enableChangeDataFeed`` /
``readChangeFeed`` surface (Armbrust et al., VLDB 2020); the reference
repo has no change tracking at all (``/root/reference/etl.py``
overwrites whole directories), so this is extension surface."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from etl_data_lake_spark.sources.cdf import changes_between
from etl_data_lake_spark.sources.merge import merge_into
from etl_data_lake_spark.sources.txn import TxnTable


def _kv(spark, n=10, vmul=2):
    return spark.range(n).select(
        F.col("id").alias("k"), (F.col("id") * vmul).alias("v")
    )


def _manifest(t: TxnTable, v: int) -> dict:
    return json.loads(
        (t.root / "_txnlog" / f"v{v:012d}.json").read_text()
    )


def _cdc_rows(spark, t: TxnTable, v: int) -> list[tuple]:
    files = _manifest(t, v).get("cdc") or ()
    if not files:
        return []
    df = spark.read.parquet(*[str(t.root / f) for f in files])
    return sorted(
        tuple(r[c] for c in sorted(df.columns)) for r in df.collect()
    )


def _feed(t, v_from, v_to):
    ch = changes_between(t, v_from, v_to)
    if ch is None:
        return []
    return sorted(
        (r.k, r.v, r._change_type, r._commit_version)
        for r in ch.collect()
    )


# ---------------------------------------------------- properties ----


def test_set_unset_properties_roundtrip(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "t"))
    t.append(_kv(spark))
    assert t.properties() == {}
    t.set_properties({"owner": "me", "cdf": "true"})
    assert t.properties() == {"owner": "me", "cdf": "true"}
    assert t.cdf_enabled()
    t.unset_properties("owner")
    assert t.properties() == {"cdf": "true"}
    # unset of a missing key is a no-op that commits nothing
    v = t.latest_version()
    assert t.unset_properties("nope") == v
    assert t.latest_version() == v
    # metadata-only: the file set never moved
    assert t.history()[-1]["operation"] == "props"
    assert t.snapshot().count() == 10


def test_properties_validation(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "t"))
    with pytest.raises(FileNotFoundError):
        t.set_properties({"a": "b"})  # no committed version yet
    t.append(_kv(spark))
    with pytest.raises(ValueError):
        t.set_properties({})
    with pytest.raises(ValueError):
        t.set_properties({"a": None})


def test_properties_survive_checkpoint_and_restore(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "t"), checkpoint_interval=4)
    t.append(_kv(spark))
    t.set_properties({"cdf": "true"})
    for _ in range(6):  # cross a checkpoint boundary
        t.append(_kv(spark, 2))
    t2 = TxnTable(spark, str(tmp_path / "t"), checkpoint_interval=4)
    plan = t2.read_plan()
    assert plan.checkpoint > 0  # the reload really used a checkpoint
    assert t2.properties() == {"cdf": "true"}
    # RESTORE keeps properties: they describe the table, not a
    # snapshot's data (same rule as writer watermarks)
    t2.restore(1)
    assert t2.properties() == {"cdf": "true"}


def test_concurrent_disjoint_property_sets_both_land(spark, tmp_path):
    # the props delta merges over the current base per attempt, so a
    # racing setter of a DIFFERENT key is preserved, not erased
    t = TxnTable(spark, str(tmp_path / "t"))
    t.append(_kv(spark))
    ta = TxnTable(spark, str(tmp_path / "t"))
    tb = TxnTable(spark, str(tmp_path / "t"))
    ta.set_properties({"a": "1"})
    tb.set_properties({"b": "2"})  # based on a stale snapshot is fine
    assert t.properties() == {"a": "1", "b": "2"}


# ------------------------------------------------ cdc: DML shapes ---


def test_cow_delete_writes_change_files(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "t"))
    t.append(_kv(spark))
    t.enable_cdf()
    v = t.delete_where("k", 3, 5, stats_cols=("k",))
    assert _cdc_rows(spark, t, v) == [
        ("delete", 3, 6),
        ("delete", 4, 8),
        ("delete", 5, 10),
    ]
    assert _feed(t, v - 1, v) == [
        (3, 6, "delete", v),
        (4, 8, "delete", v),
        (5, 10, "delete", v),
    ]


def test_cow_update_pre_and_postimage(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "t"))
    t.append(_kv(spark))
    t.enable_cdf()
    v = t.update_where("k", 7, 8, {"v": "v + 100"}, stats_cols=("k",))
    assert _feed(t, v - 1, v) == [
        (7, 14, "update_preimage", v),
        (7, 114, "update_postimage", v),
        (8, 16, "update_preimage", v),
        (8, 116, "update_postimage", v),
    ]


def test_update_of_predicate_column_postimage_is_exact(spark, tmp_path):
    # SET rewrites the predicate column itself: the postimage must be
    # the transform of the HIT rows, never a re-evaluation of the
    # predicate over transformed values
    t = TxnTable(spark, str(tmp_path / "t"))
    t.append(_kv(spark))
    t.enable_cdf()
    v = t.update_where("k", 2, 2, {"k": "k + 1000"}, stats_cols=("k",))
    assert _feed(t, v - 1, v) == [
        (2, 4, "update_preimage", v),
        (1002, 4, "update_postimage", v),
    ]


def test_expr_dml_change_files(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "t"))
    t.append(_kv(spark))
    t.enable_cdf()
    vd = t.delete_where_expr("k = 1 OR v = 12")
    assert _feed(t, vd - 1, vd) == [
        (1, 2, "delete", vd),
        (6, 12, "delete", vd),
    ]
    vu = t.update_where_expr("k % 2 = 1 AND k > 6", {"v": "0 - v"})
    assert _feed(t, vu - 1, vu) == [
        (7, -14, "update_postimage", vu),
        (7, 14, "update_preimage", vu),
        (9, -18, "update_postimage", vu),
        (9, 18, "update_preimage", vu),
    ]


def test_mor_dml_change_files(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "t"))
    t.append(_kv(spark))
    t.enable_cdf()
    vd = t.delete_where_mor("k", 4, 5)
    assert _feed(t, vd - 1, vd) == [
        (4, 8, "delete", vd),
        (5, 10, "delete", vd),
    ]
    # a re-delete overlapping the vector only reports NEWLY deleted
    vd2 = t.delete_where_mor("k", 5, 6)
    assert _feed(t, vd2 - 1, vd2) == [(6, 12, "delete", vd2)]
    vu = t.update_where_mor("k", 0, 1, {"v": "v + 1"})
    assert _feed(t, vu - 1, vu) == [
        (0, 0, "update_preimage", vu),
        (0, 1, "update_postimage", vu),
        (1, 2, "update_preimage", vu),
        (1, 3, "update_postimage", vu),
    ]


def test_merge_change_files_cow_and_mor(spark, tmp_path):
    for mor in (False, True):
        t = TxnTable(spark, str(tmp_path / f"t{mor}"))
        t.append(_kv(spark))
        t.enable_cdf()
        src = spark.createDataFrame(
            [(2, 100), (77, 200)], "k long, v long"
        )
        merge_into(t, src, "k", stats_cols=("k",), mor=mor)
        v = t.latest_version()
        assert _feed(t, v - 1, v) == [
            (2, 4, "update_preimage", v),
            (2, 100, "update_postimage", v),
            (77, 200, "insert", v),
        ], f"mor={mor}"
        merge_into(
            t,
            spark.createDataFrame([(3, 0)], "k long, v long"),
            "k",
            when_matched="delete",
            when_not_matched=None,
            stats_cols=("k",),
            mor=mor,
        )
        v2 = t.latest_version()
        assert _feed(t, v2 - 1, v2) == [(3, 6, "delete", v2)]


def test_insert_only_merge_change_files(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "t"))
    t.append(_kv(spark))
    t.enable_cdf()
    merge_into(
        t,
        spark.createDataFrame([(50, 1), (2, 9)], "k long, v long"),
        "k",
        when_matched=None,
        stats_cols=("k",),
    )
    v = t.latest_version()
    # only the genuinely-new key is an insert; the matched key is
    # untouched by an insert-only merge
    assert _feed(t, v - 1, v) == [(50, 1, "insert", v)]


def test_replace_where_change_files(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "t"))
    t.append(_kv(spark))
    t.enable_cdf()
    rep = spark.createDataFrame([(3, 999), (4, 998)], "k long, v long")
    t.replace_where(rep, "k", 3, 4, stats_cols=("k",))
    v = t.latest_version()
    assert _feed(t, v - 1, v) == [
        (3, 6, "delete", v),
        (3, 999, "insert", v),
        (4, 8, "delete", v),
        (4, 998, "insert", v),
    ]


def test_cdf_off_means_no_change_files(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "t"))
    t.append(_kv(spark))
    v = t.delete_where("k", 2, 3, stats_cols=("k",))
    assert _manifest(t, v)["cdc"] == []
    # and the value-diff fallback still answers
    assert _feed(t, v - 1, v) == [
        (2, 4, "delete", v),
        (3, 6, "delete", v),
    ]


def test_cdc_matches_diff_fallback_exactly(spark, tmp_path):
    # same DML on a cdf-on and a cdf-off twin: identical feeds
    # (deletes only — updates legitimately differ: pre/post vs
    # delete+insert attribution)
    rows = []
    for name, cdf in (("on", True), ("off", False)):
        t = TxnTable(spark, str(tmp_path / name))
        t.append(_kv(spark, 20))
        if cdf:
            t.enable_cdf()
        t.delete_where("k", 5, 11, stats_cols=("k",))
        v = t.latest_version()
        rows.append(
            [(k, v_, c) for k, v_, c, _ in _feed(t, v - 1, v)]
        )
    assert rows[0] == rows[1]


def test_noop_dml_empty_feed(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "t"))
    t.append(_kv(spark), stats_cols=("k",))
    t.enable_cdf()
    v = t.latest_version()
    # no matching file at all: no commit
    assert t.delete_where("k", 500, 600, stats_cols=("k",)) == v
    # matching file but no matching row: a rewrite commits, feed empty
    t.delete_where_expr("v = -1")
    v2 = t.latest_version()
    if v2 > v:
        assert _feed(t, v, v2) == []


def test_cdc_with_column_mapping(spark, tmp_path):
    # change files are written under PHYSICAL names; a rename before
    # the DML must not corrupt the feed's logical columns
    t = TxnTable(spark, str(tmp_path / "t"))
    t.append(_kv(spark))
    t.enable_cdf()
    t.rename_column("v", "val")
    v = t.update_where("k", 1, 1, {"val": "val * 10"}, stats_cols=("k",))
    ch = changes_between(t, v - 1, v)
    got = sorted(
        (r.k, r.val, r._change_type) for r in ch.collect()
    )
    assert got == [
        (1, 2, "update_preimage"),
        (1, 20, "update_postimage"),
    ]


def test_vacuum_reclaims_old_cdc_keeps_recent(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "t"))
    t.append(_kv(spark))
    t.enable_cdf()
    t.delete_where("k", 0, 0, stats_cols=("k",))   # old cdc
    t.delete_where("k", 1, 1, stats_cols=("k",))
    t.delete_where("k", 2, 2, stats_cols=("k",))   # recent cdc
    v = t.latest_version()
    n_dirs_before = len(list((t.root / "_cdc").iterdir()))
    t.vacuum(keep_versions=1)
    n_dirs_after = len(list((t.root / "_cdc").iterdir()))
    assert n_dirs_after < n_dirs_before
    # the retained version's feed still reads
    assert _feed(t, v - 1, v) == [(2, 4, "delete", v)]


def test_merge_schema_evolution_change_files(spark, tmp_path):
    # a merge that WIDENS the schema writes change rows under the
    # final schema; preimages read null for the new column, and the
    # feed over the whole span unions by name
    t = TxnTable(spark, str(tmp_path / "t"))
    t.append(_kv(spark, 4))
    t.enable_cdf()
    src = spark.createDataFrame(
        [(1, 100, "x"), (50, 1, "y")], "k long, v long, tag string"
    )
    merge_into(t, src, "k", stats_cols=("k",))
    v = t.latest_version()
    ch = changes_between(t, v - 1, v)
    got = sorted(
        (r.k, r.v, r.tag, r._change_type) for r in ch.collect()
    )
    assert got == [
        (1, 2, None, "update_preimage"),
        (1, 100, "x", "update_postimage"),
        (50, 1, "y", "insert"),
    ]
    # the full-span feed still unions (pre-evolution inserts null tag)
    full = changes_between(t, 0, v)
    assert full.where("tag IS NULL").count() == 5  # 4 inserts + preimage


# ----------------------------------------- txnlake readChangeFeed ---


@pytest.fixture()
def lake(spark):
    from etl_data_lake_spark.sources.lake_datasource import (
        register_lake_source,
    )

    register_lake_source(spark)
    return spark


def test_batch_read_change_feed(lake, spark, tmp_path):
    p = str(tmp_path / "t")
    t = TxnTable(spark, p)
    t.append(_kv(spark, 6))                                   # v1
    t.enable_cdf()                                            # v2
    t.delete_where("k", 1, 1, stats_cols=("k",))              # v3
    t.compact()                                               # v4
    merge_into(
        t,
        spark.createDataFrame([(0, 50), (9, 90)], "k long, v long"),
        "k",
        stats_cols=("k",),
    )                                                         # v5
    df = (
        spark.read.format("txnlake")
        .option("readChangeFeed", "true")
        .load(p)
    )
    got = sorted(
        (r.k, r.v, r._change_type, r._commit_version)
        for r in df.collect()
    )
    assert (0, 0, "insert", 1) in got
    assert (1, 2, "delete", 3) in got
    assert (0, 0, "update_preimage", 5) in got
    assert (0, 50, "update_postimage", 5) in got
    assert (9, 90, "insert", 5) in got
    assert not any(cv == 4 for _, _, _, cv in got)  # layout: nothing
    # sub-span
    sub = (
        spark.read.format("txnlake")
        .option("readChangeFeed", "true")
        .option("startingVersion", 3)
        .option("endingVersion", 3)
        .load(p)
    )
    assert sorted(
        (r.k, r._change_type) for r in sub.collect()
    ) == [(1, "delete")]


def test_batch_cdf_derives_mor_and_overwrite(lake, spark, tmp_path):
    # NO cdf property: append / MOR delete / overwrite are still
    # exactly derivable from manifests + vectors alone
    p = str(tmp_path / "t")
    t = TxnTable(spark, p)
    t.append(_kv(spark, 4))                                   # v1
    t.delete_where_mor("k", 1, 2)                             # v2
    t.overwrite(_kv(spark, 2, vmul=7))                        # v3
    df = (
        spark.read.format("txnlake")
        .option("readChangeFeed", "true")
        .load(p)
    )
    got = sorted(
        (r.k, r.v, r._change_type, r._commit_version)
        for r in df.collect()
    )
    assert [(k, c) for k, _, c, cv in got if cv == 2] == [
        (1, "delete"),
        (2, "delete"),
    ]
    v3 = [(k, v, c) for k, v, c, cv in got if cv == 3]
    # overwrite: survivors of the MOR delete are deleted, new inserted
    assert sorted(x for x in v3 if x[2] == "delete") == [
        (0, 0, "delete"),
        (3, 6, "delete"),
    ]
    assert sorted(x for x in v3 if x[2] == "insert") == [
        (0, 0, "insert"),
        (1, 7, "insert"),
    ]


def test_batch_cdf_underivable_raises_with_guidance(lake, spark, tmp_path):
    p = str(tmp_path / "t")
    t = TxnTable(spark, p)
    t.append(_kv(spark))                                      # v1
    t.delete_where("k", 3, 3, stats_cols=("k",))              # v2: COW, no cdc
    df = (
        spark.read.format("txnlake")
        .option("readChangeFeed", "true")
        .load(p)
    )
    with pytest.raises(Exception, match="enable_cdf|ignoreChanges"):
        df.collect()
    # ignoreChanges degrades to added-files-as-inserts
    df2 = (
        spark.read.format("txnlake")
        .option("readChangeFeed", "true")
        .option("ignoreChanges", "true")
        .load(p)
    )
    got = [r for r in df2.collect() if r._commit_version == 2]
    assert all(r._change_type == "insert" for r in got)
    assert len(got) == 9  # the rewritten survivors re-emitted


def test_stream_read_change_feed_incremental(lake, spark, tmp_path):
    p = str(tmp_path / "t")
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    t = TxnTable(spark, p)
    t.append(_kv(spark, 5))                                   # v1
    t.enable_cdf()                                            # v2
    t.delete_where("k", 0, 0, stats_cols=("k",))              # v3

    def run():
        q = (
            spark.readStream.format("txnlake")
            .option("readChangeFeed", "true")
            .load(p)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()
    got = sorted(
        (r.k, r.v, r._change_type, r._commit_version)
        for r in spark.read.parquet(out).collect()
    )
    assert (0, 0, "insert", 1) in got and (0, 0, "delete", 3) in got
    assert len(got) == 6
    # restart consumes ONLY the new commit (checkpointed offsets)
    t.update_where("k", 2, 2, {"v": "v + 5"}, stats_cols=("k",))  # v4
    run()
    inc = sorted(
        (r.k, r.v, r._change_type)
        for r in spark.read.parquet(out).collect()
        if r._commit_version == 4
    )
    assert inc == [
        (2, 4, "update_preimage"),
        (2, 9, "update_postimage"),
    ]
    assert spark.read.parquet(out).count() == 8  # no re-deliveries


def test_stream_cdf_respects_rate_limit(lake, spark, tmp_path):
    p = str(tmp_path / "t")
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    t = TxnTable(spark, p)
    # cdf property deliberately NOT set: appends alone need no
    # change files, so the CDF stream works on any append-only table
    for i in range(4):
        t.append(_kv(spark, 2, vmul=i))
    # the Python stream API captures ONE offset per availableNow run
    # (no multi-batch drain), so the throttle bounds each RUN to 2
    # versions; repeated runs walk the backlog without re-delivery
    for runs in range(1, 5):
        q = (
            spark.readStream.format("txnlake")
            .option("readChangeFeed", "true")
            .option("maxVersionsPerBatch", "2")
            .option("consumerId", "cdf-throttle-test")
            .load(p)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = spark.read.parquet(out)
        assert got.select("_commit_version").distinct().count() <= 2 * runs
        if got.count() == 8:
            break
    got = spark.read.parquet(out)
    assert got.count() == 8  # drained, exactly once
    assert got.select("_commit_version").distinct().count() == 4
