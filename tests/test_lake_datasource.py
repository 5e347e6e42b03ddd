"""The ``txnlake`` Python DataSource (sources/lake_datasource.py):
batch reads with snapshot isolation, deletion vectors, column
mapping, time travel, and manifest-stats filter pruning; streaming
reads with version offsets and Delta-style append-only semantics.
"""

from __future__ import annotations

import pytest

from etl_data_lake_spark.sources.lake_datasource import (
    TxnLakePushdownReader,
    register_lake_source,
)
from etl_data_lake_spark.sources.txn import ConcurrentWriteError, TxnTable


def _mk(spark, rows, schema="id int, v string"):
    return spark.createDataFrame(rows, schema).coalesce(1)


@pytest.fixture()
def lake(spark, tmp_path):
    register_lake_source(spark)
    t = TxnTable(spark, str(tmp_path / "t"))
    t.append(_mk(spark, [(1, "a"), (2, "b")]), stats_cols=("id",))
    t.append(_mk(spark, [(100, "c"), (101, "d")]), stats_cols=("id",))
    return t


def test_batch_read_applies_dv_mapping_and_evolution(spark, lake, tmp_path):
    lake.delete_where_mor("id", 2, 2)
    lake.rename_column("v", "txt")
    lake.append(
        _mk(spark, [(200, "e", 7)], "id int, txt string, extra int")
    )
    df = spark.read.format("txnlake").load(str(lake.root))
    assert df.columns == ["id", "txt", "extra"]
    rows = sorted(
        (r.id, r.txt, r.extra) for r in df.collect()
    )
    # DV hides id=2; rename surfaces txt; old files read extra as null
    assert rows == [
        (1, "a", None), (100, "c", None), (101, "d", None), (200, "e", 7),
    ]
    # equals the native snapshot read, row for row
    assert rows == sorted(
        (r.id, r.txt, r.extra) for r in lake.snapshot().collect()
    )


def test_batch_version_time_travel(spark, lake):
    import time

    ts_after_v2 = int(time.time() * 1000)
    lake.delete_where("id", 1, 1, stats_cols=("id",))
    df_old = spark.read.format("txnlake").option("version", "2").load(
        str(lake.root)
    )
    assert df_old.count() == 4
    assert spark.read.format("txnlake").load(str(lake.root)).count() == 3
    # TIMESTAMP AS OF resolves through version_as_of
    assert (
        spark.read.format("txnlake")
        .option("timestampAsOf", str(ts_after_v2))
        .load(str(lake.root))
        .count()
        == 4
    )
    with pytest.raises(Exception, match="not both"):
        spark.read.format("txnlake").option("version", "1").option(
            "timestampAsOf", "0"
        ).load(str(lake.root)).count()


def test_pushdown_prunes_files_and_stays_exact(spark, lake):
    from pyspark.sql.datasource import EqualTo

    # unit level: the reader's planned file list shrinks under a
    # pushed equality on the stats column
    r = TxnLakePushdownReader(
        {"path": str(lake.root)}, lake.snapshot_meta().schema()
    )
    assert len(r.planned_files()) == 2
    list(r.pushFilters([EqualTo(("id",), 1)]))  # consume the generator
    assert len(r.planned_files()) == 1

    # end to end: Spark requires the session conf before any reader
    # that implements pushFilters may plan; filters are re-applied
    # row-exactly regardless, so results equal the plain filter
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    try:
        got = sorted(
            row.id
            for row in spark.read.format("txnlake")
            .option("pushdown", "true")
            .load(str(lake.root))
            .where("id < 50")
            .collect()
        )
    finally:
        spark.conf.unset("spark.sql.python.filterPushdown.enabled")
    assert got == [1, 2]


def test_stream_versions_as_offsets(spark, lake, tmp_path):
    ck, out = str(tmp_path / "ck"), str(tmp_path / "out")

    def run(opts=None):
        r = spark.readStream.format("txnlake")
        for k, v in (opts or {}).items():
            r = r.option(k, v)
        q = (
            r.load(str(lake.root))
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()
    assert sorted(r.id for r in spark.read.parquet(out).collect()) == [
        1, 2, 100, 101,
    ]
    # new append streams incrementally; compaction contributes NOTHING
    lake.append(_mk(spark, [(3, "c")]), stats_cols=("id",))
    lake.compact(target_files=1, stats_cols=("id",))
    run()
    assert sorted(r.id for r in spark.read.parquet(out).collect()) == [
        1, 2, 3, 100, 101,
    ]
    # a data-changing commit fails the stream (append-only contract)
    lake.delete_where("id", 1, 1, stats_cols=("id",))
    with pytest.raises(Exception, match="data-changing"):
        run()
    # ignoreChanges proceeds, emitting the rewrite's added files
    run({"ignoreChanges": "true"})
    ids = sorted(r.id for r in spark.read.parquet(out).collect())
    assert 3 in ids and 100 in ids  # re-delivery allowed, no loss


def test_batch_writer_append_overwrite_stats_evolution(spark, tmp_path):
    register_lake_source(spark)
    p = str(tmp_path / "w")
    _mk(spark, [(1, "a"), (2, "b")]).write.format("txnlake").option(
        "statsCols", "id"
    ).mode("append").save(p)
    t = TxnTable(spark, p)
    assert sorted(r.id for r in t.snapshot().collect()) == [1, 2]
    # manifest stats from the writer's footers: pruning works
    _mk(spark, [(100, "c")]).write.format("txnlake").option(
        "statsCols", "id"
    ).mode("append").save(p)
    keep, total = t.files_matching({"id": (100, 100)})
    assert len(keep) < total
    # additive evolution through the writer
    _mk(spark, [(5, "d", 7)], "id int, v string, extra int").write.format(
        "txnlake"
    ).mode("append").save(p)
    assert t.snapshot().columns == ["id", "v", "extra"]
    assert t.snapshot().where("extra is not null").count() == 1
    # overwrite replaces everything in one atomic commit
    _mk(spark, [(9, "z")]).write.format("txnlake").mode("overwrite").save(p)
    assert sorted(r.id for r in t.snapshot().collect()) == [9]
    assert t.history()[-1]["operation"] == "overwrite"
    # CHECK constraints gate the writer like any commit
    t.add_constraint("id_pos", "id > 0")
    v = t.latest_version()
    with pytest.raises(Exception, match="violated"):
        _mk(spark, [(-1, "bad")]).write.format("txnlake").mode(
            "append"
        ).save(p)
    assert t.latest_version() == v and t.snapshot().count() == 1


def test_batch_writer_respects_column_mapping(spark, tmp_path):
    register_lake_source(spark)
    p = str(tmp_path / "w")
    t = TxnTable(spark, p)
    t.append(_mk(spark, [(1, "a")]), stats_cols=("id",))
    t.rename_column("v", "txt")
    # the writer stages under the stable PHYSICAL name
    _mk(spark, [(2, "b")], "id int, txt string").write.format(
        "txnlake"
    ).mode("append").save(p)
    assert sorted((r.id, r.txt) for r in t.snapshot().collect()) == [
        (1, "a"), (2, "b"),
    ]


def test_stream_writer_exactly_once(spark, tmp_path):
    register_lake_source(spark)
    src, out = str(tmp_path / "src"), str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    s = TxnTable(spark, src)
    s.append(_mk(spark, [(1, "a")]))

    def run():
        q = (
            spark.readStream.format("txnlake").load(src)
            .writeStream.format("txnlake")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()
    o = TxnTable(spark, out)
    assert sorted(r.id for r in o.snapshot().collect()) == [1]
    assert o.snapshot_meta().writer_txns == {"txnlake-stream": 0}
    s.append(_mk(spark, [(2, "b")]))
    run()
    assert sorted(r.id for r in o.snapshot().collect()) == [1, 2]
    # replaying batch 0's commit directly must no-op (the watermark)
    v = o.latest_version()
    assert o.append(_mk(spark, [(1, "a")]), app_id="txnlake-stream",
                    txn_seq=0) == v


def test_stream_flags_replace_where_and_inclusive_start(spark, tmp_path):
    """replace_where publishes as 'compact' but IS a data change: the
    stream must flag it (and deliver its added files under
    ignoreChanges), never skip it like real compaction. Also pins
    Delta's INCLUSIVE startingVersion."""
    register_lake_source(spark)
    p = str(tmp_path / "t")
    t = TxnTable(spark, p)
    t.append(_mk(spark, [(1, "a")]), stats_cols=("id",))
    t.append(_mk(spark, [(50, "b")]), stats_cols=("id",))
    t.replace_where(
        _mk(spark, [(50, "B2"), (51, "B3")]), "id", 40, 60,
        stats_cols=("id",),
    )
    ck, out = str(tmp_path / "ck"), str(tmp_path / "out")

    def run(opts):
        r = spark.readStream.format("txnlake")
        for k, v in opts.items():
            r = r.option(k, v)
        q = (
            r.load(p).writeStream.format("parquet")
            .option("path", out).option("checkpointLocation", ck)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(120)

    with pytest.raises(Exception, match="data-changing"):
        run({})
    run({"ignoreChanges": "true"})
    ids = sorted(r.id for r in spark.read.parquet(out).collect())
    # v1's append, v2's append, and the backfill's added file (50
    # re-delivered — exactly ignoreChanges' documented contract);
    # nothing lost
    assert ids == [1, 50, 50, 51]

    # inclusive startingVersion: starting at 2 includes version 2
    ck2, out2 = str(tmp_path / "ck2"), str(tmp_path / "out2")
    q = (
        spark.readStream.format("txnlake")
        .option("startingVersion", "2")
        .option("ignoreChanges", "true")
        .load(p)
        .writeStream.format("parquet")
        .option("path", out2).option("checkpointLocation", ck2)
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    ids2 = sorted(r.id for r in spark.read.parquet(out2).collect())
    assert ids2 == [50, 50, 51]  # v2's file + v3's backfill, not v1


def test_pushdown_float_and_prefix_soundness(spark, lake, tmp_path):
    """Float stats never prune (parquet footers omit NaN while Spark
    sorts it above every double); a string file whose min starts with
    the prefix but contains U+10FFFF is kept."""
    from pyspark.sql.datasource import GreaterThan, StringStartsWith

    from etl_data_lake_spark.sources.lake_datasource import _overlaps

    # float entry: even hi < value must NOT prune (NaN-blind stats)
    assert _overlaps([1.0, 1.0], GreaterThan(("x",), 5.0)) is True
    # int entry with the same shape DOES prune
    assert _overlaps([1, 1], GreaterThan(("x",), 5)) is False
    # prefix: min starts with 'ab' but sorts above 'ab'+U+10FFFF
    tricky = "ab\U0010ffffx"
    assert _overlaps([tricky, tricky], StringStartsWith(("s",), "ab"))
    assert not _overlaps(["zz", "zz"], StringStartsWith(("s",), "ab"))

    # end-to-end NaN correctness through the pushdown reader
    p = str(tmp_path / "nan")
    t = TxnTable(spark, p)
    t.append(
        spark.createDataFrame(
            [(1, 1.0), (2, float("nan"))], "id int, x double"
        ).coalesce(1),
        stats_cols=("x",),
    )
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    try:
        got = (
            spark.read.format("txnlake").option("pushdown", "true")
            .load(p).where("x > 5.0").collect()
        )
    finally:
        spark.conf.unset("spark.sql.python.filterPushdown.enabled")
    assert [r.id for r in got] == [2]  # NaN > 5.0 in Spark SQL


def test_batch_writer_overwrite_pins_plan_time_base(spark, tmp_path):
    """An overwrite job must abort when any commit lands between
    planning and publish — not silently erase it."""
    from etl_data_lake_spark.sources.lake_datasource import (
        TxnLakeBatchWriter,
        _WroteFiles,
    )

    register_lake_source(spark)
    p = str(tmp_path / "t")
    t = TxnTable(spark, p)
    t.append(_mk(spark, [(1, "a")]))
    w = TxnLakeBatchWriter(
        {"path": p}, t.snapshot_meta().schema(), overwrite=True
    )
    # concurrent append lands while the job "runs"
    t.append(_mk(spark, [(2, "b")]))
    staged, _sj, _st = t._stage(_mk(spark, [(9, "z")]))
    with pytest.raises(ConcurrentWriteError):
        w.commit([_WroteFiles(tuple(staged))])
    assert sorted(r.id for r in t.snapshot().collect()) == [1, 2]


def test_stream_writer_rejects_complete_mode(spark, tmp_path):
    register_lake_source(spark)
    p, src = str(tmp_path / "t"), str(tmp_path / "src")
    TxnTable(spark, src).append(_mk(spark, [(1, "a")]))
    with pytest.raises(Exception, match="append output mode"):
        q = (
            spark.readStream.format("txnlake").load(src)
            .groupBy("id").count()
            .writeStream.format("txnlake")
            .outputMode("complete")
            .option("path", p)
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)


# -------------------------------------------- streaming rate limiting --


def test_stream_max_versions_per_batch_bounded_drain(spark, tmp_path):
    """A 10-version backlog with maxVersionsPerBatch=3 + consumerId
    drains across availableNow runs in bounded steps (each run = one
    throttled batch), recovering the planning mark from
    _stream_progress between runs; every row exactly once."""
    register_lake_source(spark)
    src = str(tmp_path / "src")
    t = TxnTable(spark, src)
    for i in range(10):
        t.append(_mk(spark, [(i, f"v{i}")]), stats_cols=("id",))
    ck, out = str(tmp_path / "ck"), str(tmp_path / "out")

    def run():
        q = (
            spark.readStream.format("txnlake")
            .option("maxVersionsPerBatch", 3)
            .option("consumerId", "drainer")
            .load(src)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = spark.read.parquet(out)
        return sorted(r.id for r in got.collect())

    counts = [len(run())]
    while counts[-1] < 10:
        counts.append(len(run()))
        assert counts[-1] - counts[-2] <= 3  # bounded step
        assert len(counts) < 20  # progress guard
    assert counts[0] <= 3  # first batch throttled too (initialOffset seed)
    assert run() == list(range(10))  # exactly once, caught-up run no-op
    assert len(counts) >= 4  # 10 versions / 3 per batch
    marker = (t.root / "_stream_progress" / "drainer.json").read_text()
    import json as _json

    assert _json.loads(marker)["planned"] == 10


def test_stream_max_versions_single_query_multi_batches(spark, tmp_path):
    """Within one continuous query the throttle yields multiple
    bounded micro-batches."""
    register_lake_source(spark)
    src = str(tmp_path / "src")
    t = TxnTable(spark, src)
    rows_per_version = 2
    for i in range(6):
        t.append(
            _mk(spark, [(2 * i, "a"), (2 * i + 1, "b")]),
            stats_cols=("id",),
        )
    ck, out = str(tmp_path / "ck"), str(tmp_path / "out")
    q = (
        spark.readStream.format("txnlake")
        .option("maxVersionsPerBatch", 2)
        .option("consumerId", "mq")
        .load(src)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .start()
    )
    try:
        import time

        deadline = time.time() + 120
        while time.time() < deadline:
            progress = [
                p for p in q.recentProgress if p["numInputRows"] > 0
            ]
            if sum(p["numInputRows"] for p in progress) >= 12:
                break
            time.sleep(0.5)
    finally:
        q.stop()
    assert sorted(r.id for r in spark.read.parquet(out).collect()) == list(
        range(12)
    )
    assert len(progress) >= 3  # 6 versions / 2-per-batch
    assert all(
        p["numInputRows"] <= 2 * rows_per_version for p in progress
    )


def test_stream_max_versions_requires_consumer_id(spark, tmp_path):
    """The throttle's planning mark must survive restarts (the Python
    stream API calls latestOffset before initialOffset even on fresh
    checkpoints — measured), so maxVersionsPerBatch without a
    consumerId is rejected up front."""
    register_lake_source(spark)
    src = str(tmp_path / "src")
    TxnTable(spark, src).append(_mk(spark, [(1, "a")]))
    with pytest.raises(Exception, match="consumerId"):
        q = (
            spark.readStream.format("txnlake")
            .option("maxVersionsPerBatch", 2)
            .load(src)
            .writeStream.format("noop")
            .option(
                "checkpointLocation", str(tmp_path / "ck")
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)


def test_stream_bad_max_versions_rejected(spark, tmp_path):
    register_lake_source(spark)
    src = str(tmp_path / "src")
    TxnTable(spark, src).append(_mk(spark, [(1, "a")]))
    with pytest.raises(Exception):
        q = (
            spark.readStream.format("txnlake")
            .option("maxVersionsPerBatch", 0)
            .option("consumerId", "bad")
            .load(src)
            .writeStream.format("noop")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)


def test_stream_starting_timestamp(spark, tmp_path):
    """startingTimestamp resolves to 'changes strictly after the
    stamp' via the manifest ts walk (Delta's semantics); mutually
    exclusive with startingVersion."""
    register_lake_source(spark)
    src = str(tmp_path / "src")
    t = TxnTable(spark, src)
    t.append(_mk(spark, [(1, "a")]), stats_cols=("id",))
    t.append(_mk(spark, [(2, "b")]), stats_cols=("id",))
    import time as _time

    _time.sleep(0.01)
    cut_ms = int(_time.time() * 1000)
    _time.sleep(0.01)
    t.append(_mk(spark, [(3, "c")]), stats_cols=("id",))
    ck, out = str(tmp_path / "ck"), str(tmp_path / "out")
    q = (
        spark.readStream.format("txnlake")
        .option("startingTimestamp", cut_ms)
        .load(src)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert sorted(r.id for r in spark.read.parquet(out).collect()) == [3]
    with pytest.raises(Exception, match="not both"):
        q2 = (
            spark.readStream.format("txnlake")
            .option("startingTimestamp", cut_ms)
            .option("startingVersion", 1)
            .load(src)
            .writeStream.format("noop")
            .option("checkpointLocation", str(tmp_path / "ck2"))
            .trigger(availableNow=True)
            .start()
        )
        q2.awaitTermination(60)


def test_stream_starting_timestamp_inclusive_boundary(spark, tmp_path):
    """Delta's inclusive contract (round-5 advice): a version stamped
    EXACTLY at startingTimestamp is delivered, and a stamp preceding
    every commit streams from the table's beginning instead of
    raising."""
    register_lake_source(spark)
    src = str(tmp_path / "src")
    t = TxnTable(spark, src)
    t.append(_mk(spark, [(1, "a")]), stats_cols=("id",))
    t.append(_mk(spark, [(2, "b")]), stats_cols=("id",))
    t.append(_mk(spark, [(3, "c")]), stats_cols=("id",))
    # version 2's own commit stamp: versions 2 AND 3 are "at or after"
    cut_ms = t._read_manifest(2)["ts_ms"]

    def drain(opt_ts, ck, out):
        q = (
            spark.readStream.format("txnlake")
            .option("startingTimestamp", opt_ts)
            .load(src)
            .writeStream.format("parquet")
            .option("path", str(tmp_path / out))
            .option("checkpointLocation", str(tmp_path / ck))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return sorted(
            r.id for r in spark.read.parquet(str(tmp_path / out)).collect()
        )

    assert drain(cut_ms, "ck_exact", "out_exact") == [2, 3]
    # stamp before every commit -> whole table, no FileNotFoundError
    assert drain(1, "ck_early", "out_early") == [1, 2, 3]


def test_bin_packed_read_tasks(spark, tmp_path):
    # many small files must NOT become one task per file: the default
    # 128 MiB maxBytesPerTask packs them into few InputPartitions in
    # manifest order; maxBytesPerTask=1 degenerates to per-file tasks
    register_lake_source(spark)
    t = TxnTable(spark, str(tmp_path / "t"))
    for i in range(6):
        t.append(_mk(spark, [(i, f"r{i}")]), stats_cols=("id",))
    t.delete_where_mor("id", 2, 2)  # one DV'd file inside a group
    df = spark.read.format("txnlake").load(str(t.root))
    assert df.rdd.getNumPartitions() == 1  # six tiny files, one task
    assert sorted(r.id for r in df.collect()) == [0, 1, 3, 4, 5]
    per_file = (
        spark.read.format("txnlake")
        .option("maxBytesPerTask", "1")
        .load(str(t.root))
    )
    assert per_file.rdd.getNumPartitions() == 6
    assert sorted(r.id for r in per_file.collect()) == [0, 1, 3, 4, 5]


def test_bin_packed_streaming_backlog(spark, tmp_path):
    # a 5-version backlog of tiny appends drains as ONE packed task
    # per micro-batch window, not one per historical file
    register_lake_source(spark)
    src = str(tmp_path / "src")
    t = TxnTable(spark, src)
    for i in range(5):
        t.append(_mk(spark, [(i, f"r{i}")]), stats_cols=("id",))
    out = str(tmp_path / "out")
    q = (
        spark.readStream.format("txnlake")
        .load(src)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert sorted(r.id for r in spark.read.parquet(out).collect()) == [
        0, 1, 2, 3, 4,
    ]


# --------------------------------------- file/byte-level throttling --


def test_stream_max_files_splits_one_version(spark, tmp_path):
    """A single 6-file version with maxFilesPerBatch=2 drains across
    availableNow runs in <=2-file steps — the offset lands
    MID-version ({"version": 1, "idx": k}) and the marker restores it
    between runs; every row exactly once."""
    register_lake_source(spark)
    src = str(tmp_path / "src")
    t = TxnTable(spark, src)
    six = spark.createDataFrame(
        spark.sparkContext.parallelize(
            [(i, f"r{i}") for i in range(6)], 6
        ),
        "id int, v string",
    )
    t.append(six, stats_cols=("id",))
    n_files = len(t._read_manifest(1)["add"])
    assert n_files == 6  # one element per parallelize slice → one file each
    ck, out = str(tmp_path / "ck"), str(tmp_path / "out")

    def run():
        q = (
            spark.readStream.format("txnlake")
            .option("maxFilesPerBatch", 2)
            .option("consumerId", "splitter")
            .load(src)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return sorted(r.id for r in spark.read.parquet(out).collect())

    counts = [len(run())]
    assert counts[0] <= 2  # first batch already file-throttled
    while counts[-1] < 6:
        counts.append(len(run()))
        assert counts[-1] - counts[-2] <= 2  # bounded step
        assert len(counts) < 12  # progress guard
    assert run() == list(range(6))  # exactly once, caught-up no-op
    assert len(counts) >= 3  # 6 files / 2 per batch
    import json as _json

    marker = _json.loads(
        (t.root / "_stream_progress" / "splitter.json").read_text()
    )
    assert marker == {"planned": 1}  # version 1 fully consumed


def test_stream_max_files_across_versions(spark, tmp_path):
    """File budget spans version boundaries: three 2-file versions
    with maxFilesPerBatch=3 yield batches that end mid-version, and
    a continuous query drains all rows exactly once in >=2 batches."""
    register_lake_source(spark)
    src = str(tmp_path / "src")
    t = TxnTable(spark, src)
    for i in range(3):
        two = spark.createDataFrame(
            spark.sparkContext.parallelize(
                [(2 * i, "a"), (2 * i + 1, "b")], 2
            ),
            "id int, v string",
        )
        t.append(two, stats_cols=("id",))
    ck, out = str(tmp_path / "ck"), str(tmp_path / "out")
    q = (
        spark.readStream.format("txnlake")
        .option("maxFilesPerBatch", 3)
        .option("consumerId", "spanner")
        .load(src)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .start()
    )
    try:
        import time

        deadline = time.time() + 120
        progress = []
        while time.time() < deadline:
            progress = [
                p for p in q.recentProgress if p["numInputRows"] > 0
            ]
            if sum(p["numInputRows"] for p in progress) >= 6:
                break
            time.sleep(0.5)
    finally:
        q.stop()
    assert sorted(r.id for r in spark.read.parquet(out).collect()) == list(
        range(6)
    )
    assert len(progress) >= 2  # 6 one-row files / 3-per-batch
    assert all(p["numInputRows"] <= 3 for p in progress)


def test_stream_max_bytes_soft_cap(spark, tmp_path):
    """maxBytesPerBatch=1 degenerates to one file per batch (soft
    cap always admits at least one file — no livelock)."""
    register_lake_source(spark)
    src = str(tmp_path / "src")
    t = TxnTable(spark, src)
    for i in range(3):
        t.append(_mk(spark, [(i, f"r{i}")]), stats_cols=("id",))
    ck, out = str(tmp_path / "ck"), str(tmp_path / "out")

    def run():
        q = (
            spark.readStream.format("txnlake")
            .option("maxBytesPerBatch", 1)
            .option("consumerId", "byter")
            .load(src)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return sorted(r.id for r in spark.read.parquet(out).collect())

    counts = [len(run())]
    assert counts[0] == 1
    while counts[-1] < 3:
        counts.append(len(run()))
        assert counts[-1] - counts[-2] <= 1
        assert len(counts) < 8
    assert run() == [0, 1, 2]


def test_stream_file_throttle_requires_consumer_id(spark, tmp_path):
    register_lake_source(spark)
    src = str(tmp_path / "src")
    TxnTable(spark, src).append(_mk(spark, [(1, "a")]))
    with pytest.raises(Exception, match="consumerId"):
        q = (
            spark.readStream.format("txnlake")
            .option("maxFilesPerBatch", 2)
            .load(src)
            .writeStream.format("noop")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)


def test_stream_version_throttle_mid_version_base(spark, tmp_path):
    """A restart from a MID-version marker (left by a file-throttled
    run) under maxVersionsPerBatch=1 drains only that version's
    remainder — the partially-consumed version counts as the
    window's first, not as a free prefix."""
    import json as _json

    from pyspark.sql.types import StructType

    from etl_data_lake_spark.sources.lake_datasource import (
        TxnLakeStreamReader,
    )

    src = str(tmp_path / "src")
    t = TxnTable(spark, src)
    three = spark.createDataFrame(
        spark.sparkContext.parallelize(
            [(i, f"r{i}") for i in range(3)], 3
        ),
        "id int, v string",
    )
    t.append(three, stats_cols=("id",))  # v1: three files
    t.append(_mk(spark, [(3, "a")]), stats_cols=("id",))  # v2
    t.append(_mk(spark, [(4, "b")]), stats_cols=("id",))  # v3
    mark = t.root / "_stream_progress" / "midbase.json"
    mark.parent.mkdir(parents=True, exist_ok=True)
    mark.write_text(_json.dumps({"planned": 1, "idx": 1}))
    r = TxnLakeStreamReader(
        {
            "path": src,
            "maxVersionsPerBatch": "1",
            "consumerId": "midbase",
        },
        StructType.fromDDL("id int, v string"),
    )
    first = r.latestOffset()
    assert first == {"version": 1}  # v1's remainder ONLY, not v1+v2
    parts = r.partitions({"version": 1, "idx": 1}, first)
    n_files = sum(len(p.files) for p in parts)
    assert n_files == 2  # files[1:3] of the three-file version
    assert r.latestOffset() == {"version": 2}  # then one full version


def test_stream_file_throttle_delivers_backlog_before_change_error(
    spark, tmp_path
):
    """An exhausted file budget must not read ahead into the next
    version's manifest: with v1 = 2-file append and v2 = overwrite
    (ignoreChanges unset), maxFilesPerBatch=2 delivers v1's backlog
    in a clean batch FIRST; the data-change error surfaces only when
    the walk actually reaches v2 — not before, which would kill the
    stream without ever emitting v1 (review regression)."""
    from pyspark.sql.types import StructType

    from etl_data_lake_spark.sources.lake_datasource import (
        TxnLakeStreamReader,
    )

    src = str(tmp_path / "src")
    t = TxnTable(spark, src)
    two = spark.createDataFrame(
        spark.sparkContext.parallelize([(0, "a"), (1, "b")], 2),
        "id int, v string",
    )
    t.append(two, stats_cols=("id",))  # v1
    t.overwrite(_mk(spark, [(9, "z")]), stats_cols=("id",))  # v2
    r = TxnLakeStreamReader(
        {"path": src, "maxFilesPerBatch": "2", "consumerId": "backlog"},
        StructType.fromDDL("id int, v string"),
    )
    first = r.latestOffset()
    parts = r.partitions({"version": 0}, first)
    assert sum(len(p.files) for p in parts) == 2  # v1 delivered whole
    # drains the boundary, then fails AT v2 within two more polls
    with pytest.raises(ValueError, match="data-changing"):
        r.latestOffset()
        r.latestOffset()


def test_stream_cdf_rejects_file_throttle(spark, tmp_path):
    """Change attribution is version-granular — file/byte throttles
    are rejected on readChangeFeed streams with a pointed error."""
    register_lake_source(spark)
    src = str(tmp_path / "src")
    t = TxnTable(spark, src)
    t.append(_mk(spark, [(1, "a")]))
    t.enable_cdf()
    with pytest.raises(Exception, match="maxVersionsPerBatch"):
        q = (
            spark.readStream.format("txnlake")
            .option("readChangeFeed", "true")
            .option("maxFilesPerBatch", 2)
            .option("consumerId", "cdf")
            .load(src)
            .writeStream.format("noop")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)


def test_stream_starting_timestamp_skewed_stamps(spark, tmp_path):
    """Commit stamps are advisory and may be non-monotone (writer clock
    skew). An exact-stamp version hiding behind a later-stamped commit
    must still replay: resolution is a FORWARD walk to the first
    at-or-after stamp, with later versions replaying regardless of
    their own stamps (review regression — the backward contiguous walk
    skipped it)."""
    import json
    from pathlib import Path

    register_lake_source(spark)
    src = str(tmp_path / "src")
    t = TxnTable(spark, src)
    for i in range(1, 5):
        t.append(_mk(spark, [(i, "x")]), stats_cols=("id",))
    # simulate skew: stamps [100, 150, 120, 150]
    from etl_data_lake_spark.sources.txn import _manifest_path

    for v, ms in ((1, 100), (2, 150), (3, 120), (4, 150)):
        p = _manifest_path(Path(src), v)
        doc = json.loads(p.read_text())
        doc["ts_ms"] = ms
        p.write_text(json.dumps(doc))
    q = (
        spark.readStream.format("txnlake")
        .option("startingTimestamp", 150)
        .load(src)
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        r.id for r in spark.read.parquet(str(tmp_path / "out")).collect()
    )
    # v2 (stamped exactly 150) delivers; v3 rides along (skew
    # over-delivery is the documented conservative choice); v4 too
    assert got == [2, 3, 4]
