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
from etl_data_lake_spark.sources.txn import TxnTable


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
