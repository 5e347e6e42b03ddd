"""IDENTITY columns on transactional tables (round-4 verdict #5,
quirk Q8's 100 TB surrogate answer): shuffle-free allocation, a
watermark CAS instead of a global sort, uniqueness under replay and
concurrent writers, metadata riding checkpoints and rewrites."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_data_lake_spark.sources.txn import (
    ConcurrentWriteError,
    SchemaEvolutionError,
    TxnTable,
)


def _df(spark, *vals):
    return spark.createDataFrame([(v,) for v in vals], "v string")


def _ids(t):
    return sorted(r.pk for r in t.snapshot().select("pk").collect())


@pytest.fixture()
def it(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "t"))
    t.append(_df(spark))  # schema-only bootstrap
    t.add_identity_column("pk", start=1, step=1)
    return t


def test_identity_unique_monotone_across_appends(spark, it):
    it.append(_df(spark, "a", "b", "c"))
    first = _ids(it)
    it.append(_df(spark, "d", "e"))
    all_ids = _ids(it)
    assert len(all_ids) == len(set(all_ids)) == 5
    assert min(all_ids) >= 1
    # second allocation strictly past the first watermark
    assert min(set(all_ids) - set(first)) > max(first)
    assert it.detail()["identity"]["pk"]["high"] == max(all_ids)


def test_identity_start_step_respected(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "t"))
    t.append(_df(spark))
    t.add_identity_column("pk", start=100, step=10)
    t.append(_df(spark, "a", "b", "c"))
    ids = _ids(t)
    # Delta's loose contract: at/past start, congruent to start mod step
    assert min(ids) >= 100
    assert all((i - 100) % 10 == 0 for i in ids)


def test_identity_negative_step(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "t"))
    t.append(_df(spark))
    t.add_identity_column("pk", start=0, step=-5)
    t.append(_df(spark, "a", "b"))
    t.append(_df(spark, "c"))
    ids = _ids(t)
    assert len(set(ids)) == 3
    assert max(ids) <= 0 and all(i % 5 == 0 for i in ids)
    assert t.snapshot_meta().identity["pk"]["high"] == min(ids)


def test_identity_generated_always_rejects_explicit(spark, it):
    with pytest.raises(ValueError, match="GENERATED"):
        it.append(
            it.spark.createDataFrame([("x", 7)], "v string, pk long")
        )


def test_identity_exactly_once_replay(spark, it):
    v1 = it.append(_df(spark, "a", "b"), app_id="job", txn_seq=1)
    v2 = it.append(_df(spark, "a", "b"), app_id="job", txn_seq=1)
    assert v1 == v2
    assert len(_ids(it)) == 2


def test_identity_concurrent_appends_unique(spark, tmp_path):
    """Real racing appends from independent handles: every id unique,
    watermark = max id (the CAS + re-allocate loop doing its job)."""
    import threading

    path = str(tmp_path / "t")
    t = TxnTable(spark, path)
    t.append(_df(spark))
    t.add_identity_column("pk")
    errs = []

    def worker(tag):
        try:
            TxnTable(spark, path).append(
                _df(spark, f"{tag}-1", f"{tag}-2")
            )
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [
        threading.Thread(target=worker, args=(i,)) for i in range(6)
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errs
    ids = _ids(t)
    assert len(ids) == 12 and len(set(ids)) == 12
    assert t.snapshot_meta().identity["pk"]["high"] == max(ids)


def test_identity_stale_watermark_conflicts(spark, tmp_path):
    """A commit carrying a stale expected watermark must abort (the
    deterministic form of the race the thread test exercises)."""
    path = str(tmp_path / "t")
    t = TxnTable(spark, path)
    t.append(_df(spark))
    t.add_identity_column("pk")
    t.append(_df(spark, "a"))
    meta = t.snapshot_meta()
    stale_high = meta.identity["pk"]["high"]
    TxnTable(spark, path).append(_df(spark, "b"))  # advances watermark
    out = _df(spark, "c").withColumn("pk", F.lit(stale_high + 1))
    staged, sj, stats = t._stage(out, ("pk",))
    with pytest.raises(ConcurrentWriteError, match="watermark"):
        t._commit(
            "append", staged, sj, None, None, staged_stats=stats,
            identity={"pk": {"start": 1, "step": 1, "high": stale_high + 1}},
            expected_identity={"pk": stale_high},
        )


def test_identity_raw_append_rejected(spark, it):
    """A direct _commit append on an identity table (e.g. a writer
    bypassing TxnTable.append) fails loudly instead of colliding."""
    staged, sj, stats = it._stage(
        it.spark.createDataFrame([("x", 1)], "v string, pk long"), ("pk",)
    )
    with pytest.raises(ValueError, match="identity"):
        it._commit("append", staged, sj, None, None, staged_stats=stats)


def test_identity_survives_checkpoint_and_rewrites(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "t"), checkpoint_interval=3)
    t.append(_df(spark))
    t.add_identity_column("pk")
    for tag in "abcdefgh":
        t.append(_df(spark, tag))
    ids_before = _ids(t)
    t.compact(stats_cols=("pk",))
    assert _ids(t) == ids_before  # rewrite carries values verbatim
    meta = TxnTable(spark, str(tmp_path / "t")).snapshot_meta()
    assert meta.identity["pk"]["high"] == max(ids_before)
    t.append(_df(spark, "i"))
    ids = _ids(t)
    assert len(set(ids)) == 9 and max(ids) > max(ids_before)


def test_identity_existing_rows_read_null(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, "old"))
    t.add_identity_column("pk")
    t.append(_df(spark, "new"))
    rows = {r.v: r.pk for r in t.snapshot().collect()}
    assert rows["old"] is None and rows["new"] is not None


def test_identity_validation(spark, it):
    with pytest.raises(ValueError, match="already"):
        it.add_identity_column("pk")
    with pytest.raises(ValueError, match="already exists"):
        it.add_identity_column("v")
    with pytest.raises(ValueError, match="nonzero"):
        it.add_identity_column("pk2", step=0)
    t2 = TxnTable(it.spark, str(it.root) + "_missing")
    with pytest.raises(FileNotFoundError):
        t2.add_identity_column("pk")


def test_identity_zero_row_append_keeps_watermark(spark, it):
    it.append(_df(spark, "a"))
    high = it.snapshot_meta().identity["pk"]["high"]
    it.append(_df(spark))
    assert it.snapshot_meta().identity["pk"]["high"] == high


# ------------------------- round-5 self-review regression pins --


def test_identity_overwrite_and_replace_where_rejected(spark, it):
    with pytest.raises(ValueError, match="identity"):
        it.overwrite(
            it.spark.createDataFrame([("x", 1)], "v string, pk long")
        )
    with pytest.raises(ValueError, match="identity"):
        it.replace_where(
            it.spark.createDataFrame([("y", 2)], "v string, pk long"),
            "pk", 0, 10,
        )


def test_identity_merge_rejected(spark, it):
    from etl_data_lake_spark.sources.merge import merge_into

    it.append(_df(spark, "a"))
    src = it.spark.createDataFrame([("b", 99)], "v string, pk long")
    with pytest.raises(ValueError, match="identity"):
        merge_into(it, src, "pk")


def test_identity_set_exprs_rejected_everywhere(spark, it):
    it.append(_df(spark, "a"))
    with pytest.raises(ValueError, match="GENERATED"):
        it.update_where("pk", 0, 10, {"pk": "0"}, stats_cols=("pk",))
    with pytest.raises(ValueError, match="GENERATED"):
        it.update_where_expr("v = 'a'", {"pk": "0"})
    with pytest.raises(ValueError, match="GENERATED"):
        it.update_where_mor("pk", 0, 10, {"pk": "0"})


def test_identity_drop_column_unbricks_appends(spark, it):
    it.append(_df(spark, "a"))
    it.drop_column("pk")
    assert "pk" not in it.snapshot_meta().schema().fieldNames()
    assert not it.snapshot_meta().identity
    it.append(_df(spark, "b"))  # plain append again, no allocation
    assert sorted(r.v for r in it.snapshot().collect()) == ["a", "b"]


def test_identity_rename_column_keeps_allocating(spark, it):
    it.append(_df(spark, "a"))
    old_high = it.snapshot_meta().identity["pk"]["high"]
    it.rename_column("pk", "row_id")
    meta = it.snapshot_meta()
    assert "pk" not in meta.identity
    assert meta.identity["row_id"]["high"] == old_high
    it.append(_df(spark, "b"))
    rows = {r.v: r.row_id for r in it.snapshot().collect()}
    assert rows["b"] > rows["a"]  # allocation continued past watermark
    with pytest.raises(ValueError, match="GENERATED"):
        it.append(
            it.spark.createDataFrame([("c", 1)], "v string, row_id long")
        )


def test_identity_concurrent_registration_not_erased(spark, tmp_path):
    """_commit merges identity metadata over the current base: an
    append whose snapshot predates a concurrent add_identity_column
    must not erase the new column's registration."""
    path = str(tmp_path / "t")
    t = TxnTable(spark, path)
    t.append(_df(spark))
    t.add_identity_column("pk")
    meta = t.snapshot_meta()
    out = _df(spark, "a").withColumn("pk", F.lit(1).cast("long"))
    staged, sj, stats = t._stage(out, ("pk",))
    # concurrent second identity column lands after the stage
    TxnTable(spark, path).add_identity_column("pk2", start=500)
    t._commit(
        "append", staged, sj, None, None, staged_stats=stats,
        identity={"pk": {"start": 1, "step": 1, "high": 1}},
        expected_identity={"pk": None},
    )
    ident = t.snapshot_meta().identity
    assert set(ident) == {"pk", "pk2"}  # pk2 survived the merge
    assert ident["pk"]["high"] == 1


def test_identity_through_streaming_sink(spark, tmp_path):
    """txn_append_sink (foreachBatch exactly-once) composes with
    identity allocation: each micro-batch allocates past the
    watermark, a replayed batch id no-ops, ids stay unique."""
    from etl_data_lake_spark.sources.txn import txn_append_sink

    path = str(tmp_path / "t")
    t = TxnTable(spark, path)
    t.append(_df(spark))
    t.add_identity_column("pk")
    sink = txn_append_sink(path, app_id="ing")
    sink(_df(spark, "a", "b"), 0)
    sink(_df(spark, "a", "b"), 0)  # replayed micro-batch: no-op
    sink(_df(spark, "c"), 1)
    ids = _ids(t)
    assert len(ids) == 3 and len(set(ids)) == 3
    assert t.snapshot_meta().identity["pk"]["high"] == max(ids)
