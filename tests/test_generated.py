"""GENERATED ALWAYS AS (expr) columns (TxnTable.add_generated_column):
write-time computed, commit-validated, stats-pruned derived columns —
Delta's generated columns, the partition-column analog for the
stats-pruned layout.

Contract under test: engine-owned write paths compute the column when
absent; explicit values are validated NULL-or-equal at commit (loud
mismatch); UPDATE recomputes on post-SET rows; definitions ride
properties through rename, checkpoint, RESTORE and CLONE; raw writers
that omit the column physically are rejected, never silently
null-filled. The reference (/root/reference/etl.py) has no table
metadata at all, so this is extension surface."""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from etl_data_lake_spark.sources.merge import merge_into
from etl_data_lake_spark.sources.txn import (
    ConstraintViolationError,
    TxnTable,
)


def _kv(spark, n=8, off=0):
    return spark.range(off, off + n).select(
        F.col("id").alias("k"), (F.col("id") * 100).alias("v")
    )


@pytest.fixture()
def gen_table(spark, tmp_path):
    """Table with 4 legacy rows (pre-registration), then bucket = k % 3
    registered, then 4 computed rows."""
    t = TxnTable(spark, str(tmp_path / "t"))
    t.append(_kv(spark, 4), stats_cols=("k",))
    t.add_generated_column("bucket", "k % 3", "bigint")
    t.append(_kv(spark, 4, off=4), stats_cols=("k",))
    return t


def test_append_computes_and_legacy_reads_null(spark, gen_table):
    rows = sorted((r.k, r.bucket) for r in gen_table.snapshot().collect())
    assert rows == [
        (0, None), (1, None), (2, None), (3, None),
        (4, 1), (5, 2), (6, 0), (7, 1),
    ]
    assert gen_table.generated_columns() == {"bucket": "k % 3"}


def test_generated_stats_prune_files(spark, gen_table):
    # the generated column gets footer stats automatically — file
    # skipping on the DERIVED value is the feature's point
    meta = gen_table.snapshot_meta()
    with_stats = [
        f for f, s in meta.file_stats.items()
        if s.get("bucket") and s["bucket"][0] is not None
    ]
    assert with_stats  # computed files carry bucket min/max
    kept, total = gen_table.files_matching({"bucket": (2, 2)})
    assert len(kept) < total  # some bucket-disjoint file was skipped


def test_explicit_values_validated(spark, gen_table):
    with pytest.raises(ConstraintViolationError, match="generated<bucket>"):
        gen_table.append(
            spark.createDataFrame([(100, 1, 9)], "k long, v long, bucket long")
        )
    v = gen_table.latest_version()
    gen_table.append(
        spark.createDataFrame([(100, 1, 1)], "k long, v long, bucket long")
    )
    assert gen_table.latest_version() == v + 1
    # the failed append staged nothing visible
    assert gen_table.snapshot().where("bucket = 9").count() == 0


def test_overwrite_and_replace_where_compute(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "t"))
    t.append(_kv(spark, 2), stats_cols=("k",))
    t.add_generated_column("bucket", "k % 3", "bigint")
    t.overwrite(_kv(spark, 6), stats_cols=("k",))
    assert sorted(
        (r.k, r.bucket) for r in t.snapshot().collect()
    ) == [(0, 0), (1, 1), (2, 2), (3, 0), (4, 1), (5, 2)]
    t.replace_where(_kv(spark, 2, off=2), "k", 2, 3, stats_cols=("k",))
    got = {r.k: r.bucket for r in t.snapshot().collect()}
    assert got[2] == 2 and got[3] == 0 and len(got) == 6


def test_update_recomputes_cow_and_expr(spark, gen_table):
    gen_table.update_where("k", 5, 5, {"k": "k + 100"})
    assert [(r.k, r.bucket) for r in
            gen_table.snapshot().where("k = 105").collect()] == [(105, 0)]
    gen_table.update_where_expr("k = 7", {"k": "k + 10"})
    assert [(r.k, r.bucket) for r in
            gen_table.snapshot().where("k = 17").collect()] == [(17, 2)]
    # rows the SET didn't hit keep their values (incl. legacy nulls)
    assert gen_table.snapshot().where(
        "k < 4 AND bucket IS NOT NULL"
    ).count() == 0


def test_update_recomputes_mor(spark, gen_table):
    gen_table.update_where_mor("k", 6, 6, {"k": "k + 6"})
    assert [(r.k, r.bucket) for r in
            gen_table.snapshot().where("k = 12").collect()] == [(12, 0)]


def test_direct_set_rejected_everywhere(spark, gen_table):
    for call in (
        lambda: gen_table.update_where("k", 4, 4, {"bucket": "9"}),
        lambda: gen_table.update_where_expr("k = 4", {"bucket": "9"}),
        lambda: gen_table.update_where_mor("k", 4, 4, {"bucket": "9"}),
    ):
        with pytest.raises(ValueError, match="GENERATED ALWAYS"):
            call()


def test_registration_validation(spark, gen_table):
    with pytest.raises(ValueError, match="already exists"):
        gen_table.add_generated_column("bucket", "k % 5", "bigint")
    with pytest.raises(ValueError, match="does not analyze"):
        gen_table.add_generated_column("b2", "nosuch + 1", "bigint")
    with pytest.raises(ValueError, match="[Nn]ondeterministic"):
        gen_table.add_generated_column("b2", "rand()", "double")
    with pytest.raises(ValueError, match="reference generated"):
        gen_table.add_generated_column("b2", "bucket + 1", "bigint")
    with pytest.raises(ValueError, match="plain identifier"):
        gen_table.add_generated_column("b 2", "k", "bigint")
    with pytest.raises(ValueError, match="managed"):
        gen_table.set_properties({"generated.x": "k"})
    with pytest.raises(ValueError, match="managed"):
        gen_table.unset_properties(["generated.bucket"])


def test_rename_and_drop_interactions(spark, gen_table):
    with pytest.raises(ValueError, match="derive from"):
        gen_table.rename_column("k", "kk")
    with pytest.raises(ValueError, match="derive from"):
        gen_table.drop_column("k")
    # renaming the GENERATED column itself moves the definition
    gen_table.rename_column("bucket", "slot")
    assert gen_table.generated_columns() == {"slot": "k % 3"}
    gen_table.append(_kv(spark, 1, off=20))
    assert [r.slot for r in
            gen_table.snapshot().where("k = 20").collect()] == [2]
    # dropping it removes the definition; k is then free to rename
    gen_table.drop_column("slot")
    assert gen_table.generated_columns() == {}
    gen_table.rename_column("k", "kk")
    assert "slot" not in gen_table.snapshot().columns


def test_merge_rules(spark, gen_table):
    src = spark.createDataFrame([(4, 1), (50, 2)], "k long, v long")
    with pytest.raises(ValueError, match="lacks generated"):
        merge_into(gen_table, src, "k", stats_cols=("k",))
    ok = src.withColumn("bucket", F.expr("k % 3"))
    merge_into(gen_table, ok, "k", stats_cols=("k",))
    got = {r.k: (r.v, r.bucket) for r in gen_table.snapshot().collect()}
    assert got[50] == (2, 2) and got[4] == (1, 1)
    with pytest.raises(ValueError, match="derive from"):
        merge_into(
            gen_table, ok, "k", stats_cols=("k",),
            update_exprs={"k": "k + 1"},
        )
    with pytest.raises(ValueError, match="GENERATED ALWAYS"):
        merge_into(
            gen_table, ok, "k", stats_cols=("k",),
            update_exprs={"bucket": "0"},
        )
    # wrong source values fail loudly at commit, not silently land
    bad = src.withColumn("bucket", F.lit(7).cast("long"))
    with pytest.raises(ConstraintViolationError):
        merge_into(gen_table, bad, "k", stats_cols=("k",))


def test_cdf_postimage_recomputed(spark, tmp_path):
    from etl_data_lake_spark.sources.cdf import changes_between

    t = TxnTable(spark, str(tmp_path / "t"))
    t.append(_kv(spark, 4), stats_cols=("k",))
    t.add_generated_column("bucket", "k % 3", "bigint")
    t.append(_kv(spark, 2, off=4), stats_cols=("k",))
    t.enable_cdf()
    t.update_where("k", 5, 5, {"k": "k + 1"})
    v = t.latest_version()
    ch = {
        (r.k, r.bucket, r._change_type)
        for r in changes_between(t, v - 1, v).collect()
    }
    assert ch == {(5, 2, "update_preimage"), (6, 0, "update_postimage")}


def test_raw_staged_files_must_carry_column(spark, gen_table):
    # a raw writer (the txnlake datasource path) that omits the
    # column physically is rejected — never silently null-filled
    rel = f"data/{uuid.uuid4().hex}"
    stage = gen_table.root / rel
    _kv(spark, 2, off=60).coalesce(1).write.parquet(str(stage))
    files = sorted(
        f"{rel}/{p.name}" for p in stage.iterdir()
        if p.name.endswith(".parquet")
    )
    with pytest.raises(ValueError, match="lacks generated column"):
        gen_table._commit(
            "append", files, _kv(spark, 1).schema.json(), None, None
        )


def test_restore_guard_and_clone_carries(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "t"))
    t.append(_kv(spark, 3), stats_cols=("k",))          # v1
    t.append(_kv(spark, 1, off=3), stats_cols=("k",))   # v2
    t.add_generated_column("bucket", "k % 3", "bigint")  # v3
    t.append(_kv(spark, 1, off=9), stats_cols=("k",))   # v4
    # restore to a version whose schema lacks the column: blocked
    with pytest.raises(ValueError, match="drop_column"):
        t.restore(2)
    t.restore(4)  # same-schema restore unaffected (no-op path aside)
    # clone carries the definition and keeps computing
    cl = t.clone_to(str(tmp_path / "cl"))
    assert cl.generated_columns() == {"bucket": "k % 3"}
    cl.append(_kv(spark, 1, off=30))
    assert [r.bucket for r in cl.snapshot().where("k = 30").collect()] == [0]


def test_rewrites_carry_legacy_nulls_and_checkpoint_survival(
    spark, tmp_path
):
    t = TxnTable(spark, str(tmp_path / "t"), checkpoint_interval=4)
    t.append(_kv(spark, 4), stats_cols=("k",))
    t.add_generated_column("bucket", "k % 3", "bigint")
    for i in range(4):  # cross a checkpoint boundary
        t.append(_kv(spark, 1, off=10 + i), stats_cols=("k",))
    t.compact()  # rewrite carries legacy nulls verbatim (no backfill)
    fresh = TxnTable(spark, str(t.root), checkpoint_interval=4)
    assert fresh.generated_columns() == {"bucket": "k % 3"}
    rows = {r.k: r.bucket for r in fresh.snapshot().collect()}
    assert rows[0] is None and rows[13] == 1
    # enforcement still live through the checkpointed handle
    with pytest.raises(ConstraintViolationError):
        fresh.append(
            spark.createDataFrame([(1, 1, 9)], "k long, v long, bucket long")
        )


def test_timestamp_generated_column_day_prune(spark, tmp_path):
    # the flagship use: an event-day column derived from a timestamp,
    # pruned like a partition column (string-typed: footer stats
    # record int/float/str, and ISO days compare correctly as strings)
    t = TxnTable(spark, str(tmp_path / "t"))
    ev = spark.range(4).select(
        F.col("id").alias("k"),
        F.to_timestamp(
            F.concat(F.lit("2026-01-0"), (F.col("id") + 1).cast("string"))
        ).alias("ts"),
    )
    t.append(ev.limit(1))
    t.add_generated_column("day", "date_format(ts, 'yyyy-MM-dd')", "string")
    t.overwrite(ev.repartition(4, "k"), stats_cols=("k",))
    got = {r.k: r.day for r in t.snapshot().collect()}
    assert got[2] == "2026-01-03"
    kept, total = t.files_matching({"day": ("2026-01-02", "2026-01-02")})
    assert total >= 2 and len(kept) < total
    # and the read path composes: snapshot_where prunes + filters
    assert [
        r.k for r in t.snapshot_where("day", "2026-01-02", "2026-01-02")
        .collect()
    ] == [1]
