"""SHALLOW/deep CLONE (TxnTable.clone_to) and CONVERT-in-place
(convert_parquet_dir): zero-copy table forks and raw-parquet adoption,
plus the manifest-key resolution (:func:`_manifest_key_expr`) that
makes DML sound over out-of-root file references.

Delta parity targets: CREATE TABLE ... SHALLOW CLONE and CONVERT TO
DELTA. The reference (/root/reference/etl.py) manages no table state
at all, so this is extension surface."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from etl_data_lake_spark.sources.merge import merge_into
from etl_data_lake_spark.sources.txn import (
    TxnTable,
    convert_parquet_dir,
)


def _kv(spark, n=10):
    return spark.range(n).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )


def _file_census(path):
    return sorted(
        os.path.join(r, f)
        for r, _d, fs in os.walk(path)
        for f in fs
    )


@pytest.fixture()
def source(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "src"))
    t.append(_kv(spark), stats_cols=("k",))
    t.delete_where_mor("k", 3, 3)  # a deletion vector to carry over
    t.set_properties({"team": "x"})
    t.add_constraint("v_nonneg", "v >= 0")
    return t


def test_shallow_clone_is_zero_copy_and_exact(spark, source, tmp_path):
    before = _file_census(source.root)
    cl = source.clone_to(str(tmp_path / "cl"))
    assert _file_census(source.root) == before  # nothing written source-side
    assert sorted(r.k for r in cl.snapshot().collect()) == [
        0, 1, 2, 4, 5, 6, 7, 8, 9,
    ]  # the MOR delete carried over via the re-keyed vector
    # no data bytes under the clone: only log + dv sidecars
    assert not (cl.root / "data").exists()
    assert cl.properties() == {"team": "x"}
    assert cl.detail()["constraints"] == {"v_nonneg": "v >= 0"}
    assert cl.latest_version() == 1
    assert cl.history()[0]["params"]["clone"]["shallow"] is True


def test_clone_is_independent_both_ways(spark, source, tmp_path):
    cl = source.clone_to(str(tmp_path / "cl"))
    # full DML surface on the clone's absolute references
    cl.delete_where("k", 5, 6, stats_cols=("k",))      # COW
    cl.delete_where_mor("k", 7, 7)                     # MOR over abs ref
    merge_into(
        cl,
        spark.createDataFrame([(8, 800), (100, 1)], "k long, v long"),
        "k",
        stats_cols=("k",),
    )
    assert sorted((r.k, r.v) for r in cl.snapshot().collect()) == [
        (0, 0), (1, 2), (2, 4), (4, 8), (8, 800), (9, 18), (100, 1),
    ]
    # source untouched by any of it
    assert sorted(r.k for r in source.snapshot().collect()) == [
        0, 1, 2, 4, 5, 6, 7, 8, 9,
    ]
    # and source commits don't appear in the clone
    source.append(_kv(spark, 1), stats_cols=("k",))
    assert (0, 0) in {
        (r.k, r.v) for r in cl.snapshot().collect()
    } and cl.snapshot().count() == 7


def test_clone_constraint_enforced_on_new_writes(spark, source, tmp_path):
    from etl_data_lake_spark.sources.txn import ConstraintViolationError

    cl = source.clone_to(str(tmp_path / "cl"))
    with pytest.raises(ConstraintViolationError):
        cl.append(
            spark.createDataFrame([(1, -5)], "k long, v long"),
            stats_cols=("k",),
        )


def test_clone_compact_localizes_then_vacuum_spares_source(
    spark, source, tmp_path
):
    cl = source.clone_to(str(tmp_path / "cl"))
    cl.compact()
    assert all(
        f.startswith("data/") for f in cl.snapshot_meta().files
    )  # every entry migrated into clone-local storage
    src_before = _file_census(source.root)
    cl.vacuum(keep_versions=1)
    assert _file_census(source.root) == src_before
    assert sorted(r.k for r in cl.snapshot().collect()) == [
        0, 1, 2, 4, 5, 6, 7, 8, 9,
    ]


def test_deep_clone_has_no_source_dependence(spark, source, tmp_path):
    dc = source.clone_to(str(tmp_path / "deep"), shallow=False)
    assert all(f.startswith("data/") for f in dc.snapshot_meta().files)
    # brutal proof: destroy the source, the deep clone still reads
    import shutil

    shutil.rmtree(source.root)
    assert sorted(r.k for r in dc.snapshot().collect()) == [
        0, 1, 2, 4, 5, 6, 7, 8, 9,
    ]


def test_relative_root_applies_deletion_vectors(spark, tmp_path):
    # _metadata.file_path is absolute while the handle's root may be
    # spelled RELATIVE (against the shared driver/JVM cwd): the
    # manifest-key reduction must still match, or deletion vectors
    # silently stop applying and deleted rows resurrect (the
    # review-pass finding this pins)
    rel = os.path.relpath(tmp_path / "rel_table", os.getcwd())
    assert not os.path.isabs(rel)
    t = TxnTable(spark, rel)
    t.append(_kv(spark, 6), stats_cols=("k",))
    t.delete_where_mor("k", 2, 3)
    assert sorted(r.k for r in t.snapshot().collect()) == [0, 1, 4, 5]
    merge_into(
        t,
        spark.createDataFrame([(4, 400)], "k long, v long"),
        "k",
        stats_cols=("k",),
    )
    assert sorted((r.k, r.v) for r in t.snapshot().collect()) == [
        (0, 0), (1, 2), (4, 400), (5, 10),
    ]


def test_clone_of_vacuumed_version_fails_fast(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "src"))
    t.append(_kv(spark, 3), stats_cols=("k",))  # v1
    t.overwrite(_kv(spark, 2), stats_cols=("k",))  # v2
    t.vacuum(keep_versions=1)
    with pytest.raises(FileNotFoundError, match="vacuumed"):
        t.clone_to(str(tmp_path / "cl"), version=1)


def test_clone_refuses_existing_target(spark, source, tmp_path):
    source.clone_to(str(tmp_path / "cl"))
    with pytest.raises(ValueError, match="already has a committed"):
        source.clone_to(str(tmp_path / "cl"))


def test_clone_of_version_time_travels(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "src"))
    t.append(_kv(spark, 3), stats_cols=("k",))          # v1
    t.append(_kv(spark, 2), stats_cols=("k",))          # v2
    cl = t.clone_to(str(tmp_path / "cl"), version=1)
    assert cl.snapshot().count() == 3


def test_clone_identity_watermark_forks(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "src"))
    t.append(_kv(spark, 4), stats_cols=("k",))
    t.add_identity_column("rid", start=1)
    t.append(_kv(spark, 2), stats_cols=("k",))
    cl = t.clone_to(str(tmp_path / "cl"))
    cl.append(_kv(spark, 2), stats_cols=("k",))
    rid_src = {r.rid for r in t.snapshot().collect() if r.rid is not None}
    rid_cl = {r.rid for r in cl.snapshot().collect() if r.rid is not None}
    # clone allocations start past the carried watermark: unique
    # within the clone, and the shared prefix is identical
    assert rid_src <= rid_cl or rid_cl >= rid_src  # prefix carried
    assert len(rid_cl) == len(
        [r for r in cl.snapshot().collect() if r.rid is not None]
    )


# ------------------------------------------------------- convert ----


def test_convert_in_place_reads_and_prunes(spark, tmp_path):
    raw = str(tmp_path / "raw")
    (
        spark.range(8)
        .select(F.col("id").alias("a"), (F.col("id") % 3).alias("b"))
        .repartition(4)
        .write.parquet(raw)
    )
    t = convert_parquet_dir(spark, raw, stats_cols=("a",))
    raw_df = spark.read.parquet(raw + "/*.parquet")
    assert sorted(r.a for r in t.snapshot().collect()) == sorted(
        r.a for r in raw_df.collect()
    )
    # footer stats drive pruning from commit one
    kept, total = t.files_matching({"a": (7, 7)})
    assert total >= 1 and len(kept) < total


def test_convert_then_full_dml_surface(spark, tmp_path):
    raw = str(tmp_path / "raw")
    (
        spark.range(8)
        .select(F.col("id").alias("a"), (F.col("id") % 3).alias("b"))
        .write.parquet(raw)
    )
    t = convert_parquet_dir(spark, raw, stats_cols=("a",))
    t.append(
        spark.range(2).select(
            (F.col("id") + 100).alias("a"), F.lit(9).alias("b")
        ),
        stats_cols=("a",),
    )
    t.delete_where("a", 0, 1, stats_cols=("a",))
    t.update_where_expr("a = 7", {"b": "b + 10"})
    t.delete_where_mor("a", 2, 2)  # MOR over a converted bare-name entry
    assert sorted((r.a, r.b) for r in t.snapshot().collect()) == [
        (3, 0), (4, 1), (5, 2), (6, 0), (7, 11), (100, 9), (101, 9),
    ]
    # vacuum never crashes on bare-name entries and keeps them
    t.vacuum(keep_versions=1)
    assert t.snapshot().count() == 7


def test_convert_rejects_hive_partitions_and_relog(spark, tmp_path):
    raw = str(tmp_path / "raw")
    (
        spark.range(4)
        .select(F.col("id").alias("a"), (F.col("id") % 2).alias("p"))
        .write.partitionBy("p")
        .parquet(raw)
    )
    with pytest.raises(ValueError, match="hive-partitioned"):
        convert_parquet_dir(spark, raw)
    flat = str(tmp_path / "flat")
    spark.range(3).write.parquet(flat)
    convert_parquet_dir(spark, flat)
    with pytest.raises(ValueError, match="transaction log"):
        convert_parquet_dir(spark, flat)


def test_convert_unifies_widening_schemas(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    raw = tmp_path / "raw"
    raw.mkdir()
    pq.write_table(
        pa.table({"a": pa.array([1, 2], type=pa.int32())}),
        raw / "one.parquet",
    )
    pq.write_table(
        pa.table({"a": pa.array([3], type=pa.int64())}),
        raw / "two.parquet",
    )
    t = convert_parquet_dir(spark, str(raw), stats_cols=("a",))
    got = t.snapshot()
    assert dict(got.dtypes)["a"] == "bigint"
    assert sorted(r.a for r in got.collect()) == [1, 2, 3]
