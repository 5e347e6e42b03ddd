"""Bloom-filter sidecars (sources/bloomindex.py): point-lookup file
skipping where min/max stats can't help — no false negatives ever,
false positives bounded, missing sidecars conservative."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from etl_data_lake_spark.sources.bloomindex import (
    _sidecar_path,
    build_bloom_index,
    files_matching_eq,
    snapshot_where_eq,
    vacuum_bloom,
)
from etl_data_lake_spark.sources.txn import TxnTable


def _interleaved_table(spark, path, n_files=4, rows_per_file=500):
    """Files whose `uid` stats all span ~the whole key space (round-
    robin assignment), so min/max pruning is useless for point
    lookups — the bloom's home turf."""
    t = TxnTable(spark, path)
    for i in range(n_files):
        df = (
            spark.range(i, n_files * rows_per_file, n_files)
            .select(
                F.concat(F.lit("user-"), F.col("id")).alias("uid"),
                F.col("id").alias("n"),
            )
            .coalesce(1)
        )
        t.append(df, stats_cols=("uid",))
    return t


def test_bloom_prunes_files_minmax_cannot(spark, tmp_path):
    t = _interleaved_table(spark, str(tmp_path / "t"))
    built = build_bloom_index(t, ["uid"])
    assert built == 4
    # min/max alone keeps every file for an interior probe
    meta = t.snapshot_meta()
    # present value: its file MUST be kept (no false negatives)
    keep, total = files_matching_eq(t, "uid", ["user-6"])
    assert total == 4
    rows = snapshot_where_eq(t, "uid", ["user-6"]).collect()
    assert [r.n for r in rows] == [6]
    # id=6 lives in file i=6%4=2 only; bloom should keep ~1 file
    assert 1 <= len(keep) <= 2
    # absent values prune hard at fpp=1%: across 50 probes virtually
    # no file survives (deterministic given fixed data + xxhash64)
    absent = [f"nobody-{i}" for i in range(50)]
    kept_counts = sum(
        len(files_matching_eq(t, "uid", [v])[0]) for v in absent
    )
    assert kept_counts <= 10  # 200 (file, probe) pairs, <=5% fp


def test_bloom_no_false_negatives_sweep(spark, tmp_path):
    t = _interleaved_table(spark, str(tmp_path / "t"), rows_per_file=200)
    build_bloom_index(t, ["uid"])
    # every 37th key: the row must always be reachable through the
    # pruned file set
    for i in range(0, 800, 37):
        got = snapshot_where_eq(t, "uid", [f"user-{i}"]).collect()
        assert len(got) == 1 and got[0].n == i


def test_bloom_multi_value_probe_unions_files(spark, tmp_path):
    t = _interleaved_table(spark, str(tmp_path / "t"))
    build_bloom_index(t, ["uid"])
    got = snapshot_where_eq(t, "uid", ["user-0", "user-1", "user-2"])
    assert sorted(r.n for r in got.collect()) == [0, 1, 2]


def test_bloom_missing_sidecar_conservative(spark, tmp_path):
    t = _interleaved_table(spark, str(tmp_path / "t"))
    build_bloom_index(t, ["uid"])
    # a new append has no sidecar yet -> its file is always kept
    t.append(
        spark.createDataFrame([("user-9999", 9999)], "uid string, n long")
        .coalesce(1),
        stats_cols=("uid",),
    )
    got = snapshot_where_eq(t, "uid", ["user-9999"]).collect()
    assert len(got) == 1 and got[0].n == 9999


def test_bloom_incremental_build_touches_only_new_files(spark, tmp_path):
    t = _interleaved_table(spark, str(tmp_path / "t"))
    assert build_bloom_index(t, ["uid"]) == 4
    t.append(
        spark.createDataFrame([("user-x", 1)], "uid string, n long")
        .coalesce(1),
        stats_cols=("uid",),
    )
    assert build_bloom_index(t, ["uid"]) == 1  # only the new file
    assert build_bloom_index(t, ["uid"]) == 0  # idempotent


def test_bloom_second_column_independent_sidecars(spark, tmp_path):
    t = _interleaved_table(spark, str(tmp_path / "t"), n_files=2)
    build_bloom_index(t, ["uid"])
    built = build_bloom_index(t, ["n"])
    assert built == 2
    # one document per (file, column): concurrent per-column builds
    # can never clobber each other through a shared doc
    f = t.snapshot_meta().files[0]
    for col in ("uid", "n"):
        doc = json.loads(_sidecar_path(t.root, f, col).read_text())
        assert {"m", "k", "bits"} <= set(doc)
    # numeric column probes work too
    got = snapshot_where_eq(t, "n", [5]).collect()
    assert len(got) == 1 and got[0].uid == "user-5"


def test_bloom_null_only_file_gets_empty_filter(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "t"))
    t.append(
        spark.createDataFrame([(None, 1), (None, 2)], "uid string, n long")
        .coalesce(1)
    )
    assert build_bloom_index(t, ["uid"]) == 1
    keep, total = files_matching_eq(t, "uid", ["anything"])
    assert keep == [] and total == 1
    # null probe values are dropped (null never equals anything)
    assert snapshot_where_eq(t, "uid", [None]).count() == 0


def test_vacuum_bloom_follows_data_vacuum(spark, tmp_path):
    t = _interleaved_table(spark, str(tmp_path / "t"), n_files=2)
    build_bloom_index(t, ["uid"])
    t.compact()  # old files replaced
    t.vacuum(keep_versions=1)
    removed = vacuum_bloom(t)
    assert removed == 2
    # compacted file has no sidecar -> conservative, still correct
    got = snapshot_where_eq(t, "uid", ["user-3"]).collect()
    assert len(got) == 1
