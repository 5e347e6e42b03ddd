"""Lossless type widening in append evolution (Delta's type-widening
feature, integral/float subset): wider incoming columns widen the
published schema, narrower ones read under the table's wider type,
lossy changes still raise — plus the bloom-sidecar invalidation that
keeps point-lookup pruning sound across a widen."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_data_lake_spark.sources.txn import SchemaEvolutionError, TxnTable


def _mk(spark, rows, schema):
    return spark.createDataFrame(rows, schema).coalesce(1)


def test_widen_int_to_long_and_float_to_double(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "t"))
    t.append(_mk(spark, [(1, 1.5)], "a int, b float"), stats_cols=("a",))
    t.append(
        _mk(spark, [(2**40, 2.5)], "a long, b double"), stats_cols=("a",)
    )
    sch = t.snapshot_meta().schema()
    assert sch["a"].dataType.simpleString() == "bigint"
    assert sch["b"].dataType.simpleString() == "double"
    rows = sorted((r.a, r.b) for r in t.snapshot().collect())
    assert rows == [(1, 1.5), (2**40, 2.5)]  # old narrow file upcast


def test_narrower_append_reads_under_wide_schema(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "t"))
    t.append(_mk(spark, [(2**40,)], "a long"))
    t.append(_mk(spark, [(7,)], "a int"))  # narrower incoming: fine
    assert t.snapshot_meta().schema()["a"].dataType.simpleString() == "bigint"
    assert sorted(r.a for r in t.snapshot().collect()) == [7, 2**40]


def test_lossy_changes_still_raise(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "t"))
    t.append(_mk(spark, [(1,)], "a long"))
    with pytest.raises(SchemaEvolutionError):
        t.append(_mk(spark, [(1.0,)], "a double"))  # long->double lossy
    t2 = TxnTable(spark, str(tmp_path / "u"))
    t2.append(_mk(spark, [(1,)], "a int"))
    with pytest.raises(SchemaEvolutionError):
        t2.append(_mk(spark, [("x",)], "a string"))
    with pytest.raises(SchemaEvolutionError):
        t2.append(_mk(spark, [(1.0,)], "a float"))  # int->float lossy


def test_widening_time_travel_and_cdf(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "t"))
    t.append(_mk(spark, [(1, "x")], "a int, v string"))
    v1 = t.latest_version()
    t.append(_mk(spark, [(2**40, "y")], "a long, v string"))
    # old version still carries its own (narrow) schema
    assert (
        t.snapshot_meta(v1).schema()["a"].dataType.simpleString() == "int"
    )
    assert [r.a for r in t.snapshot(v1).collect()] == [1]
    # CDF across the widen reads the span under the widest schema
    ch = t.table_changes(v1, v1 + 1)
    assert sorted(
        (r.a, r._change_type) for r in ch.collect()
    ) == [(2**40, "insert")]


def test_widening_through_txnlake_datasource(spark, tmp_path):
    from etl_data_lake_spark.sources.lake_datasource import (
        register_lake_source,
    )

    register_lake_source(spark)
    t = TxnTable(spark, str(tmp_path / "t"))
    t.append(_mk(spark, [(1, 1.5)], "a int, b float"))
    t.append(_mk(spark, [(2**40, 2.5)], "a long, b double"))
    df = spark.read.format("txnlake").load(str(t.root))
    assert df.schema["a"].dataType.simpleString() == "bigint"
    assert sorted((r.a, r.b) for r in df.collect()) == [
        (1, 1.5), (2**40, 2.5),
    ]


def test_widening_with_deletion_vectors(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "t"))
    t.append(
        _mk(spark, [(1, "a"), (2, "b")], "id int, v string"),
        stats_cols=("id",),
    )
    t.delete_where_mor("id", 2, 2)
    t.append(_mk(spark, [(2**40, "c")], "id long, v string"))
    rows = sorted((r.id, r.v) for r in t.snapshot().collect())
    assert rows == [(1, "a"), (2**40, "c")]  # DV survives the widen


def test_widening_invalidates_bloom_without_false_negatives(
    spark, tmp_path
):
    """The sound sequence: bloom skips before the widen; the widening
    commit retires the narrow-typed sidecars (probes conservatively
    keep files — NEVER a false negative); a rebuild restores
    skipping under the wide type."""
    from etl_data_lake_spark.sources.bloomindex import (
        build_bloom_index,
        files_matching_eq,
    )

    t = TxnTable(spark, str(tmp_path / "t"))
    t.append(_mk(spark, [(i, "a") for i in range(100)], "id int, v string"))
    t.append(
        _mk(spark, [(10_000 + i, "b") for i in range(100)], "id int, v string")
    )
    build_bloom_index(t, ("id",))
    keep, total = files_matching_eq(t, "id", [55])
    assert len(keep) == 1 < total  # bloom skipping works (int filters)
    # widen id -> long
    t.append(_mk(spark, [(2**40, "c")], "id long, v string"))
    assert (
        t.snapshot_meta().schema()["id"].dataType.simpleString() == "bigint"
    )
    # narrow-typed filters are gone/ignored: probes keep every file
    # that stats cannot rule out — NO false negative on value 55
    keep, _ = files_matching_eq(t, "id", [55])
    assert any(
        55 in {r.id for r in t.read_files(t.snapshot_meta(), [f]).collect()}
        for f in keep
    )
    # rebuild under the wide type restores skipping
    build_bloom_index(t, ("id",))
    keep, total = files_matching_eq(t, "id", [55])
    assert len(keep) == 1 < total
    rows = t.read_files(t.snapshot_meta(), keep).where(
        F.col("id") == 55
    ).count()
    assert rows == 1
