"""Column mapping: RENAME / DROP COLUMN without data rewrites.

Delta's column-mapping design: the LOGICAL name is what readers and
writers use; the PHYSICAL parquet name is assigned once and never
changes, so a rename is a metadata-only commit and every existing
file keeps reading correctly. Dropping retires the physical name so
later appends can never resurrect the old bytes under a reused name.
Manifest stats, bloom sidecars, and deletion vectors are keyed by
physical names and survive renames untouched.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_data_lake_spark.sources.merge import merge_into
from etl_data_lake_spark.sources.txn import (
    ConcurrentWriteError,
    SchemaEvolutionError,
    TxnTable,
)


def _mk(spark, rows, schema="id int, v string"):
    return spark.createDataFrame(rows, schema).coalesce(1)


def _t(spark, path):
    t = TxnTable(spark, path)
    t.append(_mk(spark, [(1, "a"), (2, "b")]), stats_cols=("id", "v"))
    t.append(_mk(spark, [(100, "c"), (101, "d")]), stats_cols=("id", "v"))
    return t


def test_rename_is_metadata_only_and_reads_work(spark, tmp_path):
    t = _t(spark, str(tmp_path / "t"))
    files_before = set(t.snapshot_meta().files)
    v = t.rename_column("id", "doc_id")
    meta = t.snapshot_meta()
    assert set(meta.files) == files_before  # nothing rewritten
    assert meta.schema().fieldNames() == ["doc_id", "v"]
    assert meta.column_map == {"doc_id": "id"}
    assert t.history()[-1]["operation"] == "schema"
    got = sorted((r.doc_id, r.v) for r in t.snapshot().collect())
    assert got == [(1, "a"), (2, "b"), (100, "c"), (101, "d")]
    # time travel: the pre-rename version still reads the OLD name
    assert t.snapshot(v - 1).columns == ["id", "v"]
    # stats pruning works through the new logical name
    keep, total = t.files_matching({"doc_id": (0, 10)})
    assert total == 2 and len(keep) == 1
    assert sorted(
        r.doc_id for r in t.snapshot_where("doc_id", 0, 10).collect()
    ) == [1, 2]


def test_rename_then_write_paths_stay_consistent(spark, tmp_path):
    t = _t(spark, str(tmp_path / "t"))
    t.rename_column("id", "doc_id")
    # append with the NEW logical name: written under the stable
    # physical name, so both old and new files read as one column
    t.append(
        _mk(spark, [(200, "e")], "doc_id int, v string"),
        stats_cols=("doc_id",),
    )
    assert sorted(r.doc_id for r in t.snapshot().collect()) == [
        1, 2, 100, 101, 200,
    ]
    keep, total = t.files_matching({"doc_id": (200, 200)})
    assert total == 3 and len(keep) == 1  # new file's stats prune too
    # merge keyed on the renamed column
    res = merge_into(
        t,
        _mk(spark, [(1, "A"), (300, "NEW")], "doc_id int, v string"),
        "doc_id",
        stats_cols=("doc_id",),
    )
    assert res.committed
    got = {r.doc_id: r.v for r in t.snapshot().collect()}
    assert got[1] == "A" and got[300] == "NEW"
    # COW update + MOR delete through the new name
    t.update_where("doc_id", 2, 2, {"v": "'B'"}, stats_cols=("doc_id",))
    t.delete_where_mor("doc_id", 100, 100)
    got = {r.doc_id: r.v for r in t.snapshot().collect()}
    assert got[2] == "B" and 100 not in got


def test_drop_column_hides_and_retires(spark, tmp_path):
    t = _t(spark, str(tmp_path / "t"))
    files_before = set(t.snapshot_meta().files)
    t.drop_column("v")
    meta = t.snapshot_meta()
    assert set(meta.files) == files_before
    assert meta.schema().fieldNames() == ["id"]
    assert meta.retired_cols == ("v",)
    assert t.snapshot().columns == ["id"]
    assert t.snapshot().count() == 4
    # re-adding the SAME name is rejected: the old bytes would
    # resurrect under it
    with pytest.raises(SchemaEvolutionError):
        t.append(_mk(spark, [(5, "ghost")], "id int, v string"))
    # a different name evolves fine; old files read it as null
    t.append(_mk(spark, [(5, "fresh")], "id int, v2 string"))
    rows = {r.id: r.v2 for r in t.snapshot().collect()}
    assert rows[5] == "fresh" and rows[1] is None
    # drop is idempotent for unknown names
    assert t.drop_column("nope") == t.latest_version()


def test_rename_drop_blocked_by_constraints(spark, tmp_path):
    t = _t(spark, str(tmp_path / "t"))
    t.add_constraint("id_pos", "id > 0")
    with pytest.raises(ValueError):
        t.rename_column("id", "doc_id")
    with pytest.raises(ValueError):
        t.drop_column("id")
    t.drop_constraint("id_pos")
    t.rename_column("id", "doc_id")
    assert t.snapshot().columns == ["doc_id", "v"]


def test_mapping_survives_checkpoint_and_restore(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "t"), checkpoint_interval=4)
    t.append(_mk(spark, [(1, "a")]), stats_cols=("id",))
    pre = t.latest_version()
    t.rename_column("id", "doc_id")
    for i in range(6):  # cross a checkpoint
        t.append(
            _mk(spark, [(10 + i, "x")], "doc_id int, v string"),
            stats_cols=("doc_id",),
        )
    assert t.read_plan().checkpoint > 0
    t2 = TxnTable(spark, str(tmp_path / "t"), checkpoint_interval=4)
    assert t2.snapshot_meta().column_map == {"doc_id": "id"}
    assert sorted(r.doc_id for r in t2.snapshot().collect()) == [
        1, 10, 11, 12, 13, 14, 15,
    ]
    # restore to the pre-rename version rolls the schema AND map back
    t2.restore(pre)
    meta = t2.snapshot_meta()
    assert meta.schema().fieldNames() == ["id", "v"]
    assert meta.column_map == {}
    assert sorted(r.id for r in t2.snapshot().collect()) == [1]


def test_rename_validation_and_races(spark, tmp_path):
    t = _t(spark, str(tmp_path / "t"))
    with pytest.raises(ValueError):
        t.rename_column("id", "id")
    with pytest.raises(ValueError):
        t.rename_column("nope", "x")
    with pytest.raises(ValueError):
        t.rename_column("id", "v")  # exists
    one = TxnTable(spark, str(tmp_path / "one"))
    one.append(spark.createDataFrame([(1,)], "id int"))
    with pytest.raises(ValueError):
        one.drop_column("id")  # cannot drop the only column
    # deterministic race: the schema commit pins its base
    base = t.snapshot_meta()
    t.append(_mk(spark, [(7, "g")]))
    with pytest.raises(ConcurrentWriteError):
        t._commit(
            "schema", [], base.schema_json, None, None,
            expected_base=base.version,
            column_map={"doc_id": "id"},
        )
    # a new logical name may not collide with an existing PHYSICAL
    t.rename_column("id", "doc_id")
    with pytest.raises(SchemaEvolutionError):
        t.append(_mk(spark, [(9, "h")], "id int, v string"))


def test_mapping_cdf_bloom_files_df(spark, tmp_path):
    from etl_data_lake_spark.sources.bloomindex import (
        build_bloom_index,
        snapshot_where_eq,
    )
    from etl_data_lake_spark.sources.cdf import changes_between

    t = _t(spark, str(tmp_path / "t"))
    build_bloom_index(t, ("id",))
    t.rename_column("id", "doc_id")
    # bloom sidecars are keyed by the physical name: probes through
    # the NEW logical name still prune and still answer exactly
    assert sorted(
        r.doc_id for r in snapshot_where_eq(t, "doc_id", [1, 100]).collect()
    ) == [1, 100]
    # CDF across the rename uses the end schema's logical names
    v0 = t.latest_version()
    t.delete_where_mor("doc_id", 1, 1)
    ch = sorted(
        (r.doc_id, r._change_type)
        for r in changes_between(t, v0, t.latest_version()).collect()
    )
    assert ch == [(1, "delete")]
    # files_df shows stats under logical keys
    for r in t.files_df().collect():
        assert "doc_id" in r.stats and "id" not in r.stats


def test_add_constraint_sees_real_values_under_mapping(spark, tmp_path):
    """Validation reads the physical parquet names: a violating row in
    a RENAMED column must block the constraint (it used to read as
    all-null under mapping and pass vacuously)."""
    from etl_data_lake_spark.sources.txn import ConstraintViolationError

    t = TxnTable(spark, str(tmp_path / "t"))
    t.append(_mk(spark, [(1, -5)], "id int, val int"))
    t.rename_column("val", "amount")
    with pytest.raises(ConstraintViolationError):
        t.add_constraint("amount_pos", "amount > 0")
    # and a satisfiable one both adds and then enforces appends
    t.add_constraint("amount_gt_min", "amount > -10")
    with pytest.raises(ConstraintViolationError):
        t.append(_mk(spark, [(2, -50)], "id int, amount int"))
