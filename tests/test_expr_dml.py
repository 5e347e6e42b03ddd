"""Generalized SQL-predicate DML (round-4 verdict #3):
``TxnTable.delete_where_expr`` / ``update_where_expr`` — arbitrary
WHERE expressions with optional prune-hint ranges, touched-file-only
rewrites, delete/update conflict rules, exactly-once replay, CDF
shape, and deletion-vector interaction."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from etl_data_lake_spark.sources.txn import ConcurrentWriteError, TxnTable


def _kv(spark, *pairs):
    return spark.createDataFrame(list(pairs), "id long, v string")


def _rows(df):
    return sorted((r.id, r.v) for r in df.select("id", "v").collect())


def _three_file_table(spark, path):
    t = TxnTable(spark, path)
    t.append(_kv(spark, (0, "a0"), (1, "a1")).coalesce(1), stats_cols=("id",))
    t.append(_kv(spark, (100, "b0"), (101, "b1")).coalesce(1), stats_cols=("id",))
    t.append(_kv(spark, (200, "c0"), (201, "c1")).coalesce(1), stats_cols=("id",))
    return t


# ------------------------------------------------------ delete_where_expr --


def test_delete_expr_compound_predicate(spark, tmp_path):
    t = _three_file_table(spark, str(tmp_path / "t"))
    t.delete_where_expr("id >= 100 AND v LIKE 'b%'", stats_cols=("id",))
    assert _rows(t.snapshot()) == [
        (0, "a0"), (1, "a1"), (200, "c0"), (201, "c1"),
    ]
    assert t.history()[-1]["operation"] == "delete"
    assert t.history()[-1]["params"]["predicate"] == "id >= 100 AND v LIKE 'b%'"


def test_delete_expr_null_predicate_rows_survive(spark, tmp_path):
    """SQL DELETE semantics: rows where the predicate is UNKNOWN
    (NULL) are NOT deleted."""
    t = TxnTable(spark, str(tmp_path / "t"))
    t.append(
        spark.createDataFrame(
            [(1, "a"), (2, None), (3, "del")], "id long, v string"
        ).coalesce(1),
        stats_cols=("id",),
    )
    t.delete_where_expr("v = 'del'")
    assert _rows(t.snapshot()) == [(1, "a"), (2, None)]


def test_delete_expr_rewrites_only_touched_files(spark, tmp_path):
    """Without hints every file is a CANDIDATE (scanned once), but
    only files containing a TRUE row are REWRITTEN — the others
    survive byte-identical in the manifest."""
    t = _three_file_table(spark, str(tmp_path / "t"))
    before = set(t.snapshot_meta().files)
    t.delete_where_expr("v = 'b1'", stats_cols=("id",))
    after = set(t.snapshot_meta().files)
    assert len(before & after) == 2  # files a and c untouched
    assert _rows(t.snapshot()) == [
        (0, "a0"), (1, "a1"), (100, "b0"), (200, "c0"), (201, "c1"),
    ]


def test_delete_expr_prune_hints_same_answer(spark, tmp_path):
    ta = _three_file_table(spark, str(tmp_path / "a"))
    tb = _three_file_table(spark, str(tmp_path / "b"))
    ta.delete_where_expr("id BETWEEN 100 AND 150 AND v != 'zzz'")
    tb.delete_where_expr(
        "id BETWEEN 100 AND 150 AND v != 'zzz'",
        prune_hints={"id": [(100, 150)]},
    )
    assert _rows(ta.snapshot()) == _rows(tb.snapshot())
    # both file-b rows matched -> its rewrite staged zero rows (_stage
    # drops empty parts): only the two untouched original files remain
    assert len(set(tb.snapshot_meta().files)) == 2


def test_delete_expr_no_match_is_noop(spark, tmp_path):
    t = _three_file_table(spark, str(tmp_path / "t"))
    v = t.latest_version()
    assert t.delete_where_expr("v = 'nope'") == v
    assert t.latest_version() == v


def test_delete_expr_bad_predicate_raises_before_any_commit(spark, tmp_path):
    t = _three_file_table(spark, str(tmp_path / "t"))
    v = t.latest_version()
    with pytest.raises(AnalysisException):
        t.delete_where_expr("no_such_col = 1")
    with pytest.raises(ValueError):
        t.delete_where_expr("id = 1", prune_hints={"ghost": [(0, 1)]})
    assert t.latest_version() == v


def test_delete_expr_exactly_once_replay(spark, tmp_path):
    t = _three_file_table(spark, str(tmp_path / "t"))
    v1 = t.delete_where_expr("id = 0", app_id="job", txn_seq=7)
    v2 = t.delete_where_expr("id = 1", app_id="job", txn_seq=7)  # replay
    assert v1 == v2
    assert _rows(t.snapshot()) == [
        (1, "a1"), (100, "b0"), (101, "b1"), (200, "c0"), (201, "c1"),
    ]


def test_delete_expr_conflicts_if_inputs_replaced(spark, tmp_path):
    """Same conflict rule as delete_where_ranges: a concurrent rewrite
    of the touched files aborts the delete."""
    path = str(tmp_path / "t")
    t = _three_file_table(spark, path)
    base = t.snapshot_meta()
    pred, candidates = t._expr_dml_candidates(base, "id <= 1", None)
    touched = [
        r["__file"]
        for r in t.read_files(base, candidates, keep_file_col="__file")
        .where(pred).select("__file").distinct().collect()
    ]
    old = t.read_files(base, touched)
    staged, _sj, stats = t._stage(old.where(~pred | pred.isNull()), ("id",))
    TxnTable(spark, path).compact(stats_cols=("id",))
    with pytest.raises(ConcurrentWriteError):
        t._commit(
            "delete", staged, base.schema().json(), None, None,
            replaced=tuple(touched), staged_stats=stats,
        )


def test_delete_expr_applies_and_retires_deletion_vectors(spark, tmp_path):
    """A MOR-deleted row must not resurrect through the expr rewrite,
    and the rewritten file's vector is retired."""
    t = TxnTable(spark, str(tmp_path / "t"))
    t.append(
        _kv(spark, (1, "a"), (2, "b"), (3, "c")).coalesce(1),
        stats_cols=("id",),
    )
    t.delete_where_mor("id", 2, 2)
    assert t.snapshot_meta().file_dvs  # vector exists
    t.delete_where_expr("v = 'c'")
    assert _rows(t.snapshot()) == [(1, "a")]
    assert not t.snapshot_meta().file_dvs  # retired by the rewrite


# ------------------------------------------------------ update_where_expr --


def test_update_expr_compound_predicate_and_set(spark, tmp_path):
    t = _three_file_table(spark, str(tmp_path / "t"))
    t.update_where_expr(
        "id % 2 = 1 AND v LIKE 'b%'",
        {"v": "upper(v)"},
        stats_cols=("id",),
    )
    assert _rows(t.snapshot()) == [
        (0, "a0"), (1, "a1"), (100, "b0"), (101, "B1"),
        (200, "c0"), (201, "c1"),
    ]
    assert t.history()[-1]["operation"] == "update"


def test_update_expr_null_predicate_rows_untouched(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "t"))
    t.append(
        spark.createDataFrame(
            [(1, "hit"), (2, None), (3, "x")], "id long, v string"
        ).coalesce(1),
        stats_cols=("id",),
    )
    t.update_where_expr("v = 'hit'", {"v": "'HIT'"})
    assert _rows(t.snapshot()) == [(1, "HIT"), (2, None), (3, "x")]


def test_update_expr_schema_invariant_and_cast_back(spark, tmp_path):
    t = _three_file_table(spark, str(tmp_path / "t"))
    before = t.snapshot_meta().schema()
    # expression evaluates to int; must cast back to long
    t.update_where_expr("id = 0", {"id": "CAST(50 AS INT)"})
    assert t.snapshot_meta().schema() == before
    assert (50, "a0") in _rows(t.snapshot())


def test_update_expr_touches_only_matching_files(spark, tmp_path):
    t = _three_file_table(spark, str(tmp_path / "t"))
    before = set(t.snapshot_meta().files)
    t.update_where_expr(
        "v = 'c0'", {"v": "'C0'"}, prune_hints={"id": [(200, 300)]},
        stats_cols=("id",),
    )
    after = set(t.snapshot_meta().files)
    assert len(before & after) == 2
    assert (200, "C0") in _rows(t.snapshot())


def test_update_expr_validation(spark, tmp_path):
    t = _three_file_table(spark, str(tmp_path / "t"))
    with pytest.raises(ValueError):
        t.update_where_expr("id = 1", {})
    with pytest.raises(ValueError):
        t.update_where_expr("id = 1", {"ghost": "'x'"})
    with pytest.raises(AnalysisException):
        t.update_where_expr("ghost = 1", {"v": "'x'"})


def test_update_expr_cdf_delete_insert_pairs(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "t"))
    t.append(_kv(spark, (1, "a"), (2, "b")).coalesce(1), stats_cols=("id",))
    v = t.update_where_expr("id = 2", {"v": "'B'"})
    ch = t.table_changes(v - 1, v)
    kinds = sorted(
        (r.id, r._change_type) for r in ch.select("id", "_change_type").collect()
    )
    assert (2, "delete") in kinds and (2, "insert") in kinds
    assert all(i == 2 for i, _ in kinds)  # untouched row 1 not re-reported


def test_expr_dml_rejects_nondeterministic_predicate(spark, tmp_path):
    """Probe and rewrite are separate jobs; a nondeterministic
    predicate would match no single row set (Delta rejects these
    too)."""
    t = _three_file_table(spark, str(tmp_path / "t"))
    v = t.latest_version()
    with pytest.raises(ValueError, match="[Nn]ondeterministic"):
        t.delete_where_expr("rand() < 0.5")
    with pytest.raises(ValueError, match="[Nn]ondeterministic"):
        t.update_where_expr("id > 0 AND rand() < 0.5", {"v": "'x'"})
    assert t.latest_version() == v


# ------------------------------------------------- expr x MOR forms --


def test_delete_expr_mor_vectors_without_rewrite(spark, tmp_path):
    t = _three_file_table(spark, str(tmp_path / "t"))
    before = set(t.snapshot_meta().files)
    t.delete_where_expr_mor("v LIKE 'b%' AND id % 2 = 0")
    meta = t.snapshot_meta()
    assert set(meta.files) == before  # zero rewrites
    assert len(meta.file_dvs) == 1  # only file b vectored
    assert _rows(t.snapshot()) == [
        (0, "a0"), (1, "a1"), (101, "b1"), (200, "c0"), (201, "c1"),
    ]
    assert t.history()[-1]["params"]["mor"] is True
    # idempotent union: re-delete matches nothing new, commits nothing
    v = t.latest_version()
    assert t.delete_where_expr_mor("v LIKE 'b%' AND id % 2 = 0") == v


def test_delete_expr_mor_null_rows_survive_and_replay(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "t"))
    t.append(
        spark.createDataFrame(
            [(1, "a"), (2, None), (3, "del")], "id long, v string"
        ).coalesce(1),
        stats_cols=("id",),
    )
    v1 = t.delete_where_expr_mor("v = 'del'", app_id="m", txn_seq=1)
    v2 = t.delete_where_expr_mor("v = 'a'", app_id="m", txn_seq=1)
    assert v1 == v2  # replayed
    assert _rows(t.snapshot()) == [(1, "a"), (2, None)]


def test_update_expr_mor_appends_and_vectors(spark, tmp_path):
    t = _three_file_table(spark, str(tmp_path / "t"))
    before = set(t.snapshot_meta().files)
    v = t.update_where_expr_mor(
        "v IN ('a1', 'c0')", {"v": "upper(v)"}, stats_cols=("id",)
    )
    meta = t.snapshot_meta()
    assert before <= set(meta.files)  # originals all live
    assert len(set(meta.files) - before) >= 1  # plus the update file
    assert len(meta.file_dvs) == 2
    assert _rows(t.snapshot()) == [
        (0, "a0"), (1, "A1"), (100, "b0"), (101, "b1"),
        (200, "C0"), (201, "c1"),
    ]
    ch = t.table_changes(v - 1, v)
    kinds = sorted(
        (r.id, r._change_type)
        for r in ch.select("id", "_change_type").collect()
    )
    assert kinds == [
        (1, "delete"), (1, "insert"), (200, "delete"), (200, "insert"),
    ]


def test_update_expr_mor_skips_mor_deleted_rows(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "t"))
    t.append(_kv(spark, (1, "a"), (2, "b"), (3, "c")).coalesce(1),
             stats_cols=("id",))
    t.delete_where_mor("id", 2, 2)
    t.update_where_expr_mor("id >= 1", {"v": "upper(v)"})
    assert _rows(t.snapshot()) == [(1, "A"), (3, "C")]  # no resurrection


def test_expr_mor_validation(spark, tmp_path):
    t = _three_file_table(spark, str(tmp_path / "t"))
    with pytest.raises(ValueError, match="[Nn]ondeterministic"):
        t.delete_where_expr_mor("rand() < 0.5")
    with pytest.raises(ValueError, match="SET"):
        t.update_where_expr_mor("id = 1", {})
    with pytest.raises(AnalysisException):
        t.update_where_expr_mor("ghost = 1", {"v": "'x'"})
    with pytest.raises(ValueError, match="max_dv_rows"):
        t.delete_where_expr_mor("id >= 0", max_dv_rows=1)
