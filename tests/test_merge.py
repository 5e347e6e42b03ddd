"""MERGE INTO on transactional tables (sources/merge.py): keyed
upsert/delete/insert-only semantics, touched-file incrementality,
ambiguity detection, concurrency guard, exactly-once replay.

Races are simulated deterministically like test_txn.py: the merge is
driven against a snapshot captured BEFORE a concurrent commit lands
(same interleaving a real race produces, no thread flakes)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_data_lake_spark.sources.merge import (
    MergeAmbiguityError,
    MergeResult,
    merge_into,
    merge_upsert_sink,
)
from etl_data_lake_spark.sources.txn import (
    ConcurrentWriteError,
    SchemaEvolutionError,
    TxnTable,
)


def _kv(spark, *pairs):
    return spark.createDataFrame(list(pairs), "id long, v string")


def _rows(df):
    return sorted((r.id, r.v) for r in df.select("id", "v").collect())


def _three_file_table(spark, path):
    """Three appends with disjoint id ranges -> >=3 files with stats."""
    t = TxnTable(spark, path)
    t.append(_kv(spark, (0, "a0"), (1, "a1")).coalesce(1), stats_cols=("id",))
    t.append(_kv(spark, (100, "b0"), (101, "b1")).coalesce(1), stats_cols=("id",))
    t.append(_kv(spark, (200, "c0"), (201, "c1")).coalesce(1), stats_cols=("id",))
    return t


def test_merge_upsert_updates_and_inserts(spark, tmp_path):
    t = _three_file_table(spark, str(tmp_path / "t"))
    res = merge_into(
        t, _kv(spark, (1, "A1"), (300, "new")), "id", stats_cols=("id",)
    )
    assert isinstance(res, MergeResult) and res.committed
    assert _rows(t.snapshot()) == [
        (0, "a0"), (1, "A1"), (100, "b0"), (101, "b1"),
        (200, "c0"), (201, "c1"), (300, "new"),
    ]
    # time travel: pre-merge snapshot intact
    assert _rows(t.snapshot(version=3)) == [
        (0, "a0"), (1, "a1"), (100, "b0"), (101, "b1"),
        (200, "c0"), (201, "c1"),
    ]
    assert t.history()[-1]["operation"] == "merge"


def test_merge_rewrites_only_touched_files(spark, tmp_path):
    t = _three_file_table(spark, str(tmp_path / "t"))
    before = set(t.snapshot_meta().files)
    res = merge_into(t, _kv(spark, (1, "A1")), "id", stats_cols=("id",))
    after = set(t.snapshot_meta().files)
    # exactly the file holding id=1 was replaced; the other two files
    # survive BYTE-IDENTICAL (same manifest paths)
    assert res.files_rewritten == 1
    assert res.files_total == 3
    assert len(before & after) == 2
    # stats pruning kept pass 1 narrow: only the id~1 file was candidate
    assert res.files_candidate == 1


def test_merge_prune_by_stats_no_candidates_pure_insert(spark, tmp_path):
    t = _three_file_table(spark, str(tmp_path / "t"))
    before = set(t.snapshot_meta().files)
    res = merge_into(t, _kv(spark, (500, "x")), "id", stats_cols=("id",))
    assert res.files_candidate == 0 and res.files_rewritten == 0
    assert before <= set(t.snapshot_meta().files)
    assert (500, "x") in _rows(t.snapshot())


def test_merge_matched_delete(spark, tmp_path):
    t = _three_file_table(spark, str(tmp_path / "t"))
    merge_into(
        t,
        _kv(spark, (100, "_"), (201, "_"), (999, "miss")),
        "id",
        when_matched="delete",
        when_not_matched=None,
        stats_cols=("id",),
    )
    assert _rows(t.snapshot()) == [
        (0, "a0"), (1, "a1"), (101, "b1"), (200, "c0"),
    ]


def test_merge_matched_condition_gates_update(spark, tmp_path):
    t = _three_file_table(spark, str(tmp_path / "t"))
    merge_into(
        t,
        _kv(spark, (0, "ZZ"), (1, "keep-old")),
        "id",
        matched_condition="s.v != 'keep-old'",
        when_not_matched=None,
        stats_cols=("id",),
    )
    rows = dict(_rows(t.snapshot()))
    assert rows[0] == "ZZ" and rows[1] == "a1"


def test_merge_update_exprs(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "t"))
    t.append(
        spark.createDataFrame([(1, 10), (2, 20)], "id long, n long"),
        stats_cols=("id",),
    )
    merge_into(
        t,
        spark.createDataFrame([(1, 5), (3, 7)], "id long, n long"),
        "id",
        update_exprs={"n": "t.n + s.n"},
        stats_cols=("id",),
    )
    got = sorted((r.id, r.n) for r in t.snapshot().collect())
    assert got == [(1, 15), (2, 20), (3, 7)]


def test_merge_insert_only_does_not_rewrite(spark, tmp_path):
    t = _three_file_table(spark, str(tmp_path / "t"))
    before = set(t.snapshot_meta().files)
    res = merge_into(
        t,
        _kv(spark, (1, "SHOULD-NOT-APPLY"), (300, "new")),
        "id",
        when_matched=None,
        stats_cols=("id",),
    )
    assert res.files_rewritten == 0
    assert before <= set(t.snapshot_meta().files)
    rows = dict(_rows(t.snapshot()))
    assert rows[1] == "a1" and rows[300] == "new"
    # duplicate source keys are legal for insert-only (Delta semantics)
    merge_into(
        t,
        _kv(spark, (400, "d1"), (400, "d2")),
        "id",
        when_matched=None,
        stats_cols=("id",),
    )
    assert sorted(v for k, v in _rows(t.snapshot()) if k == 400) == ["d1", "d2"]


def test_merge_ambiguous_source_raises(spark, tmp_path):
    t = _three_file_table(spark, str(tmp_path / "t"))
    with pytest.raises(MergeAmbiguityError):
        merge_into(
            t, _kv(spark, (1, "x"), (1, "y")), "id", stats_cols=("id",)
        )
    # and nothing committed
    assert t.history()[-1]["operation"] == "append"


def test_merge_empty_source_is_noop(spark, tmp_path):
    t = _three_file_table(spark, str(tmp_path / "t"))
    v = t.latest_version()
    res = merge_into(t, _kv(spark).limit(0), "id", stats_cols=("id",))
    assert not res.committed and res.version == v
    assert t.latest_version() == v


def test_merge_into_empty_table_inserts_all(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "t"))
    res = merge_into(t, _kv(spark, (1, "a")), "id", stats_cols=("id",))
    assert res.committed and _rows(t.snapshot()) == [(1, "a")]


def test_merge_null_keys_never_match(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "t"))
    t.append(
        spark.createDataFrame([(None, "tnull"), (1, "t1")], "id long, v string"),
        stats_cols=("id",),
    )
    merge_into(
        t,
        spark.createDataFrame([(None, "snull"), (1, "S1")], "id long, v string"),
        "id",
        stats_cols=("id",),
    )
    key = lambda p: (p[0] is None, p[0] if p[0] is not None else 0, p[1])
    got = sorted(((r.id, r.v) for r in t.snapshot().collect()), key=key)
    # target null row kept, source null row inserted, id=1 updated
    assert got == sorted(
        [(1, "S1"), (None, "tnull"), (None, "snull")], key=key
    )


def test_merge_schema_evolution_widens_additively(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "t"))
    t.append(_kv(spark, (1, "a")), stats_cols=("id",))
    merge_into(
        t,
        spark.createDataFrame([(1, "A", 9), (2, "b", 8)],
                              "id long, v string, extra long"),
        "id",
        stats_cols=("id",),
    )
    got = sorted((r.id, r.v, r.extra) for r in t.snapshot().collect())
    assert got == [(1, "A", 9), (2, "b", 8)]
    with pytest.raises(SchemaEvolutionError):
        merge_into(
            t,
            spark.createDataFrame([(1, 2)], "id long, v long"),
            "id",
        )


def test_merge_concurrent_matching_append_conflicts(spark, tmp_path):
    """An append of a row whose key the merge WOULD have matched,
    landing between the merge's snapshot and publish, must abort —
    Delta's ConcurrentAppendException semantics."""
    from etl_data_lake_spark.sources import merge as m
    from etl_data_lake_spark.sources.txn import merge_schemas

    path = str(tmp_path / "t")
    t = _three_file_table(spark, path)
    base = t.snapshot_meta()
    source = _kv(spark, (1, "A1")).persist()
    # concurrent append INSIDE the source's key range, after `base`
    TxnTable(spark, path).append(_kv(spark, (1, "dup")), stats_cols=("id",))
    with pytest.raises(ConcurrentWriteError):
        m._merge_against(
            t, base, source, ["id"], "update", "insert", None, None,
            merge_schemas(base.schema(), source.schema),
            ("id",), None, None, 4096, 8,
        )
    source.unpersist()


def test_merge_concurrent_disjoint_append_rebases(spark, tmp_path):
    from etl_data_lake_spark.sources import merge as m
    from etl_data_lake_spark.sources.txn import merge_schemas

    path = str(tmp_path / "t")
    t = _three_file_table(spark, path)
    base = t.snapshot_meta()
    source = _kv(spark, (1, "A1")).persist()
    TxnTable(spark, path).append(_kv(spark, (900, "z")), stats_cols=("id",))
    res = m._merge_against(
        t, base, source, ["id"], "update", "insert", None, None,
        merge_schemas(base.schema(), source.schema),
        ("id",), None, None, 4096, 8,
    )
    source.unpersist()
    assert res.committed
    rows = dict(_rows(t.snapshot()))
    assert rows[1] == "A1" and rows[900] == "z"


def test_merge_base_files_exempt_from_guard(spark, tmp_path):
    """A base file that intersects the source's key HULL but contains
    no matching key must not trip the guard (pass 1 probed it
    exactly): source keys {0, 201} hull [0, 201] covers the middle
    file (100..101), which is neither touched nor a conflict."""
    t = _three_file_table(spark, str(tmp_path / "t"))
    res = merge_into(
        t,
        _kv(spark, (0, "A0"), (201, "C1")),
        "id",
        stats_cols=("id",),
        max_guard_keys=1,  # force hull guard (no tight ranges)
    )
    assert res.committed and res.files_rewritten == 2
    rows = dict(_rows(t.snapshot()))
    assert rows[0] == "A0" and rows[201] == "C1" and rows[100] == "b0"


def test_merge_exactly_once_replay(spark, tmp_path):
    t = _three_file_table(spark, str(tmp_path / "t"))
    src = _kv(spark, (1, "A1"), (300, "new"))
    v1 = merge_into(
        t, src, "id", app_id="job", txn_seq=7, stats_cols=("id",)
    ).version
    v2 = merge_into(
        t, src, "id", app_id="job", txn_seq=7, stats_cols=("id",)
    ).version
    assert v1 == v2 == t.latest_version()
    assert sorted(k for k, _ in _rows(t.snapshot())) == [
        0, 1, 100, 101, 200, 201, 300,
    ]


def test_merge_upsert_sink_replay_safe(spark, tmp_path):
    path = str(tmp_path / "t")
    TxnTable(spark, path).append(
        _kv(spark, (1, "a"), (2, "b")), stats_cols=("id",)
    )
    fn = merge_upsert_sink(path, "id", stats_cols=("id",))
    batch = _kv(spark, (2, "B"), (3, "c"))
    fn(batch, 0)
    fn(batch, 0)  # replayed micro-batch: no-op
    t = TxnTable(spark, path)
    assert _rows(t.snapshot()) == [(1, "a"), (2, "B"), (3, "c")]


# ------------------------------------------------------- delete_where --


def test_delete_where_removes_rows_keeps_disjoint_files(spark, tmp_path):
    t = _three_file_table(spark, str(tmp_path / "t"))
    before = set(t.snapshot_meta().files)
    t.delete_where("id", 100, 101, stats_cols=("id",))
    after = set(t.snapshot_meta().files)
    assert _rows(t.snapshot()) == [
        (0, "a0"), (1, "a1"), (200, "c0"), (201, "c1"),
    ]
    # the two disjoint files survived verbatim
    assert len(before & after) == 2
    assert t.history()[-1]["operation"] == "delete"
    # time travel intact
    assert len(_rows(t.snapshot(version=3))) == 6


def test_delete_where_no_match_is_noop(spark, tmp_path):
    t = _three_file_table(spark, str(tmp_path / "t"))
    v = t.latest_version()
    assert t.delete_where("id", 5000, 6000, stats_cols=("id",)) == v
    assert t.latest_version() == v


def test_delete_where_rebases_over_concurrent_append(spark, tmp_path):
    """DELETE applies to its snapshot; a blind concurrent append —
    even of in-range rows — legitimately survives (no replace_where
    guard, by design)."""
    path = str(tmp_path / "t")
    t = _three_file_table(spark, path)
    base = t.snapshot_meta()
    affected = t.files_matching_any("id", [(0, 50)], base.version)
    old = spark.read.schema(base.schema()).parquet(
        *[str(t.root / f) for f in affected]
    )
    keep = old.where(~F.col("id").between(0, 50) | F.col("id").isNull())
    staged, schema_json, stats = t._stage(keep, ("id",))
    TxnTable(spark, path).append(_kv(spark, (25, "late")), stats_cols=("id",))
    t._commit(
        "delete", staged, base.schema().json(), None, None,
        replaced=tuple(affected), staged_stats=stats,
    )
    rows = _rows(t.snapshot())
    assert (25, "late") in rows and (0, "a0") not in rows


def test_delete_where_conflicts_if_inputs_replaced(spark, tmp_path):
    path = str(tmp_path / "t")
    t = _three_file_table(spark, path)
    base = t.snapshot_meta()
    affected = t.files_matching_any("id", [(0, 50)], base.version)
    old = spark.read.schema(base.schema()).parquet(
        *[str(t.root / f) for f in affected]
    )
    keep = old.where(~F.col("id").between(0, 50))
    staged, schema_json, stats = t._stage(keep, ("id",))
    # concurrent compaction rewrote our input files
    TxnTable(spark, path).compact(stats_cols=("id",))
    with pytest.raises(ConcurrentWriteError):
        t._commit(
            "delete", staged, base.schema().json(), None, None,
            replaced=tuple(affected), staged_stats=stats,
        )


# ---------------------------------------------------- optimize (OPTIMIZE) --


def test_optimize_small_files_coalesces_only_small(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "t"))
    # one big-ish file, then a tail of tiny single-row appends
    t.append(
        spark.range(0, 20000).selectExpr("id", "repeat('x', 64) AS pad")
        .coalesce(1),
        stats_cols=("id",),
    )
    big = set(t.snapshot_meta().files)
    for i in range(4):
        t.append(
            spark.createDataFrame([(100000 + i, "p")], "id long, pad string")
            .coalesce(1),
            stats_cols=("id",),
        )
    assert len(t.snapshot_meta().files) == 5
    big_size = max((t.root / f).stat().st_size for f in t.snapshot_meta().files)
    v = t.optimize_small_files(target_bytes=big_size, stats_cols=("id",))
    after = set(t.snapshot_meta().files)
    # the big file survived verbatim; the 4 tiny ones became 1
    assert big <= after
    assert len(after) == 2
    assert t.snapshot().count() == 20004
    assert t.latest_version() == v
    # idempotent: nothing small left to do
    assert t.optimize_small_files(target_bytes=big_size) == v


def test_optimize_noop_below_min_files(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "t"))
    t.append(spark.range(5).selectExpr("id").coalesce(1))
    v = t.latest_version()
    assert t.optimize_small_files(target_bytes=1 << 30) == v


# ---------------------------------------------------------------------------
# composite-key conjunction guard
# ---------------------------------------------------------------------------


def _kv2(spark, *rows):
    return spark.createDataFrame(list(rows), "id long, part long, v string")


def _two_key_table(spark, path):
    t = TxnTable(spark, path)
    t.append(
        _kv2(spark, (0, 10, "a0"), (1, 10, "a1")).coalesce(1),
        stats_cols=("id", "part"),
    )
    t.append(
        _kv2(spark, (0, 20, "b0"), (1, 20, "b1")).coalesce(1),
        stats_cols=("id", "part"),
    )
    return t


def test_merge_multikey_guard_rebases_when_any_key_disjoint(spark, tmp_path):
    """Composite keys guard as a CONJUNCTION: a concurrent append whose
    id overlaps the source hull but whose part is provably disjoint on
    stats cannot contain a row the merge should have matched, so the
    merge rebases instead of spuriously conflicting (the single-key
    guard used to abort here)."""
    from etl_data_lake_spark.sources import merge as m
    from etl_data_lake_spark.sources.txn import merge_schemas

    path = str(tmp_path / "t")
    t = _two_key_table(spark, path)
    base = t.snapshot_meta()
    source = _kv2(spark, (1, 10, "A1")).persist()
    # id=1 is inside the source id range, but part=99 is outside [10, 10]
    TxnTable(spark, path).append(
        _kv2(spark, (1, 99, "other-part")), stats_cols=("id", "part")
    )
    res = m._merge_against(
        t, base, source, ["id", "part"], "update", "insert", None, None,
        merge_schemas(base.schema(), source.schema),
        ("id", "part"), None, None, 4096, 8,
    )
    source.unpersist()
    assert res.committed
    rows = sorted((r.id, r.part, r.v) for r in t.snapshot().collect())
    assert (1, 10, "A1") in rows and (1, 99, "other-part") in rows


def test_merge_multikey_guard_conflicts_when_all_keys_overlap(spark, tmp_path):
    from etl_data_lake_spark.sources import merge as m
    from etl_data_lake_spark.sources.txn import merge_schemas

    path = str(tmp_path / "t")
    t = _two_key_table(spark, path)
    base = t.snapshot_meta()
    source = _kv2(spark, (1, 10, "A1")).persist()
    TxnTable(spark, path).append(
        _kv2(spark, (1, 10, "dup")), stats_cols=("id", "part")
    )
    with pytest.raises(ConcurrentWriteError):
        m._merge_against(
            t, base, source, ["id", "part"], "update", "insert", None, None,
            merge_schemas(base.schema(), source.schema),
            ("id", "part"), None, None, 4096, 8,
        )
    source.unpersist()


def test_merge_multikey_guard_missing_stats_conflicts(spark, tmp_path):
    """A concurrent file with NO stats on any guarded key gives no
    disjointness proof on any conjunct -> conservative conflict."""
    from etl_data_lake_spark.sources import merge as m
    from etl_data_lake_spark.sources.txn import merge_schemas

    path = str(tmp_path / "t")
    t = _two_key_table(spark, path)
    base = t.snapshot_meta()
    source = _kv2(spark, (1, 10, "A1")).persist()
    TxnTable(spark, path).append(_kv2(spark, (500, 500, "nostats")))
    with pytest.raises(ConcurrentWriteError):
        m._merge_against(
            t, base, source, ["id", "part"], "update", "insert", None, None,
            merge_schemas(base.schema(), source.schema),
            ("id", "part"), None, None, 4096, 8,
        )
    source.unpersist()


# ---------------------------------------------------------------------------
# bloom tier in pass 1
# ---------------------------------------------------------------------------


def test_merge_bloom_tier_prunes_unclustered_candidates(spark, tmp_path):
    """On an UNCLUSTERED table (every file's id hull spans the key
    space) the stats prune keeps everything; with Bloom sidecars built
    the same merge's candidate set shrinks to the files that can
    actually hold the key — and the result is identical."""
    from etl_data_lake_spark.sources.bloomindex import build_bloom_index

    path = str(tmp_path / "t")
    t = TxnTable(spark, path)
    # 3 files, overlapping hulls: [0,1000], [1,1001], [2,1002]
    for base in (0, 1, 2):
        t.append(
            _kv(spark, (base, f"x{base}"), (base + 1000, f"y{base}")).coalesce(1),
            stats_cols=("id",),
        )
    src = _kv(spark, (1000, "HIT"), (5000, "NEW"))

    res_plain = merge_into(
        t, src, "id", stats_cols=("id",), use_bloom=False
    )
    assert res_plain.files_candidate == 3 and res_plain.files_rewritten == 1

    assert build_bloom_index(t, ("id",)) >= 4  # new merged files too
    res_bloom = merge_into(
        t, _kv(spark, (1000, "HIT2"), (6000, "NEW2")), "id",
        stats_cols=("id",),
    )
    # only the file(s) whose bloom may contain 1000 survive pass 0/1
    assert res_bloom.files_candidate < len(t.snapshot_meta(
        res_bloom.version - 1).files)
    assert res_bloom.files_rewritten == 1
    rows = dict(_rows(t.snapshot()))
    assert rows[1000] == "HIT2" and rows[5000] == "NEW" and rows[6000] == "NEW2"


def test_merge_bloom_tier_never_false_negative(spark, tmp_path):
    """Every key the merge should match is matched even with the bloom
    tier active (no false negatives by construction)."""
    from etl_data_lake_spark.sources.bloomindex import build_bloom_index

    path = str(tmp_path / "t")
    t = TxnTable(spark, path)
    for base in (0, 100, 200):
        t.append(
            _kv(spark, *[(base + i, f"v{base + i}") for i in range(50)]).coalesce(1),
            stats_cols=("id",),
        )
    build_bloom_index(t, ("id",))
    src = _kv(spark, *[(i, f"U{i}") for i in range(0, 250, 7)])
    res = merge_into(t, src, "id", stats_cols=("id",))
    assert res.committed
    rows = dict(_rows(t.snapshot()))
    for i in range(0, 250, 7):
        want = f"U{i}"
        have = rows[i]
        in_table = (0 <= i < 50) or (100 <= i < 150) or (200 <= i < 250)
        assert have == want, (i, have)
        assert in_table or have.startswith("U")
