"""Persisted sharded-HNSW index (similarity/hnsw_index): bit-equality
with the on-the-fly hnsw_topk at equal parameters, query-time
ef_search tuning, epoch rebuild atomicity + gc, persistence across
handles, and guards."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_data_lake_spark.similarity.hnsw import hnsw_topk
from etl_data_lake_spark.similarity.hnsw_index import HnswIndex
from etl_data_lake_spark.sources.catalog import load_table
from tests.conftest import SF_DIR

_P = dict(m=8, ef_construction=48, n_shards=4)


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_DIR, "embeddings")


def _rows(df):
    return sorted(
        (r.query_id, r.neighbor_id, r.cos_sim, r.rank)
        for r in df.collect()
    )


def test_persisted_query_equals_onthefly(spark, emb, tmp_path):
    """The index changes WHERE the build cost is paid, never the
    answer: persisted query ≡ hnsw_topk bit-for-bit at equal
    parameters (same shard membership, same graphs, same search)."""
    idx = HnswIndex.build(spark, str(tmp_path / "h"), emb, **_P)
    queries = emb.where(F.col("vec_id") < 5)
    got = _rows(idx.query(queries, k=10, ef_search=64))
    want = _rows(
        hnsw_topk(
            emb, queries, k=10, m=8, ef_construction=48,
            ef_search=64, n_parts=4,
        )
    )
    assert got == want and len(got) > 0


def test_ef_search_is_a_query_time_knob(spark, emb, tmp_path):
    """Recall rises with ef_search on the SAME stored graphs — no
    rebuild; exhaustive ef reproduces brute force per shard-merge."""
    from etl_data_lake_spark.similarity.bruteforce import cosine_topk

    idx = HnswIndex.build(spark, str(tmp_path / "h"), emb, **_P)
    queries = emb.where(F.col("vec_id") < 20)
    exact = {
        (q, n)
        for q, n, _, _ in _rows(cosine_topk(emb, queries, k=10))
    }

    def recall(ef):
        got = {
            (q, n)
            for q, n, _, _ in _rows(idx.query(queries, k=10, ef_search=ef))
        }
        return len(got & exact) / len(exact)

    lo, hi = recall(8), recall(128)
    assert hi >= lo
    assert hi >= 0.9
    # ef >= shard size ⇒ exact per-shard scan ⇒ brute force exactly
    n = emb.count()
    full = {
        (q, n2)
        for q, n2, _, _ in _rows(idx.query(queries, k=10, ef_search=n))
    }
    assert full == exact


def test_rebuild_epochs_and_gc(spark, emb, tmp_path):
    """A rebuild appends under a fresh epoch and publishes atomically;
    gc drops the superseded build's rows; a fresh handle serves the
    current build."""
    path = str(tmp_path / "h")
    HnswIndex.build(spark, path, emb, **_P)
    idx = HnswIndex(spark, path)
    b1 = idx.current_build()
    queries = emb.where(F.col("vec_id") < 3)
    before = _rows(idx.query(queries, k=5, ef_search=64))
    # rebuild over a SUBSET: the answer must change builds atomically
    HnswIndex.build(
        spark, path, emb.where(F.col("vec_id") % 2 == 0), **_P
    )
    idx2 = HnswIndex(spark, path)
    assert idx2.current_build() == b1 + 1
    after = idx2.query(queries, k=5, ef_search=64)
    assert all(r.neighbor_id % 2 == 0 for r in after.collect())
    n_rows = idx2.graphs_tbl.snapshot().count()
    idx2.gc()
    kept = idx2.graphs_tbl.snapshot()
    assert kept.count() < n_rows
    assert kept.where(F.col("build") != idx2.current_build()).count() == 0
    # the current build still answers identically after gc
    assert _rows(idx2.query(queries, k=5, ef_search=64)) == _rows(after)
    assert before  # sanity: the original build had answered


def test_empty_batch_bound_and_unpublished(spark, emb, tmp_path):
    idx = HnswIndex.build(spark, str(tmp_path / "h"), emb, **_P)
    got = idx.query(emb.where(F.col("vec_id") < 0), k=5)
    assert got.count() == 0
    assert got.columns == ["query_id", "neighbor_id", "cos_sim", "rank"]
    with pytest.raises(ValueError, match="max_query_batch"):
        idx.query(emb, k=5, max_query_batch=3)
    with pytest.raises(ValueError, match="k must"):
        idx.query(emb.limit(1), k=0)
    with pytest.raises(FileNotFoundError):
        HnswIndex(spark, str(tmp_path / "nope")).query(emb.limit(1))
    with pytest.raises(ValueError, match="m must"):
        HnswIndex.build(spark, str(tmp_path / "bad"), emb, m=1)


def test_filtered_query_guarantees_k_and_matches_exact(spark, emb, tmp_path):
    """filter_ids on the stored graphs: every emitted neighbor
    satisfies the filter, k is guaranteed via the exact refill, and a
    full-coverage ef reproduces filtered brute force exactly."""
    from etl_data_lake_spark.similarity.bruteforce import cosine_topk

    idx = HnswIndex.build(spark, str(tmp_path / "h"), emb, **_P)
    docs = load_table(spark, SF_DIR, "documents")
    mask = docs.where(F.col("lang") == "en").select(
        F.col("doc_id").alias("vec_id")
    )
    queries = emb.where(F.col("vec_id") < 3)
    n = emb.count()
    got = _rows(
        idx.query(queries, k=5, ef_search=n, filter_ids=mask)
    )
    want = _rows(
        cosine_topk(
            emb.join(mask, "vec_id", "left_semi"), queries, k=5,
            id_col="vec_id", vec_col="embedding",
        )
    )
    assert got == want and len(got) > 0
    allowed = {r.vec_id for r in mask.collect()}
    assert all(nid in allowed for _, nid, _, _ in got)
    # a filter so selective the over-fetch under-fills forces the
    # refill: still exactly the filtered brute force, k rows per query
    tiny = emb.where(
        (F.col("vec_id") % 41 == 0) & (F.col("vec_id") > 10)
    ).select("vec_id").limit(9)
    got2 = _rows(
        idx.query(queries, k=8, ef_search=16, filter_ids=tiny,
                  filter_overfetch=1)
    )
    want2 = _rows(
        cosine_topk(
            emb.join(tiny, "vec_id", "left_semi"), queries, k=8,
            id_col="vec_id", vec_col="embedding",
        )
    )
    assert got2 == want2
    counts = {}
    for qid, *_ in got2:
        counts[qid] = counts.get(qid, 0) + 1
    assert set(counts.values()) == {8}
    with pytest.raises(ValueError, match="filter_overfetch"):
        idx.query(queries, k=3, filter_ids=tiny, filter_overfetch=0)


# ---------------------------------------------------------- add --
# Round 10 (verdict item #3): incremental insert into the stored
# graphs, plus the CAS build-number protocol (advice item — two
# concurrent builds could previously allocate the same number).


def test_add_appendonly_ids_bit_equal_to_rebuild(spark, emb, tmp_path):
    """Ids that sort after every existing id replay the exact
    insertion sequence a from-scratch build over the union runs
    (id-sorted order + splitmix levels are pure functions of the
    ids), so the grown index answers BIT-IDENTICALLY at any ef."""
    base = emb.where(F.col("vec_id") < 400)
    extra = emb.where(F.col("vec_id") >= 400)
    grown = HnswIndex.build(spark, str(tmp_path / "g"), base, **_P)
    grown.add(extra)
    full = HnswIndex.build(spark, str(tmp_path / "f"), emb, **_P)
    queries = emb.where(F.col("vec_id") < 7)
    for ef in (16, 64):
        got = _rows(grown.query(queries, k=10, ef_search=ef))
        want = _rows(full.query(queries, k=10, ef_search=ef))
        assert got == want and len(got) > 0


def test_add_interleaved_ids_exact_under_full_ef(spark, emb, tmp_path):
    """Interleaved ids yield a different insertion order than a
    rebuild, but still a valid connected HNSW: ef >= corpus size
    degenerates to the exact per-shard scan, reproducing brute force
    over the grown corpus exactly."""
    from etl_data_lake_spark.similarity.bruteforce import cosine_topk

    base = emb.where(F.col("vec_id") % 2 == 0)
    extra = emb.where(F.col("vec_id") % 2 == 1)
    idx = HnswIndex.build(spark, str(tmp_path / "g"), base, **_P)
    idx.add(extra)
    queries = emb.where(F.col("vec_id") < 7)
    n = emb.count()
    got = _rows(idx.query(queries, k=10, ef_search=n))
    want = _rows(cosine_topk(emb, queries, k=10))
    assert got == want and len(got) > 0


def test_add_exactly_once_replay(spark, emb, tmp_path):
    """A replayed (app_id, txn_seq) no-ops end to end: no duplicate
    graph rows, identical answers."""
    base = emb.where(F.col("vec_id") < 450)
    extra = emb.where(F.col("vec_id") >= 450)
    idx = HnswIndex.build(spark, str(tmp_path / "g"), base, **_P)
    idx.add(extra, app_id="ingest", txn_seq=1)
    queries = emb.where(F.col("vec_id") < 5)
    first = _rows(idx.query(queries, k=10, ef_search=64))
    n_rows = idx.graphs_tbl.snapshot().count()
    idx.add(extra, app_id="ingest", txn_seq=1)  # replay
    assert idx.graphs_tbl.snapshot().count() == n_rows
    assert _rows(idx.query(queries, k=10, ef_search=64)) == first


def test_add_crash_between_append_and_publish_recovers(
    spark, emb, tmp_path, monkeypatch
):
    """Crash window: the graph append landed but the publish didn't.
    The replay recovers the appended build number from the manifest
    (never re-reserving a different one) and publishes a mapping that
    points at rows that actually exist."""
    base = emb.where(F.col("vec_id") < 450)
    extra = emb.where(F.col("vec_id") >= 450)
    path = str(tmp_path / "g")
    idx = HnswIndex.build(spark, path, base, **_P)
    real_publish = HnswIndex._publish
    calls = {"n": 0}

    def crashing(self, *a, **k):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("simulated crash before publish")
        return real_publish(self, *a, **k)

    monkeypatch.setattr(HnswIndex, "_publish", crashing)
    with pytest.raises(RuntimeError, match="simulated crash"):
        idx.add(extra, app_id="ingest", txn_seq=7)
    queries = emb.where(F.col("vec_id") < 5)
    # index still serves the PRE-add corpus (publish never happened)
    pre = {n for _, n, _, _ in _rows(idx.query(queries, k=10, ef_search=64))}
    assert all(n < 450 for n in pre)
    n_rows = idx.graphs_tbl.snapshot().count()
    idx.add(extra, app_id="ingest", txn_seq=7)  # driver retry
    assert idx.graphs_tbl.snapshot().count() == n_rows  # append replayed
    control = HnswIndex.build(spark, str(tmp_path / "c"), emb, **_P)
    got = _rows(idx.query(queries, k=10, ef_search=64))
    assert got == _rows(control.query(queries, k=10, ef_search=64))


def test_add_duplicate_id_raises(spark, emb, tmp_path):
    idx = HnswIndex.build(spark, str(tmp_path / "g"), emb, **_P)
    with pytest.raises(ValueError, match="already exist"):
        idx.add(emb.where(F.col("vec_id") < 3))


def test_add_gc_drops_superseded_shards_only(spark, emb, tmp_path):
    """After an add, gc reclaims the affected shards' OLD rows; the
    mapping-driven read answers identically before and after."""
    base = emb.where(F.col("vec_id") < 450)
    extra = emb.where(F.col("vec_id") >= 450)
    idx = HnswIndex.build(spark, str(tmp_path / "g"), base, **_P)
    idx.add(extra)
    queries = emb.where(F.col("vec_id") < 5)
    before = _rows(idx.query(queries, k=10, ef_search=64))
    n_rows = idx.graphs_tbl.snapshot().count()
    idx.gc()
    assert idx.graphs_tbl.snapshot().count() < n_rows
    assert _rows(idx.query(queries, k=10, ef_search=64)) == before
    # every surviving (shard, build) pair is exactly the published map
    live = {
        (s, b)
        for s, b in enumerate(idx._meta_full()["shard_builds"])
    }
    stored = {
        (r.shard, r.build)
        for r in idx.graphs_tbl.snapshot()
        .select("shard", "build").distinct().collect()
    }
    assert stored == live


def test_concurrent_builds_get_unique_numbers_and_loser_raises(
    spark, emb, tmp_path
):
    """The CAS protocol (advice item): reservations are unique, and a
    build whose base was published over raises at its publish point
    instead of silently corrupting the winner."""
    from etl_data_lake_spark.sources.txn import ConcurrentWriteError

    path = str(tmp_path / "g")
    idx = HnswIndex.build(spark, path, emb, **_P)
    b1 = idx.current_build()
    # builder A starts: reads base, reserves its number
    base_build = idx._meta_full()["build"]
    b_a = idx._reserve_build(**_P)
    # builder B runs end to end in the window — DIFFERENT number
    HnswIndex.build(spark, path, emb.where(F.col("vec_id") < 100), **_P)
    idx2 = HnswIndex(spark, path)
    b_b = idx2.current_build()
    assert b_a != b_b and b_a != b1 and b_b != b1
    # builder A's publish detects the clash and raises
    with pytest.raises(ConcurrentWriteError, match="was published"):
        idx._publish(
            b_a, _P["m"], _P["ef_construction"], _P["n_shards"],
            [b_a] * _P["n_shards"], base_build,
        )
    # the winner is untouched and still serves
    assert idx2.current_build() == b_b
    assert idx2.query(emb.limit(2), k=3, ef_search=64).count() > 0


def test_reservations_are_unique(spark, emb, tmp_path):
    idx = HnswIndex.build(spark, str(tmp_path / "g"), emb, **_P)
    r1 = idx._reserve_build(**_P)
    r2 = idx._reserve_build(**_P)
    assert r2 == r1 + 1
