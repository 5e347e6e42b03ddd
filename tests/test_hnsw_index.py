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
