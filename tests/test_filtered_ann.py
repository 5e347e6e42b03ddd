"""Filtered (metadata-constrained) ANN search — round-8 verdict #1.

Semantics under test: ``predicate`` restricts the CORPUS side and the
result is the true top-k OF THE FILTERED POPULATION. Post-filtering a
plain top-k silently under-returns instead (demonstrated below).
Every approximate filtered path (lsh / ivf / pq / hnsw) is
recall-pinned against the FILTERED brute-force baseline; IVF's
guaranteed-k refill is pinned exactly — shortfall queries return the
exact filtered top-k, and a filtered corpus smaller than k returns
everything it has.

Fixture: sf0.01 embeddings (500 vectors) joined to documents on
vec_id = doc_id; lang='en' keeps 218, lang='zh' 75,
lang='zh' AND source='src1' just 2.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR_MEDIUM


@pytest.fixture(scope="module")
def corpus(spark):
    from etl_data_lake_spark.sources.catalog import load_table

    emb = load_table(spark, SF_DIR_MEDIUM, "embeddings")
    docs = load_table(spark, SF_DIR_MEDIUM, "documents").select(
        "doc_id", "lang", "source"
    )
    return emb.join(docs, emb.vec_id == docs.doc_id).persist()


@pytest.fixture(scope="module")
def queries(spark):
    from etl_data_lake_spark.sources.catalog import load_table

    return load_table(spark, SF_DIR_MEDIUM, "embeddings").where(
        F.col("vec_id") < 5
    )


# SQL-string form of the predicate API (Column form exercised below)
PRED_EN = "lang = 'en'"


def _pairs(df):
    return {(r.query_id, r.neighbor_id) for r in df.collect()}


@pytest.fixture(scope="module")
def base_en(corpus, queries):
    from etl_data_lake_spark.similarity.bruteforce import cosine_topk

    return _pairs(cosine_topk(corpus, queries, k=10, predicate=PRED_EN))


def test_filtered_brute_force_semantics(spark, corpus, queries):
    """Every neighbor satisfies the predicate; every query gets exactly
    k rows (the filtered corpus is far larger than k); queries need
    NOT satisfy the filter themselves."""
    from etl_data_lake_spark.similarity.bruteforce import cosine_topk

    got = cosine_topk(corpus, queries, k=10, predicate=PRED_EN)
    en_ids = {
        r.vec_id for r in corpus.where(PRED_EN).select("vec_id").collect()
    }
    rows = got.collect()
    assert len(rows) == 50
    assert all(r.neighbor_id in en_ids for r in rows)
    per_q = {}
    for r in rows:
        per_q.setdefault(r.query_id, []).append(r.rank)
    assert set(per_q) == {0, 1, 2, 3, 4}
    assert all(sorted(v) == list(range(1, 11)) for v in per_q.values())


def test_post_filtering_under_returns(spark, corpus, queries):
    """The reason the predicate must enter the CANDIDATE stage: taking
    the plain top-k and then filtering loses rows — at en ≈ 44% of the
    corpus, some query's global top-10 holds fewer than 10 en docs."""
    from etl_data_lake_spark.similarity.bruteforce import cosine_topk

    plain = cosine_topk(corpus, queries, k=10)
    en_ids = {
        r.vec_id for r in corpus.where(PRED_EN).select("vec_id").collect()
    }
    post = [r for r in plain.collect() if r.neighbor_id in en_ids]
    assert len(post) < 50  # under-returns
    filtered = cosine_topk(corpus, queries, k=10, predicate=PRED_EN)
    assert filtered.count() == 50  # the filtered path does not


def test_lsh_filtered_recall(spark, corpus, queries, base_en):
    from etl_data_lake_spark.similarity.lsh import lsh_bucket_topk

    got = _pairs(
        lsh_bucket_topk(
            corpus, queries, k=10, predicate=PRED_EN, tables=16, planes=3
        )
    )
    recall = len(got & base_en) / len(base_en)
    # measured 0.96 on the fixture (deterministic planes)
    assert recall >= 0.8, f"filtered LSH recall collapsed: {recall:.2f}"


def test_ivf_filtered_recall_and_k_guarantee(spark, corpus, queries, base_en):
    from etl_data_lake_spark.similarity.ivf import ivf_topk

    got = ivf_topk(
        corpus, queries, k=10, nprobe=8, predicate=PRED_EN
    ).collect()
    # guaranteed k: every query returns exactly k rows no matter how
    # the filter depleted its probed cells
    per_q = {}
    for r in got:
        per_q.setdefault(r.query_id, 0)
        per_q[r.query_id] += 1
    assert per_q == {q: 10 for q in range(5)}
    recall = len({(r.query_id, r.neighbor_id) for r in got} & base_en) / len(
        base_en
    )
    # measured 0.68 at nprobe=8/16 on the structureless random fixture
    # (recall ≈ fraction scanned is the theory floor there)
    assert recall >= 0.5, f"filtered IVF recall collapsed: {recall:.2f}"


def test_ivf_refill_makes_shortfall_queries_exact(spark, corpus, queries):
    """nprobe=1 against a selective filter (lang='zh', 75 docs) forces
    probe shortfalls; the refill upgrades those queries to the EXACT
    filtered top-k, so the whole frame equals brute force."""
    from etl_data_lake_spark.similarity.bruteforce import cosine_topk
    from etl_data_lake_spark.similarity.ivf import ivf_topk

    pred = F.col("lang") == "zh"
    want = (
        cosine_topk(corpus, queries, k=10, predicate=pred)
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    got = (
        ivf_topk(corpus, queries, k=10, nprobe=1, predicate=pred)
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    assert len(got) == 50
    assert got.equals(want)


def test_ivf_filtered_corpus_smaller_than_k(spark, corpus, queries):
    """A filter keeping fewer than k vectors returns everything that
    matches (= exact), and an impossible filter returns empty — never
    an error, never rows violating the predicate."""
    from etl_data_lake_spark.similarity.bruteforce import cosine_topk
    from etl_data_lake_spark.similarity.ivf import ivf_topk

    tiny = (F.col("lang") == "zh") & (F.col("source") == "src1")
    assert corpus.where(tiny).count() == 2
    want = (
        cosine_topk(corpus, queries, k=10, predicate=tiny)
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    got = (
        ivf_topk(corpus, queries, k=10, nprobe=2, predicate=tiny)
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    assert len(got) == 10  # 2 matching neighbors x 5 queries
    assert got.equals(want)

    empty = ivf_topk(
        corpus, queries, k=10, predicate=F.col("lang") == "xx"
    )
    assert empty.count() == 0


def test_pq_filtered_recall(spark, corpus, queries, base_en):
    from etl_data_lake_spark.similarity.pq import pq_topk

    got = pq_topk(
        corpus, queries, k=10, m=16, ks=32, predicate=PRED_EN
    ).collect()
    assert len(got) == 50  # structural k: ADC keeps k·refine ≥ k
    recall = len({(r.query_id, r.neighbor_id) for r in got} & base_en) / len(
        base_en
    )
    # measured 0.98 (exact refine over filtered codes)
    assert recall >= 0.9, f"filtered PQ recall collapsed: {recall:.2f}"


def test_hnsw_filtered_recall(spark, corpus, queries, base_en):
    from etl_data_lake_spark.similarity.hnsw import hnsw_topk

    got = hnsw_topk(
        corpus, queries, k=10, ef_search=32, n_parts=8, predicate=PRED_EN
    ).collect()
    en_ids = {
        r.vec_id for r in corpus.where(PRED_EN).select("vec_id").collect()
    }
    assert all(r.neighbor_id in en_ids for r in got)
    recall = len({(r.query_id, r.neighbor_id) for r in got} & base_en) / len(
        base_en
    )
    # measured 1.0 (per-shard graphs over the filtered minority)
    assert recall >= 0.9, f"filtered HNSW recall collapsed: {recall:.2f}"


def test_catalog_entry_pushes_filter_to_scan(spark):
    """ann_filtered_topk's lang predicate must reach the documents
    parquet scan (PushedFilters), not hang above the join."""
    from etl_data_lake_spark.queries.vector_queries import ann_filtered_topk

    plan = (
        ann_filtered_topk(spark, SF_DIR_MEDIUM)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EqualTo(lang,en)" in plan
