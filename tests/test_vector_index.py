"""Persisted IVF index (similarity/index.py): bit-equality with the
on-the-fly ivf_topk, manifest-level probe pruning, incremental adds,
persistence across handles."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_data_lake_spark.similarity.index import IvfIndex
from etl_data_lake_spark.similarity.ivf import ivf_topk
from etl_data_lake_spark.sources.catalog import load_table
from tests.conftest import SF_DIR

_PARAMS = dict(n_cells=8, kmeans_iters=2, train_factor=64)


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_DIR, "embeddings")


def _rows(df):
    return sorted(
        (r.query_id, r.neighbor_id, r.cos_sim, r.rank) for r in df.collect()
    )


def test_index_query_equals_onthefly_ivf(spark, emb, tmp_path):
    idx = IvfIndex.build(
        spark, str(tmp_path / "ivf"), emb, id_col="vec_id", **_PARAMS
    )
    queries = emb.where(F.col("vec_id") < 5)
    got = _rows(idx.query(queries, k=10, nprobe=3))
    want = _rows(
        ivf_topk(emb, queries, k=10, n_cells=8, nprobe=3,
                 id_col="vec_id", vec_col="embedding",
                 kmeans_iters=2, train_factor=64)
    )
    assert got == want and len(got) > 0


def test_index_full_probe_is_exhaustive(spark, emb, tmp_path):
    from etl_data_lake_spark.similarity.bruteforce import cosine_topk

    idx = IvfIndex.build(
        spark, str(tmp_path / "ivf"), emb, id_col="vec_id", **_PARAMS
    )
    queries = emb.where(F.col("vec_id") < 3)
    got = _rows(idx.query(queries, k=5, nprobe=8))
    want = _rows(
        cosine_topk(emb, queries, k=5, id_col="vec_id", vec_col="embedding")
    )
    assert got == want


def test_index_probe_prunes_posting_files(spark, emb, tmp_path):
    idx = IvfIndex.build(
        spark, str(tmp_path / "ivf"), emb, id_col="vec_id",
        shards=8, **_PARAMS,
    )
    sizes = {r.cell: r.n_vectors for r in idx.cell_sizes().collect()}
    assert sum(sizes.values()) == emb.count()
    # probing a strict cell subset must open a strict file subset
    some = sorted(sizes)[:2]
    kept, total = idx.probed_files(some)
    assert total >= 4  # sharded build actually made several files
    assert 0 < len(kept) < total


def test_index_add_incremental_and_persistent_handle(spark, emb, tmp_path):
    path = str(tmp_path / "ivf")
    IvfIndex.build(spark, path, emb, id_col="vec_id", **_PARAMS)
    # reopen cold: no rebuild, centroids read back from the table
    idx = IvfIndex(spark, path, id_col="vec_id")
    before = idx.centroids()
    dims = len(before[0])
    new = spark.createDataFrame(
        [(100001, [float(i) for i in range(dims)])],
        "vec_id long, embedding array<double>",
    )
    v = idx.add(new)
    assert v == idx.postings_tbl.latest_version()
    assert idx.centroids() == before  # quantizer frozen
    # the new vector is findable (as a neighbor of itself probed wide)
    got = idx.query(
        new.withColumn("vec_id", F.lit(100002)), k=3, nprobe=8
    ).collect()
    assert any(r.neighbor_id == 100001 and r.rank == 1 for r in got)
    # replayed add (same app seq) no-ops
    n = idx.postings_tbl.snapshot().count()
    idx.add(new, app_id="ing", txn_seq=1)
    idx.add(new, app_id="ing", txn_seq=1)
    assert idx.postings_tbl.snapshot().count() == n + 1


def test_index_optimize_compacts_append_tail(spark, emb, tmp_path):
    path = str(tmp_path / "ivf")
    idx = IvfIndex.build(
        spark, path, emb, id_col="vec_id", shards=4, **_PARAMS
    )
    dims = len(idx.centroids()[0])
    for i in range(3):
        idx.add(
            spark.createDataFrame(
                [(200000 + i, [0.1 * i] * dims)],
                "vec_id long, embedding array<double>",
            ).coalesce(1)
        )
    files_before = len(idx.postings_tbl.snapshot_meta().files)
    idx.optimize(target_bytes=1 << 30)
    files_after = len(idx.postings_tbl.snapshot_meta().files)
    assert files_after < files_before
    assert idx.postings_tbl.snapshot().count() == emb.count() + 3


def test_index_rebuild_atomic_and_gc(spark, emb, tmp_path):
    """Rebuilds are atomic via build epochs: postings land first
    (invisible), centroids publish last; a crash between the two
    leaves readers on the complete OLD index; gc reclaims old
    builds."""
    path = str(tmp_path / "ivf")
    IvfIndex.build(spark, path, emb, id_col="vec_id", n_cells=4)
    idx = IvfIndex(spark, path, id_col="vec_id")
    assert idx.current_build() == 1
    n = emb.count()

    # simulate a crashed rebuild: postings appended for build 2,
    # centroids never published
    centroids = idx.centroids()
    orphan = idx._assign(emb.limit(7), centroids, "embedding", 2)
    idx.postings_tbl.append(orphan, stats_cols=("cell", "build"))
    assert idx.current_build() == 1  # readers still on build 1
    assert idx.cell_sizes().agg(F.sum("n_vectors")).collect()[0][0] == n
    q = emb.where(F.col("vec_id") < 2)
    before = _rows(idx.query(q, k=5, nprobe=4))

    # a later rebuild must SKIP the orphaned epoch (no reuse)
    idx2 = IvfIndex.build(spark, path, emb, id_col="vec_id", n_cells=4)
    assert idx2.current_build() == 3
    after = _rows(idx2.query(q, k=5, nprobe=4))
    assert after == before  # same corpus, same deterministic quantizer
    # gc drops builds 1 and 2; current results unchanged
    idx2.gc()
    builds = [
        r.build for r in
        idx2.postings_tbl.snapshot().select("build").distinct().collect()
    ]
    assert builds == [3]
    assert _rows(idx2.query(q, k=5, nprobe=4)) == after


def test_index_empty_query_batch(spark, emb, tmp_path):
    idx = IvfIndex.build(
        spark, str(tmp_path / "ivf"), emb, id_col="vec_id", n_cells=4
    )
    got = idx.query(emb.where(F.col("vec_id") < 0), k=5, nprobe=2)
    assert got.count() == 0
    assert got.columns == ["query_id", "neighbor_id", "cos_sim", "rank"]


def test_index_query_batch_bound(spark, emb, tmp_path):
    idx = IvfIndex.build(
        spark, str(tmp_path / "ivf"), emb, id_col="vec_id", n_cells=4
    )
    with pytest.raises(ValueError, match="max_query_batch"):
        idx.query(emb, k=5, nprobe=2, max_query_batch=3)


# ------------------------------------------------------------ IVF-PQ --


def test_ivfpq_full_refine_matches_exact_query(spark, emb, tmp_path):
    """ADC candidates + exact refine with refine_factor covering the
    probed cells must equal the exact query at the same nprobe — the
    composition-level analog of pq_topk's full-refine ≡ brute force."""
    idx = IvfIndex.build(
        spark, str(tmp_path / "ivf"), emb, id_col="vec_id",
        n_cells=4, pq_m=8, pq_ks=16,
    )
    queries = emb.where(F.col("vec_id") < 4)
    got = _rows(idx.query_adc(queries, k=5, nprobe=2, refine_factor=10_000))
    want = _rows(idx.query(queries, k=5, nprobe=2))
    assert got == want and len(got) > 0


def test_ivfpq_adc_scan_never_reads_vectors(spark, emb, tmp_path):
    """The scoring scan must be NARROW: its parquet ReadSchema carries
    (id, codes), never the fat vector column — the residency win that
    is IVF-PQ's whole point."""
    idx = IvfIndex.build(
        spark, str(tmp_path / "ivf"), emb, id_col="vec_id",
        n_cells=4, pq_m=8, pq_ks=16,
    )
    plan = (
        idx.query_adc(emb.where(F.col("vec_id") < 2), k=5, nprobe=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    code_scans = [
        ln for ln in plan.splitlines()
        if "ReadSchema" in ln and "codes" in ln
    ]
    assert code_scans and all("vec" not in ln.split("ReadSchema")[1]
                              or "vec:" not in ln for ln in code_scans)
    # stronger: at least one scan reads codes WITHOUT vec
    assert any("vec:" not in ln.split("ReadSchema")[1] for ln in code_scans)


def test_ivfpq_add_encodes_and_finds(spark, emb, tmp_path):
    path = str(tmp_path / "ivf")
    IvfIndex.build(
        spark, path, emb, id_col="vec_id", n_cells=4, pq_m=8, pq_ks=16,
    )
    idx = IvfIndex(spark, path, id_col="vec_id")
    dims = len(idx.centroids()[0])
    new = spark.createDataFrame(
        [(300001, [1.0] * dims)], "vec_id long, embedding array<double>"
    )
    idx.add(new)
    row = (
        idx.postings_tbl.snapshot()
        .where(F.col("id") == 300001)
        .collect()[0]
    )
    assert row.codes is not None and len(row.codes) == 8
    probe = new.withColumn("vec_id", F.lit(300002))
    got = idx.query_adc(probe, k=3, nprobe=4, refine_factor=50)
    assert any(
        r.neighbor_id == 300001 and r.rank == 1 for r in got.collect()
    )


def test_ivfpq_plain_index_rejects_adc(spark, emb, tmp_path):
    idx = IvfIndex.build(
        spark, str(tmp_path / "ivf"), emb, id_col="vec_id", n_cells=4
    )
    with pytest.raises(ValueError, match="codebooks"):
        idx.query_adc(emb.where(F.col("vec_id") < 2), k=3)


def test_index_upsert_sink_exactly_once(spark, emb, tmp_path):
    path = str(tmp_path / "ivf")
    IvfIndex.build(spark, path, emb, id_col="vec_id", n_cells=4)
    idx = IvfIndex(spark, path, id_col="vec_id")
    dims = len(idx.centroids()[0])
    fn = idx.upsert_sink()
    batch = spark.createDataFrame(
        [(400001, [0.5] * dims)], "vec_id long, embedding array<double>"
    )
    n0 = idx.postings_tbl.snapshot().count()
    fn(batch, 0)
    fn(batch, 0)  # replayed micro-batch: no-op
    assert idx.postings_tbl.snapshot().count() == n0 + 1


# --------------------------------------------- filtered (round 9) --


def _filter_frame(spark, emb):
    """Permitted ids: the lang='en' documents (the metadata join a
    real filtered query derives its id mask from)."""
    docs = load_table(spark, SF_DIR, "documents")
    return docs.where(F.col("lang") == "en").select(
        F.col("doc_id").alias("vec_id")
    )


def test_index_filtered_query_full_probe_is_filtered_exact(
    spark, emb, tmp_path
):
    """nprobe = n_cells + filter ≡ brute force over the filtered
    corpus — the correctness anchor for the served filtered path."""
    from etl_data_lake_spark.similarity.bruteforce import cosine_topk

    idx = IvfIndex.build(
        spark, str(tmp_path / "ivf"), emb, id_col="vec_id", **_PARAMS
    )
    mask = _filter_frame(spark, emb)
    queries = emb.where(F.col("vec_id") < 3)
    got = _rows(idx.query(queries, k=5, nprobe=8, filter_ids=mask))
    want = _rows(
        cosine_topk(
            emb.join(mask, "vec_id", "left_semi"), queries, k=5,
            id_col="vec_id", vec_col="embedding",
        )
    )
    assert got == want and len(got) > 0
    # every emitted neighbor satisfies the filter
    allowed = {r.vec_id for r in mask.collect()}
    assert all(nid in allowed for _, nid, _, _ in got)


def test_index_filtered_query_guarantees_k(spark, emb, tmp_path):
    """A filter so selective that probed cells under-fill forces the
    refill: results must equal filtered brute force EXACTLY (the
    short queries upgrade to exact), all k rows present."""
    from etl_data_lake_spark.similarity.bruteforce import cosine_topk

    idx = IvfIndex.build(
        spark, str(tmp_path / "ivf"), emb, id_col="vec_id", **_PARAMS
    )
    # 12 permitted vectors: any probed cell holds < k=8 of them, so
    # every query goes through the refill path
    mask = emb.where(
        (F.col("vec_id") % 37 == 0) & (F.col("vec_id") > 10)
    ).select("vec_id").limit(12)
    queries = emb.where(F.col("vec_id") < 4)
    got = _rows(idx.query(queries, k=8, nprobe=1, filter_ids=mask))
    want = _rows(
        cosine_topk(
            emb.join(mask, "vec_id", "left_semi"), queries, k=8,
            id_col="vec_id", vec_col="embedding",
        )
    )
    assert got == want
    counts = {}
    for qid, *_ in got:
        counts[qid] = counts.get(qid, 0) + 1
    assert set(counts.values()) == {8}  # k guaranteed per query


def test_index_filtered_query_empty_filter(spark, emb, tmp_path):
    idx = IvfIndex.build(
        spark, str(tmp_path / "ivf"), emb, id_col="vec_id", **_PARAMS
    )
    mask = emb.where(F.col("vec_id") < 0).select("vec_id")
    got = idx.query(
        emb.where(F.col("vec_id") < 3), k=5, nprobe=4, filter_ids=mask
    )
    assert got.count() == 0


def test_index_filtered_query_rejects_ambiguous_mask(
    spark, emb, tmp_path
):
    idx = IvfIndex.build(
        spark, str(tmp_path / "ivf"), emb, id_col="vec_id", n_cells=4
    )
    bad = emb.select(F.col("vec_id").alias("a"), F.col("vec_id").alias("b"))
    with pytest.raises(ValueError, match="filter_ids"):
        idx.query(
            emb.where(F.col("vec_id") < 2), k=3, filter_ids=bad
        ).collect()


def test_ivfpq_filtered_adc_matches_filtered_exact(spark, emb, tmp_path):
    """Filtered ADC with covering refine_factor ≡ filtered exact
    query at equal nprobe; and the refill guarantees k under a
    selective mask."""
    idx = IvfIndex.build(
        spark, str(tmp_path / "ivf"), emb, id_col="vec_id",
        n_cells=4, pq_m=8, pq_ks=16,
    )
    mask = _filter_frame(spark, emb)
    queries = emb.where(F.col("vec_id") < 4)
    got = _rows(
        idx.query_adc(
            queries, k=5, nprobe=2, refine_factor=10_000, filter_ids=mask
        )
    )
    want = _rows(idx.query(queries, k=5, nprobe=2, filter_ids=mask))
    assert got == want and len(got) > 0


# ---------------------------------------------------------------------------
# Byte codecs in the persisted index (round 11, r10-verdict #6):
# codec='sq8'/'bq' builds store array<tinyint> codes per posting so
# the byte-matmul / Hamming pre-rank works build-once/query-many like
# ADC — with epoch/add/gc semantics inherited.
# ---------------------------------------------------------------------------


def test_sq8_index_full_probe_equals_onthefly_sq_topk(spark, emb, tmp_path):
    """query_codes at full probe ≡ sq_topk bit-for-bit: the index's
    codec trains on the full corpus with the same exact aggregation,
    so serving from stored codes must not change a single row."""
    from etl_data_lake_spark.similarity.sq import sq_topk

    idx = IvfIndex.build(
        spark, str(tmp_path / "sq8"), emb, id_col="vec_id",
        codec="sq8", **_PARAMS,
    )
    queries = emb.where(F.col("vec_id") < 5)
    got = _rows(idx.query_codes(queries, k=10, nprobe=8, refine_factor=4))
    want = _rows(sq_topk(emb, queries, k=10, refine_factor=4))
    assert got == want and len(got) > 0


def test_bq_index_full_probe_equals_onthefly_bq_topk(spark, emb, tmp_path):
    from etl_data_lake_spark.similarity.bq import bq_topk

    idx = IvfIndex.build(
        spark, str(tmp_path / "bq"), emb, id_col="vec_id",
        codec="bq", **_PARAMS,
    )
    queries = emb.where(F.col("vec_id") < 5)
    got = _rows(idx.query_codes(queries, k=10, nprobe=8, refine_factor=16))
    want = _rows(bq_topk(emb, queries, k=10, refine_factor=16))
    assert got == want and len(got) > 0


def test_sq8_index_code_scan_never_reads_vectors(spark, emb, tmp_path):
    """The codec pre-rank must scan only (id, cell, codes) — the fat
    vector column enters the plan only at the candidate refine, same
    pin as the ADC path."""
    idx = IvfIndex.build(
        spark, str(tmp_path / "sq8"), emb, id_col="vec_id",
        codec="sq8", **_PARAMS,
    )
    queries = emb.where(F.col("vec_id") < 3)
    plan = (
        idx.query_codes(queries, k=5, nprobe=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    import re

    scans = re.findall(r"ReadSchema: struct<[^>]*>", plan)
    code_scans = [s for s in scans if "codes" in s]
    assert code_scans, plan
    assert all("vec" not in s for s in code_scans), code_scans


def test_sq8_index_add_encodes_against_frozen_codec(spark, emb, tmp_path):
    """add() must encode new vectors with the BUILD-time codec (no
    retrain) and the new ids must be findable through query_codes."""
    base = emb.where(F.col("vec_id") >= 20)
    added = emb.where(F.col("vec_id") < 20)
    idx = IvfIndex.build(
        spark, str(tmp_path / "sq8"), base, id_col="vec_id",
        codec="sq8", **_PARAMS,
    )
    before = idx._codec(idx.current_build())
    idx.add(added)
    after = idx._codec(idx.current_build())
    assert (before[1] == after[1]).all()  # frozen parameters
    # a query finds its own near-duplicates among the added vectors
    queries = emb.where(F.col("vec_id") < 3)
    got = idx.query_codes(queries, k=10, nprobe=8, refine_factor=8)
    ids = {r.neighbor_id for r in got.collect()}
    assert ids & set(range(20))  # added ids competitive


def test_codec_gc_drops_superseded_build_params(spark, emb, tmp_path):
    idx = IvfIndex.build(
        spark, str(tmp_path / "sq8"), emb, id_col="vec_id",
        codec="sq8", **_PARAMS,
    )
    b1 = idx.current_build()
    IvfIndex.build(
        spark, str(tmp_path / "sq8"), emb, id_col="vec_id",
        codec="sq8", **_PARAMS,
    )
    idx2 = IvfIndex(spark, str(tmp_path / "sq8"), id_col="vec_id")
    assert idx2.current_build() == b1 + 1
    idx2.gc()
    assert idx2._codec(b1) is None
    assert idx2._codec(b1 + 1) is not None
    # the current build still serves
    queries = emb.where(F.col("vec_id") < 3)
    assert idx2.query_codes(queries, k=5, nprobe=8).count() > 0


def test_codec_validation(spark, emb, tmp_path):
    with pytest.raises(ValueError, match="mutually exclusive"):
        IvfIndex.build(
            spark, str(tmp_path / "x"), emb, id_col="vec_id",
            pq_m=8, codec="sq8", **_PARAMS,
        )
    with pytest.raises(ValueError, match="unknown codec"):
        IvfIndex.build(
            spark, str(tmp_path / "y"), emb, id_col="vec_id",
            codec="int4", **_PARAMS,
        )
    plain = IvfIndex.build(
        spark, str(tmp_path / "plain"), emb, id_col="vec_id", **_PARAMS
    )
    with pytest.raises(ValueError, match="codec build"):
        plain.query_codes(emb.where(F.col("vec_id") < 2))


def test_sq8_index_filtered_query_guarantees_k(spark, emb, tmp_path):
    """filter_ids masks the code scan; a selective filter still
    returns exactly k via the exact refill, matching the filtered
    brute force."""
    from etl_data_lake_spark.similarity.bruteforce import cosine_topk

    idx = IvfIndex.build(
        spark, str(tmp_path / "sq8"), emb, id_col="vec_id",
        codec="sq8", **_PARAMS,
    )
    mask = emb.where(F.col("vec_id") % 17 == 0).select("vec_id")
    queries = emb.where(F.col("vec_id") < 3)
    got = idx.query_codes(
        queries, k=5, nprobe=2, refine_factor=4, filter_ids=mask
    )
    per_q = {}
    for r in got.collect():
        per_q.setdefault(r.query_id, []).append(r.neighbor_id)
    n_eligible = mask.count()
    for qid, ns in per_q.items():
        assert len(ns) == min(5, n_eligible - (qid % 17 == 0))
    # every neighbor satisfies the filter
    allowed = {r.vec_id for r in mask.collect()}
    assert all(n in allowed for ns in per_q.values() for n in ns)


# ---------------------------------------------------------------------------
# IVF-OPQ (round 12): rotate=True stores the eigenvalue-allocated PCA
# rotation with the build; assign/add/query all apply the frozen basis.
# ---------------------------------------------------------------------------

_OPQ = dict(n_cells=8, kmeans_iters=2, train_factor=64, pq_m=8, pq_ks=16)


@pytest.fixture(scope="module")
def correlated(spark):
    """Same corpus shape as test_opq: rank-8 latents mixed across all
    64 dims, so raw PQ slices straddle shared variance."""
    import numpy as np

    rng = np.random.default_rng(11)
    mix = rng.normal(size=(8, 64))
    Z = rng.normal(size=(600, 8))
    X = Z @ mix + rng.normal(scale=0.05, size=(600, 64))
    rows = [(i, [float(v) for v in X[i]]) for i in range(600)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_opq_index_bitequal_to_prerotated_pq_index(
    spark, correlated, tmp_path
):
    """The round-11 codec discipline carried to OPQ: an OPQ build must
    be BIT-IDENTICAL to a plain IVF-PQ build over the pre-rotated
    corpus queried with pre-rotated queries — rotation is a basis
    change of the whole index, not a query-time approximation."""
    from etl_data_lake_spark.similarity.opq import rotate_vectors

    a = IvfIndex.build(
        spark, str(tmp_path / "opq"), correlated, id_col="vec_id",
        rotate=True, **_OPQ,
    )
    R = a._rotation(a.current_build())
    assert R is not None and R.shape == (64, 64)
    b = IvfIndex.build(
        spark, str(tmp_path / "pq_pre"),
        rotate_vectors(correlated, R, "embedding"),
        id_col="vec_id", **_OPQ,
    )
    queries = correlated.where(F.col("vec_id") < 8)
    rq = rotate_vectors(queries, R, "embedding")
    got_adc = _rows(a.query_adc(queries, k=10, nprobe=3, refine_factor=2))
    want_adc = _rows(b.query_adc(rq, k=10, nprobe=3, refine_factor=2))
    assert got_adc == want_adc and len(got_adc) > 0
    got_ex = _rows(a.query(queries, k=10, nprobe=3))
    want_ex = _rows(b.query(rq, k=10, nprobe=3))
    assert got_ex == want_ex


def test_opq_index_full_refine_matches_exact_cosine(
    spark, correlated, tmp_path
):
    """Rotation is orthonormal ⇒ the exact refine (and the exact query
    path) over the ROTATED postings reproduces original-space cosine
    top-k at full probe/refine."""
    from etl_data_lake_spark.similarity.bruteforce import cosine_topk

    idx = IvfIndex.build(
        spark, str(tmp_path / "opq"), correlated, id_col="vec_id",
        rotate=True, **_OPQ,
    )
    queries = correlated.where(F.col("vec_id") < 4)
    exact = _rows(cosine_topk(correlated, queries, k=5,
                              id_col="vec_id", vec_col="embedding"))
    n = correlated.count()
    assert _rows(idx.query(queries, k=5, nprobe=8)) == exact
    assert _rows(
        idx.query_adc(queries, k=5, nprobe=8, refine_factor=n)
    ) == exact


def test_opq_index_add_applies_frozen_rotation(spark, correlated, tmp_path):
    """add() takes RAW vectors and must rotate them into the frozen
    build basis — a second handle (fresh process semantics) then sees
    the union as one consistent index."""
    from etl_data_lake_spark.similarity.bruteforce import cosine_topk

    head = correlated.where(F.col("vec_id") < 500)
    tail = correlated.where(F.col("vec_id") >= 500)
    idx = IvfIndex.build(
        spark, str(tmp_path / "opq"), head, id_col="vec_id",
        rotate=True, **_OPQ,
    )
    idx.add(tail, vec_col="embedding")
    again = IvfIndex(spark, str(tmp_path / "opq"), id_col="vec_id")
    queries = correlated.where(F.col("vec_id") < 3)
    exact = _rows(cosine_topk(correlated, queries, k=5,
                              id_col="vec_id", vec_col="embedding"))
    assert _rows(again.query(queries, k=5, nprobe=8)) == exact


def test_opq_index_recall_dominates_plain_pq_index(
    spark, correlated, tmp_path
):
    """test_opq's recall-dominance pin on the SERVED index: full coarse
    probe isolates the codec, so the gap is pure ADC candidate
    quality."""
    from etl_data_lake_spark.similarity.bruteforce import cosine_topk

    queries = correlated.where(F.col("vec_id") < 20)
    exact = {(r.query_id, r.neighbor_id)
             for r in cosine_topk(correlated, queries, k=10,
                                  id_col="vec_id",
                                  vec_col="embedding").collect()}

    def recall(df):
        got = {(r.query_id, r.neighbor_id) for r in df.collect()}
        return len(got & exact) / len(exact)

    pq = IvfIndex.build(
        spark, str(tmp_path / "pq"), correlated, id_col="vec_id", **_OPQ,
    )
    opq = IvfIndex.build(
        spark, str(tmp_path / "opq"), correlated, id_col="vec_id",
        rotate=True, **_OPQ,
    )
    r_pq = recall(pq.query_adc(queries, k=10, nprobe=8, refine_factor=2))
    r_opq = recall(opq.query_adc(queries, k=10, nprobe=8, refine_factor=2))
    assert r_opq >= 0.9, r_opq
    assert r_opq > r_pq, (r_opq, r_pq)


def test_opq_index_validation_and_gc(spark, correlated, tmp_path):
    with pytest.raises(ValueError, match="rotate=True requires pq_m"):
        IvfIndex.build(
            spark, str(tmp_path / "bad"), correlated, id_col="vec_id",
            rotate=True, n_cells=8,
        )
    # rebuild + gc reclaims the superseded build's rotation rows
    path = str(tmp_path / "opq")
    IvfIndex.build(spark, path, correlated, id_col="vec_id",
                   rotate=True, **_OPQ)
    idx = IvfIndex.build(spark, path, correlated, id_col="vec_id",
                         rotate=True, **_OPQ)
    assert idx.rotation_tbl.snapshot().select(
        "build").distinct().count() == 2
    idx.gc()
    builds = [r.build for r in idx.rotation_tbl.snapshot()
              .select("build").distinct().collect()]
    assert builds == [idx.current_build()]
