"""ANN behavior tests: LSH recall against the exact baseline."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_lsh_recall_vs_bruteforce(spark):
    from etl_data_lake_spark.similarity.bruteforce import cosine_topk
    from etl_data_lake_spark.similarity.lsh import lsh_bucket_topk
    from etl_data_lake_spark.sources.catalog import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    exact = {
        (r.query_id, r.neighbor_id) for r in cosine_topk(emb, queries, k=10).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in lsh_bucket_topk(emb, queries, k=10).collect()
    }
    recall = len(exact & approx) / len(exact)
    # deterministic planes → this is a fixed number for the fixture;
    # random-vector corpora are LSH's worst case, so the bar is modest
    assert recall >= 0.4, f"LSH recall collapsed: {recall:.2f}"


def test_ivf_recall_vs_bruteforce(spark):
    from etl_data_lake_spark.similarity.bruteforce import cosine_topk
    from etl_data_lake_spark.similarity.ivf import ivf_topk
    from etl_data_lake_spark.sources.catalog import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    exact = {
        (r.query_id, r.neighbor_id) for r in cosine_topk(emb, queries, k=10).collect()
    }
    got = ivf_topk(emb, queries, k=10, n_cells=16, nprobe=4).collect()
    approx = {(r.query_id, r.neighbor_id) for r in got}
    recall = len(exact & approx) / len(exact)
    # nprobe/n_cells = 1/4 of the corpus scanned; random vectors are the
    # worst case (no cluster structure for the quantizer to exploit)
    assert recall >= 0.2, f"IVF recall collapsed: {recall:.2f}"
    # every emitted row must still carry the exact re-scored cosine
    exact_scores = {
        (r.query_id, r.neighbor_id): r.cos_sim
        for r in cosine_topk(emb, queries, k=10).collect()
    }
    for r in got:
        key = (r.query_id, r.neighbor_id)
        if key in exact_scores:
            assert exact_scores[key] == r.cos_sim


def test_ivf_recall_sweep_monotone_to_exact(spark):
    """Probe-count sweep: recall vs brute force is non-decreasing in
    nprobe (more cells scanned can only add candidates, and the exact
    re-score keeps ranking consistent), and nprobe == n_cells probes
    every cell — the candidate set is the whole corpus, so the result
    must EQUAL the brute-force top-k (same rounding, same tiebreak)."""
    from etl_data_lake_spark.similarity.bruteforce import cosine_topk
    from etl_data_lake_spark.similarity.ivf import ivf_topk
    from etl_data_lake_spark.sources.catalog import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    exact = {
        (r.query_id, r.neighbor_id) for r in cosine_topk(emb, queries, k=10).collect()
    }
    recalls = []
    for nprobe in (1, 4, 8, 16):
        approx = {
            (r.query_id, r.neighbor_id)
            for r in ivf_topk(emb, queries, k=10, n_cells=16, nprobe=nprobe).collect()
        }
        recalls.append(len(exact & approx) / len(exact))
    assert recalls == sorted(recalls), f"recall not monotone in nprobe: {recalls}"
    assert recalls[-1] == 1.0, f"full probe must be exhaustive, got {recalls[-1]}"


def test_lsh_scores_are_exact_for_found_pairs(spark):
    """LSH approximates the CANDIDATE SET, never the score: any pair
    both paths return must carry the identical cosine."""
    from etl_data_lake_spark.similarity.bruteforce import cosine_topk
    from etl_data_lake_spark.similarity.lsh import lsh_bucket_topk
    from etl_data_lake_spark.sources.catalog import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    exact = {
        (r.query_id, r.neighbor_id): r.cos_sim
        for r in cosine_topk(emb, queries, k=10).collect()
    }
    for r in lsh_bucket_topk(emb, queries, k=10).collect():
        key = (r.query_id, r.neighbor_id)
        if key in exact:
            assert exact[key] == r.cos_sim


def test_pandas_cosine_matches_fold_within_tolerance(spark):
    from pyspark.sql import functions as F

    from etl_data_lake_spark.functions.vectors import (
        as_double,
        cosine,
        cosine_pandas_udf,
    )
    from etl_data_lake_spark.sources.catalog import load_table

    emb = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", as_double("embedding").alias("v")
    )
    a = emb.alias("a").limit(50)
    pairs = a.crossJoin(emb.alias("b").limit(50)).select(
        F.col("a.v").alias("av"), F.col("b.v").alias("bv")
    )
    cos_pd = cosine_pandas_udf()
    both = pairs.select(
        cosine(F.col("av"), F.col("bv")).alias("fold"),
        cos_pd(F.col("av"), F.col("bv")).alias("np"),
    ).collect()
    assert both
    for r in both:
        assert abs(r.fold - r.np) < 1e-9


def test_lsh_bucket_cap_bounds_dense_bucket(spark):
    """Adversarial shape: mass-duplicate embeddings all hash to the
    same bucket in every table, so the candidate join degenerates to
    |corpus| candidates per (query, table). cap_buckets must bound every
    bucket while the exact re-score still returns perfect neighbors."""
    from etl_data_lake_spark.similarity.lsh import (
        cap_buckets,
        lsh_bucket_topk,
        with_lsh_buckets,
    )

    n, dims, cap = 150, 8, 12
    base = [1.0, 0.25, -0.5, 0.75, -0.25, 0.5, -1.0, 0.125]
    rows = [(i, base) for i in range(n)]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    cb = with_lsh_buckets(
        corpus.selectExpr("vec_id as neighbor_id", "embedding as cv"),
        "cv", dims=dims,
    )
    sizes = cb.groupBy("table", "bucket").count()
    assert sizes.agg({"count": "max"}).collect()[0][0] == n  # adversarial confirmed

    capped_sizes = cap_buckets(cb, cap).groupBy("table", "bucket").count()
    assert capped_sizes.agg({"count": "max"}).collect()[0][0] <= cap

    queries = corpus.where("vec_id < 3")
    got = lsh_bucket_topk(
        corpus, queries, k=5, dims=dims, bucket_cap=cap
    ).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r.query_id, []).append(r)
    for q, rs in by_q.items():
        assert len(rs) <= 5
        assert all(r.cos_sim == 1.0 for r in rs)  # exact re-score intact


def test_ivf_kmeans_lifts_recall_on_clustered_corpus(spark):
    """The reason IVF exists: on clustered data the Lloyd-refined
    centroids align cells with clusters, so probing a few cells finds
    nearly all true neighbors — recall far above the scanned-fraction
    floor that random data (and unrefined random placement) gives.
    Also pins determinism: two runs return identical rows."""
    import math
    import random

    rng = random.Random(7)
    dims, n_clusters, per_cluster = 16, 8, 60
    centers = []
    for _ in range(n_clusters):
        c = [rng.uniform(-1, 1) for _ in range(dims)]
        n = math.sqrt(sum(x * x for x in c))
        centers.append([x / n for x in c])
    rows = []
    vid = 0
    for ci, c in enumerate(centers):
        for _ in range(per_cluster):
            rows.append((vid, [x + rng.gauss(0, 0.05) for x in c]))
            vid += 1
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = corpus.where("vec_id % 60 = 0")  # one per cluster

    from etl_data_lake_spark.similarity.bruteforce import cosine_topk
    from etl_data_lake_spark.similarity.ivf import ivf_topk

    exact = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk(corpus, queries, k=10).collect()
    }
    got = ivf_topk(corpus, queries, k=10, n_cells=16, nprobe=4).collect()
    approx = {(r.query_id, r.neighbor_id) for r in got}
    recall = len(exact & approx) / len(exact)
    # nprobe/n_cells = 25% scanned; random placement would give ~0.5
    # at best here — clustered + refined must clear it decisively
    assert recall >= 0.8, f"clustered recall only {recall:.2f}"

    again = ivf_topk(corpus, queries, k=10, n_cells=16, nprobe=4).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))


def test_pq_recall_refine_and_determinism(spark):
    """PQ ADC + exact refine: recall against brute force clears the
    floor measured for this deterministic fixture; two runs emit
    identical rows (bit-deterministic refine scores)."""
    from etl_data_lake_spark.similarity.bruteforce import cosine_topk
    from etl_data_lake_spark.similarity.pq import pq_topk
    from etl_data_lake_spark.sources.catalog import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk(emb, queries, k=10).collect()
    }
    got1 = [
        (r.query_id, r.neighbor_id, r.cos_sim, r.rank)
        for r in pq_topk(emb, queries, k=10, m=16, ks=32).collect()
    ]
    approx = {(q, n) for q, n, _, _ in got1}
    recall = len(exact & approx) / len(exact)
    # random vectors are the quantizer's worst case; refine_factor=4
    # lifts recall@10 to ADC-recall@40 — the fixture floor is modest
    assert recall >= 0.5, f"PQ recall collapsed: {recall:.2f}"
    got2 = [
        (r.query_id, r.neighbor_id, r.cos_sim, r.rank)
        for r in pq_topk(emb, queries, k=10, m=16, ks=32).collect()
    ]
    assert sorted(got1) == sorted(got2)


def test_pq_full_refine_equals_bruteforce(spark):
    """refine_factor covering the corpus ⇒ ADC only preselects, the
    exact re-score ranks everything ⇒ identical to brute force."""
    from etl_data_lake_spark.similarity.bruteforce import cosine_topk
    from etl_data_lake_spark.similarity.pq import pq_topk
    from etl_data_lake_spark.sources.catalog import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.where(F.col("vec_id") < 3)
    n = emb.count()
    want = {
        (r.query_id, r.neighbor_id, r.cos_sim, r.rank)
        for r in cosine_topk(emb, queries, k=5).collect()
    }
    got = {
        (r.query_id, r.neighbor_id, r.cos_sim, r.rank)
        for r in pq_topk(
            emb, queries, k=5, m=8, ks=16, refine_factor=n
        ).collect()
    }
    assert got == want


def test_pq_codes_are_compact_and_bounded(spark):
    """The compressed representation really is m small ints per
    vector (the 100 TB residency claim), and encoding is total."""
    import numpy as np

    from etl_data_lake_spark.similarity.pq import (
        pq_encode,
        sample_vectors,
        train_codebooks,
    )
    from etl_data_lake_spark.sources.catalog import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    train = sample_vectors(emb, 512, "vec_id", "embedding")
    books = train_codebooks(train, m=8, ks=16)
    assert books.shape == (8, 16, train.shape[1] // 8)
    codes = pq_encode(emb, books).collect()
    assert len(codes) == emb.count()
    arr = np.array([list(r.codes) for r in codes])
    assert arr.shape[1] == 8
    assert arr.min() >= 0 and arr.max() < 16
    # codes actually discriminate: not all vectors share one code word
    assert len({tuple(c) for c in arr}) > len(arr) // 2


def test_pq_reconstruct_round_trip(spark):
    """encode → reconstruct serves an approximate vector whose cosine
    to the (normalized) original reflects quantization error only —
    high on the real embedding table, and MONOTONE in the code
    budget (more subspaces ⇒ tighter reconstruction)."""
    import numpy as np

    from etl_data_lake_spark.similarity.pq import (
        pq_encode,
        pq_reconstruct,
        sample_vectors,
        train_codebooks,
    )
    from etl_data_lake_spark.sources.catalog import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    originals = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in emb.collect()
    }

    def mean_cos(m, ks):
        train = sample_vectors(emb, 512, "vec_id", "embedding")
        books = train_codebooks(train, m=m, ks=ks)
        recon = pq_reconstruct(pq_encode(emb, books), books).collect()
        sims = []
        for r in recon:
            o = originals[r["neighbor_id"]]
            o = o / max(np.linalg.norm(o), 1e-300)
            v = np.asarray(r["vector"])
            v = v / max(np.linalg.norm(v), 1e-300)
            sims.append(float(o @ v))
        assert len(sims) == len(originals)
        return float(np.mean(sims))

    coarse, fine = mean_cos(8, 16), mean_cos(16, 32)
    assert fine > coarse  # budget buys fidelity
    assert fine > 0.55  # random-data floor; real corpora sit higher
    # reconstructed width matches the original dimensionality
    dims = len(next(iter(originals.values())))
    books = train_codebooks(
        sample_vectors(emb, 512, "vec_id", "embedding"), m=8, ks=16
    )
    one = pq_reconstruct(pq_encode(emb.limit(1), books), books).collect()
    assert len(one[0]["vector"]) == dims


def test_near_dup_pairs_corpus_size_guard(spark):
    """The all-pairs form raises loudly past max_corpus (round-10
    verdict item #4 — the max_query_batch pattern from hnsw) and the
    message points at the blocked scale path."""
    import pytest

    from etl_data_lake_spark.queries.vector_queries import (
        embedding_near_dup_pairs,
    )

    with pytest.raises(ValueError, match="dedup_semantic_pairs"):
        embedding_near_dup_pairs(spark, SF_DIR, max_corpus=10)
    # at/below the bound the query still builds and runs
    assert embedding_near_dup_pairs(spark, SF_DIR, max_corpus=500).count() > 0


def test_blocked_near_dup_full_assign_equals_exact(spark):
    """n_assign = n_cells ⇒ every pair shares a cell ⇒ the blocked
    join is exactly the all-pairs baseline (same pairs, same rounded
    scores — the emitted cosine is the exact JVM fold either way)."""
    from etl_data_lake_spark.dedup.semantic import blocked_near_dup_pairs
    from etl_data_lake_spark.queries.registry import queries
    from etl_data_lake_spark.sources.catalog import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    exact = {
        (r.vec_a, r.vec_b, r.cos_sim)
        for r in queries()["embedding_near_dup_pairs"](spark, SF_DIR).collect()
    }
    blocked = {
        (r.vec_a, r.vec_b, r.cos_sim)
        for r in blocked_near_dup_pairs(
            emb, threshold=0.45, n_cells=8, n_assign=8
        ).collect()
    }
    assert blocked == exact and len(exact) > 0


def test_blocked_near_dup_is_subset_with_useful_recall(spark):
    """Partial assignment blocks pairs: results are a SUBSET of the
    exact baseline (no false positives — scores are exact), with
    recall above the fixture floor at n_assign=2."""
    from etl_data_lake_spark.dedup.semantic import blocked_near_dup_pairs
    from etl_data_lake_spark.queries.registry import queries
    from etl_data_lake_spark.sources.catalog import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    exact = {
        (r.vec_a, r.vec_b)
        for r in queries()["embedding_near_dup_pairs"](spark, SF_DIR).collect()
    }
    blocked = {
        (r.vec_a, r.vec_b)
        for r in blocked_near_dup_pairs(
            emb, threshold=0.45, n_cells=8, n_assign=2
        ).collect()
    }
    assert blocked <= exact
    recall = len(blocked) / len(exact)
    assert recall >= 0.5, f"blocked recall collapsed: {recall:.2f}"


def test_semantic_dedup_keep_canonical_per_cluster(spark):
    """Survivors = corpus minus non-canonical members of each
    near-dup cluster; cluster membership derived independently with
    a union-find over the full-assignment pairs."""
    from etl_data_lake_spark.dedup.semantic import (
        blocked_near_dup_pairs,
        semantic_dedup_keep,
    )
    from etl_data_lake_spark.sources.catalog import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    pairs = [
        (r.vec_a, r.vec_b)
        for r in blocked_near_dup_pairs(
            emb, threshold=0.45, n_cells=8, n_assign=8
        ).collect()
    ]
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    losers = {x for x in parent if find(x) != x}
    survivors = {
        r.vec_id
        for r in semantic_dedup_keep(
            emb, threshold=0.45, n_cells=8, n_assign=8
        ).collect()
    }
    all_ids = {r.vec_id for r in emb.select("vec_id").collect()}
    assert survivors == all_ids - losers
    assert len(losers) > 0  # the fixture really has semantic dups


def test_pq_shuffle_carries_candidates_not_corpus(spark):
    """Round-4 scale fix, tightened in round 14: encode + ADC scoring
    + per-batch partial top-k happen inside ONE fused MapInPandas over
    the raw-vector scan, and the candidate set is materialized as a
    lineage-cut local checkpoint (bounded at queries·k·refine rows) —
    the refine join therefore plans against a candidate-sized leaf
    (Scan ExistingRDD), never re-executing the Arrow pass, and no
    corpus-sized posexplode exists anywhere (no Generate node)."""
    from etl_data_lake_spark.similarity.pq import pq_topk
    from etl_data_lake_spark.sources.catalog import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.where(F.col("vec_id") < 3)
    plan = (
        pq_topk(emb, queries, k=5, m=8, ks=16)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the refine stage reads the checkpointed candidate leaf …
    assert "ExistingRDD" in plan
    # … and never re-runs (or inlines) the corpus-wide Python pass
    assert "MapInPandas" not in plan and "ArrowEvalPython" not in plan
    assert "Generate" not in plan and "PosExplode" not in plan


def test_pq_non_long_ids(spark):
    """ADVICE r3: the id type follows the caller's schema — string
    vector ids must work end-to-end like they do in lsh/ivf."""
    from etl_data_lake_spark.similarity.bruteforce import cosine_topk
    from etl_data_lake_spark.similarity.pq import pq_topk
    from etl_data_lake_spark.sources.catalog import load_table

    emb = load_table(spark, SF_DIR, "embeddings").select(
        F.concat(F.lit("doc-"), F.format_string("%05d", "vec_id")).alias(
            "vec_id"
        ),
        "embedding",
    )
    queries = emb.where(F.col("vec_id") < "doc-00003")
    n = emb.count()
    want = {
        (r.query_id, r.neighbor_id, r.cos_sim, r.rank)
        for r in cosine_topk(emb, queries, k=5).collect()
    }
    got = {
        (r.query_id, r.neighbor_id, r.cos_sim, r.rank)
        for r in pq_topk(
            emb, queries, k=5, m=8, ks=16, refine_factor=n
        ).collect()
    }
    assert got == want


def test_ann_recall_summary_thresholds(spark):
    """The registered ann_recall_summary entry (round-4 verdict #6):
    one row per approximate method, recall over the SAME thresholds
    the per-method tests above pin, and deterministic across runs."""
    from etl_data_lake_spark.queries.registry import queries

    got1 = queries()["ann_recall_summary"](spark, SF_DIR).collect()
    # round 11: recall-only schema again — per-method wall-time moved
    # to bench.py's ann_method_* entries (one isolated bench entry per
    # method beats an in-result seconds column for attribution)
    assert "seconds" not in got1[0].asDict()
    rows1 = {
        r.method: (r.hits, r.possible, r.recall_at_10) for r in got1
    }
    assert set(rows1) == {"lsh", "ivf", "pq", "hnsw", "sq", "bq"}
    floors = {"lsh": 0.4, "ivf": 0.2, "pq": 0.5, "hnsw": 0.9,
              "sq": 0.95, "bq": 0.8}
    for method, (hits, possible, recall) in rows1.items():
        assert possible > 0
        assert 0 <= hits <= possible, (method, hits, possible)
        assert recall >= floors[method], f"{method} recall {recall}"
        assert abs(recall - hits / possible) < 1e-3
    rows2 = {
        r.method: (r.hits, r.possible, r.recall_at_10)
        for r in queries()["ann_recall_summary"](spark, SF_DIR).collect()
    }
    assert rows1 == rows2
