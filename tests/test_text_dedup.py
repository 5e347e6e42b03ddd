"""Dedup-family behavior tests: LSH recall against the exact baseline,
SimHash Hamming pairing, canonical exact dedup."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_minhash_lsh_recall_vs_exact(spark):
    """Every high-similarity pair the exact quadratic baseline finds
    must be recovered by the LSH path (b=4, r=3 S-curve crosses ~0.63,
    so require full recall only at J >= 0.8)."""
    from etl_data_lake_spark.dedup.jaccard import jaccard_pairs, shingle_table
    from etl_data_lake_spark.dedup.minhash import minhash_lsh_pairs
    from etl_data_lake_spark.sources.catalog import load_table

    docs = load_table(spark, SF_DIR, "documents")
    exact = {
        (r.doc_a, r.doc_b)
        for r in jaccard_pairs(shingle_table(docs), 0.8).collect()
    }
    lsh = {
        (r.doc_a, r.doc_b)
        for r in minhash_lsh_pairs(docs, threshold=0.5).collect()
    }
    assert exact, "fixture should contain at least one >=0.8 near-dup pair"
    missing = exact - lsh
    assert not missing, f"LSH missed high-similarity pairs: {missing}"


def test_simhash_near_dups_have_small_hamming(spark):
    """Near-identical docs (shingle Jaccard >= 0.9) must land within a
    small Hamming ball; random pairs must not."""
    from etl_data_lake_spark.dedup.jaccard import jaccard_pairs, shingle_table
    from etl_data_lake_spark.dedup.simhash import hamming_pairs, simhash_table
    from etl_data_lake_spark.sources.catalog import load_table

    docs = load_table(spark, SF_DIR, "documents")
    near = {
        (r.doc_a, r.doc_b)
        for r in jaccard_pairs(shingle_table(docs), 0.9).collect()
    }
    sims = simhash_table(docs)
    ham = {
        (r.doc_a, r.doc_b): r.hamming
        for r in hamming_pairs(sims, max_distance=8).collect()
    }
    for pair in near:
        assert pair in ham, f"near-dup {pair} not within Hamming<=8"
    # sanity: the Hamming ball is selective (not everything matches)
    n_docs = docs.count()
    assert len(ham) < n_docs * (n_docs - 1) / 20


def test_exact_dedup_canonical_semantics(spark):
    from etl_data_lake_spark.dedup.exact import canonicalize_exact

    df = spark.createDataFrame(
        [(1, "x"), (7, "x"), (3, "y")], "doc_id long, text string"
    )
    got = {
        (r.canonical_id, r.dup_count)
        for r in canonicalize_exact(df).collect()
    }
    assert got == {(1, 2), (3, 1)}


def test_shingles_short_doc_empty(spark):
    from etl_data_lake_spark.functions.text import tokens, word_shingles

    df = spark.createDataFrame([("a b",), ("a b c d",)], "text string")
    out = df.select(F.size(word_shingles(tokens("text"))).alias("n")).collect()
    assert sorted(r.n for r in out) == [0, 2]


def test_connected_components_known_graph(spark):
    from etl_data_lake_spark.dedup.cluster import connected_components

    # two components {1,2,3,4} (chain) and {10,11}; 99 isolated via self-pair
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], ["doc_a", "doc_b"]
    )
    got = {
        (r.doc_id, r.cluster_id)
        for r in connected_components(pairs).collect()
    }
    assert got == {(1, 1), (2, 1), (3, 1), (4, 1), (10, 10), (11, 10)}


def test_connected_components_null_ids_route_distributed(spark):
    """Round-14 ADVICE fix: a small graph containing null endpoints
    must not crash the driver-side union-find (None < int raised
    TypeError); it routes to the distributed loop, so both paths
    label null-containing graphs identically."""
    from etl_data_lake_spark.dedup.cluster import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (None, 3), (4, None), (None, None)],
        "doc_a long, doc_b long",
    )
    via_guard = sorted(
        ((r.doc_id, r.cluster_id) for r in connected_components(pairs).collect()),
        key=str,
    )
    distributed = sorted(
        (
            (r.doc_id, r.cluster_id)
            for r in connected_components(pairs, local_max_edges=0).collect()
        ),
        key=str,
    )
    assert via_guard == distributed
    assert (1, 1) in via_guard and (2, 1) in via_guard


def test_dedup_keep_canonical(spark):
    from etl_data_lake_spark.dedup.cluster import dedup_keep_canonical
    from etl_data_lake_spark.sources.catalog import load_table

    docs = load_table(spark, SF_DIR, "documents")
    pairs = spark.createDataFrame([(0, 1), (1, 2), (5, 7)], ["doc_a", "doc_b"])
    kept = dedup_keep_canonical(docs, pairs)
    kept_ids = {r.doc_id for r in kept.select("doc_id").collect()}
    assert {1, 2, 7}.isdisjoint(kept_ids)  # losers dropped
    assert {0, 5}.issubset(kept_ids)  # canonical reps kept
    assert kept.count() == docs.count() - 3


def test_dedup_keep_canonical_by_quality_score(spark):
    """Round-8 verdict #8: with a scores frame the cluster survivor is
    the HIGHEST-scoring member (ties -> min id; unscored members lose
    to scored ones), so dedup keeps the best copy, not the lowest id.
    Planted so min-id and max-score DISAGREE on every cluster."""
    from etl_data_lake_spark.dedup.cluster import dedup_keep_canonical
    from etl_data_lake_spark.sources.catalog import load_table

    docs = load_table(spark, SF_DIR, "documents")
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (5, 7), (8, 9)], ["doc_a", "doc_b"]
    )
    scores = spark.createDataFrame(
        # cluster {0,1,2}: best is 2 (min-id would keep 0);
        # cluster {5,7}: tie -> min id 5;
        # cluster {8,9}: 8 unscored -> scored 9 wins
        [(0, 1.0), (1, 2.0), (2, 9.0), (5, 4.0), (7, 4.0), (9, -3.0)],
        "doc_id long, score double",
    )
    kept = dedup_keep_canonical(docs, pairs, scores=scores)
    kept_ids = {r.doc_id for r in kept.select("doc_id").collect()}
    assert {0, 1, 7, 8}.isdisjoint(kept_ids)
    assert {2, 5, 9}.issubset(kept_ids)
    assert kept.count() == docs.count() - 4
    # docs in no cluster pass through regardless of (missing) scores
    assert 3 in kept_ids


def test_minhash_bucket_cap_bounds_adversarial_corpus(spark):
    """Adversarial shape: a corpus of identical documents puts every
    doc in ONE bucket per band, so uncapped candidate generation is
    quadratic — n(n-1)/2 pairs through a single reducer. The cap must
    bound candidates at bands*cap*(cap-1)/2 while still emitting a
    clique among the survivors (transitivity keeps clusters intact)."""
    from etl_data_lake_spark.dedup.jaccard import shingle_table
    from etl_data_lake_spark.dedup.minhash import (
        lsh_candidates,
        minhash_lsh_pairs,
        minhash_signatures,
    )

    n, cap, bands = 120, 10, 4
    text = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [(i, text) for i in range(n)], "doc_id long, text string"
    )
    sigs = minhash_signatures(shingle_table(docs, hashed=True))

    uncapped = lsh_candidates(sigs).count()
    assert uncapped == n * (n - 1) // 2  # genuinely quadratic

    capped = lsh_candidates(sigs, bucket_cap=cap).count()
    assert capped <= bands * cap * (cap - 1) // 2
    # identical docs -> identical signatures -> every band keeps the
    # same lowest doc_ids, so the bound collapses to one clique
    assert capped == cap * (cap - 1) // 2

    pairs = minhash_lsh_pairs(docs, threshold=0.5, bucket_cap=cap).collect()
    assert len(pairs) == cap * (cap - 1) // 2
    assert all(r.jaccard == 1.0 for r in pairs)


def test_connected_components_nonconvergence_is_loud(spark):
    """A component with diameter > max_rounds must not silently return
    split clusters: strict raises, non-strict warns."""
    import warnings

    import pytest

    from etl_data_lake_spark.dedup.cluster import connected_components

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "doc_a long, doc_b long"
    )
    # local_max_edges=0 forces the distributed loop — the driver-side
    # union-find path always converges, so max_rounds only exists there
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(
            chain, max_rounds=2, local_max_edges=0
        ).collect()

    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        labels = connected_components(
            chain, max_rounds=2, strict=False, local_max_edges=0
        )
        got = {r.doc_id: r.cluster_id for r in labels.collect()}
    assert any("did not converge" in str(w.message) for w in caught)
    assert len(got) == 13  # all nodes labeled, just not fully merged

    full = connected_components(chain, max_rounds=20, local_max_edges=0)
    assert {r.cluster_id for r in full.collect()} == {0}
    # the local path (default bound) returns the identical labeling
    local = connected_components(chain)
    assert {(r.doc_id, r.cluster_id) for r in local.collect()} == {
        (i, 0) for i in range(13)
    }


def test_shingle_pandas_udf_matches_jvm_expressions(spark):
    """The Arrow-batched shingle hasher must be bit-identical to the
    JVM higher-order-function formulation it replaced (same char fold,
    same composition, same tokenization edge semantics) — over the real
    corpus AND adversarial edge docs."""
    from etl_data_lake_spark.functions.text import (
        compose_shingle_hashes,
        poly_hash,
        shingle_hashes_pandas_udf,
        tokens,
    )
    from etl_data_lake_spark.sources.catalog import load_table

    edge = spark.createDataFrame(
        [
            (1000001, ""),
            (1000002, "   "),
            (1000003, "one"),
            (1000004, "one two"),
            (1000005, "one two three"),
            (1000006, "  padded   with\tmixed\nwhitespace\rhere ok  "),
            (1000007, "a b c d e f g"),
            (1000008, "ünïcode tökens première 北京 déjà vu encore"),
            (1000009, ("rep eat " * 50).strip()),
        ],
        "doc_id long, text string",
    )
    docs = (
        load_table(spark, SF_DIR, "documents")
        .select("doc_id", "text")
        .unionByName(edge)
    )
    jvm = docs.select(
        "doc_id",
        F.array_distinct(
            compose_shingle_hashes(
                F.transform(tokens("text"), lambda t: poly_hash(t)), 3
            )
        ).alias("sh"),
    )
    pnd = docs.select(
        "doc_id", shingle_hashes_pandas_udf(3)(F.col("text")).alias("sh")
    )
    a = {r.doc_id: list(r.sh) for r in jvm.collect()}
    b = {r.doc_id: list(r.sh) for r in pnd.collect()}
    assert a == b
