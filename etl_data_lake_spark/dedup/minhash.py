"""MinHash + LSH near-duplicate detection, DataFrame-native.

(Min-wise independent permutations: Broder et al., STOC 1998; LSH
banding scheme: Indyk & Motwani, STOC 1998 — both public-domain
classics, parameters chosen for the S-curve noted below.)

shingle → polynomial hash h → k permutations h_i = (a_i·h + b_i) mod P
→ per-doc signature (k mins, ONE hash aggregation) → band keys (r
mins combined per band) → bucket self-join per band → candidate pairs
→ exact Jaccard verify (dedup.jaccard reused, restricted to
candidates).

Everything is integer arithmetic on 64-bit values mod P=1e9+7, so the
DuckDB oracle reproduces it bit-for-bit — a property Spark's builtin
``MinHashLSH`` (pyspark.ml) can't give us, and the reason this is
hand-rolled. Cost model at 100 TB: one explode (|docs|·|shingles|
rows), one groupBy doc, one groupBy (band, key) whose fan-out is
bounded by bucket sizes — no quadratic term until the verify join,
which only sees LSH candidates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from etl_data_lake_spark.dedup.jaccard import jaccard_pairs, shingle_table
from etl_data_lake_spark.functions.text import MOD

# fixed permutation constants (small primes; a_i must be non-zero mod P)
PERM_A = (131, 137, 139, 149, 151, 157, 163, 167, 173, 179, 181, 191)
PERM_B = (7919, 104729, 1299709, 15485863, 32452843, 49979687,
          67867967, 86028121, 104395301, 122949823, 141650939, 160481183)


def minhash_signatures(shingles_hashed: DataFrame, k: int = 12) -> DataFrame:
    """(doc_id, shingle:int) → (doc_id, mh0..mh{k-1})."""
    aggs = [
        F.min((F.col("shingle") * PERM_A[i] + PERM_B[i]) % MOD).alias(f"mh{i}")
        for i in range(k)
    ]
    return shingles_hashed.groupBy("doc_id").agg(*aggs)


def _band_key(cols: list[str]):
    key = F.col(cols[0])
    for c in cols[1:]:
        key = (key * 31 + F.col(c)) % MOD
    return key


def band_table(signatures: DataFrame, bands: int, rows: int) -> DataFrame:
    """(doc_id, band, band_key): single-pass posexplode banding of a
    signature frame — THE banding definition, shared by the one-shot
    LSH path and the persisted incremental index so the two can never
    diverge."""
    band_keys = [
        _band_key([f"mh{b * rows + r}" for r in range(rows)])
        for b in range(bands)
    ]
    return signatures.select(
        "doc_id", F.posexplode(F.array(*band_keys)).alias("band", "band_key")
    )


def lsh_candidates(
    signatures: DataFrame,
    bands: int = 4,
    rows: int = 3,
    bucket_cap: int | None = None,
    band_tbl: DataFrame | None = None,
) -> DataFrame:
    """Band the signature and bucket-join: docs agreeing on ALL r mins
    of any band become a candidate pair.

    Single-pass banding: all band keys are derived in ONE select and
    fanned out with ``posexplode`` — the signature aggregate is planned
    once, not once per band (the former ``bands``-way union re-planned
    the groupBy-min per branch; ReuseExchange softened but did not
    eliminate the duplicate aggregation).

    ``bucket_cap`` bounds the self-join's worst case: a bucket holding
    m docs emits m(m-1)/2 pairs, so an adversarial corpus (mass
    near-identical text that was not collapsed by exact dedup first)
    goes quadratic in one reducer. With a cap, each (band, band_key)
    bucket keeps only its ``bucket_cap`` lowest doc_ids (deterministic),
    bounding candidates at bands·cap·(cap-1)/2 total. Default None
    preserves the exact LSH-candidate semantics the DuckDB oracle
    reproduces; at 100 TB run exact dedup first, then cap as insurance
    — docs sharing a capped bucket still clique, so clusters survive
    via transitivity.

    ``band_tbl`` optionally supplies an already-computed
    :func:`band_table` (the incremental index persists one) so the
    banding is not re-derived."""
    if band_tbl is None:
        # materialize + cut lineage: both sides of the bucket self-join
        # reference this frame, and left lazy each side re-runs the
        # whole signature aggregation (groupBy-min over the shingle
        # table) that feeds it. Bounded at |docs|·bands rows of
        # (id, int, long) — banding metadata, not corpus payload.
        band_tbl = band_table(signatures, bands, rows).localCheckpoint(
            eager=True
        )
    if bucket_cap is not None:
        w = Window.partitionBy("band", "band_key").orderBy("doc_id")
        band_tbl = (
            band_tbl.withColumn("__bn", F.row_number().over(w))
            .where(F.col("__bn") <= bucket_cap)
            .drop("__bn")
        )
    a, b_ = band_tbl.alias("a"), band_tbl.alias("b")
    return (
        a.join(
            b_,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    k: int = 12,
    bands: int = 4,
    rows: int = 3,
    threshold: float = 0.5,
    bucket_cap: int | None = None,
) -> DataFrame:
    """→ (doc_a, doc_b, jaccard): LSH candidates verified by exact
    Jaccard ≥ threshold. With b=4, r=3 the S-curve crosses ~0.63 —
    candidates below that are caught with decreasing probability, so
    recall vs dedup.jaccard is checked in tests, not assumed.

    Cache lifecycle: the shingle table is persisted (it feeds the
    signature aggregate AND both sides of the verify probe) and stays
    cached after the returned DataFrame materializes — the plan is
    lazy, so this function cannot know when it is safe to unpersist.
    CALLERS OWN THE CACHE: a long-lived session issuing many corpora
    should ``spark.catalog.clearCache()`` (or unpersist via
    ``spark.catalog.cacheTable`` bookkeeping) between runs, as bench.py
    does between queries."""
    assert bands * rows <= k
    # the shingle table feeds three consumers (signatures + both sides
    # of the verify probe); persist it once instead of recomputing the
    # explode+hash chain per consumer — the canonical reuse case.
    # MEMORY_AND_DISK: spills rather than OOMs when the corpus is big.
    from pyspark import StorageLevel

    sh = shingle_table(docs, text_col, id_col, n, hashed=True).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    sigs = minhash_signatures(sh, k)
    cand = lsh_candidates(sigs, bands, rows, bucket_cap=bucket_cap)
    return jaccard_pairs(sh, threshold, candidates=cand)
