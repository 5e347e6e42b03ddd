"""SimHash document fingerprints (near-dup via Hamming distance).

(Charikar, "Similarity Estimation Techniques from Rounding
Algorithms", STOC 2002.)

Charikar-style: each distinct FEATURE (3-word shingle — unigrams are
useless on small vocabularies: every doc shares most words and all
fingerprints collapse into one Hamming ball) hashes to a 30-bit
value; bit j contributes +1/-1 per document; the fingerprint sets
bit j when the sum is positive. Computed as one explode + one groupBy
with 30 conditional-sum aggregates — entirely JVM-side integer
arithmetic, reproducible in the DuckDB oracle.

Near-dup lookup at scale: index fingerprints by rotations/bands and
compare Hamming distance only within buckets (same LSH idea as
minhash.py); tests do the pairwise check directly at test scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_data_lake_spark.dedup.jaccard import shingle_table

N_BITS = 30


def simhash_table(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """→ (doc_id, simhash) with an N_BITS-bit fingerprint over n-word
    shingle features."""
    feats = shingle_table(docs, text_col, id_col, n, hashed=True).withColumnRenamed(
        "shingle", "h"
    )
    bit_sums = feats.groupBy("doc_id").agg(
        *[
            F.sum(
                F.expr(f"((h div {1 << j}) % 2) * 2 - 1")
            ).alias(f"s{j}")
            for j in range(N_BITS)
        ]
    )
    fingerprint = None
    for j in range(N_BITS):
        term = F.when(F.col(f"s{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        fingerprint = term if fingerprint is None else fingerprint + term
    return bit_sums.select(
        "doc_id", fingerprint.cast("long").alias("simhash")
    )


def hamming_pairs(simhashes: DataFrame, max_distance: int = 3) -> DataFrame:
    """Pairwise Hamming-distance filter (test-scale; band the
    fingerprint for the production path)."""
    a, b = simhashes.alias("a"), simhashes.alias("b")
    xor = F.expr("a.simhash ^ b.simhash")
    return (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(xor).alias("hamming"),
        )
        .where(F.col("hamming") <= max_distance)
    )
