"""n-gram Jaccard near-duplicate pairs (the exact, quadratic-ish
baseline that MinHash-LSH approximates).

Pipeline: doc → distinct n-word shingles (exploded long table) →
self-join on shingle → per-pair intersection counts → Jaccard via
inclusion-exclusion. All joins/aggs on integer-or-short-string keys;
integer division makes the score bit-identical across engines.

Scale: the shingle self-join is |pairs sharing a shingle| — fine while
shingles are selective; when a hot shingle appears in k docs it
contributes k² pair rows, so at 100 TB cap shingle frequency (drop
shingles with doc-frequency above a threshold — they carry no dedup
signal anyway) and/or switch to minhash.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_data_lake_spark.functions.text import (
    shingle_hashes_pandas_udf,
    tokens,
    word_shingles,
)
from etl_data_lake_spark.sources.catalog import fan_out


def shingle_table(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    hashed: bool = False,
) -> DataFrame:
    """→ (doc_id, shingle) — distinct n-word shingles per document."""
    docs = fan_out(docs)
    if hashed:
        # hash and dedup INSIDE the per-doc batch, then explode: one
        # narrow pass, no shuffle. Hashes are COMPOSED from per-token
        # hashes (each token char-folded once) — no shingle strings are
        # ever materialized; the SQL oracle twin implements the
        # identical composition. The fold runs as an Arrow-batched
        # pandas UDF: the JVM higher-order-function version of the same
        # math executes as interpreted lambdas (a closure call per
        # CHARACTER) and was the measured bottleneck of the LSH family;
        # functions.text keeps the expression twin and tests pin their
        # bit-equality (see shingle_hashes_pandas_udf).
        shingle_hashes = shingle_hashes_pandas_udf(n)
        return docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(shingle_hashes(F.col(text_col))).alias("shingle"),
        )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(word_shingles(tokens(text_col), n))).alias(
            "shingle"
        ),
    )


def jaccard_pairs(
    shingles: DataFrame, threshold: float = 0.5, candidates: DataFrame | None = None
) -> DataFrame:
    """→ (doc_a, doc_b, jaccard) for pairs with J >= threshold.

    ``candidates`` (doc_a, doc_b), when given, restricts the verify
    join to LSH candidates — the MinHash path reuses this verbatim.
    """
    # one row per doc; REFERENCED TWICE below (n_a and n_b joins). Left
    # lazy, Spark plans the whole per-doc count aggregation — a full
    # pass over the shingle table plus its exchange — once per
    # reference (round-15 plan audit: two identical
    # HashAggregate+Exchange subtrees). Materializing the doc-sized
    # count table runs that pass once; at corpus scale the saving is a
    # full shingle-table aggregation, for a bounded (|docs| row)
    # checkpoint.
    sizes = (
        shingles.groupBy("doc_id")
        .agg(F.count("*").alias("n_sh"))
        .localCheckpoint(eager=True)
    )
    if candidates is not None:
        # Candidates-FIRST: expand each (doc_a, doc_b) by doc_a's
        # shingles, probe doc_b's on (doc_b, shingle). Work is
        # |candidates| x avg shingles — NOT the corpus-wide co-shingle
        # blowup the no-candidates branch pays. Never build the full
        # self-join only to semi-filter it afterwards.
        inter = (
            candidates.join(
                shingles.select(F.col("doc_id").alias("doc_a"), "shingle"),
                "doc_a",
            )
            .join(
                shingles.select(F.col("doc_id").alias("doc_b"), "shingle"),
                ["doc_b", "shingle"],
            )
            .select("doc_a", "doc_b")
        )
    else:
        a = shingles.alias("a")
        b = shingles.alias("b")
        inter = a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        ).select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
    inter = inter.groupBy("doc_a", "doc_b").agg(F.count("*").alias("n_inter"))
    joined = (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a"), "doc_a")
        .withColumnRenamed("n_sh", "n_a")
        .join(
            sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed(
                "n_sh", "n_b"
            ),
            "doc_b",
        )
    )
    jac = F.col("n_inter") * F.lit(1.0) / (
        F.col("n_a") + F.col("n_b") - F.col("n_inter")
    )
    return joined.select("doc_a", "doc_b", jac.alias("jaccard")).where(
        F.col("jaccard") >= threshold
    )
