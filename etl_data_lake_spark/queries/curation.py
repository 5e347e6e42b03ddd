"""The end-to-end corpus-curation pipeline as ONE verified query:

    quality filter → MinHash-LSH near-dup pairs → connected-component
    clustering → keep the canonical doc per cluster

i.e. the standard pretraining-data flow (cheap filters first, expensive
dedup on the survivors, one representative per duplicate group). Every
stage is an operator that is ALSO individually oracle-checked
(text_quality_scores, dedup_minhash_lsh_pairs, dedup_minhash_clusters);
this entry verifies the COMPOSITION — filters applied before pair
generation, cluster losers dropped, untouched docs passing through.

Scale shape: the quality filter prunes the corpus before any shuffle;
LSH candidates bound the pair work; clustering touches only pair-graph
nodes; the final anti-join broadcasts the (small) loser set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_data_lake_spark.dedup.cluster import dedup_keep_canonical
from etl_data_lake_spark.dedup.minhash import minhash_lsh_pairs
from etl_data_lake_spark.functions.text import stopword_count, tokens
from etl_data_lake_spark.queries.dedup_queries import _minhash_oracle, _TOK
from etl_data_lake_spark.functions.text import sql_stopword_count
from etl_data_lake_spark.queries.registry import register
from etl_data_lake_spark.sources.catalog import load_table

# the quality gate (same predicate as text_quality_scores.quality_pass)
_QUALITY_WHERE = (
    f"len({_TOK}) >= 10"
    f" AND {sql_stopword_count(_TOK)} * 1.0 / len({_TOK}) BETWEEN 0.01 AND 0.6"
    f" AND len(list_distinct({_TOK})) * 1.0 / len({_TOK}) > 0.2"
)

_CURATED_SRC = f"(SELECT doc_id, text FROM documents WHERE {_QUALITY_WHERE})"


def _curation_oracle() -> str:
    # canonical-by-QUALITY (round-8 verdict #8): the cluster survivor
    # is the member the NB quality classifier scores highest (fixed-
    # point integer odds — exact cross-engine ordering; ties → min
    # id), not the arbitrary minimum id. The odds CTEs reproduce
    # quality_classifier_scores' already-green oracle arithmetic.
    from etl_data_lake_spark.functions.classifier import (
        WEIGHT_SCALE,
        sql_weak_quality_label,
    )

    return f"""
        WITH RECURSIVE pairs AS ({_minhash_oracle(source=_CURATED_SRC)}),
        edges AS (
            SELECT doc_a AS src, doc_b AS dst FROM pairs
            UNION
            SELECT doc_b AS src, doc_a AS dst FROM pairs
        ),
        reach(n, m) AS (
            SELECT src, src FROM edges
            UNION
            SELECT r.n, e.dst FROM reach r JOIN edges e ON r.m = e.src
        ),
        members AS (
            SELECT n AS doc_id, MIN(m) AS cluster FROM reach GROUP BY n
        ),
        lab AS (
            SELECT doc_id, {_TOK} AS toks,
                   {sql_weak_quality_label(_TOK)} AS y
            FROM documents
        ),
        tok AS (SELECT doc_id, y, unnest(toks) AS term FROM lab),
        counts AS (
            SELECT term, SUM(y) AS c_pos, SUM(1 - y) AS c_neg
            FROM tok GROUP BY term
        ),
        tot AS (
            SELECT SUM(c_pos) AS n_pos, SUM(c_neg) AS n_neg,
                   COUNT(*) AS v
            FROM counts
        ),
        w AS (
            SELECT term,
                   CAST(ROUND((ln((c_pos + 1.0) / (n_pos + v))
                               - ln((c_neg + 1.0) / (n_neg + v)))
                              * {WEIGHT_SCALE}) AS BIGINT) AS w_q
            FROM counts, tot
        ),
        odds AS (
            SELECT tok.doc_id, CAST(SUM(w.w_q) AS BIGINT) AS oq
            FROM tok JOIN w USING (term)
            GROUP BY tok.doc_id
        ),
        ranked AS (
            SELECT m.doc_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY m.cluster
                       ORDER BY o.oq DESC, m.doc_id
                   ) AS rk
            FROM members m JOIN odds o USING (doc_id)
        ),
        losers AS (SELECT doc_id FROM ranked WHERE rk > 1)
        SELECT d.doc_id, d.lang, d.n_chars
        FROM documents d
        JOIN {_CURATED_SRC} c ON d.doc_id = c.doc_id
        WHERE d.doc_id NOT IN (SELECT doc_id FROM losers)
    """


def quality_filter(docs: DataFrame) -> DataFrame:
    toks = tokens("text")
    n = F.size(toks)
    stop_ratio = stopword_count(toks) * F.lit(1.0) / n
    distinct_ratio = F.size(F.array_distinct(toks)) * F.lit(1.0) / n
    return docs.where(
        (n >= 10) & stop_ratio.between(0.01, 0.6) & (distinct_ratio > 0.2)
    )


@register(
    "corpus_curation_pipeline",
    oracle=_curation_oracle(),
    tags=("pipeline", "dedup", "text", "flagship"),
)
def corpus_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Since round 9 the cluster canonical is chosen by MODEL quality
    (the NB classifier's log-odds — the quality_classifier_scores
    composition), not minimum id: dedup keeps the BEST copy of each
    duplicate group. One extra tokenize scan + term-keyed shuffle for
    the scorer; the rank window stays graph-sized."""
    from pyspark import StorageLevel

    from etl_data_lake_spark.queries.quality_model import (
        _scored_with_weak_labels,
    )

    docs = load_table(spark, sf_dir, "documents")
    # TWO consumers read the filtered corpus (the shingle pipeline and
    # the final anti-join projection) and the quality predicate is a
    # full tokenize pass — persist so it runs once (§5 rule: reused,
    # spillable; the bench clears caches between queries).
    curated = quality_filter(docs).persist(StorageLevel.MEMORY_AND_DISK)
    pairs = minhash_lsh_pairs(curated, threshold=0.5)
    # scorer as a CALLABLE: only cluster MEMBERS are ever ranked, so
    # the NB scoring join + per-doc aggregation semi-join down to the
    # graph-sized member set (the model itself still trains on the
    # full corpus — oracle arithmetic unchanged).
    kept = dedup_keep_canonical(
        curated,
        pairs,
        scores=lambda member_ids: _scored_with_weak_labels(
            spark, sf_dir, only_ids=member_ids
        ).select("doc_id", F.col("log_odds").alias("score")),
    )
    return kept.select("doc_id", "lang", "n_chars")
