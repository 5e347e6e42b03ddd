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
        losers AS (
            SELECT n FROM (SELECT n, MIN(m) AS c FROM reach GROUP BY n)
            WHERE c != n
        )
        SELECT d.doc_id, d.lang, d.n_chars
        FROM documents d
        JOIN {_CURATED_SRC} c ON d.doc_id = c.doc_id
        WHERE d.doc_id NOT IN (SELECT n FROM losers)
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
    docs = load_table(spark, sf_dir, "documents")
    curated = quality_filter(docs)
    pairs = minhash_lsh_pairs(curated, threshold=0.5)
    kept = dedup_keep_canonical(curated, pairs)
    return kept.select("doc_id", "lang", "n_chars")
