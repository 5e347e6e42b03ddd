"""TF-IDF / BM25 relevance scoring over a document corpus.

Lexical retrieval quality scores (Robertson & Zaragoza's BM25 — the
public Okapi formulation) as DataFrame aggregations: the shapes a
curation pipeline uses for query-based corpus slicing ("pull the docs
most relevant to these seed terms") and for lightweight quality
features (distinctive-term density).

Plan shape, built for 100 TB: one explode → one (term, doc) count
aggregation [shuffle on (doc, term)] → one doc-frequency aggregation
over distinct (term, doc) rows [shuffle on term, map-side combined] →
per-(doc, term) score with corpus constants attached via a broadcast
1-row cross join (never a driver collect). Query scoring filters the
term table to the query's terms FIRST (an `isin` filter that prunes
at the scan when the term table is materialized parquet), so cost
scales with |matching postings|, not corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from etl_data_lake_spark.functions.text import tokens
from etl_data_lake_spark.operators.topk import top_k


def term_doc_table(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """→ (doc_id, term, tf, dl): term frequency per document plus the
    document length, the posting-list base table."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens(text_col)).alias("term"),
    )
    return (
        toks.groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
        .withColumn("dl", F.sum("tf").over(Window.partitionBy("doc_id")))
    )


def corpus_stats(term_doc: DataFrame) -> DataFrame:
    """1-row (n_docs, avgdl) — broadcast-joined onto scoring plans."""
    per_doc = term_doc.groupBy("doc_id").agg(F.first("dl").alias("dl"))
    return per_doc.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )


def doc_frequencies(term_doc: DataFrame) -> DataFrame:
    """→ (term, df): number of documents containing each term."""
    return term_doc.groupBy("term").agg(
        F.count("*").cast("long").alias("df")
    )


def tfidf(term_doc: DataFrame) -> DataFrame:
    """→ (doc_id, term, tf, tfidf) with the standard smooth idf
    ``ln((1+N)/(1+df)) + 1`` (scikit-learn's public formulation, never
    negative, defined for df=N)."""
    stats = corpus_stats(term_doc)
    dfreq = doc_frequencies(term_doc)
    return (
        term_doc.join(dfreq, "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            "term",
            "tf",
            (
                F.col("tf")
                * (
                    F.log((1 + F.col("n_docs")) / (1 + F.col("df")))
                    + F.lit(1.0)
                )
            ).alias("tfidf"),
        )
    )


def bm25_score(
    docs: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    limit: int = 10,
) -> DataFrame:
    """→ top-``limit`` (doc_id, score) for a bag-of-words query, Okapi
    BM25: idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)),
    score = Σ_t idf·tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)).

    The per-doc score sums its term scores in SORTED-TERM order via
    per-term conditional aggregates added left-to-right — each
    aggregate covers exactly one (doc, term) row, so the float
    summation order is fixed and the result is reproducible across
    partitionings and engines (a plain ``sum`` leaves the order to the
    shuffle). Queries are a handful of terms, so the fixed-width agg
    costs nothing.

    Plan shape (round 14): the naive form evaluated the full
    ``term_doc_table`` subtree THREE times (postings, df, corpus
    stats), each paying the tokenize+explode scan, the (doc, term)
    shuffle, and a window over the whole posting table for ``dl``.
    Here every corpus-wide quantity is derived without the window:

    * ``dl`` is ``sum(size(tokens))`` per doc (identical to the old
      ``sum(tf) over (partition by doc)`` — explode emits one row per
      array element), so the per-doc length table shuffles one
      ``(id, int)`` row per doc instead of sorting the posting table;
    * postings are pruned to the query's terms BEFORE their shuffle;
    * ``df`` aggregates the pruned postings themselves — for query
      terms they are exactly the matching ``term_doc`` rows, so no
      second corpus pass exists at all.

    Two tokenize scans total (one narrow: token counts only), zero
    windows, and every exchange after the scans is query-sized except
    the per-doc length aggregation — which the removed window also
    paid, on strictly more bytes."""
    terms = sorted(set(query_terms))
    toks = tokens(text_col)
    base = docs.select(
        F.col(id_col).alias("doc_id"), toks.alias("_toks")
    ).where(F.col("_toks").isNotNull())
    # one (id, int) row per doc; groupBy (not a bare select) so
    # duplicate doc ids merge exactly like term_doc_table's aggregation
    doc_lens = base.groupBy("doc_id").agg(
        F.sum(F.size("_toks")).alias("dl")
    )
    stats = doc_lens.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    counts = (
        base.select("doc_id", F.explode("_toks").alias("term"))
        .where(F.col("term").isin(terms))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    postings = counts.join(doc_lens, "doc_id")
    dfreq = counts.groupBy("term").agg(
        F.count("*").cast("long").alias("df")
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    denom = F.col("tf") + k1 * (
        1 - b + b * F.col("dl") / F.col("avgdl")
    )
    per_term = (
        postings.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn("term_score", idf * F.col("tf") * (k1 + 1) / denom)
        .groupBy("doc_id")
        .agg(
            *[
                F.sum(
                    F.when(F.col("term") == t, F.col("term_score"))
                ).alias(f"_s{i}")
                for i, t in enumerate(terms)
            ]
        )
    )
    score = F.coalesce(F.col("_s0"), F.lit(0.0))
    for i in range(1, len(terms)):
        score = score + F.coalesce(F.col(f"_s{i}"), F.lit(0.0))
    scored = per_term.select("doc_id", score.alias("score"))
    return top_k(scored, [F.desc("score"), F.asc("doc_id")], limit)
