"""Unigram language-model perplexity scoring — the CCNet/Gopher-style
"perplexity filter" of a pretraining-data pipeline: train a small LM
on a trusted reference corpus, score every candidate document, keep
the low-perplexity (in-domain) tail.

The public recipe uses a KenLM 5-gram; that library is absent here
and the SPARK-side shape is the point, so the model is an add-alpha
smoothed unigram over a bounded vocabulary — the same plumbing
(bounded broadcast model, token-level scoring, per-doc aggregation)
a KenLM-backed scorer would use, with the model swap isolated to one
join.

Scale shape:

* TRAIN: tokenize → explode → groupBy(term) count (map-side combined;
  the shuffle carries distinct terms, not tokens) → top-``vocab_size``
  by count (TakeOrderedAndProject — distributed top-k, no global
  sort) → per-term log-probs against broadcast 1-row totals. The
  model is ≤ vocab_size rows by construction — always broadcastable.
* SCORE: tokenize → explode → broadcast-left-join the model →
  missing terms take the OOV log-prob → one per-doc aggregation.
  The 100 TB candidate corpus is ONE scan; the shuffle is per-doc
  partial aggregates.

Probabilities are proper: the model is categorical over the V kept
terms plus one OOV outcome whose count is every truncated token,
``p = (c + alpha) / (N + alpha * (V + 1))`` — so perplexities are
comparable across documents and thresholds are meaningful.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_data_lake_spark.functions.text import tokens

OOV_LOGP_COL = "logp"


def train_unigram_lm(
    ref_docs: DataFrame,
    text_col: str = "text",
    vocab_size: int = 50_000,
    alpha: float = 1.0,
) -> tuple[DataFrame, float]:
    """→ ``(model, oov_logp)``: the model is ``(term, logp)`` for the
    ``vocab_size`` most frequent reference terms (count-desc, term-asc
    tie-break — deterministic truncation), ``oov_logp`` the shared
    log-prob of any unseen/truncated term. The reference aggregation
    executes ONCE (persisted across the totals row + the bounded
    top-k collect); the model is a ≤ vocab_size-row local frame."""
    if vocab_size < 1:
        raise ValueError(f"vocab_size must be >= 1, got {vocab_size}")
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    counts = (
        ref_docs.select(F.explode(tokens(text_col)).alias("term"))
        .where(F.col("term") != "")  # split('') artifact, see scorer
        .groupBy("term")
        .agg(F.count("*").alias("c"))
    )
    # ONE execution of the reference-corpus aggregation: persist it,
    # run the grand-total and the bounded top-k collect against the
    # cached result, then release. The model is built LOCALLY from the
    # ≤ vocab_size collected rows — evaluating it later (every scoring
    # broadcast) never re-runs the reference scan.
    counts = counts.persist()
    try:
        n_total = counts.agg(F.sum("c")).collect()[0][0] or 0
        vocab = counts.orderBy(F.desc("c"), "term").limit(
            vocab_size
        ).collect()
    finally:
        counts.unpersist()
    in_v, v = sum(r["c"] for r in vocab), len(vocab)
    denom = n_total + alpha * (v + 1)
    oov_logp = math.log((n_total - in_v + alpha) / denom)
    spark = ref_docs.sparkSession
    model = spark.createDataFrame(
        [(r["term"], math.log((r["c"] + alpha) / denom)) for r in vocab],
        f"term string, {OOV_LOGP_COL} double",
    )
    return model, oov_logp


def perplexity_score(
    docs: DataFrame,
    model: DataFrame,
    oov_logp: float,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """→ ``(doc_id, n_tokens, avg_neg_logp, perplexity)`` per document
    under the trained model; empty documents get null perplexity
    (nothing to score) rather than a fake best-possible 1.0."""
    # F.split of a trimmed empty string yields [''] — filter the empty
    # token so blank documents score as "no tokens" (null perplexity),
    # not as one OOV token
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode_outer(
            F.filter(tokens(text_col), lambda t: t != "")
        ).alias("term"),
    )
    scored = toks.join(F.broadcast(model), "term", "left").select(
        "doc_id",
        F.when(
            F.col("term").isNotNull(),
            F.coalesce(F.col(OOV_LOGP_COL), F.lit(oov_logp)),
        ).alias("lp"),
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count("lp").cast("long").alias("n_tokens"),
            (-F.avg("lp")).alias("avg_neg_logp"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "avg_neg_logp",
            F.exp("avg_neg_logp").alias("perplexity"),
        )
    )


def perplexity_filter(
    docs: DataFrame,
    model: DataFrame,
    oov_logp: float,
    max_perplexity: float,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep documents whose perplexity under the reference model is at
    most ``max_perplexity`` (empty docs drop: they have no evidence of
    being in-domain). A semi-join on the scored ids, so the kept rows
    carry every original column."""
    keep = (
        perplexity_score(docs, model, oov_logp, text_col, id_col)
        .where(F.col("perplexity") <= max_perplexity)
        .select(F.col("doc_id").alias(id_col))
    )
    return docs.join(keep, id_col, "left_semi")
