"""Model-based quality filtering — train a text classifier IN SPARK
and score the corpus in-plan. The curation stage the GPT-3 / CCNet /
LLaMA pipelines run between heuristic filtering and dedup: fit a
lightweight discriminative model against a trusted reference (or
against weak labels distilled from the heuristics), then keep the
high-scoring tail of the 100 TB crawl. (The reference repo has no
model surface at all — etl.py:40-232 is ingestion; this is north-star
extension material. The heuristic half lives in
queries/text_queries.text_quality_scores; functions/lm.py covers the
generative/perplexity flavor; this module is the discriminative one.)

Two trainers, one scoring shape:

* :func:`train_nb_log_odds` — one-pass Naive-Bayes log-odds. Pure
  aggregation (no iteration, no driver math beyond none), so the
  ENTIRE train+score composition is SQL-reproducible — the catalog
  entry ``quality_classifier_scores`` oracles it end to end against
  DuckDB via fixed-point (1e-6-quantized) weights whose per-document
  sums are exact integers in both engines.
* :func:`train_logreg` — hashed-feature binary logistic regression by
  distributed full-batch gradient descent (the classic
  fasttext/CCNet-shaped filter). Feature hashing bounds the model at
  ``n_buckets`` weights regardless of corpus vocabulary, so the
  per-epoch driver traffic is O(touched buckets), never O(vocab).

Scale shape (what each epoch of :func:`train_logreg` costs at 100 TB):

* the (doc, bucket, x) feature frame is built ONCE (tokenize →
  hash → count; shuffle keyed on (doc, bucket)) and persisted;
* margins: broadcast the ≤ n_buckets weight rows into the feature
  frame, one doc-keyed aggregation (map-side partials);
* gradients: join the per-doc errors back (doc-keyed, co-partitioned
  with the margin shuffle), one bucket-keyed aggregation whose
  shuffle carries ≤ n_buckets rows;
* the driver collects ≤ n_buckets gradient rows and updates the
  weight vector locally — no parameter server needed at this model
  size, which is exactly why the hashed-linear family is the
  production choice for corpus filtering.

Everything is built-in expressions (xxhash64, sum, sigmoid via exp);
no Python UDF anywhere — the Python in train_logreg is the bounded
per-epoch weight update on the driver.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_data_lake_spark.functions.text import (
    STOPWORDS,
    poly_hash,
    sql_poly_hash,
    sql_stopword_count,
    stopword_count,
    tokens,
)

# fixed-point scale for SQL-reproducible scoring: weights quantized to
# 1e-6 make per-document score sums exact integers (order-independent,
# hash-identical across engines); the only float steps left are the
# per-term ln() — whose cross-engine agreement the existing idf/BM25
# oracles already established — and one final division by the scale
WEIGHT_SCALE = 1_000_000


def weak_quality_label(toks: Column) -> Column:
    """The 0/1 weak label distilled from the heuristic quality gate
    (same rule as text_quality_scores.quality_pass): ≥10 tokens,
    stopword ratio in [0.01, 0.6], distinct ratio > 0.2. Training a
    model on heuristic labels and scoring with the MODEL is the
    standard bootstrap when no hand-labeled reference exists."""
    n = F.size(toks)
    stop_ratio = stopword_count(toks) * F.lit(1.0) / n
    distinct_ratio = F.size(F.array_distinct(toks)) * F.lit(1.0) / n
    return (
        F.when(
            (n >= 10)
            & stop_ratio.between(0.01, 0.6)
            & (distinct_ratio > 0.2),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .cast("long")
    )


def sql_weak_quality_label(toks_expr: str) -> str:
    """DuckDB twin of :func:`weak_quality_label`."""
    stop = sql_stopword_count(toks_expr, STOPWORDS)
    return (
        f"CASE WHEN len({toks_expr}) >= 10"
        f" AND {stop} * 1.0 / len({toks_expr}) BETWEEN 0.01 AND 0.6"
        f" AND len(list_distinct({toks_expr})) * 1.0 /"
        f" len({toks_expr}) > 0.2 THEN 1 ELSE 0 END"
    )


def nb_log_odds_weights(
    labeled_tokens: DataFrame,
    term_col: str = "term",
    label_col: str = "y",
) -> DataFrame:
    """Naive-Bayes log-odds per term from an exploded ``(term, y)``
    frame: ``w(t) = ln p(t|pos) − ln p(t|neg)`` with add-one smoothing
    over the shared vocabulary, quantized to ``WEIGHT_SCALE``
    fixed-point (``w_q`` BIGINT). One term-keyed aggregation (map-side
    combined — the shuffle carries distinct terms) plus a broadcast
    1-row totals join; no iteration, no collect."""
    y = F.col(label_col)
    counts = labeled_tokens.groupBy(F.col(term_col).alias("term")).agg(
        F.sum(y).alias("c_pos"),
        F.sum(F.lit(1) - y).alias("c_neg"),
    )
    totals = counts.agg(
        F.sum("c_pos").alias("n_pos"),
        F.sum("c_neg").alias("n_neg"),
        F.count(F.lit(1)).alias("v"),
    )
    return counts.crossJoin(F.broadcast(totals)).select(
        "term",
        F.round(
            (
                F.log(
                    (F.col("c_pos") + F.lit(1.0))
                    / (F.col("n_pos") + F.col("v"))
                )
                - F.log(
                    (F.col("c_neg") + F.lit(1.0))
                    / (F.col("n_neg") + F.col("v"))
                )
            )
            * F.lit(float(WEIGHT_SCALE))
        )
        .cast("long")
        .alias("w_q"),
    )


# ---------------------------------------------------------------------------
# Hashed-feature logistic regression
# ---------------------------------------------------------------------------


def hashed_features(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1 << 18,
    seed: int = 42,
    portable: bool = False,
) -> DataFrame:
    """→ ``(doc_id, bucket, x)``: the sparse hashed bag-of-tokens
    representation (x = token count in the bucket, double). With
    ``portable=True`` the bucket comes from the repo's polynomial
    rolling hash (DuckDB-reproducible — the frozen-weights SQL parity
    test uses it); the default xxhash64 stays for production (JVM
    codegen, better-mixed bits). Hash collisions are the method's
    documented trade-off: at n_buckets ≫ vocab they are rare, and a
    collision only merges two features, never corrupts the fit."""
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    tok = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.filter(tokens(text_col), lambda t: t != "")
        ).alias("term"),
    )
    if portable:
        salted = F.concat_ws(":", F.lit(str(seed)), F.col("term"))
        bucket = F.pmod(poly_hash(salted), F.lit(n_buckets))
    else:
        bucket = F.pmod(
            F.xxhash64(F.lit(seed), F.col("term")), F.lit(n_buckets)
        )
    return (
        tok.select("doc_id", bucket.alias("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(F.count(F.lit(1)).cast("double").alias("x"))
    )


def sql_hashed_bucket(term_expr: str, n_buckets: int, seed: int) -> str:
    """DuckDB twin of the ``portable=True`` bucket in
    :func:`hashed_features`."""
    salted = f"concat_ws(':', '{seed}', {term_expr})"
    return f"(({sql_poly_hash(salted)}) % {n_buckets})"


@dataclass
class LogRegModel:
    """Trained hashed-feature logistic regression: sparse weights by
    bucket, intercept, the per-epoch mean log-loss trace (the
    convergence audit a training job logs), and the FEATURE-SPACE
    parameters (``seed``, ``portable``) — weights are meaningless
    against features hashed differently, so the model carries its
    hashing contract and :func:`quality_filter` rebuilds features
    from it instead of trusting defaults."""

    weights: dict[int, float]
    bias: float
    n_buckets: int
    losses: list[float]
    seed: int = 42
    portable: bool = False

    def weights_df(self, spark) -> DataFrame:
        rows = sorted(self.weights.items())
        if not rows:
            return spark.createDataFrame([], "bucket long, w double")
        return spark.createDataFrame(rows, "bucket long, w double")


def train_logreg(
    features: DataFrame,
    labels: DataFrame,
    n_buckets: int,
    epochs: int = 30,
    lr: float = 1.0,
    l2: float = 0.0,
    seed: int = 42,
    portable: bool = False,
) -> LogRegModel:
    """Distributed full-batch gradient descent on the logistic loss.

    ``features`` is :func:`hashed_features` output; ``labels`` is
    ``(doc_id, y)`` with y ∈ {0, 1}. Each epoch runs two aggregations
    over the persisted feature⋈label frame (per-doc margins, then
    per-bucket gradients) and collects ≤ ``n_buckets`` gradient rows —
    see the module docstring for the 100 TB cost accounting. Raw token
    counts are log-scaled (1 + ln x) feature values, the standard
    damping so a 100-repetition spam token doesn't dominate the dot
    product."""
    if epochs < 1:
        raise ValueError(f"epochs must be >= 1, got {epochs}")
    if lr <= 0:
        raise ValueError(f"lr must be > 0, got {lr}")
    if l2 < 0:
        raise ValueError(f"l2 must be >= 0, got {l2}")
    spark = features.sparkSession
    data = (
        features.withColumn("x", F.lit(1.0) + F.log("x"))
        .join(labels.select("doc_id", F.col("y").cast("double")), "doc_id")
        .persist()
    )
    try:
        n_docs = data.select("doc_id").distinct().count()
        if n_docs == 0:
            raise ValueError("no labeled documents to train on")
        w: dict[int, float] = {}
        bias = 0.0
        losses: list[float] = []
        for _ in range(epochs):
            w_rows = sorted(w.items())
            w_df = (
                spark.createDataFrame(w_rows, "bucket long, w double")
                if w_rows
                else spark.createDataFrame([], "bucket long, w double")
            )
            margins = (
                data.join(F.broadcast(w_df), "bucket", "left")
                .groupBy("doc_id")
                .agg(
                    F.first("y").alias("y"),
                    F.sum(
                        F.col("x") * F.coalesce(F.col("w"), F.lit(0.0))
                    ).alias("m"),
                )
                .select(
                    "doc_id",
                    "y",
                    (
                        F.lit(1.0)
                        / (F.lit(1.0) + F.exp(-(F.col("m") + F.lit(bias))))
                    ).alias("p"),
                )
            )
            err = margins.select(
                "doc_id",
                (F.col("p") - F.col("y")).alias("e"),
                # clamped log-loss: p is sigmoid output, never exactly
                # 0/1 at double precision until |margin| > ~36
                (
                    -(
                        F.col("y") * F.log(F.greatest(F.col("p"), F.lit(1e-12)))
                        + (F.lit(1.0) - F.col("y"))
                        * F.log(
                            F.greatest(F.lit(1.0) - F.col("p"), F.lit(1e-12))
                        )
                    )
                ).alias("ll"),
            ).persist()
            try:
                head = err.agg(
                    F.avg("ll").alias("loss"), F.avg("e").alias("ge")
                ).collect()[0]
                grad_rows = (
                    data.join(err.select("doc_id", "e"), "doc_id")
                    .groupBy("bucket")
                    .agg((F.sum(F.col("x") * F.col("e")) / n_docs).alias("g"))
                    .collect()
                )
            finally:
                err.unpersist()
            losses.append(head["loss"])
            for r in grad_rows:
                b = r["bucket"]
                w[b] = w.get(b, 0.0) * (1.0 - lr * l2) - lr * r["g"]
            bias -= lr * head["ge"]
    finally:
        data.unpersist()
    return LogRegModel(
        weights=w, bias=bias, n_buckets=n_buckets, losses=losses,
        seed=seed, portable=portable,
    )


def score_logreg(
    features: DataFrame, model: LogRegModel
) -> DataFrame:
    """→ ``(doc_id, margin, prob)`` under a trained model: broadcast
    the ≤ n_buckets weight rows into the feature frame, one doc-keyed
    aggregation — the 100 TB corpus is one scan + one shuffle of
    per-doc partials."""
    spark = features.sparkSession
    w_df = model.weights_df(spark)
    scored = (
        features.withColumn("x", F.lit(1.0) + F.log("x"))
        .join(F.broadcast(w_df), "bucket", "left")
        .groupBy("doc_id")
        .agg(
            (
                F.sum(F.col("x") * F.coalesce(F.col("w"), F.lit(0.0)))
                + F.lit(model.bias)
            ).alias("margin")
        )
    )
    return scored.select(
        "doc_id",
        "margin",
        (F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("margin")))).alias("prob"),
    )


def nb_prior(lab: DataFrame, label_col: str = "y"):
    """1-row ``b_q`` frame: the fixed-point class prior — shared by
    the library scorer and the catalog oracle entry so the two can
    never drift."""
    y = F.col(label_col)
    return lab.agg(
        F.round(
            F.log(
                (F.sum(y) + F.lit(1.0))
                / (F.count(F.lit(1)) - F.sum(y) + F.lit(1.0))
            )
            * F.lit(float(WEIGHT_SCALE))
        )
        .cast("long")
        .alias("b_q")
    )


def nb_score_tokens(
    tok: DataFrame,
    w: DataFrame,
    prior: DataFrame,
    carry_label: str | None = None,
):
    """Score an exploded ``(doc_id, term)`` frame against a trained
    weight table: → ``(doc_id, n_terms, log_odds, predicted_quality)``.
    The per-doc sum is an exact integer (fixed-point weights), so the
    verdict is bit-stable under any partitioning/layout. Terms outside
    the training vocabulary carry no evidence and drop out of the
    join; a document with NO in-vocabulary term emits no row (no
    evidence either way — callers treat absence as their policy
    dictates). ``carry_label`` names a per-doc column riding on
    ``tok`` to surface as ``MAX(label)`` in the SAME aggregation —
    the weak-label passthrough the catalog entry needs without a
    second scan of the labeling lineage (and with GROUP-BY merge
    semantics under duplicate doc_ids, matching its oracle)."""
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n_terms"),
        F.sum("w_q").alias("s_q"),
    ]
    extra = []
    if carry_label is not None:
        aggs.append(
            F.max(F.col(carry_label)).cast("long").alias(carry_label)
        )
        extra = [carry_label]
    return (
        tok.join(w, "term")
        .groupBy("doc_id")
        .agg(*aggs)
        .crossJoin(F.broadcast(prior))
        .select(
            "doc_id",
            "n_terms",
            *extra,
            (
                (F.col("s_q") + F.col("b_q")).cast("double")
                / F.lit(float(WEIGHT_SCALE))
            ).alias("log_odds"),
            F.when(F.col("s_q") + F.col("b_q") > 0, F.lit(1))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("predicted_quality"),
        )
    )


def nb_quality_scores(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    labels: DataFrame | None = None,
) -> DataFrame:
    """→ ``(doc_id, n_terms, log_odds, predicted_quality)`` for EVERY
    document (with at least one in-vocabulary term) under a
    Naive-Bayes log-odds model trained on ``labels`` (``(doc_id,
    y)``; defaults to the weak heuristic labels of the SAME corpus —
    the bootstrap the catalog entry quality_classifier_scores
    oracles). Training restricts to the labeled subset; SCORING does
    not — the standard bootstrap trains on 1k hand-labeled docs and
    scores the whole corpus. Scores are integer sums of fixed-point
    weights, so the verdict is bit-stable under any partitioning/
    layout — the property the end-to-end pipeline's determinism test
    leans on (a float-sum GD model can flip a boundary doc between
    runs; this one cannot)."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"), tokens(text_col).alias("toks")
    )
    if labels is None:
        lab = toks.withColumn("y", weak_quality_label(F.col("toks")))
    else:
        lab = toks.join(
            labels.select("doc_id", F.col("y").cast("long")), "doc_id"
        )
    train_tok = lab.select("doc_id", "y", F.explode("toks").alias("term"))
    w = nb_log_odds_weights(train_tok)
    prior = nb_prior(lab)
    score_tok = toks.select("doc_id", F.explode("toks").alias("term"))
    return nb_score_tokens(score_tok, w, prior)


def nb_quality_filter(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    labels: DataFrame | None = None,
) -> DataFrame:
    """Keep documents the Naive-Bayes model marks quality —
    the composable, layout-deterministic curation stage (semi-join
    keeps every original column, like lm.perplexity_filter)."""
    keep = (
        nb_quality_scores(docs, text_col, id_col, labels)
        .where(F.col("predicted_quality") == 1)
        .select(F.col("doc_id").alias(id_col))
    )
    return docs.join(keep, id_col, "left_semi")


def classifier_eval(
    scored: DataFrame,
    label_col: str = "y",
    score_col: str = "prob",
    threshold: float = 0.5,
    auc_bins: int = 100_000,
) -> DataFrame:
    """One-row evaluation of a binary scorer: confusion counts at
    ``threshold`` (tp/fp/tn/fn + accuracy/precision/recall/f1) and
    AUC — everything a filter-threshold sweep needs before committing
    a cut to a 100 TB corpus.

    AUC is the Mann-Whitney statistic computed over a SCORE HISTOGRAM:
    scores quantize to ``auc_bins`` buckets, one aggregation collects
    per-bucket class counts, and the rank-sum folds over the ≤
    ``auc_bins`` buckets with ties-within-bucket counted half (the
    standard tie correction). Exact for scores already quantized at
    bucket granularity; otherwise the error is bounded by the bucket
    width (1e-5 at the default) — how AUC is computed at data scale,
    since an exact global rank is a single-partition sort. The data
    scans ONCE: one (bucket, prediction)-keyed aggregation feeds both
    the confusion counts and the AUC fold, so the input lineage —
    which in quality_model_eval is an entire train+score composition —
    never re-executes. The bucket window is partitionless BY DESIGN:
    it runs over at most 2·``auc_bins`` aggregate rows, never data
    rows (same discipline as the mixture solver). Rows with a null OR
    NaN label/score are excluded (no evidence, not wrong evidence —
    and NaN orders ABOVE every double in Spark, so an unfiltered NaN
    would silently predict positive); zero-pos or zero-neg inputs
    report null AUC/precision/recall rather than dividing by zero.
    Undefined ratios (e.g. precision with no positive predictions)
    are null, never NaN."""
    if not 0.0 <= threshold <= 1.0:
        raise ValueError(f"threshold must be in [0, 1], got {threshold}")
    if auc_bins < 2:
        raise ValueError(f"auc_bins must be >= 2, got {auc_bins}")
    y = F.col(label_col).cast("double")
    s = F.col(score_col).cast("double")
    rows = scored.where(
        y.isNotNull() & s.isNotNull() & ~F.isnan(y) & ~F.isnan(s)
    ).select(y.cast("long").alias("_y"), s.alias("_s"))
    bucket = F.least(
        F.floor(F.col("_s") * F.lit(auc_bins)).cast("long"),
        F.lit(auc_bins - 1),
    )
    pred = (F.col("_s") >= F.lit(threshold)).cast("long")
    # the ONE data-sized aggregation; everything below runs on its
    # ≤ 2·auc_bins rows
    base = rows.groupBy(
        bucket.alias("_b"), pred.alias("_pred")
    ).agg(
        F.sum("_y").alias("_p"),
        F.sum(F.lit(1) - F.col("_y")).alias("_q"),
    )
    # base is consumed by EXACTLY ONE downstream aggregate (no
    # branching — a conf/hist split would duplicate the data-sized
    # lineage in the logical plan and lean on exchange reuse to
    # deduplicate it): two windows over the ≤ 2·auc_bins bucket rows
    # attach each row's strictly-lower-bucket negative mass (RANGE
    # frame, so the two pred-rows of one bucket see the same value)
    # and its own bucket's negative mass, then one aggregate folds
    # confusion counts and the rank-sum together.
    from pyspark.sql import Window

    w_below = (
        Window.orderBy("_b")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    w_same = Window.partitionBy("_b")
    staged = base.select(
        "_p", "_q", "_pred",
        F.coalesce(F.sum("_q").over(w_below), F.lit(0)).alias("_cq"),
        F.sum("_q").over(w_same).alias("_qb"),
    )
    conf = staged.agg(
        F.coalesce(F.sum(F.col("_p") + F.col("_q")), F.lit(0)).alias("n"),
        F.coalesce(F.sum("_p"), F.lit(0)).alias("n_pos"),
        F.coalesce(F.sum("_q"), F.lit(0)).alias("n_neg"),
        F.coalesce(F.sum(F.col("_p") * F.col("_pred")), F.lit(0)).alias("tp"),
        F.coalesce(F.sum(F.col("_q") * F.col("_pred")), F.lit(0)).alias("fp"),
        F.coalesce(
            F.sum(F.col("_q") * (F.lit(1) - F.col("_pred"))), F.lit(0)
        ).alias("tn"),
        F.coalesce(
            F.sum(F.col("_p") * (F.lit(1) - F.col("_pred"))), F.lit(0)
        ).alias("fn"),
        F.coalesce(
            F.sum(
                F.col("_p")
                * (F.col("_cq") + F.lit(0.5) * F.col("_qb"))
            ),
            F.lit(0.0),
        ).alias("_U"),
    )
    ratio = lambda num, den: F.when(den > 0, num / den)  # noqa: E731
    return (
        conf
        .select(
            "n", "n_pos", "n_neg", "tp", "fp", "tn", "fn",
            ratio(F.col("tp") + F.col("tn"), F.col("n")).alias("accuracy"),
            ratio(F.col("tp"), F.col("tp") + F.col("fp")).alias("precision"),
            ratio(F.col("tp"), F.col("n_pos")).alias("recall"),
            F.when(
                F.lit(2) * F.col("tp") + F.col("fp") + F.col("fn") > 0,
                F.lit(2.0) * F.col("tp")
                / (F.lit(2) * F.col("tp") + F.col("fp") + F.col("fn")),
            ).alias("f1"),
            ratio(
                F.col("_U"), (F.col("n_pos") * F.col("n_neg")).cast("double")
            ).alias("auc"),
        )
    )


def quality_filter(
    docs: DataFrame,
    model: LogRegModel,
    min_prob: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep documents the model scores at least ``min_prob`` — the
    composable curation stage (semi-join keeps every original
    column, like lm.perplexity_filter). Features rebuild from the
    MODEL's hashing contract (n_buckets, seed, portable) — scoring
    with a different feature space than training would apply learned
    weights to unrelated buckets."""
    feats = hashed_features(
        docs, text_col, id_col, model.n_buckets,
        seed=model.seed, portable=model.portable,
    )
    keep = (
        score_logreg(feats, model)
        .where(F.col("prob") >= min_prob)
        .select(F.col("doc_id").alias(id_col))
    )
    return docs.join(keep, id_col, "left_semi")
