"""Model-based quality scoring as a driver-catalog entry — the
weakly-supervised Naive-Bayes log-odds classifier trained AND scored
in one SQL-reproducible plan (functions/classifier; the iterative
logistic-regression trainer is library surface with its own pytest —
GD epochs are not expressible as one oracle query).

Why this is oracle-able end to end: the trainer is pure aggregation
(per-term class counts + one totals row), the weights quantize to
1e-6 fixed-point BIGINTs, and each document's score is then an EXACT
integer sum — order-independent, hash-identical across engines. The
only floats are the per-term ln() (cross-engine agreement already
established by the idf/BM25 oracles) and the final unscaling
division.

Scale shape: train = one corpus tokenize scan + a distinct-term
shuffle (map-side combined) + a broadcast 1-row totals join; score =
a second corpus scan joined to the vocabulary-sized weight frame on
term. A production run bounds the model (top-V vocabulary like
functions/lm.py, or hashed features via functions/classifier) and
broadcasts it; the unbounded-vocab form here is the oracle-exact
twin, and its join shuffles candidates by term — still never
all-pairs, never driver-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_data_lake_spark.functions.classifier import (
    WEIGHT_SCALE,
    nb_log_odds_weights,
    nb_prior,
    nb_score_tokens,
    sql_weak_quality_label,
    weak_quality_label,
)
from etl_data_lake_spark.functions.text import tokens
from etl_data_lake_spark.queries.registry import register
from etl_data_lake_spark.sources.catalog import load_table

_TOK = "regexp_split_to_array(trim(text), '\\s+')"


@register(
    "quality_classifier_scores",
    oracle=f"""
        WITH lab AS (
            SELECT doc_id, {_TOK} AS toks,
                   {sql_weak_quality_label(_TOK)} AS y
            FROM documents
        ),
        tok AS (
            SELECT doc_id, y, unnest(toks) AS term FROM lab
        ),
        counts AS (
            SELECT term,
                   SUM(y) AS c_pos,
                   SUM(1 - y) AS c_neg
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
        prior AS (
            SELECT CAST(ROUND(ln((SUM(y) + 1.0)
                                 / (COUNT(*) - SUM(y) + 1.0))
                              * {WEIGHT_SCALE}) AS BIGINT) AS b_q
            FROM lab
        ),
        score AS (
            SELECT tok.doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_terms,
                   CAST(SUM(w.w_q) AS BIGINT) AS s_q,
                   MAX(tok.y) AS yy
            FROM tok JOIN w USING (term)
            GROUP BY tok.doc_id
        )
        SELECT doc_id,
               n_terms,
               CAST(yy AS BIGINT) AS weak_label,
               CAST(s_q + b_q AS DOUBLE) / {WEIGHT_SCALE}.0 AS log_odds,
               CAST(CASE WHEN s_q + b_q > 0 THEN 1 ELSE 0 END AS BIGINT)
                   AS predicted_quality
        FROM score, prior
    """,
    tags=("text", "quality", "model", "classifier"),
)
def quality_classifier_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train-on-weak-labels, score-everything: per-document log-odds
    and the model's keep/drop verdict under a Naive-Bayes classifier
    fit against the heuristic quality gate's labels."""
    return _scored_with_weak_labels(spark, sf_dir)


def _scored_with_weak_labels(
    spark: SparkSession, sf_dir: str, only_ids: DataFrame | None = None
) -> DataFrame:
    """The one bootstrap composition both the catalog entry and the
    eval twin grade: weak-label → train → score, assembled from the
    SHARED library arithmetic (functions/classifier.nb_prior /
    nb_score_tokens) so the oracle pins the exact expressions the
    production nb_quality_filter applies, not a lookalike copy.

    ``only_ids`` (round 15): a (doc_id) frame restricting which
    documents are SCORED — the model still trains on the full corpus
    (weights and prior are corpus-wide, exactly the oracle's), but the
    scoring join + per-doc aggregation only see the semi-joined
    subset. A caller that consumes scores for a bounded set (the
    curation pipeline ranks only cluster MEMBERS) turns the scoring
    pass from corpus-sized to member-sized; scores for the surviving
    docs are bit-identical to the unrestricted run (the per-doc sum
    never looks outside the doc)."""
    from pyspark import StorageLevel

    docs = load_table(spark, sf_dir, "documents")
    # the tokenized+labeled frame feeds THREE subtrees (the per-term
    # weight aggregation, the 1-row prior, and the scoring join);
    # persist it so the tokenize+weak-label pass runs once instead of
    # three times. MEMORY_AND_DISK spills rather than OOMs; cache
    # ownership is the caller's (bench clearCache between queries).
    lab = docs.select(
        "doc_id",
        tokens("text").alias("toks"),
    ).withColumn("y", weak_quality_label(F.col("toks"))).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    tok = lab.select(
        "doc_id", "y", F.explode("toks").alias("term")
    )
    # the weak label rides THROUGH the score aggregation (MAX(y) in
    # the same GROUP BY, exactly like the oracle) — no second scan of
    # the labeling lineage, and duplicate doc_ids merge instead of
    # fanning out through a join
    score_tok = tok.select(
        "doc_id", F.col("y").alias("weak_label"), "term"
    )
    if only_ids is not None:
        score_tok = score_tok.join(
            only_ids.select("doc_id"), "doc_id", "semi"
        )
    scored = nb_score_tokens(
        score_tok,
        nb_log_odds_weights(tok),
        nb_prior(lab),
        carry_label="weak_label",
    )
    return scored.select(
        "doc_id", "n_terms", "weak_label", "log_odds",
        "predicted_quality",
    )


# ---------------------------------------------------------------------------
# Model evaluation as a LIBRARY TWIN (test_parity): the NB classifier
# graded against its own weak labels — confusion at 0.5 plus
# histogram-AUC — with the ENTIRE train+score+eval composition
# reproduced in one DuckDB query. The AUC fold is exact cross-engine:
# per-bucket terms are integers times 0.5 (multiples of 0.5 sum
# order-independently in doubles), so even the rank-sum hashes equal.
# ---------------------------------------------------------------------------

_EVAL_BINS = 1_000


def quality_model_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_data_lake_spark.functions.classifier import classifier_eval

    frame = _scored_with_weak_labels(spark, sf_dir).select(
        F.col("weak_label").alias("y"),
        (
            F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("log_odds")))
        ).alias("prob"),
    )
    return classifier_eval(frame, auc_bins=_EVAL_BINS)


# the shared train+score prefix (through the per-doc probability
# frame `ev`) — the eval twin and the calibration twin grade the SAME
# composition, so they share it verbatim
_EV_CTES = f"""
    WITH lab AS (
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
        SELECT SUM(c_pos) AS n_pos, SUM(c_neg) AS n_neg, COUNT(*) AS v
        FROM counts
    ),
    w AS (
        SELECT term,
               CAST(ROUND((ln((c_pos + 1.0) / (n_pos + v))
                           - ln((c_neg + 1.0) / (n_neg + v)))
                          * {WEIGHT_SCALE}) AS BIGINT) AS w_q
        FROM counts, tot
    ),
    prior AS (
        SELECT CAST(ROUND(ln((SUM(y) + 1.0)
                             / (COUNT(*) - SUM(y) + 1.0))
                          * {WEIGHT_SCALE}) AS BIGINT) AS b_q
        FROM lab
    ),
    score AS (
        SELECT tok.doc_id, CAST(SUM(w.w_q) AS BIGINT) AS s_q,
               MAX(tok.y) AS y
        FROM tok JOIN w USING (term)
        GROUP BY tok.doc_id
    ),
    ev AS (
        SELECT y,
               CAST(s_q + b_q AS BIGINT) AS oq,
               1.0 / (1.0 + exp(-(CAST(s_q + b_q AS DOUBLE)
                                  / {WEIGHT_SCALE}.0))) AS prob
        FROM score, prior
    )"""


QUALITY_MODEL_EVAL_SQL = f"""{_EV_CTES},
    conf AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(y) AS BIGINT) AS n_pos,
               CAST(SUM(1 - y) AS BIGINT) AS n_neg,
               CAST(SUM(y * CASE WHEN prob >= 0.5 THEN 1 ELSE 0 END)
                    AS BIGINT) AS tp,
               CAST(SUM((1 - y) * CASE WHEN prob >= 0.5 THEN 1 ELSE 0 END)
                    AS BIGINT) AS fp,
               CAST(SUM((1 - y) * CASE WHEN prob < 0.5 THEN 1 ELSE 0 END)
                    AS BIGINT) AS tn,
               CAST(SUM(y * CASE WHEN prob < 0.5 THEN 1 ELSE 0 END)
                    AS BIGINT) AS fn
        FROM ev
    ),
    hist AS (
        SELECT LEAST(CAST(floor(prob * {_EVAL_BINS}) AS BIGINT),
                     {_EVAL_BINS - 1}) AS b,
               SUM(y) AS p, SUM(1 - y) AS q
        FROM ev GROUP BY 1
    ),
    cum AS (
        SELECT p, q,
               COALESCE(SUM(q) OVER (ORDER BY b
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS cq
        FROM hist
    ),
    u AS (
        SELECT COALESCE(SUM(p * (cq + 0.5 * q)), 0.0) AS U FROM cum
    )
    SELECT n, n_pos, n_neg, tp, fp, tn, fn,
           CASE WHEN n > 0
                THEN (tp + tn) * 1.0 / n END AS accuracy,
           CASE WHEN tp + fp > 0
                THEN tp * 1.0 / (tp + fp) END AS precision,
           CASE WHEN n_pos > 0 THEN tp * 1.0 / n_pos END AS recall,
           CASE WHEN 2 * tp + fp + fn > 0
                THEN 2.0 * tp / (2 * tp + fp + fn) END AS f1,
           CASE WHEN n_pos * n_neg > 0
                THEN U / CAST(n_pos * n_neg AS DOUBLE) END AS auc
    FROM conf, u
"""


# ---------------------------------------------------------------------------
# Calibration as a LIBRARY TWIN (round-8 verdict #3, alongside the
# eval twin): the reliability diagram of the NB classifier against its
# weak labels — per probability bin, count, mean predicted probability
# and empirical positive fraction — over the SAME train+score
# composition, reproduced end to end in one DuckDB query.
# ---------------------------------------------------------------------------

_CAL_BINS = 10


def quality_model_calibration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Reliability rows (bin, n, mean_log_odds, frac_pos) for the NB
    model. The bin confidence is reported in LOG-ODDS space, not mean
    probability, for the same reason the scores are fixed-point: the
    per-bin sum of 1e-6-integer log-odds is EXACT and
    order-independent, where a sum of probability doubles drifts in
    the last bits between engines (measured) — the library
    reliability diagram (functions/calibration.calibration_bins,
    mean predicted probability) is hand-pinned in
    tests/test_calibration.py instead."""
    scored = _scored_with_weak_labels(spark, sf_dir)
    prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("log_odds")))
    odds_q = F.round(F.col("log_odds") * F.lit(float(WEIGHT_SCALE))).cast(
        "long"
    )
    bucket = F.least(
        F.floor(prob * F.lit(_CAL_BINS)).cast("long"),
        F.lit(_CAL_BINS - 1),
    )
    return (
        scored.select(
            bucket.alias("bin"),
            odds_q.alias("_oq"),
            F.col("weak_label").alias("_y"),
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (
                F.sum("_oq").cast("double")
                / (F.count(F.lit(1)) * F.lit(float(WEIGHT_SCALE)))
            ).alias("mean_log_odds"),
            (
                F.sum("_y").cast("double") / F.count(F.lit(1))
            ).alias("frac_pos"),
        )
        .orderBy("bin")
    )


QUALITY_MODEL_CALIBRATION_SQL = f"""{_EV_CTES},
    binned AS (
        SELECT LEAST(CAST(floor(prob * {_CAL_BINS}) AS BIGINT),
                     {_CAL_BINS - 1}) AS bin,
               oq, y
        FROM ev
    )
    SELECT bin,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(oq) AS DOUBLE)
               / (COUNT(*) * {WEIGHT_SCALE}.0) AS mean_log_odds,
           CAST(SUM(y) AS DOUBLE) / COUNT(*) AS frac_pos
    FROM binned
    GROUP BY bin
    ORDER BY bin
"""
