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


# ---------------------------------------------------------------------------
# Interpolated bigram LM — one rung up the KenLM ladder. Jelinek-Mercer
# mixture P(w2|w1) = lam * P_ML(w2|w1) + (1-lam) * P_uni(w2): context
# raises in-domain fluency signal far above what unigrams see (word
# salad scores like prose under a unigram model), while the unigram
# floor keeps every token's probability positive, so perplexities stay
# finite and comparable. Tokens outside the unigram vocabulary map to
# one shared UNK outcome (context and target alike — the standard
# construction, so OOV contexts still condition).
# ---------------------------------------------------------------------------

_UNK = "\x00unk"


def _unk_pair_counts(
    ref_docs: DataFrame, uni_model: DataFrame, text_col: str
) -> DataFrame:
    """UNK-mapped adjacent-token pair counts ``(_w1, _w2, _c12)`` —
    the shared count table both bigram trainers (JM and KN) reduce.
    One shuffle by doc for the window pairing, one count aggregation
    whose shuffle carries DISTINCT pairs."""
    from pyspark.sql import Window

    # id in its OWN projection: a nondeterministic expression sharing a
    # select with a generator evaluates per exploded row (every token
    # got a fresh _doc — zero pairs; caught by the hand-computed test)
    base = ref_docs.withColumn("_doc", F.monotonically_increasing_id())
    toks = base.select(
        "_doc",
        F.posexplode(F.filter(tokens(text_col), lambda t: t != "")).alias(
            "_pos", "_term"
        ),
    )
    mapped = toks.join(
        F.broadcast(uni_model.select("term")),
        toks["_term"] == F.col("term"),
        "left",
    ).select(
        "_doc",
        "_pos",
        F.coalesce(F.col("term"), F.lit(_UNK)).alias("_w2"),
    )
    w = Window.partitionBy("_doc").orderBy("_pos")
    pairs = mapped.select(
        F.lag("_w2").over(w).alias("_w1"), "_w2"
    ).where(F.col("_w1").isNotNull())
    return pairs.groupBy("_w1", "_w2").agg(F.count("*").alias("_c12"))


def train_bigram_lm(
    ref_docs: DataFrame,
    text_col: str = "text",
    vocab_size: int = 50_000,
    alpha: float = 1.0,
    max_bigrams: int = 200_000,
):
    """→ ``(unigram_model, oov_logp, bigram_model)`` where
    ``bigram_model`` is ``(w1, w2, p_ml)`` for the ``max_bigrams`` most
    frequent UNK-mapped reference bigrams (count-desc, pair-asc
    tie-break — deterministic truncation; a dropped pair just falls
    back to the unigram floor, making the mixture conservatively
    deficient, never improper). The interpolation weight is the
    SCORER's parameter, not the model's — one trained model serves any
    ``lam`` sweep; see :func:`bigram_perplexity_score`.

    Scale: tokenize → explode → window-lag pairing (ONE shuffle by
    doc), two map-side-combined count aggregations whose shuffles
    carry DISTINCT pairs/contexts, a bounded top-k, and a local model
    build — the reference corpus is scanned once.
    """
    uni_model, oov_logp = train_unigram_lm(
        ref_docs, text_col, vocab_size, alpha
    )
    pair_counts = _unk_pair_counts(ref_docs, uni_model, text_col).persist()
    try:
        ctx_counts = pair_counts.groupBy("_w1").agg(
            F.sum("_c12").alias("_c1")
        )
        kept = (
            pair_counts.orderBy(F.desc("_c12"), "_w1", "_w2")
            .limit(max_bigrams)
            .join(F.broadcast(ctx_counts), "_w1")
            .select(
                F.col("_w1").alias("w1"),
                F.col("_w2").alias("w2"),
                (F.col("_c12") / F.col("_c1")).alias("p_ml"),
            )
        )
        spark = ref_docs.sparkSession
        bigram_model = spark.createDataFrame(
            kept.collect(), "w1 string, w2 string, p_ml double"
        )
    finally:
        pair_counts.unpersist()
    return uni_model, oov_logp, bigram_model


def bigram_perplexity_score(
    docs: DataFrame,
    uni_model: DataFrame,
    oov_logp: float,
    bigram_model: DataFrame,
    lam: float = 0.7,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """→ ``(doc_id, n_tokens, avg_neg_logp, perplexity)`` under the
    interpolated bigram model: a document's first token scores by the
    unigram model, every later token by
    ``log(lam * P_ML(w2|w1) + (1-lam) * P_uni(w2))`` with unseen
    bigrams contributing only the unigram floor. ``lam=0`` reproduces
    :func:`perplexity_score` up to the ``log(exp(x))`` float round-trip
    (test-pinned at 1e-12). Empty documents → null perplexity, like
    the unigram scorer.

    Scale: one candidate-corpus scan; the window-lag pairing shuffles
    by doc once and the per-doc aggregation reuses that partitioning;
    both models join broadcast (bounded by construction)."""
    if not 0 <= lam < 1:
        raise ValueError(f"lam must be in [0, 1), got {lam}")
    from pyspark.sql import Window

    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode_outer(
            F.filter(tokens(text_col), lambda t: t != "")
        ).alias("_pos", "_term"),
    )
    uni = F.broadcast(
        uni_model.select(
            F.col("term").alias("_t"), F.col(OOV_LOGP_COL).alias("_lp")
        )
    )
    mapped = toks.join(uni, toks["_term"] == F.col("_t"), "left").select(
        "doc_id",
        "_pos",
        F.when(F.col("_term").isNull(), F.lit(None))
        .otherwise(F.coalesce(F.col("_t"), F.lit(_UNK)))
        .alias("_w2"),
        F.when(
            F.col("_term").isNotNull(),
            F.coalesce(F.col("_lp"), F.lit(oov_logp)),
        ).alias("_uni_lp"),
    )
    w = Window.partitionBy("doc_id").orderBy("_pos")
    seq = mapped.withColumn("_w1", F.lag("_w2").over(w))
    bi = F.broadcast(
        bigram_model.select(
            F.col("w1").alias("_bw1"),
            F.col("w2").alias("_bw2"),
            "p_ml",
        )
    )
    joined = seq.join(
        bi,
        (seq["_w1"] == F.col("_bw1")) & (seq["_w2"] == F.col("_bw2")),
        "left",
    ).select(
        "doc_id",
        F.when(F.col("_w2").isNull(), F.lit(None))
        .when(F.col("_w1").isNull(), F.col("_uni_lp"))
        .otherwise(
            F.log(
                F.lit(lam) * F.coalesce(F.col("p_ml"), F.lit(0.0))
                + F.lit(1.0 - lam) * F.exp(F.col("_uni_lp"))
            )
        )
        .alias("lp"),
    )
    return (
        joined.groupBy("doc_id")
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


# ---------------------------------------------------------------------------
# Kneser–Ney bigram LM (round 10 s2) — the accepted best n-gram
# smoothing (Kneser & Ney 1995; Chen & Goodman 1999's evaluation) and
# what KenLM itself implements. Two ideas beyond Jelinek-Mercer:
#
# * ABSOLUTE DISCOUNTING: subtract a fixed D from every observed
#   bigram count instead of scaling by lam — high-count bigrams keep
#   almost all their mass, singletons give most of theirs back;
# * CONTINUATION PROBABILITY: backed-off mass goes to words by HOW
#   MANY DISTINCT CONTEXTS they follow, not raw frequency — "Francisco"
#   is frequent but follows only "San", so it gets almost no backoff
#   mass (the classic motivating example).
#
#   P_KN(w|v) = max(c(vw)−D, 0)/c(v) + λ(v)·P_cont(w)
#   λ(v)      = D·N1+(v·)/c(v)          (exactly the discounted mass)
#   P_cont(w) = (N1+(·w)+α) / (N1+(··)+α·(V+1))   (add-α so unseen
#               continuations stay positive — perplexities finite)
#
# D is estimated from count-of-counts (n1/(n1+2n2), the standard
# leave-one-out estimate). With no pair truncation Σ_w P_KN(w|v) = 1
# exactly for every seen context — the discount algebra is proper,
# and the test pins that sum. All counts come from the SAME
# distributed pair-count table the JM trainer reduces; everything
# after it is bounded-size local arithmetic.
# ---------------------------------------------------------------------------


from dataclasses import dataclass


@dataclass(frozen=True)
class KnBigramModel:
    """The bounded pieces of the KN formula: ``pair_model
    (w1, w2, p_disc)``, ``ctx_model (w1, c1, backoff)`` with λ per
    seen context, ``cont_model (w2, p_cont)`` the add-α continuation
    distribution, ``cont_floor`` = α/denominator (the probability of
    a word never seen as a continuation — the same floor the
    denominator already reserves, so the distribution stays proper),
    ``discount`` the estimated D. ``uni_model``/``oov_logp`` score
    FIRST tokens, exactly like the JM scorer."""

    uni_model: DataFrame
    oov_logp: float
    pair_model: DataFrame
    ctx_model: DataFrame
    cont_model: DataFrame
    cont_floor: float
    discount: float


def train_kn_bigram_lm(
    ref_docs: DataFrame,
    text_col: str = "text",
    vocab_size: int = 50_000,
    alpha: float = 1.0,
    max_bigrams: int = 200_000,
) -> KnBigramModel:
    """→ :class:`KnBigramModel`; ``pair_model`` keeps the top
    ``max_bigrams`` pairs (count-desc, pair-asc tie-break —
    deterministic truncation; dropped pairs fall back to the
    continuation term — conservatively deficient, never improper)."""
    uni_model, oov_logp = train_unigram_lm(
        ref_docs, text_col, vocab_size, alpha
    )
    pair_counts = _unk_pair_counts(ref_docs, uni_model, text_col).persist()
    try:
        # count-of-counts for the discount estimate — 2 scalars
        cc = pair_counts.agg(
            F.sum((F.col("_c12") == 1).cast("long")).alias("n1"),
            F.sum((F.col("_c12") == 2).cast("long")).alias("n2"),
            F.count("*").alias("n_pairs"),
            F.sum("_c12").alias("n_tokens"),
        ).collect()[0]
        n1, n2 = int(cc["n1"] or 0), int(cc["n2"] or 0)
        n_distinct_pairs = int(cc["n_pairs"] or 0)
        if n_distinct_pairs == 0:
            raise ValueError(
                "no bigrams in the reference corpus — KN needs at "
                "least one adjacent token pair"
            )
        discount = n1 / (n1 + 2.0 * n2) if (n1 + n2) > 0 else 0.5
        # clamp into (0, 1): D = 0 (possible when n1 = 0) zeroes every
        # λ and unseen continuations would score log(0) — see
        # _coc_discount's note (same failure, found in round 11)
        discount = min(max(discount, 1e-6), 1.0 - 1e-6)

        ctx = pair_counts.groupBy("_w1").agg(
            F.sum("_c12").alias("c1"),
            F.count("*").alias("n_follow"),  # N1+(v·)
        )
        cont = pair_counts.groupBy("_w2").agg(
            F.count("*").alias("n_precede")  # N1+(·w)
        )
        vocab_v = uni_model.count() + 1  # + UNK
        spark = ref_docs.sparkSession

        kept = (
            pair_counts.orderBy(F.desc("_c12"), "_w1", "_w2")
            .limit(max_bigrams)
            .join(F.broadcast(ctx.select("_w1", "c1")), "_w1")
            .select(
                F.col("_w1").alias("w1"),
                F.col("_w2").alias("w2"),
                (
                    F.greatest(
                        F.col("_c12") - F.lit(discount), F.lit(0.0)
                    )
                    / F.col("c1")
                ).alias("p_disc"),
            )
        )
        pair_model = spark.createDataFrame(
            kept.collect(), "w1 string, w2 string, p_disc double"
        )
        ctx_model = spark.createDataFrame(
            ctx.select(
                F.col("_w1").alias("w1"),
                F.col("c1").cast("long").alias("c1"),
                (F.lit(discount) * F.col("n_follow") / F.col("c1")).alias(
                    "backoff"
                ),
            ).collect(),
            "w1 string, c1 long, backoff double",
        )
        denom = n_distinct_pairs + alpha * (vocab_v + 0.0)
        cont_model = spark.createDataFrame(
            cont.select(
                F.col("_w2").alias("w2"),
                ((F.col("n_precede") + F.lit(alpha)) / F.lit(denom)).alias(
                    "p_cont"
                ),
            ).collect(),
            "w2 string, p_cont double",
        )
        cont_floor = alpha / denom
    finally:
        pair_counts.unpersist()
    return KnBigramModel(
        uni_model=uni_model,
        oov_logp=oov_logp,
        pair_model=pair_model,
        ctx_model=ctx_model,
        cont_model=cont_model,
        cont_floor=cont_floor,
        discount=discount,
    )


def kn_bigram_perplexity_score(
    docs: DataFrame,
    model: KnBigramModel,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """→ ``(doc_id, n_tokens, avg_neg_logp, perplexity)`` under the
    Kneser–Ney bigram model: first tokens by the unigram model, later
    tokens by ``log(p_disc(vw) + λ(v)·p_cont(w))``; a context never
    seen in training (no c(v) row) backs off fully (λ = 1); a word
    never seen as a continuation takes ``cont_floor`` — the mass the
    trainer's denominator already reserves, so probabilities stay
    proper. One candidate scan; all four model joins broadcast (each
    bounded by construction); empty documents → null perplexity, like
    the other scorers."""
    from pyspark.sql import Window

    uni_model, oov_logp = model.uni_model, model.oov_logp
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode_outer(
            F.filter(tokens(text_col), lambda t: t != "")
        ).alias("_pos", "_term"),
    )
    uni = F.broadcast(
        uni_model.select(
            F.col("term").alias("_t"), F.col(OOV_LOGP_COL).alias("_lp")
        )
    )
    mapped = toks.join(uni, toks["_term"] == F.col("_t"), "left").select(
        "doc_id",
        "_pos",
        F.when(F.col("_term").isNull(), F.lit(None))
        .otherwise(F.coalesce(F.col("_t"), F.lit(_UNK)))
        .alias("_w2"),
        F.when(
            F.col("_term").isNotNull(),
            F.coalesce(F.col("_lp"), F.lit(oov_logp)),
        ).alias("_uni_lp"),
    )
    w = Window.partitionBy("doc_id").orderBy("_pos")
    seq = mapped.withColumn("_w1", F.lag("_w2").over(w))
    pair = F.broadcast(
        model.pair_model.select(
            F.col("w1").alias("_pw1"),
            F.col("w2").alias("_pw2"),
            "p_disc",
        )
    )
    ctx = F.broadcast(
        model.ctx_model.select(
            F.col("w1").alias("_cw1"), F.col("backoff").alias("_lam")
        )
    )
    cont = F.broadcast(
        model.cont_model.select(
            F.col("w2").alias("_kw2"), F.col("p_cont").alias("_pc")
        )
    )
    joined = (
        seq.join(
            pair,
            (seq["_w1"] == F.col("_pw1")) & (seq["_w2"] == F.col("_pw2")),
            "left",
        )
        .join(ctx, seq["_w1"] == F.col("_cw1"), "left")
        .join(cont, seq["_w2"] == F.col("_kw2"), "left")
        .select(
            "doc_id",
            F.when(F.col("_w2").isNull(), F.lit(None))
            .when(F.col("_w1").isNull(), F.col("_uni_lp"))
            .otherwise(
                F.log(
                    F.coalesce(F.col("p_disc"), F.lit(0.0))
                    # unseen context: λ = 1 (full backoff)
                    + F.coalesce(F.col("_lam"), F.lit(1.0))
                    * F.coalesce(F.col("_pc"), F.lit(model.cont_floor))
                )
            )
            .alias("lp"),
        )
    )
    return (
        joined.groupBy("doc_id")
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


# ---------------------------------------------------------------------------
# Kneser–Ney TRIGRAM LM (round 11) — interpolated modified-backoff KN
# at order 3, the shape real perplexity filters use (CCNet scores with
# a 5-gram KenLM; order 3 exercises every structural element — highest
# order, one continuation-count middle order, the unigram continuation
# floor — and each extra order repeats the middle-order pattern).
#
#   P(w3|w1w2) = max(c(w1w2w3)−D3,0)/c(w1w2) + λ3(w1w2)·P(w3|w2)
#   λ3(w1w2)   = D3·N1+(w1w2·)/c(w1w2)
#   P(w3|w2)   = max(N1+(·w2w3)−D2,0)/N1+(·w2·) + λ2(w2)·P_cont(w3)
#   λ2(w2)     = D2·Ntypes(w2)/N1+(·w2·)
#   P_cont(w3) = (N1+(·w3)+α)/(N1+(··)+α·(V+1))
#
# EVERY count derives from the ONE distributed trigram count table
# (c(w1w2) = Σ_w3 c, all N1+ are distinct-row counts over it) — so a
# document's first two tokens are a corpus-edge bigram that enters no
# trigram and no count, the convention the pure-Python reference test
# replays exactly. D3 comes from the trigram counts-of-counts, D2 from
# the continuation counts-of-counts (order-specific leave-one-out
# estimates, Chen & Goodman 1999). Untruncated,
# Σ_w3 P(w3|w1w2) = 1 exactly for every seen context (pinned);
# truncation drops mass only from the discounted numerators, so the
# model goes conservatively deficient, never improper.
# ---------------------------------------------------------------------------


def _unk_trigram_counts(
    ref_docs: DataFrame, uni_model: DataFrame, text_col: str
) -> DataFrame:
    """UNK-mapped adjacent-token triple counts ``(_w1,_w2,_w3,_c)`` —
    same shape discipline as :func:`_unk_pair_counts`: one shuffle by
    doc for the window lags, one count aggregation whose shuffle
    carries DISTINCT triples."""
    from pyspark.sql import Window

    base = ref_docs.withColumn("_doc", F.monotonically_increasing_id())
    toks = base.select(
        "_doc",
        F.posexplode(F.filter(tokens(text_col), lambda t: t != "")).alias(
            "_pos", "_term"
        ),
    )
    mapped = toks.join(
        F.broadcast(uni_model.select("term")),
        toks["_term"] == F.col("term"),
        "left",
    ).select(
        "_doc",
        "_pos",
        F.coalesce(F.col("term"), F.lit(_UNK)).alias("_w3"),
    )
    w = Window.partitionBy("_doc").orderBy("_pos")
    triples = mapped.select(
        F.lag("_w3", 2).over(w).alias("_w1"),
        F.lag("_w3", 1).over(w).alias("_w2"),
        "_w3",
    ).where(F.col("_w1").isNotNull())
    return triples.groupBy("_w1", "_w2", "_w3").agg(
        F.count("*").alias("_c")
    )


@dataclass(frozen=True)
class KnTrigramModel:
    """Driver-side pieces of the order-3 KN tower (tri/mid truncated
    by the trainer; the λ context tables bounded by the CALLER via
    ``max_contexts`` — see train_kn_trigram_lm). ``tri_model
    (w1, w2, w3, p_disc3)``; ``ctx2_model (w1, w2, backoff3)`` with λ3
    per seen trigram context; ``mid_model (w2, w3, p_disc2)`` the
    continuation-count middle order; ``ctx1_model (w2, backoff2)``
    with λ2 per seen middle context; ``cont_model (w3, p_cont)`` +
    ``cont_floor`` exactly as in :class:`KnBigramModel`.
    ``uni_model``/``oov_logp`` score a document's FIRST token (the
    tower has no BOS convention — by design, like the other scorers
    here)."""

    uni_model: DataFrame
    oov_logp: float
    tri_model: DataFrame
    ctx2_model: DataFrame
    mid_model: DataFrame
    ctx1_model: DataFrame
    cont_model: DataFrame
    cont_floor: float
    discount3: float
    discount2: float


# A discount of exactly 0 is fatal, not merely suboptimal: λ = D·N/c
# becomes 0 for every context, an unseen continuation under a seen
# context then scores p = 0 + 0·p_lower = 0, F.log(0) = null silently
# DROPS the token from the perplexity average, and save_arpa's
# log10(λ) crashes outright. n1 = 0 (no singleton n-grams — e.g. a
# reference corpus whose every document appears twice) produces
# exactly that, so the leave-one-out estimate clamps into (0, 1).
_D_MIN = 1e-6


def _coc_discount(counts: DataFrame, col: str) -> float:
    cc = counts.agg(
        F.sum((F.col(col) == 1).cast("long")).alias("n1"),
        F.sum((F.col(col) == 2).cast("long")).alias("n2"),
    ).collect()[0]
    n1, n2 = int(cc["n1"] or 0), int(cc["n2"] or 0)
    d = n1 / (n1 + 2.0 * n2) if (n1 + n2) > 0 else 0.5
    return min(max(d, _D_MIN), 1.0 - _D_MIN)


def train_kn_trigram_lm(
    ref_docs: DataFrame,
    text_col: str = "text",
    vocab_size: int = 50_000,
    alpha: float = 1.0,
    max_trigrams: int = 500_000,
    max_bigrams: int = 200_000,
    max_contexts: int = 2_000_000,
) -> KnTrigramModel:
    """→ :class:`KnTrigramModel`. ``tri_model`` keeps the top
    ``max_trigrams`` triples, ``mid_model`` the top ``max_bigrams``
    continuation pairs (count-desc, key-asc tie-breaks — deterministic
    truncation; a dropped entry falls through to the next order's
    term, conservatively deficient, never improper). The context (λ)
    tables are NEVER truncated — dropping a λ row would score a seen
    context with λ = 1 and hand it MORE mass than training assigned,
    an improperness bug rather than a truncation trade. Their size is
    therefore bounded by the CALLER, not the trainer: one row per
    distinct (UNK-mapped) bigram context of the reference corpus — a
    property of the reference snapshot and vocab, not of the corpus
    being scored. ``max_contexts`` is the loud guard: a reference
    whose context table exceeds it raises with the actual count
    instead of silently collecting a corpus-scale table to the driver
    and broadcasting it (shrink the reference or vocab_size, or raise
    the bound deliberately)."""
    uni_model, oov_logp = train_unigram_lm(
        ref_docs, text_col, vocab_size, alpha
    )
    tri_counts = _unk_trigram_counts(ref_docs, uni_model, text_col).persist()
    mid_counts = None
    try:
        if tri_counts.limit(1).count() == 0:
            raise ValueError(
                "no trigrams in the reference corpus — the KN trigram "
                "trainer needs at least one 3-token document"
            )
        d3 = _coc_discount(tri_counts, "_c")

        # trigram-context totals: c(w1w2) and N1+(w1w2·)
        ctx2 = tri_counts.groupBy("_w1", "_w2").agg(
            F.sum("_c").alias("c12"),
            F.count("*").alias("n_follow"),
        )
        n_ctx = ctx2.count()
        if n_ctx > max_contexts:
            raise ValueError(
                f"reference corpus has {n_ctx} distinct bigram contexts, "
                f"over max_contexts={max_contexts} — the λ tables cannot "
                "be truncated without improperness, so shrink the "
                "reference snapshot or vocab_size (or raise max_contexts "
                "deliberately)"
            )
        # continuation counts N1+(·w2w3): distinct w1 per (w2,w3)
        mid_counts = tri_counts.groupBy("_w2", "_w3").agg(
            F.count("*").alias("n_cont")
        ).persist()
        d2 = _coc_discount(mid_counts, "n_cont")
        # N1+(·w2·) and Ntypes(w2)
        ctx1 = mid_counts.groupBy("_w2").agg(
            F.sum("n_cont").alias("n_mid"),
            F.count("*").alias("n_types"),
        )
        # N1+(·w3) over (w2,w3) pairs; N1+(··) total
        cont = mid_counts.groupBy("_w3").agg(
            F.count("*").alias("n_precede")
        )
        n_cont_total = int(
            mid_counts.agg(F.count("*").alias("n")).collect()[0]["n"]
        )
        vocab_v = uni_model.count() + 1  # + UNK
        spark = ref_docs.sparkSession

        tri_kept = (
            tri_counts.orderBy(F.desc("_c"), "_w1", "_w2", "_w3")
            .limit(max_trigrams)
            .join(F.broadcast(ctx2.select("_w1", "_w2", "c12")), ["_w1", "_w2"])
            .select(
                F.col("_w1").alias("w1"),
                F.col("_w2").alias("w2"),
                F.col("_w3").alias("w3"),
                (
                    F.greatest(F.col("_c") - F.lit(d3), F.lit(0.0))
                    / F.col("c12")
                ).alias("p_disc3"),
            )
        )
        tri_model = spark.createDataFrame(
            tri_kept.collect(),
            "w1 string, w2 string, w3 string, p_disc3 double",
        )
        ctx2_model = spark.createDataFrame(
            ctx2.select(
                F.col("_w1").alias("w1"),
                F.col("_w2").alias("w2"),
                (F.lit(d3) * F.col("n_follow") / F.col("c12")).alias(
                    "backoff3"
                ),
            ).collect(),
            "w1 string, w2 string, backoff3 double",
        )
        mid_kept = (
            mid_counts.orderBy(F.desc("n_cont"), "_w2", "_w3")
            .limit(max_bigrams)
            .join(F.broadcast(ctx1.select("_w2", "n_mid")), "_w2")
            .select(
                F.col("_w2").alias("w2"),
                F.col("_w3").alias("w3"),
                (
                    F.greatest(F.col("n_cont") - F.lit(d2), F.lit(0.0))
                    / F.col("n_mid")
                ).alias("p_disc2"),
            )
        )
        mid_model = spark.createDataFrame(
            mid_kept.collect(), "w2 string, w3 string, p_disc2 double"
        )
        ctx1_model = spark.createDataFrame(
            ctx1.select(
                F.col("_w2").alias("w2"),
                (F.lit(d2) * F.col("n_types") / F.col("n_mid")).alias(
                    "backoff2"
                ),
            ).collect(),
            "w2 string, backoff2 double",
        )
        denom = n_cont_total + alpha * (vocab_v + 0.0)
        cont_model = spark.createDataFrame(
            cont.select(
                F.col("_w3").alias("w3"),
                ((F.col("n_precede") + F.lit(alpha)) / F.lit(denom)).alias(
                    "p_cont"
                ),
            ).collect(),
            "w3 string, p_cont double",
        )
        cont_floor = alpha / denom
    finally:
        if mid_counts is not None:
            mid_counts.unpersist()
        tri_counts.unpersist()
    return KnTrigramModel(
        uni_model=uni_model,
        oov_logp=oov_logp,
        tri_model=tri_model,
        ctx2_model=ctx2_model,
        mid_model=mid_model,
        ctx1_model=ctx1_model,
        cont_model=cont_model,
        cont_floor=cont_floor,
        discount3=d3,
        discount2=d2,
    )


def kn_trigram_perplexity_score(
    docs: DataFrame,
    model: KnTrigramModel,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """→ ``(doc_id, n_tokens, avg_neg_logp, perplexity)`` under the
    order-3 KN tower: a doc's first token scores by the unigram model,
    its second by the middle order
    ``log(p_disc2(w2,w) + λ2(w2)·p_cont(w))``, every later token by
    the full cascade
    ``log(p_disc3 + λ3·(p_disc2 + λ2·p_cont))``. Unseen (w1,w2)
    context → λ3 = 1 (full backoff); unseen w2 context → λ2 = 1;
    unseen continuation → ``cont_floor``. One candidate scan; all six
    model joins broadcast (tri/mid truncated by the trainer, the λ
    tables bounded by its ``max_contexts`` guard); empty documents →
    null perplexity."""
    from pyspark.sql import Window

    uni_model, oov_logp = model.uni_model, model.oov_logp
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode_outer(
            F.filter(tokens(text_col), lambda t: t != "")
        ).alias("_pos", "_term"),
    )
    uni = F.broadcast(
        uni_model.select(
            F.col("term").alias("_t"), F.col(OOV_LOGP_COL).alias("_lp")
        )
    )
    mapped = toks.join(uni, toks["_term"] == F.col("_t"), "left").select(
        "doc_id",
        "_pos",
        F.when(F.col("_term").isNull(), F.lit(None))
        .otherwise(F.coalesce(F.col("_t"), F.lit(_UNK)))
        .alias("_w3"),
        F.when(
            F.col("_term").isNotNull(),
            F.coalesce(F.col("_lp"), F.lit(oov_logp)),
        ).alias("_uni_lp"),
    )
    w = Window.partitionBy("doc_id").orderBy("_pos")
    seq = mapped.withColumn("_w2", F.lag("_w3", 1).over(w)).withColumn(
        "_w1", F.lag("_w3", 2).over(w)
    )
    tri = F.broadcast(
        model.tri_model.select(
            F.col("w1").alias("_t1"),
            F.col("w2").alias("_t2"),
            F.col("w3").alias("_t3"),
            "p_disc3",
        )
    )
    ctx2 = F.broadcast(
        model.ctx2_model.select(
            F.col("w1").alias("_c1"),
            F.col("w2").alias("_c2"),
            F.col("backoff3").alias("_lam3"),
        )
    )
    mid = F.broadcast(
        model.mid_model.select(
            F.col("w2").alias("_m2"),
            F.col("w3").alias("_m3"),
            "p_disc2",
        )
    )
    ctx1 = F.broadcast(
        model.ctx1_model.select(
            F.col("w2").alias("_x2"), F.col("backoff2").alias("_lam2")
        )
    )
    cont = F.broadcast(
        model.cont_model.select(
            F.col("w3").alias("_k3"), F.col("p_cont").alias("_pc")
        )
    )
    p_mid = (
        F.coalesce(F.col("p_disc2"), F.lit(0.0))
        + F.coalesce(F.col("_lam2"), F.lit(1.0))
        * F.coalesce(F.col("_pc"), F.lit(model.cont_floor))
    )
    joined = (
        seq.join(
            tri,
            (seq["_w1"] == F.col("_t1"))
            & (seq["_w2"] == F.col("_t2"))
            & (seq["_w3"] == F.col("_t3")),
            "left",
        )
        .join(
            ctx2,
            (seq["_w1"] == F.col("_c1")) & (seq["_w2"] == F.col("_c2")),
            "left",
        )
        .join(
            mid,
            (seq["_w2"] == F.col("_m2")) & (seq["_w3"] == F.col("_m3")),
            "left",
        )
        .join(ctx1, seq["_w2"] == F.col("_x2"), "left")
        .join(cont, seq["_w3"] == F.col("_k3"), "left")
        .select(
            "doc_id",
            F.when(F.col("_w3").isNull(), F.lit(None))
            .when(F.col("_w2").isNull(), F.col("_uni_lp"))
            .when(F.col("_w1").isNull(), F.log(p_mid))
            .otherwise(
                F.log(
                    F.coalesce(F.col("p_disc3"), F.lit(0.0))
                    # unseen trigram context: λ3 = 1 (full backoff)
                    + F.coalesce(F.col("_lam3"), F.lit(1.0)) * p_mid
                )
            )
            .alias("lp"),
        )
    )
    return (
        joined.groupBy("doc_id")
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


# ---------------------------------------------------------------------------
# CCNet perplexity bucketing (round 13) — the step Wenzek et al. 2020
# run AFTER LM scoring: split each language's documents into
# head/middle/tail by per-language perplexity quantiles (the paper
# cuts at 1/3 and 2/3), then train on head(+middle). The scorers
# above (unigram/bigram/KN/ARPA) produce the perplexity column; this
# operator produces the bucket label and the per-language cut table.
# ---------------------------------------------------------------------------


def perplexity_cuts(
    scored: DataFrame,
    perp_col: str = "perplexity",
    lang_col: str = "lang",
    bounds: tuple = (1.0 / 3.0, 2.0 / 3.0),
    exact: bool = False,
    accuracy: int = 10_000,
) -> DataFrame:
    """→ one row per language: (lang_col, cut_1 … cut_k), the
    perplexity values at each quantile in ``bounds`` (ascending, in
    (0, 1)). ``exact=False`` (the 100 TB default) uses Spark's
    bounded-memory ``approx_percentile`` sketch — map-side
    combinable, error ≤ 1/accuracy of rank; ``exact=True`` uses the
    interpolating ``percentile`` aggregate (CCNet semantics and the
    DuckDB ``quantile_cont`` twin, but it buffers each language's
    values — reserve it for oracle checks and bounded corpora). Null
    perplexities (empty docs) are ignored by both aggregates."""
    if not bounds or list(bounds) != sorted(set(bounds)) or not all(
        0.0 < b < 1.0 for b in bounds
    ):
        raise ValueError(
            f"bounds must be strictly increasing in (0, 1); got {bounds}"
        )
    pcts = F.array(*[F.lit(float(b)) for b in bounds])
    agg = (
        F.percentile(perp_col, pcts)
        if exact
        else F.approx_percentile(
            perp_col, pcts, F.lit(int(accuracy))
        )
    )
    cuts = scored.groupBy(lang_col).agg(agg.alias("_cuts"))
    return cuts.select(
        lang_col,
        *[
            F.element_at("_cuts", i + 1).alias(f"cut_{i + 1}")
            for i in range(len(bounds))
        ],
    )


def perplexity_buckets(
    scored: DataFrame,
    perp_col: str = "perplexity",
    lang_col: str = "lang",
    bounds: tuple = (1.0 / 3.0, 2.0 / 3.0),
    labels: tuple = ("head", "middle", "tail"),
    out_col: str = "ppl_bucket",
    exact: bool = False,
    accuracy: int = 10_000,
    cuts: DataFrame | None = None,
) -> DataFrame:
    """``scored`` plus ``out_col``: the CCNet bucket label —
    ``labels[i]`` for perplexity ≤ the i-th per-language cut, the
    last label above every cut (lower perplexity = more fluent =
    'head'). Null perplexity rows get a null bucket (score them or
    drop them upstream; silently labeling unscored docs 'head' would
    poison the best bucket).

    Pass ``cuts`` to reuse a table from :func:`perplexity_cuts`
    (e.g. cuts frozen from a reference snapshot — the CCNet deploy
    shape, where monthly crawls bucket against LAST month's cuts);
    otherwise cuts compute from ``scored`` itself. Shape: the cut
    table is ≤ |languages| rows and joins back BROADCAST (null-safe
    key, round-13 review fix: ``perplexity_cuts`` groups null-lang
    rows into their own NULL group, and a plain equi-join could
    never reach that cut row — every null-lang document would have
    silently landed in the last bucket) — the corpus side never
    shuffles."""
    if len(labels) != len(bounds) + 1:
        raise ValueError(
            f"need len(bounds)+1 labels; got {len(bounds)} bounds "
            f"and {len(labels)} labels"
        )
    if out_col in scored.columns:
        raise ValueError(f"{out_col!r} already exists — rename")
    if cuts is None:
        cuts = perplexity_cuts(
            scored, perp_col, lang_col, bounds, exact, accuracy
        )
    joined = scored.join(
        F.broadcast(cuts),
        scored[lang_col].eqNullSafe(cuts[lang_col]),
        "left",
    ).drop(cuts[lang_col])
    p = F.col(perp_col)
    expr = F.when(p.isNull(), F.lit(None).cast("string"))
    for i, lab in enumerate(labels[:-1]):
        expr = expr.when(p <= F.col(f"cut_{i + 1}"), F.lit(lab))
    expr = expr.otherwise(F.lit(labels[-1]))
    return joined.select(*scored.columns, expr.alias(out_col))
