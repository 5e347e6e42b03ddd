"""DSIR — Data Selection via Importance Resampling (round 11).

The public method for picking pre-training data that "looks like" a
target domain (Xie et al. 2023, "Data Selection for Language Models
via Importance Resampling"): featurize every document as a bag of
HASHED word n-grams, fit bag-of-buckets distributions p (target) and
q (raw pool), weight each raw document by its log importance ratio
Σ_b count_b·(log p_b − log q_b), and resample top-k under Gumbel
noise. Cheap enough to run over the whole pool — the features are
integer hashes, the distributions are two ≤ buckets-row tables.

Determinism + cross-engine parity choices (both documented, neither
changes the method's selection behavior):

* bucket log-ratios are QUANTIZED to integer micro-nats
  (round(1e6·(log p_b − log q_b))) before the per-document sum, so a
  document's score is an exact INTEGER — invariant to float addition
  order across partition layouts and bit-reproducible in the DuckDB
  twin (the same trick PSI's per-bucket integer totals use);
* the Gumbel noise is seeded per document from a cross-engine affine
  hash of (doc_id, seed) — same corpus + same seed ⇒ same selection,
  on any engine.

Scale shape: featurization is one JVM-expression scan (the per-token
char fold runs once per token; n-gram hashes COMPOSE from token
hashes — functions/text.py's shingle discipline); each distribution
is one ≤ buckets-row aggregate that broadcasts; scoring is one join
against that broadcast + one groupBy(doc); selection is a global
top-k (TakeOrderedAndProject — never a full sort). The pool is
scanned twice (q fit + scoring) and the target once.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_data_lake_spark.functions.text import (
    MOD,
    compose_shingle_hashes,
    poly_hash,
    tokens,
)

# (no affine id hash: round-11 self-review found the original
# doc_id*A form degenerated on non-numeric ids — cast('long') of a
# string id is null in non-ANSI Spark, turning Gumbel-top-k into
# "first k ids" with no error — and wrapped int64 for ids > ~3.5e9,
# breaking the cross-engine determinism claim. The draw now char-folds
# the id's STRING form through the shared 1e9+7 poly hash: any id
# type, no overflow, reproducible in DuckDB via sql_poly_hash.)


def hashed_ngram_buckets(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 10_000,
    ns: tuple[int, ...] = (1, 2),
) -> DataFrame:
    """→ (doc_id, bucket, cnt): hashed word n-gram bag per document
    (the paper's unigram+bigram default). Each token char-folds ONCE;
    n-gram hashes compose from token hashes; bucket = hash mod
    ``buckets``. Documents shorter than n tokens contribute no
    n-grams at that order.

    Arrow-batched (round 14): the bag — tokenize, per-token char fold,
    window composition AND the per-doc bucket count — is one pandas
    UDF emitting (bucket, cnt) structs, exploded flat. The JVM
    expression form (kept below as the parity reference) ran the char
    fold as interpreted higher-order-function lambdas (a closure call
    per character — the measured LSH-family bottleneck,
    functions/text.py) and needed a corpus-wide (doc, bucket) shuffle
    just to count within each doc; counting inside the batch makes the
    scan shuffle-free. Bit-equality with the expression form is
    test-pinned (tests/test_dsir.py), same contract as
    shingle_hashes_pandas_udf."""
    if buckets < 2:
        raise ValueError(f"buckets must be >= 2, got {buckets}")
    if not ns or any(n < 1 for n in ns):
        raise ValueError(f"ns must be non-empty positive orders, got {ns}")
    from etl_data_lake_spark.sources.catalog import fan_out

    bag = _bucket_bag_pandas_udf(buckets, tuple(ns))
    return (
        fan_out(docs.select(F.col(id_col).alias("doc_id"), F.col(text_col)))
        .select("doc_id", F.explode(bag(F.col(text_col))).alias("_bc"))
        .select("doc_id", F.col("_bc.bucket").alias("bucket"),
                F.col("_bc.cnt").alias("cnt"))
    )


import re as _re

_SPLITTER = _re.compile(r"[ \t\n\x0b\f\r]+")


def _bag_of(text, buckets: int, ns: tuple[int, ...]) -> dict:
    """The hashed n-gram bag of ONE document — the single Python
    implementation every Arrow path shares (featurizer UDF, fused fit
    pass, in-UDF scorer), so their bit-parity holds by construction.
    Tokenization replicates the JVM ``filter(split(trim(text),
    '\\s+'), t != '')`` exactly (trim strips SPACES only; Java
    ``\\s`` is ASCII [ \\t\\n\\x0b\\f\\r]); hashes are the shared
    base-31 char fold mod 1e9+7 with n-window composition. ``None``
    text → empty bag."""
    if text is None:
        return {}
    th = []
    for t in _SPLITTER.split(text.strip(" ")):
        if not t:
            continue
        h = 0
        for ch in t:
            h = (h * 31 + ord(ch)) % MOD
        th.append(h)
    out: dict[int, int] = {}
    for n in ns:
        for i in range(len(th) - n + 1):
            a = th[i]
            for j in range(1, n):
                a = (a * 31 + th[i + j]) % MOD
            b = a % buckets
            out[b] = out.get(b, 0) + 1
    return out


def _bucket_bag_pandas_udf(buckets: int, ns: tuple[int, ...]):
    """text → array<struct<bucket,cnt>>: :func:`_bag_of` per document,
    Arrow-batched. Null text stays null (the exploded form then emits
    no rows — same as the expression twin). Output order inside the
    array follows first occurrence — deterministic, and irrelevant
    downstream (every consumer aggregates)."""
    from pyspark.sql.functions import pandas_udf

    def one(text):
        if text is None:
            return None
        return list(_bag_of(text, buckets, ns).items())

    def f(s):
        return s.map(one)

    return pandas_udf(f, "array<struct<bucket:long,cnt:long>>")


def hashed_ngram_buckets_expr(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 10_000,
    ns: tuple[int, ...] = (1, 2),
) -> DataFrame:
    """The pure-JVM-expression form of :func:`hashed_ngram_buckets` —
    kept as the cross-engine parity reference (it IS the shape the
    DuckDB oracle twin implements); tests pin bit-equality between the
    two. Not the production path: the interpreted char-fold lambdas
    and the (doc, bucket) counting shuffle are exactly what the Arrow
    form removes."""
    if buckets < 2:
        raise ValueError(f"buckets must be >= 2, got {buckets}")
    if not ns or any(n < 1 for n in ns):
        raise ValueError(f"ns must be non-empty positive orders, got {ns}")
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.transform(
            F.filter(tokens(text_col), lambda t: t != ""),
            lambda t: poly_hash(t),
        ).alias("_th"),
    )
    grams = F.concat(
        *[compose_shingle_hashes(F.col("_th"), n) for n in ns]
    )
    return (
        base.select("doc_id", F.explode(grams).alias("_h"))
        .select("doc_id", F.pmod("_h", F.lit(buckets)).alias("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def bucket_log_ratio(
    target_counts: DataFrame,
    raw_counts: DataFrame,
    buckets: int,
    alpha: float = 1.0,
) -> DataFrame:
    """→ (bucket, ratio_unats): integer micro-nat log importance
    ratio per feature bucket, add-α smoothed on both sides —
    ``round(1e6·(log p_b − log q_b))`` where
    ``p_b = (n_target_b + α)/(N_target + α·buckets)`` (same for q).
    Buckets absent from BOTH corpora are omitted (their ratio applies
    to zero features); buckets absent from one side use that side's
    smoothing floor. ≤ buckets rows — broadcasts."""
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    t = target_counts.groupBy("bucket").agg(F.sum("cnt").alias("n_t"))
    r = raw_counts.groupBy("bucket").agg(F.sum("cnt").alias("n_q"))
    # The WHOLE fit in ONE driver action (extends the round-12 ADVICE
    # one-collect discipline): the per-bucket join is ≤ buckets rows
    # by construction — a model, not data — so collecting it and
    # deriving the totals locally costs the driver nothing extra,
    # while leaving the ratio distributed made every downstream
    # consumer RE-RUN the two count aggregations + full join (the
    # ratio frame is referenced by the scoring broadcast and by any
    # caller inspection — each reference re-evaluated the subtree).
    # The returned frame is a local ≤ buckets-row DataFrame: consumers
    # broadcast it straight from the driver, zero recomputation. The
    # log arithmetic is the same IEEE sequence the JVM expression ran
    # (add, divide, log, subtract, ×1e6, round-half-away-from-zero);
    # bit-equality with the pure-Python reference stays test-pinned.
    rows = (
        t.join(r, "bucket", "full")
        .select(
            "bucket",
            F.coalesce("n_t", F.lit(0)).alias("n_t"),
            F.coalesce("n_q", F.lit(0)).alias("n_q"),
        )
        .collect()
    )
    out = _fit_ratio(
        {row["bucket"]: row["n_t"] for row in rows},
        {row["bucket"]: row["n_q"] for row in rows},
        buckets,
        alpha,
    )
    return target_counts.sparkSession.createDataFrame(
        sorted(out.items()), "bucket long, ratio_unats long"
    )


def _fit_ratio(
    t_cnt: dict, q_cnt: dict, buckets: int, alpha: float
) -> dict:
    """{bucket: n_t}, {bucket: n_q} → {bucket: ratio_unats}: the
    driver-local fit arithmetic shared by :func:`bucket_log_ratio` and
    the fused fit in :func:`dsir_log_weights` — the same IEEE sequence
    the original JVM expression ran (add, divide, log, subtract, ×1e6,
    round-half-away-from-zero); bit-equality with the pure-Python
    reference is test-pinned."""
    tot = sum(t_cnt.values())
    toq = sum(q_cnt.values())
    if tot == 0 or toq == 0:
        raise ValueError(
            "bucket_log_ratio: a side has no features — fit on "
            "non-empty corpora"
        )
    denom_t = float(tot + alpha * buckets)
    denom_q = float(toq + alpha * buckets)

    def half_away(x: float) -> int:
        # Spark/DuckDB ROUND is HALF_UP away from zero; Python round()
        # is banker's — replicate Spark (same as py_dsir_scores)
        return int(math.copysign(math.floor(abs(x) + 0.5), x))

    return {
        b: half_away(
            (
                math.log((t_cnt.get(b, 0) + alpha) / denom_t)
                - math.log((q_cnt.get(b, 0) + alpha) / denom_q)
            )
            * 1_000_000.0
        )
        for b in set(t_cnt) | set(q_cnt)
    }


def dsir_log_weights(
    raw_docs: DataFrame,
    target_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 10_000,
    ns: tuple[int, ...] = (1, 2),
    alpha: float = 1.0,
) -> DataFrame:
    """→ (doc_id, n_features, score_unats): each raw document's
    integer micro-nat log importance weight
    Σ_b cnt_b · ratio_unats_b. Featureless documents score 0 with 0
    features (left join — they stay eligible for resampling at the
    neutral weight rather than vanishing). Exact integer arithmetic —
    layout-invariant and DuckDB-twinnable.

    Execution shape (round 15): TWO text passes and nothing else.

    * FIT — one fused ``mapInPandas`` over raw ∪ target (side-tagged)
      emits per-batch pre-aggregated (side, bucket, cnt) rows — no
      per-doc structs, no explode, no corpus-sized persist; a
      map-side-combined groupBy reduces to ≤ 2·buckets rows and ONE
      collect (the unchanged one-driver-action discipline) fits both
      distributions; the ratio is computed locally (`_fit_ratio`,
      bit-identical arithmetic).
    * SCORE — a second ``mapInPandas`` over the raw pool with the
      ≤ buckets-entry ratio dict in the task closure (the same size
      class the previous driver-built broadcast shipped) emits
      (doc_id, n_features, score_unats) directly — the former
      bag explode, bag-level broadcast join and bag persist are gone.
      The per-doc groupBy + id left-join stay, preserving the exact
      duplicate-id merge and null-id (0, 0) semantics of the previous
      form.

    Versus round 14: the raw pool is featurized twice instead of
    persisted once — but the persisted bag was corpus-sized (the
    (doc, bucket, cnt) rows rival the text itself), so at scale this
    trades a cache write+read+explode+shuffle for one extra tokenize
    scan, strictly less I/O, with zero cache-lifecycle leakage (the
    round-14 ADVICE unpersist item dissolves)."""
    if buckets < 2:
        raise ValueError(f"buckets must be >= 2, got {buckets}")
    if not ns or any(n < 1 for n in ns):
        raise ValueError(f"ns must be non-empty positive orders, got {ns}")
    ns = tuple(ns)
    import pandas as pd

    from etl_data_lake_spark.sources.catalog import fan_out

    # ---- fit: one fused pass over both corpora --------------------
    tagged = fan_out(
        raw_docs.select(
            F.lit(0).alias("side"), F.col(text_col).alias("text")
        ).unionAll(
            target_docs.select(
                F.lit(1).alias("side"), F.col(text_col).alias("text")
            )
        )
    )

    def fit_fn(batches):
        agg: dict = {}
        for pdf in batches:
            for side, text in zip(pdf["side"], pdf["text"]):
                side = int(side)
                for b, c in _bag_of(text, buckets, ns).items():
                    k = (side, b)
                    agg[k] = agg.get(k, 0) + c
        if agg:
            keys = list(agg)
            yield pd.DataFrame(
                {
                    "side": pd.array([k[0] for k in keys], dtype="int32"),
                    "bucket": pd.array([k[1] for k in keys], dtype="int64"),
                    "cnt": pd.array([agg[k] for k in keys], dtype="int64"),
                }
            )

    side_counts = (
        tagged.mapInPandas(
            fit_fn, "side int, bucket long, cnt long"
        )
        .groupBy("side", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
        .collect()  # ≤ 2·buckets rows — the fit's ONE driver action
    )
    t_cnt = {r["bucket"]: r["cnt"] for r in side_counts if r["side"] == 1}
    q_cnt = {r["bucket"]: r["cnt"] for r in side_counts if r["side"] == 0}
    ratio = _fit_ratio(t_cnt, q_cnt, buckets, alpha)

    # ---- score: one pass over the raw pool, model in-closure ------
    id_type = raw_docs.schema[id_col].dataType.simpleString()

    def score_fn(batches):
        for pdf in batches:
            nf, sc = [], []
            for text in pdf["text"]:
                bag = _bag_of(text, buckets, ns)
                nf.append(sum(bag.values()))
                sc.append(
                    sum(c * ratio.get(b, 0) for b, c in bag.items())
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_features": pd.array(nf, dtype="int64"),
                    "score_unats": pd.array(sc, dtype="int64"),
                }
            )

    per_row = fan_out(
        raw_docs.select(
            F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
        )
    ).mapInPandas(
        score_fn,
        f"doc_id {id_type}, n_features long, score_unats long",
    )
    # duplicate ids merge (scores are linear in counts, so summing
    # per-row scores equals scoring the merged bag); null ids never
    # join back and land at the neutral (0, 0) — both exactly the
    # previous form's semantics
    scored = per_row.groupBy("doc_id").agg(
        F.sum("n_features").cast("long").alias("n_features"),
        F.sum("score_unats").cast("long").alias("score_unats"),
    )
    ids = raw_docs.select(F.col(id_col).alias("doc_id"))
    return ids.join(scored, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_features", F.lit(0)).cast("long").alias("n_features"),
        F.coalesce("score_unats", F.lit(0)).cast("long").alias(
            "score_unats"
        ),
    )


def gumbel_key(doc_id_col, seed: int = 0):
    """Deterministic per-doc Gumbel draw in micro-nats: u from the
    char-fold poly hash of ``"<seed>#<doc_id as string>"`` mapped into
    (0, 1), g = −ln(−ln u), scaled ×1e6. Works for ANY id type (the
    id is hashed through its string form — no long cast that nulls
    string ids, no int64 overflow for huge numeric ids) and is
    cross-engine: the same fold is functions.text.sql_poly_hash. Null
    ids hash as the empty string (one shared draw) rather than
    silently sorting apart.

    The fold alone is CONTINUOUS in the trailing character (ids
    "url-1"/"url-2" hash 1 apart → micro-nat draws round equal), so a
    final multiplicative scramble disperses adjacent hashes across
    the whole ring — h < 1e9+7 times the Knuth multiplier stays under
    2^63, exact in any engine's int64."""
    h = poly_hash(
        F.concat(
            F.lit(f"{int(seed)}#"),
            F.coalesce(doc_id_col.cast("string"), F.lit("")),
        )
    )
    h = F.pmod(h * F.lit(2_654_435_761) + F.lit(40_503), F.lit(MOD))
    u = (h.cast("double") + F.lit(0.5)) / F.lit(float(MOD))
    return F.round(-F.log(-F.log(u)) * F.lit(1_000_000.0)).cast("long")


def dsir_resample(
    weights: DataFrame,
    k: int,
    seed: int = 0,
) -> DataFrame:
    """→ the ``k`` selected rows of a :func:`dsir_log_weights` frame
    (plus their ``gumbel_unats`` and ``key_unats``): Gumbel-top-k =
    sampling k documents WITHOUT replacement with probability ∝
    exp(score) — the paper's resampling step, derandomized by the
    seeded per-doc draw. Global top-k by (key desc, doc_id asc) —
    TakeOrderedAndProject, never a full sort."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    keyed = weights.select(
        "*",
        gumbel_key(F.col("doc_id"), seed).alias("gumbel_unats"),
    ).withColumn(
        "key_unats", F.col("score_unats") + F.col("gumbel_unats")
    )
    return keyed.orderBy(
        F.desc("key_unats"), F.asc("doc_id")
    ).limit(k)


def py_dsir_scores(
    raw_texts: dict,
    target_texts: dict,
    buckets: int = 10_000,
    ns: tuple[int, ...] = (1, 2),
    alpha: float = 1.0,
) -> dict:
    """Pure-Python reference of the whole weight pipeline (the
    test-pinned twin): {doc_id: (n_features, score_unats)} — exact
    integer equality with :func:`dsir_log_weights` is the contract."""
    import re

    def toks(s):
        return [t for t in re.split(r"\s+", s.strip()) if t != ""]

    def th(t):
        a = 0
        for ch in t:
            a = (a * 31 + ord(ch)) % MOD
        return a

    def bag(text):
        hs = [th(t) for t in toks(text)]
        out: dict[int, int] = {}
        for n in ns:
            for i in range(len(hs) - n + 1):
                a = hs[i]
                for j in range(1, n):
                    a = (a * 31 + hs[i + j]) % MOD
                b = a % buckets
                out[b] = out.get(b, 0) + 1
        return out

    t_cnt: dict[int, int] = {}
    q_cnt: dict[int, int] = {}
    for s in target_texts.values():
        for b, c in bag(s).items():
            t_cnt[b] = t_cnt.get(b, 0) + c
    for s in raw_texts.values():
        for b, c in bag(s).items():
            q_cnt[b] = q_cnt.get(b, 0) + c
    dt = sum(t_cnt.values()) + alpha * buckets
    dq = sum(q_cnt.values()) + alpha * buckets

    def half_away(x: float) -> int:
        # Spark's ROUND (and DuckDB's) is HALF_UP away from zero;
        # Python's round() is banker's — replicate Spark here
        return int(math.copysign(math.floor(abs(x) + 0.5), x))

    ratio = {
        b: half_away(
            (
                math.log((t_cnt.get(b, 0) + alpha) / dt)
                - math.log((q_cnt.get(b, 0) + alpha) / dq)
            )
            * 1_000_000.0
        )
        for b in set(t_cnt) | set(q_cnt)
    }
    out = {}
    for i, s in raw_texts.items():
        bg = bag(s)
        out[i] = (
            sum(bg.values()),
            sum(c * ratio.get(b, 0) for b, c in bg.items()),
        )
    return out
