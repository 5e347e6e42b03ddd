"""Model-based quality filtering (functions/classifier): hashed-feature
logistic regression — distributed fit on a planted separable corpus,
frozen-weights SQL parity for the scoring arithmetic, and the
composable filter stage. The Naive-Bayes catalog twin
(quality_classifier_scores) is oracle-checked by the driver and
tests/test_parity."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from etl_data_lake_spark.functions.classifier import (
    LogRegModel,
    hashed_features,
    nb_quality_filter,
    quality_filter,
    score_logreg,
    sql_hashed_bucket,
    train_logreg,
    weak_quality_label,
)

_GOOD = (
    "the quick brown fox jumps over the lazy dog and runs far away "
    "a clear morning with coffee and a long walk in the park is nice"
).split()
_BAD = (
    "buy cheap pills click here winner jackpot casino free offer "
    "xxx spam lottery prize claim now urgent deal discount viagra"
).split()


def _planted(spark, n_per_class: int = 40, doc_len: int = 12):
    """Deterministic separable corpus: positive docs draw from _GOOD,
    negative from _BAD (disjoint vocabularies), rotation-indexed so no
    RNG is involved."""
    rows = []
    for i in range(n_per_class):
        good = " ".join(
            _GOOD[(i + j) % len(_GOOD)] for j in range(doc_len)
        )
        bad = " ".join(
            _BAD[(i + j) % len(_BAD)] for j in range(doc_len)
        )
        rows.append((2 * i, good, 1))
        rows.append((2 * i + 1, bad, 0))
    return spark.createDataFrame(
        rows, "doc_id long, text string, y long"
    )


def test_logreg_separates_planted_corpus(spark):
    docs = _planted(spark)
    feats = hashed_features(docs, n_buckets=4096)
    model = train_logreg(
        feats, docs.select("doc_id", "y"), n_buckets=4096, epochs=25
    )
    # convergence: monotone-ish decrease, big total drop
    assert model.losses[0] > 0.6  # ~ln 2 at the zero init
    assert model.losses[-1] < model.losses[0] / 4
    scored = score_logreg(feats, model)
    got = scored.join(docs.select("doc_id", "y"), "doc_id").select(
        "y", (F.col("prob") >= 0.5).cast("int").alias("pred")
    )
    n_wrong = got.where(F.col("y") != F.col("pred")).count()
    assert n_wrong == 0, f"{n_wrong} misclassified on a separable corpus"


def test_logreg_frozen_weights_sql_parity(spark, duck):
    """The scoring arithmetic — portable hash bucket, 1+ln damping,
    weight dot-product, sigmoid — reproduces in DuckDB for a frozen
    weight table (the 'SQL-reproducible for frozen weights' contract)."""
    docs = _planted(spark, n_per_class=10)
    n_buckets, seed = 512, 7
    feats = hashed_features(
        docs, n_buckets=n_buckets, seed=seed, portable=True
    )
    # freeze a deterministic non-trivial weight per touched bucket
    buckets = [r["bucket"] for r in feats.select("bucket").distinct().collect()]
    weights = {b: math.sin(b) for b in buckets}
    model = LogRegModel(
        weights=weights, bias=0.25, n_buckets=n_buckets, losses=[]
    )
    got = {
        r["doc_id"]: (r["margin"], r["prob"])
        for r in score_logreg(feats, model).collect()
    }

    duck.register("planted_docs", docs.toPandas())
    duck.register(
        "w_frozen",
        __import__("pandas").DataFrame(
            {"bucket": list(weights), "w": list(weights.values())}
        ),
    )
    bucket_sql = sql_hashed_bucket("term", n_buckets, seed)
    want = duck.sql(f"""
        WITH tok AS (
            SELECT doc_id,
                   unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
            FROM planted_docs
        ),
        fx AS (
            SELECT doc_id, {bucket_sql} AS bucket,
                   COUNT(*)::DOUBLE AS x
            FROM tok GROUP BY doc_id, {bucket_sql}
        )
        SELECT doc_id,
               0.25 + SUM((1.0 + ln(x)) * COALESCE(w, 0.0)) AS margin
        FROM fx LEFT JOIN w_frozen USING (bucket)
        GROUP BY doc_id
    """).df()
    assert len(want) == len(got)
    for _, r in want.iterrows():
        m, p = got[r["doc_id"]]
        assert m == pytest.approx(r["margin"], abs=1e-9)
        assert p == pytest.approx(1.0 / (1.0 + math.exp(-r["margin"])), abs=1e-12)


def test_quality_filter_composes(spark):
    docs = _planted(spark)
    feats = hashed_features(docs, n_buckets=4096)
    model = train_logreg(
        feats, docs.select("doc_id", "y"), n_buckets=4096, epochs=25
    )
    kept = quality_filter(docs, model, min_prob=0.5)
    assert kept.columns == docs.columns  # semi-join keeps the schema
    ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    want = {r["doc_id"] for r in docs.where("y = 1").collect()}
    assert ids == want


def test_weak_label_matches_heuristic_gate(spark):
    """weak_quality_label ≡ text_quality_scores.quality_pass on the
    real documents fixture — the label IS the heuristic, distilled."""
    from tests.conftest import SF_DIR

    from etl_data_lake_spark.functions.text import tokens
    from etl_data_lake_spark.queries.text_queries import text_quality_scores
    from etl_data_lake_spark.sources.catalog import load_table

    docs = load_table(spark, SF_DIR, "documents")
    lab = docs.select(
        "doc_id", weak_quality_label(tokens("text")).alias("y")
    )
    heur = text_quality_scores(spark, SF_DIR).select(
        "doc_id", F.col("quality_pass").cast("long").alias("q")
    )
    diff = lab.join(heur, "doc_id").where(F.col("y") != F.col("q")).count()
    assert diff == 0


def test_trainer_validation(spark):
    docs = _planted(spark, n_per_class=2)
    feats = hashed_features(docs, n_buckets=64)
    labels = docs.select("doc_id", "y")
    with pytest.raises(ValueError, match="epochs"):
        train_logreg(feats, labels, 64, epochs=0)
    with pytest.raises(ValueError, match="lr"):
        train_logreg(feats, labels, 64, lr=0.0)
    with pytest.raises(ValueError, match="l2"):
        train_logreg(feats, labels, 64, l2=-1.0)
    with pytest.raises(ValueError, match="n_buckets"):
        hashed_features(docs, n_buckets=1)
    with pytest.raises(ValueError, match="no labeled documents"):
        train_logreg(feats, labels.where("doc_id < 0"), 64)


def test_nb_filter_separates_and_is_layout_stable(spark):
    """nb_quality_filter with EXPLICIT labels keeps the positive class
    on a separable corpus, and the integer scoring makes the kept set
    identical under repartitioning (the e2e determinism contract)."""
    docs = _planted(spark, n_per_class=20)
    labels = docs.select("doc_id", "y")
    kept = nb_quality_filter(docs, labels=labels)
    assert {r["doc_id"] for r in kept.collect()} == {
        r["doc_id"] for r in docs.where("y = 1").collect()
    }
    kept13 = nb_quality_filter(docs.repartition(13), labels=labels)
    assert sorted(r["doc_id"] for r in kept13.collect()) == sorted(
        r["doc_id"] for r in kept.collect()
    )


def test_nb_scores_whole_corpus_from_labeled_subset(spark):
    """The bootstrap contract: training restricts to the labeled
    subset, scoring does NOT (review regression — an inner join used
    to drop every unlabeled doc before scoring)."""
    from etl_data_lake_spark.functions.classifier import nb_quality_scores

    docs = _planted(spark, n_per_class=20)
    labeled = docs.where("doc_id < 10").select("doc_id", "y")  # 10 of 40
    scored = nb_quality_scores(docs, labels=labeled)
    assert scored.count() == docs.count()  # everyone scored
    got = scored.join(docs.select("doc_id", "y"), "doc_id")
    wrong = got.where(F.col("predicted_quality") != F.col("y")).count()
    assert wrong == 0  # disjoint vocabularies generalize perfectly


def test_quality_filter_uses_model_feature_contract(spark):
    """quality_filter rebuilds features from the model's recorded
    (seed, portable) — a model trained on a non-default feature space
    must filter correctly without the caller restating it (review
    regression: defaults silently mismatched the buckets)."""
    docs = _planted(spark, n_per_class=10)
    feats = hashed_features(docs, n_buckets=512, seed=7, portable=True)
    model = train_logreg(
        feats, docs.select("doc_id", "y"), n_buckets=512,
        epochs=20, seed=7, portable=True,
    )
    kept = quality_filter(docs, model)
    assert {r["doc_id"] for r in kept.collect()} == {
        r["doc_id"] for r in docs.where("y = 1").collect()
    }


def _exact_auc(pairs):
    """Exact Mann-Whitney AUC, tiny-python reference."""
    pos = [s for y, s in pairs if y == 1]
    neg = [s for y, s in pairs if y == 0]
    if not pos or not neg:
        return None
    u = sum(
        1.0 if p > q else (0.5 if p == q else 0.0)
        for p in pos for q in neg
    )
    return u / (len(pos) * len(neg))


def test_classifier_eval_matches_exact_reference(spark):
    from etl_data_lake_spark.functions.classifier import classifier_eval

    pairs = [
        (1, 0.9), (1, 0.8), (1, 0.55), (1, 0.4), (1, 0.55),
        (0, 0.6), (0, 0.3), (0, 0.55), (0, 0.1), (0, 0.2),
    ]
    df = spark.createDataFrame(pairs, "y long, prob double")
    row = classifier_eval(df, threshold=0.5).collect()[0]
    assert (row["n"], row["n_pos"], row["n_neg"]) == (10, 5, 5)
    # confusion at 0.5: preds >= .5 → pos {0.9,.8,.55,.55}=4 tp, fn 1;
    # neg {0.6,.55} → fp 2, tn 3
    assert (row["tp"], row["fp"], row["tn"], row["fn"]) == (4, 2, 3, 1)
    assert row["accuracy"] == pytest.approx(0.7)
    assert row["precision"] == pytest.approx(4 / 6)
    assert row["recall"] == pytest.approx(0.8)
    assert row["f1"] == pytest.approx(2 * 4 / (2 * 4 + 2 + 1))
    # binned AUC vs the exact rank-sum (ties at 0.55 included)
    assert row["auc"] == pytest.approx(_exact_auc(pairs), abs=1e-4)


def test_classifier_eval_edges(spark):
    from etl_data_lake_spark.functions.classifier import classifier_eval

    # perfect separation → auc 1.0; degenerate single-class → nulls
    perfect = spark.createDataFrame(
        [(1, 0.9), (1, 0.8), (0, 0.2), (0, 0.1)], "y long, prob double"
    )
    r = classifier_eval(perfect).collect()[0]
    assert r["auc"] == pytest.approx(1.0) and r["accuracy"] == 1.0
    onecls = spark.createDataFrame([(1, 0.9), (1, 0.1)], "y long, prob double")
    r1 = classifier_eval(onecls).collect()[0]
    assert r1["auc"] is None and r1["tn"] == 0
    # nulls excluded, not counted
    withnull = spark.createDataFrame(
        [(1, 0.9), (None, 0.5), (0, None)], "y long, prob double"
    )
    assert classifier_eval(withnull).collect()[0]["n"] == 1
    with pytest.raises(ValueError, match="threshold"):
        classifier_eval(perfect, threshold=1.5)
    with pytest.raises(ValueError, match="auc_bins"):
        classifier_eval(perfect, auc_bins=1)


def test_classifier_eval_on_trained_model(spark):
    """End-to-end: the logreg trained on the separable corpus grades
    perfectly under its own eval — the threshold-sweep surface."""
    from etl_data_lake_spark.functions.classifier import classifier_eval

    docs = _planted(spark, n_per_class=20)
    feats = hashed_features(docs, n_buckets=2048)
    model = train_logreg(
        feats, docs.select("doc_id", "y"), n_buckets=2048, epochs=20
    )
    scored = score_logreg(feats, model).join(
        docs.select("doc_id", "y"), "doc_id"
    )
    r = classifier_eval(scored).collect()[0]
    assert r["auc"] == pytest.approx(1.0)
    assert r["f1"] == pytest.approx(1.0)


def test_classifier_eval_excludes_nan_and_scans_once(spark):
    """NaN scores are 'no evidence' like nulls (NaN >= threshold is
    TRUE in Spark double ordering — unfiltered it would predict
    positive and land lowest in the AUC fold), and the whole eval
    derives from ONE data-sized aggregation."""
    from etl_data_lake_spark.functions.classifier import classifier_eval

    df = spark.createDataFrame(
        [(1.0, 0.9), (0.0, 0.1), (0.0, float("nan")),
         (float("nan"), 0.8)],
        "y double, prob double",
    )
    r = classifier_eval(df).collect()[0]
    assert (r["n"], r["fp"]) == (2, 0)
    assert r["auc"] == pytest.approx(1.0)
    # one scan: a single Aggregate consumes the input; everything
    # else runs on its bucket rows
    plan = classifier_eval(df)._jdf.queryExecution().optimizedPlan().toString()
    import re

    assert len(re.findall(r"LocalRelation|LogicalRDD", plan)) == 1
