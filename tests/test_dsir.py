"""DSIR importance resampling (operators/dsir.py, round 11): Spark ≡
pure-Python integer scores, planted target-domain selection, layout
determinism, seeded Gumbel top-k behavior. The DuckDB twin runs in
test_parity::test_library_twin_parity[dsir_weights_docs]."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_data_lake_spark.operators.dsir import (
    dsir_log_weights,
    dsir_resample,
    hashed_ngram_buckets,
    py_dsir_scores,
)

RAW = {
    1: "the cat sat on the mat",
    2: "stock market prices rose sharply today",
    3: "a dog chased the cat around the park",
    4: "quarterly earnings beat market expectations",
    5: "the cat and the dog slept",
    6: "bond yields fell as markets wobbled",
    7: "",
}
TARGET = {
    100: "the cat sat quietly",
    101: "a cat and a dog played in the park",
    102: "the dog sat on the mat",
}


def _frames(spark):
    raw = spark.createDataFrame(
        list(RAW.items()), "doc_id long, text string"
    )
    tgt = spark.createDataFrame(
        list(TARGET.items()), "doc_id long, text string"
    )
    return raw, tgt


def test_weights_match_pure_python_exactly(spark):
    raw, tgt = _frames(spark)
    got = {
        r["doc_id"]: (r["n_features"], r["score_unats"])
        for r in dsir_log_weights(raw, tgt, buckets=512).collect()
    }
    want = py_dsir_scores(RAW, TARGET, buckets=512)
    assert got == want
    assert got[7] == (0, 0)  # featureless doc: neutral, not dropped


def test_target_like_docs_outscore_off_domain(spark):
    """The selection signal itself: pet-domain raw docs (1, 3, 5) must
    outscore every finance doc (2, 4, 6) under the pet target."""
    raw, tgt = _frames(spark)
    s = {
        r["doc_id"]: r["score_unats"]
        for r in dsir_log_weights(raw, tgt, buckets=512).collect()
    }
    assert min(s[1], s[3], s[5]) > max(s[2], s[4], s[6])


def test_layout_invariance(spark):
    raw, tgt = _frames(spark)
    a = sorted(map(tuple, dsir_log_weights(raw, tgt, buckets=512).collect()))
    b = sorted(
        map(
            tuple,
            dsir_log_weights(
                raw.repartition(7), tgt.repartition(3), buckets=512
            ).collect(),
        )
    )
    assert a == b


def test_resample_is_seeded_topk_without_replacement(spark):
    raw, tgt = _frames(spark)
    w = dsir_log_weights(raw, tgt, buckets=512)
    pick1 = {r["doc_id"] for r in dsir_resample(w, k=3, seed=0).collect()}
    pick1b = {r["doc_id"] for r in dsir_resample(w, k=3, seed=0).collect()}
    assert pick1 == pick1b and len(pick1) == 3  # deterministic, no dups
    picks = [
        frozenset(
            r["doc_id"] for r in dsir_resample(w, k=3, seed=s).collect()
        )
        for s in range(6)
    ]
    assert len(set(picks)) > 1  # the seed actually matters
    # with noise dwarfed by the scores, top-k = argmax weights
    big = w.withColumn(
        "score_unats", F.col("score_unats") * F.lit(1_000_000)
    )
    det = {r["doc_id"] for r in dsir_resample(big, k=3, seed=0).collect()}
    s = {r["doc_id"]: r["score_unats"] for r in w.collect()}
    assert det == set(sorted(s, key=lambda d: (-s[d], d))[:3])


def test_plan_is_global_topk(spark):
    raw, tgt = _frames(spark)
    w = dsir_log_weights(raw, tgt, buckets=512)
    plan = (
        dsir_resample(w, k=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_arrow_bag_matches_expression_form(spark):
    """The Arrow-batched featurizer (production path) must emit the
    exact (doc_id, bucket, cnt) multiset of the JVM expression form —
    the cross-engine parity reference the DuckDB twin implements.
    Exercises multi-space/tab/newline separators, leading/trailing
    whitespace, an empty doc, a null doc, and unigram-only order."""
    from etl_data_lake_spark.operators.dsir import hashed_ngram_buckets_expr

    rows = [
        (1, "the cat  sat\t on\nthe mat "),
        (2, "  leading and trailing  "),
        (3, ""),
        (4, None),
        (5, "one"),
        (6, "a b a b a"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    for ns in ((1, 2), (1,), (3,)):
        got = sorted(
            tuple(r) for r in hashed_ngram_buckets(
                docs, buckets=97, ns=ns
            ).collect()
        )
        want = sorted(
            tuple(r) for r in hashed_ngram_buckets_expr(
                docs, buckets=97, ns=ns
            ).collect()
        )
        assert got == want, f"ns={ns}"
        assert got, f"ns={ns} produced no rows"


def test_validation(spark):
    raw, tgt = _frames(spark)
    with pytest.raises(ValueError, match="buckets"):
        hashed_ngram_buckets(raw, buckets=1)
    with pytest.raises(ValueError, match="ns"):
        hashed_ngram_buckets(raw, ns=())
    with pytest.raises(ValueError, match="k must"):
        dsir_resample(dsir_log_weights(raw, tgt, buckets=64), k=0)
    empty = spark.createDataFrame([], "doc_id long, text string")
    with pytest.raises(ValueError, match="non-empty"):
        dsir_log_weights(raw, empty, buckets=64)


def test_resample_works_for_string_doc_ids(spark):
    """Regression (round-11 self-review): the Gumbel draw previously
    cast doc_id to long — null for string ids, silently degrading
    top-k to 'first k ids'. The string-fold draw must produce distinct
    seeded keys for string ids."""
    raw = spark.createDataFrame(
        [(f"url-{i}", t) for i, t in RAW.items()], "doc_id string, text string"
    )
    tgt = spark.createDataFrame(
        [(f"t-{i}", t) for i, t in TARGET.items()],
        "doc_id string, text string",
    )
    w = dsir_log_weights(raw, tgt, buckets=512)
    sel = dsir_resample(w, k=3, seed=0).collect()
    assert len(sel) == 3
    assert len({r["gumbel_unats"] for r in sel}) == 3  # real draws
    again = {r["doc_id"] for r in dsir_resample(w, k=3, seed=0).collect()}
    assert again == {r["doc_id"] for r in sel}
    other = {r["doc_id"] for r in dsir_resample(w, k=3, seed=9).collect()}
    assert isinstance(other, set)  # seeded path executes for strings


def test_huge_numeric_ids_keep_distinct_draws(spark):
    """ids > 2^63/A no longer wrap: draws stay distinct + stable."""
    base = 4_000_000_000  # past the old overflow point after multiply
    w = spark.createDataFrame(
        [(base + i, 5, 0) for i in range(6)],
        "doc_id long, n_features long, score_unats long",
    )
    sel = dsir_resample(w, k=6, seed=0).collect()
    assert len({r["gumbel_unats"] for r in sel}) == 6


def test_distribution_fit_is_one_driver_action(spark, monkeypatch):
    """Round-12 ADVICE pin: bucket_log_ratio folds BOTH scalar totals
    (target + pool feature counts) into a single collect — one driver
    action, same discipline as pagerank's delta fold. Scores stay
    bit-identical (the pure-Python parity above already pins that)."""
    from pyspark.sql.classic.dataframe import DataFrame

    calls = []
    orig = DataFrame.collect

    def counted(self):
        calls.append(1)
        return orig(self)

    monkeypatch.setattr(DataFrame, "collect", counted)
    raw, tgt = _frames(spark)
    dsir_log_weights(raw, tgt, buckets=512)  # plan builds → fit collects
    assert len(calls) == 1
