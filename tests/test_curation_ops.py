"""Training-data curation operators: deterministic sampling/mixing
(operators/sampling.py), sequence packing (operators/packing.py),
TF-IDF / BM25 relevance (functions/relevance.py)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from etl_data_lake_spark.functions.relevance import (
    bm25_score,
    term_doc_table,
    tfidf,
)
from etl_data_lake_spark.operators.packing import pack_sequences, packing_stats
from etl_data_lake_spark.operators.sampling import (
    _RING as _SAMPLING_RING,
    mix_sources,
    mixture_rates,
    normalize_weights,
    resample_to_mixture,
    sample_deterministic,
    split_deterministic,
    stratified_sample_deterministic,
)


@pytest.fixture(scope="module")
def ids(spark):
    return spark.range(0, 10_000).select(
        F.col("id"), F.concat(F.lit("k"), F.col("id")).alias("key")
    )


# ----------------------------------------------------------- sampling --


def test_sample_fraction_and_determinism(spark, ids):
    s = sample_deterministic(ids, 0.25, ("key",))
    n = s.count()
    assert abs(n / 10_000 - 0.25) < 0.02
    # pure function of content: same rows again, and same rows after
    # an arbitrary repartition
    again = sample_deterministic(ids.repartition(7), 0.25, ("key",))
    assert s.select("id").exceptAll(again.select("id")).count() == 0
    assert again.count() == n


def test_samples_nest_across_fractions(spark, ids):
    small = sample_deterministic(ids, 0.1, ("key",))
    big = sample_deterministic(ids, 0.3, ("key",))
    assert small.join(big, "id", "left_anti").count() == 0  # small ⊆ big


def test_split_disjoint_exhaustive(spark, ids):
    parts = split_deterministic(
        ids, {"train": 0.8, "val": 0.1, "test": 0.1}, ("key",)
    )
    counts = {k: v.count() for k, v in parts.items()}
    assert sum(counts.values()) == 10_000  # exhaustive
    assert parts["train"].join(parts["val"], "id", "inner").count() == 0
    assert parts["train"].join(parts["test"], "id", "inner").count() == 0
    assert abs(counts["train"] / 10_000 - 0.8) < 0.02


def test_split_weights_must_sum_to_one(spark, ids):
    with pytest.raises(ValueError):
        split_deterministic(ids, {"a": 0.5, "b": 0.4}, ("key",))


def test_stratified_fractions_per_group(spark, ids):
    strat = ids.withColumn(
        "src", F.when(F.col("id") % 2 == 0, "web").otherwise("books")
    )
    out = stratified_sample_deterministic(
        strat, {"web": 0.1, "books": 0.5}, "src", ("key",)
    )
    got = {
        r["src"]: r["n"]
        for r in out.groupBy("src").agg(F.count("*").alias("n")).collect()
    }
    assert abs(got["web"] / 5_000 - 0.1) < 0.03
    assert abs(got["books"] / 5_000 - 0.5) < 0.03
    # absent stratum would be dropped entirely
    none_kept = stratified_sample_deterministic(
        strat, {"web": 0.1}, "src", ("key",)
    )
    assert none_kept.where(F.col("src") == "books").count() == 0


def test_mix_sources_weights_and_tags(spark, ids):
    a = ids.withColumnRenamed("id", "doc_id")
    b = ids.withColumnRenamed("id", "doc_id")
    mixed = mix_sources(
        {"web": a, "books": b}, {"web": 0.2, "books": 0.6}, ("key",)
    )
    got = {
        r["source"]: r["n"]
        for r in mixed.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert abs(got["web"] / 10_000 - 0.2) < 0.02
    assert abs(got["books"] / 10_000 - 0.6) < 0.02


# ------------------------------------------------------------ mixture --


@pytest.fixture(scope="module")
def skewed_corpus(spark):
    # domain sizes 6000 / 3000 / 1000 — 'c' is the binding stratum for
    # targets {a:.2, b:.3, c:.5}: T = min(30000, 10000, 2000) = 2000
    return spark.range(0, 10_000).select(
        F.col("id"),
        F.when(F.col("id") < 6000, "a")
        .when(F.col("id") < 9000, "b")
        .otherwise("c")
        .alias("dom"),
    )


def test_mixture_hits_target_proportions(spark, skewed_corpus):
    kept = resample_to_mixture(
        skewed_corpus, {"a": 0.2, "b": 0.3, "c": 0.5}, "dom", ("id",)
    )
    got = {
        r["dom"]: r["n"]
        for r in kept.groupBy("dom").agg(F.count("*").alias("n")).collect()
    }
    # binding stratum keeps EVERYTHING (threshold = full ring)
    assert got["c"] == 1000
    # oversupplied strata thin to their share of T=2000, within hash
    # quantization noise
    assert abs(got["a"] - 400) < 40 and abs(got["b"] - 600) < 50


def test_mixture_deterministic_and_downsample_only(spark, skewed_corpus):
    targets = {"a": 0.2, "b": 0.3, "c": 0.5}
    kept = resample_to_mixture(skewed_corpus, targets, "dom", ("id",))
    again = resample_to_mixture(
        skewed_corpus.repartition(13), targets, "dom", ("id",)
    )
    assert kept.select("id").exceptAll(again.select("id")).count() == 0
    assert kept.count() == again.count()
    # never replicates: kept ⊆ input exactly once each
    assert kept.groupBy("id").count().where("count > 1").count() == 0
    assert kept.join(skewed_corpus, "id", "left_anti").count() == 0


def test_mixture_rates_binding_stratum_full_ring(spark, skewed_corpus):
    weights = normalize_weights({"a": 0.2, "b": 0.3, "c": 0.5})
    rates = {
        r["dom"]: (r["n_total"], r["ring_threshold"])
        for r in mixture_rates(
            skewed_corpus.where(F.col("dom").isin(list(weights))),
            weights,
            "dom",
        ).collect()
    }
    assert rates["c"] == (1000, _SAMPLING_RING)
    assert rates["a"][1] < _SAMPLING_RING // 2  # keep ≈ 400/6000


def test_mixture_absent_target_stratum_does_not_constrain(
    spark, skewed_corpus
):
    # a target stratum with zero corpus rows neither zeroes the result
    # nor shifts the present strata's relative proportions
    with_ghost = resample_to_mixture(
        skewed_corpus,
        {"a": 0.2, "b": 0.3, "c": 0.5, "ghost": 0.5},
        "dom",
        ("id",),
    )
    without = resample_to_mixture(
        skewed_corpus, {"a": 0.2, "b": 0.3, "c": 0.5}, "dom", ("id",)
    )
    assert (
        with_ghost.select("id").exceptAll(without.select("id")).count() == 0
    )
    assert with_ghost.count() == without.count()


def test_mixture_weight_validation():
    with pytest.raises(ValueError, match="empty"):
        normalize_weights({})
    with pytest.raises(ValueError, match="non-positive"):
        normalize_weights({"a": 0.5, "b": 0.0})
    got = normalize_weights({"a": 1.0, "b": 3.0})
    assert got == {"a": 0.25, "b": 0.75}


# ------------------------------------------------------------ packing --


@pytest.fixture(scope="module")
def sized_docs(spark):
    # 2000 docs, 10..250 tokens, plus two oversize outliers
    base = spark.range(0, 2000).select(
        F.concat(F.lit("d"), F.col("id")).alias("doc_id"),
        (F.pmod(F.xxhash64("id"), F.lit(241)) + 10).alias("n_tokens"),
    )
    big = spark.createDataFrame(
        [("big1", 5000), ("big2", 9001)], "doc_id string, n_tokens long"
    )
    return base.unionByName(big)


def test_pack_budget_never_exceeded(spark, sized_docs):
    packed = pack_sequences(sized_docs, "n_tokens", budget=512)
    per_pack = packed.groupBy("pack_id").agg(
        F.sum("n_tokens").alias("tot"), F.count("*").alias("n")
    )
    # the only over-budget packs are the two oversize docs, solo
    over = per_pack.where(F.col("tot") > 512).collect()
    assert sorted(r["n"] for r in over) == [1, 1]
    over_ids = packed.join(
        spark.createDataFrame(
            [(r["pack_id"],) for r in over], "pack_id string"
        ),
        "pack_id",
    )
    assert sorted(r["doc_id"] for r in over_ids.collect()) == ["big1", "big2"]


def test_pack_covers_all_docs_exactly_once(spark, sized_docs):
    packed = pack_sequences(sized_docs, "n_tokens", budget=512)
    assert packed.count() == sized_docs.count()
    assert packed.select("doc_id").distinct().count() == sized_docs.count()
    # pack_pos is 1..n within each pack
    bad_pos = (
        packed.groupBy("pack_id")
        .agg(F.max("pack_pos").alias("mx"), F.count("*").alias("n"))
        .where(F.col("mx") != F.col("n"))
    )
    assert bad_pos.count() == 0


def test_pack_deterministic_and_well_utilized(spark, sized_docs):
    a = pack_sequences(sized_docs, "n_tokens", budget=512)
    b = pack_sequences(sized_docs.repartition(13), "n_tokens", budget=512)
    assert (
        a.select("doc_id", "pack_id")
        .exceptAll(b.select("doc_id", "pack_id"))
        .count()
        == 0
    )
    stats = packing_stats(
        a.where(~F.col("doc_id").isin("big1", "big2")), "n_tokens", 512
    ).collect()[0]
    # mean doc ~130 tokens → expected utilization ≈ 1 − 130/1024 ≈ .87
    assert stats["utilization"] > 0.75
    assert stats["n_overflow_packs"] == 0


# ---------------------------------------------------------- relevance --


@pytest.fixture(scope="module")
def tiny_corpus(spark):
    rows = [
        ("d1", "apple banana apple"),
        ("d2", "banana cherry"),
        ("d3", "cherry cherry cherry durian"),
        ("d4", "apple durian"),
    ]
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_term_doc_table_counts(spark, tiny_corpus):
    td = {
        (r["doc_id"], r["term"]): (r["tf"], r["dl"])
        for r in term_doc_table(tiny_corpus).collect()
    }
    assert td[("d1", "apple")] == (2, 3)
    assert td[("d3", "cherry")] == (3, 4)
    assert ("d2", "apple") not in td


def test_tfidf_matches_hand_computation(spark, tiny_corpus):
    got = {
        (r["doc_id"], r["term"]): r["tfidf"]
        for r in tfidf(term_doc_table(tiny_corpus)).collect()
    }
    # N=4; df(apple)=2 → idf = ln(5/3)+1; tf(d1,apple)=2
    expect = 2 * (math.log(5 / 3) + 1)
    assert got[("d1", "apple")] == pytest.approx(expect, rel=1e-9)
    # df(banana)=2, tf(d2,banana)=1
    assert got[("d2", "banana")] == pytest.approx(
        math.log(5 / 3) + 1, rel=1e-9
    )


def test_bm25_hand_computed_ranking(spark, tiny_corpus):
    got = bm25_score(tiny_corpus, ["cherry"], limit=4).collect()
    # hand-compute: N=4, df(cherry)=2 → idf = ln(1 + 2.5/2.5) = ln 2
    # avgdl = (3+2+4+2)/4 = 2.75; k1=1.2, b=0.75
    def s(tf, dl):
        return (
            math.log(2.0)
            * tf
            * 2.2
            / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / 2.75))
        )

    expect = {"d3": s(3, 4), "d2": s(1, 2)}
    assert [r["doc_id"] for r in got] == ["d3", "d2"]
    for r in got:
        assert r["score"] == pytest.approx(expect[r["doc_id"]], rel=1e-9)


def test_bm25_multi_term_and_scale_smoke(spark):
    from etl_data_lake_spark.sources.catalog import load_table
    from tests.conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents")
    top = bm25_score(docs, ["the", "data"], limit=5)
    rows = top.collect()
    assert 0 < len(rows) <= 5
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_mixture_reported_rates_are_the_rates_applied(spark, skewed_corpus):
    """normalize_weights is NOT idempotent in floats: re-normalizing
    an already-normalized dict can move a quantized threshold by one
    ring unit. Passing the rates frame into resample_to_mixture
    guarantees the thresholds REPORTED are the thresholds APPLIED
    (review regression: the catalog entry reported one frame and
    filtered with another)."""
    from etl_data_lake_spark.operators.sampling import _bucket

    weights = normalize_weights({"a": 4.0, "b": 3.0, "c": 2.0})
    d = skewed_corpus.where(F.col("dom").isin(sorted(weights)))
    rates = mixture_rates(d, weights, "dom")
    kept = resample_to_mixture(
        skewed_corpus, weights, "dom", ("id",), rates=rates
    )
    thr = {r["dom"]: r["ring_threshold"] for r in rates.collect()}
    checked = kept.withColumn("b", _bucket(("id",), 42)).collect()
    assert checked and all(r["b"] < thr[r["dom"]] for r in checked)


def test_token_weighted_mixture(spark):
    """size_col= solves the mixture over TOKEN MASS: the mass-binding
    stratum keeps its full ring even when it has more ROWS, and the
    kept token mass lands on the target proportions."""
    from etl_data_lake_spark.operators.sampling import (
        mixture_rates,
        normalize_weights,
        resample_to_mixture,
    )

    rows = [(f"a{i}", "web", 20) for i in range(500)]
    rows += [(f"b{i}", "code", 4) for i in range(500)]  # mass-binding
    df = spark.createDataFrame(rows, "doc_id string, source string, n_tok int")
    targets = {"web": 0.5, "code": 0.5}
    w = normalize_weights(targets)
    rates = {
        r["source"]: (r["n_total"], r["ring_threshold"])
        for r in mixture_rates(df, w, "source", size_col="n_tok").collect()
    }
    # masses: web 10000, code 2000 → T = 4000; keep web 0.2, code 1.0
    assert rates["web"][0] == 10000.0 and rates["code"][0] == 2000.0
    assert rates["code"][1] == 1 << 20  # binding stratum: full ring
    assert rates["web"][1] == int(__import__("math").ceil(0.2 * (1 << 20)))

    out = resample_to_mixture(
        df, targets, "source", ("doc_id",), size_col="n_tok"
    )
    mass = {
        r["source"]: r["m"]
        for r in out.groupBy("source")
        .agg(F.sum("n_tok").alias("m"))
        .collect()
    }
    assert mass["code"] == 2000  # binding stratum fully kept
    # hash-thinned web mass ≈ 2000 (binomial tolerance)
    assert 1500 <= mass["web"] <= 2500
    # deterministic under layout
    again = resample_to_mixture(
        df.repartition(13), targets, "source", ("doc_id",),
        size_col="n_tok",
    )
    assert sorted(r["doc_id"] for r in again.collect()) == sorted(
        r["doc_id"] for r in out.collect()
    )
    # row-count mode unchanged: same call without size_col solves on
    # rows (equal row counts → both strata keep everything)
    rows_mode = resample_to_mixture(df, targets, "source", ("doc_id",))
    assert rows_mode.count() == 1000


# ------------------------------------ leakage-safe split (round 9) --


def test_split_leakage_safe_coassigns_near_dups(spark):
    """Every near-dup pair lands on ONE side of the split; the union
    is exhaustive and disjoint; isolated docs split like
    split_deterministic at the same seed."""
    from etl_data_lake_spark.operators.sampling import (
        split_deterministic,
        split_leakage_safe,
    )

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(400)], "doc_id long, text string"
    )
    # 100 near-dup pairs chaining into 50 clusters of 4: (4k, 4k+1),
    # (4k+1, 4k+2), (4k+2, 4k+3) for k in 0..49 → docs 0..199
    # clustered, 200..399 isolated
    pairs = spark.createDataFrame(
        [
            (4 * k + a, 4 * k + a + 1)
            for k in range(50)
            for a in range(3)
        ],
        "doc_a long, doc_b long",
    )
    weights = {"train": 0.8, "test": 0.2}
    splits = split_leakage_safe(docs, pairs, weights)
    side = {}
    for name, frame in splits.items():
        for r in frame.collect():
            assert r.doc_id not in side  # disjoint
            side[r.doc_id] = name
    assert len(side) == 400  # exhaustive
    # co-assignment: all 4 members of every cluster share a side
    for k in range(50):
        sides = {side[4 * k + a] for a in range(4)}
        assert len(sides) == 1, (k, sides)
    # both sides are populated (clusters didn't all fall one way)
    assert set(side.values()) == {"train", "test"}
    # isolated docs match the plain per-doc split exactly
    plain = split_deterministic(docs, weights, ("doc_id",))
    for name, frame in plain.items():
        for r in frame.where("doc_id >= 200").collect():
            assert side[r.doc_id] == name
    # a per-doc split WOULD leak for these clusters (the hazard)
    leaked = 0
    plain_side = {}
    for name, frame in plain.items():
        for r in frame.collect():
            plain_side[r.doc_id] = name
    for k in range(50):
        if len({plain_side[4 * k + a] for a in range(4)}) > 1:
            leaked += 1
    assert leaked > 0  # the plain split does split clusters apart


def test_split_leakage_safe_validation_and_determinism(spark):
    from etl_data_lake_spark.operators.sampling import split_leakage_safe

    docs = spark.createDataFrame(
        [(i, "t") for i in range(40)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(0, 1), (2, 3)], "doc_a long, doc_b long"
    )
    w = {"train": 0.5, "test": 0.5}
    one = {
        n: sorted(r.doc_id for r in f.collect())
        for n, f in split_leakage_safe(docs, pairs, w).items()
    }
    two = {
        n: sorted(r.doc_id for r in f.collect())
        for n, f in split_leakage_safe(
            docs.repartition(7), pairs, w
        ).items()
    }
    assert one == two  # layout invariance
    import pytest as _pytest

    with _pytest.raises(ValueError, match="cluster_id"):
        split_leakage_safe(
            docs.withColumn("cluster_id", F.lit(1)), pairs, w
        )


def test_temperature_mixture_weights(spark):
    """Round-12: the XLM-R/mT5 exponential-smoothing recipe — α=1 is
    proportional, smaller α flattens toward uniform monotonically, and
    the output composes with resample_to_mixture (the low-resource
    stratum's SHARE rises after temperature resampling)."""
    import pytest as _pytest

    from etl_data_lake_spark.operators.sampling import (
        resample_to_mixture,
        temperature_mixture_weights,
    )

    sizes = {"en": 8000.0, "fr": 1500.0, "sw": 500.0}
    w1 = temperature_mixture_weights(sizes, alpha=1.0)
    assert abs(w1["en"] - 0.8) < 1e-12  # α=1 ⇒ proportional
    w03 = temperature_mixture_weights(sizes, alpha=0.3)
    w01 = temperature_mixture_weights(sizes, alpha=0.1)
    # flattening is monotone in α: low-resource share grows as α drops
    assert w1["sw"] < w03["sw"] < w01["sw"] < 1 / 3
    assert w1["en"] > w03["en"] > w01["en"] > 1 / 3
    for w in (w1, w03, w01):
        assert abs(sum(w.values()) - 1.0) < 1e-12
    with _pytest.raises(ValueError, match="alpha"):
        temperature_mixture_weights(sizes, alpha=0.0)
    with _pytest.raises(ValueError, match="non-positive"):
        temperature_mixture_weights({"en": 0.0})

    # composition: resampling to the α=0.3 targets raises the
    # low-resource stratum's share above its raw share
    rows = (
        [(i, "en") for i in range(800)]
        + [(i + 10_000, "fr") for i in range(150)]
        + [(i + 20_000, "sw") for i in range(50)]
    )
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = resample_to_mixture(
        df, temperature_mixture_weights(
            {k: float(v) for k, v in
             {r["lang"]: r["n"] for r in
              df.groupBy("lang").agg(F.count("*").alias("n")).collect()
              }.items()},
            alpha=0.3,
        ),
        "lang", ("doc_id",),
    )
    n = out.count()
    sw_share = out.where(F.col("lang") == "sw").count() / n
    assert sw_share > 50 / 1000  # raw share was 5%
