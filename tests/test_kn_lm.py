"""Kneser–Ney bigram LM (functions/lm.py): the discount algebra is
PROPER (per-context probabilities sum to exactly 1 with no
truncation), the Spark scorer matches a pure-Python KN reference
per document, the continuation distribution shows the classic
"Francisco" effect (many-contexts beats high-frequency), and the
family edge cases (empty docs, determinism, truncation deficiency)."""

from __future__ import annotations

import math
import re

import pytest
from pyspark.sql import functions as F

from etl_data_lake_spark.functions.lm import (
    KnBigramModel,
    kn_bigram_perplexity_score,
    train_kn_bigram_lm,
)

REF_TEXTS = [
    "the cat sat on the mat",
    "the dog sat on the rug",
    "a cat and a dog met in the park",
    "the mat and the rug are in the park",
    "san francisco is in the west",
    "san francisco has the fog",
    "a mat lay in the fog",
]


def _toks(text):
    return [t for t in re.split(r"\s+", text.strip(" ")) if t != ""]


def _py_kn(texts, vocab_size=50_000, alpha=1.0):
    """Pure-Python twin of train_kn_bigram_lm + scorer."""
    UNK = "\x00unk"
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

    pair_c: dict[tuple[str, str], int] = {}
    for t in texts:
        mapped = [w if w in vset else UNK for w in _toks(t)]
        for a, b in zip(mapped, mapped[1:]):
            pair_c[(a, b)] = pair_c.get((a, b), 0) + 1
    n1 = sum(1 for c in pair_c.values() if c == 1)
    n2 = sum(1 for c in pair_c.values() if c == 2)
    D = n1 / (n1 + 2.0 * n2) if (n1 + n2) > 0 else 0.5
    D = min(max(D, 1e-6), 1 - 1e-6)
    c1: dict[str, int] = {}
    nf: dict[str, int] = {}
    npre: dict[str, int] = {}
    for (a, b), c in pair_c.items():
        c1[a] = c1.get(a, 0) + c
        nf[a] = nf.get(a, 0) + 1
        npre[b] = npre.get(b, 0) + 1
    denom = len(pair_c) + alpha * (V + 1)
    p_cont = {w: (npre.get(w, 0) + alpha) / denom for w in npre}
    floor = alpha / denom

    def score(doc):
        mapped = [w if w in vset else UNK for w in _toks(doc)]
        lps = []
        for i, w in enumerate(mapped):
            if i == 0:
                lps.append(uni.get(w, oov_logp) if w != UNK else oov_logp)
                continue
            v = mapped[i - 1]
            pd = (
                max(pair_c.get((v, w), 0) - D, 0.0) / c1[v]
                if v in c1
                else 0.0
            )
            lam = D * nf[v] / c1[v] if v in c1 else 1.0
            lps.append(math.log(pd + lam * p_cont.get(w, floor)))
        if not lps:
            return 0, None
        return len(lps), math.exp(-sum(lps) / len(lps))

    return {
        "uni": uni, "oov": oov_logp, "D": D, "pair": pair_c,
        "c1": c1, "nf": nf, "p_cont": p_cont, "floor": floor,
        "score": score, "V": V,
    }


@pytest.fixture(scope="module")
def model(spark):
    ref = spark.createDataFrame(
        [(i, t) for i, t in enumerate(REF_TEXTS)], "doc_id long, text string"
    )
    return train_kn_bigram_lm(ref, vocab_size=50_000, alpha=1.0)


def test_model_is_proper_per_context(spark, model):
    """Σ_w P_KN(w|v) over vocab+UNK == 1 exactly (float tolerance)
    for EVERY seen context — the discount algebra's defining check."""
    pair = {
        (r["w1"], r["w2"]): r["p_disc"]
        for r in model.pair_model.collect()
    }
    ctx = {r["w1"]: r["backoff"] for r in model.ctx_model.collect()}
    cont = {r["w2"]: r["p_cont"] for r in model.cont_model.collect()}
    vocab = [r["term"] for r in model.uni_model.collect()] + ["\x00unk"]
    for v, lam in ctx.items():
        total = 0.0
        for w in vocab:
            total += pair.get((v, w), 0.0) + lam * cont.get(
                w, model.cont_floor
            )
        assert abs(total - 1.0) < 1e-9, v


def test_scorer_matches_pure_python(spark, model):
    py = _py_kn(REF_TEXTS)
    assert abs(py["D"] - model.discount) < 1e-12
    assert abs(py["floor"] - model.cont_floor) < 1e-12
    docs = [
        (0, "the cat sat on the rug"),
        (1, "san francisco is the fog"),
        (2, "zeppelin quantum never seen words"),
        (3, "park the in met dog"),
        (4, ""),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["perplexity"])
        for r in kn_bigram_perplexity_score(df, model).collect()
    }
    for doc_id, text in docs:
        n, ppl = py["score"](text)
        assert got[doc_id][0] == n, doc_id
        if ppl is None:
            assert got[doc_id][1] is None
        else:
            assert abs(got[doc_id][1] - ppl) < 1e-9 * max(ppl, 1), doc_id


def test_francisco_effect(spark, model):
    """'francisco' only ever follows 'san' (one distinct context);
    'mat' follows both 'the' and 'a' — continuation probability ranks
    mat above francisco because KN counts CONTEXTS, not tokens."""
    cont = {r["w2"]: r["p_cont"] for r in model.cont_model.collect()}
    assert cont["mat"] > cont["francisco"]


def test_in_domain_scores_better_than_word_salad(spark, model):
    docs = spark.createDataFrame(
        [
            (0, "the cat sat on the mat"),
            (1, "mat the on sat cat the"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["perplexity"]
        for r in kn_bigram_perplexity_score(docs, model).collect()
    }
    assert got[0] < got[1]


def test_training_deterministic(spark):
    ref = spark.createDataFrame(
        [(i, t) for i, t in enumerate(REF_TEXTS)], "doc_id long, text string"
    )
    a = train_kn_bigram_lm(ref)
    b = train_kn_bigram_lm(ref)

    def rows(df):
        return sorted(map(tuple, df.collect()))

    assert rows(a.pair_model) == rows(b.pair_model)
    assert rows(a.ctx_model) == rows(b.ctx_model)
    assert rows(a.cont_model) == rows(b.cont_model)
    assert a.discount == b.discount


def test_truncation_is_deficient_not_improper(spark):
    """Dropping pairs via max_bigrams can only LOWER per-context
    sums (never exceed 1): the dropped mass is lost, not
    redistributed wrongly."""
    ref = spark.createDataFrame(
        [(i, t) for i, t in enumerate(REF_TEXTS)], "doc_id long, text string"
    )
    m = train_kn_bigram_lm(ref, max_bigrams=5)
    assert isinstance(m, KnBigramModel)
    pair = {(r["w1"], r["w2"]): r["p_disc"] for r in m.pair_model.collect()}
    assert len(pair) == 5
    ctx = {r["w1"]: r["backoff"] for r in m.ctx_model.collect()}
    cont = {r["w2"]: r["p_cont"] for r in m.cont_model.collect()}
    vocab = [r["term"] for r in m.uni_model.collect()] + ["\x00unk"]
    for v, lam in ctx.items():
        total = sum(
            pair.get((v, w), 0.0) + lam * cont.get(w, m.cont_floor)
            for w in vocab
        )
        assert total <= 1.0 + 1e-9, v


def test_empty_reference_rejected(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    with pytest.raises(ValueError, match="at least one adjacent"):
        train_kn_bigram_lm(
            spark.createDataFrame([(0, "single")], "doc_id long, text string")
        )
    with pytest.raises(Exception):
        train_kn_bigram_lm(empty)


def test_lm_persistence_roundtrip_bit_identical(spark, model, tmp_path):
    """Loaded models score BIT-identically to trained ones for every
    flavor, re-saves are byte-identical, foreign files rejected —
    tokenizer_io's contract extended to LMs."""
    from etl_data_lake_spark.functions.lm import (
        bigram_perplexity_score,
        perplexity_score,
        train_bigram_lm,
        train_unigram_lm,
    )
    from etl_data_lake_spark.functions.lm_io import (
        load_lm,
        save_bigram_lm,
        save_kn_lm,
        save_unigram_lm,
    )

    ref = spark.createDataFrame(
        [(i, t) for i, t in enumerate(REF_TEXTS)], "doc_id long, text string"
    )
    docs = spark.createDataFrame(
        [(0, "the cat sat on the rug"), (1, "san francisco is the fog")],
        "doc_id long, text string",
    )

    def rows(df):
        return sorted(map(tuple, df.collect()))

    # unigram
    u_model, u_oov = train_unigram_lm(ref)
    p = str(tmp_path / "uni.json")
    save_unigram_lm(p, u_model, u_oov)
    kind, (lu, loov) = load_lm(spark, p)
    assert kind == "unigram" and loov == u_oov
    assert rows(perplexity_score(docs, lu, loov)) == rows(
        perplexity_score(docs, u_model, u_oov)
    )
    save_unigram_lm(str(tmp_path / "uni2.json"), lu, loov)
    assert (tmp_path / "uni.json").read_bytes() == (
        tmp_path / "uni2.json"
    ).read_bytes()

    # JM bigram
    ju, joov, jb = train_bigram_lm(ref)
    pj = str(tmp_path / "jm.json")
    save_bigram_lm(pj, ju, joov, jb)
    kind, (lju, ljoov, ljb) = load_lm(spark, pj)
    assert kind == "bigram_jm"
    assert rows(bigram_perplexity_score(docs, lju, ljoov, ljb)) == rows(
        bigram_perplexity_score(docs, ju, joov, jb)
    )

    # KN
    pk = str(tmp_path / "kn.json")
    save_kn_lm(pk, model)
    kind, lkn = load_lm(spark, pk)
    assert kind == "bigram_kn"
    assert lkn.discount == model.discount
    assert lkn.cont_floor == model.cont_floor
    assert rows(kn_bigram_perplexity_score(docs, lkn)) == rows(
        kn_bigram_perplexity_score(docs, model)
    )

    # foreign / corrupt rejection
    (tmp_path / "foreign.json").write_text('{"format": "other"}')
    with pytest.raises(ValueError, match="not an"):
        load_lm(spark, str(tmp_path / "foreign.json"))
    import json

    bad = json.loads((tmp_path / "kn.json").read_text())
    bad["version"] = 99
    (tmp_path / "v99.json").write_text(json.dumps(bad))
    with pytest.raises(ValueError, match="version"):
        load_lm(spark, str(tmp_path / "v99.json"))
    bad["version"] = 1
    bad["type"] = "trigram"
    (tmp_path / "t.json").write_text(json.dumps(bad))
    with pytest.raises(ValueError, match="unknown"):
        load_lm(spark, str(tmp_path / "t.json"))
