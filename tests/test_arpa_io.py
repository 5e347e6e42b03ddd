"""ARPA import (functions/lm_io.py, round 11): load_arpa parses the
interchange format liberally-but-loudly, and arpa_perplexity_score's
in-plan standard backoff evaluation reproduces the exported KN tower
— closing the loop save_arpa opened (export pinned by an independent
evaluator in test_kn_trigram; here the IMPORTED model scores a corpus
and must equal the tower's own arithmetic)."""

from __future__ import annotations

import math

import pytest

from etl_data_lake_spark.functions.lm import train_kn_trigram_lm
from etl_data_lake_spark.functions.lm_io import (
    arpa_perplexity_score,
    load_arpa,
    save_arpa,
)
from tests.test_kn_trigram import REF_TEXTS, UNK, _py_kn3, _toks


@pytest.fixture(scope="module")
def arpa_model(spark, tmp_path_factory):
    ref = spark.createDataFrame(
        [(i, t) for i, t in enumerate(REF_TEXTS)], "doc_id long, text string"
    )
    m = train_kn_trigram_lm(ref, vocab_size=50_000, alpha=1.0)
    path = str(tmp_path_factory.mktemp("arpa") / "model.arpa")
    save_arpa(path, m)
    return load_arpa(path)


def _expected_ppl(text, py):
    """The ARPA-convention expectation: first token scores under the
    1-gram section (= the continuation distribution), later tokens
    under the tower's conditional cascade."""
    toks = _toks(text)
    lps = []
    # map OOV through UNK exactly like the trainers
    vocab = set()
    for t in REF_TEXTS:
        vocab.update(_toks(t))
    mapped = [w if w in vocab else UNK for w in toks]
    for i, w in enumerate(mapped):
        if i == 0:
            lps.append(math.log(py["pc"](w)))
        elif i == 1:
            lps.append(math.log(py["pmid"](mapped[0], w)))
        else:
            lps.append(math.log(py["ptri"](mapped[i - 2], mapped[i - 1], w)))
    if not lps:
        return 0, None
    return len(lps), math.exp(-sum(lps) / len(lps))


def test_imported_arpa_scores_equal_the_tower(spark, arpa_model):
    py = _py_kn3(REF_TEXTS)
    docs = [
        (0, "the cat sat on the rug"),
        (1, "san francisco is in the fog"),
        (2, "zeppelin quantum never seen words here"),
        (3, "the cat"),
        (4, "fog"),
        (5, ""),
    ]
    got = {
        r["doc_id"]: (r["n_tokens"], r["perplexity"])
        for r in arpa_perplexity_score(
            spark.createDataFrame(docs, "doc_id long, text string"),
            arpa_model,
        ).collect()
    }
    for i, text in docs:
        n, p = _expected_ppl(text, py)
        assert got[i][0] == n, text
        if p is None:
            assert got[i][1] is None
        else:
            assert abs(got[i][1] - p) / p < 1e-6, (text, got[i][1], p)


def test_hand_written_arpa_parses_and_scores(spark, tmp_path):
    """A minimal foreign-tool-style file: space-separated, missing
    trailing bows, out-of-order sections — parsed correctly and
    scored by the standard rule (hand-computed)."""
    body = "\n".join(
        [
            "\\data\\",
            "ngram 1=3",
            "ngram 2=2",
            "",
            "\\2-grams:",
            "-0.30103\ta b\t-0.60206",
            "-0.69897\tb a",
            "",
            "\\1-grams:",
            "-0.47712\ta\t-0.17609",
            "-0.47712\tb",
            "-1.0\t<unk>",
            "",
            "\\end\\",
            "",
        ]
    )
    p = tmp_path / "mini.arpa"
    p.write_text(body)
    m = load_arpa(str(p))
    assert m.order == 2 and len(m.unigrams) == 3
    docs = spark.createDataFrame(
        [(0, "a b"), (1, "a zzz")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["avg_neg_logp"]
        for r in arpa_perplexity_score(docs, m).collect()
    }
    ln10 = math.log(10.0)
    # doc 0: lp(a) = -0.47712 ; lp(b|a) stored = -0.30103
    want0 = -((-0.47712 + -0.30103) * ln10) / 2
    # doc 1: lp(a) ; zzz → <unk>, (a, <unk>) unstored → bow(a) + lp1(<unk>)
    want1 = -((-0.47712 + (-0.17609 + -1.0)) * ln10) / 2
    assert abs(got[0] - want0) < 1e-9
    assert abs(got[1] - want1) < 1e-9


def test_load_arpa_validation(tmp_path):
    notarpa = tmp_path / "x.txt"
    notarpa.write_text("hello world\n")
    with pytest.raises(ValueError, match="data"):
        load_arpa(str(notarpa))
    truncated = tmp_path / "t.arpa"
    truncated.write_text(
        "\\data\\\nngram 1=5\n\n\\1-grams:\n-1.0\ta\n\\end\\\n"
    )
    with pytest.raises(ValueError, match="truncated|corrupt"):
        load_arpa(str(truncated))
    # a declared order with no rows at all is the same corruption
    high = tmp_path / "h.arpa"
    high.write_text("\\data\\\nngram 4=1\n")
    with pytest.raises(ValueError, match="truncated|corrupt"):
        load_arpa(str(high))
    # backoff terminates at the unigrams — a file without them can't score
    nouni = tmp_path / "n.arpa"
    nouni.write_text(
        "\\data\\\nngram 2=1\n\n\\2-grams:\n-1.0\ta b\n\\end\\\n"
    )
    with pytest.raises(ValueError, match="1-grams"):
        load_arpa(str(nouni))


def test_multidigit_section_headers_parse_fully(tmp_path):
    """Round-12 regression (r11 ADVICE): '\\10-grams:' used to be read
    as int(line[1]) == section 1, silently merging ten-gram rows into
    the unigram table. The full digit run must parse."""
    ten = " ".join("a" * 1 for _ in range(10))
    body = (
        "\\data\\\nngram 1=2\nngram 10=1\n\n"
        "\\1-grams:\n-1.0\ta\t-0.5\n-2.0\t<unk>\n\n"
        f"\\10-grams:\n-3.0\t{ten}\n\n\\end\\\n"
    )
    p = tmp_path / "ten.arpa"
    p.write_text(body)
    m = load_arpa(str(p))
    assert m.order == 10
    assert set(m.unigrams) == {"a", "<unk>"}  # NOT polluted
    assert m.grams[10][tuple(["a"] * 10)] == (-3.0, 0.0)
    bad = tmp_path / "bad.arpa"
    bad.write_text("\\data\\\nngram 1=1\n\n\\x-grams:\n-1.0\ta\n\\end\\\n")
    with pytest.raises(ValueError, match="section header"):
        load_arpa(str(bad))


# ---------------------------------------------------------------------------
# order-5 (round 12): the standard public perplexity-filter artifact is
# a KenLM 5-gram .arpa; load_arpa + arpa_perplexity_score must handle it
# with the uniform backoff recursion. The independent evaluator below
# implements that recursion in pure Python for ANY order (depth-4
# backoff paths at order 5) — the Spark plan must match it exactly.
# ---------------------------------------------------------------------------


def _py_arpa_lp(m, ctx, w):
    """log10 P(w | ctx) by the standard ARPA rule, any order."""
    n = len(ctx) + 1
    key = w if n == 1 else (*ctx, w)
    hit = m.grams.get(n, {}).get(key)
    if hit is not None:
        return hit[0]
    if not ctx:
        raise AssertionError(f"unigram missing for {w!r}")
    ckey = ctx[0] if len(ctx) == 1 else tuple(ctx)
    centry = m.grams.get(len(ctx), {}).get(ckey)
    bow = centry[1] if centry is not None else 0.0
    return bow + _py_arpa_lp(m, ctx[1:], w)


def _py_arpa_ppl(m, text, unk="<unk>"):
    import math as _math

    toks = [t for t in text.split() if t]
    mapped = [t if t in m.unigrams else unk for t in toks]
    lps = []
    for i, w in enumerate(mapped):
        ctx = tuple(mapped[max(0, i - (m.order - 1)) : i])
        lps.append(_py_arpa_lp(m, ctx, w) * _math.log(10.0))
    if not lps:
        return 0, None, None
    avg = -sum(lps) / len(lps)
    return len(lps), avg, _math.exp(avg)


def _write_arpa(path, grams):
    """Serialize {n: {key: (lp, bow)}} as a well-formed ARPA file."""
    lines = ["\\data\\"]
    order = max(grams)
    for n in range(1, order + 1):
        lines.append(f"ngram {n}={len(grams.get(n, {}))}")
    lines.append("")
    for n in range(1, order + 1):
        lines.append(f"\\{n}-grams:")
        for key, (lp, bow) in sorted(grams.get(n, {}).items()):
            ws = key if n == 1 else " ".join(key)
            tail = f"\t{bow:.6f}" if (n < order and bow != 0.0) else ""
            lines.append(f"{lp:.6f}\t{ws}{tail}")
        lines.append("")
    lines.append("\\end\\")
    path.write_text("\n".join(lines) + "\n")


@pytest.fixture(scope="module")
def arpa5(tmp_path_factory):
    """A seeded random order-5 model over a 6-word vocab: dense enough
    that stored hits happen, sparse enough that every backoff depth
    (5→4→3→2→1) is exercised."""
    import random

    rng = random.Random(12)
    vocab = ["a", "b", "c", "d", "e", "<unk>"]
    grams = {1: {w: (-rng.uniform(0.3, 2.0), -rng.uniform(0.05, 0.8))
                 for w in vocab}}
    for n in range(2, 6):
        tbl = {}
        for _ in range(40):
            key = tuple(rng.choice(vocab) for _ in range(n))
            bow = -rng.uniform(0.05, 0.8) if n < 5 else 0.0
            tbl[key] = (-rng.uniform(0.3, 3.0), bow)
        grams[n] = tbl
    p = tmp_path_factory.mktemp("arpa5") / "model5.arpa"
    _write_arpa(p, grams)
    return load_arpa(str(p))


def test_order5_scores_match_pure_python(spark, arpa5):
    import random

    assert arpa5.order == 5
    rng = random.Random(99)
    vocab = ["a", "b", "c", "d", "e", "zzz-oov"]
    docs = [(i, " ".join(rng.choice(vocab)
                         for _ in range(rng.randint(0, 12))))
            for i in range(40)]
    got = {
        r["doc_id"]: (r["n_tokens"], r["perplexity"])
        for r in arpa_perplexity_score(
            spark.createDataFrame(docs, "doc_id long, text string"), arpa5
        ).collect()
    }
    deep_backoffs = 0
    for i, text in docs:
        n, _, ppl = _py_arpa_ppl(arpa5, text)
        assert got[i][0] == n, text
        if ppl is None:
            assert got[i][1] is None
        else:
            assert abs(got[i][1] - ppl) / ppl < 1e-9, (text, got[i][1], ppl)
        # count tokens whose 5-gram AND 4-gram probes both miss
        toks = [t if t in arpa5.unigrams else "<unk>"
                for t in text.split() if t]
        for k in range(4, len(toks)):
            full = tuple(toks[k - 4 : k + 1])
            if full not in arpa5.grams[5] and full[1:] not in arpa5.grams[4]:
                deep_backoffs += 1
    assert deep_backoffs > 0, "fixture never exercised depth≥2 backoff"


def test_order5_each_backoff_depth_hand_checked(spark, tmp_path):
    """One hand-written order-5 file where each scored token lands at a
    KNOWN depth: stored 5-gram, 5→4 with bow, 5→…→1 through missing
    contexts (bow=0), and OOV."""
    grams = {
        1: {"a": (-0.5, -0.1), "b": (-0.6, -0.2), "c": (-0.7, 0.0),
            "<unk>": (-1.5, 0.0)},
        2: {("a", "b"): (-0.3, -0.15), ("b", "c"): (-0.4, 0.0)},
        3: {("a", "b", "c"): (-0.25, -0.12)},
        4: {("a", "b", "c", "a"): (-0.2, -0.08)},
        5: {("a", "b", "c", "a", "b"): (-0.1, 0.0)},
    }
    p = tmp_path / "hand5.arpa"
    _write_arpa(p, grams)
    m = load_arpa(str(p))
    # doc: a b c a b c  — token-by-token depths:
    #  a: unigram; b: stored 2-gram; c: stored 3-gram; a: stored 4-gram;
    #  b: stored 5-gram; final c: (b,c,a,b,c) miss → bow(b,c,a,b)=0 miss
    #    → (c,a,b,c) miss → bow(c,a,b)=0 → (a,b,c) HIT at trigram
    ln10 = math.log(10.0)
    want_lps = [
        -0.5,                      # P(a)
        -0.3,                      # P(b|a) stored
        -0.25,                     # P(c|a b) stored
        -0.2,                      # P(a|a b c) stored
        -0.1,                      # P(b|a b c a) stored
        0.0 + 0.0 + (-0.25),       # depth-2 backoff to the trigram
    ]
    got = arpa_perplexity_score(
        spark.createDataFrame([(0, "a b c a b c")],
                              "doc_id long, text string"), m
    ).collect()[0]
    want_avg = -sum(lp * ln10 for lp in want_lps) / len(want_lps)
    assert got["n_tokens"] == 6
    assert abs(got["avg_neg_logp"] - want_avg) < 1e-9
    # and the generic evaluator agrees with the hand math
    n, avg, _ = _py_arpa_ppl(m, "a b c a b c")
    assert n == 6 and abs(avg - want_avg) < 1e-12


def test_scorer_requires_unk(spark, tmp_path):
    p = tmp_path / "nounk.arpa"
    p.write_text(
        "\\data\\\nngram 1=1\n\n\\1-grams:\n-1.0\ta\n\\end\\\n"
    )
    m = load_arpa(str(p))
    docs = spark.createDataFrame([(0, "a")], "doc_id long, text string")
    with pytest.raises(ValueError, match="<unk>"):
        arpa_perplexity_score(docs, m)


def test_whitespace_only_lines_are_skipped(spark, tmp_path):
    """Regression (round-11 self-review): a line of only spaces inside
    a section raised IndexError instead of the documented liberal
    skip."""
    body = (
        "\\data\\\nngram 1=2\n\n\\1-grams:\n-1.0\ta\n   \n"
        "-1.0\t<unk>\n\\end\\\n"
    )
    p = tmp_path / "ws.arpa"
    p.write_text(body)
    m = load_arpa(str(p))
    assert set(m.unigrams) == {"a", "<unk>"}


def test_missing_middle_order_backs_off_through_it(spark, tmp_path):
    """A file with 1-grams and 3-grams but NO 2-grams section (legal
    ARPA): the empty middle table means every bigram probe misses and
    its bow is 0, so P(w3|w1 w2) = stored trigram or backoff straight
    to bow1(w2) + P(w3)."""
    body = (
        "\\data\\\nngram 1=3\nngram 3=1\n\n"
        "\\1-grams:\n-0.5\ta\t-0.1\n-0.7\tb\t-0.2\n-1.5\t<unk>\n\n"
        "\\3-grams:\n-0.2\ta b a\n\n\\end\\\n"
    )
    p = tmp_path / "gap.arpa"
    p.write_text(body)
    m = load_arpa(str(p))
    assert m.order == 3 and not m.grams[2]
    got = arpa_perplexity_score(
        spark.createDataFrame([(0, "a b a b")], "doc_id long, text string"),
        m,
    ).collect()[0]
    ln10 = math.log(10.0)
    # a: uni; b|a: no bigram -> bow1(a) + lp1(b); a|a b: stored trigram;
    # b|b a: no trigram, bow2(b,a)=0 -> no bigram -> bow1(a) + lp1(b)
    want_lps = [-0.5, (-0.1 + -0.7), -0.2, (-0.1 + -0.7)]
    want_avg = -sum(lp * ln10 for lp in want_lps) / len(want_lps)
    assert got["n_tokens"] == 4
    assert abs(got["avg_neg_logp"] - want_avg) < 1e-9
    n, avg, _ = _py_arpa_ppl(m, "a b a b")
    assert n == 4 and abs(avg - want_avg) < 1e-12
