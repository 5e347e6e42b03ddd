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
    high = tmp_path / "h.arpa"
    high.write_text("\\data\\\nngram 4=1\n")
    with pytest.raises(ValueError, match="orders 1-3"):
        load_arpa(str(high))


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
