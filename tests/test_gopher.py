"""Gopher quality rules (functions/gopher.py, round 12): each of the
seven Rae et al. 2021 Table A1 rules exercised by a planted document
that fails EXACTLY that rule while a healthy document passes all
seven; signal arithmetic hand-checked; filter keeps input columns
byte-for-byte; UDF-free plan. The DuckDB twin (GOPHER_SIGNALS_SQL)
is parity-checked in test_parity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_data_lake_spark.functions.gopher import (
    GOPHER_STOPWORDS,
    gopher_filter,
    gopher_signals,
)

# A healthy ~60-word document: mixed words, normal lengths, stop words.
_GOOD = (
    "the quick brown fox jumps over a lazy dog and then wanders off "
    "to find something new to eat in the quiet forest where tall "
    "trees have grown for many years with roots that reach deep "
    "into the dark rich soil while birds sing softly above and the "
    "river runs clear past mossy stones toward the distant sea"
)


def _sig(spark, text):
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    return gopher_signals(df).collect()[0]


def test_signal_arithmetic_hand_checked(spark):
    r = _sig(spark, "the cat### sat... now…\n- item one\n- item two…")
    # words: the cat### sat... now… - item one - item two…  → 10
    assert r.n_words == 10
    # hash family: 3 '#' chars → 3/10; ellipsis family: 1 '...' +
    # 2 '…' = 3 → 3/10 (the paper thresholds each family separately)
    assert r.hash_word_ratio == 0.3
    assert r.ellipsis_word_ratio == 0.3
    # 3 lines; 2 start with '-' bullets; 'now…' and 'two…' trail off
    assert r.bullet_line_frac == pytest.approx(2 / 3, abs=1e-6)
    assert r.ellipsis_line_frac == pytest.approx(2 / 3, abs=1e-6)
    # alpha words: all but the two bare '-' → 8/10
    assert r.alpha_word_frac == pytest.approx(0.8, abs=1e-6)
    # stop hits: 'the' only
    assert r.n_stop_hits == 1


def test_each_rule_fails_exactly_one_planted_doc(spark):
    docs = {
        "good": _GOOD,
        "too_short": "the small text has fewer words with that and be",
        "long_words": " ".join(
            ["the", "of", "and", "to"] * 13 + ["supercalifragilistic"] * 50
        ),
        "symbols": _GOOD + " " + "#" * 40,
        "bullets": "the text with that\n" + "\n".join(
            f"- bullet {i} of and to be have" for i in range(30)
        ),
        "ellipses": "the text of and\n" + "\n".join(
            f"line {i} that trails off..." for i in range(30)
        ),
        "numeric": "the 1 2 3 4 5 6 7 8 9 10 of " + " ".join(
            str(i) for i in range(60)
        ),
        "no_stops": " ".join(f"w{i}" for i in range(60)),
    }
    df = spark.createDataFrame(
        [(k, v) for k, v in docs.items()], "doc_id string, text string"
    )
    kept = {r.doc_id for r in gopher_filter(df).collect()}
    assert kept == {"good"}
    sig = {r.doc_id: r for r in gopher_signals(df).collect()}
    assert sig["too_short"].n_words < 50
    assert sig["long_words"].mean_word_chars > 10
    assert sig["symbols"].hash_word_ratio > 0.1
    assert sig["bullets"].bullet_line_frac > 0.9
    assert sig["ellipses"].ellipsis_line_frac > 0.3
    assert sig["numeric"].alpha_word_frac < 0.8
    assert sig["no_stops"].n_stop_hits < 2
    # each planted doc fails ONLY its own rule at the paper thresholds
    # (word count excepted — the planted bodies are sized to pass it)
    for k in ("symbols", "bullets", "ellipses", "numeric"):
        assert sig[k].n_words >= 50, k


def test_symbol_families_threshold_separately(spark):
    """Paper semantics (round-13 advice fix): rule 3 applies the 0.1
    bound to the hash ratio and the ellipsis ratio EACH — a document
    at 0.06 + 0.06 passes (the pooled 0.12 draft ratio would have
    dropped it), while 0.12 in either single family still fails."""
    base = _GOOD.split()
    # symbols sit mid-document so rule 5 (lines ENDING in an ellipsis)
    # stays quiet — this test isolates rule 3
    mid = " … … … … #### "
    both_low = " ".join(base[:30]) + mid + " ".join(base[30:])
    hash_high = " ".join(base[:30]) + " " + "#" * 8 + " " + " ".join(base[30:])
    ell_high = " ".join(base[:30]) + " … " * 8 + " ".join(base[30:])
    df = spark.createDataFrame(
        [("both_low", both_low), ("hash_high", hash_high),
         ("ell_high", ell_high)],
        "doc_id string, text string",
    )
    sig = {r.doc_id: r for r in gopher_signals(df).collect()}
    assert sig["both_low"].hash_word_ratio <= 0.1
    assert sig["both_low"].ellipsis_word_ratio <= 0.1
    assert (sig["both_low"].hash_word_ratio
            + sig["both_low"].ellipsis_word_ratio) > 0.1
    kept = {r.doc_id for r in gopher_filter(df).collect()}
    assert kept == {"both_low"}


def test_empty_and_blank_docs(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "   \n  \n"), (3, None)],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in gopher_signals(df).collect()}
    for i in (1, 2):
        assert rows[i].n_words == 0 and rows[i].mean_word_chars == 0.0
        assert rows[i].bullet_line_frac == 0.0
    assert gopher_filter(df).count() == 0


def test_filter_keeps_rows_byte_for_byte(spark):
    df = spark.createDataFrame(
        [(0, _GOOD, "en", 9)], "doc_id long, text string, lang string, x int"
    )
    out = gopher_filter(df).collect()
    assert len(out) == 1
    assert out[0].text == _GOOD and out[0].lang == "en" and out[0].x == 9


def test_plan_is_udf_free(spark):
    df = spark.createDataFrame([(0, _GOOD)], "doc_id long, text string")
    plan = gopher_signals(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_stop_set_is_the_papers(spark):
    assert GOPHER_STOPWORDS == (
        "the", "be", "to", "of", "and", "that", "have", "with",
    )


def test_filter_plan_has_no_join_or_shuffle(spark):
    df = spark.createDataFrame([(0, _GOOD)], "doc_id long, text string")
    plan = gopher_filter(df)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "Exchange" not in plan, plan


def test_filter_works_on_a_streaming_frame(spark, tmp_path):
    """Stateless row predicate ⇒ the same call is a streaming quality
    gate (readStream → gopher_filter → sink)."""
    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(1, _GOOD), (2, "too short to pass.")],
        "doc_id long, text string",
    ).write.parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    q = (
        gopher_filter(stream)
        .writeStream.format("memory")
        .queryName("gopher_gate")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("SELECT doc_id FROM gopher_gate").collect()
    assert [r.doc_id for r in got] == [1]


def test_crlf_text_matches_lf_signals(spark):
    """Round-12 review fix: \\r?\\n splitting — on CRLF text Java's $
    matches before the trailing \\r while RE2/DuckDB's does not, so
    leaving \\r on lines would split the engine twins."""
    lf = "first line trails off...\n- bullet item\nplain line here"
    crlf = lf.replace("\n", "\r\n")
    df = spark.createDataFrame(
        [(1, lf), (2, crlf)], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in gopher_signals(df).collect()}
    for field in ("n_words", "bullet_line_frac", "ellipsis_line_frac",
                  "hash_word_ratio", "ellipsis_word_ratio"):
        assert rows[1][field] == rows[2][field], field
    assert rows[1].ellipsis_line_frac == pytest.approx(1 / 3, abs=1e-6)
