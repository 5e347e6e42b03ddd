"""C4 page cleaning (functions/c4.py, round 12): each Raffel et al.
2020 §2.2 rule exercised by a planted page/line, the line stage
rebuilds text exactly, the page stage's pre/post-cleaning split is
pinned, and the output text column composes with a downstream Arrow
stage (the round-3/4 projection-collapse regression guard)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from etl_data_lake_spark.functions.c4 import (
    c4_clean,
    c4_clean_lines,
    c4_page_filter,
)

_GOOD_PAGE = "\n".join(
    [
        "this is a perfectly normal sentence with plenty of words.",
        "another full sentence follows it and also ends properly!",
        'a third one is here to clear the sentence floor, "quoted."',
        "short line.",                       # < 5 words → dropped
        "no terminal punctuation on this line at all",   # dropped
        "enable javascript to view the comments on this page.",  # dropped
    ]
)


def test_line_stage_keeps_exactly_the_qualifying_lines(spark):
    df = spark.createDataFrame(
        [(1, _GOOD_PAGE, "en")], "doc_id long, text string, lang string"
    )
    out = c4_clean_lines(df).collect()[0]
    assert out.text == "\n".join(
        [
            "this is a perfectly normal sentence with plenty of words.",
            "another full sentence follows it and also ends properly!",
            'a third one is here to clear the sentence floor, "quoted."',
        ]
    )
    assert out.lang == "en"  # other columns untouched


def test_page_stage_rules(spark):
    pages = {
        "good": _GOOD_PAGE,
        "code": _GOOD_PAGE + "\nfunction f() { return 1; }",
        "lorem": _GOOD_PAGE + "\nLorem Ipsum dolor sit amet and so on.",
        "thin": "only one full sentence lives on this page today.",
        "banned": _GOOD_PAGE + "\nthis page mentions the casino word often.",
    }
    df = spark.createDataFrame(
        [(k, v) for k, v in pages.items()], "doc_id string, text string"
    )
    kept = {r.doc_id for r in c4_page_filter(df).collect()}
    assert kept == {"good", "banned"}
    kept_b = {
        r.doc_id for r in c4_page_filter(df, ban_words=("casino",)).collect()
    }
    assert kept_b == {"good"}


def test_sentence_floor_counts_cleaned_text(spark):
    """A page whose sentences all sit on disqualified lines must drop:
    the floor is counted AFTER line cleaning."""
    page = "\n".join(
        [
            "one! two! three! four!",       # 4 marks but < 5 words → line dies
            "a full sentence that does survive the line stage here.",
        ]
    )
    df = spark.createDataFrame([(1, page)], "doc_id long, text string")
    assert c4_page_filter(df).count() == 0  # 1 sentence < 3
    assert c4_page_filter(df, min_sentences=1).count() == 1


def test_c4_clean_composition_and_empty(spark):
    df = spark.createDataFrame(
        [(1, _GOOD_PAGE), (2, "{}"), (3, None), (4, "")],
        "doc_id long, text string",
    )
    out = c4_clean(df).collect()
    assert [r.doc_id for r in out] == [1]
    assert out[0].text.count("\n") == 2


def test_cleaned_text_composes_with_arrow_stage(spark):
    """Regression guard: the HOF-built text column must feed a
    mapInPandas consumer (re-running token counting over cleaned text
    is the canonical composition)."""
    df = spark.createDataFrame(
        [(1, _GOOD_PAGE)], "doc_id long, text string"
    )
    cleaned = c4_clean(df)

    def fn(it):
        for pdf in it:
            pdf["n_tokens"] = pdf["text"].str.split().str.len()
            yield pdf[["doc_id", "n_tokens"]]

    got = cleaned.mapInPandas(fn, "doc_id long, n_tokens long").collect()
    assert got[0].n_tokens == 30


def test_ban_words_with_regex_metacharacters(spark):
    """Round-12 review fix: real public bad-words lists carry entries
    like 'a$$' — unescaped they anchor (never match) or crash the
    scan; word boundaries apply only at word-character edges."""
    pages = {
        "clean": _GOOD_PAGE,
        "dollar": _GOOD_PAGE + "\nthis page sells a$$ stuff today.",
        "paren": _GOOD_PAGE + "\nbad(word) appears right here now.",
        # substring of a longer word must NOT trip a word-edged entry
        "classy": _GOOD_PAGE + "\nthe classic assembly passes fine.",
    }
    df = spark.createDataFrame(
        [(k, v) for k, v in pages.items()], "doc_id string, text string"
    )
    kept = {
        r.doc_id
        for r in c4_page_filter(
            df, ban_words=("a$$", "bad(word)", "ass")
        ).collect()
    }
    assert kept == {"clean", "classy"}


def test_crlf_lines_clean_identically(spark):
    """CRLF documents: the \\r must not glue onto lines (it would make
    terminal punctuation engine-dependent)."""
    lf = _GOOD_PAGE
    crlf = _GOOD_PAGE.replace("\n", "\r\n")
    df = spark.createDataFrame(
        [(1, lf), (2, crlf)], "doc_id long, text string"
    )
    out = {r.doc_id: r.text for r in c4_clean(df, min_sentences=1).collect()}
    assert out[1] == out[2]


def test_c4_clean_reserved_column_guard(spark):
    df = spark.createDataFrame(
        [(1, _GOOD_PAGE, "x")], "doc_id long, text string, __c4_lines string"
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="__c4_lines"):
        c4_clean(df)


def test_ellipsis_lines_still_drop(spark):
    """Round-13 review fix: '…' is a sentence-SEGMENTATION terminator
    (functions/sentences.py) but NOT a C4 line terminal — 'Read
    more…' teasers are exactly the truncated boilerplate the paper's
    rule drops, and they must keep dropping."""
    from etl_data_lake_spark.functions.c4 import c4_clean_lines

    page = "\n".join([
        "this opening line has plenty of words and ends properly.",
        "click here to read more about this story…",
        "this closing line also has enough words to be kept!",
    ])
    df = spark.createDataFrame([(1, page)], "doc_id long, text string")
    out = c4_clean_lines(df).collect()[0].text
    assert "read more" not in out
    assert out.count("\n") == 1  # the two proper lines survive
