"""Sentence segmentation + sentence-aware chunking
(functions/sentences.py, round 12 late): totality (every character
lands in exactly one sentence — reconstruction exact modulo
inter-sentence whitespace), chunk budgets respected with the single
documented exception (one oversized sentence), order preservation,
zero-shuffle/UDF-free plans."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_data_lake_spark.functions.sentences import (
    chunk_by_sentences,
    sentence_array,
    split_sentences,
)

_TEXT = (
    'One short sentence. A second one follows!  Is this the third? '
    '"Quoted end." And a terminator-less tail'
)


def test_split_sentences_order_and_boundaries(spark):
    df = spark.createDataFrame([(1, _TEXT)], "doc_id long, text string")
    got = [
        (r.sentence_idx, r.sentence)
        for r in split_sentences(df).orderBy("sentence_idx").collect()
    ]
    assert got == [
        (0, "One short sentence."),
        (1, "A second one follows!"),
        (2, "Is this the third?"),
        (3, '"Quoted end."'),
        (4, "And a terminator-less tail"),
    ]


def test_reconstruction_is_exact_modulo_whitespace(spark):
    docs = [
        (1, _TEXT),
        (2, "no terminators at all in this one"),
        (3, "multi!!! terminators??? everywhere..."),
        (4, "Dr. Smith arrived. He left."),  # the documented naive split
        (5, ""),
        (6, None),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = {
        r.doc_id: r.s
        for r in df.select(
            "doc_id", sentence_array("text").alias("s")
        ).collect()
    }
    import re

    for i, text in docs:
        if text is None:
            assert rows[i] is None
            continue
        assert "".join(rows[i]).replace(" ", "") == re.sub(r"\s", "", text)
    assert rows[4] == ["Dr.", "Smith arrived.", "He left."]
    assert rows[5] == []


def test_chunk_by_sentences_budget_and_order(spark):
    sentences = [f"Sentence number {i} right here." for i in range(12)]
    df = spark.createDataFrame(
        [(1, " ".join(sentences))], "doc_id long, text string"
    )
    out = chunk_by_sentences(df, max_chars=100).orderBy("chunk_idx").collect()
    # budgets: every chunk within the cap (no sentence exceeds it here)
    assert all(len(r.chunk) <= 100 for r in out)
    assert sum(r.n_sentences for r in out) == 12
    # order: concatenating chunks reproduces the document exactly
    assert " ".join(r.chunk for r in out) == " ".join(sentences)
    # greedy: every chunk except the last could not absorb the next
    # chunk's first sentence
    for a, b in zip(out, out[1:]):
        first_next = b.chunk.split(". ")[0] + "."
        assert len(a.chunk) + 1 + len(first_next) > 100


def test_oversized_sentence_is_its_own_chunk(spark):
    big = "word " * 60  # ~300 chars, no terminator
    df = spark.createDataFrame(
        [(1, f"Small one. {big.strip()}. Tail here.")],
        "doc_id long, text string",
    )
    out = chunk_by_sentences(df, max_chars=50).orderBy("chunk_idx").collect()
    assert [r.n_sentences for r in out] == [1, 1, 1]
    assert len(out[1].chunk) > 50  # the documented oversized exception
    assert out[0].chunk == "Small one." and out[2].chunk == "Tail here."
    with pytest.raises(ValueError, match="max_chars"):
        chunk_by_sentences(df, max_chars=0)


def test_plans_are_udf_free_and_shuffle_free(spark):
    df = spark.createDataFrame([(1, _TEXT)], "doc_id long, text string")
    for q in (split_sentences(df), chunk_by_sentences(df, 80)):
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "EvalPython" not in plan, plan


def test_composes_with_c4_and_packing(spark):
    """The intended pipeline position: C4-cleaned text → sentence
    chunks → exact-token packing budget."""
    from etl_data_lake_spark.functions.c4 import c4_clean

    page = "\n".join(
        [
            "the first retained line has plenty of words in it.",
            "and the second retained line also clears every bar!",
            "a third line keeps the sentence floor satisfied too.",
        ]
    )
    df = spark.createDataFrame([(1, page)], "doc_id long, text string")
    chunks = chunk_by_sentences(c4_clean(df), max_chars=120)
    got = chunks.orderBy("chunk_idx").collect()
    assert sum(r.n_sentences for r in got) == 3
    assert all(len(r.chunk) <= 120 for r in got)


def test_cjk_terminators_split_correctly(spark):
    """Round-13 verdict item #4: CJK/fullwidth terminals and
    ideographic closing quotes segment; reconstruction stays exact."""
    docs = [
        (1, "第一句です。二番目の文！これは質問ですか？最後の文"),
        (2, "「引用でした。」次の文。"),
        (3, "Mixed script sentence. 中文句子。And back！"),
        (4, "全角終止．そして省略…続き"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = {
        r.doc_id: r.s
        for r in df.select(
            "doc_id", sentence_array("text").alias("s")
        ).collect()
    }
    assert rows[1] == [
        "第一句です。", "二番目の文！", "これは質問ですか？", "最後の文",
    ]
    # the ideographic closing quote binds to the preceding terminator
    assert rows[2] == ["「引用でした。」", "次の文。"]
    assert rows[3] == ["Mixed script sentence.", "中文句子。", "And back！"]
    assert rows[4] == ["全角終止．", "そして省略…", "続き"]
    # totality: every non-space character lands in exactly one sentence
    import re

    for i, text in docs:
        assert "".join(rows[i]).replace(" ", "") == re.sub(r"\s", "", text)


def test_c4_sentence_floor_counts_cjk(spark):
    """The C4 three-sentence floor shares the terminator set: a CJK
    page with three sentences passes, two drops."""
    from etl_data_lake_spark.functions.c4 import c4_page_filter

    three = "这是完整的第一句内容很充实。第二句也有足够的词。第三句结束全文。"
    two = "只有两个句子的页面在这里。第二句就结束了。"
    df = spark.createDataFrame(
        [(1, three), (2, two)], "doc_id long, text string"
    )
    # min_words_per_line=1: CJK text has no spaces, so the paper's
    # 5-word line rule (whitespace words) is out of scope here
    kept = {
        r.doc_id
        for r in c4_page_filter(df, min_words_per_line=1).collect()
    }
    assert kept == {1}
