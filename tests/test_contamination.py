"""Cross-corpus decontamination (dedup/contamination.py): detection
must find exactly the planted train↔benchmark overlaps with correct
offsets, stats must threshold cleanly, and excision must cut precisely
the contaminated tokens."""

from __future__ import annotations

import pytest

from etl_data_lake_spark.dedup.contamination import (
    contaminated_spans,
    contamination_stats,
    excise_spans,
)


def _docs(spark, mapping):
    return spark.createDataFrame(
        [(k, v) for k, v in mapping.items()], "doc_id long, text string"
    )


def _uniq(prefix, n):
    return " ".join(f"{prefix}{i}" for i in range(n))


BENCH_Q = "what is the capital of france paris obviously"  # 8 tokens


@pytest.fixture(scope="module")
def corpora(spark):
    """Train doc 1 embeds the benchmark question verbatim at token
    offset 4; doc 2 ends with it; doc 3 is clean; doc 4 contains a
    7-token prefix only (below the w=8 floor)."""
    train = _docs(
        spark,
        {
            1: _uniq("a", 4) + " " + BENCH_Q + " " + _uniq("b", 5),
            2: _uniq("c", 3) + " " + BENCH_Q,
            3: _uniq("d", 15),
            4: _uniq("e", 4) + " " + " ".join(BENCH_Q.split()[:7]),
            5: BENCH_Q,  # the whole document is benchmark text
        },
    )
    reference = _docs(
        spark,
        {
            100: "intro words here " + BENCH_Q + " trailing rubric",
            101: _uniq("z", 9),
        },
    )
    return train, reference


@pytest.mark.parametrize("hasher", ["poly", "xxhash64"])
def test_planted_leak_found_with_exact_offsets(corpora, hasher):
    train, reference = corpora
    got = {
        (r.doc_id, r.span_start, r.span_end, r.span_tokens)
        for r in contaminated_spans(
            train, reference, w=8, hasher=hasher
        ).collect()
    }
    # doc 1: tokens [4, 12); doc 2: tokens [3, 11); doc 5 wholly
    # contaminated; docs 3, 4 clean
    assert got == {(1, 4, 12, 8), (2, 3, 11, 8), (5, 0, 8, 8)}


def test_contamination_stats_threshold(corpora):
    train, reference = corpora
    stats = {
        r.doc_id: (r.n_tokens, r.dup_tokens, r.n_spans, r.dup_ratio)
        for r in contamination_stats(train, reference, w=8).collect()
    }
    assert set(stats) == {1, 2, 3, 4, 5}  # clean docs report too
    assert stats[1] == (17, 8, 1, round(8 / 17, 6))
    assert stats[2] == (11, 8, 1, round(8 / 11, 6))
    assert stats[3] == (15, 0, 0, 0.0)
    assert stats[4] == (11, 0, 0, 0.0)
    assert stats[5] == (8, 8, 1, 1.0)
    # the curation threshold composes as a plain filter
    flagged = {d for d, (_, _, _, ratio) in stats.items() if ratio > 0.5}
    assert flagged == {2, 5}


def test_excise_spans_cuts_exactly_the_leak(spark, corpora):
    train, reference = corpora
    spans = contaminated_spans(train, reference, w=8)
    cleaned = {
        r.doc_id: r.text
        for r in excise_spans(train, spans).collect()
    }
    assert cleaned[1] == _uniq("a", 4) + " " + _uniq("b", 5)
    assert cleaned[2] == _uniq("c", 3)
    # untouched docs keep their ORIGINAL text byte-for-byte
    assert cleaned[3] == _uniq("d", 15)
    assert cleaned[4] == _uniq("e", 4) + " " + " ".join(
        BENCH_Q.split()[:7]
    )
    # a wholly-contaminated document excises to the empty string
    assert cleaned[5] == ""
    # excised output is decontaminated: a second pass finds nothing
    again = excise_spans(train, spans).select("doc_id", "text")
    assert contaminated_spans(again, reference, w=8).count() == 0


def test_clean_corpus_reports_nothing(spark):
    train = _docs(spark, {1: _uniq("p", 20), 2: _uniq("q", 12)})
    reference = _docs(spark, {9: _uniq("r", 30)})
    assert contaminated_spans(train, reference, w=8).count() == 0
    stats = {
        r.doc_id: r.dup_ratio
        for r in contamination_stats(train, reference, w=8).collect()
    }
    assert stats == {1: 0.0, 2: 0.0}


def test_broadcast_semi_join_plan(spark, corpora):
    """The scale claim in the module docstring: with the default
    broadcast_reference=True the train side feeds a broadcast
    left-semi join (no shuffle of the big side for marking)."""
    train, reference = corpora
    plan = (
        contaminated_spans(train, reference, w=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
