"""PII redaction (functions/redact.py) and repetition signals
(functions/repetition.py): planted-PII exactness, audit stats,
Gopher-signal arithmetic, and composition with Arrow-batched stages
(the lambda-inlining trap regression)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_data_lake_spark.functions.redact import (
    PII_PATTERNS,
    pii_stats,
    redact_pii,
)
from etl_data_lake_spark.functions.repetition import (
    repetition_filter,
    repetition_signals,
)


@pytest.fixture()
def pii_docs(spark):
    rows = [
        (1, "contact john.doe+x@example.co.uk or call +1 555-123-4567 now"),
        (2, "server at 192.168.1.254 responded; card 4111111111111111 used"),
        (3, "clean text with number 42 and version 3.14 only"),
        (4, "a123456789@b.com mailed twice: a123456789@b.com"),
        (5, "Released on 2026-08-14, meet 14.08.2026, build 10.15.70, "
            "window 2026-08-14T10:15:00, ids 123-456, order 123-456-7890-1"),
        (6, "ring (212) 555-0123 or +44 20 7946 0958"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_redact_planted_pii_exact(spark, pii_docs):
    got = {r.doc_id: r for r in redact_pii(pii_docs).collect()}
    assert got[1].text == "contact <EMAIL> or call <PHONE> now"
    assert got[2].text == "server at <IPV4> responded; card <ID_NUMBER> used"
    # false-positive guard: versions / small numbers untouched
    assert got[3].text == "clean text with number 42 and version 3.14 only"
    # email swallows its digits BEFORE the id pattern can hole it
    assert got[4].text == "<EMAIL> mailed twice: <EMAIL>"
    assert got[1].n_email == 1 and got[1].n_phone == 1
    assert got[2].n_ipv4 == 1 and got[2].n_id_number == 1
    assert got[4].n_email == 2
    assert got[3].n_email == got[3].n_ipv4 == got[3].n_phone == 0
    # precision contract: dates / versions / id pairs are NOT phones
    assert got[5].text == got[5].text and got[5].n_phone == 0
    assert "2026-08-14" in got[5].text and "10.15.70" in got[5].text
    # marker-bearing shapes (area code, +country) still redact
    assert got[6].text == "ring <PHONE> or <PHONE>" and got[6].n_phone == 2


def test_redact_keep_original_and_custom_patterns(spark, pii_docs):
    got = redact_pii(
        pii_docs,
        patterns={"email": PII_PATTERNS["email"]},
        token_fmt="[{kind}]",
        keep_original=True,
    )
    row = {r.doc_id: r for r in got.collect()}[1]
    assert "[EMAIL]" in row.text and "@example.co.uk" in row.text_raw
    assert "555-123-4567" in row.text  # phone class not requested


def test_pii_stats_audit(spark, pii_docs):
    s = pii_stats(pii_docs).collect()[0]
    assert s.n_docs == 6
    assert s.total_email == 3 and s.docs_with_email == 2
    assert s.total_ipv4 == 1 and s.docs_with_ipv4 == 1
    grouped = pii_stats(
        pii_docs.withColumn("src", F.col("doc_id") % 2), by="src"
    )
    assert grouped.count() == 2


def test_redact_plan_stays_codegen(spark, pii_docs):
    plan = redact_pii(pii_docs)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_repetition_signals_arithmetic(spark):
    docs = spark.createDataFrame(
        [
            # 4 lines, 2 distinct -> dup_line 0.5; one paragraph
            (1, "spam line\nspam line\nother\nother"),
            # 3 paragraphs, 2 distinct -> dup_para 1/3
            (2, "para one\n\npara one\n\npara two"),
            # 'loop' 4 of 5 words: top-word chars 16/(16+5)
            (3, "loop loop loop loop largo"),
            (4, ""),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in repetition_signals(docs).collect()}
    assert got[1].dup_line_fraction == pytest.approx(0.5)
    assert got[1].dup_paragraph_fraction == pytest.approx(0.0)
    assert got[2].dup_paragraph_fraction == pytest.approx(1 / 3)
    assert got[2].dup_line_fraction == pytest.approx(1 / 3)  # collapsed \n\n
    assert got[3].top_word_char_fraction == pytest.approx(16 / 21)
    assert got[4].dup_line_fraction == 0.0
    assert got[4].top_word_char_fraction == 0.0


def test_repetition_filter_drops_degenerate(spark):
    docs = spark.createDataFrame(
        [
            (1, "a healthy document with varied words and several lines\n"
                "another different line here\nand one more distinct line"),
            (2, "buy now\nbuy now\nbuy now\nbuy now\nbuy now"),
        ],
        "doc_id long, text string",
    )
    kept = [r.doc_id for r in repetition_filter(docs).collect()]
    assert kept == [1]


def test_signals_on_real_documents_in_range(spark):
    from etl_data_lake_spark.sources.catalog import load_table

    from tests.conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents")
    sig = repetition_signals(docs).collect()
    assert len(sig) == docs.count()
    for r in sig:
        for c in ("dup_line_fraction", "dup_paragraph_fraction",
                  "top_word_char_fraction"):
            assert 0.0 <= r[c] <= 1.0, (r.doc_id, c, r[c])


def test_redacted_text_composes_with_arrow_stages(spark, pii_docs):
    """Regression for the projection-collapse lambda trap: redacted
    text must be safely consumable by a downstream pandas UDF."""
    from etl_data_lake_spark.functions.text import window_hashes_pandas_udf

    red = redact_pii(pii_docs)
    hashed = red.select(
        "doc_id", window_hashes_pandas_udf(2)(F.col("text")).alias("wh")
    )
    assert hashed.count() == 6


# ---------------------------------------------------------------------------
# compression_signals / compression_filter (round 11): the DEFLATE
# ratio gibberish-vs-repetition signal.
# ---------------------------------------------------------------------------


def test_compression_ratio_separates_junk_prose_noise(spark):
    import random
    import string
    import zlib

    from etl_data_lake_spark.functions.repetition import compression_signals

    rng = random.Random(3)
    noise = "".join(rng.choice(string.ascii_letters + string.digits)
                    for _ in range(4000))
    prose = (
        "the quick brown fox jumps over the lazy dog and then wanders "
        "through the quiet forest looking for something new to eat "
    ) * 12
    junk = "buy now click here " * 200
    docs = spark.createDataFrame(
        [(1, junk), (2, prose), (3, noise), (4, "")],
        "doc_id long, text string",
    )
    sig = {r["doc_id"]: r for r in compression_signals(docs).collect()}
    assert sig[1]["compression_ratio"] < sig[2]["compression_ratio"] \
        < sig[3]["compression_ratio"]
    assert sig[1]["compression_ratio"] < 0.25   # looped junk
    assert sig[3]["compression_ratio"] > 0.7    # incompressible-ish
    assert sig[4]["raw_bytes"] == 0 and sig[4]["compression_ratio"] == 0.0
    # the numbers are zlib's, not an approximation — INCLUDING the
    # empty document (round-12 ADVICE fix: zlib.compress(b'') is 8
    # bytes of header/trailer, not a fabricated 0)
    want = len(zlib.compress(prose.encode(), 6))
    assert sig[2]["compressed_bytes"] == want
    assert sig[4]["compressed_bytes"] == len(zlib.compress(b"", 6))


def test_compression_filter_two_sided(spark):
    from etl_data_lake_spark.functions.repetition import compression_filter

    import random
    import string

    rng = random.Random(5)
    noise = "".join(rng.choice(string.printable) for _ in range(3000))
    words = (
        "alpha bridge candle delta ember forest granite harbor island "
        "jungle kernel lantern meadow nectar orchid prairie quartz "
        "river summit timber umbra valley willow zephyr story garden"
    ).split()
    prose = " ".join(rng.choice(words) for _ in range(500))
    docs = spark.createDataFrame(
        [(1, "spam " * 500), (2, prose), (3, noise), (4, "")],
        "doc_id long, text string",
    )
    kept = {
        r["doc_id"]
        for r in compression_filter(
            docs, min_ratio=0.15, max_ratio=0.6
        ).collect()
    }
    assert kept == {2}
    import pytest

    with pytest.raises(ValueError, match="min_ratio"):
        compression_filter(docs, min_ratio=0.9, max_ratio=0.5)
    with pytest.raises(ValueError, match="level"):
        from etl_data_lake_spark.functions.repetition import (
            compression_signals,
        )

        compression_signals(docs, level=0)


def test_compression_filter_drops_empty_even_at_zero_min(spark):
    """Regression (round-11 self-review): with min_ratio=0.0 an empty
    doc's ratio 0.0 passed the band — the documented contract is that
    empty docs ALWAYS drop."""
    from etl_data_lake_spark.functions.repetition import compression_filter

    docs = spark.createDataFrame(
        [(1, ""), (2, None), (3, "some ordinary words of text here")],
        "doc_id long, text string",
    )
    kept = {
        r["doc_id"]
        for r in compression_filter(
            docs, min_ratio=0.0, max_ratio=1.5
        ).collect()
    }
    assert kept == {3}
