"""Corpus-level paragraph dedup (dedup/paragraphs.py, round 13):
keep-first determinism, the keep='none' aggressive policy, audit
stats, empty/degenerate documents, byte-for-byte passthrough of
non-text columns, UDF-free plans. The full ACTION is also replayed
against DuckDB in test_parity::test_library_twin_parity
(PARAGRAPH_DEDUP_SQL)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_data_lake_spark.dedup.paragraphs import (
    drop_duplicate_paragraphs,
    duplicate_paragraph_stats,
    paragraph_table,
)

_FOOTER = "Copyright 2020 Example Corp. All rights reserved."
_DOCS = [
    (1, f"Unique opening paragraph one.\n\n{_FOOTER}", "en"),
    (2, f"{_FOOTER}\n\nSecond doc's own content here.", "de"),
    (3, f"Third doc body text.\n\n\n{_FOOTER}\n", "fr"),
    (4, _FOOTER, "en"),  # the whole doc IS the boilerplate
    (5, "", "en"),
    (6, None, "en"),
]


def _df(spark):
    return spark.createDataFrame(
        _DOCS, "doc_id long, text string, lang string"
    )


def test_paragraph_table_split_and_digest(spark):
    rows = paragraph_table(_df(spark)).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append((r.para_idx, r.para))
    assert by_doc[1] == [
        (0, "Unique opening paragraph one."), (1, _FOOTER)
    ]
    # \n{2,} of any run length splits; edge whitespace trims away
    assert by_doc[3] == [(0, "Third doc body text."), (1, _FOOTER)]
    assert 5 not in by_doc and 6 not in by_doc  # nothing to explode
    # digest equality across documents is what the dedup keys on
    footer_md5 = {r.para_md5 for r in rows if r.para == _FOOTER}
    assert len(footer_md5) == 1


def test_stats_report_keeper_and_counts(spark):
    stats = duplicate_paragraph_stats(_df(spark)).collect()
    assert len(stats) == 1  # only the footer repeats
    s = stats[0]
    assert s.n_occurrences == 4 and s.n_docs == 4
    # global first occurrence: doc 1, para_idx 1
    assert (s.keeper_doc_id, s.keeper_para_idx) == (1, 1)
    with pytest.raises(ValueError, match="min_occurrences"):
        duplicate_paragraph_stats(_df(spark), min_occurrences=0)


def test_keep_first_action(spark):
    out = {
        r.doc_id: r
        for r in drop_duplicate_paragraphs(_df(spark)).collect()
    }
    assert len(out) == 6  # no row silently lost
    # doc 1 holds the first occurrence — untouched
    assert out[1].text == f"Unique opening paragraph one.\n\n{_FOOTER}"
    # later occurrences excised; own content survives
    assert out[2].text == "Second doc's own content here."
    assert out[3].text == "Third doc body text."
    assert out[4].text == ""  # all-boilerplate doc → empty, kept
    assert out[5].text == "" and out[6].text == ""
    # non-text columns byte-for-byte
    assert out[2].lang == "de" and out[3].lang == "fr"


def test_keep_none_action(spark):
    out = {
        r.doc_id: r.text
        for r in drop_duplicate_paragraphs(
            _df(spark), keep="none"
        ).collect()
    }
    # EVERY footer occurrence gone, including the first
    assert out[1] == "Unique opening paragraph one."
    assert out[2] == "Second doc's own content here."
    assert out[4] == ""
    with pytest.raises(ValueError, match="keep"):
        drop_duplicate_paragraphs(_df(spark), keep="last")


def test_determinism_under_repartition(spark):
    a = {
        r.doc_id: r.text
        for r in drop_duplicate_paragraphs(_df(spark)).collect()
    }
    b = {
        r.doc_id: r.text
        for r in drop_duplicate_paragraphs(
            _df(spark).repartition(7)
        ).collect()
    }
    assert a == b


def test_plans_are_udf_free(spark):
    df = _df(spark)
    for q in (
        paragraph_table(df),
        duplicate_paragraph_stats(df),
        drop_duplicate_paragraphs(df),
    ):
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "EvalPython" not in plan, plan


def test_stats_scan_prunes_text_before_exchange(spark):
    """The stats aggregation shuffles (digest, ids) only — the
    paragraph text column must be pruned before the exchange."""
    plan = (
        duplicate_paragraph_stats(_df(spark))
        ._jdf.queryExecution().executedPlan().toString()
    )
    # every Exchange and every Aggregate row (keys + outputs) carries
    # the digest (para_md5#N), never the raw paragraph (para#N)
    hot = [
        line for line in plan.splitlines()
        if "Exchange" in line or "Aggregate" in line
    ]
    assert hot, plan
    for line in hot:
        assert "para#" not in line, line
    assert any("para_md5#" in line for line in hot), plan


def test_excise_paragraphs_blocklist(spark):
    import hashlib

    from etl_data_lake_spark.dedup.paragraphs import excise_paragraphs

    h = hashlib.md5(_FOOTER.encode()).hexdigest()
    out = {
        r.doc_id: r.text
        for r in excise_paragraphs(_df(spark), [h]).collect()
    }
    assert out[1] == "Unique opening paragraph one."
    assert out[2] == "Second doc's own content here."
    assert out[4] == ""   # all-blocklisted doc → empty, kept
    assert out[6] is None  # null text passes through as null
    import pytest as _pt

    with _pt.raises(ValueError, match="at least one"):
        excise_paragraphs(_df(spark), [])
    with _pt.raises(ValueError, match="max_digests"):
        excise_paragraphs(_df(spark), [f"{i:032x}" for i in range(9)],
                          max_digests=3)


def test_excise_paragraphs_is_a_streaming_gate(spark, tmp_path):
    """Stateless per-row rule ⇒ the same call runs on a streaming
    frame — the nightly-batch-finds / ingest-excises deploy shape."""
    import hashlib

    from etl_data_lake_spark.dedup.paragraphs import excise_paragraphs

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(1, f"Fresh content here.\n\n{_FOOTER}")],
        "doc_id long, text string",
    ).write.parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    h = hashlib.md5(_FOOTER.encode()).hexdigest()
    q = (
        excise_paragraphs(stream, [h])
        .writeStream.format("memory")
        .queryName("para_gate")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("SELECT text FROM para_gate").collect()
    assert [r.text for r in got] == ["Fresh content here."]
