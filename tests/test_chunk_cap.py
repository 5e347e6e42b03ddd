"""Document chunking (operators/chunking.py) and per-stratum caps
(operators/sampling.cap_per_stratum)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_data_lake_spark.operators.chunking import chunk_documents
from etl_data_lake_spark.operators.sampling import cap_per_stratum


# ----------------------------------------------------------- chunking


def test_chunks_cover_exactly_with_overlap(spark):
    df = spark.createDataFrame(
        [(1, "abcdefghij")], "doc_id long, text string"
    )  # 10 chars
    got = {
        r["chunk_idx"]: r["text"]
        for r in chunk_documents(df, 4, overlap=1).collect()
    }
    # step 3: starts 0,3,6 -> abcd, defg, ghij; a 4th chunk at 9 ("j")
    # would be a substring of chunk 2 and is correctly suppressed
    assert got == {0: "abcd", 1: "defg", 2: "ghij"}
    # zero overlap, exact multiple: no trailing empty chunk
    got2 = {
        r["chunk_idx"]: r["text"]
        for r in chunk_documents(df, 5).collect()
    }
    assert got2 == {0: "abcde", 1: "fghij"}


def test_chunk_reassembly_and_edge_docs(spark):
    df = spark.createDataFrame(
        [(1, "x" * 987), (2, "short"), (3, ""), (4, None)],
        "doc_id long, text string",
    )
    chunks = chunk_documents(df, 100).collect()
    by_doc: dict[int, list] = {}
    for r in chunks:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # non-overlapping chunks concatenate back to the original
    ordered = sorted(by_doc[1], key=lambda r: r["chunk_idx"])
    assert "".join(r["text"] for r in ordered) == "x" * 987
    assert [r["chunk_idx"] for r in ordered] == list(range(10))
    assert all(len(r["text"]) <= 100 for r in ordered)
    # short doc: itself as chunk 0; empty/null docs: nothing
    assert [(r["chunk_idx"], r["text"]) for r in by_doc[2]] == [
        (0, "short")
    ]
    assert 3 not in by_doc and 4 not in by_doc


def test_chunk_carries_other_columns_and_validates(spark):
    df = spark.createDataFrame(
        [(1, "en", "abcdef")], "doc_id long, lang string, text string"
    )
    rows = chunk_documents(df, 4).collect()
    assert all(r["lang"] == "en" for r in rows)
    assert sorted(chunk_documents(df, 4).columns) == sorted(
        ["doc_id", "lang", "chunk_idx", "text"]
    )
    with pytest.raises(ValueError, match="chunk_chars"):
        chunk_documents(df, 0)
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, 4, overlap=4)


def test_chunking_layout_invariant(spark):
    df = spark.range(50).select(
        F.col("id").alias("doc_id"),
        F.repeat(F.concat(F.lit("w"), F.col("id").cast("string")), 40)
        .alias("text"),
    )
    a = chunk_documents(df, 37, overlap=5)
    b = chunk_documents(df.repartition(7), 37, overlap=5)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_no_trailing_chunk_contained_in_previous(spark):
    """A final partial chunk shorter than the overlap is already fully
    inside the previous chunk and must not spawn a duplicate-content
    row (round-5 advice: len=10, chunk=8, overlap=4 emitted chars 9-10,
    a substring of chunk 1's 5-10)."""
    df = spark.createDataFrame(
        [(1, "abcdefghij")], "doc_id long, text string"
    )
    got = {
        r["chunk_idx"]: r["text"]
        for r in chunk_documents(df, 8, overlap=4).collect()
    }
    assert got == {0: "abcdefgh", 1: "efghij"}
    # exact-fit doc: the second start (char 5) no longer extends past
    # the end, so exactly one chunk
    df8 = spark.createDataFrame([(1, "abcdefgh")], "doc_id long, text string")
    assert {
        r["chunk_idx"]: r["text"]
        for r in chunk_documents(df8, 8, overlap=4).collect()
    } == {0: "abcdefgh"}


def test_chunk_extension_and_coverage_sweep(spark):
    """For every length x overlap combination: chunk ends strictly
    increase (no chunk is contained in its predecessor), indices are
    contiguous from 0, the last chunk reaches the document end, and
    each chunk is the exact expected slice."""
    base = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMN"  # 40 distinct chars
    chunk = 8
    for overlap in (0, 3, 4, 7):
        step = chunk - overlap
        df = spark.createDataFrame(
            [(n, base[:n]) for n in range(1, 41)],
            "doc_id long, text string",
        )
        by_doc: dict[int, list] = {}
        for r in chunk_documents(df, chunk, overlap=overlap).collect():
            by_doc.setdefault(r["doc_id"], []).append(r)
        for n in range(1, 41):
            rows = sorted(by_doc[n], key=lambda r: r["chunk_idx"])
            assert [r["chunk_idx"] for r in rows] == list(range(len(rows)))
            prev_end = 0
            for i, r in enumerate(rows):
                start, end = i * step, min(i * step + chunk, n)
                assert r["text"] == base[start:end]
                assert end > prev_end, (n, overlap, i)
                prev_end = end
            assert prev_end == n, (n, overlap)


# --------------------------------------------------------------- caps


def test_cap_per_stratum_bounds_and_nests(spark):
    df = spark.range(1000).select(
        F.col("id"),
        F.when(F.col("id") < 700, "big").otherwise("small").alias("dom"),
    )
    capped = cap_per_stratum(df, 100, "dom", ("id",))
    sizes = {
        r["dom"]: r["n"]
        for r in capped.groupBy("dom").agg(F.count("*").alias("n")).collect()
    }
    assert sizes == {"big": 100, "small": 100}
    # survivors nest across caps at the same seed
    fifty = cap_per_stratum(df, 50, "dom", ("id",))
    assert fifty.join(capped, "id", "left_anti").count() == 0
    # stable under repartitioning
    again = cap_per_stratum(df.repartition(13), 100, "dom", ("id",))
    assert capped.select("id").exceptAll(again.select("id")).count() == 0


def test_cap_passes_small_strata_untouched(spark):
    df = spark.range(30).select(
        F.col("id"), F.lit("only").alias("dom")
    )
    assert cap_per_stratum(df, 100, "dom", ("id",)).count() == 30
    with pytest.raises(ValueError, match="max_rows"):
        cap_per_stratum(df, 0, "dom", ("id",))
