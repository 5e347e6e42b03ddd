"""Boilerplate line removal (dedup/boilerplate.py): per-group
document-frequency thresholds, byte-exact untouched documents, ordered
lambda-free rebuild that composes with downstream Arrow stages."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_data_lake_spark.dedup.boilerplate import (
    boilerplate_lines,
    line_stats,
    strip_boilerplate,
)
from etl_data_lake_spark.plans.inspect import plan_string

NAV = "Home | About | Contact Us"
COOKIE = "We use cookies to improve your experience."


def _docs(spark):
    rows = [
        # group A: nav chrome in 3 of 4 docs, cookie banner in 2
        ("a1", "siteA", f"{NAV}\nFirst article body.\n  indented kept line\n{COOKIE}"),
        ("a2", "siteA", f"{NAV}\nSecond article, different text.\n{COOKIE}"),
        ("a3", "siteA", f"{NAV}\nThird article here."),
        ("a4", "siteA", "No chrome at all in this one.\nJust prose."),
        # group B: the SAME nav string appears in only one doc — must
        # survive there (group scoping)
        ("b1", "siteB", f"{NAV}\nQuoting site A's menu in an article."),
        ("b2", "siteB", "Unrelated B text.\nMore B text."),
    ]
    return spark.createDataFrame(rows, "doc_id string, src string, text string")


def test_stats_and_thresholds(spark):
    stats = {
        (r["group"], r["line"]): (r["n_docs"], r["doc_frac"])
        for r in line_stats(_docs(spark), group_col="src").collect()
    }
    assert stats[("siteA", NAV)] == (3, 0.75)
    assert stats[("siteA", COOKIE)] == (2, 0.5)
    assert stats[("siteB", NAV)] == (1, 0.5)
    bp = boilerplate_lines(
        _docs(spark), group_col="src", min_docs=3, min_frac=0.6
    ).collect()
    assert {(r["group"], r["line"]) for r in bp} == {("siteA", NAV)}
    # lower thresholds admit the cookie banner too, still never group B
    bp2 = boilerplate_lines(
        _docs(spark), group_col="src", min_docs=2, min_frac=0.5
    )
    assert {(r["group"], r["line"]) for r in bp2.collect()} == {
        ("siteA", NAV),
        ("siteA", COOKIE),
    }


def test_strip_preserves_order_bytes_and_group_scope(spark):
    docs = _docs(spark)
    bp = boilerplate_lines(docs, group_col="src", min_docs=2, min_frac=0.5)
    out = {
        r["doc_id"]: r["text"]
        for r in strip_boilerplate(docs, bp, group_col="src").collect()
    }
    # chrome removed, body order kept, raw bytes (indentation) kept
    assert out["a1"] == "First article body.\n  indented kept line"
    assert out["a2"] == "Second article, different text."
    assert out["a3"] == "Third article here."
    # untouched docs byte-for-byte, including the same NAV line in B
    assert out["a4"] == "No chrome at all in this one.\nJust prose."
    assert out["b1"] == f"{NAV}\nQuoting site A's menu in an article."
    assert out["b2"] == "Unrelated B text.\nMore B text."


def test_pure_boilerplate_doc_becomes_empty(spark):
    rows = [(f"d{i}", f"{NAV}\n{COOKIE}" if i else NAV) for i in range(4)]
    docs = spark.createDataFrame(
        rows, "doc_id string, text string"
    )
    bp = boilerplate_lines(docs, min_docs=2, min_frac=0.5)
    out = {
        r["doc_id"]: r["text"] for r in strip_boilerplate(docs, bp).collect()
    }
    assert set(out.values()) == {""}


def test_short_lines_never_qualify(spark):
    docs = spark.createDataFrame(
        [("d1", "ok\nreal text one"), ("d2", "ok\nreal text two"),
         ("d3", "ok\nreal text three")],
        "doc_id string, text string",
    )
    bp = boilerplate_lines(docs, min_docs=2, min_frac=0.5)  # min_line_chars=4
    assert bp.count() == 0
    # opting down catches it
    bp2 = boilerplate_lines(docs, min_docs=2, min_frac=0.5, min_line_chars=1)
    assert [r["line"] for r in bp2.collect()] == ["ok"]


def test_matching_is_trim_insensitive_but_rebuild_is_raw(spark):
    docs = spark.createDataFrame(
        [
            ("d1", f"  {NAV}  \nbody one stays here"),
            ("d2", f"{NAV}\nbody two stays here"),
            ("d3", f"\t{NAV}\nbody three stays here"),
        ],
        "doc_id string, text string",
    )
    bp = boilerplate_lines(docs, min_docs=3, min_frac=0.9)
    out = {
        r["doc_id"]: r["text"] for r in strip_boilerplate(docs, bp).collect()
    }
    assert out == {
        "d1": "body one stays here",
        "d2": "body two stays here",
        "d3": "body three stays here",
    }


def test_layout_invariant_and_validation(spark):
    docs = _docs(spark)
    bp = boilerplate_lines(docs, group_col="src", min_docs=2, min_frac=0.5)
    a = strip_boilerplate(docs, bp, group_col="src")
    b = strip_boilerplate(docs.repartition(7), bp, group_col="src")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    with pytest.raises(ValueError, match="min_docs"):
        boilerplate_lines(docs, min_docs=1)
    with pytest.raises(ValueError, match="min_frac"):
        boilerplate_lines(docs, min_frac=0.0)
    with pytest.raises(ValueError, match="_doc"):
        strip_boilerplate(docs.withColumn("_doc", F.lit(1)), bp)


def test_plan_shape_udf_free_and_bp_broadcast(spark):
    docs = _docs(spark)
    bp = boilerplate_lines(docs, group_col="src", min_docs=2, min_frac=0.5)
    stripped = strip_boilerplate(docs, bp, group_col="src")
    plan = plan_string(stripped)
    # whole pipeline is JVM codegen — no Python anywhere in the plan
    assert "Python" not in plan and "MapInPandas" not in plan
    # the bounded boilerplate set joins broadcast by default
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan


def test_composes_with_downstream_arrow_stage(spark):
    """The rebuilt text column is a plain attribute: feeding it to a
    pandas UDF must not trip the Catalyst projection-collapse trap."""
    from etl_data_lake_spark.functions.text import shingle_hashes_pandas_udf

    docs = _docs(spark)
    bp = boilerplate_lines(docs, group_col="src", min_docs=2, min_frac=0.5)
    stripped = strip_boilerplate(docs, bp, group_col="src")
    n = (
        stripped.withColumn("sh", shingle_hashes_pandas_udf(2)(F.col("text")))
        .select(F.explode("sh"))
        .count()
    )
    assert n > 0


def test_null_group_is_a_real_group(spark):
    """Docs with a NULL group value form their own group: boilerplate
    among them is detected and stripped (an equi-join on the group key
    silently dropped them — review regression)."""
    docs = spark.createDataFrame(
        [
            ("n1", None, f"{NAV}\nunattributed one"),
            ("n2", None, f"{NAV}\nunattributed two"),
            ("n3", None, f"{NAV}\nunattributed three"),
            ("a1", "siteA", f"{NAV}\nattributed — only one here"),
        ],
        "doc_id string, src string, text string",
    )
    stats = {
        (r["group"], r["line"]): r["n_docs"]
        for r in line_stats(docs, group_col="src").collect()
    }
    assert stats[(None, NAV)] == 3 and stats[("siteA", NAV)] == 1
    bp = boilerplate_lines(docs, group_col="src", min_docs=3, min_frac=0.9)
    out = {
        r["doc_id"]: r["text"]
        for r in strip_boilerplate(docs, bp, group_col="src").collect()
    }
    assert out["n1"] == "unattributed one"
    assert out["n2"] == "unattributed two"
    assert out["n3"] == "unattributed three"
    # the lone siteA doc keeps its NAV (below threshold in its group)
    assert out["a1"] == f"{NAV}\nattributed — only one here"
