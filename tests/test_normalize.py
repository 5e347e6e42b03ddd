"""Text normalization (functions/normalize.py): stage semantics,
fixed application order, idempotence, UDF-free plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_data_lake_spark.functions.normalize import (
    normalize_docs,
    normalize_text,
)


def _one(spark, text, **kw):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(normalize_text("text", **kw).alias("t")).collect()[0]["t"]


def test_html_strip_and_entity_order(spark):
    got = _one(spark, "<p>Tom &amp; Jerry &lt;3</p>\n<div class='x'>hi</div>")
    assert got == "Tom & Jerry <3\nhi"
    # entities decode AFTER tag strip: &lt;b&gt; survives as literal <b>
    assert _one(spark, "say &lt;b&gt; aloud") == "say <b> aloud"


def test_punctuation_and_unicode_spaces(spark):
    got = _one(spark, "“smart” ‘quotes’ — dash… a b c")
    assert got == '"smart" \'quotes\' - dash... a b c'


def test_controls_and_whitespace(spark):
    got = _one(spark, "a\x00b\x08c  \t d\n\n\n\ne \nf")
    assert got == "abc d\n\ne\nf"


def test_idempotent_and_null_safe(spark):
    import random

    random.seed(7)
    dirty = [
        "<a href='x'>L</a> &amp;— “q”  end\x07\n\n\n\nnext",
        "plain already-clean text",
        None,
    ]
    df = spark.createDataFrame([(t,) for t in dirty], "text string")
    once = normalize_docs(df)
    twice = normalize_docs(once)
    a = [r["text"] for r in once.collect()]
    b = [r["text"] for r in twice.collect()]
    assert a == b
    assert a[1] == "plain already-clean text"
    assert a[2] is None
    # entity-encoded entity decodes exactly ONE level per pass
    # (&amp; is decoded last)
    enc = spark.createDataFrame([("&amp;lt; x",)], "text string")
    assert normalize_docs(enc).collect()[0]["text"] == "&lt; x"
    # the documented exception: decoded TAG-SHAPED entities are
    # re-stripped by a second full pass (double-unescape hazard);
    # strip_html=False makes re-runs safe
    tag = spark.createDataFrame([("&lt;tag&gt; x",)], "text string")
    assert normalize_docs(tag).collect()[0]["text"] == "<tag> x"
    assert normalize_docs(normalize_docs(tag)).collect()[0]["text"] == "x"
    re_run = normalize_docs(tag).select(
        normalize_text("text", strip_html=False).alias("text")
    )
    assert re_run.collect()[0]["text"] == "<tag> x"


def test_udf_free_plan_and_stage_toggles(spark):
    from etl_data_lake_spark.plans.inspect import plan_string

    df = spark.createDataFrame([("<b>x</b>",)], "text string")
    out = normalize_docs(df)
    assert "Python" not in plan_string(out)
    # toggles isolate stages
    keep_html = _one(spark, "<b>x</b>  y", strip_html=False)
    assert keep_html == "<b>x</b> y"
    keep_ws = _one(spark, "a  b", whitespace=False)
    assert keep_ws == "a  b"


def test_normalizes_before_dedup_hashing(spark):
    """The point of the pass: trivially-different crawls of the same
    page hash identically after normalization."""
    a = "Tom &amp; Jerry — “Episode 1”"
    b = "Tom & Jerry - \"Episode 1\""
    df = spark.createDataFrame([(1, a), (2, b)], "doc_id long, text string")
    n = normalize_docs(df).select(
        "doc_id", F.xxhash64("text").alias("h")
    ).collect()
    assert n[0]["h"] == n[1]["h"]


def test_plain_text_angle_brackets_survive(spark):
    """Comparison operators are not markup: only tag-shaped spans
    strip (review regression — '<[^<>]*>' ate '< n and j >')."""
    assert (
        _one(spark, "for i < n and j > 0 do x")
        == "for i < n and j > 0 do x"
    )
    assert _one(spark, "a <5 and b> c") == "a <5 and b> c"
    # real tags and comments still strip
    assert _one(spark, "x <!-- hidden --> y <br/> z") == "x y z"
