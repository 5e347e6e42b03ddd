"""Corpus snapshot diff — what changed between two dataset versions.

Txn tables answer this through the change feed; this operator answers
it for ANY two frames (two parquet exports, a vendor drop vs last
month's, a curated corpus before/after a pipeline change): per key,
is the row ``added``, ``removed``, ``changed`` (same key, different
content), or ``unchanged``.

Scale shape: each side is reduced to (keys, content hash) — ONE
projection, the fat payload columns never leave their scan — and the
diff is a single full-outer join on the keys carrying only keys + one
long. Null keys match null keys (null-safe equality): a row whose key
is genuinely null diffs against its counterpart instead of appearing
as an add/remove pair.

Keys must uniquely identify rows on each side; duplicate keys fan out
through the join like any join would (pre-aggregate or dedup first —
the exact-dedup operator exists for this).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STATUS_COL = "diff_status"


def _hashed(df: DataFrame, key_cols, compare_cols, side: str):
    # xxhash64 SKIPS null inputs (a null leaves the hash seed
    # unchanged), so without markers (title='x', subtitle=NULL) and
    # (title=NULL, subtitle='x') hash identically and a null-shift
    # across columns reports 'unchanged'. Interleaving each column
    # with its isNull flag makes the null's POSITION part of the
    # content hash — the boolean is never null, so it always feeds
    # the hash.
    hashed_inputs = [
        x for c in compare_cols for x in (F.col(c), F.col(c).isNull())
    ]
    return df.select(
        *[F.col(k).alias(f"{side}_{k}") for k in key_cols],
        F.xxhash64(*hashed_inputs).alias(f"_h_{side}"),
        F.lit(True).alias(f"_in_{side}"),
    )


def corpus_diff(
    a: DataFrame,
    b: DataFrame,
    key_cols: tuple[str, ...],
    compare_cols: tuple[str, ...] | None = None,
) -> DataFrame:
    """→ one row per key present on either side: the key columns plus
    ``diff_status`` ∈ {added, removed, changed, unchanged}, where
    ``a`` is the OLD snapshot and ``b`` the NEW (added = only in b).
    ``compare_cols`` defaults to every non-key column the two sides
    share; columns named there must exist on both sides."""
    if not key_cols:
        raise ValueError("key_cols must name at least one column")
    for k in key_cols:
        if k not in a.columns or k not in b.columns:
            raise ValueError(f"key column {k!r} missing from a side")
    if compare_cols is None:
        shared = set(a.columns) & set(b.columns)
        compare_cols = tuple(
            sorted(shared - set(key_cols))
        )
    else:
        compare_cols = tuple(compare_cols)
        for c in compare_cols:
            if c not in a.columns or c not in b.columns:
                raise ValueError(
                    f"compare column {c!r} missing from a side"
                )
    if not compare_cols:
        raise ValueError(
            "no shared non-key columns to compare — pass compare_cols"
        )
    # a type mismatch hashes "equal" values differently → every row
    # silently reports 'changed'; refuse instead
    for c in (*key_cols, *compare_cols):
        ta, tb = a.schema[c].dataType, b.schema[c].dataType
        if ta != tb:
            raise ValueError(
                f"column {c!r} differs in type between sides "
                f"({ta.simpleString()} vs {tb.simpleString()}) — cast "
                "one side first"
            )
    ha = _hashed(a, key_cols, compare_cols, "a")
    hb = _hashed(b, key_cols, compare_cols, "b")
    cond = reduce(
        lambda x, y: x & y,
        [
            F.col(f"a_{k}").eqNullSafe(F.col(f"b_{k}"))
            for k in key_cols
        ],
    )
    j = ha.join(hb, cond, "full_outer")
    status = (
        F.when(F.col("_in_a").isNull(), F.lit("added"))
        .when(F.col("_in_b").isNull(), F.lit("removed"))
        .when(F.col("_h_a") != F.col("_h_b"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select(
        *[
            F.coalesce(F.col(f"a_{k}"), F.col(f"b_{k}")).alias(k)
            for k in key_cols
        ],
        status.alias(STATUS_COL),
    )


def corpus_diff_summary(
    a: DataFrame,
    b: DataFrame,
    key_cols: tuple[str, ...],
    compare_cols: tuple[str, ...] | None = None,
) -> DataFrame:
    """→ exactly four rows (added / removed / changed / unchanged)
    with counts — absent categories report 0, so a gate like
    "fail the publish if changed > x%" never trips over a missing
    row."""
    observed = (
        corpus_diff(a, b, key_cols, compare_cols)
        .groupBy(STATUS_COL)
        .agg(F.count(F.lit(1)).alias("n"))
    )
    spark = a.sparkSession
    cats = spark.createDataFrame(
        [("added",), ("removed",), ("changed",), ("unchanged",)],
        f"{STATUS_COL} string",
    )
    return cats.join(observed, STATUS_COL, "left").select(
        STATUS_COL, F.coalesce(F.col("n"), F.lit(0)).alias("n")
    )
