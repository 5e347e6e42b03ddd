"""Declarative data-quality expectations — validate a table against
named rules in ONE aggregation job, and split it into valid /
quarantined frames. The Delta-Live-Tables / Great-Expectations surface
an ingest pipeline runs between "files landed" and "table published";
the reference pipeline has implicit expectations (dropna on key
columns, dedup on natural keys — etl.py's silent assumptions) that
this operator makes explicit, named, and countable.

Two rule kinds:

* ROW expectations — a boolean Column per rule (``F.col("x") > 0``,
  ``F.col("id").isNotNull()``...). Violations are counted for ALL
  rules in one pass: the report aggregate computes every rule's
  failure count map-side in a single scan (no per-rule jobs), then
  unpivots in-plan with ``stack`` exactly like operators/profile.
* UNIQUENESS — ``unique=("k1", ...)`` adds a ``unique(k1,...)`` row
  counting rows beyond the first per key group (requires one extra
  keyed aggregate; Spark still runs both in the same job tree).

``quarantine`` tags each row with the array of rule names it violates
(pure codegen — conditional single-element arrays concatenated, no
lambda HOFs, so downstream Arrow stages compose) and returns
(valid, invalid) frames. NULL rule results count as violations, like
CHECK-constraint semantics inverted: an expectation must PROVE the
row, UNKNOWN is not proof. (sources/txn.py CHECK constraints guard
writes with the opposite convention — SQL's "violates only if FALSE";
an expectation report is an audit, so it surfaces UNKNOWN instead of
waving it through.)

Scale: the report is one scan + a 1-row aggregate (+ one keyed
aggregate per unique spec, map-side combined); quarantine is a
projection. Nothing collects, nothing is per-rule.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_VIOL_COL = "_violations"


def _holds(cond: Column) -> Column:
    # TRUE passes; FALSE and NULL are violations
    return F.coalesce(cond, F.lit(False))


def expectations_report(
    df: DataFrame,
    rules: dict[str, Column],
    unique: tuple[tuple[str, ...], ...] = (),
) -> DataFrame:
    """→ one row per rule: ``rule``, ``n_rows``, ``n_violations``,
    ``violation_frac``, ``passed`` (zero violations)."""
    if not rules and not unique:
        raise ValueError("no expectations given")
    # internal columns aliased by INDEX, never by rule name: user rule
    # names are arbitrary strings (dots/backticks would break F.col
    # re-resolution); names surface only as stack literals. Sums are
    # coalesced so an EMPTY input reports 0 violations / passed=true
    # (an all-NULL audit row would flip a falsy-gate check).
    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, (name, cond) in enumerate(rules.items()):
        aggs.append(
            F.coalesce(
                F.sum(F.when(~_holds(cond), 1).otherwise(0)), F.lit(0)
            ).alias(f"_v_{i}")
        )
    wide = df.agg(*aggs)
    for i, keys in enumerate(unique):
        dup = df.groupBy(*[F.col(k) for k in keys]).agg(
            F.count(F.lit(1)).alias("_c")
        )
        extra = dup.agg(
            F.coalesce(F.sum(F.col("_c") - 1), F.lit(0)).alias(
                f"_u_{i}"
            )
        )
        wide = wide.crossJoin(F.broadcast(extra))
    names = list(rules.keys()) + [
        f"unique({','.join(k)})" for k in unique
    ]
    exprs = [f"_v_{i}" for i in range(len(rules))] + [
        f"_u_{i}" for i in range(len(unique))
    ]
    stack_args = []
    for n, e in zip(names, exprs):
        stack_args += [F.lit(n), F.col(e).cast("long")]
    return wide.select(
        F.col("_n").alias("_rows"),
        F.stack(F.lit(len(names)), *stack_args).alias(
            "rule", "n_violations"
        ),
    ).select(
        "rule",
        F.col("_rows").alias("n_rows"),
        "n_violations",
        F.when(F.col("_rows") > 0, F.col("n_violations") / F.col("_rows"))
        .otherwise(F.lit(0.0))
        .alias("violation_frac"),
        (F.col("n_violations") == 0).alias("passed"),
    )


def quarantine(
    df: DataFrame,
    rules: dict[str, Column],
    keep_tag: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """→ ``(valid, invalid)``. Invalid rows carry ``_violations`` —
    the array of violated rule names (dropped when ``keep_tag`` is
    False); valid rows keep the input schema exactly."""
    if not rules:
        raise ValueError("no expectations given")
    if _VIOL_COL in df.columns:
        raise ValueError(f"input already has a {_VIOL_COL!r} column")
    pieces = [
        F.when(~_holds(cond), F.array(F.lit(name))).otherwise(
            F.array().cast("array<string>")
        )
        for name, cond in rules.items()
    ]
    tagged = df.withColumn(_VIOL_COL, F.concat(*pieces))
    valid = tagged.where(F.size(_VIOL_COL) == 0).drop(_VIOL_COL)
    invalid = tagged.where(F.size(_VIOL_COL) > 0)
    if not keep_tag:
        invalid = invalid.drop(_VIOL_COL)
    return valid, invalid


def orphan_count(
    fact: DataFrame,
    dim: DataFrame,
    on: tuple[str, str],
    broadcast_dim: bool = True,
) -> DataFrame:
    """Referential integrity: count fact rows whose ``on[0]`` has no
    match in ``dim.on[1]`` (null keys count — a null FK proves
    nothing). → one row: ``rule``, ``n_violations``. Broadcast the
    dimension by default; flip off for a dimension too big to ship."""
    d = dim.select(F.col(on[1]).alias("_dk")).distinct()
    if broadcast_dim:
        d = F.broadcast(d)
    orphans = fact.join(
        d, fact[on[0]] == d["_dk"], "left_anti"
    )
    return orphans.agg(
        F.lit(f"fk({on[0]}->{on[1]})").alias("rule"),
        F.count(F.lit(1)).alias("n_violations"),
    )


def expectations_stream_sink(
    spark,
    rules: dict[str, Column],
    valid_path: str,
    quarantine_path: str | None = None,
    mode: str = "drop",
    app_id: str = "__expect_sink__",
):
    """``foreachBatch`` gate (round 9): validate every micro-batch
    against the rules and route it — the streaming form of the DAG's
    expectation gates, for pipelines that ingest continuously instead
    of through builders.

    * ``mode="drop"``: valid rows append to ``valid_path`` (a txn
      table), violating rows — tagged with their violated rule
      names — to ``quarantine_path`` (violations are DISCARDED with a
      warning-free append nowhere if no quarantine path is given;
      pass one — audits beat silence).
    * ``mode="fail"``: ANY violation raises and commits nothing —
      the stream stops on bad data (DLT's expect_or_fail).

    Correctness details that matter:

    * the batch is PERSISTED across the gate and both appends, so the
      rows validated are the rows published (a nondeterministic
      source cannot pass one execution and publish another — the
      round-7 DAG-gate lesson applied to streams);
    * both appends commit with (app_id, batch id) as the idempotence
      key; the keys live per-table, so a crash BETWEEN the two
      appends replays into: valid no-ops, quarantine applies — each
      table exactly-once, no double-publish and no lost quarantine."""
    from etl_data_lake_spark.sources.txn import TxnTable

    if mode not in ("drop", "fail"):
        raise ValueError(f"mode must be 'drop' or 'fail', got {mode!r}")
    if not rules:
        raise ValueError("no expectations given")
    valid_tbl = TxnTable(spark, str(valid_path))
    quar_tbl = (
        TxnTable(spark, str(quarantine_path))
        if quarantine_path is not None
        else None
    )

    def fn(batch_df: DataFrame, batch_id: int) -> None:
        batch_df = batch_df.persist()
        try:
            valid, invalid = quarantine(batch_df, rules)
            if mode == "fail":
                bad = invalid.limit(1).count()
                if bad:
                    sample = invalid.select(_VIOL_COL).first()
                    raise ValueError(
                        f"micro-batch {batch_id} violates expectations "
                        f"{sample[_VIOL_COL]} — mode='fail' commits "
                        "nothing"
                    )
                valid_tbl.append(valid, app_id=app_id, txn_seq=batch_id)
                return
            valid_tbl.append(valid, app_id=app_id, txn_seq=batch_id)
            if quar_tbl is not None:
                quar_tbl.append(
                    invalid, app_id=app_id, txn_seq=batch_id
                )
        finally:
            batch_df.unpersist()

    return fn
