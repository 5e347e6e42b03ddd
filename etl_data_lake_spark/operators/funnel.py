"""Funnel / ordered-sequence analytics over an event table — "of the
users who did A, how many then did B, then C?" with an optional
conversion window. The behavioral-analytics query family
(MATCH_RECOGNIZE-lite) the reference's event pipeline feeds but never
answers itself.

Semantics (the standard product-analytics funnel):

* step 1 anchors at the user's EARLIEST qualifying event;
* step i>1 matches the earliest qualifying event STRICTLY AFTER the
  user's step i-1 time (order matters — a purchase before the click
  does not convert the click);
* with ``within_s`` set, every step must land at most that many
  seconds after the step-1 anchor (day-time interval arithmetic —
  exact at microsecond granularity and valid for both ``timestamp``
  and ``timestamp_ntz`` event columns);
* a user missing step i contributes to no step >= i.

This greedy earliest-match is the common funnel definition
(first-touch anchoring). It can miss sequences a backtracking matcher
would find (an early step-2 event consumed before a later step-1
anchor that would have worked), which is the accepted trade-off in
every production funnel engine — document, don't backtrack.

Scale shape (100 TB of events): one shuffle of the per-step event
SUBSET keyed by user per step — the full event table never shuffles;
each step's filtered slice aggregates map-side (min) before the
exchange, and every post-step-1 join keys on the same user column so
AQE/exchange reuse keeps the per-user frame in place. k (funnel
length) is small and user-facing; the plan is k joins of
per-user-sized frames, not a self-join of events. No Python, no
window over unpartitioned data, no collect.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _step_col(i: int) -> str:
    return f"step{i}_ts"


def funnel_times(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within_s: float | None = None,
    salts: int | None = None,
) -> DataFrame:
    """→ one row per user who completed step 1: ``user_col`` plus
    ``step1_ts .. stepK_ts`` (timestamp of the earliest match per the
    semantics above; null once the sequence breaks).

    ``salts`` hardens the per-step joins against a WHALE user (bot
    traffic concentrating one key): the step-event side takes a
    physical salt (operators/skew's construction), the one-row-per-
    user funnel frame explodes ``salts`` ways, the join keys on
    (user, salt), and the per-step MIN aggregates two-phase —
    (user, salt) partials, then the user combine — so the hot user's
    events spread over ``salts`` reducers end to end. Results are
    IDENTICAL to the unsalted plan (min is algebraic; pinned in
    tests/test_funnel.py); cost is a ``salts``-times replication of
    the per-user frame. Step 1 needs no salt: its min aggregates
    map-side before any shuffle. AQE's skew-join split (on in
    session.py) covers moderate skew at runtime without any of this;
    the explicit salt is for the single-key extreme AQE can't split —
    the same escalation documented in operators/skew."""
    if len(steps) < 1:
        raise ValueError("steps must name at least one event type")
    if within_s is not None and within_s <= 0:
        raise ValueError(f"within_s must be positive, got {within_s}")
    if salts is not None and salts < 2:
        raise ValueError(f"salts must be >= 2, got {salts}")
    ts = F.col(ts_col)
    cur = (
        events.where(F.col(type_col) == steps[0])
        .groupBy(F.col(user_col).alias("_u"))
        .agg(F.min(ts).alias(_step_col(1)))
    )
    for i, step in enumerate(steps[1:], start=2):
        prev = F.col(_step_col(i - 1))
        ev = events.where(F.col(type_col) == step).select(
            F.col(user_col).alias("_eu"), ts.alias("_ets")
        )
        prev_cols = [_step_col(j) for j in range(1, i)]
        if salts is not None:
            from etl_data_lake_spark.operators.skew import _salt

            ev = ev.withColumn("__salt", _salt(ev, salts))
            cur = cur.withColumn(
                "__salt",
                F.explode(F.array(*[F.lit(s) for s in range(salts)])),
            )
        cond = (cur["_u"] == ev["_eu"]) & (F.col("_ets") > prev)
        if salts is not None:
            cond = cond & (cur["__salt"] == ev["__salt"])
        if within_s is not None:
            cond = cond & (
                F.col("_ets")
                <= F.col(_step_col(1))
                + F.expr(f"make_dt_interval(0, 0, 0, {within_s!r})")
            )
        joined = cur.join(ev, cond, "left").drop(ev["__salt"]) if (
            salts is not None
        ) else cur.join(ev, cond, "left")
        if salts is not None:
            # two-phase min: (user, salt) partials, then the combine
            cur = (
                joined.groupBy("_u", "__salt", *prev_cols)
                .agg(F.min("_ets").alias("__partial"))
                .groupBy("_u", *prev_cols)
                .agg(F.min("__partial").alias(_step_col(i)))
            )
        else:
            cur = joined.groupBy("_u", *prev_cols).agg(
                F.min("_ets").alias(_step_col(i))
            )
    return cur.withColumnRenamed("_u", user_col)


def funnel_counts(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within_s: float | None = None,
    salts: int | None = None,
) -> DataFrame:
    """→ one row per funnel step: ``step`` (1-based), ``step_name``,
    ``n_users`` reaching it, ``frac_of_first`` and ``frac_of_prev``
    conversion rates (step 1 reports 1.0 for both; every rate is an
    IEEE double both engines reproduce bit-identically). Rows come out
    in step order under an ORDER BY on ``step``."""
    times = funnel_times(
        events, steps, user_col, ts_col, type_col, within_s, salts
    )
    counts = times.agg(
        *[
            F.count(F.col(_step_col(i))).alias(f"_n{i}")
            for i in range(1, len(steps) + 1)
        ]
    )
    per_step = [
        F.struct(
            F.lit(i).alias("step"),
            F.lit(name).alias("step_name"),
            F.col(f"_n{i}").alias("n_users"),
            (F.col(f"_n{i}") / F.col("_n1")).alias("frac_of_first"),
            (
                F.col(f"_n{i}") / F.col(f"_n{max(i - 1, 1)}")
            ).alias("frac_of_prev"),
        )
        for i, name in enumerate(steps, start=1)
    ]
    # the single-partition orderBy (WindowExec-style "no partition"
    # warning in logs) runs over exactly k rows — one per funnel step —
    # by design; the data-sized work all happened in funnel_times
    return (
        counts.select(F.explode(F.array(*per_step)).alias("s"))
        .select("s.*")
        .orderBy("step")
    )
