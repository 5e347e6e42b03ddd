"""Funnel / ordered-sequence analytics (operators/funnel.py):
first-touch anchoring, strictly-after ordering, conversion-window
cutoffs, monotone step counts."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from etl_data_lake_spark.operators.funnel import funnel_counts, funnel_times


def _ts(s):
    return datetime.fromisoformat(f"2024-01-01 {s}")


def _events(spark):
    rows = [
        # u1 converts fully, in order
        (1, _ts("10:00:00"), "view"),
        (1, _ts("10:05:00"), "click"),
        (1, _ts("10:20:00"), "purchase"),
        # u2: purchase BEFORE the click — must not count as step 3
        (2, _ts("11:00:00"), "view"),
        (2, _ts("11:01:00"), "purchase"),
        (2, _ts("11:02:00"), "click"),
        # u3: click at the SAME instant as the view — strictly-after
        # rejects it; the later click anchors step 2
        (3, _ts("12:00:00"), "view"),
        (3, _ts("12:00:00"), "click"),
        (3, _ts("12:30:00"), "click"),
        # u4: never views — not in the funnel at all
        (4, _ts("13:00:00"), "click"),
        (4, _ts("13:01:00"), "purchase"),
        # u5: views twice; anchor is the EARLIEST view, the click
        # between the views still matches step 2
        (5, _ts("14:00:00"), "view"),
        (5, _ts("14:10:00"), "click"),
        (5, _ts("14:20:00"), "view"),
    ]
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )


STEPS = ("view", "click", "purchase")


def test_times_hand_computed(spark):
    got = {
        r["user_id"]: (r["step1_ts"], r["step2_ts"], r["step3_ts"])
        for r in funnel_times(_events(spark), STEPS).collect()
    }
    assert set(got) == {1, 2, 3, 5}  # u4 never anchored
    assert got[1] == (_ts("10:00:00"), _ts("10:05:00"), _ts("10:20:00"))
    # u2's purchase precedes the click: sequence breaks at step 3
    assert got[2] == (_ts("11:00:00"), _ts("11:02:00"), None)
    # u3's simultaneous click rejected, later one anchors; no purchase
    assert got[3] == (_ts("12:00:00"), _ts("12:30:00"), None)
    assert got[5] == (_ts("14:00:00"), _ts("14:10:00"), None)


def test_counts_and_rates(spark):
    rows = funnel_counts(_events(spark), STEPS).collect()
    assert [(r["step"], r["step_name"], r["n_users"]) for r in rows] == [
        (1, "view", 4),
        (2, "click", 4),
        (3, "purchase", 1),
    ]
    assert rows[0]["frac_of_first"] == 1.0 and rows[0]["frac_of_prev"] == 1.0
    assert rows[2]["frac_of_first"] == 0.25 and rows[2]["frac_of_prev"] == 0.25


def test_conversion_window(spark):
    # 10-minute window from the step-1 anchor: u1's purchase at +20min
    # drops, the click at +5min stays; boundary is inclusive (<=)
    got = {
        r["user_id"]: (r["step2_ts"], r["step3_ts"])
        for r in funnel_times(
            _events(spark), STEPS, within_s=600
        ).collect()
    }
    assert got[1] == (_ts("10:05:00"), None)
    # exactly-at-boundary: u5's click at +600s counts
    assert got[5] == (_ts("14:10:00"), None)


def test_monotone_and_layout_invariant(spark):
    ev = _events(spark)
    a = funnel_counts(ev, STEPS).collect()
    ns = [r["n_users"] for r in a]
    assert ns == sorted(ns, reverse=True)
    b = funnel_counts(ev.repartition(7), STEPS).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_validation(spark):
    ev = _events(spark)
    with pytest.raises(ValueError, match="at least one"):
        funnel_times(ev, ())
    with pytest.raises(ValueError, match="within_s"):
        funnel_times(ev, STEPS, within_s=0)


def test_corpus_funnel_pushdown_and_no_event_shuffle(spark):
    """On the real events table: the per-step filters reach the scan
    (each step reads a pruned slice, never the whole table per join)
    and results stay monotone."""
    from etl_data_lake_spark.plans.inspect import plan_string
    from etl_data_lake_spark.sources.catalog import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    cnt = funnel_counts(ev, ("signup", "view", "purchase"))
    rows = cnt.collect()
    ns = [r["n_users"] for r in rows]
    assert ns == sorted(ns, reverse=True) and ns[0] > 0
    plan = plan_string(cnt)
    assert "PushedFilters" in plan and "event_type" in plan
    assert "Python" not in plan


def test_salted_funnel_identical_results(spark):
    """salts= spreads a whale user's step events over (user, salt)
    reducers; the two-phase min must reproduce the unsalted funnel
    EXACTLY — on the hand-built cases and on a planted whale."""
    ev = _events(spark)
    base = {tuple(r) for r in funnel_times(ev, STEPS, within_s=3600).collect()}
    salted = {
        tuple(r)
        for r in funnel_times(ev, STEPS, within_s=3600, salts=4).collect()
    }
    assert salted == base

    # whale: user 99 fires 5k clicks around one view + purchase
    whale = [(99, _ts("10:00:00"), "view")]
    whale += [
        (99, _ts(f"10:{m:02d}:{s:02d}"), "click")
        for m in range(5, 50)
        for s in range(0, 60, 1)
    ]
    whale += [(99, _ts("10:59:00"), "purchase")]
    big = ev.unionByName(
        spark.createDataFrame(
            whale, "user_id long, ts timestamp, event_type string"
        )
    )
    a = {tuple(r) for r in funnel_times(big, STEPS).collect()}
    b = {tuple(r) for r in funnel_times(big, STEPS, salts=8).collect()}
    assert a == b
    w = next(r for r in funnel_times(big, STEPS, salts=8).collect()
             if r["user_id"] == 99)
    assert w["step2_ts"] == _ts("10:05:00")
    assert w["step3_ts"] == _ts("10:59:00")


def test_salted_funnel_plan_shape(spark):
    """Plan pin: the salted variant joins on (user, salt) — the salt
    column reaches the join keys/exchange — and aggregates the step
    min two-phase (a (user, salt) partial grouping precedes the user
    combine). Unsalted plans must stay salt-free."""
    from etl_data_lake_spark.plans.inspect import plan_string

    ev = _events(spark)
    salted_plan = plan_string(funnel_times(ev, STEPS, salts=4))
    assert "__salt" in salted_plan
    assert "__partial" in salted_plan
    plain_plan = plan_string(funnel_times(ev, STEPS))
    assert "__salt" not in plain_plan
    with pytest.raises(ValueError, match="salts"):
        funnel_times(ev, STEPS, salts=1)
