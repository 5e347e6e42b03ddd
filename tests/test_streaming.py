"""Batch ≡ stream equivalence — the streaming extension's contract
(SURVEY §7 step 7)."""

from __future__ import annotations

from tests.conftest import SF_DIR


def test_tumbling_window_batch_equals_stream(spark):
    from etl_data_lake_spark.queries.golden import events_tumbling_window_1h
    from etl_data_lake_spark.streaming.events import (
        event_stream,
        run_available_now,
        tumbling_counts,
    )

    batch = {
        tuple(r)
        for r in events_tumbling_window_1h(spark, SF_DIR).collect()
    }
    stream_df = tumbling_counts(event_stream(spark, SF_DIR))
    got = {tuple(r) for r in run_available_now(stream_df, "tumble").collect()}
    assert got == batch


def test_stateful_sessionizer_closed_sessions_match_batch(spark):
    """applyInPandasWithState sessionizer: every CLOSED session the
    stream emits must match the batch sessionizer's (count per
    session); open sessions stay in state until timeout."""
    from pyspark.sql import functions as F

    from etl_data_lake_spark.operators.windows import sessionize
    from etl_data_lake_spark.sources.catalog import load_table
    from etl_data_lake_spark.streaming.events import (
        event_stream,
        run_available_now,
        sessionize_stream,
    )

    events = load_table(spark, SF_DIR, "events")
    batch = {
        (r.user_id, r.session_id, r.n_events)
        for r in sessionize(events, "user_id", "ts", 30)
        .groupBy("user_id", "session_id")
        .agg(F.count("*").alias("n_events"))
        .collect()
    }
    stream = sessionize_stream(event_stream(spark, SF_DIR), gap_minutes=30)
    got = {
        (r.user_id, r.session_id, r.n_events)
        for r in run_available_now(stream, "sess", output_mode="append").collect()
    }
    assert got, "stream emitted no closed sessions"
    assert got <= batch, f"stream emitted sessions batch doesn't have: {got - batch}"
    # most sessions close within the fixture's time range
    assert len(got) >= len(batch) * 0.5


def test_foreach_batch_upsert_latest_wins(spark, tmp_path):
    """Stream of user-level records with later corrections: the upsert
    sink keeps exactly one row per key — the newest."""
    import json

    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from etl_data_lake_spark.streaming.upsert import run_upsert_backfill

    schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("level", StringType()),
            StructField("updated_at", LongType()),
        ]
    )
    src = tmp_path / "src"
    src.mkdir()
    (src / "a.json").write_text(
        "\n".join(
            json.dumps(r)
            for r in [
                {"user_id": 1, "level": "free", "updated_at": 100},
                {"user_id": 2, "level": "free", "updated_at": 100},
                {"user_id": 3, "level": "paid", "updated_at": 100},
            ]
        )
    )
    (src / "b.json").write_text(
        "\n".join(
            json.dumps(r)
            for r in [
                {"user_id": 1, "level": "paid", "updated_at": 200},  # correction
                {"user_id": 4, "level": "free", "updated_at": 150},  # new key
            ]
        )
    )
    out = str(tmp_path / "users_table")
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1
    ).json(str(src))
    run_upsert_backfill(stream, out, ["user_id"], "updated_at")

    got = {
        r.user_id: (r.level, r.updated_at)
        for r in spark.read.parquet(out).collect()
    }
    assert got == {
        1: ("paid", 200),
        2: ("free", 100),
        3: ("paid", 100),
        4: ("free", 150),
    }


def test_stream_static_enrichment_batch_equals_stream(spark):
    """Stream-static broadcast enrichment: the same plan over a batch
    frame and an availableNow stream produces identical windowed
    per-segment aggregates, and no event is dropped by the left join."""
    from etl_data_lake_spark.sources.catalog import load_table
    from etl_data_lake_spark.streaming.events import (
        enriched_segment_counts,
        event_stream,
        run_available_now,
    )

    from pyspark.sql import functions as F

    customer = load_table(spark, SF_DIR, "customer")
    ev_batch = load_table(spark, SF_DIR, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    batch = {
        tuple(r)
        for r in enriched_segment_counts(ev_batch, customer).collect()
    }
    stream_df = enriched_segment_counts(event_stream(spark, SF_DIR), customer)
    got = {
        tuple(r)
        for r in run_available_now(
            stream_df, "enrich_seg", shuffle_partitions=8
        ).collect()
    }
    assert got == batch
    # nothing dropped: window x segment counts sum to the event count
    assert sum(r[2] for r in got) == ev_batch.count()


def test_streaming_funnel_matches_batch(spark):
    """funnel_stream ≡ the batch greedy funnel for every funnel whose
    outcome is final: completed funnels emit on the spot; partial
    funnels emit when the final event-time watermark strictly passes
    anchor + within; still-open funnels stay unemitted."""
    from datetime import timezone

    from pyspark.sql import functions as F

    from etl_data_lake_spark.operators.funnel import funnel_times
    from etl_data_lake_spark.sources.catalog import load_table
    from etl_data_lake_spark.streaming.events import (
        event_stream,
        funnel_stream,
        run_available_now,
    )

    steps = ("signup", "view", "purchase")
    within = 6 * 3600.0

    got = {
        (r["user_id"], r["n_steps"], r["anchor_sec"])
        for r in run_available_now(
            funnel_stream(event_stream(spark, SF_DIR), steps, within),
            "funnel_s",
            output_mode="append",
            shuffle_partitions=8,
        ).collect()
    }

    ev = load_table(spark, SF_DIR, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    times = funnel_times(ev, steps, within_s=within)
    max_ts_ms = ev.agg(
        F.floor(F.max(F.unix_micros("ts")) / 1000).alias("m")
    ).collect()[0]["m"]
    want = set()
    for r in times.collect():
        depth = sum(
            1 for i in range(1, len(steps) + 1) if r[f"step{i}_ts"] is not None
        )
        anchor_us = r["step1_ts"].replace(tzinfo=timezone.utc).timestamp()
        deadline_ms = int((anchor_us + within) * 1000)
        if depth == len(steps) or max_ts_ms > deadline_ms:
            want.add((r["user_id"], depth, anchor_us))
    assert got == want
    # the test is only meaningful if it exercises all three clauses
    depths = {d for _, d, _ in want}
    assert len(want) > 0 and len(depths) > 1


def test_streaming_funnel_repeated_step_types(spark, tmp_path):
    """A funnel may repeat a step type (view -> view -> purchase): the
    matcher compares by POSITION, not a type->index map (review
    regression — the dict form never anchored)."""
    from datetime import datetime, timedelta

    from pyspark.sql import functions as F

    from etl_data_lake_spark.streaming.events import (
        event_stream,
        funnel_stream,
        run_available_now,
    )

    t0 = datetime(2024, 1, 1)

    def ev(i, ts_s, uid, et):
        return (i, t0 + timedelta(seconds=ts_s), uid, et, 1.0, "{}")

    rows = [
        # user 1 completes: view, view, purchase
        ev(1, 0, 1, "view"), ev(2, 10, 1, "view"), ev(3, 20, 1, "purchase"),
        # user 2 stalls at depth 1 (no second view; purchase ignored)
        ev(4, 0, 2, "view"), ev(5, 5, 2, "purchase"),
        # far-future event pushes the final watermark past anchor+within
        ev(6, 10_000, 3, "click"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string"
    )
    src = str(tmp_path / "ev")
    df.coalesce(1).write.parquet(f"{src}/events.parquet")
    steps = ("view", "view", "purchase")
    got = {
        (r["user_id"], r["n_steps"])
        for r in run_available_now(
            funnel_stream(event_stream(spark, src), steps, within_s=100),
            "funnel_rep",
            output_mode="append",
            shuffle_partitions=4,
        ).collect()
    }
    assert got == {(1, 3), (2, 1)}


def test_streaming_funnel_no_reanchor_across_microbatches(spark, tmp_path):
    """A user who completed their funnel in one micro-batch must NOT
    re-anchor a second funnel from later micro-batches: batch
    funnel_times emits one row per user (earliest anchor), and the
    stream keeps a completed tombstone in state to match (review
    regression — state.remove() after emission let a second identical
    funnel through)."""
    import os
    from datetime import datetime, timedelta

    from etl_data_lake_spark.streaming.events import (
        event_stream,
        funnel_stream,
        run_available_now,
    )

    t0 = datetime(2024, 1, 1)

    def ev(i, ts_s, uid, et):
        return (i, t0 + timedelta(seconds=ts_s), uid, et, 1.0, "{}")

    schema = (
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )
    src = tmp_path / "ev" / "events.parquet"
    # micro-batch 1: user 1 completes view->purchase
    spark.createDataFrame(
        [ev(1, 0, 1, "view"), ev(2, 10, 1, "purchase")], schema
    ).coalesce(1).write.mode("append").parquet(str(src))
    parts1 = {p for p in os.listdir(src) if p.startswith("part-")}
    # micro-batch 2: the same user does the whole funnel AGAIN
    spark.createDataFrame(
        [ev(3, 20, 1, "view"), ev(4, 30, 1, "purchase")], schema
    ).coalesce(1).write.mode("append").parquet(str(src))
    # force discovery order: batch-1 part older than batch-2 part
    for p in os.listdir(src):
        if not p.startswith("part-"):
            continue
        age = 100 if p in parts1 else 200
        os.utime(src / p, (age, age))

    rows = run_available_now(
        funnel_stream(
            event_stream(
                spark, str(tmp_path / "ev"), max_files_per_trigger=1
            ),
            ("view", "purchase"),
            within_s=100,
        ),
        "funnel_tomb",
        output_mode="append",
        shuffle_partitions=4,
    ).collect()
    assert [(r["user_id"], r["n_steps"]) for r in rows] == [(1, 2)]


def test_streaming_funnel_sorts_across_arrow_chunks(spark, tmp_path):
    """The greedy matcher must sort the user's WHOLE micro-batch slice,
    not each Arrow chunk independently (review regression): with
    maxRecordsPerBatch=5 and the file written time-DESCENDING, the
    purchase reaches the matcher chunks before the view — chunk-local
    ordering would leave the funnel stuck at depth 1."""
    from datetime import datetime, timedelta

    from etl_data_lake_spark.streaming.events import (
        event_stream,
        funnel_stream,
        run_available_now,
    )

    t0 = datetime(2024, 1, 1)

    def ev(i, ts_s, uid, et):
        return (i, t0 + timedelta(seconds=ts_s), uid, et, 1.0, "{}")

    # FILE ORDER: purchase@50 first, 10 fillers, view@10 last — at
    # 5-row Arrow chunks the purchase lands two chunks before the view
    rows = [ev(1, 50, 1, "purchase")]
    rows += [ev(10 + i, 60 + i, 1, "click") for i in range(10)]
    rows += [ev(99, 10, 1, "view")]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string",
    )
    src = str(tmp_path / "ev")
    df.coalesce(1).write.parquet(f"{src}/events.parquet")

    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "5")
    try:
        got = {
            (r["user_id"], r["n_steps"])
            for r in run_available_now(
                funnel_stream(
                    event_stream(spark, src), ("view", "purchase"), 100.0
                ),
                "funnel_chunk",
                output_mode="append",
                shuffle_partitions=4,
            ).collect()
        }
    finally:
        spark.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", prev
        )
    assert got == {(1, 2)}


def test_streaming_funnel_late_anchor_emits_in_data_path(spark, tmp_path):
    """A user who anchors AFTER the watermark already passed their
    deadline (very late anchor event in the final micro-batch) emits
    immediately in the data path (ADVICE r8): the old deferred timer
    at watermark+1 required a further watermark advance the final
    batch never provides, silently diverging from the batch oracle's
    'final watermark passes anchor+within' clause."""
    import os
    from datetime import datetime, timedelta

    from etl_data_lake_spark.streaming.events import (
        event_stream,
        funnel_stream,
        run_available_now,
    )

    t0 = datetime(2024, 1, 1)

    def ev(i, ts_s, uid, et):
        return (i, t0 + timedelta(seconds=ts_s), uid, et, 1.0, "{}")

    schema = (
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )
    src = tmp_path / "ev" / "events.parquet"
    # micro-batch 1: far-future filler pushes the watermark to 10000s
    spark.createDataFrame(
        [ev(1, 10_000, 99, "click")], schema
    ).coalesce(1).write.mode("append").parquet(str(src))
    parts1 = {p for p in os.listdir(src) if p.startswith("part-")}
    # micro-batch 2 (FINAL): user 1 anchors at ts=100 — deadline 200
    # is 9800s behind the watermark; the batch leaves the watermark
    # at 10000, so a deferred timer at watermark+1 would never fire
    spark.createDataFrame(
        [ev(2, 100, 1, "view")], schema
    ).coalesce(1).write.mode("append").parquet(str(src))
    for p in os.listdir(src):
        if p.startswith("part-"):
            age = 100 if p in parts1 else 200
            os.utime(src / p, (age, age))

    rows = run_available_now(
        funnel_stream(
            event_stream(
                spark, str(tmp_path / "ev"), max_files_per_trigger=1
            ),
            ("view", "purchase"),
            within_s=100,
        ),
        "funnel_late_anchor",
        output_mode="append",
        shuffle_partitions=4,
    ).collect()
    assert [(r["user_id"], r["n_steps"]) for r in rows] == [(1, 1)]


def test_streaming_funnel_tombstone_ttl_bounds_state(spark, tmp_path):
    """With tombstone_ttl_s set, an emitted user's tombstone is REAPED
    once the watermark passes anchor+within+ttl (ADVICE r8: bounded
    state) — so a funnel run entirely after the TTL re-anchors and
    emits a second row. Without the TTL (the default) the same replay
    emits exactly once (pinned by
    test_streaming_funnel_no_reanchor_across_microbatches)."""
    import os
    from datetime import datetime, timedelta

    from etl_data_lake_spark.streaming.events import (
        event_stream,
        funnel_stream,
        run_available_now,
    )

    t0 = datetime(2024, 1, 1)

    def ev(i, ts_s, uid, et):
        return (i, t0 + timedelta(seconds=ts_s), uid, et, 1.0, "{}")

    schema = (
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )
    src = tmp_path / "ev" / "events.parquet"
    batches = [
        # batch 1: user 1 completes (anchor 0, within 100, ttl 500 →
        # tombstone reap timer at 600)
        [ev(1, 0, 1, "view"), ev(2, 10, 1, "purchase")],
        # batch 2: filler advances the watermark to 10000 > 600
        [ev(3, 10_000, 99, "click")],
        # batch 3: user 1 has NO data → the reap timer fires, state
        # removed (another filler keeps the stream moving)
        [ev(4, 10_001, 99, "click")],
        # batch 4: user 1 funnels again, entirely past the TTL
        [ev(5, 11_000, 1, "view"), ev(6, 11_010, 1, "purchase")],
    ]
    ages = iter(range(100, 100 + 100 * len(batches), 100))
    seen: set[str] = set()
    for batch in batches:
        spark.createDataFrame(batch, schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))
        age = next(ages)
        for p in os.listdir(src):
            if p.startswith("part-") and p not in seen:
                os.utime(src / p, (age, age))
                seen.add(p)

    rows = run_available_now(
        funnel_stream(
            event_stream(
                spark, str(tmp_path / "ev"), max_files_per_trigger=1
            ),
            ("view", "purchase"),
            within_s=100,
            tombstone_ttl_s=500,
        ),
        "funnel_ttl",
        output_mode="append",
        shuffle_partitions=4,
    ).collect()
    got = sorted((r["user_id"], r["n_steps"], r["anchor_sec"]) for r in rows)
    anchors = [a for _, _, a in got]
    assert [(u, n) for u, n, _ in got] == [(1, 2), (1, 2)]
    assert anchors[1] - anchors[0] == 11_000.0
