"""Structured Streaming over the events table.

The reference processes its event log as a static batch (etl.py:124,
SURVEY §2.9: no watermarks, no windows, no state). This module is the
streaming-native extension: the SAME aggregation plan as the batch
query ``events_tumbling_window_1h`` under ``readStream``, with
watermark-based late-data handling — plus a custom stateful
sessionizer via ``applyInPandasWithState`` (the operator Spark's
built-ins can't express).

Batch ≡ stream equivalence is the correctness contract
(tests/test_streaming.py): an ``availableNow`` run over the static
parquet must produce exactly the batch result.
"""

from __future__ import annotations

import tempfile
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from etl_data_lake_spark.functions.money import sum_money
from etl_data_lake_spark.session import apply_runtime_confs

def _events_schema(ts_type) -> StructType:
    """Explicit schema (streaming sources cannot infer). ``ts`` is the
    probed scan type — ``timestamp_ntz`` on Spark 4.1+'s native
    TIMESTAMP(NANOS) read (see sources.catalog.load_table, which also
    rejects anything else)."""
    return StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", ts_type),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
            StructField("props", StringType()),
        ]
    )


def event_stream(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """readStream over the events parquet with the batch-identical ts
    normalization (→ tz-aware timestamp under the UTC session)."""
    apply_runtime_confs(spark)
    # one-file batch probe fixes the physical ts type (and rejects
    # pre-4.1 engines); metadata-only, no rows read
    probe = spark.read.parquet(f"{sf_dir.rstrip('/')}/events.parquet")
    ts_type = probe.schema["ts"].dataType
    if ts_type.simpleString() not in ("timestamp_ntz", "timestamp"):
        raise TypeError(
            f"events.ts scanned as {ts_type.simpleString()}; this build "
            "expects Spark 4.1+'s native TIMESTAMP(NANOS) read"
        )
    reader = spark.readStream.schema(_events_schema(ts_type))
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    # glob, not the bare file path: the file-stream source requires a
    # directory (or glob) basePath
    df = reader.parquet(f"{sf_dir.rstrip('/')}/events.parq*")
    # watermark needs a tz-aware timestamp; UTC session makes it equal
    # to the ntz wall-clock used in batch
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


def tumbling_counts(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """1-hour tumbling count+sum per event_type — the streaming twin of
    queries.golden.events_tumbling_window_1h."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window(F.col("ts"), "1 hour").alias("w"), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            sum_money(F.col("value")).alias("total_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sliding_counts(
    events: DataFrame,
    watermark: str = "1 hour",
    size: str = "1 hour",
    slide: str = "15 minutes",
) -> DataFrame:
    """Overlapping windows (each event in size/slide windows) under a
    watermark — the streaming twin of
    queries.advanced_rel.events_sliding_window_1h_15m. State is
    size/slide× the tumbling case; the watermark bounds it."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window(F.col("ts"), size, slide).alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "n_events",
        )
    )


_SESSION_OUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_id", LongType()),
        StructField("n_events", LongType()),
    ]
)
_SESSION_STATE = StructType(
    [
        StructField("last_ts", DoubleType()),
        StructField("session_id", LongType()),
        StructField("n_events", LongType()),
    ]
)


def sessionize_stream(
    events: DataFrame, gap_minutes: int = 30, watermark: str = "0 seconds"
) -> DataFrame:
    """Custom stateful operator: gap-based sessions per user via
    applyInPandasWithState (state = last event time, open session id,
    open session count).

    Sessions close two ways: (a) a later event from the same user
    arrives more than ``gap`` after the previous one, or (b) the
    EVENT-TIME watermark passes ``last_ts + gap`` — the open session
    times out and is emitted. Event-time (not processing-time)
    timeouts keep the operator deterministic: an ``availableNow``
    replay over static data settles as soon as the final watermark is
    reached, with no wall-clock waits, and produces the same sessions
    as the batch sessionizer (operators.windows.sessionize) for every
    session whose gap elapsed before end-of-data.
    """
    gap_s = gap_minutes * 60.0

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            last_ts, sid, n = state.get
            state.remove()
            yield pd.DataFrame(
                {"user_id": [user_id], "session_id": [sid], "n_events": [n]}
            )
            return
        last_ts, sid, n = state.get if state.exists else (None, 0, 0)
        closed: list[tuple[int, int]] = []
        for pdf in pdfs:
            for t in sorted(pdf["ts_sec"].tolist()):
                if last_ts is None:
                    sid, n = 1, 1
                elif t - last_ts > gap_s:
                    closed.append((sid, n))
                    sid, n = sid + 1, 1
                else:
                    n += 1
                last_ts = t
        state.update((last_ts, sid, n))
        # fire when the watermark passes the session-gap deadline
        # (must be strictly beyond the current watermark)
        deadline_ms = int((last_ts + gap_s) * 1000)
        state.setTimeoutTimestamp(
            max(deadline_ms, state.getCurrentWatermarkMs() + 1)
        )
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_id": [s for s, _ in closed],
                    "n_events": [c for _, c in closed],
                }
            )

    prepared = events.withWatermark("ts", watermark).select(
        "user_id",
        F.col("ts"),
        F.unix_timestamp("ts").cast("double").alias("ts_sec"),
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=_SESSION_OUT,
        stateStructType=_SESSION_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def dedup_exactly_once(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """At-least-once delivery → exactly-once processing: drop replayed
    events by ``event_id``, keeping dedup state only for ids whose
    event-time is still inside the watermark (``
    dropDuplicatesWithinWatermark``) — without the watermark bound the
    id set grows forever, which is the failure mode that matters on an
    unbounded 100 TB ingest, not the dedup itself. Emits each id's
    first-seen row (append semantics, no aggregation state)."""
    return (
        events.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["event_id"])
        .select("event_id", "event_type")
    )


def run_available_now(
    result: DataFrame,
    query_name: str = "snap",
    output_mode: str = "complete",
    shuffle_partitions: int | None = None,
    no_data_batch: bool = True,
) -> DataFrame:
    """Execute a streaming DataFrame to completion over the currently
    available data (availableNow trigger → memory sink) and return the
    materialized result as a batch DataFrame.

    ``complete`` for windowed aggregations (append would hold back
    windows the watermark hasn't closed); ``append`` for stateful
    flatMap-style operators which mandate it.

    ``shuffle_partitions`` overrides the STATE-STORE partition count
    for this stream only (the conf is read at stream start and then
    frozen into the checkpoint; restored afterwards). Stateful-op
    results are partition-count-invariant — what changes is the fixed
    per-run floor of initializing one HDFS-backed state store per
    partition per stateful operator, which dominates a bounded
    availableNow replay at test scale. A long-lived cluster deployment
    sizes this to throughput instead (it is a conf, not a code
    shape).

    ``no_data_batch=False`` skips the trailing empty micro-batch Spark
    otherwise runs to advance the watermark after the data is consumed
    (``spark.sql.streaming.noDataMicroBatches.enabled``, restored
    afterwards). ONLY valid for plans whose emitted set does not
    depend on that final watermark advance: inner stream-stream joins
    (matches emit on arrival; the extra batch only evicts state),
    complete-mode windowed aggregations (every batch re-emits the full
    result), and watermark-bounded dedup (first-seen rows emit on
    arrival). Plans with EVENT-TIME TIMEOUTS (the sessionizer, the
    funnel) and append-mode windowed aggregations NEED the final batch
    — their timer-flushed / watermark-closed rows are emitted by it —
    so they must keep the default. Each opt-out here is pinned by the
    entry's batch≡stream oracle. The saving is one full micro-batch
    cycle (per-batch planning + one state-store pass per partition per
    stateful operator) on every bounded replay."""
    spark = result.sparkSession
    prev = None
    prev_ndb = None
    try:
        if shuffle_partitions is not None:
            prev = spark.conf.get("spark.sql.shuffle.partitions")
            spark.conf.set(
                "spark.sql.shuffle.partitions", str(shuffle_partitions)
            )
        if not no_data_batch:
            prev_ndb = spark.conf.get(
                "spark.sql.streaming.noDataMicroBatches.enabled", "true"
            )
            spark.conf.set(
                "spark.sql.streaming.noDataMicroBatches.enabled", "false"
            )
        with tempfile.TemporaryDirectory() as ckpt:
            q = (
                result.writeStream.format("memory")
                .queryName(query_name)
                .outputMode(output_mode)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
        if prev_ndb is not None:
            spark.conf.set(
                "spark.sql.streaming.noDataMicroBatches.enabled", prev_ndb
            )
    return spark.table(query_name)


def attribution_join(
    events: DataFrame, window_minutes: int = 10, watermark: str = "1 hour"
) -> DataFrame:
    """Stream-stream inner join: each purchase attributed to every
    click by the same user in the preceding ``window_minutes``.

    Both sides carry watermarks and the join condition bounds event
    time — the two requirements that let Spark EVICT join state (a
    click older than the window + watermark can never match again).
    Without the time bound the state grows forever; this is the
    canonical stream-stream join shape.
    """
    clicks = (
        events.where(F.col("event_type") == "click")
        .select(
            F.col("user_id"),
            F.col("ts").alias("click_ts"),
            F.col("event_id").alias("click_id"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        events.where(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    cond = (
        (clicks.user_id == purchases.p_user_id)
        & (purchases.purchase_ts >= clicks.click_ts)
        & (
            purchases.purchase_ts
            < clicks.click_ts + F.expr(f"INTERVAL {window_minutes} MINUTES")
        )
    )
    return clicks.join(purchases, cond).select(
        "user_id",
        "click_id",
        F.date_format("click_ts", "yyyy-MM-dd HH:mm:ss").alias("click_time"),
        F.date_format("purchase_ts", "yyyy-MM-dd HH:mm:ss").alias(
            "purchase_time"
        ),
        "purchase_value",
    )


def enriched_segment_counts(
    events: DataFrame, customer: DataFrame, watermark: str = "1 hour"
) -> DataFrame:
    """STREAM-STATIC enrichment join + windowed aggregate: each event
    joins its user's market segment from the static customer dimension,
    then 1-hour tumbling count+sum per segment.

    The static side is planned ONCE and broadcast into every
    micro-batch — a stream-static equi-join is STATELESS (no watermark
    needed on the join itself, no join state store; only the windowed
    aggregate downstream keeps state). This is the canonical streaming
    enrichment shape: at cluster scale the dimension snapshot rides the
    broadcast, and a slowly-changing dimension is a foreachBatch
    re-read instead. Left join: an event without a dimension row keeps
    flowing (labeled ``<unknown>``) — enrichment must never drop
    facts. Works identically on a BATCH events frame (withWatermark is
    a no-op there), which is exactly what the batch≡stream test pins.
    """
    dim = F.broadcast(
        customer.select(
            F.col("c_custkey").alias("_ck"),
            F.col("c_mktsegment").alias("_seg"),
        )
    )
    enriched = (
        events.withWatermark("ts", watermark)
        .join(dim, F.col("user_id") == F.col("_ck"), "left")
        .withColumn("mktsegment", F.coalesce("_seg", F.lit("<unknown>")))
    )
    return (
        enriched.groupBy(
            F.window(F.col("ts"), "1 hour").alias("w"), F.col("mktsegment")
        )
        .agg(
            F.count("*").alias("n_events"),
            sum_money(F.col("value")).alias("total_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "mktsegment",
            "n_events",
            "total_value",
        )
    )


_FUNNEL_OUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_steps", IntegerType()),
        StructField("anchor_sec", DoubleType()),
    ]
)
_FUNNEL_STATE = StructType(
    [
        StructField("anchor", DoubleType()),
        StructField("prev_ts", DoubleType()),
        StructField("next_idx", IntegerType()),
    ]
)


def funnel_stream(
    events: DataFrame,
    steps: tuple[str, ...],
    within_s: float,
    watermark: str = "0 seconds",
    tombstone_ttl_s: float | None = None,
    prefilter_steps: bool = True,
) -> DataFrame:
    """Custom stateful operator: the streaming twin of
    operators/funnel — per-user greedy ordered-step matching with a
    conversion window, via ``applyInPandasWithState``.

    Matching is the SAME greedy earliest-match the batch operator
    computes (scan in event-time order; take a step event iff it is
    the next expected step, strictly after the previous step's time,
    and within ``within_s`` of the anchor), so a funnel that COMPLETES
    emits identically to the batch form. A user emits exactly once —
    the batch twin's one-row-per-user contract:

    * immediately on completing the final step (depth = len(steps)),
      deterministic, no timer involved; or
    * when the EVENT-TIME watermark strictly passes ``anchor +
      within_s`` — the conversion window closed; the reached depth is
      final because no in-watermark event can extend it.

    After either emission the state keeps a COMPLETED TOMBSTONE
    (``next_idx = -1``) so later micro-batches cannot re-anchor a
    second funnel for the same user (batch ``funnel_times`` anchors at
    the user's earliest step-1 event, full stop). The tombstone is the
    3-field state struct per emitted user — bounded by distinct
    converted users, the same asymptotic state any per-user streaming
    aggregate carries. With ``tombstone_ttl_s`` set, each tombstone
    registers an event-time timeout at ``anchor + within_s +
    tombstone_ttl_s`` and is REMOVED when the watermark passes it —
    bounding state size at the cost of a bounded re-anchor window: an
    event for that user arriving after the TTL (necessarily ≥
    ``tombstone_ttl_s`` of event time past the original window) can
    start a second funnel. ``None`` (default) keeps tombstones
    forever — the exactly-once-per-user contract with monotone state.

    Users who never anchor emit nothing; a funnel whose window is
    still open at end-of-data stays unemitted (matching the
    sessionizer's timeout clause — the batch≡stream test replays both
    rules)."""
    if len(steps) < 1:
        raise ValueError("steps must name at least one event type")
    if within_s <= 0:
        raise ValueError(f"within_s must be positive, got {within_s}")
    if tombstone_ttl_s is not None and tombstone_ttl_s <= 0:
        raise ValueError(
            f"tombstone_ttl_s must be positive, got {tombstone_ttl_s}"
        )
    steps = tuple(steps)
    k = len(steps)
    ttl = tombstone_ttl_s

    def _tombstone(state: GroupState, anchor: float) -> None:
        """Write the emitted-user tombstone; with a TTL, arm the
        event-time timer that will reap it."""
        state.update((anchor, anchor, -1))
        if ttl is not None:
            reap_ms = int((anchor + within_s + ttl) * 1000)
            state.setTimeoutTimestamp(
                max(reap_ms, state.getCurrentWatermarkMs() + 1)
            )

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            anchor, _prev, next_idx = state.get
            if next_idx < 0:
                if ttl is not None and state.getCurrentWatermarkMs() >= int(
                    (anchor + within_s + ttl) * 1000
                ):
                    # TTL reached: reap the tombstone — bounded state
                    state.remove()
                    return
                # a pre-completion timeout firing after the tombstone
                # replaced it: keep the tombstone (re-arming the TTL
                # timer when one is configured), emit nothing
                _tombstone(state, anchor)
                return
            # window closed: depth is final — emit once, tombstone
            _tombstone(state, anchor)
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "n_steps": [next_idx],
                    "anchor_sec": [anchor],
                }
            )
            return
        anchor, prev_ts, next_idx = (
            state.get if state.exists else (None, None, 0)
        )
        if next_idx < 0:
            return  # this user already emitted — suppress re-anchoring
        # accumulate ALL Arrow chunks before sorting: the greedy
        # matcher is order-sensitive, and per-chunk sorting would give
        # only chunk-local order once a user's micro-batch spans
        # multiple batches (>arrow.maxRecordsPerBatch rows). Memory is
        # one user's micro-batch slice — the same bound the sessionizer
        # carries.
        recs: list[tuple[float, str]] = []
        for pdf in pdfs:
            recs.extend(
                zip(pdf["ts_sec"].tolist(), pdf["event_type"].tolist())
            )
        recs.sort()
        completed = False
        for t, et in recs:
            if next_idx >= k:
                break
            # compare against the EXPECTED step by position, not a
            # type→index dict: a funnel may repeat a step type
            # (view → view → purchase), like the batch operator
            if et != steps[next_idx]:
                continue
            if next_idx == 0:
                anchor, prev_ts, next_idx = t, t, 1
            elif t > prev_ts and t <= anchor + within_s:
                prev_ts, next_idx = t, next_idx + 1
            if next_idx >= k:
                completed = True
        if completed:
            _tombstone(state, anchor)
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "n_steps": [k],
                    "anchor_sec": [anchor],
                }
            )
            return
        if next_idx == 0:
            return
        deadline_ms = int((anchor + within_s) * 1000)
        if state.getCurrentWatermarkMs() > deadline_ms:
            # the user anchored AFTER the watermark already passed the
            # deadline (a very late anchor event): the window is
            # closed — any event that could extend the funnel has
            # ts ≤ anchor+within < watermark, i.e. would be dropped as
            # late — so emit NOW in the data path instead of deferring
            # to a watermark-advance-dependent timer (which diverges
            # from the batch oracle when the final micro-batch barely
            # moves the watermark).
            _tombstone(state, anchor)
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "n_steps": [next_idx],
                    "anchor_sec": [anchor],
                }
            )
            return
        state.update((anchor, prev_ts, next_idx))
        state.setTimeoutTimestamp(
            max(deadline_ms, state.getCurrentWatermarkMs() + 1)
        )

    # Step-type pre-filter ABOVE the watermark collector (round 15,
    # ``prefilter_steps``): every event still flows THROUGH
    # EventTimeWatermark — which computes its max-event-time stats on
    # the rows passing the node, wherever later filters sit — so
    # unrelated traffic advances the stream clock and an idle funnel
    # still times out; only the shuffle into the state operator and
    # the per-group Python pass see the (usually much smaller)
    # step-event subset. The predicate deliberately REFERENCES the
    # event-time column (`ts IS NULL`, a no-op disjunct for non-null
    # event times — null-ts rows were previously forwarded to the
    # state fn and still are): Catalyst's PushPredicateThroughNonJoin
    # only pushes a conjunct below EventTimeWatermark when it does NOT
    # touch the watermark attribute, so this filter provably stays
    # above the node (a bare event_type IN (...) would be pushed below
    # and silently freeze the watermark at the last funnel-relevant
    # event — measured in round 7: the timeout test never fired).
    # Plan-pinned in tests/test_streaming.py; the state fn keeps its
    # own non-step skip, so ``prefilter_steps=False`` is
    # emission-identical (A/B-pinned by test).
    prepared = events.withWatermark("ts", watermark)
    if prefilter_steps:
        prepared = prepared.where(
            F.col("event_type").isin(*steps) | F.col("ts").isNull()
        )
    prepared = (
        prepared
        .select(
            "user_id",
            F.col("ts"),
            "event_type",
            # MICROsecond-resolution seconds (unlike the sessionizer's
            # deliberate second floor): the batch funnel compares full
            # timestamps, so the stream must too or same-second
            # strictly-after decisions diverge. Distinct micros stay
            # distinct in a double (2^-22 s < 1e-6 s at epoch scale).
            (F.unix_micros("ts") / F.lit(1_000_000.0)).alias("ts_sec"),
        )
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=_FUNNEL_OUT,
        stateStructType=_FUNNEL_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
