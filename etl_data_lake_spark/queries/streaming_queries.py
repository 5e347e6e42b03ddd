"""Streaming operators surfaced through the driver contract.

Each entry executes a Structured Streaming plan to completion with the
``availableNow`` trigger (bounded replay over the static parquet — the
cluster pattern for backfills) and returns the materialized result, so
the driver can hash-compare it like any batch query. The tumbling
window carries the SAME oracle as its batch twin
``events_tumbling_window_1h``: the driver thereby checks
batch ≡ stream, not just rows>0. As of round 4 the stateful
sessionizer is hash-checked too: its emitted set (successor-closed
sessions plus final-watermark timeouts) turned out to be fully
deterministic under availableNow and therefore SQL-characterizable —
the oracle replays the gap logic AND the event-time-timeout rule,
including the seconds-vs-milliseconds granularity split the operator
actually uses (see the entry's comment).
"""

from __future__ import annotations

from itertools import count

from pyspark.sql import DataFrame, SparkSession

from etl_data_lake_spark.functions.money import sql_sum_money
from etl_data_lake_spark.queries.registry import register
from etl_data_lake_spark.streaming.events import (
    event_stream,
    run_available_now,
    sessionize_stream,
    tumbling_counts,
)

_run_seq = count()

# State-store partitions for these BOUNDED availableNow replays. The
# emitted results are partition-count-invariant; what the setting
# controls is the fixed floor of initializing one HDFS-backed state
# store per partition per stateful operator PER RUN, which at test
# scale dominates the actual work (a two-sided stream-stream join at
# 32 partitions pays 64 store inits for kilobytes of state). A
# long-lived cluster job sizes this to sustained throughput via the
# same conf; 8 keeps local[8..32] fully parallel while cutting the
# per-run floor 4x.
_STATE_PARTS = 8


def _unique(name: str) -> str:
    # memory-sink table names are session-global; never reuse one
    return f"{name}_{next(_run_seq)}"


@register(
    "stream_tumbling_window_1h",
    oracle=f"""
        SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')
                   AS window_start,
               event_type,
               COUNT(*) AS n_events,
               {sql_sum_money('value')} AS total_value
        FROM events
        GROUP BY 1, 2
    """,
    tags=("streaming", "window", "watermark"),
)
def stream_tumbling_window_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = tumbling_counts(event_stream(spark, sf_dir))
    # complete-mode aggregation: every batch re-emits the full result,
    # so the trailing watermark-advance batch adds nothing (oracle-
    # pinned batch≡stream)
    return run_available_now(
        stream, _unique("tumble"), shuffle_partitions=_STATE_PARTS,
        no_data_batch=False,
    )


@register(
    "stream_sessionize_closed",
    # Hash oracle since round 4 (round-3 verdict #8 stretch): the
    # emitted set IS deterministic and SQL-characterizable. A session
    # is emitted iff (a) a successor event for the same user opened a
    # newer session, or (b) the FINAL event-time watermark (max event
    # ts, 0s delay, availableNow runs the timer-flush batch) strictly
    # passed last_event + gap — clause (b) is the state-timeout rule
    # of sessionize_stream replayed in SQL. Granularity matters and is
    # mirrored exactly: the stream sessionizes on unix_timestamp
    # SECONDS (floor), the timeout compares MILLISECONDS of the raw
    # watermark, hence floor(epoch(ts)) vs epoch_ms(max(ts)).
    oracle="""
        WITH e AS (
            SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS t
            FROM events
        ),
        lagged AS (
            SELECT user_id, t,
                   CASE WHEN lag(t) OVER w IS NULL
                             OR t - lag(t) OVER w > 1800
                        THEN 1 ELSE 0 END AS new_s
            FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t)
        ),
        sess AS (
            SELECT user_id, t,
                   SUM(new_s) OVER (PARTITION BY user_id ORDER BY t
                                    ROWS UNBOUNDED PRECEDING) AS session_id
            FROM lagged
        ),
        agg AS (
            SELECT user_id, session_id,
                   COUNT(*) AS n_events, MAX(t) AS last_t
            FROM sess GROUP BY user_id, session_id
        ),
        wm AS (SELECT epoch_ms(MAX(ts)) AS wm_ms FROM events)
        SELECT user_id,
               CAST(session_id AS BIGINT) AS session_id,
               CAST(n_events AS BIGINT) AS n_events
        FROM agg, wm
        WHERE session_id < (SELECT MAX(a2.session_id) FROM agg a2
                            WHERE a2.user_id = agg.user_id)
           OR (last_t + 1800) * 1000 < wm_ms
    """,
    tags=("streaming", "stateful"),
)
def stream_sessionize_closed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessions from the applyInPandasWithState operator;
    emitted set = sessions closed by a successor event or by the final
    event-time watermark."""
    stream = sessionize_stream(event_stream(spark, sf_dir), gap_minutes=30)
    return run_available_now(
        stream, _unique("sess"), output_mode="append",
        shuffle_partitions=_STATE_PARTS,
    )


@register(
    "stream_sliding_window_1h_15m",
    oracle="""
        WITH member AS (
            SELECT event_type,
                   unnest(generate_series(
                       time_bucket(INTERVAL 15 MINUTE, ts)
                           - INTERVAL 45 MINUTE,
                       time_bucket(INTERVAL 15 MINUTE, ts),
                       INTERVAL 15 MINUTE)) AS window_start
            FROM events
        )
        SELECT strftime(window_start, '%Y-%m-%d %H:%M:%S') AS window_start,
               event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM member
        GROUP BY 1, 2
    """,
    tags=("streaming", "window", "sliding"),
)
def stream_sliding_window_1h_15m(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_data_lake_spark.streaming.events import sliding_counts

    stream = sliding_counts(event_stream(spark, sf_dir))
    # complete-mode aggregation — same no-data-batch reasoning as the
    # tumbling entry
    return run_available_now(
        stream, _unique("slide"), shuffle_partitions=_STATE_PARTS,
        no_data_batch=False,
    )


_ATTRIBUTION_ORACLE = """
    SELECT c.user_id,
           c.event_id AS click_id,
           strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_time,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_time,
           p.value AS purchase_value
    FROM events c
    JOIN events p
      ON c.user_id = p.user_id
     AND c.event_type = 'click'
     AND p.event_type = 'purchase'
     AND p.ts >= c.ts
     AND p.ts < c.ts + INTERVAL 10 MINUTE
"""


@register(
    "stream_stream_attribution_join",
    oracle=_ATTRIBUTION_ORACLE,
    tags=("streaming", "join", "stateful"),
)
def stream_stream_attribution_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream inner join (click→purchase within
    10 min); the availableNow replay must equal the batch self-join
    the oracle runs."""
    from etl_data_lake_spark.streaming.events import attribution_join

    stream = attribution_join(event_stream(spark, sf_dir))
    # inner join: matches emit on arrival; the trailing batch only
    # evicts state (oracle-pinned batch≡stream)
    return run_available_now(
        stream, _unique("attr"), output_mode="append",
        shuffle_partitions=_STATE_PARTS, no_data_batch=False,
    )


@register(
    "stream_dedup_exactly_once",
    oracle="SELECT event_id, event_type FROM events",
    tags=("streaming", "dedup", "watermark"),
)
def stream_dedup_exactly_once(spark: SparkSession, sf_dir: str) -> DataFrame:
    """At-least-once → exactly-once: the source is unioned with itself
    (every event delivered twice, the redelivery failure mode a
    distributed log ingest must survive) and
    dropDuplicatesWithinWatermark recovers exactly one row per
    event_id — the oracle is simply the single-copy table, so the
    driver checks the dedup actually removed the duplication."""
    from etl_data_lake_spark.streaming.events import dedup_exactly_once

    s = event_stream(spark, sf_dir)
    redelivered = s.union(event_stream(spark, sf_dir))
    stream = dedup_exactly_once(redelivered)
    # watermark-bounded dedup emits each id's first row on arrival;
    # the trailing batch only evicts state (oracle-pinned)
    return run_available_now(
        stream, _unique("dedup"), output_mode="append",
        shuffle_partitions=_STATE_PARTS, no_data_batch=False,
    )


# Steps/window mirror the batch funnel_conversion entry
# (queries/advanced_rel.py) so the pair is a true batch↔stream twin.
_FUNNEL_STEPS = ("view", "click", "purchase")
_FUNNEL_WITHIN_S = 28_800


@register(
    "stream_funnel_emitted",
    # Hash oracle: the emitted set of the stateful streaming funnel is
    # deterministic under availableNow and SQL-characterizable, like
    # the sessionizer's. A user emits iff their greedy earliest-match
    # funnel (chained-CTE, same construction as funnel_conversion's
    # oracle) either COMPLETED (depth 3) or its conversion window
    # closed — the FINAL event-time watermark (max ts, ms) strictly
    # passed anchor + within, the operator's event-time-timeout rule.
    # anchor_sec is micros/1e6 on both engines (one division of the
    # same integer — identical doubles); the deadline mirrors the
    # operator's int((anchor + within) * 1000) truncation.
    oracle=f"""
        WITH s1 AS (
            SELECT user_id, MIN(ts) AS t1
            FROM events WHERE event_type = 'view' GROUP BY user_id
        ), s2 AS (
            SELECT s1.user_id, s1.t1, MIN(e.ts) AS t2
            FROM s1 LEFT JOIN events e
              ON e.user_id = s1.user_id
             AND e.event_type = 'click' AND e.ts > s1.t1
             AND e.ts <= s1.t1 + INTERVAL {_FUNNEL_WITHIN_S} SECOND
            GROUP BY s1.user_id, s1.t1
        ), s3 AS (
            SELECT s2.user_id, s2.t1, s2.t2, MIN(e.ts) AS t3
            FROM s2 LEFT JOIN events e
              ON e.user_id = s2.user_id
             AND e.event_type = 'purchase' AND e.ts > s2.t2
             AND e.ts <= s2.t1 + INTERVAL {_FUNNEL_WITHIN_S} SECOND
            GROUP BY s2.user_id, s2.t1, s2.t2
        ), wm AS (SELECT epoch_ms(MAX(ts)) AS wm_ms FROM events)
        SELECT user_id,
               CAST(CASE WHEN t3 IS NOT NULL THEN 3
                         WHEN t2 IS NOT NULL THEN 2
                         ELSE 1 END AS BIGINT) AS n_steps,
               epoch(t1) AS anchor_sec
        FROM s3, wm
        WHERE t3 IS NOT NULL
           OR wm_ms > CAST(floor((epoch(t1) + {_FUNNEL_WITHIN_S})
                                 * 1000) AS BIGINT)
    """,
    tags=("streaming", "stateful", "funnel"),
)
def stream_funnel_emitted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful streaming funnel (applyInPandasWithState greedy
    matcher, streaming/events.funnel_stream): per-user reached depth
    and anchor for every funnel whose outcome is final — completed on
    the spot, or window closed by the final watermark."""
    from pyspark.sql import functions as F

    from etl_data_lake_spark.streaming.events import funnel_stream

    stream = funnel_stream(
        event_stream(spark, sf_dir), _FUNNEL_STEPS, _FUNNEL_WITHIN_S
    )
    out = run_available_now(
        stream, _unique("funnel"), output_mode="append",
        shuffle_partitions=_STATE_PARTS,
    )
    return out.select(
        "user_id",
        F.col("n_steps").cast("long").alias("n_steps"),
        "anchor_sec",
    )


# --------------------------------------------------------------------------
# Stream-stream INTERVAL join (promoted round 12, slot from
# range_join_ship_lag): the r11 operator replayed through the driver —
# click intervals [ts, ts+10min) joined by purchases arriving inside
# them, both sides streaming, availableNow replay. The oracle is the
# plain batch range join (DuckDB), so the driver checks
# batch ≡ stream for the bin-rewrite join itself, not just rows>0.
# 5-minute bins ⇒ <= 3 bins per interval; max_span == the declared
# 10-minute interval length.
# --------------------------------------------------------------------------
@register(
    "stream_interval_join_attribution",
    oracle="""
        SELECT c.user_id,
               c.event_id AS click_id,
               p.event_id AS purchase_id,
               strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_time,
               p.value AS purchase_value
        FROM events c
        JOIN events p
          ON c.user_id = p.user_id
         AND c.event_type = 'click'
         AND p.event_type = 'purchase'
         AND c.ts <= p.ts
         AND p.ts < c.ts + INTERVAL 10 MINUTE
    """,
    tags=("streaming", "join", "range", "stateful"),
)
def stream_interval_join_attribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import functions as F

    from etl_data_lake_spark.operators.joins import interval_join_stream

    # ONE source frame for both sides (a second file-stream source
    # costs its own schema probe, offset log, and per-batch scan —
    # measured 6.0 s → 3.5 s at sf0.1). Deriving both sides from one
    # frame normally collapses the equi key to a self-comparison
    # (`user_id == user_id` trivially true — the join silently loses
    # its key); the cast-alias on the clicks side mints a fresh
    # attribute, so the key survives analysis. Oracle-verified at
    # sf0.01 AND sf0.1 with zero trivially-true-predicate warnings.
    ev = event_stream(spark, sf_dir)
    clicks = ev.where(
        F.col("event_type") == "click"
    ).select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("s"),
        (F.col("ts") + F.expr("INTERVAL 10 MINUTES")).alias("e"),
    )
    purchases = ev.where(
        F.col("event_type") == "purchase"
    ).select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
        F.col("value").alias("purchase_value"),
    )
    joined = interval_join_stream(
        purchases,
        clicks,
        point_ts="p_ts",
        start_col="s",
        end_col="e",
        on=("user_id",),
        bin_width=300.0,
        max_span=600.0,
    )
    # inner interval join: matches emit on arrival; the trailing
    # watermark-advance batch only evicts state (oracle-pinned)
    out = run_available_now(
        joined, _unique("ivjoin"), output_mode="append",
        shuffle_partitions=_STATE_PARTS, no_data_batch=False,
    )
    return out.select(
        "user_id",
        "click_id",
        "purchase_id",
        F.date_format("p_ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_time"),
        "purchase_value",
    )
