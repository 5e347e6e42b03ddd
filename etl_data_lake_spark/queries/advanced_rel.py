"""Advanced relational coverage beyond the reference's operator set
(SURVEY §2.4/§2.5 'not present' lists, implemented because any user
extending the reference's workload hits them immediately): session
windows, rollup/grouping sets, distinct aggregates, and an
equi+range join.

Scale notes: every query here is one shuffle (the groupBy/join key) +
whatever Catalyst broadcasts; session_window is Spark's built-in
gaps-and-islands — state lives JVM-side, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_data_lake_spark.functions.money import sql_sum_money, sum_money
from etl_data_lake_spark.queries.registry import register
from etl_data_lake_spark.sources.catalog import load_table


# --------------------------------------------------------------------------
# Native session windows (F.session_window): 30-minute-gap sessions per
# user, directly as a groupBy — no explicit lag/cumsum plumbing. The
# oracle IS the lag/cumsum gaps-and-islands construction, so the two
# formulations check each other.
# --------------------------------------------------------------------------
@register(
    "events_session_window_agg",
    oracle="""
        WITH marked AS (
            SELECT user_id, ts,
                   CASE WHEN ts - LAG(ts) OVER w < INTERVAL 30 MINUTE
                        THEN 0 ELSE 1 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        numbered AS (
            SELECT user_id, ts,
                   SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                       ROWS UNBOUNDED PRECEDING) AS session_no
            FROM marked
        )
        SELECT user_id,
               strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM numbered
        GROUP BY user_id, session_no
    """,
    tags=("window", "session"),
)
def events_session_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.col("user_id"),
            F.session_window(F.col("ts"), "30 minutes").alias("sw"),
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.date_format(F.col("sw.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "session_start"
            ),
            "n_events",
        )
    )


# --------------------------------------------------------------------------
# ROLLUP: per-(returnflag, linestatus) revenue with subtotals and a
# grand total — the partial-aggregate tree Spark executes as ONE
# shuffle with Expand, not one job per grouping level.
# Library surface only (50-entry driver cap): the Expand-lattice driver
# signal rides on cube_orders_revenue (superset lattice) and
# grouping_sets_revenue (explicit set list through spark.sql).
# --------------------------------------------------------------------------
def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n_items"),
            sum_money(F.col("l_extendedprice")).alias("revenue"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("<all>")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("<all>")).alias("linestatus"),
            "n_items",
            "revenue",
        )
    )


# --------------------------------------------------------------------------
# Distinct aggregates: COUNT(DISTINCT) alongside plain aggregates —
# Spark plans this as a two-phase Expand aggregation; keep it exact
# (approx_count_distinct can't oracle-match by construction).
# Library surface only as of round 4 (50-entry driver cap): the exact
# COUNT(DISTINCT) driver signal rides on grouping_sets_revenue (same
# two-phase distinct rewrite, under an Expand lattice as well), and
# this twin stays parity-checked in test_parity::test_library_twin_parity.
# The freed slot went to text_contamination_spans (dedup_queries.py).
# --------------------------------------------------------------------------
DISTINCT_AGG_PER_STATUS_SQL = f"""
    SELECT o_orderstatus,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           {sql_sum_money('o_totalprice')} AS total_price
    FROM orders
    GROUP BY o_orderstatus
"""


def distinct_agg_per_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.count_distinct("o_custkey").cast("long").alias("n_customers"),
        F.count("*").alias("n_orders"),
        sum_money(F.col("o_totalprice")).alias("total_price"),
    )


# --------------------------------------------------------------------------
# Equi + range join: line items shipped within 60 days of their
# order's date. The equi key carries the shuffle; the range predicate
# evaluates post-probe — the shape that stays a hash join at 100 TB
# (a PURE range join would need a bucketed interval strategy instead).
# Library twin since round 12 (slot rotated to the stream-stream
# interval join entry; its range semantics also ride
# interval_join_first_hour) — parity-checked in
# test_parity::test_library_twin_parity.
# --------------------------------------------------------------------------
RANGE_JOIN_SHIP_LAG_SQL = """
    SELECT l.l_orderkey, l.l_linenumber,
           CAST(date_diff('day', o.o_orderdate, l.l_shipdate) AS BIGINT)
               AS ship_lag_days
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
     AND l.l_shipdate >= o.o_orderdate
     AND l.l_shipdate < o.o_orderdate + INTERVAL 60 DAY
"""


def range_join_ship_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cond = (
        (li.l_orderkey == orders.o_orderkey)
        & (li.l_shipdate >= orders.o_orderdate)
        & (li.l_shipdate < orders.o_orderdate + F.expr("INTERVAL 60 DAYS"))
    )
    return li.join(orders, cond).select(
        "l_orderkey",
        "l_linenumber",
        F.datediff("l_shipdate", "o_orderdate").cast("long").alias("ship_lag_days"),
    )


# --------------------------------------------------------------------------
# Semi/anti joins — the EXISTS / NOT EXISTS shapes. Spark plans both
# sides as existence joins (no row multiplication, dim broadcastable).
# --------------------------------------------------------------------------
@register(
    "semi_anti_join_customers",
    oracle="""
        SELECT c_custkey, c_name
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderstatus = 'O')
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderstatus = 'F')
    """,
    tags=("join", "semi", "anti"),
)
def semi_anti_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    open_orders = orders.where(F.col("o_orderstatus") == "O")
    done_orders = orders.where(F.col("o_orderstatus") == "F")
    return (
        customer.join(
            open_orders, customer.c_custkey == open_orders.o_custkey, "left_semi"
        )
        .join(
            done_orders, customer.c_custkey == done_orders.o_custkey, "left_anti"
        )
        .select("c_custkey", "c_name")
    )


# --------------------------------------------------------------------------
# PIVOT — wide conditional aggregation. The value list is EXPLICIT
# (statuses F/O/P): an unlisted pivot forces an extra distinct-scan
# job and a nondeterministic column order; never ship that at scale.
# The oracle is the equivalent CASE WHEN conditional aggregation.
# --------------------------------------------------------------------------
@register(
    "pivot_status_counts",
    oracle="""
        SELECT o_orderpriority,
               CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
                    AS BIGINT) AS status_f,
               CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END)
                    AS BIGINT) AS status_o,
               CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END)
                    AS BIGINT) AS status_p
        FROM orders
        GROUP BY o_orderpriority
    """,
    tags=("agg", "pivot"),
)
def pivot_status_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    pivoted = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
    )
    return pivoted.select(
        "o_orderpriority",
        F.coalesce(F.col("F"), F.lit(0)).cast("long").alias("status_f"),
        F.coalesce(F.col("O"), F.lit(0)).cast("long").alias("status_o"),
        F.coalesce(F.col("P"), F.lit(0)).cast("long").alias("status_p"),
    )


# --------------------------------------------------------------------------
# Exact percentiles (linear interpolation — Spark `percentile` and
# DuckDB `quantile_cont` implement the same estimator, verified to 6
# decimals). Exact percentile buffers each group's values; at 100 TB
# swap in approx_percentile (t-digest, mergeable, bounded memory) and
# accept the documented error bound — the approx variant can't be
# oracle-matched by construction, which is why the EXACT one stays a
# parity-tested library twin (test_library_twin_parity) while the
# approx form below is the REGISTERED entry.
# History: registered in rounds 1-3; slot went to ann_pq_topk in
# round 4, with the exact columns folded into agg_pricing_summary;
# round 5 removed that fold (round-4 verdict #2 — exact percentile's
# per-group value buffering is a 100 TB executor OOM) and registered
# approx_percentile_prices in a slot freed by the ANN recall
# consolidation.
# --------------------------------------------------------------------------
PERCENTILE_PRICES_SQL = """
        SELECT o_orderpriority,
               round(quantile_cont(o_totalprice, 0.5), 6) AS median_price,
               round(quantile_cont(o_totalprice, 0.9), 6) AS p90_price,
               CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM orders
        GROUP BY o_orderpriority
    """


def percentile_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 6).alias("median_price"),
        F.round(F.expr("percentile(o_totalprice, 0.9)"), 6).alias("p90_price"),
        F.count("*").alias("n_orders"),
    )


# --------------------------------------------------------------------------
# Approximate percentiles (Greenwald-Khanna sketch): the 100 TB
# percentile path — mergeable map-side partials, memory bounded by the
# accuracy parameter (rank error <= 1/accuracy), never by group size.
# Like approx_distinct_customers this cannot be oracle-matched
# bit-for-bit (the sketch returns a dataset element within the rank
# bound, DuckDB's quantile_cont interpolates), so it is a rows-only
# driver entry with the error bound pinned in
# tests/test_operators.py::test_approx_percentile_within_tolerance.
# Registered round 5 per round-4 verdict #2.
# --------------------------------------------------------------------------
@register("approx_percentile_prices", tags=("agg", "approx"))
def approx_percentile_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.round(
            F.expr("approx_percentile(o_totalprice, 0.5, 10000)"), 6
        ).alias("median_price_approx"),
        F.round(
            F.expr("approx_percentile(o_totalprice, 0.9, 10000)"), 6
        ).alias("p90_price_approx"),
        F.count("*").alias("n_orders"),
    )


# --------------------------------------------------------------------------
# Sliding windows: 1-hour windows every 15 minutes — each event lands
# in 4 overlapping windows. Spark's F.window handles the fan-out
# internally (Expand, then one aggregation shuffle); the oracle
# reconstructs the same assignment by generating each event's 4
# member windows explicitly.
# Library surface only (50-entry driver cap): the identical plan runs
# driver-checked as stream_sliding_window_1h_15m against the SAME
# oracle, so the driver still verifies these semantics (and batch ≡
# stream on top).
# --------------------------------------------------------------------------
def events_sliding_window_1h_15m(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.window(F.col("ts"), "1 hour", "15 minutes").alias("w"),
            "event_type",
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "n_events",
        )
    )


# --------------------------------------------------------------------------
# Approximate distinct (HyperLogLog++): the 100 TB companion to
# distinct_agg_per_status. Sketches are mergeable (map-side partials,
# no Expand), memory-bounded, and ~2% rsd by default — but not
# bit-reproducible across engines, so this is a rows-only driver entry
# with the accuracy bound pinned in tests instead of an oracle.
# --------------------------------------------------------------------------
@register("approx_distinct_customers", tags=("agg", "approx"))
def approx_distinct_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.approx_count_distinct("o_custkey").cast("long").alias(
            "n_customers_approx"
        ),
        F.count("*").alias("n_orders"),
    )


# --------------------------------------------------------------------------
# CUBE: all four grouping combinations of (status, priority) in one
# pass — Spark plans rollup/cube as a single Expand + hash aggregate,
# so the cost is one shuffle regardless of how many grouping sets the
# lattice has. Null grouping markers are labeled '<all>' on both
# engines (the grouping columns themselves are non-null in testdata).
# Library surface only as of round 7 (50-entry driver cap): the
# Expand-lattice driver signal already rides grouping_sets_revenue
# (the more general form — an explicit set list through spark.sql)
# and pivot_status_counts; this twin stays parity-checked in
# test_parity::test_library_twin_parity like the rollup twin above.
# The freed slot went to funnel_conversion (a whole new query family).
# --------------------------------------------------------------------------
CUBE_ORDERS_REVENUE_SQL = f"""
    SELECT COALESCE(o_orderstatus, '<all>') AS orderstatus,
           COALESCE(o_orderpriority, '<all>') AS orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           {sql_sum_money('o_totalprice')} AS revenue
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


def cube_orders_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            sum_money(F.col("o_totalprice")).alias("revenue"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("<all>")).alias("orderstatus"),
            F.coalesce("o_orderpriority", F.lit("<all>")).alias("orderpriority"),
            "n_orders",
            "revenue",
        )
    )


# --------------------------------------------------------------------------
# FUNNEL: ordered-sequence conversion over events (view → click →
# purchase within an 8-hour window of the first view) — the
# behavioral-analytics family (operators/funnel.py). First-touch
# anchoring, strictly-after ordering; each step scans a
# predicate-pushed slice of events and shuffles per-user frames only.
# The window makes the funnel discriminative on this corpus
# (150 → 26 → 1 at sf0.01; without it every user eventually does
# everything). The oracle replays the same greedy earliest-match with
# chained CTEs and INTERVAL arithmetic; every rate is one IEEE-double
# division of two BIGINTs, so the hash compare is exact. (Registered
# round 7 in the slot freed by demoting cube_orders_revenue to a
# library twin.)
# --------------------------------------------------------------------------
_FUNNEL_STEPS = ("view", "click", "purchase")
_FUNNEL_WITHIN_S = 28_800


@register(
    "funnel_conversion",
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
        ), n AS (
            SELECT COUNT(t1) AS n1, COUNT(t2) AS n2, COUNT(t3) AS n3
            FROM s3
        )
        SELECT * FROM (
            SELECT 1 AS step, 'view' AS step_name, n1 AS n_users,
                   n1 / n1 AS frac_of_first, n1 / n1 AS frac_of_prev
            FROM n
            UNION ALL
            SELECT 2, 'click', n2, n2 / n1, n2 / n1 FROM n
            UNION ALL
            SELECT 3, 'purchase', n3, n3 / n1, n3 / n2 FROM n
        ) ORDER BY step
    """,
    tags=("events", "funnel", "sequence"),
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_data_lake_spark.operators.funnel import funnel_counts

    events = load_table(spark, sf_dir, "events")
    return funnel_counts(events, _FUNNEL_STEPS, within_s=_FUNNEL_WITHIN_S)


# --------------------------------------------------------------------------
# Window FRAME spec (ROWS BETWEEN): trailing-4-order spend per
# customer. The frame makes the window a sliding aggregate, not a
# running one; (o_orderdate, o_orderkey) is a total order per
# partition so the frame content — and therefore the sum — is
# deterministic. Money stays in scaled-long space inside the window
# aggregation for cross-engine bit equality. Library surface since
# round 8 (50-entry driver cap — slot went to quality_classifier_
# scores): parity-checked in test_parity::test_library_twin_parity;
# the frame machinery keeps driver-level coverage through
# window_surrogate_key and the anomaly_zscore_orders twin.
# --------------------------------------------------------------------------
WINDOW_FRAME_TRAILING_SPEND_SQL = """
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN 3 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) / 100.0 AS trailing_spend
    FROM orders
"""


def window_frame_trailing_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from etl_data_lake_spark.functions.money import to_scaled_long

    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-3, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        (
            F.sum(to_scaled_long(F.col("o_totalprice"))).over(w).cast("double")
            / F.lit(100.0)
        ).alias("trailing_spend"),
    )


# --------------------------------------------------------------------------
# Arg-max aggregation (max_by / min_by): "the row that attains the
# extreme" without a self-join or window — one hash aggregate, the
# cheapest formulation at scale. DuckDB's arg_max only takes scalar
# keys, so the (price, orderkey) tiebreak is packed into one BIGINT:
# scaled_price·10¹⁰ + orderkey, exact while scaled price < 9.2·10⁸
# and orderkey < 10¹⁰ (testdata maxima are orders of magnitude below
# both bounds).
# --------------------------------------------------------------------------
_PACK = 10_000_000_000


@register(
    "argmax_order_per_customer",
    oracle=f"""
        SELECT o_custkey,
               arg_max(o_orderkey,
                       CAST(ROUND(o_totalprice * 100) AS BIGINT) * {_PACK}
                           + o_orderkey) AS top_orderkey,
               CAST(MAX(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
                   / 100.0 AS top_price
        FROM orders
        GROUP BY o_custkey
    """,
    tags=("agg", "argmax"),
)
def argmax_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_data_lake_spark.functions.money import to_scaled_long

    orders = load_table(spark, sf_dir, "orders")
    packed = to_scaled_long(F.col("o_totalprice")) * F.lit(_PACK) + F.col(
        "o_orderkey"
    )
    return orders.groupBy("o_custkey").agg(
        F.max_by("o_orderkey", packed).alias("top_orderkey"),
        (F.max(to_scaled_long(F.col("o_totalprice"))).cast("double") / F.lit(100.0)).alias(
            "top_price"
        ),
    )


# --------------------------------------------------------------------------
# GROUPING SETS through the SQL entry point (the DataFrame API only
# exposes the rollup/cube special cases): an explicit, non-lattice
# set list — per (status), per (priority), and the grand total, but
# NOT the (status, priority) cross — still one Expand + one shuffle.
# Also exercises spark.sql() as a first-class query surface. Library
# surface since round 8 (50-entry driver cap — slot went to
# stream_funnel_emitted): parity-checked in test_parity::
# test_library_twin_parity; the Expand-lattice family keeps twin
# coverage through cube_orders_revenue as well.
# --------------------------------------------------------------------------
GROUPING_SETS_REVENUE_SQL = f"""
    SELECT COALESCE(o_orderstatus, '<all>') AS orderstatus,
           COALESCE(o_orderpriority, '<all>') AS orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
           {sql_sum_money('o_totalprice')} AS revenue
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    # COUNT(DISTINCT) rides here since round 4 (was its own entry,
    # distinct_agg_per_status, demoted to library twin): the exact
    # two-phase distinct rewrite now runs under the Expand lattice —
    # one entry, both driver signals.
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_gs")
    return spark.sql(
        """
        SELECT COALESCE(o_orderstatus, '<all>') AS orderstatus,
               COALESCE(o_orderpriority, '<all>') AS orderpriority,
               COUNT(*) AS n_orders,
               COUNT(DISTINCT o_custkey) AS n_customers,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
                   / 100.0 AS revenue
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


# --------------------------------------------------------------------------
# LAG / LEAD offset window functions: previous/next order price per
# customer and the step delta — rounding out §2.5's window coverage
# beyond row_number (surrogate keys), frames (trailing spend) and
# argmax (ordered first). Library surface (50-entry driver cap):
# parity-checked in test_parity::test_library_twin_parity; the delta
# is one IEEE subtraction of the same doubles on both engines, so the
# check is exact.
# --------------------------------------------------------------------------
WINDOW_LAG_LEAD_SQL = """
    SELECT o_custkey, o_orderkey,
           lag(o_totalprice)  OVER w AS prev_price,
           lead(o_totalprice) OVER w AS next_price,
           o_totalprice - lag(o_totalprice) OVER w AS delta_prev
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag("o_totalprice").over(w)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        prev.alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        (F.col("o_totalprice") - prev).alias("delta_prev"),
    )


# --------------------------------------------------------------------------
# Trailing z-score anomaly detection (operators/anomaly.py): each
# order scored against the customer's previous 10 orders. Library
# surface (50-entry driver cap), parity-checked like the other twins;
# scores round to 6 digits so the engines' stddev accumulation-order
# float noise (~1e-15 relative) can't flip the hash.
# --------------------------------------------------------------------------
ANOMALY_ZSCORE_SQL = """
    SELECT o_custkey, o_orderkey,
           CASE WHEN COUNT(o_totalprice) OVER w >= 3
                 AND STDDEV_SAMP(o_totalprice) OVER w > 0
                THEN ROUND((o_totalprice - AVG(o_totalprice) OVER w)
                           / STDDEV_SAMP(o_totalprice) OVER w, 6)
           END AS zscore
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING)
"""


# --------------------------------------------------------------------------
# Binned interval join (round 10): each user's events inside their own
# first active hour — intervals derived per user, then a RANGE join of
# the raw events back onto them. DuckDB expresses the range predicate
# directly (its IEJoin handles it natively); Spark would plan a
# nested loop, so the library operator rewrites it to an equi-join on
# time bins (operators/joins.py::interval_join — the twin checks the
# rewrite against the declarative range semantics).
# Promoted to the driver catalog in round 11 (slot freed by demoting
# dedup_ngram_jaccard_pairs, whose shingle math rides its siblings);
# the SQL constant stays for test_parity's library-twin run.
# --------------------------------------------------------------------------
INTERVAL_JOIN_FIRST_HOUR_SQL = """
    WITH iv AS (
        SELECT user_id,
               MIN(ts) AS s,
               MIN(ts) + INTERVAL 1 HOUR AS e
        FROM events
        GROUP BY user_id
    )
    SELECT e.user_id AS user_id,
           CAST(COUNT(*) AS BIGINT) AS n_first_hour,
           CAST(SUM(CASE WHEN e.event_type = 'click' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_clicks
    FROM events e
    JOIN iv ON e.user_id = iv.user_id
           AND iv.s <= e.ts AND e.ts < iv.e
    GROUP BY e.user_id
"""


@register(
    "interval_join_first_hour",
    oracle=INTERVAL_JOIN_FIRST_HOUR_SQL,
    tags=("join", "range"),
)
def interval_join_first_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_data_lake_spark.operators.joins import interval_join

    events = load_table(spark, sf_dir, "events")
    iv = events.groupBy("user_id").agg(
        F.min("ts").alias("s"),
        (F.min("ts") + F.expr("INTERVAL 1 HOUR")).alias("e"),
    )
    joined = interval_join(
        events,
        iv,
        point_ts="ts",
        start_col="s",
        end_col="e",
        on=("user_id",),
        bin_width=900.0,  # 15-min bins: ≤ 5 bins per 1h interval
    )
    return joined.groupBy("user_id").agg(
        F.count("*").alias("n_first_hour"),
        F.sum(
            F.when(F.col("event_type") == "click", 1).otherwise(0)
        ).alias("n_clicks"),
    )


# --------------------------------------------------------------------------
# PSI drift (round 10 s2): order-price distribution shift between the
# pre-1998 and 1998+ snapshots — the operators/profile drift_report
# against DuckDB recomputing the identical width_bucket histograms +
# PSI algebra. Per-BUCKET contributions (not the scalar sum): bucket
# totals are exact integers, so every float is a fixed expression
# tree over ints — bit-stable across engines; a scalar SUM(psi) would
# hang the compare on multi-row float addition order.
# Promoted to the driver catalog in round 11 (slot freed by demoting
# media_frame_sample, whose fan-out invariants are pinned in
# test_multimodal); the SQL constant stays for the library-twin run.
# --------------------------------------------------------------------------
PSI_DRIFT_ORDERS_SQL = """
    WITH b AS (  -- width_bucket by hand: DuckDB has no such function
        SELECT o_orderdate,
               CASE WHEN o_totalprice < 0.0 THEN 0
                    WHEN o_totalprice >= 500000.0 THEN 21
                    ELSE CAST(FLOOR(o_totalprice / 25000.0) AS INT) + 1
               END AS bucket
        FROM orders
    ),
    hr AS (
        SELECT bucket, COUNT(*) AS n_ref
        FROM b WHERE o_orderdate < DATE '1998-01-01'
        GROUP BY 1
    ),
    hc AS (
        SELECT bucket, COUNT(*) AS n_cand
        FROM b WHERE o_orderdate >= DATE '1998-01-01'
        GROUP BY 1
    ),
    j AS (
        SELECT COALESCE(hr.bucket, hc.bucket) AS bucket,
               COALESCE(n_ref, 0) AS n_ref,
               COALESCE(n_cand, 0) AS n_cand
        FROM hr FULL JOIN hc ON hr.bucket = hc.bucket
    ),
    t AS (
        SELECT *, SUM(n_ref) OVER () AS tr, SUM(n_cand) OVER () AS tc
        FROM j
    )
    SELECT CAST(bucket AS INT) AS bucket,
           CAST(n_ref AS BIGINT) AS n_ref,
           CAST(n_cand AS BIGINT) AS n_cand,
           ROUND(
               (GREATEST(n_cand / tc, 1e-4) - GREATEST(n_ref / tr, 1e-4))
               * LN(GREATEST(n_cand / tc, 1e-4)
                    / GREATEST(n_ref / tr, 1e-4)),
               6
           ) AS psi
    FROM t
"""


@register(
    "psi_drift_orders",
    oracle=PSI_DRIFT_ORDERS_SQL,
    tags=("analytics", "drift"),
)
def psi_drift_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_data_lake_spark.operators.profile import drift_report

    orders = load_table(spark, sf_dir, "orders")
    ref = orders.where(F.col("o_orderdate") < F.lit("1998-01-01"))
    cand = orders.where(F.col("o_orderdate") >= F.lit("1998-01-01"))
    report = drift_report(
        ref, cand, "o_totalprice", bins=20, lo=0.0, hi=500000.0
    )
    return report.select(
        F.col("bucket").cast("int").alias("bucket"),
        "n_ref",
        "n_cand",
        F.round("psi", 6).alias("psi"),
    )


def anomaly_zscore_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_data_lake_spark.operators.anomaly import trailing_zscores

    orders = load_table(spark, sf_dir, "orders")
    return trailing_zscores(
        orders,
        "o_totalprice",
        ("o_custkey",),
        ("o_orderdate", "o_orderkey"),
        window=10,
        min_periods=3,
    ).select(
        "o_custkey",
        "o_orderkey",
        F.round("zscore", 6).alias("zscore"),
    )
