"""Time-series queries over events: as-of join, sessionization,
unpivot — each with an exact DuckDB window-SQL twin."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import timeseries
from .registry import register, t

GAP_SECONDS = 1800  # 30-minute session gap


@register(
    "asof_last_signup",
    oracle="""
        WITH tagged AS (
            SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_epoch, event_type,
                   CASE WHEN event_type = 'signup' THEN CAST(floor(epoch(ts)) AS BIGINT) END AS signup_epoch,
                   CASE WHEN event_type = 'signup' THEN 0 ELSE 1 END AS side
            FROM events
            WHERE event_type IN ('signup', 'error')
        )
        SELECT user_id, ts_epoch,
               last_value(signup_epoch IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY ts_epoch, side
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS last_signup_epoch
        FROM tagged
        QUALIFY side = 1
    """,
    tags=("timeseries", "asof", "window"),
)
def asof_last_signup(spark, sf_dir):
    """As-of join: for every error event, the user's most recent signup
    at or before it (NULL if none yet) — the union-trick window form,
    one shuffle, no range join or UDF."""
    e = t(spark, sf_dir, "events")
    epoch = F.unix_timestamp(F.col("ts")).alias("ts_epoch")
    errors = e.filter(F.col("event_type") == "error").select("user_id", epoch)
    signups = e.filter(F.col("event_type") == "signup").select(
        "user_id", epoch, F.unix_timestamp(F.col("ts")).alias("last_signup_epoch")
    )
    joined = timeseries.asof_join(
        errors,
        signups.select("user_id", "ts_epoch", "last_signup_epoch"),
        on="user_id",
        ts_left="ts_epoch",
        ts_right="ts_epoch",
        right_cols=["last_signup_epoch"],
    )
    return joined.select("user_id", "ts_epoch", "last_signup_epoch")


@register(
    "session_stats_by_user",
    oracle=f"""
        WITH e AS (
            SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ep FROM events
        ),
        flagged AS (
            SELECT user_id, ep,
                   CASE WHEN lag(ep) OVER w IS NULL
                             OR ep - lag(ep) OVER w > {GAP_SECONDS}
                        THEN 1 ELSE 0 END AS new_s
            FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ep)
        ),
        sessions AS (
            SELECT user_id, ep,
                   sum(new_s) OVER (PARTITION BY user_id ORDER BY ep
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
            FROM flagged
        ),
        per_session AS (
            SELECT user_id, session_id, count(*) AS n_events,
                   max(ep) - min(ep) AS dur_s
            FROM sessions GROUP BY user_id, session_id
        )
        SELECT user_id,
               count(*) AS n_sessions,
               round(avg(dur_s), 4)    AS avg_session_sec,
               round(avg(n_events), 4) AS avg_events_per_session
        FROM per_session GROUP BY user_id
    """,
    tags=("timeseries", "session", "window"),
)
def session_stats_by_user(spark, sf_dir):
    """Sessionization (lag → gap flag → running sum) + per-user session
    summary. The streaming twin is session_window(ts, gap)."""
    e = t(spark, sf_dir, "events")
    return timeseries.session_stats(e, "user_id", "ts", GAP_SECONDS)


@register(
    "unpivot_balances",
    oracle="""
        SELECT n_nationkey, 'customer' AS side, round(bal, 2) AS bal FROM (
            SELECT c_nationkey AS n_nationkey, sum(c_acctbal) AS bal
            FROM customer GROUP BY c_nationkey)
        UNION ALL
        SELECT n_nationkey, 'supplier' AS side, round(bal, 2) AS bal FROM (
            SELECT s_nationkey AS n_nationkey, sum(s_acctbal) AS bal
            FROM supplier GROUP BY s_nationkey)
    """,
    tags=("unpivot",),
)
def unpivot_balances(spark, sf_dir):
    """Wide→long unpivot via stack() — the inverse of A12's pivot."""
    c = t(spark, sf_dir, "customer")
    s = t(spark, sf_dir, "supplier")
    cs = c.groupBy(F.col("c_nationkey").alias("n_nationkey")).agg(
        F.round(F.sum("c_acctbal"), 2).alias("customer")
    )
    ss = s.groupBy(F.col("s_nationkey").alias("n_nationkey")).agg(
        F.round(F.sum("s_acctbal"), 2).alias("supplier")
    )
    wide = cs.join(ss, "n_nationkey", "full_outer")
    long = wide.selectExpr(
        "n_nationkey",
        "stack(2, 'customer', customer, 'supplier', supplier) AS (side, bal)",
    )
    return long.filter(F.col("bal").isNotNull())


@register(
    "interval_event_counts",
    oracle="""
        WITH pts AS (
            SELECT event_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec, value
            FROM events
        ),
        anchors AS (
            SELECT event_id AS window_id, sec AS lo, sec + 7200 AS hi
            FROM pts
            ORDER BY value DESC, event_id
            LIMIT 20
        )
        SELECT a.window_id, a.lo,
               count(*) AS n_events,
               round(sum(p.value), 2) AS total_value
        FROM anchors a JOIN pts p ON p.sec BETWEEN a.lo AND a.hi
        GROUP BY a.window_id, a.lo
    """,
    tags=("timeseries", "join", "range"),
)
def interval_event_counts(spark, sf_dir):
    """Point-in-interval range join: the 20 highest-value events anchor
    2-hour windows; count and sum every event falling inside each. The
    naive BETWEEN join is a BroadcastNestedLoopJoin (points ×
    intervals); operators/rangejoin.point_in_interval_join quantizes to
    1-hour buckets so it runs as a hash equi-join with a residual
    filter — each interval replicates to ≤3 buckets, each point to
    exactly one, and a pair can only meet in the point's bucket (no
    dedup needed). Epoch-second arithmetic keeps it timezone-free."""
    from ..operators.rangejoin import point_in_interval_join

    e = t(spark, sf_dir, "events")
    pts = e.select(
        "event_id", F.col("ts").cast("long").alias("sec"), "value"
    )
    anchors = (
        pts.orderBy(F.desc("value"), F.asc("event_id"))
        .limit(20)
        .select(
            F.col("event_id").alias("window_id"),
            F.col("sec").alias("lo"),
            (F.col("sec") + 7200).alias("hi"),
        )
    )
    joined = point_in_interval_join(pts, anchors, "sec", "lo", "hi", 3600)
    return joined.groupBy("window_id", "lo").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


@register(
    "funnel_view_click_purchase",
    oracle="""
        WITH e AS (
            SELECT user_id AS u, event_type AS et, epoch_us(ts) AS t_us
            FROM events
        ),
        s0 AS (SELECT u, min(t_us) AS t_view FROM e
               WHERE et = 'view' GROUP BY u),
        s1 AS (SELECT e.u, min(t_us) AS t_click FROM e
               JOIN s0 ON e.u = s0.u
               WHERE et = 'click' AND t_us > t_view GROUP BY e.u),
        s2 AS (SELECT e.u, min(t_us) AS t_purchase FROM e
               JOIN s1 ON e.u = s1.u
               WHERE et = 'purchase' AND t_us > t_click GROUP BY e.u)
        SELECT s0.u AS user, t_view, t_click, t_purchase
        FROM s0 LEFT JOIN s1 ON s0.u = s1.u LEFT JOIN s2 ON s0.u = s2.u
    """,
    tags=("timeseries", "funnel", "agg", "join"),
)
def funnel_view_click_purchase(spark, sf_dir):
    """Ordered conversion funnel over the events table: per user, the
    earliest view time, earliest click strictly after it, and earliest
    purchase strictly after that (nullable where the funnel breaks) —
    every per-user microsecond timestamp is hash-checked, so the
    strict-ordering semantics are pinned row by row (a count-only
    output would pass even with ordering bugs when every user
    eventually converts). See operators/timeseries.funnel_stage_times;
    broken-funnel cases are unit-tested on a hand fixture in
    tests/test_rangejoin.py."""
    from ..operators.timeseries import funnel_stage_times

    e = t(spark, sf_dir, "events")
    return funnel_stage_times(
        e, "user_id", "event_type", "ts", ["view", "click", "purchase"]
    )
