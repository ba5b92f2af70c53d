"""Time-series operators over event streams: as-of join and
sessionization — standard OLAP patterns Spark has no dedicated operator
for, composed here from windows (no UDFs, single shuffle each).

Both are pure window pipelines, so they scale like any windowed agg:
one hash shuffle on the partition key, then a per-partition sort —
and both have exact SQL twins for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_left: str,
    ts_right: str,
    right_cols: list[str],
) -> DataFrame:
    """As-of join: for each left row, the most recent right row with
    ts_right ≤ ts_left, per key.

    Implemented with the union trick: tag both inputs, sort per key by
    (ts, right-before-left at ties), carry right values forward with
    last(ignorenulls) over an unbounded-preceding window, keep left
    rows. One shuffle on the key — no range join, no per-group UDF
    (`pd.merge_asof` via applyInPandas is the fallback when the right
    side needs interpolation)."""
    lt = left.withColumn("__side", F.lit(1))
    rt = right.select(
        F.col(on),
        F.col(ts_right).alias(ts_left),
        *[F.col(c) for c in right_cols],
    ).withColumn("__side", F.lit(0))
    for c in right_cols:
        lt = lt.withColumn(c, F.lit(None).cast(rt.schema[c].dataType))
    for c in lt.columns:
        if c not in rt.columns:
            rt = rt.withColumn(c, F.lit(None).cast(lt.schema[c].dataType))
    unioned = lt.unionByName(rt.select(*lt.columns))
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts_left), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.select(
        *[
            F.last(c, ignorenulls=True).over(w).alias(c) if c in right_cols else F.col(c)
            for c in unioned.columns
        ]
    )
    return carried.filter(F.col("__side") == 1).drop("__side")


def sessionize(
    events: DataFrame,
    key: str,
    ts_col: str,
    gap_seconds: int,
) -> DataFrame:
    """Assign session ids: a new session starts when the gap to the
    previous event of the same key exceeds `gap_seconds`.

    lag → gap flag → running sum = session index. Single shuffle on the
    key; the streaming twin is `session_window(ts, gap)`."""
    w = Window.partitionBy(key).orderBy(ts_col)
    epoch = F.unix_timestamp(F.col(ts_col))
    prev = F.lag(epoch).over(w)
    new_session = F.when(
        prev.isNull() | ((epoch - prev) > gap_seconds), 1
    ).otherwise(0)
    return events.withColumn(
        "session_id",
        F.sum(new_session).over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("long"),
    )


def session_stats(
    events: DataFrame, key: str, ts_col: str, gap_seconds: int
) -> DataFrame:
    """Per-key session summary: session count, mean session length
    (seconds), mean events per session."""
    s = sessionize(events, key, ts_col, gap_seconds)
    epoch = F.unix_timestamp(F.col(ts_col))
    per_session = s.groupBy(key, "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max(epoch) - F.min(epoch)).alias("dur_s"),
    )
    return per_session.groupBy(key).agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.round(F.avg("dur_s"), 4).alias("avg_session_sec"),
        F.round(F.avg("n_events"), 4).alias("avg_events_per_session"),
    )


def funnel_stage_times(
    events: DataFrame,
    user_col: str,
    type_col: str,
    ts_col: str,
    stages: list[str],
) -> DataFrame:
    """Ordered-funnel analysis: for each user, the earliest time of
    stage k that occurs STRICTLY AFTER their stage k-1 time (classic
    view→click→purchase conversion). Returns one row per user with a
    nullable `t_<stage>` column per stage; a null means the funnel
    broke there.

    Scale shape: stage 0 is a filtered min-aggregate keyed by user;
    each later stage is the same aggregate over that stage's events
    joined to the accumulated per-user frame — every stage is one
    shuffle on the user key and the per-user frame (≤1 row per user)
    only shrinks relative to the event stream. The join stays on the
    same key every time, so at scale consecutive stages reuse the
    partitioning (no reshuffles of the big side beyond its own
    aggregate). len(stages) is small and fixed — the loop builds a
    static plan, not an iteration.

    Timestamps are compared as integer microseconds (`unix_micros`) —
    exact, timezone-free, and identical in any engine.
    """
    if not stages:
        raise ValueError("stages must be non-empty")
    us = F.unix_micros(F.col(ts_col))
    typed = events.select(
        F.col(user_col).alias("user"),
        F.col(type_col).alias("etype"),
        us.alias("t_us"),
    )
    acc = (
        typed.filter(F.col("etype") == stages[0])
        .groupBy("user")
        .agg(F.min("t_us").alias(f"t_{stages[0]}"))
    )
    for prev, cur in zip(stages, stages[1:]):
        nxt = (
            typed.filter(F.col("etype") == cur)
            .join(acc.select("user", f"t_{prev}"), "user")
            .filter(F.col("t_us") > F.col(f"t_{prev}"))
            .groupBy("user")
            .agg(F.min("t_us").alias(f"t_{cur}"))
        )
        acc = acc.join(nxt, "user", "left")
    return acc
