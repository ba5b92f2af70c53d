"""More TPC-H-shaped queries covering join/subquery patterns not yet in
the registry: EXISTS semi-join with a non-equi residual (Q4), left-join
distribution (Q13), conditional-aggregate share (Q14), decorrelated
scalar-subquery threshold (Q17), scalar-filter + anti-join (Q22), and
lag/ntile analytic windows.

The driver tables are a reduced TPC-H schema (no commitdate /
receiptdate / shipmode columns), so each shape keeps the plan pattern
of its namesake while using the columns that exist (TESTDATA.md).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .registry import register, t


@register(
    "q4_priority_order_counts",
    oracle="""
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders
        WHERE EXISTS (
            SELECT 1 FROM lineitem
            WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
        )
        GROUP BY o_orderpriority
    """,
    tags=("join", "semi", "agg"),
)
def q4_priority_order_counts(spark, sf_dir):
    """Q4 shape: EXISTS becomes a LEFT SEMI join whose condition mixes
    an equi key with a non-equi residual (l_shipdate > o_orderdate).
    Catalyst keeps the equi part as the shuffle key and evaluates the
    residual post-match, so the semi-join still hash-partitions — no
    nested-loop blowup. Timestamps are only compared, never rendered,
    so the query is session-timezone-free."""
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


@register(
    "q13_order_count_distribution",
    oracle="""
        SELECT c_count, count(*) AS custdist
        FROM (
            SELECT c_custkey, count(o_orderkey) AS c_count
            FROM customer LEFT JOIN orders ON c_custkey = o_custkey
            GROUP BY c_custkey
        )
        GROUP BY c_count
    """,
    tags=("join", "outer", "agg"),
)
def q13_order_count_distribution(spark, sf_dir):
    """Q13 shape: left outer join preserving order-less customers, then
    a two-level aggregate (orders per customer → customers per order
    count). The first aggregate shares the join's c_custkey
    partitioning (no extra exchange); the second groups a tiny
    distribution, so its shuffle moves ~distinct-count rows."""
    c = t(spark, sf_dir, "customer").select("c_custkey")
    o = t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q14_promo_revenue_share",
    oracle="""
        SELECT round(
                 100.0 * sum(CASE WHEN p_type = 'PROMO'
                                  THEN l_extendedprice * (1 - l_discount)
                                  ELSE 0.0 END)
                 / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_share
        FROM lineitem JOIN part ON l_partkey = p_partkey
    """,
    tags=("join", "agg"),
)
def q14_promo_revenue_share(spark, sf_dir):
    """Q14 shape: conditional aggregate over a fact⋈dim join — the
    CASE folds into the same map-side partial aggregate as the
    denominator, so one broadcast join + one single-row reduce covers
    both sums (no second pass, no second shuffle)."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                4,
            ).alias("promo_share")
        )
    )


@register(
    "q17_below_avg_qty_revenue",
    oracle="""
        WITH th AS (
            SELECT l_partkey, 0.2 * avg(l_quantity) AS qty_thresh
            FROM lineitem GROUP BY l_partkey
        )
        SELECT p_brand, round(sum(l_extendedprice), 2) AS small_qty_revenue
        FROM lineitem
        JOIN th   USING (l_partkey)
        JOIN part ON p_partkey = l_partkey
        WHERE l_quantity < qty_thresh
        GROUP BY p_brand
    """,
    tags=("join", "agg", "subquery"),
)
def q17_below_avg_qty_revenue(spark, sf_dir):
    """Q17 shape: the correlated scalar subquery (per-part average
    quantity) decorrelated into an aggregate + equi-join — the only
    form that scales: one shuffle by l_partkey feeds both the
    threshold aggregate and the re-join, instead of one subquery
    execution per outer row. FP-safe across engines because
    l_quantity is integer-valued, so avg is exact in both.
    Threshold comparison happens before the part join, so the
    broadcast dim only sees surviving rows."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    th = li.groupBy("l_partkey").agg(
        (0.2 * F.avg("l_quantity")).alias("qty_thresh")
    )
    small = (
        li.select("l_partkey", "l_quantity", "l_extendedprice")
        .join(th, "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_thresh"))
    )
    return (
        small.join(F.broadcast(p), small.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(F.round(F.sum("l_extendedprice"), 2).alias("small_qty_revenue"))
    )


@register(
    "q22_idle_customer_balance",
    oracle="""
        WITH avg_bal AS (
            SELECT round(avg(c_acctbal), 4) AS threshold
            FROM customer WHERE c_acctbal > 0.0
        )
        SELECT c_nationkey, count(*) AS numcust,
               round(sum(c_acctbal), 2) AS totacctbal
        FROM customer, avg_bal
        WHERE c_acctbal > threshold
          AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        GROUP BY c_nationkey
    """,
    tags=("join", "anti", "agg", "subquery"),
)
def q22_idle_customer_balance(spark, sf_dir):
    """Q22 shape: global scalar (avg positive balance) gating an
    anti-join. The scalar is a 1-row aggregate cross-joined in (a
    BroadcastNestedLoopJoin of one row — free), NOT collected to the
    driver, so the plan stays fully distributed. The threshold is
    rounded to 4 decimals on both engines so partial-aggregation
    summation order can't flip a boundary row. NOT EXISTS is a left
    anti join on o_custkey."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").select("o_custkey")
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg(F.round(F.avg("c_acctbal"), 4).alias("threshold"))
    )
    rich = c.crossJoin(F.broadcast(avg_bal)).filter(
        F.col("c_acctbal") > F.col("threshold")
    )
    idle = rich.join(o, rich.c_custkey == o.o_custkey, "left_anti")
    return idle.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("numcust"),
        F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
    )


@register(
    "daily_revenue_momentum",
    oracle="""
        WITH daily AS (
            SELECT datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
                       AS day_num,
                   round(sum(o_totalprice), 2) AS revenue
            FROM orders GROUP BY day_num
        )
        SELECT day_num, revenue,
               round(revenue - lag(revenue) OVER (ORDER BY day_num), 2) AS delta
        FROM daily
    """,
    tags=("window", "agg", "timeseries"),
)
def daily_revenue_momentum(spark, sf_dir):
    """lag() analytic: day-over-day revenue delta. The global-order
    window runs on the DAILY rollup (one row per day — a few thousand
    rows even over decades of 100 TB history), so the single-partition
    sort it implies is deliberate and cheap; the heavy lifting is the
    distributed pre-aggregate. Days are epoch-day integers via
    calendar-date arithmetic (o_orderdate is TIMESTAMP_NTZ; rendering
    it would be session-timezone-dependent, day arithmetic is not)."""
    o = t(spark, sf_dir, "orders")
    day = F.datediff(
        F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")
    )
    daily = o.groupBy(day.alias("day_num")).agg(
        F.round(F.sum("o_totalprice"), 2).alias("revenue")
    )
    w = Window.orderBy("day_num")
    return daily.select(
        "day_num",
        "revenue",
        F.round(F.col("revenue") - F.lag("revenue").over(w), 2).alias("delta"),
    )


@register(
    "acctbal_quartile_stats",
    oracle="""
        SELECT quartile, count(*) AS n,
               round(min(c_acctbal), 2) AS lo,
               round(max(c_acctbal), 2) AS hi
        FROM (
            SELECT c_acctbal,
                   ntile(4) OVER (ORDER BY c_acctbal, c_custkey) AS quartile
            FROM customer
        )
        GROUP BY quartile
    """,
    tags=("window", "agg"),
)
def acctbal_quartile_stats(spark, sf_dir):
    """ntile() analytic: equal-frequency quartiles over account
    balance, deterministic via the c_custkey tiebreak (both engines
    follow the SQL-standard remainder-to-leading-buckets rule). The
    summary output per bucket keeps the result size constant
    regardless of input scale. For 100 TB inputs the exact global
    ntile would sort one partition; approx_percentile cutpoints +
    a range filter is the documented scale path (operators/topk.py)."""
    c = t(spark, sf_dir, "customer")
    w = Window.orderBy(F.asc("c_acctbal"), F.asc("c_custkey"))
    return (
        c.select("c_acctbal", F.ntile(4).over(w).alias("quartile"))
        .groupBy("quartile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("c_acctbal"), 2).alias("lo"),
            F.round(F.max("c_acctbal"), 2).alias("hi"),
        )
    )
