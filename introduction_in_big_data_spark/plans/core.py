"""Core relational queries (SURVEY.md §2.1-2.8 on the driver tables).

Each query instantiates a reference pipeline on the TPC-H-ish driver
tables per FIXTURES.md's mapping table, e.g. the reference's
"ratings ⋈ books → group → top-20" (Part_A_Q1.py:49-72) becomes
"lineitem ⋈ part → groupBy p_brand → top-20".

Plan-shape notes are in each docstring: what shuffles, what broadcasts,
what pushes down. All of these run entirely in WholeStageCodegen with
zero Python in the data path.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..session import barrier

from ..operators import clean, relational, topk
from .registry import register, t


# --------------------------------------------------------------------------
# Aggregation / scan shape (TPC-H Q1 family): A1-A8, F3-F5
# --------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2)                                   AS sum_qty,
               round(sum(l_extendedprice), 2)                              AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 2)           AS sum_disc_price,
               round(avg(l_quantity), 4)                                   AS avg_qty,
               round(avg(l_extendedprice), 4)                              AS avg_price,
               round(avg(l_discount), 4)                                   AS avg_disc,
               count(*)                                                    AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2000-01-01 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    tags=("agg", "scan"),
    bench=True,
)
def q1_pricing_summary(spark, sf_dir):
    """TPC-H-Q1-shaped pricing summary: one scan, one hash aggregate.

    Scale: the shipdate filter and 6-column projection push into the
    parquet scan (PushedFilters/ReadSchema); the aggregate is partial
    (map-side) + final on 2 low-cardinality keys — shuffle carries only
    #groups × #partitions rows.
    """
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= F.lit("2000-01-01").cast("timestamp"))
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        F.round(F.avg("l_discount"), 4).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


@register(
    "top20_brands",
    oracle="""
        SELECT p_brand, count(*) AS cnt
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand
        ORDER BY cnt DESC, p_brand
        LIMIT 20
    """,
    tags=("join", "agg", "topk"),
    bench=True,
)
def top20_brands(spark, sf_dir):
    """Flagship: the reference's ratings⋈books → group → top-20 authors
    pipeline (Part_A_Q1.py:49-72) as lineitem⋈part → p_brand → top-20.

    Scale: part is the dimension side → explicit broadcast, so the fact
    table never shuffles for the join; the aggregate shuffles only
    (brand, partial-count) pairs; top-20 is TakeOrderedAndProject (per-
    partition heaps, no global sort).
    """
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part")
    joined = relational.join(li, part.select("p_partkey", "p_brand"),
                             on=li.l_partkey == part.p_partkey, broadcast=True)
    counts = relational.group_count(joined, ["p_brand"], out="cnt")
    return topk.top_k(counts, [F.desc("cnt"), F.asc("p_brand")], 20)


@register(
    "mktsegment_order_counts",
    oracle="""
        SELECT c_mktsegment, count(*) AS cnt
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
    """,
    tags=("join", "agg"),
)
def mktsegment_order_counts(spark, sf_dir):
    """Reference's ratings⋈users → groupBy Age (Part_A_Q1.py:80-86) as
    orders⋈customer → groupBy c_mktsegment. Broadcast the customer
    projection (2 columns) — at 100 TB the customer dim is still orders
    of magnitude smaller than the fact stream."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    joined = relational.join(o, c, on=o.o_custkey == c.c_custkey, broadcast=True)
    return relational.group_count(joined, ["c_mktsegment"], out="cnt")


@register(
    "supplier_region_rollup",
    oracle="""
        SELECT r_name, count(*) AS n_suppliers,
               round(sum(s_acctbal), 2) AS total_acctbal
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name
    """,
    tags=("join", "agg"),
)
def supplier_region_rollup(spark, sf_dir):
    """Two-hop dimension join (supplier→nation→region) + rollup.
    Both dims broadcast; the whole query is shuffle-free except the
    final 5-group aggregate."""
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    joined = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return joined.groupBy("r_name").agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        F.round(F.sum("s_acctbal"), 2).alias("total_acctbal"),
    )


# --------------------------------------------------------------------------
# Cleaning / predicates: P4-P13, F1-F2
# --------------------------------------------------------------------------


@register(
    "clean_parts",
    oracle="""
        SELECT p_partkey, p_name, p_brand, p_size
        FROM part
        WHERE regexp_matches(p_name, 'widget$')
          AND p_size BETWEEN 10 AND 40
    """,
    tags=("filter",),
)
def clean_parts(spark, sf_dir):
    """Regex + inclusive-range predicate chain — the reference's ISBN
    regex and year-band cleaning (Part_A_Q1.py:21-29, intended `[\\dX]`
    semantics). Both predicates reach the parquet scan: the range as a
    pushed filter, the regex evaluated in codegen directly over the
    scan output."""
    p = t(spark, sf_dir, "part")
    p = clean.regex_filter(p, "p_name", "widget$")
    p = clean.range_filter(p, "p_size", 10, 40, inclusive=True)
    return p.select("p_partkey", "p_name", "p_brand", "p_size")


@register(
    "customer_acctbal_band",
    oracle="""
        SELECT c_custkey, c_acctbal
        FROM customer
        WHERE c_acctbal > 0 AND c_acctbal < 5000
    """,
    tags=("filter",),
)
def customer_acctbal_band(spark, sf_dir):
    """Exclusive range band — the reference's 15 < Age < 80 filter
    (Part_A_Q1.py:38-39). Raw stored doubles pass through unchanged, so
    no rounding is needed for oracle parity."""
    c = t(spark, sf_dir, "customer")
    return clean.range_filter(c, "c_acctbal", 0, 5000, inclusive=False).select(
        "c_custkey", "c_acctbal"
    )


@register(
    "year_cast_range",
    oracle="""
        SELECT CAST(substr(CAST(o_orderdate AS VARCHAR), 1, 4) AS INTEGER) AS order_year,
               count(*) AS cnt
        FROM orders
        WHERE CAST(substr(CAST(o_orderdate AS VARCHAR), 1, 4) AS INTEGER) BETWEEN 1996 AND 1999
        GROUP BY order_year
    """,
    tags=("filter", "cast"),
)
def year_cast_range(spark, sf_dir):
    """String→int cast + range band — the reference's dirty
    Year-Of-Publication pipeline (Part_A_Q1.py:22-29): extract the year
    as a string, validate-by-cast, band-filter, then count per year."""
    o = t(spark, sf_dir, "orders")
    year = F.substring(F.col("o_orderdate").cast("string"), 1, 4).cast("int")
    return (
        o.withColumn("order_year", year)
        .filter(F.col("order_year").between(1996, 1999))
        .groupBy("order_year")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@register(
    "zscore_outlier_counts",
    oracle="""
        WITH stats AS (
            SELECT avg(l_extendedprice) AS m, stddev(l_extendedprice) AS s
            FROM lineitem
        )
        SELECT count(*) FILTER (WHERE abs((l_extendedprice - m) / s) < 3)  AS kept_cnt,
               count(*) FILTER (WHERE abs((l_extendedprice - m) / s) >= 3) AS removed_cnt
        FROM lineitem, stats
    """,
    tags=("filter", "stats"),
)
def zscore_outlier_counts(spark, sf_dir):
    """Z-score outlier split (Part_A_Q1.py:55-61): two-pass plan — a
    scalar aggregate (sample stddev, matching pandas), broadcast back as
    a 1-row frame, then a counted split. At scale pass 1 is a partial+
    final agg and pass 2 is a scan; nothing materializes on the driver."""
    li = t(spark, sf_dir, "lineitem")
    with_z = clean.with_zscore(li, "l_extendedprice", out="z")
    return with_z.agg(
        F.sum(F.when(F.abs(F.col("z")) < 3, 1).otherwise(0)).alias("kept_cnt"),
        F.sum(F.when(F.abs(F.col("z")) >= 3, 1).otherwise(0)).alias("removed_cnt"),
    )


@register(
    "sigma_band_orders",
    oracle="""
        WITH stats AS (
            SELECT avg(o_totalprice) AS m, stddev(o_totalprice) AS s FROM orders
        )
        SELECT o_orderkey
        FROM orders, stats
        WHERE NOT (o_totalprice > m + 3 * s OR o_totalprice < m - 3 * s)
    """,
    tags=("filter", "stats"),
)
def sigma_band_orders(spark, sf_dir):
    """Mean±3σ band filter — intended semantics of the reference's dead
    `remove_rating_outliers` (Part_A_Q1.py:89-99, ⚠ NameError in the
    original). Output is the surviving integer keys only, so float
    boundary noise can't enter the hash."""
    o = t(spark, sf_dir, "orders")
    return clean.sigma_band_filter(o, "o_totalprice", 3.0).select("o_orderkey")


@register(
    "dedup_first_order",
    oracle="""
        SELECT o_custkey, o_orderkey AS first_orderkey
        FROM (
            SELECT o_custkey, o_orderkey,
                   row_number() OVER (PARTITION BY o_custkey
                                      ORDER BY o_orderdate, o_orderkey) AS rn
            FROM orders
        )
        WHERE rn = 1
    """,
    tags=("dedup", "window"),
)
def dedup_first_order(spark, sf_dir):
    """Deterministic dedup-by-key (P13, Part_A_Q1.py:47's intended
    `drop_duplicates`): keep each customer's earliest order. One shuffle
    on the key; `dropDuplicates` would be cheaper but nondeterministic,
    so the engine's canonical dedup is the row_number form."""
    o = t(spark, sf_dir, "orders")
    first = clean.dedup_by_key(o, ["o_custkey"], ["o_orderdate", "o_orderkey"])
    return first.select("o_custkey", F.col("o_orderkey").alias("first_orderkey"))


# --------------------------------------------------------------------------
# Semi / anti joins: J3, J4, J6, P9
# --------------------------------------------------------------------------


@register(
    "active_customers",
    oracle="""
        SELECT c_custkey, c_name
        FROM customer
        WHERE c_custkey IN (
            SELECT o_custkey FROM orders GROUP BY o_custkey HAVING count(*) >= 10
        )
    """,
    tags=("join", "semi"),
)
def active_customers(spark, sf_dir):
    """Active-entity semi-join (J3): customers with ≥10 orders. Replaces
    the reference's collect-to-list + isin (Part_A_Q2.py:83-85) — the
    qualifying-key set stays distributed; at 100 TB it would be a
    shuffle-hash semi-join, never a driver-side list."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    active = (
        o.groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 10)
        .select("c_custkey")
    )
    return clean.semi_filter(c, active, on="c_custkey").select("c_custkey", "c_name")


@register(
    "top5pct_parts",
    oracle="""
        WITH counts AS (
            SELECT l_partkey, count(*) AS cnt
            FROM lineitem GROUP BY l_partkey
        ),
        k AS (SELECT CAST(floor(count(*) * 0.05) AS BIGINT) AS k FROM counts)
        SELECT l_partkey, cnt
        FROM (
            SELECT l_partkey, cnt,
                   row_number() OVER (ORDER BY cnt DESC, l_partkey) AS rn
            FROM counts
        ), k
        WHERE rn <= k
    """,
    tags=("join", "topk"),
)
def top5pct_parts(spark, sf_dir):
    """Top-5%-by-count keys (J4/K4, Part_A_Q2.py:87-89): count per part,
    take the top 5% of distinct parts by count (deterministic tiebreak
    on key).

    Scale plan (VERDICT r1 item 1): no global row_number window — a
    tiny scalar job sizes k = floor(0.05 * |parts|), then
    `orderBy(...).limit(k)` compiles to TakeOrderedAndProject
    (per-partition size-k heaps + driver merge). Nothing ever sorts
    the part dictionary on one executor."""
    li = t(spark, sf_dir, "lineitem")
    # lazy localCheckpoint: count() materializes it once for both
    # consumers; blocks are GC-freed, unlike CacheManager persist()
    counts = relational.group_count(li, ["l_partkey"], out="cnt").transform(barrier)
    k = int(counts.count() * 0.05)  # floor
    return (
        counts.orderBy(F.desc("cnt"), F.asc("l_partkey"))
        .limit(k)
        .select("l_partkey", "cnt")
    )


@register(
    "fk_orphan_counts",
    oracle="""
        SELECT
          (SELECT count(*) FROM lineitem
            WHERE NOT EXISTS (SELECT 1 FROM part WHERE p_partkey = l_partkey))   AS orphan_part_refs,
          (SELECT count(*) FROM lineitem
            WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)) AS orphan_order_refs
    """,
    tags=("join", "anti", "quality"),
)
def fk_orphan_counts(spark, sf_dir):
    """FK integrity as anti-join counts (J6) — the engine's replacement
    for the reference's MySQL FK constraints (Part_A_Q2.py:37-38).
    Expected 0/0 on clean data; the *shape* (broadcast anti-join per
    parent) is the 100 TB-safe audit."""
    li = t(spark, sf_dir, "lineitem")
    part_keys = t(spark, sf_dir, "part").select(F.col("p_partkey").alias("l_partkey"))
    order_keys = t(spark, sf_dir, "orders").select(F.col("o_orderkey").alias("l_orderkey"))
    a = relational.fk_violations(li, part_keys, on="l_partkey").agg(
        F.count(F.lit(1)).alias("orphan_part_refs")
    )
    b = relational.fk_violations(li, order_keys, on="l_orderkey").agg(
        F.count(F.lit(1)).alias("orphan_order_refs")
    )
    return a.crossJoin(b)


# --------------------------------------------------------------------------
# Distinct / histogram / stats / pivot: A7-A12
# --------------------------------------------------------------------------


@register(
    "distinct_parts_ordered",
    oracle="SELECT count(DISTINCT l_partkey) AS distinct_cnt FROM lineitem",
    tags=("agg", "distinct"),
)
def distinct_parts_ordered(spark, sf_dir):
    """Exact distinct count (A9, Part_A_Q2.py:87) — two-stage hash
    aggregate (per-partition distinct, then global)."""
    return relational.distinct_count(t(spark, sf_dir, "lineitem"), "l_partkey")


@register(
    "quantity_histogram",
    oracle="""
        SELECT CAST(floor(l_quantity / 5.0) AS BIGINT) AS bucket, count(*) AS cnt
        FROM lineitem GROUP BY bucket
    """,
    tags=("agg", "histogram"),
)
def quantity_histogram(spark, sf_dir):
    """Fixed-width histogram (A11, Part_A_Q1.py:51): one hash aggregate
    over floor(x/w); bucket count is bounded so the shuffle is tiny."""
    return relational.histogram(t(spark, sf_dir, "lineitem"), "l_quantity", 5.0)


@register(
    "quantity_summary",
    oracle="""
        SELECT count(l_quantity)              AS cnt,
               round(avg(l_quantity), 4)      AS mean,
               round(stddev(l_quantity), 4)   AS std,
               min(l_quantity)                AS min,
               max(l_quantity)                AS max
        FROM lineitem
    """,
    tags=("agg", "stats"),
)
def quantity_summary(spark, sf_dir):
    """Summary statistics (A7/A10, Part_A_Q1.py:14-16). Uses exact
    single-pass aggregates; Spark's df.summary() quartiles are
    approximate (SURVEY.md §7 risk #5) so the oracle-checked surface
    sticks to exact moments; exact percentiles live in
    `quantity_percentiles`."""
    s = relational.scalar_stats(t(spark, sf_dir, "lineitem"), "l_quantity")
    return s.select(
        F.col("cnt"),
        F.round("mean", 4).alias("mean"),
        F.round("std", 4).alias("std"),
        F.col("min"),
        F.col("max"),
    )


@register(
    "quantity_percentiles",
    oracle="""
        SELECT round(CAST(quantile_cont(l_quantity, 0.25) AS DOUBLE), 4) AS p25,
               round(CAST(quantile_cont(l_quantity, 0.50) AS DOUBLE), 4) AS p50,
               round(CAST(quantile_cont(l_quantity, 0.75) AS DOUBLE), 4) AS p75
        FROM lineitem
    """,
    tags=("agg", "stats"),
)
def quantity_percentiles(spark, sf_dir):
    """Exact interpolated percentiles (the exact counterpart of
    df.summary()'s approximate quartiles). Exact percentile requires a
    sort/collect of the column per group — fine for scalar stats; at
    100 TB prefer `percentile_approx` (see sketch.approx_quantiles)."""
    li = t(spark, sf_dir, "lineitem")
    return li.agg(
        F.round(F.expr("percentile(l_quantity, 0.25)"), 4).alias("p25"),
        F.round(F.expr("percentile(l_quantity, 0.50)"), 4).alias("p50"),
        F.round(F.expr("percentile(l_quantity, 0.75)"), 4).alias("p75"),
    )


@register(
    "pivot_qty_by_flag",
    oracle="""
        SELECT l_returnflag,
               round(coalesce(sum(l_quantity) FILTER (WHERE l_linestatus = 'F'), 0), 2) AS qty_f,
               round(coalesce(sum(l_quantity) FILTER (WHERE l_linestatus = 'O'), 0), 2) AS qty_o
        FROM lineitem
        GROUP BY l_returnflag
    """,
    tags=("agg", "pivot"),
)
def pivot_qty_by_flag(spark, sf_dir):
    """Pivot long→wide (A12, Part_A_Q2.py:92-98) with explicit column
    values (no extra distinct pass) and zero fill. Guardrail per
    SURVEY.md §4: pivot only over bounded domains; the CF pipeline
    stays long-format."""
    li = t(spark, sf_dir, "lineitem")
    wide = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.round(F.sum("l_quantity"), 2))
        .na.fill(0.0)
    )
    return wide.select(
        "l_returnflag", F.col("F").alias("qty_f"), F.col("O").alias("qty_o")
    )


# --------------------------------------------------------------------------
# Window / per-group top-k: K5, O4
# --------------------------------------------------------------------------


@register(
    "top3_parts_per_brand",
    oracle="""
        WITH rev AS (
            SELECT p_brand, l_partkey,
                   sum(l_extendedprice * (1 - l_discount)) AS revenue
            FROM lineitem JOIN part ON l_partkey = p_partkey
            GROUP BY p_brand, l_partkey
        )
        SELECT p_brand, l_partkey, round(revenue, 2) AS revenue, rn
        FROM (
            SELECT p_brand, l_partkey, revenue,
                   row_number() OVER (PARTITION BY p_brand
                                      ORDER BY revenue DESC, l_partkey) AS rn
            FROM rev
        )
        WHERE rn <= 3
    """,
    tags=("window", "topk", "join"),
    bench=True,
)
def top3_parts_per_brand(spark, sf_dir):
    """Per-group top-k via window row_number (K5) — the scalable form of
    the reference's per-row argsort k-NN slice (Part_A_Q2.py:121-123).
    Broadcast join, one agg shuffle on (brand, partkey), one window
    shuffle on brand."""
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    rev = (
        relational.join(li, part, on=li.l_partkey == part.p_partkey, broadcast=True)
        .groupBy("p_brand", "l_partkey")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )
    top = topk.top_k_per_group(
        rev, ["p_brand"], [F.desc("revenue"), F.asc("l_partkey")], 3, keep_rank=True
    )
    return top.select("p_brand", "l_partkey", F.round("revenue", 2).alias("revenue"), "rn")


# --------------------------------------------------------------------------
# Set operations (§2.7)
# --------------------------------------------------------------------------


@register(
    "setops_customer_cohorts",
    oracle="""
        SELECT c_custkey, 'rich_not_active' AS cohort FROM (
            SELECT c_custkey FROM customer WHERE c_acctbal > 8000
            EXCEPT
            SELECT o_custkey FROM orders GROUP BY o_custkey HAVING count(*) >= 10
        )
        UNION ALL
        SELECT c_custkey, 'rich_and_active' AS cohort FROM (
            SELECT c_custkey FROM customer WHERE c_acctbal > 8000
            INTERSECT
            SELECT o_custkey FROM orders GROUP BY o_custkey HAVING count(*) >= 10
        )
    """,
    tags=("setop",),
)
def setops_customer_cohorts(spark, sf_dir):
    """union / intersect / except surface (§2.7 — absent in the
    reference, exposed as built-ins). Set ops compile to aggregate/join
    forms Catalyst optimizes like any other plan."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    rich = c.filter(F.col("c_acctbal") > 8000).select("c_custkey")
    active = (
        o.groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(F.count(F.lit(1)).alias("n"))
        .filter("n >= 10")
        .select("c_custkey")
    )
    rich_not_active = rich.subtract(active).withColumn("cohort", F.lit("rich_not_active"))
    rich_and_active = rich.intersect(active).withColumn("cohort", F.lit("rich_and_active"))
    return rich_not_active.unionByName(rich_and_active)


# --------------------------------------------------------------------------
# JSON / nested / time functions over events: F10-F13
# --------------------------------------------------------------------------


@register(
    "events_json_extract",
    oracle="""
        SELECT event_type,
               CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
               count(*) AS cnt
        FROM events
        GROUP BY event_type
    """,
    tags=("json", "agg"),
)
def events_json_extract(spark, sf_dir):
    """JSON-path extraction over the events.props string column (F10,
    the driver's analog of Part_B.py's nested-JSON access). At scale
    prefer from_json once into a struct column over repeated
    get_json_object calls."""
    e = t(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return e.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"), F.count(F.lit(1)).alias("cnt")
    )


@register(
    "events_props_map",
    oracle="""
        SELECT key AS prop_key,
               CAST(sum(CAST(json_extract_string(props, '$.' || key) AS BIGINT)) AS BIGINT) AS total,
               count(*) AS cnt
        FROM (SELECT unnest(json_keys(props)) AS key, props FROM events)
        GROUP BY key
    """,
    tags=("json", "map", "agg"),
)
def events_props_map(spark, sf_dir):
    """MapType surface: parse the whole props JSON once into
    map<string,long>, explode entries, aggregate per key — the
    scan-friendly alternative to repeated get_json_object calls when
    multiple keys are consumed (parse once, not once per key)."""
    e = t(spark, sf_dir, "events")
    m = F.from_json(F.col("props"), "map<string,bigint>")
    return (
        e.select(F.explode(m).alias("prop_key", "val"))
        .groupBy("prop_key")
        .agg(F.sum("val").alias("total"), F.count(F.lit(1)).alias("cnt"))
    )


@register(
    "q6_forecast_revenue",
    oracle="""
        SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
               count(*) AS cnt
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """,
    tags=("scan", "filter", "agg"),
    bench=True,
)
def q6_forecast_revenue(spark, sf_dir):
    """TPC-H-Q6 shape: pure scan + conjunctive filters + scalar agg —
    the pushdown probe. Every predicate reaches the parquet scan
    (PushedFilters); zero shuffles beyond the 1-row final agg."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )


@register(
    "events_hourly",
    oracle="""
        SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
               event_type,
               count(*) AS cnt,
               round(sum(value), 2) AS total_value
        FROM events
        GROUP BY hour_epoch, event_type
    """,
    tags=("time", "agg"),
    bench=True,
)
def events_hourly(spark, sf_dir):
    """Tumbling-hour batch aggregation over event time — the batch twin
    of the streaming windowed agg (stream-batch parity per SURVEY.md §5).

    The hour bucket is pure epoch arithmetic (`unix_timestamp div 3600`)
    rather than date_format/date_trunc rendering: calendar rendering is
    session-timezone dependent (a driver session in a non-UTC — or a
    non-whole-hour-offset — zone would shift every bucket), while the
    epoch of an instant is timezone-free on both engines."""
    e = t(spark, sf_dir, "events")
    hour_epoch = F.expr("(unix_timestamp(ts) div 3600) * 3600").cast("long")
    return e.groupBy(hour_epoch.alias("hour_epoch"), F.col("event_type")).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


@register(
    "events_props_variant",
    oracle="""
        SELECT CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_bucket,
               count(*) AS cnt,
               CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
                   AS sum_k
        FROM events
        GROUP BY k_bucket
    """,
    tags=("json", "variant", "agg"),
)
def events_props_variant(spark, sf_dir):
    """Semi-structured access via Spark 4's VARIANT type: props is
    parsed ONCE into the binary variant encoding, then fields are read
    with variant_get — the scale path for JSON-heavy tables, where
    repeated get_json_object calls would re-parse the string per
    access and per query. (events_json_extract keeps the classic
    string-path form for comparison; a production table would persist
    the variant column in parquet so the parse happens once at ingest,
    not once per query.)"""
    e = t(spark, sf_dir, "events")
    v = F.parse_json("props")
    k = F.variant_get(v, "$.k", "long")
    return (
        e.select(k.alias("k_val"))
        .groupBy((F.col("k_val") % 10).alias("k_bucket"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("k_val").alias("sum_k"),
        )
    )


@register(
    "events_sliding_1h_30m",
    oracle="""
        SELECT (epoch_us(ts) // 1800000000 - i) * 1800 AS window_epoch,
               event_type,
               count(*) AS cnt
        FROM events, unnest([0, 1]) AS u(i)
        GROUP BY window_epoch, event_type
    """,
    tags=("time", "window", "sliding", "agg"),
)
def events_sliding_1h_30m(spark, sf_dir):
    """Sliding event-time windows in batch: 1-hour windows every 30
    minutes, so each event lands in exactly 2 overlapping buckets.
    Spark's F.window(slideDuration=...) expands the buckets inside the
    scan projection (a Generate of window/duration structs) before one
    hash aggregate — same shape as the oracle's explicit 2-element
    unnest. Window starts are emitted as epoch seconds (timezone-free);
    the streaming twin uses identical semantics via the same F.window
    expression."""
    e = t(spark, sf_dir, "events")
    w = F.window("ts", "1 hour", "30 minutes")
    return (
        e.groupBy(w.alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.unix_timestamp("w.start").alias("window_epoch"),
            "event_type",
            "cnt",
        )
    )
