"""Sketch / approximate queries (A14-A15). xxhash64/Datasketches have
no DuckDB twins, so every registered query here is a CONTRACT WITNESS
(VERDICT r5 item 1): the sketch estimate itself is not SQL-expressible,
but its error contract is a boolean both engines must agree on — the
Spark side recomputes the exact value next to the estimate and emits
`ok` booleans; the DuckDB oracle computes the same exact value and
asserts TRUE. A broken sketch flips a boolean and fails the value
hash. Raw-estimate forms live on as operators (operators/sketch.py),
exercised by the error-bound property tests in tests/test_sketch.py
(exact-vs-approx pairing the reference implies but never checks —
SURVEY.md §5 item 4).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import sketch
from .registry import register, t


# Tolerance for the witness booleans: 5 sigma for HLL++ at rsd=0.02,
# comfortably >6 sigma for the lgK=12 Datasketches default — the same
# bound sketch_hll_vs_exact has held driver-green since r3.
_HLL_RSD = 0.02
_HLL_TOL = 5 * _HLL_RSD


def _within(est, exact, tol=_HLL_TOL):
    return F.abs(est.cast("double") - exact) <= F.lit(tol) * exact


@register(
    "sketch_approx_distinct_users",
    oracle="""
        SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct,
               TRUE AS hllpp_ok
        FROM events
    """,
    tags=("sketch", "approx"),
)
def sketch_approx_distinct_users(spark, sf_dir):
    """HLL++ distinct users as a contract witness: the estimate rides
    through operators/sketch.approx_distinct, the exact count rides
    next to it, and the emitted row is (exact, |est-exact| <= 5*rsd*
    exact) — hash-checkable because DuckDB agrees on the exact count
    and asserts the boolean TRUE (VERDICT r5 item 1; the raw estimate
    stays property-tested in tests/test_sketch.py)."""
    e = t(spark, sf_dir, "events")
    approx = sketch.approx_distinct(e, "user_id", rsd=_HLL_RSD)
    exact = e.agg(F.countDistinct("user_id").alias("exact_distinct"))
    return exact.crossJoin(approx).select(
        "exact_distinct",
        _within(F.col("approx_distinct"), F.col("exact_distinct")).alias("hllpp_ok"),
    )


@register(
    "sketch_hll_by_type",
    oracle="""
        SELECT event_type,
               CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct,
               TRUE AS hll_ok
        FROM events GROUP BY event_type
    """,
    tags=("sketch", "approx"),
)
def sketch_hll_by_type(spark, sf_dir):
    """Per-event-type Datasketches HLL estimates (mergeable state),
    witnessed: each group's estimate must land within tolerance of the
    exact per-type distinct, and the exact counts + booleans hash-match
    the DuckDB twin."""
    e = t(spark, sf_dir, "events")
    est = sketch.hll_estimate_by_group(e, ["event_type"], "user_id")
    exact = e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_distinct")
    )
    return exact.join(est, "event_type").select(
        "event_type",
        "exact_distinct",
        _within(F.col("hll_distinct"), F.col("exact_distinct")).alias("hll_ok"),
    )


@register(
    "sketch_hll_merged",
    oracle="""
        SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct,
               TRUE AS merged_ok
        FROM events
    """,
    tags=("sketch", "approx"),
)
def sketch_hll_merged(spark, sf_dir):
    """Union of per-type HLL sketches → global estimate without a
    rescan — the mergeability the reference's in-memory HLL lacks —
    witnessed against the global exact distinct: a broken merge path
    (double-counting, dropped sketches) lands outside tolerance and
    flips the boolean."""
    e = t(spark, sf_dir, "events")
    merged = sketch.hll_merged_total(e, ["event_type"], "user_id")
    exact = e.agg(F.countDistinct("user_id").alias("exact_distinct"))
    return exact.crossJoin(merged).select(
        "exact_distinct",
        _within(F.col("hll_distinct_total"), F.col("exact_distinct")).alias(
            "merged_ok"
        ),
    )


def _cms_oracle(width: int, depth: int) -> str:
    """DuckDB twin of the md5-mode CMS: same seeded-md5 buckets
    (('0x' || first 15 hex digits)::BIGINT % width == Spark's
    conv(...,16,10) pmod width), same (depth,bucket,cnt) sketch table,
    same min-over-depth point query."""
    bucket = (
        "CAST(('0x' || substr(md5(CAST(d AS VARCHAR) || ':' || event_type), 1, 15))"
        " AS BIGINT) % {w}"
    ).format(w=width)
    return f"""
        WITH cells AS (
            SELECT d.d AS depth, {bucket} AS bucket
            FROM events, unnest(range(0, {depth})) AS d(d)
        ),
        cms AS (
            SELECT depth, bucket, count(*) AS cnt FROM cells
            GROUP BY depth, bucket
        ),
        probes AS (
            SELECT DISTINCT event_type, d.d AS depth, {bucket} AS bucket
            FROM events, unnest(range(0, {depth})) AS d(d)
        ),
        est AS (
            SELECT p.event_type,
                   CAST(min(coalesce(cms.cnt, 0)) AS BIGINT) AS cms_estimate
            FROM probes p LEFT JOIN cms USING (depth, bucket)
            GROUP BY p.event_type
        )
        SELECT est.event_type, est.cms_estimate,
               CAST(x.exact_cnt AS BIGINT) AS exact_cnt
        FROM est JOIN (
            SELECT event_type, count(*) AS exact_cnt FROM events
            GROUP BY event_type
        ) x USING (event_type)
    """


@register(
    "sketch_cms_event_types",
    oracle=_cms_oracle(sketch.CMS_WIDTH, sketch.CMS_DEPTH),
    tags=("sketch", "cms"),
)
def sketch_cms_event_types(spark, sf_dir):
    """Relational Count-Min Sketch over event_type, point-queried for
    every distinct type, next to exact counts (est ≥ exact one-sided
    bound is asserted in tests). Runs in md5 hash mode so the ENTIRE
    sketch — every (depth, bucket) cell count and every point
    estimate — is hash-checked against a DuckDB twin, not just bounded
    (the same reproducibility trick as MinHash/SimHash; xxhash64 mode
    in operators/sketch.py stays the fast default)."""
    e = t(spark, sf_dir, "events")
    cms = sketch.cms_build(e, "event_type", hash_fn="md5")
    keys = e.select("event_type").distinct()
    est = sketch.cms_estimate(cms, keys, "event_type", hash_fn="md5")
    exact = e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("exact_cnt")
    )
    return est.join(exact, "event_type")


@register(
    "sketch_approx_quantiles",
    oracle="""
        SELECT CAST(count(l_extendedprice) AS BIGINT) AS n,
               TRUE AS p25_ok, TRUE AS p50_ok, TRUE AS p75_ok
        FROM lineitem
    """,
    tags=("sketch", "approx"),
)
def sketch_approx_quantiles(spark, sf_dir):
    """GK-sketch percentiles of lineitem extendedprice, witnessed by
    the sketch's own rank contract: each returned value v must bracket
    the requested quantile within eps*n ranks — cnt_lt(v) < (q+eps)*n
    and cnt_le(v) >= (q-eps)*n, both exact integer counts recomputed
    against the data. Unlike sketch_quantiles_vs_exact (which probes
    the raw percentile_approx expression), this witness rides through
    operators/sketch.approx_quantiles — the registered operator is the
    thing checked."""
    accuracy = 10000
    eps = 1.0 / accuracy
    probs = [0.25, 0.5, 0.75]
    li = t(spark, sf_dir, "lineitem")
    q = sketch.approx_quantiles(li, "l_extendedprice", probs, accuracy=accuracy)
    stats = q.crossJoin(li.agg(F.count("l_extendedprice").alias("n")))
    probe = li.crossJoin(F.broadcast(stats))
    c = F.col("l_extendedprice")
    aggs = [F.first("n").alias("n")]
    for i in range(len(probs)):
        v = F.col("quantiles")[i]
        aggs.append(F.sum((c < v).cast("long")).alias(f"_lt{i}"))
        aggs.append(F.sum((c <= v).cast("long")).alias(f"_le{i}"))
    counted = probe.agg(*aggs)
    out_cols = [F.col("n")]
    for i, (qp, name) in enumerate(zip(probs, ["p25_ok", "p50_ok", "p75_ok"])):
        n = F.col("n").cast("double")
        out_cols.append(
            (
                (F.col(f"_lt{i}") < (qp + eps) * n + 1)
                & (F.col(f"_le{i}") >= (qp - eps) * n - 1)
            ).alias(name)
        )
    return counted.select(*out_cols)


@register(
    "sketch_hll_vs_exact",
    oracle="""
        SELECT event_type,
               CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct,
               TRUE AS hllpp_ok, TRUE AS hll_ok
        FROM events GROUP BY event_type
        UNION ALL
        SELECT '*' AS event_type,
               CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct,
               TRUE AS hllpp_ok, TRUE AS hll_ok
        FROM events
    """,
    tags=("sketch", "approx"),
)
def sketch_hll_vs_exact(spark, sf_dir):
    """Deterministic witness for the HLL family (VERDICT r2 item 4):
    the estimates themselves have no DuckDB twin, but their ERROR
    CONTRACT does. Emits per-type exact distincts plus booleans
    asserting HLL++ (rsd=0.02, bound 5*rsd) and the Datasketches
    estimate land within tolerance, and a '*' row checking the
    hll_union_agg merge path against the global exact — all
    hash-comparable because both engines agree the booleans must be
    TRUE. A broken sketch (or merge) flips a boolean and fails the
    hash, turning the three rows-only HLL queries' machinery into a
    driver-checkable component (same pattern as the CMS md5 twin)."""
    rsd = 0.02
    tol = 5 * rsd  # 5 sigma for HLL++; >6 sigma for lgK=12 Datasketches

    def ok(est, exact):
        return (
            F.abs(est.cast("double") - exact) <= F.lit(tol) * exact
        ).alias  # caller names it

    e = t(spark, sf_dir, "events")
    per = e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_distinct"),
        F.approx_count_distinct("user_id", rsd).alias("_hllpp"),
        F.hll_sketch_agg("user_id").alias("_sk"),
    )
    per_rows = per.select(
        "event_type",
        "exact_distinct",
        ok(F.col("_hllpp"), F.col("exact_distinct"))("hllpp_ok"),
        ok(F.hll_sketch_estimate("_sk"), F.col("exact_distinct"))("hll_ok"),
    )
    glob = e.agg(
        F.countDistinct("user_id").alias("exact_distinct"),
        F.approx_count_distinct("user_id", rsd).alias("_hllpp"),
    )
    merged = per.agg(
        F.hll_sketch_estimate(F.hll_union_agg("_sk")).alias("_hll_merged")
    )
    glob_row = glob.crossJoin(merged).select(
        F.lit("*").alias("event_type"),
        "exact_distinct",
        ok(F.col("_hllpp"), F.col("exact_distinct"))("hllpp_ok"),
        ok(F.col("_hll_merged"), F.col("exact_distinct"))("hll_ok"),
    )
    return per_rows.unionByName(glob_row)


@register(
    "sketch_quantiles_vs_exact",
    oracle="""
        SELECT CAST(count(l_extendedprice) AS BIGINT) AS n,
               TRUE AS p25_ok, TRUE AS p50_ok, TRUE AS p75_ok
        FROM lineitem
    """,
    tags=("sketch", "approx"),
)
def sketch_quantiles_vs_exact(spark, sf_dir):
    """Deterministic witness for the GK quantile sketch: the sketch
    guarantees each returned value's rank is within eps*n of the
    requested quantile (eps = 1/accuracy). Both rank bounds are exact
    integer counts Spark recomputes against the data — cnt_lt(v) <
    (q+eps)*n and cnt_le(v) >= (q-eps)*n (the tie-aware bracketing) —
    so the booleans are TRUE iff the sketch honored its contract, and
    the oracle agrees on TRUE plus the exact row count n."""
    accuracy = 10000
    eps = 1.0 / accuracy
    probs = [0.25, 0.5, 0.75]
    li = t(spark, sf_dir, "lineitem")
    stats = li.agg(
        F.expr(
            f"percentile_approx(l_extendedprice, array({', '.join(map(str, probs))}),"
            f" {accuracy})"
        ).alias("_qs"),
        F.count("l_extendedprice").alias("n"),
    )
    probe = li.crossJoin(F.broadcast(stats))
    c = F.col("l_extendedprice")
    aggs = [F.first("n").alias("n")]
    for i in range(len(probs)):
        v = F.col("_qs")[i]
        aggs.append(
            F.sum((c < v).cast("long")).alias(f"_lt{i}")
        )
        aggs.append(
            F.sum((c <= v).cast("long")).alias(f"_le{i}")
        )
    counted = probe.agg(*aggs)
    out_cols = [F.col("n")]
    for i, (q, name) in enumerate(zip(probs, ["p25_ok", "p50_ok", "p75_ok"])):
        n = F.col("n").cast("double")
        ok_col = (
            (F.col(f"_lt{i}") < (q + eps) * n + 1)
            & (F.col(f"_le{i}") >= (q - eps) * n - 1)
        ).alias(name)
        out_cols.append(ok_col)
    return counted.select(*out_cols)
