"""Sketch / approximate queries (A14-A15). xxhash64/Datasketches have
no DuckDB twins, so these are rows-only for the driver; the real
correctness gates are the error-bound property tests in
tests/test_sketch.py (exact-vs-approx pairing the reference implies
but never checks — SURVEY.md §5 item 4).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import sketch
from .registry import register, t


@register("sketch_approx_distinct_users", oracle=None, tags=("sketch", "approx"))
def sketch_approx_distinct_users(spark, sf_dir):
    """HLL++ distinct users next to the exact count — the exact/approx
    pairing as one DataFrame."""
    e = t(spark, sf_dir, "events")
    approx = sketch.approx_distinct(e, "user_id", rsd=0.02)
    exact = e.agg(F.countDistinct("user_id").alias("exact_distinct"))
    return approx.crossJoin(exact)


@register("sketch_hll_by_type", oracle=None, tags=("sketch", "approx"))
def sketch_hll_by_type(spark, sf_dir):
    """Per-event-type Datasketches HLL estimates (mergeable state)."""
    return sketch.hll_estimate_by_group(t(spark, sf_dir, "events"), ["event_type"], "user_id")


@register("sketch_hll_merged", oracle=None, tags=("sketch", "approx"))
def sketch_hll_merged(spark, sf_dir):
    """Union of per-type HLL sketches → global estimate without a
    rescan — the mergeability the reference's in-memory HLL lacks."""
    return sketch.hll_merged_total(t(spark, sf_dir, "events"), ["event_type"], "user_id")


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


@register("sketch_approx_quantiles", oracle=None, tags=("sketch", "approx"))
def sketch_approx_quantiles(spark, sf_dir):
    """GK-sketch percentiles of lineitem extendedprice."""
    li = t(spark, sf_dir, "lineitem")
    q = sketch.approx_quantiles(li, "l_extendedprice", [0.25, 0.5, 0.75])
    return q.select(
        F.col("quantiles")[0].alias("p25"),
        F.col("quantiles")[1].alias("p50"),
        F.col("quantiles")[2].alias("p75"),
    )
