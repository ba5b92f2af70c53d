"""Exact-vs-approximate pairing tests (SURVEY.md §5 item 4) — the
cross-checks Part_B.py implies (exact and approx counters for the same
quantities) but never performs."""

from __future__ import annotations

from pyspark.sql import functions as F

from introduction_in_big_data_spark.operators import sketch
from introduction_in_big_data_spark.sources.tables import load_table


def test_approx_distinct_within_rsd(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    exact = e.select("user_id").distinct().count()
    approx = sketch.approx_distinct(e, "user_id", rsd=0.02).collect()[0][0]
    assert abs(approx - exact) <= max(3, 5 * 0.02 * exact)


def test_hll_group_and_merge(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    per_type = {
        r["event_type"]: r["hll_distinct"]
        for r in sketch.hll_estimate_by_group(e, ["event_type"], "user_id").collect()
    }
    exact = {
        r["event_type"]: r["d"]
        for r in e.groupBy("event_type").agg(F.countDistinct("user_id").alias("d")).collect()
    }
    for k, est in per_type.items():
        assert abs(est - exact[k]) <= max(3, 0.1 * exact[k]), (k, est, exact[k])
    merged = sketch.hll_merged_total(e, ["event_type"], "user_id").collect()[0][0]
    exact_total = e.select("user_id").distinct().count()
    assert abs(merged - exact_total) <= max(3, 0.1 * exact_total)


def test_cms_one_sided_bound(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    n = e.count()
    cms = sketch.cms_build(e, "event_type")
    keys = e.select("event_type").distinct()
    est = {
        r["event_type"]: r["cms_estimate"]
        for r in sketch.cms_estimate(cms, keys, "event_type").collect()
    }
    exact = {
        r["event_type"]: r["cnt"]
        for r in e.groupBy("event_type").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    for k in exact:
        assert est[k] >= exact[k], f"CMS must never under-count ({k})"
        # e/width bound with slack; tiny key domain makes collisions rare
        assert est[k] <= exact[k] + max(5, int(2.72 / sketch.CMS_WIDTH * n) * 3)


def test_cms_mergeable(spark, sf_dir):
    """Union + re-aggregate of two half-sketches == sketch of the union."""
    e = load_table(spark, sf_dir, "events")
    h1, h2 = e.filter("event_id % 2 = 0"), e.filter("event_id % 2 = 1")
    merged = (
        sketch.cms_build(h1, "event_type")
        .unionByName(sketch.cms_build(h2, "event_type"))
        .groupBy("depth", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    direct = sketch.cms_build(e, "event_type")
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, direct.collect()))


def test_approx_quantiles_close_to_exact(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    approx = sketch.approx_quantiles(li, "l_extendedprice", [0.5]).collect()[0][0][0]
    exact = li.agg(F.expr("percentile(l_extendedprice, 0.5)")).collect()[0][0]
    spread = (
        li.agg(F.max("l_extendedprice") - F.min("l_extendedprice")).collect()[0][0]
    )
    assert abs(approx - exact) <= 0.05 * spread
