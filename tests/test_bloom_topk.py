"""Bloom-filter join pruning and approximate heavy hitters."""

from __future__ import annotations

from pyspark.sql import functions as F

from introduction_in_big_data_spark.operators.bloom import bloom_prune
from introduction_in_big_data_spark.sources.tables import load_table


def test_bloom_prune_preserves_join_semantics(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    hot_parts = load_table(spark, sf_dir, "part").filter("p_size > 45").select("p_partkey")
    pruned = bloom_prune(li, hot_parts, "l_partkey", "p_partkey")
    exact_join = li.join(hot_parts, li.l_partkey == hot_parts.p_partkey, "left_semi")
    # no false negatives: pruned ⊇ exact matches
    assert pruned.count() >= exact_join.count()
    missing = exact_join.select("l_orderkey", "l_linenumber").subtract(
        pruned.select("l_orderkey", "l_linenumber")
    )
    assert missing.count() == 0
    # and it actually prunes (most non-matching rows dropped)
    assert pruned.count() < li.count()
    # prune + real join == plain join (exactness restored)
    a = pruned.join(hot_parts, pruned.l_partkey == hot_parts.p_partkey, "left_semi")
    assert a.count() == exact_join.count()


def test_approx_top_k_heavy_hitters(spark, sf_dir):
    """approx_top_k sketch vs exact heavy hitters — the reference's
    top-5 report (Part_B.py:112-114) in sketch form."""
    e = load_table(spark, sf_dir, "events")
    approx = e.agg(F.expr("approx_top_k(event_type, 3)").alias("tk")).collect()[0]["tk"]
    approx_items = {r["item"] for r in approx}
    exact = {
        r["event_type"]
        for r in e.groupBy("event_type").count().orderBy(F.desc("count")).limit(3).collect()
    }
    # with only 5 distinct types the sketch must be exact
    assert approx_items == exact
