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


def test_exact_ntile_matches_window_ntile(spark):
    """operators/topk.exact_ntile (distributed rank: range repartition
    + per-partition offsets) must reproduce SQL ntile() exactly —
    including the remainder-to-leading-buckets rule — for bucket
    counts that do and don't divide n, and n < n_buckets."""
    from pyspark.sql import Window

    from introduction_in_big_data_spark.operators import topk

    df = spark.createDataFrame(
        [(i, (i * 37) % 101) for i in range(103)], "id long, v long"
    )
    for n_buckets in (4, 7, 200):
        got = {
            r["id"]: r["bucket"]
            for r in topk.exact_ntile(df, n_buckets, ["v", "id"]).collect()
        }
        w = Window.orderBy("v", "id")  # tiny frame: global window OK in a test
        want = {
            r["id"]: r["nt"]
            for r in df.select("id", F.ntile(n_buckets).over(w).alias("nt")).collect()
        }
        assert got == want, f"n_buckets={n_buckets}"
