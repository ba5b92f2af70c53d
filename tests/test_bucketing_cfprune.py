"""Bucketed-table co-located joins and the pruned CF similarity path."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from introduction_in_big_data_spark.operators import cf
from introduction_in_big_data_spark.sources.tables import load_table


def test_bucketed_join_avoids_shuffle(spark, sf_dir):
    """bucketBy(key) both sides -> the join runs with ZERO Exchange
    operators: the co-location contract big recurring joins rely on at
    100 TB (shuffle paid once at write time, never per query)."""
    import shutil

    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    for t_ in ("b_orders", "b_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {t_}")
        shutil.rmtree(f"spark-warehouse/{t_}", ignore_errors=True)
    (orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
     .mode("overwrite").saveAsTable("b_orders"))
    (lineitem.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
     .mode("overwrite").saveAsTable("b_lineitem"))

    # at this tiny SF Catalyst would broadcast and bypass bucketing;
    # disable auto-broadcast so the plan shows the co-located SMJ path
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("b_lineitem").join(
            spark.table("b_orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        ).groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("cnt"))

        buf = io.StringIO()
        with redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    import re

    # count physical nodes via the detail section "(N) Exchange" —
    # formatted explain prints each node in both tree and detail
    n_exchanges = len(re.findall(r"\(\d+\) Exchange", plan))
    # the join itself must be exchange-free; only the final 3-group agg
    # may exchange
    assert "SortMergeJoin" in plan
    assert n_exchanges <= 1, f"bucketed join should not shuffle, got:\n{plan}"

    plain = lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey).groupBy(
        "o_orderstatus"
    ).agg(F.count(F.lit(1)).alias("cnt"))
    assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, plain.collect()))
    spark.sql("DROP TABLE b_orders")
    spark.sql("DROP TABLE b_lineitem")


def _ratings(spark, sf_dir):
    r = cf.ratings_from_sales(
        load_table(spark, sf_dir, "orders"), load_table(spark, sf_dir, "lineitem")
    )
    r = cf.filter_active_users(r, 10)
    return cf.filter_popular_items(r, 0.05).cache()


def test_pruned_similarity_knn_recall(spark, sf_dir):
    """The pruned pair stream must keep almost all of the exact top-k
    neighborhood while shrinking the pair stream."""
    r = _ratings(spark, sf_dir)
    exact_sims = cf.user_cosine_similarities(r)
    pruned_sims = cf.user_cosine_similarities_pruned(r, min_overlap=2)
    assert pruned_sims.count() < exact_sims.count()
    exact_knn = {
        (x["user_id"], x["neighbor_id"]) for x in cf.knn_neighbors(exact_sims, 2).collect()
    }
    pruned_knn = {
        (x["user_id"], x["neighbor_id"]) for x in cf.knn_neighbors(pruned_sims, 2).collect()
    }
    recall = len(exact_knn & pruned_knn) / len(exact_knn)
    # sparse sf0.001 ratings: many exact neighbors share only 1 item,
    # which min_overlap=2 deliberately prunes - recall rises with density
    assert recall >= 0.5, f"pruned k-NN recall {recall}"
