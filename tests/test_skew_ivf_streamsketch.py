"""Tests for salted joins, IVF ANN, and streaming sketch merging."""

from __future__ import annotations

from pyspark.sql import functions as F

from introduction_in_big_data_spark.operators import ivf, similarity, skew
from introduction_in_big_data_spark.sources.tables import load_table
from introduction_in_big_data_spark.streaming import stream as st
from introduction_in_big_data_spark.streaming.sketch_stream import run_streaming_cms


def test_salted_join_matches_plain_join(spark):
    """Salting must not change join semantics — hot-key fixture with
    90% of probe rows on one key."""
    probe = spark.createDataFrame(
        [(1, i) for i in range(900)] + [(k, 0) for k in range(2, 102)], "k int, v int"
    )
    build = spark.createDataFrame([(k, f"d{k}") for k in range(1, 102)], "k int, d string")
    plain = skew.salted_join(probe, build, "k", salt=8)
    expected = probe.join(build, "k")
    assert plain.count() == expected.count() == 1000
    assert (
        plain.groupBy("k").count().subtract(expected.groupBy("k").count()).count() == 0
    )


def test_salting_bounds_partition_skew(spark, sf_dir):
    """The physical claim behind plans/skew_queries.py: hashing the
    skewed key alone puts ~90% of rows in one shuffle partition, while
    the (key, salt) hash bounds the largest partition to roughly
    max(hot)/salt. Assert the max-partition/median-partition ratio
    collapses by at least 4x after salting."""
    from introduction_in_big_data_spark.plans.skew_queries import (
        SKEW_SALT,
        _skewed_probe,
    )

    probe = _skewed_probe(spark, sf_dir)
    n_part = 32

    def max_partition_rows(df):
        dist = (
            df.withColumn("__pid", F.spark_partition_id())
            .groupBy("__pid")
            .count()
            .collect()
        )
        return max(r["count"] for r in dist)

    unsalted_max = max_partition_rows(probe.repartition(n_part, "k"))
    salt_col = F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(SKEW_SALT))
    salted_max = max_partition_rows(
        probe.withColumn("__salt", salt_col.cast("int")).repartition(
            n_part, "k", "__salt"
        )
    )
    total = probe.count()
    assert unsalted_max >= total * 0.85, "fixture must actually be skewed"
    assert salted_max * 4 <= unsalted_max, (
        f"salting should split the hot partition: {salted_max} vs {unsalted_max}"
    )


def test_salted_join_outer_preserves_unmatched(spark):
    probe = spark.createDataFrame([(1, "a"), (99, "b")], "k int, v string")
    build = spark.createDataFrame([(1, "x")], "k int, d string")
    out = skew.salted_join(probe, build, "k", salt=4, how="left")
    rows = {(r["k"], r["d"]) for r in out.collect()}
    assert rows == {(1, "x"), (99, None)}


def test_ivf_topk_recall(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.brute_force_topk(emb, queries, 5).collect()
    }
    approx_df = ivf.ivf_topk(emb, queries, 5, n_cells=16, nprobe=4)
    approx = {(r["query_id"], r["neighbor_id"]) for r in approx_df.collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.3, f"IVF recall@5 = {recall}"
    assert len({q for q, _ in approx}) == 10


def test_ivf_probes_fraction_of_corpus(spark, sf_dir):
    """nprobe/n_cells bounds the searched fraction."""
    emb = load_table(spark, sf_dir, "embeddings")
    centroids = ivf.train_centroids(emb, 16)
    cells = ivf._cell_assignments(emb, centroids, "vec_id", 1)
    sizes = cells.groupBy("cell").count().collect()
    assert len(sizes) > 1, "k-means should produce multiple populated cells"
    total = sum(r["count"] for r in sizes)
    assert total == emb.count()


def test_streaming_cms_matches_batch_cms(spark, sf_dir):
    """Merged per-batch sketches == the single-pass batch sketch
    (mergeability), and estimates dominate exact counts."""
    s = st.events_stream(spark, sf_dir, n_files=5)
    cms = run_streaming_cms(s, "event_type")
    assert cms.batches_seen == 5
    events = load_table(spark, sf_dir, "events")
    keys = events.select("event_type").distinct()
    streamed = {
        r["event_type"]: r["cms_estimate"]
        for r in cms.estimate(spark, keys).collect()
    }
    from introduction_in_big_data_spark.operators import sketch as sk

    batch = {
        r["event_type"]: r["cms_estimate"]
        for r in sk.cms_estimate(sk.cms_build(events, "event_type"), keys, "event_type").collect()
    }
    exact = {
        r["event_type"]: r["cnt"]
        for r in events.groupBy("event_type").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    assert streamed == batch  # merge of batch sketches == sketch of whole
    for k, v in exact.items():
        assert streamed[k] >= v
