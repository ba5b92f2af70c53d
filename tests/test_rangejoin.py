"""Unit tests for the bucketized point-in-interval join: exact
equivalence to the naive non-equi join, and invariance to bucket width
(the knob must tune cost, never results)."""

from __future__ import annotations

from introduction_in_big_data_spark.operators.rangejoin import (
    point_in_interval_join,
)
from pyspark.sql import functions as F


def _fixture(spark):
    pts = spark.createDataFrame(
        [(i, 10 * i) for i in range(40)], "pid long, sec long"
    )
    ivls = spark.createDataFrame(
        [
            (100, 0, 35),      # short, within one bucket
            (101, 30, 170),    # spans several buckets
            (102, 171, 171),   # degenerate single-instant
            (103, 380, 500),   # tail past all points
            (104, 95, 105),    # straddles a bucket boundary
        ],
        "iid long, lo long, hi long",
    )
    return pts, ivls


def _pairs(df):
    return sorted((r["pid"], r["iid"]) for r in df.select("pid", "iid").collect())


def test_matches_naive_nonequi_join(spark):
    pts, ivls = _fixture(spark)
    naive = pts.join(
        ivls, (F.col("sec") >= F.col("lo")) & (F.col("sec") <= F.col("hi"))
    )
    fast = point_in_interval_join(pts, ivls, "sec", "lo", "hi", bucket_width=50)
    assert _pairs(fast) == _pairs(naive)
    assert len(_pairs(fast)) > 0


def test_bucket_width_invariance(spark):
    pts, ivls = _fixture(spark)
    results = [
        _pairs(point_in_interval_join(pts, ivls, "sec", "lo", "hi", w))
        for w in (1, 7, 50, 1000)
    ]
    assert all(r == results[0] for r in results[1:])


def test_no_duplicate_pairs(spark):
    pts, ivls = _fixture(spark)
    out = point_in_interval_join(pts, ivls, "sec", "lo", "hi", bucket_width=10)
    pairs = _pairs(out)
    assert len(pairs) == len(set(pairs))


def test_funnel_strict_ordering(spark):
    from introduction_in_big_data_spark.operators.timeseries import (
        funnel_stage_times,
    )

    rows = [
        # u1: clean conversion view(10) < click(20) < purchase(30)
        (1, "view", 10), (1, "click", 20), (1, "purchase", 30),
        # u2: click BEFORE view only -> funnel breaks at click
        (2, "click", 5), (2, "view", 10), (2, "purchase", 30),
        # u3: purchase before the qualifying click -> breaks at purchase
        (3, "view", 10), (3, "click", 20), (3, "purchase", 15),
        # u4: never viewed -> absent from output
        (4, "click", 5), (4, "purchase", 8),
        # u5: earliest click is pre-view, later click qualifies
        (5, "click", 1), (5, "view", 10), (5, "click", 40),
        (5, "purchase", 50),
        # u6: simultaneous view/click -> strict > rejects the click
        (6, "view", 10), (6, "click", 10),
    ]
    df = spark.createDataFrame(
        [(u, t_, ts * 1_000_000) for u, t_, ts in rows],
        "user_id long, event_type string, us long",
    ).withColumn("ts", F.timestamp_micros("us"))
    out = {
        r["user"]: (r["t_view"], r["t_click"], r["t_purchase"])
        for r in funnel_stage_times(
            df, "user_id", "event_type", "ts", ["view", "click", "purchase"]
        ).collect()
    }
    M = 1_000_000
    assert out == {
        1: (10 * M, 20 * M, 30 * M),
        2: (10 * M, None, None),
        3: (10 * M, 20 * M, None),
        5: (10 * M, 40 * M, 50 * M),
        6: (10 * M, None, None),
    }
