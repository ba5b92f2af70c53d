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
