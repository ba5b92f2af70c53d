"""Point-in-interval range join, bucketized.

Spark executes a bare non-equi join (`p.ts BETWEEN i.lo AND i.hi`) as
BroadcastNestedLoopJoin — every point × every interval, the quadratic
trap (SURVEY.md §4's class of "algorithmically wrong at scale" naive
translations, same family as the all-pairs similarity join). The
standard fix is to manufacture an equi-key: quantize time into
fixed-width buckets, send each POINT to its one bucket, replicate each
INTERVAL to every bucket it overlaps, hash-join on the bucket, then
apply the exact BETWEEN as a residual filter.

Each (point, interval) pair can meet in at most ONE bucket — the
point's — so no post-join dedup is needed; correctness falls out of
the construction. Cost: |points| + Σ interval_span/bucket_width join
rows instead of |points|·|intervals|. Pick bucket_width ≈ typical
interval span so replication stays O(1) per interval.

The as-of join (operators/timeseries.asof_join) is the one-sided
sibling; this is the containment form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: int,
) -> DataFrame:
    """Inner join of points to every interval containing them
    (inclusive bounds). `point_col`, `lo_col`, `hi_col` are numeric
    (epoch seconds as long, typically). Returns all columns of both
    inputs for matching pairs.
    """
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    pts = points.withColumn(
        "__b", F.floor(F.col(point_col) / bucket_width).cast("long")
    )
    ivls = intervals.withColumn(
        "__b",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / bucket_width).cast("long"),
                F.floor(F.col(hi_col) / bucket_width).cast("long"),
            )
        ),
    )
    return (
        pts.join(ivls, "__b")
        .filter(
            (F.col(point_col) >= F.col(lo_col))
            & (F.col(point_col) <= F.col(hi_col))
        )
        .drop("__b")
    )
