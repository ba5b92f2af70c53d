"""Scan-parallelism repair for per-row-expensive map stages.

A parquet scan's partition count is bounded by file count x row
groups — maxPartitionBytes can only SPLIT at row-group boundaries.
The driver testdata ships one single-row-group file per table, so
every map-heavy stage (shingle explode, minhash signatures,
content-defined gram extraction, codec kernels) runs in ONE task
until its first exchange. The scale probe exposed this (SCALE.md,
round-3 continuation): a 12.35s jpeg query dropped to 1.97s once
spread.

`spread_if_narrow` round-robin repartitions ONLY when the frame's
planned parallelism is below the cluster's — so at real scale, where
a 100 TB table scans as tens of thousands of splits, it is the
identity and costs nothing; on narrow inputs it pays one small
shuffle of the projected columns to unlock every core. Call it on the
PROJECTED frame (ids + the columns the kernel needs), never on a full
wide table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_if_narrow(df: DataFrame, multiplier: int = 2) -> DataFrame:
    """Repartition to multiplier x defaultParallelism iff the frame
    currently plans fewer partitions than that. The check reads the
    physical plan's partitioning (no job runs)."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism * multiplier
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
