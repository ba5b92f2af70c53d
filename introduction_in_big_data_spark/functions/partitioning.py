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


def spread_if_narrow(df: DataFrame, multiplier: float = 2) -> DataFrame:
    """Repartition to multiplier x defaultParallelism iff the frame
    currently plans fewer partitions than that. The check reads the
    physical plan's partitioning (no job runs).

    multiplier calibrates task granularity for the downstream work:
    2x (default) keeps per-row-expensive kernels (codecs, shingling)
    busy through stragglers; fractional values (<1) suit multi-stage
    shuffle pipelines where per-task/stage machinery would otherwise
    dominate the spread's win (measured: char-LM at 64 partitions runs
    1.7s, at 16 partitions 1.2s on the same sf0.1 input — tiny tasks
    pay more in scheduling than they earn in parallelism). At cluster
    scale a wide scan already plans >= target and this is an identity
    either way."""
    sc = df.sparkSession.sparkContext
    target = max(1, int(sc.defaultParallelism * multiplier))
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
