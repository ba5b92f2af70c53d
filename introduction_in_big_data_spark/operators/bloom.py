"""Bloom-style join pruning: kill most non-matching fact rows *before*
the join shuffle using a compact summary of the dimension keys.

Spark applies this automatically as AQE runtime filtering where
thresholds allow (spark.sql.optimizer.runtime.bloomFilter.enabled; the
underlying bloom_filter_agg/might_contain expressions are internal —
not callable from SQL/PySpark). This operator is the explicit,
composable form: hash the dimension keys into m buckets, keep the
distinct bucket set (≤ m rows — the "bitmap"), broadcast-semi-join the
fact on its bucket.

Semantics match a 1-hash Bloom filter: false positives from bucket
collisions (rate ≈ |keys|/m), never false negatives — so
prune-then-join is semantics-preserving (tested). At 100 TB the bucket
set is a few MB broadcast instead of shuffling the fact into a join
that discards most rows."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bucket(col: str, m: int):
    return F.pmod(F.xxhash64(F.col(col).cast("string")), F.lit(m)).cast("long")


def bloom_prune(
    fact: DataFrame,
    keys: DataFrame,
    fact_key: str,
    keys_key: str,
    n_buckets: int = 1 << 20,
) -> DataFrame:
    """Filter `fact` to rows whose key hashes into a bucket occupied by
    some `keys` row. Keeps all true matches; drops non-matches with
    probability ≈ 1 - occupied/m."""
    occupied = (
        keys.select(_bucket(keys_key, n_buckets).alias("__bucket")).distinct()
    )
    return (
        fact.withColumn("__bucket", _bucket(fact_key, n_buckets))
        .join(F.broadcast(occupied), "__bucket", "left_semi")
        .drop("__bucket")
    )
