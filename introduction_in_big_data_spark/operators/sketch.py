"""Approximate / sketch operators (SURVEY.md §2.4 A14-A15, §2.9).

The reference hand-rolls Count-Min Sketch (Part_B.py:67-88) and a buggy
HyperLogLog (Part_B.py:38-65, ⚠ bucket-bit skew + final-report
TypeError — SURVEY.md flags it; this module implements the intended
semantics, never the bugs).

Engine mapping:
- HLL → `approx_count_distinct` (HLL++) for one-shot estimates, and
  `hll_sketch_agg`/`hll_union_agg`/`hll_sketch_estimate` (Spark 3.5+
  Datasketches) for *mergeable* sketch state — the property the
  reference's per-counter dicts lack and the one that matters at scale:
  partial sketches merge across partitions, batches, and days.
- CMS → implemented relationally: the sketch *is* a DataFrame of
  (depth, bucket, count) built with one explode + one hash aggregate —
  distributed, mergeable by union+re-aggregate, and queryable by join.
  This is deliberately not `df.stat.countMinSketch` (a driver-side
  object): at 100 TB the sketch table itself stays distributed.
- quantiles → `percentile_approx` (GK sketch), the scan-friendly
  alternative to exact `percentile`.

Error bounds (property-tested in tests/test_sketch.py):
  CMS: est ≥ exact;  est ≤ exact + (e/width)·N  w.p. ≥ 1-(1/e)^depth
  HLL/approx_count_distinct: relative error ~ rsd.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CMS_WIDTH = 1024
CMS_DEPTH = 5


def approx_distinct(df: DataFrame, column: str, rsd: float = 0.05) -> DataFrame:
    """A15 — one-shot HLL++ distinct estimate."""
    return df.agg(F.approx_count_distinct(column, rsd).alias("approx_distinct"))


def hll_estimate_by_group(df: DataFrame, keys: list[str], column: str) -> DataFrame:
    """Per-group Datasketches HLL estimates (mergeable state)."""
    return df.groupBy(*keys).agg(
        F.hll_sketch_estimate(F.hll_sketch_agg(column)).alias("hll_distinct")
    )


def hll_merged_total(df: DataFrame, keys: list[str], column: str) -> DataFrame:
    """Demonstrates sketch mergeability: per-group sketches →
    hll_union_agg → one global estimate without rescanning the data.
    This is the streaming/cross-day rollup pattern the reference's
    in-memory HLL cannot express."""
    per_group = df.groupBy(*keys).agg(F.hll_sketch_agg(column).alias("sk"))
    return per_group.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("hll_distinct_total")
    )


def _bucket(column, d: int, width: int, hash_fn: str = "xxhash64"):
    """Row d's bucket for a value: seeded hash, pmod (never %:
    ANSI-safe, non-negative).

    hash_fn "md5": the first 15 md5 hex digits as a 60-bit integer —
    byte-identical in DuckDB via ('0x' || substr(md5(...),1,15))::
    BIGINT, which makes the WHOLE sketch table oracle-checkable (the
    same reproducibility trick as MinHash/SimHash). xxhash64 stays
    the fast default."""
    seeded = F.concat(F.lit(f"{d}:"), F.col(column).cast("string"))
    if hash_fn == "md5":
        h = F.conv(F.substring(F.md5(seeded), 1, 15), 16, 10).cast("long")
    else:
        h = F.xxhash64(seeded)
    return F.pmod(h, F.lit(width)).cast("int")


def cms_build(
    df: DataFrame,
    column: str,
    width: int = CMS_WIDTH,
    depth: int = CMS_DEPTH,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """A14 — Count-Min Sketch as a (depth, bucket, cnt) DataFrame:
    one explode (depth rows per input row) + one hash aggregate.
    ≤ width·depth rows regardless of input size. Merge two sketches by
    unionByName + re-aggregate (sum)."""
    cells = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("depth"), _bucket(column, d, width, hash_fn).alias("bucket")
                    )
                    for d in range(depth)
                ]
            )
        ).alias("c")
    ).select("c.depth", "c.bucket")
    return cells.groupBy("depth", "bucket").agg(F.count(F.lit(1)).alias("cnt"))


def cms_estimate(
    cms: DataFrame,
    keys: DataFrame,
    column: str,
    width: int = CMS_WIDTH,
    depth: int = CMS_DEPTH,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Point-query the sketch for each key: recompute the key's buckets,
    join the sketch table, min over depth rows. A join, not a
    driver-side lookup — the sketch never leaves the cluster."""
    probes = keys.select(
        F.col(column),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("depth"), _bucket(column, d, width, hash_fn).alias("bucket")
                    )
                    for d in range(depth)
                ]
            )
        ).alias("c"),
    ).select(column, "c.depth", "c.bucket")
    return (
        probes.join(cms, ["depth", "bucket"], "left")
        .na.fill({"cnt": 0})
        .groupBy(column)
        .agg(F.min("cnt").alias("cms_estimate"))
    )


def approx_quantiles(
    df: DataFrame, column: str, probabilities: list[float], accuracy: int = 10000
) -> DataFrame:
    """Approximate percentiles (GK sketch) — the 100 TB alternative to
    exact sort-based `percentile` (see plans/core.quantity_percentiles
    for the exact twin)."""
    probs = ", ".join(str(p) for p in probabilities)
    return df.agg(
        F.expr(
            f"percentile_approx({column}, array({probs}), {accuracy})"
        ).alias("quantiles")
    )
