"""SparkSession factory.

Single place where execution knobs live so every entry point (tests,
bench, driver) gets the same Catalyst/AQE configuration. The reference
has no session concept (single-process pandas); here the session IS the
engine: Catalyst plans, Tungsten executes, AQE re-plans at runtime.

Scale notes (local[N] now, 1000-executor cluster later):
- AQE on: runtime coalescing of small shuffle partitions, skew-join
  splitting, and broadcast-join demotion/promotion are all decided from
  real stage stats, which is exactly what a 100 TB run needs.
- shuffle.partitions defaults to the local core count; on a real cluster
  this should be ~2-3x total executor cores (set via env/extra_conf).
- Arrow enabled so the few Pandas-UDF operators (multimodal decode,
  CF fallback) move columns in batches, never row-at-a-time pickling.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    env = os.environ.get("SPARK_GRAFT_CPUS")
    if env:
        return max(1, int(env))
    return os.cpu_count() or 8


def get_spark(
    app_name: str = "introduction-in-big-data-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = cpus or default_parallelism()
    shuffle_partitions = shuffle_partitions or cpus
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # 8g measured FASTER than 16g for the bench suite (21.4s vs
        # 27-32s total): the larger heap lengthens G1 young-gen pauses
        # in the shuffle-heavy dedup queries without relieving any
        # memory pressure the workload actually has
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    # SPARK_GRAFT_CONF: semicolon-separated key=value pairs appended
    # last (they win). The deployment knob the optimization guide
    # asks for: scale-dependent settings (shuffle partitions, codec,
    # join thresholds) stay parameterised instead of hard-coded for
    # either local mode or a cluster size.
    for pair in os.environ.get("SPARK_GRAFT_CONF", "").split(";"):
        if "=" in pair:
            k, v = pair.split("=", 1)
            builder = builder.config(k.strip(), v.strip())
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
