"""Pipeline observability: row-level metrics collected DURING a job via
`Dataset.observe` — zero extra scans.

The naive way to account for a cleaning pipeline (the reference prints
before/after counts by re-counting: Part_A_Q1.py:52,60-61) costs one
full pass per number; at 100 TB each `.count()` is a job. `observe`
attaches accumulator-backed aggregates to the plan itself, so the
metrics fall out of the one action the pipeline already runs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation


def observed(df: DataFrame, **metrics: Column) -> tuple[DataFrame, Observation]:
    """Attach named metric expressions at this point of the plan.

    Returns (df, observation); read `observation.get` AFTER the first
    action on the returned frame. Metrics must be aggregates without
    distinct/ordering (Spark's observe contract — they run inside the
    tasks as accumulators).

        cleaned, obs = observed(raw.filter(...), kept=F.count(F.lit(1)))
        cleaned.write.parquet(out)
        stats = obs.get          # {"kept": ...} — no second scan
    """
    obs = Observation()
    names = list(metrics)
    out = df.observe(obs, *[metrics[n].alias(n) for n in names])
    return out, obs


def observed_rowcount(df: DataFrame) -> tuple[DataFrame, Observation]:
    """The before/after-count idiom (A8) as a free side effect."""
    from pyspark.sql import functions as F

    return observed(df, n_rows=F.count(F.lit(1)))
