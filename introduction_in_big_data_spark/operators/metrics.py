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
from pyspark.sql import functions as F


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


def ranking_metrics(
    truth: DataFrame, ranked: DataFrame, k: int, scale: int = 6
) -> DataFrame:
    """Retrieval evaluation — recall@k, MRR, nDCG@k per query, the
    metrics every ANN/index change is judged by (so the engine can
    evaluate its own indexes in-plan, no driver round trip):

      recall@k = |ranked_k ∩ truth| / |truth|
      MRR      = 1 / rank of the first hit (0 when none)
      nDCG@k   = Σ_hits 1/log2(rank+1)  /  Σ_{i=1..min(k,|truth|)} 1/log2(i+1)

    `truth`: (query_id, neighbor_id) relevant pairs; `ranked`:
    (query_id, neighbor_id, rn). One equi-join + per-query aggregate;
    every query in `ranked` appears (zero metrics when it has no truth
    or no hits). The ideal-DCG denominators are Python-computed
    literals (a k+1 cumulative-sum array indexed by min(k, |truth|))
    so a perfect ranking scores nDCG = 1 even when |truth| < k, and
    both engines divide by identical doubles; per-query float sums
    span <= k terms, far inside the rounding grid."""
    import math

    # cumsum[j] = Σ_{i=1..j} 1/log2(i+1); idcg per query indexes this
    # at min(k, n_truth) — element_at is 1-based, hence the +1.
    cums = [0.0]
    for i in range(1, k + 1):
        cums.append(cums[-1] + 1.0 / math.log2(i + 1))
    idcg_arr = F.array(*[F.lit(v) for v in cums])
    t = truth.select("query_id", "neighbor_id").withColumn("__hit", F.lit(1))
    n_truth = truth.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("__n_truth")
    )
    joined = ranked.join(t, ["query_id", "neighbor_id"], "left")
    per_q = (
        joined.groupBy("query_id")
        .agg(
            F.sum(F.coalesce(F.col("__hit"), F.lit(0))).alias("n_hits"),
            F.min(F.when(F.col("__hit") == 1, F.col("rn"))).alias("first_hit"),
            F.sum(
                F.when(
                    F.col("__hit") == 1, 1.0 / F.log2(F.col("rn") + F.lit(1.0))
                ).otherwise(F.lit(0.0))
            ).alias("dcg"),
        )
        .join(n_truth, "query_id", "left")
    )
    nt = F.coalesce(F.col("__n_truth"), F.lit(0))
    idcg = F.element_at(
        idcg_arr, (F.least(nt, F.lit(k)) + F.lit(1)).cast("int")
    )
    return per_q.select(
        "query_id",
        F.col("n_hits").cast("long").alias("n_hits"),
        F.when(nt > 0, F.round(F.col("n_hits") / nt, scale))
        .otherwise(F.lit(0.0))
        .alias("recall_at_k"),
        F.round(
            F.coalesce(1.0 / F.col("first_hit"), F.lit(0.0)), scale
        ).alias("mrr"),
        F.when(nt > 0, F.round(F.col("dcg") / idcg, scale))
        .otherwise(F.lit(0.0))
        .alias("ndcg"),
    )
