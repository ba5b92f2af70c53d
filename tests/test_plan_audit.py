"""Automated physical-plan audit across the ENTIRE query registry —
the regression guard for the round-1 defect classes:

1. No single-partition WindowExec (a global `Window.orderBy` ranks the
   whole dataset on one task — the defect r1 shipped four of) unless
   the query is in the documented allowlist of bounded-small frames.
2. No CartesianProduct / nested-loop Cross join except the documented
   1-row scalar gates and the deliberately-quadratic oracle baselines.

Plans are built at sf0.001 and inspected as text; nothing is executed
beyond what query BUILDERS themselves run (scalar sizing jobs, k-means
training). Streaming queries are skipped — their builders execute the
stream and return a memory-table scan, which has no plan to audit.
"""

from __future__ import annotations

import pytest

from introduction_in_big_data_spark import plans

# Global-window allowlist: frames proven bounded-small (aggregate
# rollups over <= calendar-days rows or P partition summaries — see
# VERDICT r2 anti-pattern audit), or ties-ranking over one group's
# aggregate output.
GLOBAL_WINDOW_OK = {
    # MINIMAL set (VERDICT r3 item 8): exactly the queries whose plans
    # contain a partition-less window at sf0.001 AND sf0.1 (both
    # probed); every entry carries its bounded-size argument.
    "rolling_revenue_7d",       # daily rollup frame <= calendar days
    "daily_revenue_momentum",   # same daily-rollup shape
    "daily_revenue_anomalies",  # trailing-28d window over the daily rollup
    "daily_revenue_gap_filled", # LOCF window over the day calendar
    "token_shard_stats",        # distributed prefix sum: the global
                                # window runs over P partition SUMMARIES
                                # (P rows), not the data
}

# Cross-join allowlist: 1-row broadcast scalar gates (a cross join
# against a single aggregate row is a broadcast nested loop over ONE
# row) and the labeled O(n^2) oracle baselines whose registered scale
# twins are the defaults. MINIMAL set (VERDICT r3 item 8): exactly the
# queries that flag at sf0.001 AND sf0.1.
CROSS_OK = {
    # 1-row scalar gates (each crossJoins a single-row aggregate)
    "zscore_outlier_counts",    # 1-row (mean, std) gate
    "sigma_band_orders",        # 1-row (mean, std) band gate
    "mad_outlier_counts",       # 1-row (median, MAD) gate
    "q11_valuable_parts",       # 1-row global-value threshold (TPC-H Q11)
    "q22_idle_customer_balance",  # 1-row avg-balance gate (TPC-H Q22)
    "tfidf_top_terms",          # 1-row corpus doc-count N into idf
    "sketch_hll_vs_exact",      # 1-row exact-distinct vs estimate gate
    "sketch_quantiles_vs_exact",  # 1-row rank-contract bound gate
    "sketch_approx_distinct_users",  # 1-row rsd-bound gate
    "text_char_lm_quality",     # 1-row (N, V) scalar gate into the scorer
    "fk_orphan_counts",         # three 1-row scalar counts crossed into one row
    "triangle_count_copurchase",  # 1-row edge stats x 1-row wedge stats
    # r6 contract-witness queries (VERDICT r6 item 1): each plan is the
    # operator PLUS its in-plan verification, whose cross joins are the
    # allowlist's own accepted shapes — 1-row scalar gates and
    # probe/|Q|-bounded brute-force truth sides (linear in the corpus,
    # never all-pairs).
    "sketch_hll_merged",        # 1-row merged-HLL vs exact-distinct gate
    "sketch_approx_quantiles",  # 1-row rank-contract bound gate
    "ann_lsh_topk",       # |Q|-bounded (<=10 queries) broadcast brute-force
    "ann_ivf_topk",       # truth side for the recall witness + 1-row gate
    "embedding_near_dup_lsh",   # 200-probe broadcast exact check (O(P*n))
                                # + 1-row subset/recall gates
    "cf_knn_dimsum",  # 1-row median-norm sampling gate + 1-row recall
                      # gate; the witness's exact truth side is the
                      # pruned EQUI-join pair stream (no cross join)
    # labeled quadratic oracle baselines (scale twins are the defaults)
    "embedding_near_dup",       # exact O(n^2) near-dup; LSH twin is default
    "ann_bruteforce_topk",      # exact top-k truth baseline
    "ann_nn_join",              # exact NN join baseline
    "ann_sq8_topk",  # broadcast-queries brute force over int8 codes —
                     # same deliberate baseline shape as ann_bruteforce_topk
    "ann_pq_topk_fixed",    # exhaustive ADC over 4-byte PQ codes — the
    "ann_pq_refined_topk",  # deliberate scan PQ exists to make cheap
    "ann_eval_pq_vs_exact", # composes the exact-truth + ADC baselines
}


import re

_WSD_FIRST_ARG = re.compile(r"windowspecdefinition\(([^,()]*)[,)]")


def _offending_windows(plan: str) -> list[str]:
    """A windowspecdefinition whose FIRST argument is a sort-ordered
    expression (carries ASC/DESC) has no partition columns — Spark
    renders partition exprs first, bare, then order exprs. Robust to
    the line truncation that breaks `], [` separator counting."""
    out = []
    for line in plan.split("\n"):
        if "windowspecdefinition(" not in line:
            continue
        for first_arg in _WSD_FIRST_ARG.findall(line):
            if " ASC" in first_arg or " DESC" in first_arg:
                out.append(line.strip()[:120])
                break
    return out


def _offending_cross(plan: str) -> list[str]:
    out = []
    for line in plan.split("\n"):
        if "CartesianProduct" in line or (
            "NestedLoopJoin" in line and "Cross" in line
        ):
            out.append(line.strip()[:120])
    return out


def test_registry_plans_have_no_unexpected_global_windows_or_cross_joins(
    spark, sf_dir
):
    failures = []
    for spec in plans.REGISTRY.values():
        if "streaming" in spec.tags:
            continue
        try:
            df = spec.fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as ex:  # builder itself broken -> fail loudly
            failures.append(f"{spec.name}: builder error {ex}")
            continue
        if spec.name not in GLOBAL_WINDOW_OK:
            for w in _offending_windows(plan):
                failures.append(f"{spec.name}: single-partition window: {w}")
        if spec.name not in CROSS_OK:
            for c in _offending_cross(plan):
                failures.append(f"{spec.name}: cross join: {c}")
    assert not failures, "\n".join(failures)
