"""The DIMSUM-sampled CF sketch twin (operators/cf.py
dimsum_sampled_ratings / candidate_pairs / rescore_pairs): recall vs
the exact pruned path, bit-identity of surviving similarities, and
layout-independence of the deterministic sampler."""

from __future__ import annotations

from pyspark.sql import functions as F

from introduction_in_big_data_spark.operators import cf
from introduction_in_big_data_spark.plans.cf_queries import (
    DIMSUM_FRACTION,
    DIMSUM_RECALL_FLOOR,
    K_NEIGHBORS,
    MIN_OVERLAP,
    _pipeline,
)


def _ratings(spark, sf_dir):
    return _pipeline(spark, sf_dir).localCheckpoint()


def test_dimsum_knn_recall_above_floor(spark, sf_dir):
    """Sketch k-NN recovers >= the registered floor of the exact pruned
    neighbor edges (measured ~0.86 at sf0.001; floor is half the
    weakest cross-scale measurement)."""
    ratings = _ratings(spark, sf_dir)
    exact = cf.knn_neighbors(
        cf.user_cosine_similarities_pruned(ratings, min_overlap=MIN_OVERLAP),
        K_NEIGHBORS,
    ).select("user_id", "neighbor_id")
    sampled = cf.dimsum_sampled_ratings(ratings, fraction_of_median=DIMSUM_FRACTION)
    sims = cf.rescore_pairs(
        cf.candidate_pairs(sampled), ratings, min_overlap=MIN_OVERLAP
    )
    approx = cf.knn_neighbors(sims, K_NEIGHBORS).select("user_id", "neighbor_id")
    n_exact = exact.count()
    hits = exact.join(approx, ["user_id", "neighbor_id"], "left_semi").count()
    assert n_exact > 0
    assert hits >= DIMSUM_RECALL_FLOOR * n_exact


def test_rescored_sims_bit_identical_to_exact(spark, sf_dir):
    """Every (pair, sim) the sketch path emits exists with the SAME
    rounded similarity in the exact pruned output — rescoring uses the
    full rating rows, full-ratings norms, and the same SIM_SCALE, so
    approximation lives only in candidate coverage, never in values."""
    ratings = _ratings(spark, sf_dir)
    sketch = cf.rescore_pairs(
        cf.candidate_pairs(
            cf.dimsum_sampled_ratings(ratings, fraction_of_median=DIMSUM_FRACTION)
        ),
        ratings,
        min_overlap=MIN_OVERLAP,
    )
    exact = cf.user_cosine_similarities_pruned(ratings, min_overlap=MIN_OVERLAP)
    stray = sketch.join(exact, ["user_a", "user_b", "sim"], "left_anti").count()
    assert stray == 0
    assert sketch.count() > 0


def test_sampler_is_layout_independent(spark, sf_dir):
    """The hash-coin sampler keeps the SAME entry set under a different
    input partitioning — the no-rand() determinism contract that makes
    the witness reproducible on any cluster layout."""
    ratings = _ratings(spark, sf_dir)
    s1 = cf.dimsum_sampled_ratings(ratings, fraction_of_median=DIMSUM_FRACTION)
    s2 = cf.dimsum_sampled_ratings(
        ratings.repartition(17, "item_id"), fraction_of_median=DIMSUM_FRACTION
    )
    assert s1.exceptAll(s2).count() == 0
    assert s2.exceptAll(s1).count() == 0


def test_sampler_downweights_heavy_users(spark, sf_dir):
    """DIMSUM's lever: users with norm above the median anchor are
    sampled strictly below 1.0 in expectation, while the aggregate
    keep-rate stays near the c anchor — heavy users shed entries
    (their pair fan-out is the Σ n² driver), light users keep all."""
    ratings = _ratings(spark, sf_dir)
    sampled = cf.dimsum_sampled_ratings(ratings, fraction_of_median=DIMSUM_FRACTION)
    norms = cf.user_norms(ratings)
    med = norms.agg(F.percentile("norm", F.lit(0.5)).alias("m")).collect()[0]["m"]
    heavy = norms.filter(F.col("norm") > 2 * med / DIMSUM_FRACTION).select("user_id")
    if heavy.count() == 0:
        return  # tiny SF may lack sufficiently heavy users
    before = ratings.join(heavy, "user_id", "left_semi").count()
    after = sampled.join(heavy, "user_id", "left_semi").count()
    assert after < before
