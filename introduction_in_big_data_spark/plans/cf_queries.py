"""Collaborative-filtering queries (SURVEY.md §7 Step 4 — the
reference's flagship pipeline, Part_A_Q2.py:79-198) instantiated on the
driver tables per FIXTURES.md: user=o_custkey, item=l_partkey,
rating=mean l_quantity.

The oracle SQL mirrors the engine pipeline CTE-for-operator, including
the fixed rounding scales, so both engines rank and weight bit-identical
values (see operators/cf.py for the determinism rules).
"""

from __future__ import annotations

from ..session import barrier

from ..operators import cf
from .registry import register, t

MIN_ITEMS = 10  # active-user threshold (reference: ≥10 ratings)
TOP_FRACTION = 0.05  # popular-item fraction (reference: top 5%)
K_NEIGHBORS = 2  # reference: calc_neighbourhood(s, 2)

# Shared CTE prefix: the cleaned long-format ratings frame.
_RATINGS_CTE = f"""
    WITH ratings_raw AS (
        SELECT o_custkey AS user_id, l_partkey AS item_id,
               round(avg(l_quantity), {cf.RATING_SCALE}) AS rating
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        GROUP BY user_id, item_id
    ),
    active AS (
        SELECT user_id FROM ratings_raw GROUP BY user_id HAVING count(*) >= {MIN_ITEMS}
    ),
    r1 AS (
        SELECT * FROM ratings_raw WHERE user_id IN (SELECT user_id FROM active)
    ),
    icounts AS (SELECT item_id, count(*) AS cnt FROM r1 GROUP BY item_id),
    kk AS (SELECT CAST(floor(count(*) * {TOP_FRACTION}) AS BIGINT) AS k FROM icounts),
    popular AS (
        SELECT item_id FROM (
            SELECT item_id, row_number() OVER (ORDER BY cnt DESC, item_id) AS rn
            FROM icounts
        ), kk
        WHERE rn <= k
    ),
    ratings AS (
        SELECT * FROM r1 WHERE item_id IN (SELECT item_id FROM popular)
    )
"""

_SIMS_CTE = f"""
    , dots AS (
        SELECT a.user_id AS user_a, b.user_id AS user_b,
               sum(a.rating * b.rating) AS dot
        FROM ratings a JOIN ratings b ON a.item_id = b.item_id
        WHERE a.user_id < b.user_id
        GROUP BY user_a, user_b
    ),
    norms AS (
        SELECT user_id, sqrt(sum(rating * rating)) AS norm
        FROM ratings GROUP BY user_id
    ),
    sims_half AS (
        SELECT user_a, user_b,
               round(dot / (na.norm * nb.norm), {cf.SIM_SCALE}) AS sim
        FROM dots
        JOIN norms na ON na.user_id = user_a
        JOIN norms nb ON nb.user_id = user_b
    ),
    sims AS (
        SELECT user_a, user_b, sim FROM sims_half
        UNION ALL
        SELECT user_b AS user_a, user_a AS user_b, sim FROM sims_half
    ),
    knn AS (
        SELECT user_a AS user_id, user_b AS neighbor_id, sim, rn
        FROM (
            SELECT user_a, user_b, sim,
                   row_number() OVER (PARTITION BY user_a
                                      ORDER BY sim DESC, user_b) AS rn
            FROM sims
        )
        WHERE rn <= {K_NEIGHBORS}
    )
"""


def _pipeline(spark, sf_dir, ckpt_filtered=True):
    ratings = cf.ratings_from_sales(
        t(spark, sf_dir, "orders"), t(spark, sf_dir, "lineitem")
    )
    # materialize the aggregated frame BEFORE filter_popular_items: its
    # k-sizing count() action would otherwise compute the whole
    # orders⋈lineitem subtree once for the count and the final query
    # would compute it all AGAIN while populating the cache — the join
    # ran twice per invocation (measured ~1.3s of cf_knn_pruned's 3.1s
    # at sf0.1). Lazy localCheckpoint: the sizing job stores the blocks,
    # every later branch reads them, ContextCleaner frees them on GC.
    ratings = cf.filter_active_users(ratings, MIN_ITEMS).transform(barrier)
    # downstream CF consumes the ratings frame from up to five plan
    # branches (similarity self-join sides, norms, neighbor ratings,
    # eval); materialize it once — it is orders of magnitude smaller
    # than its join inputs. localCheckpoint, not cache(): CacheManager
    # entries outlive the call in long driver sessions and match
    # identical plans across separate invocations (ADVICE r2), while
    # checkpoint blocks are private to this plan and GC-freed.
    # NOTE (r7): co-partitioning this frame by item_id for the
    # similarity self-join was measured and rejected — a LogicalRDD
    # from a localCheckpoint under AQE reports UnknownPartitioning
    # (lazy AND eager both probed: the item exchanges stay in the
    # plan), and dropping the checkpoint to rely on ReusedExchange
    # recomputes the subtree per consumer because RDD scans with
    # distinct exprIds never canonicalize equal (2.34s -> 2.96s at
    # sf0.1). See STATUS.md round-7 cf_knn_pruned root-cause note.
    filt = cf.filter_popular_items(ratings, TOP_FRACTION)
    # ckpt_filtered: materialize the popular-filtered frame too. Worth
    # it for the 5-consumer cf_predict_metrics plan; for cf_knn_pruned
    # (3 consumers) the round-10 shootout measured the opposite —
    # recomputing the broadcast semi-join from the ratings blocks is
    # cheaper and far more stable than writing the second block set
    # (min 2.40s vs 2.47s, spread 2.40-2.86 vs 2.47-6.21; the v0
    # outliers were the extra materialization riding host-noise
    # windows). VERDICT r9 item 3.
    if ckpt_filtered:
        filt = filt.transform(barrier)
    return filt


@register(
    "cf_ratings",
    oracle=_RATINGS_CTE + "SELECT user_id, item_id, rating FROM ratings",
    tags=("cf", "join", "agg"),
)
def cf_ratings(spark, sf_dir):
    """The cleaned long-format ratings frame — the engine's answer to
    the reference's dense pivot matrix (Part_A_Q2.py:92-98). Never
    widens; every downstream CF step is a join/agg over this."""
    return _pipeline(spark, sf_dir)


@register(
    "cf_knn",
    oracle=_RATINGS_CTE + _SIMS_CTE + "SELECT user_id, neighbor_id, sim, rn FROM knn",
    tags=("cf", "join", "window"),
)
def cf_knn(spark, sf_dir):
    """All-pairs cosine similarity (sparse item self-join, J5) + k-NN
    window (K5). The quadratic danger zone of the whole engine — see
    operators/cf.py's scale analysis for why the co-rating join form
    scales where np.corrcoef cannot.

    Oracle BASELINE only (VERDICT r1 item 3): the bench-headline /
    default CF path is `cf_knn_pruned`, whose surviving similarities
    are bit-identical; this exact form stays registered so the driver
    keeps hash-checking the full all-pairs semantics."""
    ratings = _pipeline(spark, sf_dir)
    sims = cf.user_cosine_similarities(ratings)
    return cf.knn_neighbors(sims, K_NEIGHBORS)


@register(
    "cf_predict_metrics",
    oracle=_RATINGS_CTE
    + _SIMS_CTE
    + f"""
    , nr AS (
        SELECT user_id AS neighbor_id, item_id, rating AS neighbor_rating
        FROM ratings
    ),
    preds AS (
        SELECT k.user_id, nr.item_id,
               round(sum(k.sim * nr.neighbor_rating) / sum(k.sim),
                     {cf.PRED_SCALE}) AS pred
        FROM knn k JOIN nr ON k.neighbor_id = nr.neighbor_id
        GROUP BY k.user_id, nr.item_id
    )
    SELECT round(avg(abs(pred - rating)), 4)             AS mae,
           round(sqrt(avg((pred - rating) * (pred - rating))), 4) AS rmse,
           count(*)                                      AS n_eval
    FROM preds JOIN ratings USING (user_id, item_id)
    """,
    tags=("cf", "join", "agg", "metrics"),
)
def cf_predict_metrics(spark, sf_dir):
    """Join-based weighted prediction + MAE/RMSE evaluation
    (Part_A_Q2.py:130-147,194-198). Replaces the reference's dense
    nested per-cell loop with one join and one grouped aggregate."""
    ratings = _pipeline(spark, sf_dir)
    sims = cf.user_cosine_similarities(ratings)
    neighbors = cf.knn_neighbors(sims, K_NEIGHBORS)
    preds = cf.predict_ratings(neighbors, ratings)
    return cf.evaluate(preds, ratings)


MIN_OVERLAP = 2  # pruned-path co-rating floor

# Pruned similarity CTEs: identical to _SIMS_CTE except the dots
# aggregate drops pairs sharing fewer than MIN_OVERLAP items — the
# SQL-expressible half of the scale pruning (the max_item_raters cap
# composes on top and is also exact-after-pruning).
_SIMS_PRUNED_CTE = f"""
    , dots AS (
        SELECT a.user_id AS user_a, b.user_id AS user_b,
               sum(a.rating * b.rating) AS dot
        FROM ratings a JOIN ratings b ON a.item_id = b.item_id
        WHERE a.user_id < b.user_id
        GROUP BY user_a, user_b
        HAVING count(*) >= {MIN_OVERLAP}
    ),
    norms AS (
        SELECT user_id, sqrt(sum(rating * rating)) AS norm
        FROM ratings GROUP BY user_id
    ),
    sims_half AS (
        SELECT user_a, user_b,
               round(dot / (na.norm * nb.norm), {cf.SIM_SCALE}) AS sim
        FROM dots
        JOIN norms na ON na.user_id = user_a
        JOIN norms nb ON nb.user_id = user_b
    ),
    sims AS (
        SELECT user_a, user_b, sim FROM sims_half
        UNION ALL
        SELECT user_b AS user_a, user_a AS user_b, sim FROM sims_half
    ),
    knn AS (
        SELECT user_a AS user_id, user_b AS neighbor_id, sim, rn
        FROM (
            SELECT user_a, user_b, sim,
                   row_number() OVER (PARTITION BY user_a
                                      ORDER BY sim DESC, user_b) AS rn
            FROM sims
        )
        WHERE rn <= {K_NEIGHBORS}
    )
"""


@register(
    "cf_knn_pruned",
    oracle=_RATINGS_CTE
    + _SIMS_PRUNED_CTE
    + "SELECT user_id, neighbor_id, sim, rn FROM knn",
    tags=("cf", "join", "window", "scale"),
    bench=True,
)
def cf_knn_pruned(spark, sf_dir):
    """The scale path for cf_knn: min-overlap pruning cuts the pair
    stream before the quadratic groupBy materializes it (SURVEY.md §4
    risk #1). Surviving similarities are bit-identical to the exact
    path — the oracle proves it — and the k-NN recall property test
    (tests/test_bucketing_cfprune.py) bounds what pruning discards."""
    ratings = _pipeline(spark, sf_dir, ckpt_filtered=False)
    sims = cf.user_cosine_similarities_pruned(ratings, min_overlap=MIN_OVERLAP)
    return cf.knn_neighbors(sims, K_NEIGHBORS)


DIMSUM_FRACTION = 0.9  # c: sampling anchor as a fraction of the median norm
# Measured recall vs the exact pruned k-NN (probe 2026-08-15, c=0.9):
# sf0.001 0.857, sf0.01 0.819, sf0.1 0.726 — floor ~ half the weakest.
DIMSUM_RECALL_FLOOR = 0.35


@register(
    "cf_knn_dimsum",
    oracle=_RATINGS_CTE
    + _SIMS_PRUNED_CTE
    + """
    SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           TRUE AS recall_ok
    FROM knn
    """,
    tags=("cf", "join", "sketch", "scale"),
)
def cf_knn_dimsum(spark, sf_dir):
    """The CF sketch twin for the hot-catalog regime (VERDICT r5 item
    7 / r6 item 8): when even the min-overlap-pruned pair stream is too
    large (hot catalogs make Σ n_i² explode), DIMSUM-flavored
    norm-proportional entry sampling (operators/cf.py
    dimsum_sampled_ratings, arXiv:1206.2082) shrinks the pair stream by
    ~c² BEFORE it exists, candidates are rescored EXACTLY (bit-identical
    sims to the exact path on surviving pairs — same norms, rounding,
    min_overlap), and the k-NN graph is built from those. The exact
    pruned form (`cf_knn_pruned`) stays the oracle baseline.

    Driver-checked as a recall contract witness (the r5/r6 witness
    pattern): the exact pruned k-NN is recomputed in-plan (equi-joins
    only) and the emitted (n_users, recall_ok) row asserts the sketch
    k-NN recovered >= DIMSUM_RECALL_FLOOR of the exact neighbor edges;
    DuckDB agrees on the user count and asserts TRUE. Per-scale recall
    and bit-identity of shared sims are property-tested in
    tests/test_cf_dimsum.py."""
    from pyspark.sql import functions as F

    ratings = _pipeline(spark, sf_dir)
    sampled = cf.dimsum_sampled_ratings(ratings, fraction_of_median=DIMSUM_FRACTION)
    sims = cf.rescore_pairs(
        cf.candidate_pairs(sampled), ratings, min_overlap=MIN_OVERLAP
    )
    approx = cf.knn_neighbors(sims, K_NEIGHBORS).select("user_id", "neighbor_id")
    exact = cf.knn_neighbors(
        cf.user_cosine_similarities_pruned(ratings, min_overlap=MIN_OVERLAP),
        K_NEIGHBORS,
    ).select("user_id", "neighbor_id")
    hits = exact.join(approx, ["user_id", "neighbor_id"], "left_semi").agg(
        F.count(F.lit(1)).alias("_hits")
    )
    totals = exact.agg(
        F.count(F.lit(1)).alias("_exact"),
        F.countDistinct("user_id").alias("n_users"),
    )
    return totals.crossJoin(hits).select(
        "n_users",
        (
            F.col("_hits").cast("double")
            >= F.lit(DIMSUM_RECALL_FLOOR) * F.col("_exact").cast("double")
        ).alias("recall_ok"),
    )


_SPLIT_CTE = """
    , keyed AS (
        SELECT user_id, item_id, rating,
               substr(md5(CAST(user_id AS VARCHAR) || ':' ||
                          CAST(item_id AS VARCHAR)), 1, 2) AS h
        FROM ratings
    ),
    test AS (
        SELECT user_id, item_id, rating FROM keyed WHERE h < '1a'
    ),
    train AS (
        SELECT user_id, item_id, rating FROM keyed WHERE h >= '1a'
    )
"""


@register(
    "cf_holdout_metrics",
    oracle=_RATINGS_CTE
    + _SPLIT_CTE
    + _SIMS_PRUNED_CTE.replace("ratings", "train")
    + f"""
    , nr AS (
        SELECT user_id AS neighbor_id, item_id, rating AS neighbor_rating
        FROM train
    ),
    preds AS (
        SELECT k.user_id, nr.item_id,
               round(sum(k.sim * nr.neighbor_rating) / sum(k.sim),
                     {cf.PRED_SCALE}) AS pred
        FROM knn k JOIN nr ON k.neighbor_id = nr.neighbor_id
        GROUP BY k.user_id, nr.item_id
    )
    SELECT round(avg(abs(pred - rating)), 4)             AS mae,
           round(sqrt(avg((pred - rating) * (pred - rating))), 4) AS rmse,
           count(*)                                      AS n_eval
    FROM preds JOIN test USING (user_id, item_id)
    """,
    tags=("cf", "metrics", "holdout", "eval"),
)
def cf_holdout_metrics(spark, sf_dir):
    """CF evaluated the HONEST way — on ratings the model never saw:
    a ~10% hash holdout (md5 of (user, item): stable across engines,
    runs, and cluster sizes — never a rand() split), similarities and
    neighborhoods trained on the remaining 90%, predictions scored
    ONLY on held-out cells. `cf_predict_metrics` (reference
    semantics, train==eval) measures reconstruction; this measures
    generalization — the number a recommender team actually tracks.
    Same pruned pair-stream plan as cf_knn_pruned, so the scale story
    carries over unchanged."""
    from pyspark.sql import functions as F

    ratings = _pipeline(spark, sf_dir)
    h = F.substring(
        F.md5(
            F.concat_ws(
                ":",
                F.col("user_id").cast("string"),
                F.col("item_id").cast("string"),
            )
        ),
        1,
        2,
    )
    keyed = ratings.withColumn("__h", h)
    test = keyed.filter(F.col("__h") < "1a").drop("__h")
    train = keyed.filter(F.col("__h") >= "1a").drop("__h").transform(barrier)
    sims = cf.user_cosine_similarities_pruned(train, min_overlap=MIN_OVERLAP)
    neighbors = cf.knn_neighbors(sims, K_NEIGHBORS)
    preds = cf.predict_ratings(neighbors, train)
    return cf.evaluate(preds, test)
