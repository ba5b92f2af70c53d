"""Part_A_Q2.py reproduced end-to-end (intended semantics).

Reference pipeline (Part_A_Q2.py:173-205): ingest + cleaning →
ratings-matrix construction (≥10-rating users, top-5% books,
group-mean dedup) → all-pairs user similarity → k-NN (k=2) → predict →
MAE/RMSE; CSV export of similarity and neighborhood matrices; MySQL
load.

This engine keeps everything long-format and join-based
(operators/cf.py) — the dense user×item/user×user matrices of the
reference (Part_A_Q2.py:92-116) never materialize. Sinks: the
similarity/neighborhood frames go to CSV via sources.writers.write_csv;
the MySQL load is sources.writers.write_jdbc (no DB in the test
container).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..session import barrier

from ..operators import cf
from .part_a_q1 import clean_books, clean_users


def run_collaborative_filtering(
    books: DataFrame,
    users: DataFrame,
    ratings: DataFrame,
    k: int = 2,
    min_ratings: int = 10,
    top_fraction: float = 0.05,
) -> dict[str, DataFrame]:
    """The full intended Part_A_Q2 run on Book-Crossing-shaped inputs.
    Returns every intermediate the reference materializes, all lazy
    DataFrames in long format."""
    b = clean_books(books)
    u = clean_users(users)

    # ratings restricted to clean books/users (Part_A_Q2.py:180-182),
    # then long-format (user, item, mean rating) — A5's group-mean dedup
    r = (
        ratings.join(b.select("ISBN"), "ISBN", "left_semi")
        .join(u.select("User-ID"), "User-ID", "left_semi")
        .groupBy(
            F.col("User-ID").alias("user_id"), F.col("ISBN").alias("item_id")
        )
        .agg(F.round(F.avg("Book-Rating"), cf.RATING_SCALE).alias("rating"))
    )
    r = cf.filter_active_users(r, min_ratings)
    r = cf.filter_popular_items(r, top_fraction).transform(barrier)

    sims = cf.user_cosine_similarities(r)
    neighbors = cf.knn_neighbors(sims, k)
    preds = cf.predict_ratings(neighbors, r)
    metrics = cf.evaluate(preds, r)
    return {
        "ratings_long": r,
        "similarities": sims,
        "neighborhoods": neighbors,
        "predictions": preds,
        "metrics": metrics,
    }
