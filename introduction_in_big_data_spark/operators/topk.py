"""Top-k / ranking operators (SURVEY.md §2.5 K1-K6, §2.6 O1-O4).

The reference ranks by global sort + head (Part_A_Q1.py:72,78,86).
Spark's `orderBy(...).limit(k)` compiles to TakeOrderedAndProject:
each partition keeps a size-k heap, then the driver merges k*partitions
rows — no global sort materialization, which is the difference between
O(n log n) shuffle and O(n) scan at 100 TB.

Per-group top-k (K5) is a single-shuffle window row_number — the
generalization of the reference's fragile per-row argsort slice
(Part_A_Q2.py:121-123).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def top_k(df: DataFrame, order_by: list, k: int) -> DataFrame:
    """K1-K4 — global top-k. `order_by` are Column expressions; always
    include a unique tiebreaker column for deterministic output."""
    return df.orderBy(*order_by).limit(k)


def top_k_per_group(
    df: DataFrame,
    group_by: list[str],
    order_by: list,
    k: int,
    rank_col: str = "rn",
    keep_rank: bool = False,
) -> DataFrame:
    """K5/K6 — k best rows per group via row_number window.

    One shuffle on the group key; rows stream through the window
    operator sorted per partition. Include a unique tiebreaker in
    `order_by` so ranks are deterministic (oracle-checkable).
    """
    w = Window.partitionBy(*group_by).orderBy(*order_by)
    out = df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= k)
    return out if keep_rank else out.drop(rank_col)
