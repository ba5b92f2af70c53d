"""Relational core: joins, aggregations, set ops, integrity checks.

Covers SURVEY.md §2.3 (J1-J6), §2.4 (A1-A12, A17), §2.7. Everything is
a thin, documented composition of built-in DataFrame ops — the point is
that Catalyst supplies hash-agg with map-side partial aggregation, join
strategy selection (broadcast vs sort-merge via AQE), and predicate
pushdown without any hand-scheduling.

Scale notes:
- join(): pass `broadcast=True` for dimension tables (region, nation,
  part at TPC-H shapes) so the fact side never shuffles.
- grouped counts/means are hash aggregates with automatic partial+final
  split; skewed group keys are handled by AQE skew mitigation.
- fk_violations is the engine's replacement for the reference's MySQL
  FK constraints (Part_A_Q2.py:37-38): an anti-join that must be empty.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def join(
    left: DataFrame,
    right: DataFrame,
    on,
    how: str = "inner",
    broadcast: bool = False,
) -> DataFrame:
    """J1/J2 + the free left/semi/anti variants (Part_A_Q1.py:49,80)."""
    if broadcast:
        right = F.broadcast(right)
    return left.join(right, on=on, how=how)


def group_count(df: DataFrame, keys: list[str], out: str = "cnt") -> DataFrame:
    """A1-A4/A6 — group-by count (Part_A_Q1.py:50,67,74,82)."""
    return df.groupBy(*keys).agg(F.count(F.lit(1)).alias(out))


def group_mean(df: DataFrame, keys: list[str], value: str, out: str = "mean") -> DataFrame:
    """A5 — group-by mean; dedups multiple ratings per (user, item)
    (Part_A_Q2.py:93)."""
    return df.groupBy(*keys).agg(F.avg(value).alias(out))


def scalar_stats(df: DataFrame, column: str) -> DataFrame:
    """A7/A10 — count / mean / sample-stddev / min / max in one pass."""
    return df.agg(
        F.count(column).alias("cnt"),
        F.avg(column).alias("mean"),
        F.stddev_samp(column).alias("std"),
        F.min(column).alias("min"),
        F.max(column).alias("max"),
    )


def distinct_count(df: DataFrame, column: str) -> DataFrame:
    """A9 — exact distinct count (Part_A_Q2.py:87).

    Expands to a two-stage hash aggregate (partial distinct per
    partition, then final) — the exact-at-scale form. For the
    approximate path see operators.sketch.approx_distinct.
    """
    return df.agg(F.countDistinct(column).alias("distinct_cnt"))


def histogram(df: DataFrame, column: str, bucket_width: float) -> DataFrame:
    """A11 — fixed-width bucketed counts (Part_A_Q1.py:34,44,51,63).

    One hash aggregate over floor(x/w); rendering is out of engine scope.
    """
    bucket = F.floor(F.col(column) / F.lit(bucket_width)).cast("long").alias("bucket")
    return df.groupBy(bucket).agg(F.count(F.lit(1)).alias("cnt"))


def pivot_matrix(
    df: DataFrame,
    row_key: str,
    col_key: str,
    value: str,
    col_values: list[str] | None = None,
    fill: float = 0.0,
) -> DataFrame:
    """A12 — long → wide pivot with zero fill (Part_A_Q2.py:92-98).

    Guardrail: only for bounded column-key domains (pass col_values to
    skip the extra distinct pass). At scale the engine keeps the long
    format — the CF pipeline (operators.cf) never materializes the wide
    matrix, unlike the reference.
    """
    p = df.groupBy(row_key).pivot(col_key, col_values) if col_values else df.groupBy(row_key).pivot(col_key)
    return p.agg(F.first(value)).na.fill(fill)


def fk_violations(child: DataFrame, parent: DataFrame, on) -> DataFrame:
    """J6 — FK integrity as data-quality check: child rows with no parent."""
    return child.join(parent, on=on, how="left_anti")


def regression_errors(df: DataFrame, pred: str, actual: str) -> DataFrame:
    """A17 — MAE / RMSE between prediction and actual columns
    (Part_A_Q2.py:140-147). Single-pass scalar aggregate.
    """
    err = F.col(pred) - F.col(actual)
    return df.agg(
        F.avg(F.abs(err)).alias("mae"),
        F.sqrt(F.avg(err * err)).alias("rmse"),
    )
