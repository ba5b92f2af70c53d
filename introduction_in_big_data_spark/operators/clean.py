"""Cleaning / predicate operators (SURVEY.md §2.2, P1-P13).

The reference's cleaning is eager pandas mutation (Part_A_Q1.py:19-47);
here every operator is a lazy Column/DataFrame transform so Catalyst can
push predicates into the scan and reorder commutable filters. All of
these compile to WholeStageCodegen — no Python in the hot path.

Intended-semantics notes (⚠ sites from SURVEY.md):
- regex_filter implements the intended ISBN class `[\\dX]`, not the
  reference's `[\\d|X]` which also admits a literal `|` (Part_A_Q1.py:21).
- sigma_band implements the intended mean±3σ band; the reference version
  is dead code with a NameError (Part_A_Q1.py:89-99).
- dedup_by_key keeps a deterministic representative; the reference's
  `drop_duplicates` result is discarded by mistake (Part_A_Q1.py:47).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def regex_filter(df: DataFrame, column: str, pattern: str) -> DataFrame:
    """P4/P5 — keep rows where `column` matches `pattern` (rlike).

    Reference: ISBN `^\\d{9}[\\dX]$` and all-digits year filters
    (Part_A_Q1.py:21-22).
    """
    return df.filter(F.col(column).rlike(pattern))


def cast_column(df: DataFrame, column: str, dtype: str, out: str | None = None) -> DataFrame:
    """P6 — dirty-string → typed cast (Part_A_Q1.py:25)."""
    return df.withColumn(out or column, F.col(column).cast(dtype))


def range_filter(
    df: DataFrame,
    column: str,
    lo,
    hi,
    inclusive: bool = True,
) -> DataFrame:
    """P7 (inclusive, year 1967-2020) / P8 (exclusive, 15 < Age < 80)."""
    c = F.col(column)
    cond = c.between(lo, hi) if inclusive else (c > lo) & (c < hi)
    return df.filter(cond)


def semi_filter(df: DataFrame, keys: DataFrame, on: str | list[str]) -> DataFrame:
    """P9 — membership predicate as a semi-join.

    Replaces the reference's collect-to-list + `isin` idiom
    (Part_A_Q2.py:83-89), which materializes the key list on the driver
    and cannot scale; `left_semi` shuffles (or broadcasts) the key set
    instead and never leaves the executors.
    """
    return df.join(keys, on=on, how="left_semi")


def anti_filter(df: DataFrame, keys: DataFrame, on: str | list[str]) -> DataFrame:
    """NOT-IN as an anti-join (idiomatic form of the FK checks, J6)."""
    return df.join(keys, on=on, how="left_anti")


# Subnormal-safe stddev: Spark's single-pass moment aggregate squares
# centered deltas, so inputs below ~1e-154 underflow (delta^2 < 2^-1074
# -> 0.0) and stddev_samp reports 0 where exact math does not. Scaling by
# an exact power of two before the moment pass and dividing it back is
# bit-identical in the normal regime (power-of-two multiply is rounding
# free) and keeps delta^2 representable for subnormal inputs. Both the
# plain and the scaled stddev come out of ONE scalar aggregate; a CASE on
# max(abs(v)) picks the scaled one only in the underflow-prone range, so
# there is no second scan and no driver-side branch.
# Regime boundaries: with maxabs >= 1e-120 the smallest nonzero delta
# between doubles is ~maxabs*2^-52 >= 2e-136, whose square 5e-272 is a
# normal double — the plain path is exact there. Below 1e-120, scaling by
# 2^800 maps [5e-324, 1e-120] to [3.3e-83, 6.7e+120]: every delta^2 stays
# normal and the m2 accumulator has headroom for ~4e66 rows.
_SUBNORMAL_SCALE = 2.0**800
_SUBNORMAL_CUTOFF = 1e-120


def _scalar_stats(df: DataFrame, column: str) -> DataFrame:
    """One-row (mean, subnormal-safe sample stddev) scalar aggregate."""
    c = F.col(column)
    return df.agg(
        F.avg(c).alias("__mean"),
        F.stddev_samp(c).alias("__std_plain"),
        (F.stddev_samp(c * F.lit(_SUBNORMAL_SCALE)) / _SUBNORMAL_SCALE).alias(
            "__std_scaled"
        ),
        F.max(F.abs(c)).alias("__maxabs"),
    ).select(
        "__mean",
        F.when(F.col("__maxabs") < _SUBNORMAL_CUTOFF, F.col("__std_scaled"))
        .otherwise(F.col("__std_plain"))
        .alias("__std"),
    )


def with_zscore(df: DataFrame, column: str, out: str = "z") -> DataFrame:
    """P10 — append a z-score column via a two-pass plan.

    Pass 1 is a scalar aggregate (map-side partial + single final
    reduce); pass 2 broadcasts the 1-row stats frame into a filter-able
    column expression. Matches Part_A_Q1.py:55-57, using sample stddev
    as pandas does.

    Scale: the stats frame is one row — the cross join is a broadcast
    nested loop over a single row, i.e. free; the big side streams.
    """
    stats = _scalar_stats(df, column)
    return (
        df.crossJoin(F.broadcast(stats))
        .withColumn(out, (F.col(column) - F.col("__mean")) / F.col("__std"))
        .drop("__mean", "__std")
    )


def zscore_filter(df: DataFrame, column: str, threshold: float = 3.0) -> DataFrame:
    """P10 — keep rows with |z| < threshold (Part_A_Q1.py:58-59)."""
    return with_zscore(df, column, "__z").filter(F.abs(F.col("__z")) < threshold).drop("__z")


def sigma_band_filter(df: DataFrame, column: str, n_sigma: float = 3.0) -> DataFrame:
    """P11/P12 — drop rows outside mean ± n_sigma*std (intended semantics
    of the reference's broken `remove_rating_outliers`, Part_A_Q1.py:89-99).

    Uses the subnormal-safe `_scalar_stats` so the band does not collapse
    to [mean, mean] when every value is below the double underflow knee
    (e.g. [0.0, 2.225e-313]) — exact math keeps those rows and so do we.
    """
    stats = _scalar_stats(df, column)
    c = F.col(column)
    lo = F.col("__mean") - n_sigma * F.col("__std")
    hi = F.col("__mean") + n_sigma * F.col("__std")
    return (
        df.crossJoin(F.broadcast(stats))
        .filter(~((c > hi) | (c < lo)))
        .drop("__mean", "__std")
    )


def zscore_filter_per_group(
    df: DataFrame, group_keys: list[str], column: str, threshold: float = 3.0
) -> DataFrame:
    """Per-group z-score outlier removal via applyInPandas — the
    grouped-map UDF surface (SURVEY.md §2.10: the reference's
    dataset-in → dataset-out cleaners, e.g. remove_book_outliers,
    generalized per group).

    This exists to exercise the Arrow grouped-map path; for a GLOBAL
    z-score the pure-JVM `zscore_filter` is strictly better (no Python
    in the data path). Per group the window/agg composition also works —
    applyInPandas is the template for cleaners whose logic genuinely
    needs imperative pandas (iterative winsorization, per-group model
    fits). Each group must fit in one worker's memory — the documented
    grouped-map contract."""
    import pandas as pd  # noqa: F401 (worker-side)

    schema = df.schema

    def kernel(pdf):
        s = pdf[column]
        std = s.std()  # pandas sample std — matches stddev_samp
        if not std or std != std:
            return pdf
        z = (s - s.mean()) / std
        return pdf[z.abs() < threshold]

    return df.groupBy(*group_keys).applyInPandas(kernel, schema)


def dedup_by_key(df: DataFrame, keys: list[str], order_by: list[str]) -> DataFrame:
    """P13 — deduplicate by key, keeping a deterministic representative.

    `dropDuplicates` picks an arbitrary row per key (first seen per
    partition — nondeterministic under shuffle), which can't be
    oracle-checked; a row_number window with an explicit tiebreak order
    is the deterministic, still single-shuffle form.
    """
    w = Window.partitionBy(*keys).orderBy(*[F.col(c) for c in order_by])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
