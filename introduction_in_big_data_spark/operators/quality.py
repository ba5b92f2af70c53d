"""Data-quality expectations — the declarative check layer a production
pipeline runs before publishing a table (the engine-level form of the
reference's PK/FK constraints, which Spark does not enforce; SURVEY.md
§1.3 turns them into checks, operators/relational.fk_violations covers
the FK side).

The decisive scale property: every row-local rule (null / range / regex
/ set membership) folds into ONE conditional aggregate over ONE scan —
adding a rule adds a counter, not a pass. Uniqueness is the exception
(it needs a distinct, hence a shuffle) and is exposed separately so a
caller can opt in knowingly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def violations(**rules: Column) -> list[Column]:
    """Each rule is a boolean Column that is TRUE when the row is OK;
    the result counts violations per rule, all in one aggregate:

        df.agg(*violations(
            acctbal_not_null=F.col("c_acctbal").isNotNull(),
            key_positive=F.col("c_custkey") >= 0,
        ))
    """
    return [
        F.sum(F.when(ok, 0).otherwise(1)).cast("long").alias(name)
        for name, ok in rules.items()
    ]


def expect_report(df: DataFrame, **rules: Column) -> DataFrame:
    """One-row report: total row count + per-rule violation counts,
    computed in a single scan (map-side partial aggregation; no rule
    adds a pass). NULL rule results count as violations — an
    expectation that cannot be evaluated is not satisfied."""
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        *violations(**rules),
    )


def duplicate_key_count(df: DataFrame, *key_cols: str) -> DataFrame:
    """Rows beyond the first per key (0 = key is unique). This one
    shuffles (distinct on the key) — deliberately separate from the
    scan-local report.

    NULL keys are reported separately (`n_null_key_rows`) rather than
    folded into the duplicate count: `count_distinct` drops any tuple
    containing a NULL, so a raw count(*) − count_distinct(keys) delta
    would conflate null-ness with duplication (two DISTINCT null-key
    rows would read as 2 duplicates). `n_duplicate_rows` is computed
    over fully-non-null key tuples only."""
    keys = [F.col(c) for c in key_cols]
    nonnull = keys[0].isNotNull()
    for k in keys[1:]:
        nonnull = nonnull & k.isNotNull()
    n_nonnull = F.sum(F.when(nonnull, 1).otherwise(0))
    return df.agg(
        F.coalesce(n_nonnull - F.count_distinct(*keys), F.lit(0))
        .cast("long")
        .alias("n_duplicate_rows"),
        F.coalesce(F.sum(F.when(nonnull, 0).otherwise(1)), F.lit(0))
        .cast("long")
        .alias("n_null_key_rows"),
    )
