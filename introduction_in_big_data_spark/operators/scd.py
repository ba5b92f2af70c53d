"""CDC / upsert / SCD2 operators — MERGE INTO emulated with
anti-join + union (the lakehouse-free pattern for when the result is
a DataFrame, not a table on disk; for a persisted table with real
snapshot/commit semantics, sources/acidtable.AcidTable.merge applies
the same WHEN MATCHED/NOT MATCHED semantics copy-on-write with
file-level pruning).

Scale notes: the anti-join shuffles on the merge key like any equi-join
(broadcast when the updates batch is small — the common CDC case); the
SCD2 variant is one extra window over the key. No driver-side state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(base: DataFrame, updates: DataFrame, key: str) -> DataFrame:
    """MERGE: rows from `updates` win; unmatched `base` rows survive.
    (WHEN MATCHED THEN UPDATE, WHEN NOT MATCHED THEN INSERT.)"""
    kept = base.join(updates.select(key), key, "left_anti")
    return kept.unionByName(updates)


def scd2_apply(
    base: DataFrame,
    updates: DataFrame,
    key: str,
    ts_col: str,
    attrs: list[str],
) -> DataFrame:
    """Slowly-changing-dimension type 2: close the current version of a
    changed key (valid_to = new ts, is_current = false) and append the
    new version (valid_to = null, is_current = true).

    `base` must carry (key, attrs..., valid_from, valid_to, is_current);
    `updates` carries (key, attrs..., ts_col)."""
    new_versions = updates.select(
        F.col(key),
        *[F.col(a) for a in attrs],
        F.col(ts_col).alias("valid_from"),
        F.lit(None).cast(updates.schema[ts_col].dataType).alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    changed_keys = updates.select(key, F.col(ts_col).alias("__new_from"))
    closed = (
        base.join(F.broadcast(changed_keys), key, "left")
        .withColumn(
            "valid_to",
            F.when(
                F.col("is_current") & F.col("__new_from").isNotNull(),
                F.col("__new_from"),
            ).otherwise(F.col("valid_to")),
        )
        .withColumn(
            "is_current",
            F.when(F.col("__new_from").isNotNull(), F.lit(False)).otherwise(
                F.col("is_current")
            ),
        )
        .drop("__new_from")
    )
    return closed.unionByName(new_versions)
