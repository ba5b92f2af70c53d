"""Incremental view maintenance (operators/ivm.py): signed-delta
maintenance of additive aggregates equals a full recompute through
append / update / delete chains, and groups vanish at count 0."""

from __future__ import annotations

from pyspark.sql import functions as F

from introduction_in_big_data_spark.operators import ivm
from introduction_in_big_data_spark.sources.acidtable import AcidTable

GROUPS = ["g"]
SUMS = ["v"]


def _rows(df):
    return sorted(
        (r.g, r.n_rows, r.sum_v) for r in df.collect()
    )


def _recompute(df):
    return _rows(ivm.initial_view(df, GROUPS, SUMS))


def test_ivm_matches_full_recompute_through_dml(spark, tmp_path):
    base = spark.range(0, 500).select(
        F.col("id").alias("k"),
        (F.col("id") % 7).cast("int").alias("g"),
        (F.col("id") * 10).alias("v"),
    )
    table = AcidTable.create(spark, str(tmp_path / "t"), base)
    v0 = table.latest_version()
    view = ivm.initial_view(table.read(v0), GROUPS, SUMS).localCheckpoint()

    # merge: re-value every 9th key, insert 20 new keys into group 3
    source = base.filter("k % 9 = 0").select(
        "k", "g", (F.col("v") * 3).alias("v")
    ).unionByName(
        spark.range(1000, 1020).select(
            F.col("id").alias("k"),
            F.lit(3).cast("int").alias("g"),
            F.lit(5).alias("v"),
        )
    )
    table.merge(source, "k")
    table.delete("k % 11 = 0")
    v1 = table.latest_version()

    changes = table.changes("k", v0, v1, preimages=True)
    delta = ivm.aggregate_delta(changes, GROUPS, SUMS)
    maintained = ivm.apply_delta(view, delta, GROUPS, SUMS)
    assert _rows(maintained) == _recompute(table.read(v1))


def test_ivm_group_vanishes_at_zero_and_new_group_enters(spark, tmp_path):
    base = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "b", 30)], "k long, g string, v long"
    )
    table = AcidTable.create(spark, str(tmp_path / "t"), base)
    v0 = table.latest_version()
    view = ivm.initial_view(table.read(v0), GROUPS, SUMS).localCheckpoint()
    table.delete("g = 'b'")  # group b must vanish
    table.merge(
        spark.createDataFrame([(9, "c", 99)], "k long, g string, v long"),
        "k",
    )  # group c must enter
    v1 = table.latest_version()
    maintained = ivm.apply_delta(
        view,
        ivm.aggregate_delta(
            table.changes("k", v0, v1, preimages=True), GROUPS, SUMS
        ),
        GROUPS,
        SUMS,
    )
    assert _rows(maintained) == [("a", 2, 30), ("c", 1, 99)]
    assert _rows(maintained) == _recompute(table.read(v1))


def test_ivm_chained_batches_compose(spark, tmp_path):
    """Maintaining batch-by-batch equals maintaining over the whole
    range — the associativity that lets a standing view follow a
    stream of commits."""
    base = spark.range(0, 200).select(
        F.col("id").alias("k"),
        (F.col("id") % 5).cast("int").alias("g"),
        F.col("id").alias("v"),
    )
    table = AcidTable.create(spark, str(tmp_path / "t"), base)
    v0 = table.latest_version()
    view = ivm.initial_view(table.read(v0), GROUPS, SUMS).localCheckpoint()
    table.delete("k < 50")
    v1 = table.latest_version()
    view = ivm.apply_delta(
        view,
        ivm.aggregate_delta(
            table.changes("k", v0, v1, preimages=True), GROUPS, SUMS
        ),
        GROUPS,
        SUMS,
    ).localCheckpoint()
    table.merge(
        spark.range(40, 60).select(
            F.col("id").alias("k"),
            F.lit(1).cast("int").alias("g"),
            F.lit(7).alias("v"),
        ),
        "k",
    )
    v2 = table.latest_version()
    view = ivm.apply_delta(
        view,
        ivm.aggregate_delta(
            table.changes("k", v1, v2, preimages=True), GROUPS, SUMS
        ),
        GROUPS,
        SUMS,
    )
    assert _rows(view) == _recompute(table.read(v2))


def test_changes_preimage_rows_only_on_update(spark, tmp_path):
    base = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20)], "k long, g string, v long"
    )
    table = AcidTable.create(spark, str(tmp_path / "t"), base)
    v0 = table.latest_version()
    table.merge(
        spark.createDataFrame(
            [(1, "a", 11), (3, "c", 30)], "k long, g string, v long"
        ),
        "k",
    )
    table.delete("k = 2")
    v1 = table.latest_version()
    tags = {
        (r.k, r._change_type)
        for r in table.changes("k", v0, v1, preimages=True).collect()
    }
    assert tags == {
        (1, "update_preimage"),
        (1, "update_postimage"),
        (2, "delete"),
        (3, "insert"),
    }
    # preimage row carries the OLD values
    pre = table.changes("k", v0, v1, preimages=True).filter(
        "_change_type = 'update_preimage'"
    ).collect()[0]
    assert pre.v == 10
    # default (preimages=False) is unchanged: no preimage rows
    assert (
        table.changes("k", v0, v1)
        .filter("_change_type = 'update_preimage'")
        .count()
        == 0
    )


def test_insert_only_feed_maintains_appends(spark, tmp_path):
    """An append-only change feed (e.g. DeltaLogReader.incremental)
    maintains the view with the 'insert' tag alone."""
    base = spark.range(0, 100).select(
        F.col("id").alias("k"),
        (F.col("id") % 3).cast("int").alias("g"),
        F.col("id").alias("v"),
    )
    view = ivm.initial_view(base, GROUPS, SUMS)
    appended = spark.range(100, 130).select(
        F.col("id").alias("k"),
        (F.col("id") % 3).cast("int").alias("g"),
        F.col("id").alias("v"),
    )
    maintained = ivm.apply_delta(
        view,
        ivm.aggregate_delta(
            appended.withColumn("_change_type", F.lit("insert")),
            GROUPS,
            SUMS,
        ),
        GROUPS,
        SUMS,
    )
    assert _rows(maintained) == _recompute(base.unionByName(appended))
