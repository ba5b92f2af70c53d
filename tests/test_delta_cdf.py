"""Change Data Feed on externally-written Delta tables
(DeltaLogReader.changes + cdc actions from the DML write paths):
row-level change history per the protocol's reader contract, feeding
incremental view maintenance (operators/ivm.py) so a standing
aggregate follows an external table at change-batch cost."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from introduction_in_big_data_spark.operators import ivm
from introduction_in_big_data_spark.sources.deltalog import (
    DeltaLogReader,
    UnsupportedDeltaFeature,
    commit_append,
    create_minimal_table,
)


def _df(spark, lo=0, hi=300):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"),
        (F.col("id") % 3).cast("int").alias("p"),
        (F.col("id") * 10).alias("v"),
    )


def _tags(df):
    return {
        (r.k, r._change_type, r._commit_version) for r in df.collect()
    }


def test_delete_where_emits_delete_rows(spark, tmp_path):
    path = str(tmp_path / "t")
    create_minimal_table(
        spark, path, _df(spark).repartitionByRange(4, "k"),
        stats=True, cdf=True,
    )
    r = DeltaLogReader(spark, path)
    v = r.delete_where([("k", ">=", 290)])
    ch = r.changes(0, v)
    assert {x.k for x in ch.collect()} == set(range(290, 300))
    assert {x._change_type for x in ch.collect()} == {"delete"}
    # deleted rows carry their full old values
    assert {x.v for x in ch.filter("k = 295").collect()} == {2950}


def test_metadata_only_partition_delete_still_feeds_cdf(spark, tmp_path):
    path = str(tmp_path / "t")
    create_minimal_table(
        spark, path, _df(spark), partition_by=["p"], stats=True, cdf=True
    )
    r = DeltaLogReader(spark, path)
    v = r.delete_where([("p", "=", 1)])
    ch = r.changes(v - 1, v)
    assert ch.count() == 100
    assert {x.p for x in ch.select("p").distinct().collect()} == {1}
    assert {x._change_type for x in ch.collect()} == {"delete"}


def test_update_where_emits_pre_and_post_images(spark, tmp_path):
    path = str(tmp_path / "t")
    create_minimal_table(
        spark, path, _df(spark).repartitionByRange(4, "k"),
        stats=True, cdf=True,
    )
    r = DeltaLogReader(spark, path)
    v = r.update_where([("k", "<", 3)], {"v": "v + 1"})
    ch = r.changes(v - 1, v)
    got = {(x.k, x._change_type): x.v for x in ch.collect()}
    assert got == {
        (0, "update_preimage"): 0,
        (0, "update_postimage"): 1,
        (1, "update_preimage"): 10,
        (1, "update_postimage"): 11,
        (2, "update_preimage"): 20,
        (2, "update_postimage"): 21,
    }


def test_merge_emits_updates_and_inserts(spark, tmp_path):
    path = str(tmp_path / "t")
    create_minimal_table(
        spark, path, _df(spark).repartitionByRange(4, "k"),
        stats=True, cdf=True,
    )
    r = DeltaLogReader(spark, path)
    source = spark.createDataFrame(
        [(5, 2, -5), (1000, 1, -1)], "k long, p int, v long"
    )
    v = r.merge(source, "k")
    ch = r.changes(v - 1, v)
    assert _tags(ch) == {
        (5, "update_preimage", v),
        (5, "update_postimage", v),
        (1000, "insert", v),
    }
    pre = ch.filter("_change_type = 'update_preimage'").collect()[0]
    assert pre.v == 50 and pre.p == 2  # old values
    post = ch.filter("_change_type = 'update_postimage'").collect()[0]
    assert post.v == -5


def test_append_without_cdc_reads_as_inserts(spark, tmp_path):
    path = str(tmp_path / "t")
    create_minimal_table(spark, path, _df(spark, 0, 100), cdf=True)
    r = DeltaLogReader(spark, path)
    v = commit_append(spark, path, _df(spark, 100, 130))
    ch = r.changes(0, v)
    assert ch.count() == 30
    assert {x._change_type for x in ch.collect()} == {"insert"}


def test_rewrite_without_cdf_refuses(spark, tmp_path):
    path = str(tmp_path / "t")
    create_minimal_table(
        spark, path, _df(spark).repartitionByRange(4, "k"), stats=True
    )  # cdf OFF
    r = DeltaLogReader(spark, path)
    v = r.update_where([("k", "<", 3)], {"v": "v + 1"})
    with pytest.raises(UnsupportedDeltaFeature, match="without"):
        r.changes(v - 1, v).count()


def test_delete_only_commit_without_cdf_derives_deletes(spark, tmp_path):
    path = str(tmp_path / "t")
    create_minimal_table(
        spark, path, _df(spark), partition_by=["p"], stats=True
    )  # cdf OFF: metadata-only partition delete = remove actions only
    r = DeltaLogReader(spark, path)
    v = r.delete_where([("p", "=", 2)])
    ch = r.changes(v - 1, v)
    assert ch.count() == 100
    assert {x._change_type for x in ch.collect()} == {"delete"}


def test_optimize_is_invisible_in_changes(spark, tmp_path):
    path = str(tmp_path / "t")
    create_minimal_table(
        spark, path, _df(spark).repartition(6), stats=True, cdf=True
    )
    r = DeltaLogReader(spark, path)
    v = r.optimize(target_bytes=1 << 20)
    assert r.changes(v - 1, v).count() == 0


def test_ivm_follows_external_table_through_dml(spark, tmp_path):
    path = str(tmp_path / "t")
    create_minimal_table(
        spark, path, _df(spark).repartitionByRange(4, "k"),
        stats=True, cdf=True,
    )
    r = DeltaLogReader(spark, path)
    v0 = r.latest_version()
    view = ivm.initial_view(r.read(v0), ["p"], ["v"]).localCheckpoint()
    r.update_where([("k", "<", 30)], {"v": "v * 2"})
    r.merge(
        spark.createDataFrame(
            [(7, 0, -7), (2000, 2, -2)], "k long, p int, v long"
        ),
        "k",
    )
    r.delete_where([("k", ">=", 250)])
    v1 = r.latest_version()
    maintained = ivm.apply_delta(
        view,
        ivm.aggregate_delta(r.changes(v0, v1), ["p"], ["v"]),
        ["p"],
        ["v"],
    )
    expect = sorted(
        (x.p, x.n_rows, x.sum_v)
        for x in ivm.initial_view(r.read(v1), ["p"], ["v"]).collect()
    )
    got = sorted((x.p, x.n_rows, x.sum_v) for x in maintained.collect())
    assert got == expect


def test_zero_match_rewrite_does_not_break_the_feed(spark, tmp_path):
    """A stats-inconclusive predicate that matches NO row must not
    publish a cdc-less rewrite commit (it would permanently break
    changes()); the operation is a no-op instead."""
    path = str(tmp_path / "t")
    # no stats: every file is a rewrite candidate
    create_minimal_table(spark, path, _df(spark), stats=False, cdf=True)
    r = DeltaLogReader(spark, path)
    v = r.latest_version()
    assert r.update_where([("k", "=", -1)], {"v": "v + 1"}) == v
    assert r.delete_where([("k", "=", -1)]) == v
    assert r.merge(
        spark.createDataFrame([], "k long, p int, v long"), "k"
    ) == v
    assert r.changes(0, r.latest_version()).count() == 0


def test_delete_null_predicate_rows_survive_and_feed_agrees(
    spark, tmp_path
):
    """SQL DELETE removes rows where the predicate is TRUE; NULL rows
    survive — and the CDF feed must agree with the table state."""
    path = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(1, 5.0), (2, None), (3, 50.0)], "k long, v double"
    )
    create_minimal_table(spark, path, base, cdf=True)
    r = DeltaLogReader(spark, path)
    v = r.delete_where([("v", "<", 10.0)])
    got = {x.k for x in r.read().collect()}
    assert got == {2, 3}  # the NULL row survives
    ch = r.changes(v - 1, v)
    assert {x.k for x in ch.collect()} == {1}  # feed matches the state


def test_ivm_null_group_key_maintains(spark, tmp_path):
    from introduction_in_big_data_spark.operators import ivm
    from introduction_in_big_data_spark.sources.acidtable import AcidTable

    base = spark.createDataFrame(
        [(1, None, 10), (2, None, 20), (3, "a", 30)],
        "k long, g string, v long",
    )
    table = AcidTable.create(spark, str(tmp_path / "t"), base)
    v0 = table.latest_version()
    view = ivm.initial_view(table.read(v0), ["g"], ["v"]).localCheckpoint()
    table.delete("k = 1")  # decrement the NULL group
    v1 = table.latest_version()
    maintained = ivm.apply_delta(
        view,
        ivm.aggregate_delta(
            table.changes("k", v0, v1, preimages=True), ["g"], ["v"]
        ),
        ["g"],
        ["v"],
    )
    got = sorted(
        ((x.g or ""), x.n_rows, x.sum_v) for x in maintained.collect()
    )
    assert got == [("", 1, 20), ("a", 1, 30)]


def test_ivm_unknown_change_type_raises(spark):
    from introduction_in_big_data_spark.operators import ivm

    bad = spark.createDataFrame(
        [("a", 1, "update")], "g string, v long, _change_type string"
    )
    with pytest.raises(Exception, match="unknown change type"):
        ivm.aggregate_delta(bad, ["g"], ["v"]).collect()


def test_zorder_by_validates_columns(spark, tmp_path):
    path = str(tmp_path / "t")
    create_minimal_table(
        spark, path, _df(spark), partition_by=["p"], stats=True
    )
    r = DeltaLogReader(spark, path)
    with pytest.raises(ValueError, match="data columns"):
        r.optimize(zorder_by=("p", "k"))  # p is a partition column
    with pytest.raises(ValueError, match="data columns"):
        r.optimize(zorder_by=("zzz", "k"))
