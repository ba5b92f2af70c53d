"""AcidTable CHANGE LOG (create(cdf=True) + changes_feed): row-level
change history at O(feed) cost — merge/delete persist change files,
append/create/overwrite derive from file-set diffs, optimize is
invisible, log-less rewrites refuse. Plus the NULL-predicate DELETE
regression (rows where the condition evaluates NULL must survive)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from introduction_in_big_data_spark.operators import ivm
from introduction_in_big_data_spark.sources.acidtable import AcidTable


def _df(spark, lo=0, hi=400):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"),
        (F.col("id") % 5).cast("int").alias("g"),
        (F.col("id") * 10).alias("v"),
    )


def test_changes_feed_matches_snapshot_diff_through_dml(spark, tmp_path):
    table = AcidTable.create(
        spark, str(tmp_path / "t"), _df(spark), cdf=True
    )
    v0 = table.latest_version()
    table.merge(
        _df(spark, 390, 420).select("k", "g", (F.col("v") * 3).alias("v")),
        "k",
    )
    table.delete("k < 25")
    table.append(_df(spark, 1000, 1040))
    table.optimize(target_bytes=1 << 20)
    v1 = table.latest_version()
    feed = table.changes_feed(v0, v1)
    # the feed's signed IVM fold must equal a full recompute
    view = ivm.initial_view(table.read(v0), ["g"], ["v"]).localCheckpoint()
    maintained = ivm.apply_delta(
        view,
        ivm.aggregate_delta(feed, ["g"], ["v"]),
        ["g"],
        ["v"],
    )
    expect = sorted(
        (x.g, x.n_rows, x.sum_v)
        for x in ivm.initial_view(table.read(v1), ["g"], ["v"]).collect()
    )
    got = sorted((x.g, x.n_rows, x.sum_v) for x in maintained.collect())
    assert got == expect
    # per-commit tags: merge emits pre/post/insert, delete deletes,
    # append inserts, optimize nothing
    tags = {
        (r._commit_version, r._change_type)
        for r in feed.select("_commit_version", "_change_type")
        .distinct()
        .collect()
    }
    assert (v0 + 1, "update_preimage") in tags
    assert (v0 + 1, "update_postimage") in tags
    assert (v0 + 1, "insert") in tags  # keys 400-419 are new
    assert (v0 + 2, "delete") in tags
    assert (v0 + 3, "insert") in tags
    assert not any(cv == v0 + 4 for cv, _t in tags)  # optimize invisible


def test_changes_feed_refuses_logless_rewrites(spark, tmp_path):
    table = AcidTable.create(spark, str(tmp_path / "t"), _df(spark))
    v0 = table.latest_version()
    table.delete("k < 10")  # cdf off: rewrite without change files
    with pytest.raises(ValueError, match="cdf=True"):
        table.changes_feed(v0, table.latest_version()).count()


def test_changes_feed_overwrite_derives_both_sides(spark, tmp_path):
    table = AcidTable.create(
        spark, str(tmp_path / "t"), _df(spark, 0, 100), cdf=True
    )
    v0 = table.latest_version()
    table.overwrite(_df(spark, 50, 120))
    feed = table.changes_feed(v0, table.latest_version())
    assert feed.filter("_change_type = 'delete'").count() == 100
    assert feed.filter("_change_type = 'insert'").count() == 70
    # no-op delete commits nothing to the feed
    table.delete("k > 100000")
    assert table.changes_feed(v0 + 1, table.latest_version()).count() == 0


def test_delete_null_condition_rows_survive(spark, tmp_path):
    base = spark.createDataFrame(
        [(1, 5.0), (2, None), (3, 50.0)], "k long, x double"
    )
    table = AcidTable.create(spark, str(tmp_path / "t"), base, cdf=True)
    v0 = table.latest_version()
    table.delete("x < 10.0")
    got = {r.k for r in table.read().collect()}
    assert got == {2, 3}  # the NULL row survives (SQL semantics)
    feed = table.changes_feed(v0, table.latest_version())
    assert {r.k for r in feed.collect()} == {1}  # feed agrees


def test_cdf_stream_matches_batch_feed(spark, tmp_path):
    from introduction_in_big_data_spark.sources.acidstream import (
        AcidTableStreamDataSource,
    )
    from introduction_in_big_data_spark.streaming import stream as st

    path = str(tmp_path / "t")
    table = AcidTable.create(spark, path, _df(spark), cdf=True)
    v0 = table.latest_version()
    table.merge(
        _df(spark, 395, 410).select("k", "g", (F.col("v") + 1).alias("v")),
        "k",
    )
    table.delete("k < 20")
    table.append(_df(spark, 2000, 2030))
    v1 = table.latest_version()
    try:
        spark.dataSource.register(AcidTableStreamDataSource)
    except Exception:
        pass
    s = (
        spark.readStream.format("acid_table_stream")
        .option("path", path)
        .option("readChangeFeed", "true")
        .option("startingVersion", str(v0 + 1))
        .load()
    )
    streamed = st.run_to_memory(
        s.groupBy("_change_type", "_commit_version").agg(
            F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv")
        ),
        "complete",
        state_partitions=2,
    )
    batch = (
        table.changes_feed(v0, v1)
        .groupBy("_change_type", "_commit_version")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv"))
    )
    key = lambda x: (x._change_type, x._commit_version)  # noqa: E731
    got = sorted((key(x), x.n, x.sv) for x in streamed.collect())
    want = sorted((key(x), x.n, x.sv) for x in batch.collect())
    assert got == want and len(got) >= 4


def test_cdf_stream_refuses_logless_rewrites(spark, tmp_path):
    import pytest as _pt

    from introduction_in_big_data_spark.sources.acidstream import (
        AcidTableStreamDataSource,
    )
    from introduction_in_big_data_spark.streaming import stream as st

    path = str(tmp_path / "t")
    table = AcidTable.create(spark, path, _df(spark))  # cdf off
    v0 = table.latest_version()
    table.delete("k < 10")
    try:
        spark.dataSource.register(AcidTableStreamDataSource)
    except Exception:
        pass
    s = (
        spark.readStream.format("acid_table_stream")
        .option("path", path)
        .option("readChangeFeed", "true")
        .option("startingVersion", str(v0 + 1))
        .load()
    )
    with _pt.raises(Exception, match="cdf=True"):
        st.run_to_memory(s.groupBy().count(), "complete", state_partitions=2)


def test_empty_merge_does_not_poison_the_feed(spark, tmp_path):
    """A no-op merge on a cdf table records change_files=[] — the
    feed must render it as EMPTY, not refuse the range forever."""
    table = AcidTable.create(
        spark, str(tmp_path / "t"), _df(spark, 0, 50), cdf=True
    )
    v0 = table.latest_version()
    table.merge(
        spark.createDataFrame([], "k long, g int, v long"), "k"
    )
    table.append(_df(spark, 1000, 1010))
    feed = table.changes_feed(v0, table.latest_version())
    assert feed.count() == 10
    assert {r._change_type for r in feed.collect()} == {"insert"}


def test_changes_feed_spans_schema_evolution(spark, tmp_path):
    """A feed range crossing add_column unions pre- and
    post-evolution frames; the new column reads as NULL on the
    before side (matching the snapshot-diff CDF and the stream)."""
    table = AcidTable.create(
        spark, str(tmp_path / "t"), _df(spark, 0, 30), cdf=True
    )
    v0 = table.latest_version()
    table.append(_df(spark, 100, 110))
    table.add_column("extra", "integer")
    table.append(
        spark.createDataFrame(
            [(200, 1, 5, 7)], "k long, g int, v long, extra integer"
        )
    )
    feed = table.changes_feed(v0, table.latest_version())
    assert feed.count() == 11
    assert feed.filter("k = 200").collect()[0].extra == 7
    assert feed.filter("k = 105").collect()[0].extra is None
