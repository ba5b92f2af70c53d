"""Copy-on-write ACID table: snapshot isolation, time travel,
file-pruned MERGE/DELETE, optimistic concurrency, vacuum retention."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from introduction_in_big_data_spark.operators.scd import merge_upsert
from introduction_in_big_data_spark.sources.acidtable import AcidTable, CommitConflict
from introduction_in_big_data_spark.sources.tables import load_table


@pytest.fixture()
def nation_table(spark, sf_dir, tmp_path):
    nation = load_table(spark, sf_dir, "nation")
    t = AcidTable.create(spark, str(tmp_path / "nation_acid"), nation)
    return t, nation


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_create_read_append_history(nation_table, spark):
    t, nation = nation_table
    assert _rows(t.read()) == _rows(nation)

    extra = spark.createDataFrame([(99, "ATLANTIS", 0)], nation.schema)
    v = t.append(extra)
    assert v == 1
    assert t.read().count() == nation.count() + 1
    ops = [h["op"] for h in t.history()]
    assert ops == ["create", "append"]


def test_time_travel_pins_old_snapshot(nation_table, spark):
    t, nation = nation_table
    t.overwrite(nation.filter("n_regionkey = 0"))
    assert t.read().count() < nation.count()
    # snapshot 0 still reads the full original — old files are immutable
    assert _rows(t.read(version=0)) == _rows(nation)


def test_merge_matches_anti_join_union_semantics(spark, sf_dir, tmp_path):
    """MERGE parity with the operator-level merge_upsert (itself
    driver-hash-checked via merge_upsert_customers)."""
    cust = load_table(spark, sf_dir, "customer")
    t = AcidTable.create(spark, str(tmp_path / "cust_acid"), cust)
    updates = (
        cust.filter("c_custkey % 7 = 0")
        .withColumn("c_acctbal", F.round(F.col("c_acctbal") + 1000.0, 2))
    )
    new_rows = cust.limit(0).unionByName(
        spark.createDataFrame(
            [tuple(None if i > 0 else 999_999 for i in range(len(cust.columns)))],
            cust.schema,
        )
    )
    updates = updates.unionByName(new_rows)
    t.merge(updates, "c_custkey")
    assert _rows(t.read()) == _rows(merge_upsert(cust, updates, "c_custkey"))


def test_merge_rewrites_only_hit_files(spark, sf_dir, tmp_path):
    """The copy-on-write point: files without matched keys carry
    forward BY REFERENCE (same path in the next manifest)."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    # lay the table out in 8 files partitioned by key range so updates
    # to a few keys hit a subset of files
    t = AcidTable.create(
        spark,
        str(tmp_path / "ord_acid"),
        orders.repartitionByRange(8, "o_orderkey"),
    )
    m0 = t._manifest(0)
    assert len(m0["files"]) == 8
    lo_keys = orders.orderBy("o_orderkey").limit(3)
    updates = lo_keys.withColumn("o_totalprice", F.lit(0.0))
    t.merge(updates, "o_orderkey")
    m1 = t._manifest(1)
    carried = set(m0["files"]) & set(m1["files"])
    assert m1["rewrote_files"] < 8, "merge must not rewrite every file"
    assert len(carried) == 8 - m1["rewrote_files"]
    # data correct
    got = dict(
        t.read().filter(F.col("o_orderkey").isin(
            [r["o_orderkey"] for r in lo_keys.collect()]
        )).select("o_orderkey", "o_totalprice").collect()
    )
    assert set(got.values()) == {0.0}


def test_delete_where_and_file_pruning(spark, sf_dir, tmp_path):
    nation = load_table(spark, sf_dir, "nation")
    t = AcidTable.create(
        spark, str(tmp_path / "nat_acid"), nation.repartitionByRange(4, "n_nationkey")
    )
    t.delete("n_nationkey >= 20")
    assert t.read().count() == nation.filter("n_nationkey < 20").count()
    m1 = t._manifest(1)
    assert m1["rewrote_files"] < 4, "delete should prune untouched files"


def test_optimistic_concurrency_conflict(nation_table, spark):
    t, nation = nation_table
    # both writers read latest=0 and prepare version 1; the racing one
    # lands its manifest first (the window _commit closes)
    loser_files = t._manifest(0)["files"] + t._write_data_files(nation.limit(1))
    racing = os.path.join(t.log_dir, f"{1:08d}.json")
    with open(racing, "x") as fh:
        json.dump({"version": 1, "files": t._manifest(0)["files"],
                   "op": "append", "ts": 0,
                   "schema": t._manifest(0)["schema"]}, fh)
    with pytest.raises(CommitConflict):
        t._commit(1, loser_files, "append")
    # loser re-reads the log and retries against the new latest
    v = t.append(nation.limit(1))
    assert v == 2


def test_uncommitted_files_invisible(nation_table, spark):
    """Data files land before the manifest that references them — a
    crashed writer's orphans must not appear in reads."""
    t, nation = nation_table
    orphans = t._write_data_files(nation.limit(5))
    assert all(os.path.exists(f) for f in orphans)
    assert t.read().count() == nation.count()  # unchanged


def test_vacuum_enforces_retention(nation_table, spark):
    t, nation = nation_table
    t.overwrite(nation.filter("n_regionkey = 1"))
    removed = t.vacuum(keep_last=1)
    assert removed, "v0's files are no longer referenced"
    with pytest.raises(FileNotFoundError, match="vacuumed"):
        t.read(version=0)
    # latest still intact
    assert t.read().count() == nation.filter("n_regionkey = 1").count()


def test_streaming_upsert_sink_foreachbatch(spark, sf_dir, tmp_path):
    """Streaming CDC sink: foreachBatch MERGEs each micro-batch into
    the ACID table — the standard lakehouse streaming-upsert pattern.
    End state must equal last-write-wins over the batch sequence."""
    from introduction_in_big_data_spark.streaming.stream import (
        events_stream,
        stage_events_dir,
    )

    staged = stage_events_dir(spark, sf_dir, n_files=3)
    stream = events_stream(spark, sf_dir, n_files=3).select(
        F.col("user_id"), F.col("event_type"), F.col("ts")
    )

    seed = spark.createDataFrame([], stream.schema)
    t = AcidTable.create(spark, str(tmp_path / "ev_acid"), seed)

    def upsert(batch_df, _bid):
        from pyspark.sql import Window

        # one row per user per batch (latest ts wins inside the batch)
        latest = (
            batch_df.withColumn(
                "rn",
                F.row_number().over(
                    Window.partitionBy("user_id").orderBy(
                        F.desc("ts"), F.desc("event_type")
                    )
                ),
            )
            .filter("rn = 1")
            .drop("rn")
        )
        t.merge(latest, "user_id")

    q = (
        stream.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    final = t.read()
    # one row per user, and every user from the source present
    src = spark.read.parquet(staged)
    assert final.count() == src.select("user_id").distinct().count()
    assert final.groupBy("user_id").count().filter("count > 1").count() == 0
    assert [h["op"] for h in t.history()][:1] == ["create"]
    assert len(t.history()) >= 2  # at least one merge committed


def test_changes_feed_tags_and_excludes_unchanged(spark, tmp_path):
    """changes(key, v0, v2): inserts/updates/deletes tagged; a row
    merged with IDENTICAL values is not a change; deletes carry their
    pre-image."""
    base = spark.createDataFrame(
        [(1, 10.0, "a"), (2, 20.0, "b"), (3, 30.0, "c")], "k long, v double, s string"
    )
    t = AcidTable.create(spark, str(tmp_path / "cdf"), base)
    updates = spark.createDataFrame(
        [(1, 10.0, "a"),     # identical -> must NOT appear in the feed
         (2, 99.0, "b"),     # update
         (4, 40.0, "d")],    # insert
        "k long, v double, s string",
    )
    t.merge(updates, "k")
    t.delete("k = 3")
    feed = {r.k: (r.v, r.s, r._change_type)
            for r in t.changes("k", 0, t.latest_version()).collect()}
    assert feed == {
        2: (99.0, "b", "update_postimage"),
        3: (30.0, "c", "delete"),       # pre-image values
        4: (40.0, "d", "insert"),
    }


def test_add_column_is_metadata_only(spark, tmp_path):
    """Schema evolution: the add_column commit carries every data file
    by reference (zero rewrites), pre-evolution rows read the new
    column as NULL, and post-evolution merges fill it."""
    base = spark.createDataFrame([(1, 10.0), (2, 20.0)], "k long, v double")
    t = AcidTable.create(spark, str(tmp_path / "evo"), base)
    files_before = set(t._manifest(t.latest_version())["files"])
    t.add_column("tag", "string")
    m = t._manifest(t.latest_version())
    assert m["op"] == "add_column"
    assert set(m["files"]) == files_before  # nothing rewritten
    rows = {r.k: r.tag for r in t.read().collect()}
    assert rows == {1: None, 2: None}
    upd = spark.createDataFrame([(2, 99.0, "x"), (3, 30.0, "y")],
                                "k long, v double, tag string")
    t.merge(upd, "k")
    rows = {r.k: (r.v, r.tag) for r in t.read().collect()}
    assert rows == {1: (10.0, None), 2: (99.0, "x"), 3: (30.0, "y")}


def test_delete_after_evolution_keeps_new_column(spark, tmp_path):
    """ADVICE r3 (medium): delete() must read hit files through the
    MANIFEST schema — after add_column, rewriting survivors from a
    mixed pre-/post-evolution hit set must not drop the new column's
    values (schema inference from a pre-evolution file would)."""
    base = spark.createDataFrame([(1, 10.0), (2, 20.0)], "k long, v double")
    t = AcidTable.create(spark, str(tmp_path / "evodel"), base)
    t.add_column("tag", "string")
    # post-evolution rows with real tag values land in NEW files
    t.merge(
        spark.createDataFrame([(3, 30.0, "x"), (4, 40.0, "y")],
                              "k long, v double, tag string"),
        "k",
    )
    # condition hits BOTH a pre-evolution file (k=1) and a
    # post-evolution file (k=3) -> both get rewritten
    t.delete("k IN (1, 3)")
    rows = {r.k: (r.v, r.tag) for r in t.read().collect()}
    assert rows == {2: (20.0, None), 4: (40.0, "y")}


def test_changes_composes_with_add_column(spark, tmp_path):
    """ADVICE r3: CDF across an add_column boundary — the before
    snapshot lacks the evolved column; changes() projects it as typed
    NULL so a pre-evolution row that only gained a tag value reads as
    NULL -> value = update."""
    base = spark.createDataFrame([(1, 10.0), (2, 20.0)], "k long, v double")
    t = AcidTable.create(spark, str(tmp_path / "evocdf"), base)
    t.add_column("tag", "string")
    t.merge(
        spark.createDataFrame([(2, 20.0, "x"), (3, 30.0, "y")],
                              "k long, v double, tag string"),
        "k",
    )
    feed = {r.k: (r.v, r.tag, r._change_type)
            for r in t.changes("k", 0, t.latest_version()).collect()}
    # k=1 unchanged (NULL tag on both sides), k=2 gained a tag value,
    # k=3 inserted
    assert feed == {
        2: (20.0, "x", "update_postimage"),
        3: (30.0, "y", "insert"),
    }


def test_optimize_binpacks_small_files(spark, sf_dir, tmp_path):
    """OPTIMIZE: many small files collapse into ~target-size bins with
    content byte-identical; already-right-sized files carry forward by
    reference; a second optimize is a no-op (no empty commit)."""
    base = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    t = AcidTable.create(spark, str(tmp_path / "opt"), base.repartition(16))
    v0 = t.latest_version()
    files_before = t._manifest(v0)["files"]
    assert len(files_before) == 16
    before = sorted((r.c_custkey, r.c_acctbal) for r in t.read().collect())

    v1 = t.optimize(target_bytes=1 << 30)  # everything fits one bin
    m = t._manifest(v1)
    assert m["op"] == "optimize"
    assert len(m["files"]) < len(files_before)
    after = sorted((r.c_custkey, r.c_acctbal) for r in t.read().collect())
    assert after == before
    # old snapshot still readable (copy-on-write)
    assert t.read(v0).count() == len(before)
    # idempotent: nothing small left -> same version back, no commit
    assert t.optimize(target_bytes=1 << 30) == v1


def test_optimize_zorder_clusters_files(spark, sf_dir, tmp_path):
    """OPTIMIZE ZORDER BY: rewritten files carry tight 2-D bounding
    boxes — a two-sided predicate must prune most files via footer
    stats, and content is preserved exactly."""
    import pyarrow.parquet as pq_meta

    base = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    t = AcidTable.create(spark, str(tmp_path / "optz"), base.repartition(8))
    before = sorted(
        (r.c_custkey, r.c_nationkey, r.c_acctbal) for r in t.read().collect()
    )
    v = t.optimize(target_bytes=2 << 10, zorder_by=("c_custkey", "c_nationkey"))
    m = t._manifest(v)
    assert m["zorder_by"] == ["c_custkey", "c_nationkey"]
    assert len(m["files"]) > 1  # small target forces multiple z-files
    after = sorted(
        (r.c_custkey, r.c_nationkey, r.c_acctbal) for r in t.read().collect()
    )
    assert after == before
    # footer-stats pruning: count files whose c_custkey range intersects
    # a narrow band; z-ordering should leave most files prunable
    n_hit = 0
    lo, hi = 100, 200
    for f in m["files"]:
        md = pq_meta.ParquetFile(f).metadata
        st = md.row_group(0).column(0).statistics
        fmin, fmax = st.min, st.max
        for g in range(1, md.num_row_groups):
            s = md.row_group(g).column(0).statistics
            fmin, fmax = min(fmin, s.min), max(fmax, s.max)
        if fmax >= lo and fmin <= hi:
            n_hit += 1
    assert n_hit < len(m["files"])  # at least one file prunes away


def test_acid_table_streaming_source(spark, tmp_path):
    """Streaming FROM the ACID table (sources/acidstream.py):
    startingVersion=0 replays the whole commit history as
    micro-batches; commits made while the stream runs become new
    batches of exactly the appended rows; an optimize commit
    contributes nothing; a merge commit is refused unless
    ignoreChanges (Delta's documented semantics)."""
    import time as _t

    from introduction_in_big_data_spark.sources.acidstream import (
        AcidTableStreamDataSource,
        AcidTableStreamReader,
    )

    base = spark.createDataFrame([(1, 10.0), (2, 20.0)], "k long, v double")
    t = AcidTable.create(spark, str(tmp_path / "srctab"), base)
    t.append(spark.createDataFrame([(3, 30.0)], "k long, v double"))
    try:
        spark.dataSource.register(AcidTableStreamDataSource)
    except Exception:
        pass
    batches = []

    def sink(df, epoch_id):
        rows = [tuple(r) for r in df.collect()]
        if rows:
            batches.append(sorted(rows))

    q = (
        spark.readStream.format("acid_table_stream")
        .option("path", str(tmp_path / "srctab"))
        .option("startingVersion", "0")
        .load()
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        # batch 1 replays commits 0..1 (whatever latestOffset first saw)
        deadline = _t.time() + 90
        while _t.time() < deadline and sum(len(b) for b in batches) < 3:
            _t.sleep(0.3)
        t.optimize(target_bytes=1 << 30)  # layout-only: must emit nothing
        t.append(spark.createDataFrame([(4, 40.0)], "k long, v double"))
        deadline = _t.time() + 90
        while _t.time() < deadline and sum(len(b) for b in batches) < 4:
            _t.sleep(0.3)
    finally:
        q.stop()
    got = sorted(r for b in batches for r in b)
    assert got == [(1, 10.0), (2, 20.0), (3, 30.0), (4, 40.0)]
    # the post-optimize append arrived alone, in its own later batch
    assert batches[-1] == [(4, 40.0)]

    # a rewriting commit must fail the stream unless ignoreChanges
    t.merge(spark.createDataFrame([(1, 99.0)], "k long, v double"), "k")
    r = AcidTableStreamReader({"path": str(tmp_path / "srctab")})
    with pytest.raises(ValueError, match="ignoreChanges"):
        r.partitions({"version": t.latest_version() - 1},
                     {"version": t.latest_version()})
    r2 = AcidTableStreamReader(
        {"path": str(tmp_path / "srctab"), "ignoreChanges": "true"}
    )
    assert r2.partitions({"version": t.latest_version() - 1},
                         {"version": t.latest_version()}) == []
