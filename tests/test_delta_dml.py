"""DML + maintenance on EXTERNALLY-written Delta tables
(DeltaLogReader.delete_where / optimize / vacuum, round 5): the
engine as a full read-write-maintain citizen of the other ecosystem's
protocol.

delete_where's write side is driven by the same file-skipping
evaluator as reads: provably-unaffected files carry by reference,
partition-only predicates delete metadata-only, and only genuinely
mixed files rewrite."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from introduction_in_big_data_spark.sources.deltalog import (
    DeltaLogReader,
    UnsupportedDeltaFeature,
    create_column_mapped_table,
    create_minimal_table,
)


def _df(spark):
    return spark.range(0, 1200).select(
        F.col("id").alias("k"),
        (F.col("id") % 3).cast("int").alias("p"),
        (F.col("id") * 1.0).alias("v"),
    )


def _commit_actions(path, v):
    with open(os.path.join(path, "_delta_log", f"{v:020d}.json")) as fh:
        return [json.loads(ln) for ln in fh if ln.strip()]


def test_delete_where_rewrites_only_affected_files(spark, tmp_path):
    path = str(tmp_path / "t")
    create_minimal_table(
        spark, path, _df(spark).repartitionByRange(6, "k"), stats=True
    )
    r = DeltaLogReader(spark, path)
    v = r.delete_where([("k", ">=", 1000)])
    acts = _commit_actions(path, v)
    removes = [a for a in acts if "remove" in a]
    adds = [a for a in acts if "add" in a]
    # only the boundary/top files rewrite; files provably below the
    # threshold carry by reference (no remove, no add)
    assert 1 <= len(removes) <= 2
    assert len(adds) <= len(removes)
    assert all("stats" in a["add"] for a in adds)  # stats keep flowing
    assert sorted(x.k for x in r.read().collect()) == list(range(1000))
    # a provably-no-op delete publishes no commit
    assert r.delete_where([("k", ">=", 1000)]) == v
    # and pruning still works on the post-delete snapshot
    r.read(predicates=[("k", "<", 100)])
    assert r.last_scan["skipped_files"] > 0


def test_delete_whole_group_leaves_no_empty_files(spark, tmp_path):
    path = str(tmp_path / "t")
    create_minimal_table(
        spark, path, _df(spark).repartitionByRange(6, "k"), stats=False
    )
    r = DeltaLogReader(spark, path)
    # without stats every file is a rewrite candidate; fully-deleted
    # files must not leave 0-row parquet adds behind
    v = r.delete_where([("k", ">=", 600)])
    acts = _commit_actions(path, v)
    for a in acts:
        if "add" in a:
            import pyarrow.parquet as pq

            full = os.path.join(path, a["add"]["path"])
            assert pq.ParquetFile(full).metadata.num_rows > 0
    assert r.read().count() == 600


def test_partition_only_predicate_is_metadata_only(spark, tmp_path):
    path = str(tmp_path / "t")
    create_minimal_table(
        spark, path, _df(spark), partition_by=["p"], stats=True
    )
    r = DeltaLogReader(spark, path)
    v = r.delete_where([("p", "=", 1)])
    acts = _commit_actions(path, v)
    assert sum(1 for a in acts if "add" in a) == 0  # nothing rewritten
    assert sum(1 for a in acts if "remove" in a) > 0
    assert r.read().count() == 800
    assert {x.p for x in r.read().select("p").distinct().collect()} == {0, 2}


def test_mixed_partition_and_data_predicate(spark, tmp_path):
    path = str(tmp_path / "t")
    create_minimal_table(
        spark, path, _df(spark), partition_by=["p"], stats=True
    )
    r = DeltaLogReader(spark, path)
    r.delete_where([("p", "=", 2), ("k", "<", 30)])
    got = r.read()
    assert got.count() == 1190
    assert got.filter("p = 2 AND k < 30").count() == 0
    # other partitions untouched, including k < 30 rows
    assert got.filter("p = 0 AND k < 30").count() == 10


def test_optimize_compacts_without_data_change(spark, tmp_path):
    path = str(tmp_path / "t")
    create_minimal_table(
        spark, path, _df(spark).repartition(8), stats=True
    )
    r = DeltaLogReader(spark, path)
    before = sorted(x.k for x in r.read().collect())
    v = r.optimize(target_bytes=1 << 20)
    assert len(r._replay(r.latest_version())[1]) == 1  # 8 -> 1 file
    assert sorted(x.k for x in r.read().collect()) == before
    # every action is dataChange=false: incremental/streaming see nothing
    for a in _commit_actions(path, v):
        side = a.get("add") or a.get("remove")
        assert side["dataChange"] is False
    assert r.incremental(0).count() == 0
    # idempotent: already compact -> no new commit
    assert r.optimize(target_bytes=1 << 20) == v
    # compacted file carries fresh stats
    live = r._replay(r.latest_version())[1]
    assert all("stats" in a for a in live.values())


def test_vacuum_deletes_only_unreferenced_files(spark, tmp_path):
    path = str(tmp_path / "t")
    create_minimal_table(
        spark, path, _df(spark).repartition(8), stats=True
    )
    r = DeltaLogReader(spark, path)
    r.optimize(target_bytes=1 << 20)
    deleted = r.vacuum(keep_last=1)
    assert len(deleted) == 8  # the pre-compaction files
    assert r.read().count() == 1200  # current snapshot intact
    with pytest.raises(Exception):  # vacuumed snapshot fails loudly
        r.read(version=0).count()
    assert r.vacuum(keep_last=1) == []  # idempotent


def test_concurrent_commit_raises_commit_conflict(spark, tmp_path):
    from introduction_in_big_data_spark.sources.acidtable import (
        CommitConflict,
    )

    path = str(tmp_path / "t")
    create_minimal_table(spark, path, _df(spark), stats=True)
    r = DeltaLogReader(spark, path)
    # another writer publishes the next version first
    winner = os.path.join(path, "_delta_log", f"{1:020d}.json")
    with open(winner, "w") as fh:
        fh.write(json.dumps({"commitInfo": {"operation": "NOOP"}}) + "\n")
    with pytest.raises(CommitConflict, match="concurrently"):
        r._publish(1, [{"commitInfo": {"operation": "LOSER"}}])
    # the loser's temp file must not linger in the log dir
    assert not [
        f for f in os.listdir(os.path.join(path, "_delta_log"))
        if f.endswith(".tmp")
    ]


def test_dml_on_column_mapped_tables_works(spark, tmp_path):
    """Round 8 (VERDICT r7 item 1): column-mapped tables are
    writable, not just readable — the former refusal is gone.
    Exhaustive coverage lives in test_delta_column_mapping_dml.py."""
    path = str(tmp_path / "t")
    create_column_mapped_table(spark, path, _df(spark), stats=True)
    r = DeltaLogReader(spark, path)
    r.delete_where([("k", "<", 100)])
    assert sorted(x.k for x in r.read().collect()) == list(
        range(100, 1200)
    )
    r.optimize()
    assert r.read().count() == 1100


def test_update_where_rewrites_only_matching_files(spark, tmp_path):
    path = str(tmp_path / "t")
    create_minimal_table(
        spark, path, _df(spark).repartitionByRange(6, "k"), stats=True
    )
    r = DeltaLogReader(spark, path)
    v = r.update_where([("k", ">=", 1000)], {"v": "v + 100000"})
    acts = _commit_actions(path, v)
    removes = [a for a in acts if "remove" in a]
    adds = [a for a in acts if "add" in a]
    # files provably below the threshold carry by reference
    assert 1 <= len(removes) <= 2
    assert all("stats" in a["add"] for a in adds)
    got = {x.k: x.v for x in r.read().collect()}
    assert len(got) == 1200  # UPDATE never changes cardinality
    assert got[999] == 999.0
    assert got[1000] == 101000.0
    # provably-no-match predicate publishes no commit
    assert r.update_where([("k", ">=", 10_000)], {"v": "0.0"}) == v


def test_update_where_partition_guards_and_mixed_rows(spark, tmp_path):
    path = str(tmp_path / "t")
    create_minimal_table(
        spark, path, _df(spark), partition_by=["p"], stats=True
    )
    r = DeltaLogReader(spark, path)
    with pytest.raises(ValueError, match="partition columns"):
        r.update_where([("k", "=", 1)], {"p": "0"})
    with pytest.raises(ValueError, match="unknown columns"):
        r.update_where([("k", "=", 1)], {"zzz": "0"})
    r.update_where([("p", "=", 1), ("k", "<", 30)], {"v": "-1.0"})
    got = r.read()
    assert got.count() == 1200
    assert got.filter("v = -1.0").count() == 10  # p=1 has k=1,4,...,28
    # non-matching rows in the rewritten partition pass through intact
    assert got.filter("p = 1 AND k >= 30 AND v = CAST(k AS DOUBLE)").count() \
        == got.filter("p = 1 AND k >= 30").count()
    # other partitions' files untouched on disk (carried by reference)
    assert got.filter("p = 0 AND v = -1.0").count() == 0


def test_merge_upserts_and_prunes_files(spark, tmp_path):
    path = str(tmp_path / "t")
    create_minimal_table(
        spark, path, _df(spark).repartitionByRange(6, "k"), stats=True
    )
    r = DeltaLogReader(spark, path)
    source = spark.range(0, 60).union(spark.range(2000, 2010)).select(
        F.col("id").alias("k"),
        (F.col("id") % 3).cast("int").alias("p"),
        F.lit(-5.0).alias("v"),
    )
    v = r.merge(source, "k")
    acts = _commit_actions(path, v)
    removes = [a for a in acts if "remove" in a]
    # the source key range [0, 60) hits only the low boundary file(s);
    # stats-pruned files never re-read
    assert 1 <= len(removes) <= 2
    got = {x.k: x.v for x in r.read().collect()}
    assert len(got) == 1210  # 1200 + 10 inserts
    assert got[5] == -5.0 and got[2005] == -5.0  # matched + inserted
    assert got[100] == 100.0  # untouched
    adds = [a for a in acts if "add" in a]
    assert all("stats" in a["add"] for a in adds)


def test_merge_partitioned_routes_rows_and_moves_partitions(spark, tmp_path):
    path = str(tmp_path / "t")
    create_minimal_table(
        spark, path, _df(spark), partition_by=["p"], stats=True
    )
    r = DeltaLogReader(spark, path)
    # k=9 lives in p=0; the source MOVES it to p=2 and inserts k=5000
    source = spark.createDataFrame(
        [(9, 2, -9.0), (5000, 1, -1.0)], "k long, p int, v double"
    )
    v = r.merge(source, "k")
    got = r.read()
    assert got.count() == 1201
    assert got.filter("k = 9").collect()[0].p == 2
    assert got.filter("k = 5000").collect()[0].v == -1.0
    # adds carry hive-decoded partitionValues
    for a in _commit_actions(path, v):
        if "add" in a:
            assert set(a["add"]["partitionValues"]) == {"p"}
    # pruning by partition still works post-merge
    assert r.read(predicates=[("p", "=", 1)]).count() == 401


def test_merge_on_partition_column_key_is_metadata_pruned(spark, tmp_path):
    path = str(tmp_path / "t")
    create_minimal_table(
        spark, path, _df(spark), partition_by=["p"], stats=True
    )
    r = DeltaLogReader(spark, path)
    # replace ALL of partition 1 with two rows (partition-key merge)
    source = spark.createDataFrame(
        [(10_001, 1, 1.0), (10_002, 1, 2.0)], "k long, p int, v double"
    )
    r.merge(source, "p")
    got = r.read()
    assert got.filter("p = 1").count() == 2
    assert got.filter("p != 1").count() == 800
    assert got.count() == 802


# -- Iceberg merge-on-read DELETE -------------------------------------------


def test_iceberg_delete_where_writes_position_deletes(spark, tmp_path):
    from introduction_in_big_data_spark.sources.iceberg import (
        IcebergTableReader,
        create_minimal_table as ice_create,
    )

    path = str(tmp_path / "t")
    ice_create(
        spark, path,
        _df(spark).select("k", F.col("p").alias("g"))
        .repartitionByRange(6, "k"),
        bounds=True,
    )
    t = IcebergTableReader(spark, path)
    before_data = {
        f for f in os.listdir(os.path.join(path, "data"))
        if not f.startswith("delete-")
    }
    sid = t.delete_where([("k", ">=", 1000)])
    after_data = {
        f for f in os.listdir(os.path.join(path, "data"))
        if not f.startswith("delete-")
    }
    assert before_data == after_data  # merge-on-read: no data rewrite
    t2 = IcebergTableReader(spark, path)
    assert sorted(x.k for x in t2.read().collect()) == list(range(1000))
    # idempotent: already-tombstoned rows never re-delete
    assert t2.delete_where([("k", ">=", 1000)]) == sid
    # provably-out-of-bounds predicate is a driver-side no-op
    assert t2.delete_where([("k", ">=", 10_000)]) == sid


def test_iceberg_delete_where_mixed_predicate_and_time_travel(
    spark, tmp_path
):
    from introduction_in_big_data_spark.sources.iceberg import (
        IcebergTableReader,
        create_minimal_table as ice_create,
    )

    path = str(tmp_path / "t")
    ice_create(
        spark, path,
        _df(spark).select("k", F.col("p").alias("g")), bounds=True,
    )
    t = IcebergTableReader(spark, path)
    first = t.metadata()["current-snapshot-id"]
    t.delete_where([("g", "=", 1), ("k", "<", 30)])
    t2 = IcebergTableReader(spark, path)
    out = t2.read()
    assert out.count() == 1190
    assert out.filter("g = 1 AND k < 30").count() == 0
    # the pre-delete snapshot still reads in full (time travel)
    assert t2.read(snapshot_id=first).count() == 1200


def test_iceberg_upsert_merges_without_rewrites(spark, tmp_path):
    from introduction_in_big_data_spark.sources.iceberg import (
        IcebergTableReader,
        create_minimal_table as ice_create,
    )

    path = str(tmp_path / "t")
    ice_create(
        spark, path,
        _df(spark).select("k", "v").repartitionByRange(4, "k"),
        bounds=True,
    )
    t = IcebergTableReader(spark, path)
    first = t.metadata()["current-snapshot-id"]
    before_files = set(os.listdir(os.path.join(path, "data")))
    source = spark.createDataFrame(
        [(5, -5.0), (999, -9.0), (5000, 1.0)], "k long, v double"
    )
    t.upsert(source, "k")
    # merge-on-read: every pre-existing data file still on disk, unread
    assert before_files <= set(os.listdir(os.path.join(path, "data")))
    t2 = IcebergTableReader(spark, path)
    got = {x.k: x.v for x in t2.read().collect()}
    assert len(got) == 1201  # 1200 + 1 insert
    assert got[5] == -5.0 and got[999] == -9.0 and got[5000] == 1.0
    assert got[100] == 100.0  # unmatched rows untouched
    # time travel: the pre-upsert snapshot reads the original values
    old = {x.k: x.v for x in t2.read(snapshot_id=first).collect()}
    assert old[5] == 5.0 and 5000 not in old


def test_iceberg_upsert_chains_by_sequence(spark, tmp_path):
    from introduction_in_big_data_spark.sources.iceberg import (
        IcebergTableReader,
        create_minimal_table as ice_create,
    )

    path = str(tmp_path / "t")
    ice_create(spark, path, _df(spark).select("k", "v").limit(100))
    IcebergTableReader(spark, path).upsert(
        spark.createDataFrame([(7, -1.0)], "k long, v double"), "k"
    )
    # the second upsert's delete (seq 2) must beat the first's append
    # (seq 1): strictly-smaller sequence gate
    IcebergTableReader(spark, path).upsert(
        spark.createDataFrame([(7, -2.0)], "k long, v double"), "k"
    )
    got = {x.k: x.v for x in IcebergTableReader(spark, path).read().collect()}
    assert got[7] == -2.0
    assert len(got) == 100
    with pytest.raises(ValueError, match="not in table schema"):
        IcebergTableReader(spark, path).upsert(
            spark.createDataFrame([(1, 1.0)], "k long, v double"), "zzz"
        )


def test_iceberg_delete_where_applies_equality_deletes(spark, tmp_path):
    """Round 9: eq-delete tables no longer refuse DML — the existing
    equality deletes apply sequence-gated BEFORE hit detection, so an
    engine DELETE tombstones only the live set (see
    test_iceberg_eq_dml.py for the full Flink-CDC matrix)."""
    from introduction_in_big_data_spark.sources.iceberg import (
        IcebergTableReader,
        add_equality_deletes,
        create_minimal_table as ice_create,
    )

    path = str(tmp_path / "t")
    ice_create(spark, path, _df(spark).select("k"))
    add_equality_deletes(spark, path, [(5,)], ["k"], 1)
    IcebergTableReader(spark, path).delete_where([("k", "=", 1)])
    got = {r.k for r in IcebergTableReader(spark, path).read().collect()}
    assert 1 not in got and 5 not in got and 2 in got


def test_optimize_zorder_clusters_and_prunes(spark, tmp_path):
    path = str(tmp_path / "t")
    # random-ish layout: neither column is clustered before optimize
    base = spark.range(0, 20000).select(
        (F.col("id") * 48271 % 1201).cast("int").alias("x"),
        (F.col("id") * 16807 % 1201).cast("int").alias("y"),
        (F.col("id") * 1.0).alias("v"),
    ).repartition(8)
    create_minimal_table(spark, path, base, stats=True)
    r = DeltaLogReader(spark, path)
    before = sorted((x.x, x.y, x.v) for x in r.read().collect())
    v = r.optimize(target_bytes=16 << 10, zorder_by=("x", "y"))
    # content preserved, all actions dataChange=false
    assert sorted((x.x, x.y, x.v) for x in r.read().collect()) == before
    for a in _commit_actions(path, v):
        side = a.get("add") or a.get("remove")
        assert side["dataChange"] is False
    # the z-order payoff is metadata-visible: a 2-D box predicate
    # prunes files driver-side via the rewritten files' tight stats
    r.read(predicates=[("x", "<=", 150), ("y", "<=", 150)])
    assert r.last_scan["skipped_files"] > 0


def test_vacuum_retires_cdf_files_beyond_horizon(spark, tmp_path):
    path = str(tmp_path / "t")
    create_minimal_table(
        spark, path, _df(spark).repartitionByRange(4, "k"),
        stats=True, cdf=True,
    )
    r = DeltaLogReader(spark, path)
    v1 = r.delete_where([("k", ">=", 1100)])
    v2 = r.update_where([("k", "<", 5)], {"v": "v + 1"})
    # within the horizon both commits replay
    assert r.changes(v1 - 1, v2).count() > 0
    r.vacuum(keep_last=1)  # horizon = v2 only
    from introduction_in_big_data_spark.sources.deltalog import (
        UnsupportedDeltaFeature as UDF_,
    )

    with pytest.raises(UDF_, match="vacuumed"):
        r.changes(v1 - 1, v1).count()
    # the still-current commit's feed survives
    assert r.changes(v2 - 1, v2).count() == 10


def test_iceberg_update_where_merge_on_read(spark, tmp_path):
    from introduction_in_big_data_spark.sources.iceberg import (
        IcebergTableReader,
        create_minimal_table as ice_create,
    )

    path = str(tmp_path / "t")
    ice_create(
        spark, path,
        _df(spark).select("k", "v").repartitionByRange(4, "k"),
        bounds=True,
    )
    t = IcebergTableReader(spark, path)
    before_data = {
        f for f in os.listdir(os.path.join(path, "data"))
        if not f.startswith("delete-")
    }
    sid = t.update_where([("k", ">=", 1100)], {"v": "v + 0.5"})
    t2 = IcebergTableReader(spark, path)
    got = {x.k: x.v for x in t2.read().collect()}
    assert len(got) == 1200  # UPDATE never changes cardinality
    assert got[1099] == 1099.0 and got[1100] == 1100.5
    # merge-on-read: pre-existing data files untouched, one appended
    after_data = {
        f for f in os.listdir(os.path.join(path, "data"))
        if not f.startswith("delete-")
    }
    assert before_data < after_data
    # updating already-updated rows composes (tombstones excluded;
    # the appended file is a fresh candidate)
    t2.update_where([("k", ">=", 1100)], {"v": "v + 0.5"})
    got2 = {x.k: x.v for x in IcebergTableReader(spark, path).read().collect()}
    assert got2[1100] == 1101.0 and len(got2) == 1200
    # provably-out-of-bounds predicate is a driver-side no-op
    t3 = IcebergTableReader(spark, path)
    assert t3.update_where([("k", ">=", 10_000)], {"v": "0.0"}) \
        == t3.metadata()["current-snapshot-id"]
    assert sid != t3.metadata()["current-snapshot-id"]


def test_iceberg_compact_folds_deletes_and_keeps_bounds(spark, tmp_path):
    from introduction_in_big_data_spark.sources.iceberg import (
        IcebergTableReader,
        create_minimal_table as ice_create,
    )

    path = str(tmp_path / "t")
    ice_create(
        spark, path,
        _df(spark).select("k", "v").repartitionByRange(6, "k"),
        bounds=True,
    )
    t = IcebergTableReader(spark, path)
    t.delete_where([("k", ">=", 1000)])
    IcebergTableReader(spark, path).upsert(
        spark.createDataFrame([(5, -5.0), (3000, 3.0)], "k long, v double"),
        "k",
    )
    before = sorted(
        (x.k, x.v) for x in IcebergTableReader(spark, path).read().collect()
    )
    t2 = IcebergTableReader(spark, path)
    pre_snap = t2.metadata()["current-snapshot-id"]
    t2.compact(target_bytes=8 << 10)
    t3 = IcebergTableReader(spark, path)
    # content identical; no delete files remain in the live snapshot
    assert sorted((x.k, x.v) for x in t3.read().collect()) == before
    snap = next(
        s for s in t3.metadata()["snapshots"]
        if s["snapshot-id"] == t3.metadata()["current-snapshot-id"]
    )
    data, pos, eq = t3._live_files(snap)
    assert not pos and not eq
    # bounds recomputed: skipping still prunes on the compacted files
    t3.read(predicates=[("k", "<", 100)])
    assert t3.last_scan["skipped_files"] > 0
    # time travel to the pre-compaction snapshot still works
    assert t3.read(snapshot_id=pre_snap).count() == len(before)


def test_iceberg_expire_snapshots_reclaims_files(spark, tmp_path):
    from introduction_in_big_data_spark.sources.iceberg import (
        IcebergTableReader,
        create_minimal_table as ice_create,
    )

    path = str(tmp_path / "t")
    ice_create(
        spark, path,
        _df(spark).select("k", "v").repartitionByRange(6, "k"),
    )
    t = IcebergTableReader(spark, path)
    t.delete_where([("k", ">=", 1000)])
    t2 = IcebergTableReader(spark, path)
    old_snap = t2.metadata()["current-snapshot-id"]
    t2.compact(target_bytes=1 << 20)
    t3 = IcebergTableReader(spark, path)
    deleted = t3.expire_snapshots(keep_last=1)
    # the pre-compaction data files + delete file + old manifests die
    assert len(deleted) >= 7  # 6 data files + 1 delete file (+manifests)
    t4 = IcebergTableReader(spark, path)
    assert t4.read().count() == 1000  # current snapshot intact
    assert len(t4.metadata()["snapshots"]) == 1
    with pytest.raises(Exception):  # expired snapshot gone from metadata
        t4.read(snapshot_id=old_snap).count()
    assert t4.expire_snapshots(keep_last=1) == []  # idempotent


def test_delta_restore_flips_back_and_composes_with_cdf(spark, tmp_path):
    path = str(tmp_path / "t")
    create_minimal_table(
        spark, path, _df(spark).repartitionByRange(4, "k"),
        stats=True, cdf=True,
    )
    r = DeltaLogReader(spark, path)
    v0 = r.latest_version()
    r.delete_where([("k", ">=", 600)])
    assert r.read().count() == 600
    v = r.restore(v0)
    assert r.read().count() == 1200  # back in full
    # append-only history: the restore is a NEW commit
    assert v == r.latest_version() and v > v0 + 1 - 1
    # restore derives as adds-only (no cdc): the feed sees inserts
    ch = r.changes(v - 1, v)
    assert {x._change_type for x in ch.collect()} == {"insert"}
    # idempotent: restoring to the now-current state publishes nothing
    assert r.restore(v0) == v
    # vacuumed restore refuses
    r.delete_where([("k", ">=", 600)])
    r.vacuum(keep_last=1)
    with pytest.raises(UnsupportedDeltaFeature, match="vacuumed"):
        r.restore(v0)


def test_iceberg_rollback_points_back(spark, tmp_path):
    from introduction_in_big_data_spark.sources.iceberg import (
        IcebergTableReader,
        create_minimal_table as ice_create,
    )

    path = str(tmp_path / "t")
    ice_create(spark, path, _df(spark).select("k", "v"))
    t = IcebergTableReader(spark, path)
    first = t.metadata()["current-snapshot-id"]
    t.delete_where([("k", ">=", 600)])
    assert IcebergTableReader(spark, path).read().count() == 600
    IcebergTableReader(spark, path).rollback(first)
    t2 = IcebergTableReader(spark, path)
    assert t2.read().count() == 1200
    # newer snapshot still present (rollback deletes nothing)
    assert len(t2.metadata()["snapshots"]) == 2
    with pytest.raises(ValueError, match="not in the metadata"):
        t2.rollback(999999)


def test_delta_restore_mixed_commit_keeps_cdf_replayable(spark, tmp_path):
    path = str(tmp_path / "t")
    create_minimal_table(
        spark, path, _df(spark).repartitionByRange(4, "k"),
        stats=True, cdf=True,
    )
    r = DeltaLogReader(spark, path)
    v0 = r.latest_version()
    # a rewriting delete: the restore will both remove (the rewritten
    # survivor file) and re-add (the originals) -> mixed commit
    r.delete_where([("k", ">=", 500), ("k", "<", 700)])
    v = r.restore(v0)
    assert r.read().count() == 1200
    ch = r.changes(v - 1, v)  # must not refuse
    tags = {x._change_type for x in ch.collect()}
    assert tags == {"insert", "delete"}
    # net effect of the restore feed == rows that came back
    ins = ch.filter("_change_type = 'insert'").count()
    dels = ch.filter("_change_type = 'delete'").count()
    assert ins - dels == 200


def test_iceberg_expire_never_expires_current_after_rollback(
    spark, tmp_path
):
    from introduction_in_big_data_spark.sources.iceberg import (
        IcebergTableReader,
        create_minimal_table as ice_create,
    )

    path = str(tmp_path / "t")
    ice_create(spark, path, _df(spark).select("k", "v"))
    t = IcebergTableReader(spark, path)
    first = t.metadata()["current-snapshot-id"]
    t.delete_where([("k", ">=", 600)])
    IcebergTableReader(spark, path).rollback(first)
    t2 = IcebergTableReader(spark, path)
    t2.expire_snapshots(keep_last=1)
    # the rolled-back-to (current) snapshot must survive expiration
    t3 = IcebergTableReader(spark, path)
    assert t3.read().count() == 1200
    assert t3.metadata()["current-snapshot-id"] == first


def test_delta_restore_refuses_dv_target(spark, tmp_path):
    from introduction_in_big_data_spark.sources.deltalog import (
        commit_deletion_vector,
    )

    path = str(tmp_path / "t")
    create_minimal_table(spark, path, _df(spark).coalesce(1), stats=True)
    r = DeltaLogReader(spark, path)
    rel = next(iter(r._replay(0)[1]))
    commit_deletion_vector(spark, path, rel, [0, 1])  # v1: DV on the file
    # v2: replace the DV'd file with a plain rewrite so CURRENT is plain
    survivors = r.read(1)
    out = str(tmp_path / "plain.parquet")
    survivors.coalesce(1).write.parquet(out)
    import os as _os

    f = next(
        _os.path.join(out, x)
        for x in _os.listdir(out)
        if x.endswith(".parquet")
    )
    dst = _os.path.join(path, "plain-rewrite.parquet")
    _os.rename(f, dst)
    r._publish(
        2,
        [
            {"remove": {"path": rel, "deletionTimestamp": 0,
                        "dataChange": True}},
            {"add": {"path": "plain-rewrite.parquet",
                     "partitionValues": {},
                     "size": _os.path.getsize(dst),
                     "modificationTime": 0, "dataChange": True}},
        ],
    )
    assert r.read().count() == 1198  # current snapshot is plain
    # round 10: a DV-carrying version RESTORES — the republished add
    # carries its vector descriptor wholesale, so the restored state
    # applies the tombstones exactly as the original version did
    r.restore(1)
    assert r.read().count() == 1198
    assert sorted(x.k for x in r.read().collect()) == list(range(2, 1200))
    live = r._replay(r.latest_version())[1]
    assert any(a.get("deletionVector") for a in live.values())
    r.restore(0)  # the plain original restores fine
    assert r.read().count() == 1200
    # ...and restoring BETWEEN DV states of the SAME path flips the
    # vector: identity is (path, dv), not path alone
    r2 = DeltaLogReader(spark, path)
    r2.delete_where_dv([("k", "<", 5)])  # fresh DV on the same file
    assert r2.read().count() == 1195
    r2.restore(1)  # back to the [0,1]-tombstoned state
    assert sorted(x.k for x in r2.read().collect()) == list(
        range(2, 1200)
    )


def test_merge_high_cardinality_partition_key_never_collects_keys(
    spark, tmp_path, monkeypatch
):
    """Above _MERGE_KEY_COLLECT_CAP the partition-key merge routes hit
    detection through a distributed semi-join instead of materializing
    the distinct source keys on the driver (VERDICT r7 item 9: a 100 TB
    partition-key merge can carry millions of keys)."""
    from introduction_in_big_data_spark.sources import deltalog as dl

    path = str(tmp_path / "t")
    create_minimal_table(
        spark, path, _df(spark), partition_by=["p"], stats=True
    )
    # force the distributed path at test scale
    monkeypatch.setattr(dl, "_MERGE_KEY_COLLECT_CAP", 1)
    r = DeltaLogReader(spark, path)
    source = spark.createDataFrame(
        [(10_001, 1, 1.0), (10_002, 1, 2.0), (10_003, 2, 3.0)],
        "k long, p int, v double",
    )
    r.merge(source, "p")
    got = r.read()
    # partitions 1 and 2 fully replaced, 0 untouched
    assert got.filter("p = 1").count() == 2
    assert got.filter("p = 2").count() == 1
    assert got.filter("p = 0").count() == 400
    assert got.count() == 403


def test_dml_retries_serializably_on_commit_conflict(spark, tmp_path):
    """Round 8: a concurrent writer winning the version race no longer
    surfaces as CommitConflict — the declarative DML re-runs against
    the NEW snapshot (the serializable outcome: as if it committed
    after the winner). Simulated by injecting a competing append
    between hit detection and publish."""
    from introduction_in_big_data_spark.sources import deltalog as dl
    from introduction_in_big_data_spark.sources.deltalog import (
        commit_append,
    )

    path = str(tmp_path / "t")
    create_minimal_table(
        spark, path, _df(spark).repartitionByRange(4, "k"), stats=True
    )
    r = DeltaLogReader(spark, path)
    real_publish = dl.DeltaLogReader._publish
    state = {"injected": False}

    def racing_publish(self, version, actions):
        if not state["injected"]:
            state["injected"] = True
            # a concurrent writer appends rows that ALSO match the
            # predicate and steals this version number
            commit_append(
                spark,
                path,
                spark.createDataFrame(
                    [(5000, 2, 5000.0), (6000, 0, 6000.0)],
                    "k long, p int, v double",
                ),
                stats=True,
            )
        return real_publish(self, version, actions)

    import unittest.mock as mock

    with mock.patch.object(
        dl.DeltaLogReader, "_publish", racing_publish
    ):
        r.delete_where([("k", ">=", 1000)])
    got = sorted(x.k for x in DeltaLogReader(spark, path).read().collect())
    # serializable: the delete ran AFTER the append, so the appended
    # k=5000/6000 rows are deleted too
    assert got == list(range(1000))


def test_delta_restore_cdf_renders_dv_flips(spark, tmp_path):
    """Round 10: a CDF-enabled restore whose diff involves deletion
    vectors renders the row-level feed from the bitmap differences —
    restoring PAST a DV delete emits the tombstoned rows as inserts
    (resurrected), restoring back onto the vector emits them as
    deletes (re-tombstoned); untouched rows never appear in the feed."""
    path = str(tmp_path / "t")
    create_minimal_table(
        spark, path, _df(spark).coalesce(1), stats=True, cdf=True
    )
    r = DeltaLogReader(spark, path)
    r.delete_where_dv([("k", "<", 3)])  # v1
    v2 = r.restore(0)  # resurrect rows 0..2 via a vector flip
    assert r.read().count() == 1200
    feed = {
        (x.k, x._change_type)
        for x in r.changes(v2 - 1, v2).select("k", "_change_type").collect()
    }
    assert feed == {(0, "insert"), (1, "insert"), (2, "insert")}
    v3 = r.restore(1)  # re-tombstone them
    assert r.read().count() == 1197
    feed3 = {
        (x.k, x._change_type)
        for x in r.changes(v3 - 1, v3).select("k", "_change_type").collect()
    }
    assert feed3 == {(0, "delete"), (1, "delete"), (2, "delete")}
    # wholly-flipped vectored files render only LIVE rows: replace the
    # DV'd file with a plain rewrite, then restore across it
    r.optimize()  # v4: rewrite retires the vector
    v5 = r.restore(1)  # back to the original file + its vector
    feed5 = sorted(
        (x.k, x._change_type)
        for x in r.changes(v5 - 1, v5).select("k", "_change_type").collect()
    )
    ks = {k for k, _t in feed5}
    assert (0, "insert") not in feed5 and (0, "delete") not in feed5
    assert {t for _k, t in feed5} == {"insert", "delete"}
    assert len([1 for k, t in feed5 if t == "insert"]) == 1197
    assert len([1 for k, t in feed5 if t == "delete"]) == 1197
    assert 0 not in ks and 1 not in ks and 2 not in ks
