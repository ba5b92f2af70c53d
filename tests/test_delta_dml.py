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


def test_dml_refuses_column_mapped_tables(spark, tmp_path):
    path = str(tmp_path / "t")
    create_column_mapped_table(spark, path, _df(spark))
    r = DeltaLogReader(spark, path)
    with pytest.raises(UnsupportedDeltaFeature, match="column-mapped"):
        r.delete_where([("k", "=", 1)])
    with pytest.raises(UnsupportedDeltaFeature, match="column-mapped"):
        r.optimize()


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


def test_iceberg_delete_where_refuses_equality_deletes(spark, tmp_path):
    from introduction_in_big_data_spark.sources.iceberg import (
        IcebergTableReader,
        UnsupportedIcebergFeature,
        add_equality_deletes,
        create_minimal_table as ice_create,
    )

    path = str(tmp_path / "t")
    ice_create(spark, path, _df(spark).select("k"))
    add_equality_deletes(spark, path, [(5,)], ["k"], 1)
    with pytest.raises(UnsupportedIcebergFeature, match="equality"):
        IcebergTableReader(spark, path).delete_where([("k", "=", 1)])
