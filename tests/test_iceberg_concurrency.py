"""Iceberg multi-writer commit concurrency (VERDICT r5 item 5 / r6
item 6): `_publish_metadata` exclusive-creates `v{N+1}.metadata.json`
(os.link — atomic, fails on existing name) relative to the BASE
version the writer's metadata read resolved, so of two racing writers
exactly one wins and the loser gets `CommitConflict` instead of
silently overwriting (the spec's optimistic-commit contract; same
mechanism as acidtable/Delta's exclusive commit publish)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from introduction_in_big_data_spark.sources.acidtable import CommitConflict
from introduction_in_big_data_spark.sources.iceberg import (
    IcebergTableReader,
    append_data_snapshot,
    create_minimal_table,
)


def _stage(spark, tmp_path, name):
    path = str(tmp_path / name)
    create_minimal_table(
        spark,
        path,
        spark.createDataFrame([(1, 10), (2, 20)], "k long, v long").coalesce(1),
    )
    return path


def test_losing_writer_gets_commit_conflict(spark, tmp_path):
    path = _stage(spark, tmp_path, "race")
    # writer A resolves its base, builds its commit...
    a = IcebergTableReader(spark, path)
    meta_a, base_a = a._meta_and_base()
    # ...writer B publishes first (a full snapshot commit)
    append_data_snapshot(
        spark, path, spark.createDataFrame([(3, 30)], "k long, v long"), 1
    )
    # writer A's publish of base+1 must now CONFLICT, not overwrite
    from introduction_in_big_data_spark.sources.iceberg import (
        _publish_metadata,
    )

    with pytest.raises(CommitConflict, match="concurrently"):
        _publish_metadata(path, dict(meta_a), base_a)
    # B's commit is intact; no loser temp files linger
    assert IcebergTableReader(spark, path).read().count() == 3
    meta_dir = os.path.join(path, "metadata")
    assert not [f for f in os.listdir(meta_dir) if f.endswith(".tmp")]


def test_loser_retry_after_reread_succeeds(spark, tmp_path):
    """The contract's second half: after CommitConflict the loser
    re-reads and re-applies — a rollback racing an append retries
    cleanly."""
    path = _stage(spark, tmp_path, "retry")
    t = IcebergTableReader(spark, path)
    snap0 = t.metadata()["current-snapshot-id"]
    append_data_snapshot(
        spark, path, spark.createDataFrame([(3, 30)], "k long, v long"), 1
    )
    # fresh reader, fresh base: rollback commits on top of the append
    t2 = IcebergTableReader(spark, path)
    t2.rollback(snap0)
    assert IcebergTableReader(spark, path).read().count() == 2


def test_stale_hint_does_not_wedge_readers_or_writers(spark, tmp_path):
    """A publisher that crashes between the exclusive metadata create
    and the hint write leaves a stale hint: readers must still resolve
    the newest metadata (directory numeric max), and the next writer
    must commit relative to it instead of conflicting forever."""
    path = _stage(spark, tmp_path, "stalehint")
    append_data_snapshot(
        spark, path, spark.createDataFrame([(3, 30)], "k long, v long"), 1
    )
    meta_dir = os.path.join(path, "metadata")
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as fh:
        fh.write("1")  # simulate the crash: hint points one behind

    t = IcebergTableReader(spark, path)
    assert t._metadata_version() == 2  # reader sees the real newest
    assert t.read().count() == 3
    append_data_snapshot(  # writer commits v3 on top, no wedge
        spark, path, spark.createDataFrame([(4, 40)], "k long, v long"), 2
    )
    assert IcebergTableReader(spark, path).read().count() == 4
