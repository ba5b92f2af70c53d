"""Delta SHALLOW CLONE: zero-copy table copies whose v0 adds point at
the source's files by absolute path — snapshot isolation both ways,
stats carry-over, and vacuum safety (a clone can never physically
touch the source).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from introduction_in_big_data_spark.sources.deltalog import (
    DeltaLogReader,
    UnsupportedDeltaFeature,
    create_column_mapped_table,
    create_minimal_table,
    shallow_clone,
)


def _stage(spark, tmp_path, name="src", stats=True):
    path = str(tmp_path / name)
    df = spark.createDataFrame(
        [(i, i % 5, float(i)) for i in range(100)],
        "k long, grp long, val double",
    ).repartitionByRange(4, "k")
    create_minimal_table(spark, path, df, stats=stats)
    return path


def test_clone_reads_source_snapshot_zero_copy(spark, tmp_path):
    src = _stage(spark, tmp_path)
    dst = str(tmp_path / "clone")
    assert shallow_clone(spark, src, dst) == 0
    clone = DeltaLogReader(spark, dst)
    assert clone.read().count() == 100
    # zero copy: the clone dir holds ONLY the log
    files = [
        f
        for _r, _d, fs in os.walk(dst)
        for f in fs
        if f.endswith(".parquet")
    ]
    assert files == []
    # stats carried: skipping works immediately on the clone
    pruned = clone.read(predicates=[("k", ">=", 90)])
    assert pruned.count() == 10
    assert clone.last_scan["skipped_files"] > 0


def test_clone_isolation_both_directions(spark, tmp_path):
    src = _stage(spark, tmp_path)
    dst = str(tmp_path / "clone")
    shallow_clone(spark, src, dst)
    # source evolves after the clone: clone still sees the snapshot
    DeltaLogReader(spark, src).delete_where([("grp", "=", 0)])
    assert DeltaLogReader(spark, src).read().count() == 80
    assert DeltaLogReader(spark, dst).read().count() == 100
    # clone evolves: source untouched
    DeltaLogReader(spark, dst).delete_where([("grp", "=", 1)])
    assert DeltaLogReader(spark, dst).read().count() == 80
    assert DeltaLogReader(spark, src).read().count() == 80  # unchanged


def test_clone_vacuum_never_touches_source_files(spark, tmp_path):
    src = _stage(spark, tmp_path)
    dst = str(tmp_path / "clone")
    shallow_clone(spark, src, dst)
    clone = DeltaLogReader(spark, dst)
    # rewrite everything on the clone (logically removes shared files)
    clone.delete_where([("grp", ">=", 0)])
    deleted = DeltaLogReader(spark, dst).vacuum(keep_last=1)
    # vacuum reclaimed nothing outside the clone root
    assert all(p.startswith(os.path.realpath(dst)) for p in deleted)
    # the source is fully intact
    assert DeltaLogReader(spark, src).read().count() == 100


def test_clone_refuses_unsupported_sources(spark, tmp_path):
    path = str(tmp_path / "mapped")
    create_column_mapped_table(
        spark,
        path,
        spark.createDataFrame([(1, "a")], "k long, tag string").coalesce(1),
    )
    with pytest.raises(UnsupportedDeltaFeature, match="column-mapped"):
        shallow_clone(spark, path, str(tmp_path / "c1"))
