"""File skipping from lakehouse metadata (sources/skipping.py + the
predicates= read paths of deltalog.py / iceberg.py).

The contract under test, in order of importance:
1. CORRECTNESS — a pruned read returns exactly the same rows as an
   unpruned read + filter (pruning is conservative; the residual
   filter closes the gap).
2. PRUNING BITES — on range-clustered files, selective predicates
   skip most files (last_scan counters), with zero data IO for the
   skipped ones (driver-side metadata only).
3. CONSERVATISM — missing stats, unknown types, truncated knowledge
   never skip a file that could match.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from introduction_in_big_data_spark.sources import skipping
from introduction_in_big_data_spark.sources.deltalog import (
    DeltaLogReader,
    create_minimal_table as delta_create,
)
from introduction_in_big_data_spark.sources.iceberg import (
    IcebergTableReader,
    _decode_bound,
    _encode_bound,
    add_position_deletes,
    create_minimal_table as ice_create,
)


# -- evaluator unit tests (no Spark) ----------------------------------------


def _sm(op, lit, lo, hi, nulls=0, rows=10):
    return skipping._stats_may_match(op, lit, lo, hi, nulls, rows)


def test_stats_evaluator_range_ops():
    # file holds values in [10, 20]
    assert not _sm("=", 5, 10, 20)
    assert not _sm("=", 25, 10, 20)
    assert _sm("=", 15, 10, 20)
    assert _sm("=", 10, 10, 20)  # boundary
    assert not _sm("<", 10, 10, 20)  # need min < lit
    assert _sm("<=", 10, 10, 20)
    assert not _sm(">", 20, 10, 20)
    assert _sm(">=", 20, 10, 20)
    assert _sm("!=", 15, 10, 20)
    assert not _sm("!=", 7, 7, 7)  # constant file == lit
    assert _sm("!=", 7, 7, 8)
    assert not _sm("in", [1, 2, 30], 10, 20)
    assert _sm("in", [1, 15], 10, 20)
    assert not _sm("in", [], 10, 20)  # empty IN matches nothing


def test_stats_evaluator_nulls_and_unknowns():
    # all-null file: comparisons can't match, isnull can
    assert not _sm("=", 5, None, None, nulls=10, rows=10)
    assert not _sm("notnull", None, None, None, nulls=10, rows=10)
    assert _sm("isnull", None, None, None, nulls=10, rows=10)
    # no nulls -> isnull skippable
    assert not _sm("isnull", None, 1, 2, nulls=0, rows=10)
    # unknown null count -> conservative
    assert _sm("isnull", None, 1, 2, nulls=None, rows=10)
    # missing min/max -> conservative keep
    assert _sm("=", 5, None, None, nulls=0, rows=10)
    # incomparable types -> conservative keep
    assert _sm("=", "abc", 10, 20, nulls=0, rows=10)


def test_exact_partition_evaluator():
    e = skipping._exact_may_match
    assert e(3, "=", 3) and not e(3, "=", 4)
    assert e("b", "in", ["a", "b"]) and not e("c", "in", ["a", "b"])
    assert e(None, "isnull", None) and not e(None, "notnull", None)
    assert not e(None, "=", 3)  # null partition matches no comparison
    assert e(datetime.date(2020, 1, 2), ">", datetime.date(2020, 1, 1))
    assert e(datetime.date(2020, 1, 2), "=", "2020-01-02")  # ISO strings


def test_validate_rejects_unknown_columns_and_ops():
    with pytest.raises(ValueError, match="not in table schema"):
        skipping.validate([("nope", "=", 1)], ["a", "b"])
    with pytest.raises(ValueError, match="unknown predicate op"):
        skipping.validate([("a", "~", 1)], ["a"])


def test_iceberg_bound_codec_roundtrip():
    cases = [
        (42, "int"),
        (-7, "int"),
        (1 << 40, "long"),
        (2.5, "float"),
        (-1.25e100, "double"),
        (True, "boolean"),
        (False, "boolean"),
        (datetime.date(1995, 3, 1), "date"),
        ("héllo", "string"),
    ]
    for v, t in cases:
        assert _decode_bound(_encode_bound(v, t), t) == v
    # unsupported / malformed decode conservatively to None
    assert _encode_bound(b"\x00", "binary") is None
    assert _decode_bound(b"\x01\x02", "long") is None
    assert _decode_bound(None, "int") is None


# -- Delta end-to-end -------------------------------------------------------


def _clustered_df(spark):
    return spark.range(0, 1000).select(
        F.col("id").alias("k"),
        (F.col("id") % 4).cast("int").alias("p"),
        F.date_add(
            F.lit(datetime.date(1995, 1, 1)), F.col("id").cast("int")
        ).alias("d"),
        (F.col("id") * 1.5).alias("v"),
    )


def test_delta_stats_skipping_prunes_and_matches(spark, tmp_path):
    path = str(tmp_path / "t")
    delta_create(
        spark, path, _clustered_df(spark).repartitionByRange(8, "k"),
        stats=True,
    )
    r = DeltaLogReader(spark, path)
    pruned = r.read(predicates=[("k", ">=", 900)])
    assert r.last_scan["candidate_files"] == 8
    assert r.last_scan["scanned_files"] == 1
    full = r.read().filter(F.col("k") >= 900)
    assert sorted(x.k for x in pruned.collect()) == sorted(
        x.k for x in full.collect()
    )
    # residual filter still applies INSIDE the surviving file
    mid = r.read(predicates=[("k", ">=", 990), ("v", "<", 1490.0)])
    assert r.last_scan["scanned_files"] == 1
    assert sorted(x.k for x in mid.collect()) == list(range(990, 994))


def test_delta_date_stats_skip(spark, tmp_path):
    path = str(tmp_path / "t")
    delta_create(
        spark, path, _clustered_df(spark).repartitionByRange(8, "k"),
        stats=True,
    )
    r = DeltaLogReader(spark, path)
    out = r.read(predicates=[("d", "<", datetime.date(1995, 2, 1))])
    assert r.last_scan["skipped_files"] == 7
    assert out.count() == 31


def test_delta_partition_pruning_composes_with_stats(spark, tmp_path):
    path = str(tmp_path / "t")
    delta_create(
        spark, path, _clustered_df(spark), partition_by=["p"], stats=True
    )
    r = DeltaLogReader(spark, path)
    out = r.read(predicates=[("p", "in", [1, 3]), ("k", "<", 500)])
    assert out.count() == 250
    info = r.last_scan
    assert info["scanned_files"] < info["candidate_files"]
    # partition dims prune exactly: only p in {1,3} file groups survive
    vals = {x.p for x in out.select("p").distinct().collect()}
    assert vals == {1, 3}


def test_delta_null_partition_pruning(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "b"), (4, None)], "k long, g string"
    )
    delta_create(spark, path, df, partition_by=["g"])
    r = DeltaLogReader(spark, path)
    out = r.read(predicates=[("g", "isnull", None)])
    assert sorted(x.k for x in out.collect()) == [2, 4]
    assert r.last_scan["scanned_files"] < r.last_scan["candidate_files"]
    out2 = r.read(predicates=[("g", "=", "a")])
    assert [x.k for x in out2.collect()] == [1]


def test_delta_without_stats_scans_everything_but_filters(spark, tmp_path):
    path = str(tmp_path / "t")
    delta_create(
        spark, path, _clustered_df(spark).repartitionByRange(4, "k"),
        stats=False,
    )
    r = DeltaLogReader(spark, path)
    out = r.read(predicates=[("k", ">=", 990)])
    assert r.last_scan["skipped_files"] == 0  # conservative: no stats
    assert out.count() == 10  # but the filter still applied


def test_delta_unknown_predicate_column_raises(spark, tmp_path):
    path = str(tmp_path / "t")
    delta_create(spark, path, _clustered_df(spark).limit(10))
    with pytest.raises(ValueError, match="not in table schema"):
        DeltaLogReader(spark, path).read(predicates=[("nope", "=", 1)])


# -- Iceberg end-to-end -----------------------------------------------------


def test_iceberg_bounds_skipping_prunes_and_matches(spark, tmp_path):
    path = str(tmp_path / "t")
    ice_create(
        spark, path, _clustered_df(spark).repartitionByRange(8, "k"),
        bounds=True,
    )
    t = IcebergTableReader(spark, path)
    pruned = t.read(predicates=[("k", ">=", 900)])
    assert t.last_scan == {
        "candidate_files": 8,
        "scanned_files": 1,
        "skipped_files": 7,
        "skipped_manifests": 0,
    }
    full = t.read().filter(F.col("k") >= 900)
    assert sorted(x.k for x in pruned.collect()) == sorted(
        x.k for x in full.collect()
    )


def test_iceberg_date_and_double_bounds(spark, tmp_path):
    path = str(tmp_path / "t")
    ice_create(
        spark, path, _clustered_df(spark).repartitionByRange(8, "k"),
        bounds=True,
    )
    t = IcebergTableReader(spark, path)
    out = t.read(
        predicates=[
            ("d", "=", datetime.date(1995, 3, 1)),
            ("v", "<", 1e6),
        ]
    )
    assert t.last_scan["scanned_files"] == 1
    assert out.count() == 1


def test_iceberg_without_bounds_scans_everything(spark, tmp_path):
    path = str(tmp_path / "t")
    ice_create(
        spark, path, _clustered_df(spark).repartitionByRange(4, "k"),
        bounds=False,
    )
    t = IcebergTableReader(spark, path)
    out = t.read(predicates=[("k", ">=", 990)])
    assert t.last_scan["skipped_files"] == 0
    assert out.count() == 10


def test_iceberg_skipping_composes_with_position_deletes(spark, tmp_path):
    import os

    path = str(tmp_path / "t")
    ice_create(
        spark,
        path,
        _clustered_df(spark)
        .repartitionByRange(4, "k")
        .sortWithinPartitions("k"),
        bounds=True,
    )
    data_dir = os.path.join(path, "data")
    files = sorted(
        os.path.join(data_dir, f)
        for f in os.listdir(data_dir)
        if f.endswith(".parquet")
    )
    # tombstone the first 5 positions of every file, then prune on k
    add_position_deletes(
        spark, path, [(f, i) for f in files for i in range(5)]
    )
    t = IcebergTableReader(spark, path)
    pruned = t.read(predicates=[("k", ">=", 900)])
    full = t.read().filter(F.col("k") >= 900)
    assert t.last_scan["candidate_files"] == 4
    assert sorted(x.k for x in pruned.collect()) == sorted(
        x.k for x in full.collect()
    )
    # deletes apply inside the surviving files too
    assert pruned.count() < 100 or full.count() == pruned.count()


# -- AcidTable native stats -------------------------------------------------


def test_acid_stats_maintained_across_commits(spark, tmp_path):
    from introduction_in_big_data_spark.sources.acidtable import AcidTable

    df = spark.range(0, 4000).select(
        F.col("id").alias("x"),
        ((F.col("id") * 37) % 4000).alias("y"),
        (F.col("id") % 7).alias("g"),
    )
    path = str(tmp_path / "t")
    t = AcidTable.create(
        spark, path, df.filter("x < 2000").repartitionByRange(4, "x"),
        stats=True,
    )
    t.append(df.filter("x >= 2000").repartitionByRange(4, "x"))
    out = t.read(predicates=[("x", ">=", 3500)])
    info = t.last_scan
    # range sampling can land the 3500 boundary inside one file or on
    # its edge — what must hold is that most files prune and the
    # result is exact
    assert info["candidate_files"] == 8
    assert info["scanned_files"] <= 2
    assert out.count() == 500
    # merge rewrites some files; stats must cover the whole new set
    ups = df.filter("x % 100 = 0").select(
        "x", (F.col("y") + 1).alias("y"), "g"
    )
    t.merge(ups, "x")
    m = t._manifest(t.latest_version())
    assert set(m["files"]) == set(m["stats"])
    # and reads stay exact after the merge
    got = t.read(predicates=[("x", "<", 300)])
    want = t.read().filter("x < 300")
    assert sorted((r.x, r.y) for r in got.collect()) == sorted(
        (r.x, r.y) for r in want.collect()
    )


def test_acid_zorder_makes_box_predicates_prune(spark, tmp_path):
    from introduction_in_big_data_spark.sources.acidtable import AcidTable

    df = spark.range(0, 4000).select(
        F.col("id").alias("x"), ((F.col("id") * 37) % 4000).alias("y")
    )
    path = str(tmp_path / "t")
    t = AcidTable.create(
        spark, path, df.repartitionByRange(8, "x"), stats=True
    )
    t.optimize(target_bytes=12 << 10, zorder_by=("x", "y"))
    out = t.read(predicates=[("x", "<", 500), ("y", "<", 500)])
    info = t.last_scan
    full = t.read().filter("x < 500 AND y < 500")
    assert sorted((r.x, r.y) for r in out.collect()) == sorted(
        (r.x, r.y) for r in full.collect()
    )
    # the z-curve bounds both dimensions per file -> the box predicate
    # must prune (x-only clustering could never skip on y)
    assert info["skipped_files"] > 0


def test_acid_default_table_has_no_stats_but_exact_reads(spark, tmp_path):
    from introduction_in_big_data_spark.sources.acidtable import AcidTable

    df = spark.range(0, 100).select(F.col("id").alias("x"))
    path = str(tmp_path / "t")
    t = AcidTable.create(spark, path, df.repartition(4))
    assert "stats" not in t._manifest(0)
    out = t.read(predicates=[("x", "<", 10)])
    assert t.last_scan["skipped_files"] == 0
    assert out.count() == 10


def test_acid_add_column_keeps_old_stats_conservative(spark, tmp_path):
    from introduction_in_big_data_spark.sources.acidtable import AcidTable

    df = spark.range(0, 100).select(F.col("id").alias("x"))
    path = str(tmp_path / "t")
    t = AcidTable.create(spark, path, df.repartitionByRange(4, "x"), stats=True)
    t.add_column("tag", "string")
    # predicate on the evolved column: old files lack stats for it ->
    # every file scans, rows project typed NULLs, result exact
    out = t.read(predicates=[("tag", "isnull", None)])
    assert out.count() == 100
    assert t.last_scan["skipped_files"] == 0
