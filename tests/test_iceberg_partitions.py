"""Iceberg PARTITION TRANSFORMS: spec bucket hash golden values,
partition-domain pruning math, partitioned write/read round-trips, and
partition-SPEC evolution (each file pruned under the spec it was
written with).

Reference parity: the reference has no partitioning (whole-file CSV
reads, Part_A_Q1.py:21); this is beyond-reference lakehouse surface.
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pytest
from pyspark.sql import functions as F

from introduction_in_big_data_spark.sources import iceberg_partitions as IP
from introduction_in_big_data_spark.sources.iceberg import (
    IcebergTableReader,
    append_partitioned_snapshot,
    create_partitioned_table,
)


# ---------------------------------------------------------------- hash


def test_murmur3_spec_golden_values():
    """The spec's own Appendix-B hash table pins the bucket function:
    any deviation silently scatters rows into wrong buckets."""
    assert IP.murmur3_x86_32((34).to_bytes(8, "little", signed=True)) == 2017239379
    assert IP.murmur3_x86_32(b"iceberg") == 1210000089
    days = (dt.date(2017, 11, 16) - dt.date(1970, 1, 1)).days
    assert IP.murmur3_x86_32(days.to_bytes(8, "little", signed=True)) == -653330422


def test_murmur3_vectorized_matches_scalar():
    vals = np.array([0, 1, -1, 34, 2**40, -(2**40), 17486], dtype=np.int64)
    vec = IP._murmur3_long_vec(vals)
    for v, h in zip(vals.tolist(), vec.tolist()):
        assert h == IP.murmur3_x86_32(int(v).to_bytes(8, "little", signed=True))


def test_bucket_of_types():
    assert IP.bucket_of(34, 16) == (2017239379 & 0x7FFFFFFF) % 16
    assert IP.bucket_of("iceberg", 16) == (1210000089 & 0x7FFFFFFF) % 16
    assert IP.bucket_of(dt.date(2017, 11, 16), 8) == (
        (-653330422 & 0x7FFFFFFF) % 8
    )
    assert IP.bucket_of(None, 8) is None


# ------------------------------------------------------------- pruning


def _pf(transform, src_t="long", name="p"):
    fields = [{"id": 1, "name": "c", "type": src_t}]
    return IP.parse_spec([("c", transform)], fields)[0]


def test_identity_pruning_exact():
    pf = _pf("identity")
    assert IP.partition_may_match(pf, 5, "=", 5)
    assert not IP.partition_may_match(pf, 5, "=", 6)
    assert IP.partition_may_match(pf, 5, "<", 6)
    assert not IP.partition_may_match(pf, 5, "<", 5)
    assert IP.partition_may_match(pf, 5, "in", [1, 5])
    assert not IP.partition_may_match(pf, 5, "in", [1, 2])


def test_order_preserving_ranges_are_inclusive():
    """day(col): rows strictly below the literal can share its
    transformed value, so `<` keeps pv == T(lit)."""
    pf = _pf("day", src_t="date")
    d = dt.date(2020, 6, 15)
    tl = (d - dt.date(1970, 1, 1)).days
    assert IP.partition_may_match(pf, tl, "<", d)  # same-day rows may be <
    assert not IP.partition_may_match(pf, tl + 1, "<", d)
    assert IP.partition_may_match(pf, tl - 1, "<", d)
    assert IP.partition_may_match(pf, tl, "=", d)
    assert not IP.partition_may_match(pf, tl - 1, "=", d)
    assert IP.partition_may_match(pf, tl, ">=", d)
    assert not IP.partition_may_match(pf, tl - 1, ">", d)
    # != can never prune through a many-to-one transform
    assert IP.partition_may_match(pf, tl, "!=", d)


def test_month_year_truncate_literals():
    assert IP.transform_literal(_pf("month", "date"), dt.date(1970, 2, 1)) == 1
    assert IP.transform_literal(_pf("year", "date"), dt.date(1969, 6, 1)) == -1
    assert IP.transform_literal(_pf("truncate[10]"), -1) == -10  # floors
    assert IP.transform_literal(_pf("truncate[10]"), 19) == 10
    assert (
        IP.transform_literal(_pf("truncate[3]", "string"), "iceberg") == "ice"
    )


def test_bucket_prunes_equality_only():
    pf = _pf("bucket[16]")
    b34 = IP.bucket_of(34, 16)
    assert IP.partition_may_match(pf, b34, "=", 34)
    assert not IP.partition_may_match(pf, (b34 + 1) % 16, "=", 34)
    # ranges keep every file through a hash
    assert IP.partition_may_match(pf, 0, "<", 34)
    assert IP.partition_may_match(pf, 0, ">=", 34)


def test_null_partition_semantics():
    pf = _pf("day", src_t="date")
    assert IP.partition_may_match(pf, None, "isnull", None)
    assert not IP.partition_may_match(pf, None, "=", dt.date(2020, 1, 1))
    assert not IP.partition_may_match(pf, None, "notnull", None)
    assert IP.partition_may_match(pf, 5, "notnull", None)
    assert not IP.partition_may_match(pf, 5, "isnull", None)


def test_parse_spec_rejects_bad_combos():
    fields = [{"id": 1, "name": "c", "type": "double"}]
    with pytest.raises(ValueError):
        IP.parse_spec([("c", "bucket[8]")], fields)
    with pytest.raises(ValueError):
        IP.parse_spec([("missing", "identity")], fields)
    with pytest.raises(ValueError):
        IP.parse_spec([("c", "hour")], fields)


# --------------------------------------------------------- end-to-end


def _orders(spark, sf_dir):
    return (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            "o_totalprice",
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
        )
    )


def test_partitioned_roundtrip_and_pruning(spark, sf_dir, tmp_path):
    base = _orders(spark, sf_dir)
    path = str(tmp_path / "t1")
    create_partitioned_table(
        spark,
        path,
        base,
        spec=[("o_orderstatus", "identity"), ("o_orderdate", "year")],
    )
    t = IcebergTableReader(spark, path)
    # no predicates: full contents survive the partitioned staging
    assert t.read().count() == base.count()
    cut = dt.date(1997, 1, 1)
    snap = t.read(
        predicates=[("o_orderstatus", "=", "F"), ("o_orderdate", "<", cut)]
    )
    exp = base.filter(
        (F.col("o_orderstatus") == "F") & (F.col("o_orderdate") < F.lit(cut))
    )
    assert snap.count() == exp.count()
    assert snap.agg(F.sum("o_totalprice")).collect()[0][0] == pytest.approx(
        exp.agg(F.sum("o_totalprice")).collect()[0][0]
    )
    # identity x year: only the F-status years below the cut scan
    assert t.last_scan["skipped_files"] > 0
    assert t.last_scan["scanned_files"] < t.last_scan["candidate_files"]


def test_bucket_pruning_scans_only_matching_buckets(spark, sf_dir, tmp_path):
    base = _orders(spark, sf_dir)
    path = str(tmp_path / "t2")
    create_partitioned_table(spark, path, base, spec=[("o_custkey", "bucket[8]")])
    t = IcebergTableReader(spark, path)
    keys = [7, 22, 100]
    snap = t.read(predicates=[("o_custkey", "in", keys)])
    exp = base.filter(F.col("o_custkey").isin(keys))
    assert snap.count() == exp.count()
    want_buckets = {IP.bucket_of(k, 8) for k in keys}
    # at most one file per wanted bucket survives pruning here (one
    # staging task per input partition count, small data)
    assert t.last_scan["scanned_files"] <= len(want_buckets) * 4
    assert t.last_scan["skipped_files"] > 0


def test_string_truncate_partition(spark, sf_dir, tmp_path):
    part = spark.read.parquet(f"{sf_dir}/part.parquet").select(
        "p_partkey", "p_brand", "p_retailprice"
    )
    path = str(tmp_path / "t3")
    create_partitioned_table(
        spark, path, part, spec=[("p_brand", "truncate[7]")]
    )
    t = IcebergTableReader(spark, path)
    snap = t.read(predicates=[("p_brand", "=", "Brand#23")])
    assert snap.count() == part.filter(F.col("p_brand") == "Brand#23").count()
    assert t.last_scan["skipped_files"] > 0


def test_partition_spec_evolution_mixed_pruning(spark, sf_dir, tmp_path):
    """Files written under spec 0 (year) and spec 1 (month + bucket)
    coexist; a date predicate prunes each file under ITS OWN spec and
    the union result is exact."""
    base = _orders(spark, sf_dir)
    old = base.filter(F.col("o_orderkey") % 2 == 0)
    new = base.filter(F.col("o_orderkey") % 2 == 1)
    path = str(tmp_path / "t4")
    create_partitioned_table(spark, path, old, spec=[("o_orderdate", "year")])
    append_partitioned_snapshot(
        spark,
        path,
        new,
        spec=[("o_orderdate", "month"), ("o_custkey", "bucket[8]")],
    )
    t = IcebergTableReader(spark, path)
    meta = t.metadata()
    assert [s["spec-id"] for s in meta["partition-specs"]] == [0, 1]
    assert meta["default-spec-id"] == 1
    cut = dt.date(1999, 1, 1)
    snap = t.read(predicates=[("o_orderdate", ">=", cut)])
    exp = base.filter(F.col("o_orderdate") >= F.lit(cut))
    assert snap.count() == exp.count()
    assert t.last_scan["skipped_files"] > 0
    # full read still exact across specs
    assert t.read().count() == base.count()


def test_append_same_spec_reuses_spec_id(spark, sf_dir, tmp_path):
    base = _orders(spark, sf_dir)
    path = str(tmp_path / "t5")
    create_partitioned_table(spark, path, base, spec=[("o_orderdate", "year")])
    append_partitioned_snapshot(
        spark,
        path,
        base.withColumn("o_orderkey", F.col("o_orderkey") + 10_000_000),
        spec=[("o_orderdate", "year")],
    )
    t = IcebergTableReader(spark, path)
    assert len(t.metadata()["partition-specs"]) == 1
    assert t.read().count() == 2 * base.count()


def test_null_partition_value_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "b")], "k long, tag string"
    )
    path = str(tmp_path / "t6")
    create_partitioned_table(spark, path, df, spec=[("tag", "identity")])
    t = IcebergTableReader(spark, path)
    assert t.read().count() == 3
    snap = t.read(predicates=[("tag", "isnull", None)])
    assert [r.k for r in snap.collect()] == [2]
    assert t.last_scan["skipped_files"] > 0
    snap = t.read(predicates=[("tag", "=", "a")])
    assert [r.k for r in snap.collect()] == [1]


def test_manifest_list_summary_prunes_whole_manifests(spark, sf_dir, tmp_path):
    """field_summary pruning (spec "Manifest Lists"): the early-years
    manifest is skipped WITHOUT being opened when the predicate only
    touches the later years — the first pruning tier at 100 TB."""
    base = _orders(spark, sf_dir)
    split = dt.date(1998, 1, 1)
    path = str(tmp_path / "tm")
    create_partitioned_table(
        spark,
        path,
        base.filter(F.col("o_orderdate") < F.lit(split)),
        spec=[("o_orderdate", "year")],
    )
    append_partitioned_snapshot(
        spark,
        path,
        base.filter(F.col("o_orderdate") >= F.lit(split)),
        spec=[("o_orderdate", "year")],
    )
    t = IcebergTableReader(spark, path)
    cut = dt.date(1999, 1, 1)
    snap = t.read(predicates=[("o_orderdate", ">=", cut)])
    assert snap.count() == base.filter(F.col("o_orderdate") >= F.lit(cut)).count()
    assert t.last_scan["skipped_manifests"] == 1
    # equality probe into the OLD manifest: new one skipped instead
    d = dt.date(1996, 6, 1)
    t.read(predicates=[("o_orderdate", "=", d)])
    assert t.last_scan["skipped_manifests"] == 1
    # no-predicate read touches everything and resets the counter
    assert t.read().count() == base.count()
    assert t.last_scan["skipped_manifests"] == 0


def test_summary_may_match_table():
    pf = _pf("year", src_t="date")
    d98 = dt.date(1998, 6, 1)  # year transform value 28
    assert IP.summary_may_match(pf, 25, 27, False, "=", d98) is False
    assert IP.summary_may_match(pf, 25, 28, False, "=", d98) is True
    assert IP.summary_may_match(pf, 29, 30, False, "<", d98) is False
    assert IP.summary_may_match(pf, 28, 30, False, "<", d98) is True
    assert IP.summary_may_match(pf, 25, 27, False, ">", d98) is False
    assert IP.summary_may_match(pf, 25, 28, False, ">", d98) is True
    assert IP.summary_may_match(pf, 25, 27, False, "!=", d98) is True
    assert IP.summary_may_match(pf, 25, 27, True, "isnull", None) is True
    assert IP.summary_may_match(pf, 25, 27, False, "isnull", None) is False
    assert IP.summary_may_match(pf, None, None, False, "isnull", None) is True
    # bucket: equality prunes, ranges never
    pb = _pf("bucket[16]")
    b = IP.bucket_of(34, 16)
    assert IP.summary_may_match(pb, b, b, False, "=", 34) is True
    assert IP.summary_may_match(pb, b + 1, b + 2, False, "=", 34) is False
    assert IP.summary_may_match(pb, b + 1, b + 2, False, "<", 34) is True


def test_position_delete_commit_on_partitioned_table(spark, sf_dir, tmp_path):
    """A spec-unaware commit path (merge-on-read DELETE) must append
    to the partitioned manifest list — whose schema carries the
    `partitions` field — without corrupting it."""
    base = _orders(spark, sf_dir)
    path = str(tmp_path / "tp")
    create_partitioned_table(spark, path, base, spec=[("o_orderdate", "year")])
    t = IcebergTableReader(spark, path)
    new_snap = t.delete_where([("o_orderstatus", "=", "F")])
    assert new_snap == 2  # delete snapshot committed
    n_del = base.filter(F.col("o_orderstatus") == "F").count()
    t2 = IcebergTableReader(spark, path)
    assert t2.read().count() == base.count() - n_del
    # partition pruning still works after the delete snapshot
    cut = dt.date(1999, 1, 1)
    snap = t2.read(predicates=[("o_orderdate", ">=", cut)])
    exp = base.filter(
        (F.col("o_orderdate") >= F.lit(cut)) & (F.col("o_orderstatus") != "F")
    )
    assert snap.count() == exp.count()
    assert t2.last_scan["skipped_files"] > 0


def test_hour_transform_on_timestamps(spark, sf_dir, tmp_path):
    """hour(ts) partitioning on a timestamp column: partition values
    are UTC epoch-hours (session-TZ independent), tz-aware literals
    prune, naive literals conservatively keep every file — all under a
    NON-UTC session time zone."""
    from introduction_in_big_data_spark.sources.tables import load_table

    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts"
    )
    path = str(tmp_path / "th")
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "Asia/Kathmandu")
    try:
        create_partitioned_table(spark, path, events, spec=[("ts", "hour")])
        t = IcebergTableReader(spark, path)
        assert t.read().count() == events.count()
        lo, hi = events.agg(F.min("ts"), F.max("ts")).collect()[0]
        mid = lo + (hi - lo) / 2
        aware = mid.replace(tzinfo=dt.timezone.utc)  # ts epochs are UTC
        snap = t.read(predicates=[("ts", ">=", aware)])
        exp = events.filter(F.col("ts") >= F.lit(aware))
        assert snap.count() == exp.count()
        assert t.last_scan["skipped_files"] > 0
        # a NAIVE literal cannot prune (session-TZ ambiguity) but the
        # residual filter still applies it — same rows, zero skips
        naive = t.read(predicates=[("ts", ">=", mid)])
        assert naive.count() == events.filter(F.col("ts") >= F.lit(mid)).count()
        assert t.last_scan["skipped_files"] == 0
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_hour_partition_values_are_utc_epoch_hours(spark, sf_dir, tmp_path):
    """The staged hour partition values equal epoch//3600 regardless of
    the session time zone that staged the table."""
    import json as _json
    import glob as _glob

    from introduction_in_big_data_spark.functions import avrocodec
    from introduction_in_big_data_spark.sources.tables import load_table

    events = load_table(spark, sf_dir, "events").select("event_id", "ts").limit(50)
    rows = {r["event_id"]: r["ts"] for r in events.collect()}
    path = str(tmp_path / "tu")
    create_partitioned_table(spark, path, events, spec=[("ts", "hour")])
    t = IcebergTableReader(spark, path)
    meta = t.metadata()
    snap = next(s for s in meta["snapshots"])
    _s, manifests = avrocodec.read_container(
        snap["manifest-list"].removeprefix("file://")
    )
    hours = set()
    for m in manifests:
        _es, entries = avrocodec.read_container(
            m["manifest_path"].removeprefix("file://")
        )
        for e in entries:
            hours.add(e["data_file"]["partition"]["ts_hour"])
    exp_hours = {
        int(ts.replace(tzinfo=dt.timezone.utc).timestamp()) // 3600
        for ts in rows.values()
    }
    assert hours == exp_hours


def test_metadata_tables(spark, sf_dir, tmp_path):
    """files/snapshots/partitions metadata tables: counts reconcile
    with the data, partition strings are canonical, snapshot history
    grows with appends."""
    base = _orders(spark, sf_dir).repartition(4, F.year("o_orderdate"))
    path = str(tmp_path / "tmeta")
    create_partitioned_table(spark, path, base, spec=[("o_orderdate", "year")])
    append_partitioned_snapshot(
        spark,
        path,
        base.withColumn("o_orderkey", F.col("o_orderkey") + 10_000_000),
        spec=[("o_orderdate", "year")],
    )
    t = IcebergTableReader(spark, path)

    snaps = t.snapshots_table().collect()
    assert [r.snapshot_id for r in snaps] == [1, 2]
    assert all(r.operation == "append" for r in snaps)

    f = t.files_table()
    assert f.agg(F.sum("record_count")).collect()[0][0] == 2 * base.count()
    assert f.filter(F.col("file_size_in_bytes") <= 0).count() == 0
    assert f.filter(~F.col("partition").rlike(r"^o_orderdate_year=-?\d+$")).count() == 0

    # time travel: snapshot 1 sees only the first half's files
    f1 = t.files_table(snapshot_id=1)
    assert f1.agg(F.sum("record_count")).collect()[0][0] == base.count()

    p = t.partitions_table()
    rows = {r.partition: r for r in p.collect()}
    years = {r[0].year - 1970 for r in base.select("o_orderdate").distinct().collect()}
    assert set(rows) == {f"o_orderdate_year={y}" for y in years}
    # both appends repartitioned by year -> 2 files per partition
    assert all(r.file_count == 2 for r in rows.values())
    per_year = {
        r[0]: r[1] * 2
        for r in base.groupBy(
            (F.year("o_orderdate") - 1970).alias("y")
        )
        .count()
        .collect()
    }
    assert {int(k.split("=")[1]): r.record_count for k, r in rows.items()} == per_year


def test_compact_preserves_partitioning(spark, sf_dir, tmp_path):
    """compact() on a partitioned table rewrites WITHIN partitions:
    deletes fold in, files bin-pack to one per partition, and the
    REPLACE manifest keeps partition tuples + field summaries — so
    pruning still works after compaction. Old-spec files rewrite into
    the current default spec."""
    base = _orders(spark, sf_dir)
    path = str(tmp_path / "tc")
    create_partitioned_table(
        spark,
        path,
        base.filter(F.col("o_orderkey") % 2 == 0),
        spec=[("o_orderdate", "year")],
    )
    append_partitioned_snapshot(
        spark,
        path,
        base.filter(F.col("o_orderkey") % 2 == 1),
        spec=[("o_orderdate", "month")],
    )
    t = IcebergTableReader(spark, path)
    t.delete_where([("o_orderstatus", "=", "P")])
    surviving = base.filter(F.col("o_orderstatus") != "P")

    t2 = IcebergTableReader(spark, path)
    new_snap = t2.compact(target_bytes=1 << 20)
    t3 = IcebergTableReader(spark, path)
    assert t3.read().count() == surviving.count()

    # rewritten under the DEFAULT spec (month): one file per month
    p = t3.partitions_table().collect()
    assert all(r.partition.startswith("o_orderdate_month=") for r in p)
    assert all(r.file_count == 1 for r in p)
    months = {
        (r[0].year - 1970) * 12 + r[0].month - 1
        for r in surviving.select("o_orderdate").distinct().collect()
    }
    assert {int(r.partition.split("=")[1]) for r in p} == months

    # pruning works on the compacted table, now at month grain
    cut = dt.date(1999, 1, 1)
    snap = t3.read(predicates=[("o_orderdate", ">=", cut)])
    assert snap.count() == surviving.filter(F.col("o_orderdate") >= F.lit(cut)).count()
    assert t3.last_scan["skipped_files"] > 0
    # time travel to the pre-compaction snapshot still sees old layout
    assert t3.read(snapshot_id=new_snap - 1).count() == surviving.count()


def test_compact_zorder_within_partitions(spark, tmp_path):
    """Round 9 (VERDICT r8 item 9): compact(zorder_by=...) on a
    PARTITIONED table clusters the z-curve WITHIN each partition —
    content is preserved, each partition's files cover disjoint
    z-ranges, and a 2-D box predicate prunes files a plain bin-pack
    compaction cannot (bounds-visible payoff, not just layout)."""
    base = spark.range(0, 40000).select(
        (F.col("id") % 4).cast("int").alias("p"),
        (F.col("id") * 48271 % 1201).cast("int").alias("x"),
        (F.col("id") * 16807 % 1201).cast("int").alias("y"),
    ).repartition(8)
    zpath, plainpath = str(tmp_path / "tz"), str(tmp_path / "tp")
    for path in (zpath, plainpath):
        create_partitioned_table(
            spark, path, base, spec=[("p", "identity")]
        )
    IcebergTableReader(spark, zpath).compact(
        target_bytes=24 << 10, zorder_by=("x", "y")
    )
    IcebergTableReader(spark, plainpath).compact(target_bytes=24 << 10)

    tz = IcebergTableReader(spark, zpath)
    want = sorted((r.p, r.x, r.y) for r in base.collect())
    assert sorted((r.p, r.x, r.y) for r in tz.read().collect()) == want

    # multiple files per partition, partition tuples intact
    parts = tz.partitions_table().collect()
    assert {r.partition for r in parts} == {f"p={i}" for i in range(4)}
    assert any(r.file_count > 1 for r in parts)

    # the payoff: a small 2-D box prunes z-ordered files
    box = [("x", "<=", 120), ("y", "<=", 120)]
    tz.read(predicates=box).count()
    tp = IcebergTableReader(spark, plainpath)
    tp.read(predicates=box).count()
    assert tz.last_scan["skipped_files"] > tp.last_scan["skipped_files"]
    assert tz.last_scan["skipped_files"] > 0


def test_partitioned_compact_preserves_row_lineage(spark, tmp_path):
    """Round 9: compaction of a PARTITIONED lineage table materializes
    survivor _row_ids into the per-partition rewrites and advances
    next-row-id — ids stable across the REPLACE snapshot."""
    from introduction_in_big_data_spark.sources.iceberg import (
        create_minimal_table as ice_create,
        enable_row_lineage,
    )

    base = spark.range(0, 2000, 1, 1).select(
        (F.col("id") % 4).cast("int").alias("p"),
        F.col("id").alias("k"),
        (F.col("id") * 1.0).alias("v"),
    ).sortWithinPartitions("k")
    path = str(tmp_path / "t")
    # unpartitioned staging, then compact INTO the partitioned spec?
    # no — stage partitioned directly
    create_partitioned_table(spark, path, base, spec=[("p", "identity")])
    enable_row_lineage(spark, path)
    t = IcebergTableReader(spark, path)
    before = {
        x.k: x._row_id for x in t.read(with_row_ids=True).collect()
    }
    assert len(before) == 2000
    IcebergTableReader(spark, path).compact(target_bytes=16 << 10)
    t2 = IcebergTableReader(spark, path)
    after = {
        x.k: x._row_id for x in t2.read(with_row_ids=True).collect()
    }
    assert after == before
    assert t2.metadata()["next-row-id"] >= 4000


def _doctor_transform(path, old, new):
    """Rewrite a transform string in the CURRENT metadata json —
    simulates a table partitioned by a transform this engine cannot
    re-derive (a future/unknown transform written by another engine);
    the recorded per-file partition tuples stay valid."""
    import json as _json
    import os as _os

    meta_dir = _os.path.join(path, "metadata")
    with open(_os.path.join(meta_dir, "version-hint.text")) as fh:
        v = fh.read().strip()
    mf = _os.path.join(meta_dir, f"v{v}.metadata.json")
    with open(mf) as fh:
        meta = _json.load(fh)
    def fix(spec_fields):
        for f in spec_fields:
            if f.get("transform") == old:
                f["transform"] = new
    for s in meta.get("partition-specs", []):
        fix(s.get("fields", []))
    fix(meta.get("partition-spec", []))
    with open(mf, "w") as fh:
        _json.dump(meta, fh)


def test_compact_by_recorded_tuples_for_underivable_transform(
    spark, tmp_path
):
    """Round 10 (VERDICT r9 item 7): compaction of a partitioned table
    whose default spec carries a transform the engine cannot re-derive
    groups the rewrite by the partition tuples RECORDED in the
    manifests — values correct, deletes folded, per-entry partition
    tuples + manifest summaries preserved so identity pruning still
    works after the rewrite."""
    base = spark.range(0, 1200, 1, 6).select(
        (F.col("id") % 3).cast("int").alias("p"),
        F.col("id").alias("k"),
        (F.col("id") * 1.0).alias("v"),
    )
    path = str(tmp_path / "t")
    create_partitioned_table(
        spark, path, base, spec=[("p", "identity"), ("k", "bucket[4]")]
    )
    _doctor_transform(path, "bucket[4]", "bucket_v9[4]")
    t = IcebergTableReader(spark, path)
    # a row-level delete that must fold into the rewrite
    t.delete_where([("k", "<", 100)])
    def _cur_snap(rdr):
        m = rdr.metadata()
        return next(
            s for s in m["snapshots"]
            if s["snapshot-id"] == m["current-snapshot-id"]
        )

    tb = IcebergTableReader(spark, path)
    n_files_before = len(tb._live_files(_cur_snap(tb))[0])
    IcebergTableReader(spark, path).compact(target_bytes=1 << 30)
    t2 = IcebergTableReader(spark, path)
    got = {x.k: (x.p, x.v) for x in t2.read().collect()}
    assert sorted(got) == list(range(100, 1200))
    assert got[100] == (100 % 3, 100.0)
    # rewrote into one file per recorded (p, bucket) group, deletes gone
    data, pos, eq = t2._live_files(_cur_snap(t2))
    assert not pos and not eq
    assert len(data) <= 12 < n_files_before  # 3 idents x 4 buckets
    # recorded tuples survived: every entry carries both values
    for _p, (_s, st) in data:
        rec = st["partition"]
        assert set(rec) == {"p", "k_bucket"} and rec["p"] in (0, 1, 2)
    # identity pruning still works post-compaction
    sel = t2.read(predicates=[("p", "=", 1)])
    assert {r.p for r in sel.collect()} == {1}
    assert t2.last_scan["scanned_files"] < len(data)


def test_compact_recorded_tuples_skips_emptied_groups(spark, tmp_path):
    """ADVICE r10: a recorded-tuple group whose rows were ALL removed
    by deletes emits NO output — no 0-row data file, no
    record_count=0 manifest entry."""
    base = spark.range(0, 300, 1, 3).select(
        (F.col("id") % 3).cast("int").alias("p"),
        F.col("id").alias("k"),
        (F.col("id") * 1.0).alias("v"),
    )
    path = str(tmp_path / "t")
    create_partitioned_table(
        spark, path, base, spec=[("p", "identity"), ("k", "bucket[2]")]
    )
    _doctor_transform(path, "bucket[2]", "bucket_v9[2]")
    # empty out partition p=1 entirely (both its bucket groups)
    IcebergTableReader(spark, path).delete_where([("p", "=", 1)])
    IcebergTableReader(spark, path).compact()
    t2 = IcebergTableReader(spark, path)
    m = t2.metadata()
    snap = next(
        s for s in m["snapshots"]
        if s["snapshot-id"] == m["current-snapshot-id"]
    )
    data, pos, eq = t2._live_files(snap)
    assert not pos and not eq
    assert data, "survivor groups still compacted"
    for _p, (_s, st) in data:
        assert st["record_count"] > 0
        assert st["partition"]["p"] in (0, 2)
    got = sorted(x.k for x in t2.read().collect())
    assert got == [k for k in range(300) if k % 3 != 1]


def test_compact_recorded_tuples_preserves_row_lineage(spark, tmp_path):
    """The recorded-tuple fallback is id-preserving on lineage tables,
    like the derivable path."""
    from introduction_in_big_data_spark.sources.iceberg import (
        enable_row_lineage,
    )

    base = spark.range(0, 400, 1, 1).select(
        (F.col("id") % 2).cast("int").alias("p"),
        F.col("id").alias("k"),
    ).sortWithinPartitions("k")
    path = str(tmp_path / "t")
    create_partitioned_table(
        spark, path, base, spec=[("k", "bucket[2]")]
    )
    _doctor_transform(path, "bucket[2]", "xxbucket[2]")
    enable_row_lineage(spark, path)
    t = IcebergTableReader(spark, path)
    before = {x.k: x._row_id for x in t.read(with_row_ids=True).collect()}
    IcebergTableReader(spark, path).compact(target_bytes=1 << 30)
    t2 = IcebergTableReader(spark, path)
    after = {x.k: x._row_id for x in t2.read(with_row_ids=True).collect()}
    assert after == before
    assert t2.metadata()["next-row-id"] >= 800
