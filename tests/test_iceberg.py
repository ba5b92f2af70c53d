"""Iceberg metadata-walk reader tests.

No Iceberg jar or library exists in the image, so the tables here are
staged per the PUBLISHED spec: metadata/vN.metadata.json +
version-hint.text, Avro manifest lists and manifests (written with the
repo's own spec-pinned Avro codec), parquet data files written by
Spark. The reader must walk pointers, honor entry status, time travel
by snapshot id, and refuse v2 delete files."""

from __future__ import annotations

import json
import os
import uuid

import pytest
from pyspark.sql import functions as F

from introduction_in_big_data_spark.functions import avrocodec as av
from introduction_in_big_data_spark.sources.iceberg import (
    IcebergTableReader,
    UnsupportedIcebergFeature,
)

MANIFEST_SCHEMA = {
    "type": "record",
    "name": "manifest_entry",
    "fields": [
        {"name": "status", "type": "int"},
        {"name": "snapshot_id", "type": ["null", "long"]},
        {
            "name": "data_file",
            "type": {
                "type": "record",
                "name": "r2",
                "fields": [
                    {"name": "file_path", "type": "string"},
                    {"name": "file_format", "type": "string"},
                    {"name": "record_count", "type": "long"},
                    {"name": "file_size_in_bytes", "type": "long"},
                ],
            },
        },
    ],
}

ML_SCHEMA = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string"},
        {"name": "manifest_length", "type": "long"},
        {"name": "partition_spec_id", "type": "int"},
        {"name": "content", "type": "int"},
    ],
}


def _data_file(spark, table_dir, rows):
    tmp = os.path.join(table_dir, "stage", uuid.uuid4().hex)
    spark.createDataFrame(rows, "k long, v double").coalesce(1).write.parquet(tmp)
    src = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
    dst = os.path.join(table_dir, "data", f"{uuid.uuid4().hex}.parquet")
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    os.rename(os.path.join(tmp, src), dst)
    return dst


def _manifest(meta_dir, entries):
    p = os.path.join(meta_dir, f"{uuid.uuid4().hex}-m0.avro")
    av.write_container(p, MANIFEST_SCHEMA, entries, codec="deflate")
    return p


def _manifest_list(meta_dir, manifest_paths, content=0):
    p = os.path.join(meta_dir, f"snap-{uuid.uuid4().hex}.avro")
    av.write_container(
        p,
        ML_SCHEMA,
        [
            {
                "manifest_path": f"file://{m}",
                "manifest_length": os.path.getsize(m),
                "partition_spec_id": 0,
                "content": content,
            }
            for m in manifest_paths
        ],
        codec="deflate",
    )
    return p


def _entry(path, status=1):
    return {
        "status": status,
        "snapshot_id": 1,
        "data_file": {
            "file_path": f"file://{path}",
            "file_format": "PARQUET",
            "record_count": 1,
            "file_size_in_bytes": os.path.getsize(path),
        },
    }


def _write_metadata(table_dir, snapshots, current, version=1):
    meta_dir = os.path.join(table_dir, "metadata")
    meta = {
        "format-version": 1,
        "table-uuid": str(uuid.uuid4()),
        "location": f"file://{table_dir}",
        "schema": {
            "type": "struct",
            "schema-id": 0,
            "fields": [
                {"id": 1, "name": "k", "required": False, "type": "long"},
                {"id": 2, "name": "v", "required": False, "type": "double"},
            ],
        },
        "partition-spec": [],
        "snapshots": snapshots,
        "current-snapshot-id": current,
    }
    with open(os.path.join(meta_dir, f"v{version}.metadata.json"), "w") as fh:
        json.dump(meta, fh)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as fh:
        fh.write(str(version))


@pytest.fixture()
def iceberg_table(spark, tmp_path):
    d = str(tmp_path / "ice")
    meta_dir = os.path.join(d, "metadata")
    os.makedirs(meta_dir)
    fa = _data_file(spark, d, [(1, 1.0), (2, 2.0)])
    fb = _data_file(spark, d, [(3, 3.0)])
    # snapshot 1: file A only
    ml1 = _manifest_list(meta_dir, [_manifest(meta_dir, [_entry(fa)])])
    # snapshot 2: A deleted, B added
    m2 = _manifest(meta_dir, [_entry(fa, status=2), _entry(fb, status=1)])
    ml2 = _manifest_list(meta_dir, [m2])
    snapshots = [
        {"snapshot-id": 1, "timestamp-ms": 1000,
         "manifest-list": f"file://{ml1}",
         "summary": {"operation": "append"}},
        {"snapshot-id": 2, "timestamp-ms": 2000,
         "manifest-list": f"file://{ml2}",
         "summary": {"operation": "overwrite"}},
    ]
    _write_metadata(d, snapshots, current=2)
    return d


def test_read_current_and_time_travel(spark, iceberg_table):
    t = IcebergTableReader(spark, iceberg_table)
    assert {r.k for r in t.read().collect()} == {3}          # A deleted in s2
    assert {r.k for r in t.read(snapshot_id=1).collect()} == {1, 2}
    assert [s["snapshot_id"] for s in t.snapshots()] == [1, 2]
    assert t.snapshots()[1]["operation"] == "overwrite"
    assert dict(t.read().dtypes) == {"k": "bigint", "v": "double"}


DELETE_MANIFEST_SCHEMA = {
    "type": "record",
    "name": "manifest_entry",
    "fields": [
        {"name": "status", "type": "int"},
        {"name": "snapshot_id", "type": ["null", "long"]},
        {
            "name": "data_file",
            "type": {
                "type": "record",
                "name": "r2",
                "fields": [
                    {"name": "content", "type": "int"},
                    {"name": "file_path", "type": "string"},
                    {"name": "file_format", "type": "string"},
                    {"name": "record_count", "type": "long"},
                    {"name": "file_size_in_bytes", "type": "long"},
                ],
            },
        },
    ],
}


def test_position_deletes_applied_and_time_travel(spark, tmp_path):
    """Format-v2 position deletes (VERDICT r4 #1): a delete snapshot
    removes exactly the (file_path, pos) rows; the pre-delete snapshot
    still reads in full (time travel)."""
    from pyspark.sql import functions as F

    from introduction_in_big_data_spark.sources.iceberg import (
        add_position_deletes,
        create_minimal_table,
    )

    d = str(tmp_path / "icev2")
    df = spark.range(10).select(
        F.col("id").alias("k"), (F.col("id") * 1.0).alias("v")
    )
    create_minimal_table(spark, d, df.repartition(2))
    t = IcebergTableReader(spark, d)
    assert {r.k for r in t.read().collect()} == set(range(10))

    # learn each target row's (file, pos) from the raw scan
    data_dir = os.path.join(d, "data")
    files = [
        os.path.join(data_dir, f)
        for f in os.listdir(data_dir)
        if f.endswith(".parquet")
    ]
    pos = {
        r.k: (r.fp, r.pos)  # file:/... URI form, as Spark reports it
        for r in spark.read.parquet(*files)
        .select(
            "k",
            F.col("_metadata.file_path").alias("fp"),
            F.col("_metadata.row_index").alias("pos"),
        )
        .collect()
    }
    add_position_deletes(spark, d, [pos[2], pos[5], pos[9]])

    t2 = IcebergTableReader(spark, d)
    assert {r.k for r in t2.read().collect()} == {0, 1, 3, 4, 6, 7, 8}
    # the pre-delete snapshot is intact
    assert {r.k for r in t2.read(snapshot_id=1).collect()} == set(range(10))


def test_refuses_malformed_equality_deletes(spark, tmp_path):
    """An equality-delete entry WITHOUT equality_ids is malformed —
    refuse loudly, don't guess which columns to match."""
    d = str(tmp_path / "ice2")
    meta_dir = os.path.join(d, "metadata")
    os.makedirs(meta_dir)
    fa = _data_file(spark, d, [(1, 1.0)])
    eq_manifest = os.path.join(meta_dir, f"{uuid.uuid4().hex}-d0.avro")
    av.write_container(
        eq_manifest,
        DELETE_MANIFEST_SCHEMA,
        [
            {
                "status": 1,
                "snapshot_id": 1,
                "data_file": {
                    "content": 2,
                    "file_path": f"file://{fa}",
                    "file_format": "PARQUET",
                    "record_count": 1,
                    "file_size_in_bytes": 1,
                },
            }
        ],
    )
    ml = _manifest_list(meta_dir, [eq_manifest], content=1)
    # _manifest_list re-stats the path; patch content only
    _write_metadata(
        d,
        [{"snapshot-id": 1, "timestamp-ms": 0,
          "manifest-list": f"file://{ml}",
          "summary": {"operation": "delete"}}],
        current=1,
    )
    with pytest.raises(UnsupportedIcebergFeature, match="equality delete"):
        IcebergTableReader(spark, d).read()


def test_not_an_iceberg_table(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        IcebergTableReader(spark, str(tmp_path / "nope"))


def test_unknown_snapshot_id(spark, iceberg_table):
    with pytest.raises(ValueError, match="snapshot 99"):
        IcebergTableReader(spark, iceberg_table).read(snapshot_id=99)


def test_metadata_file_numeric_version_pick(spark, tmp_path):
    """ADVICE r4: with version-hint missing, v10 must beat v9 (numeric
    max, not lexicographic — 'v10...' < 'v9...' as strings)."""
    d = str(tmp_path / "ice3")
    meta_dir = os.path.join(d, "metadata")
    os.makedirs(meta_dir)
    fa = _data_file(spark, d, [(1, 1.0)])
    fb = _data_file(spark, d, [(2, 2.0)])
    ml1 = _manifest_list(meta_dir, [_manifest(meta_dir, [_entry(fa)])])
    ml2 = _manifest_list(meta_dir, [_manifest(meta_dir, [_entry(fb)])])
    s1 = [{"snapshot-id": 1, "timestamp-ms": 0,
           "manifest-list": f"file://{ml1}",
           "summary": {"operation": "append"}}]
    s2 = [{"snapshot-id": 2, "timestamp-ms": 0,
           "manifest-list": f"file://{ml2}",
           "summary": {"operation": "overwrite"}}]
    _write_metadata(d, s1, current=1, version=9)
    _write_metadata(d, s2, current=2, version=10)
    os.unlink(os.path.join(meta_dir, "version-hint.text"))
    t = IcebergTableReader(spark, d)
    assert t._metadata_file().endswith("v10.metadata.json")
    assert {r.k for r in t.read().collect()} == {2}


def test_export_acid_table_roundtrip(spark, tmp_path):
    """Write-side Iceberg interop: an AcidTable snapshot exported as
    format-v1 metadata reads back identically through the pointer
    walk, carries real record counts, and re-export after mutations
    appends a time-travelable snapshot."""
    from pyspark.sql import functions as F

    from introduction_in_big_data_spark.functions import avrocodec as avc
    from introduction_in_big_data_spark.sources.acidtable import AcidTable
    from introduction_in_big_data_spark.sources.iceberg import (
        export_acid_table,
    )

    d = str(tmp_path / "acid_ice")
    df = spark.range(10).select(
        F.col("id").alias("k"), (F.col("id") * 0.5).alias("v")
    )
    table = AcidTable.create(spark, d, df.repartition(2))
    assert export_acid_table(spark, d) == 1

    t = IcebergTableReader(spark, d)
    assert {r.k for r in t.read().collect()} == set(range(10))
    # record counts in the manifest are real, not zero
    snap = next(s for s in t.metadata()["snapshots"] if s["snapshot-id"] == 1)
    ml = snap["manifest-list"].removeprefix("file://")
    _s, manifests = avc.read_container(ml)
    _s2, entries = avc.read_container(
        manifests[0]["manifest_path"].removeprefix("file://")
    )
    assert sum(e["data_file"]["record_count"] for e in entries) == 10

    # mutate + re-export: new snapshot, old still readable
    table.overwrite(df.filter("k < 3"))
    assert export_acid_table(spark, d) == 2
    t2 = IcebergTableReader(spark, d)
    assert {r.k for r in t2.read().collect()} == {0, 1, 2}
    assert {r.k for r in t2.read(snapshot_id=1).collect()} == set(range(10))


def test_equality_deletes_with_sequence_gate(spark, tmp_path):
    """v2 equality deletes: rows matching the delete columns vanish
    from data files with smaller sequence numbers, but a matching row
    RE-APPENDED at a sequence >= the delete's survives (the spec's
    sequence gate — the case naive apply-to-everything gets wrong)."""
    from pyspark.sql import functions as F

    from introduction_in_big_data_spark.sources.iceberg import (
        add_equality_deletes,
        append_data_snapshot,
        create_minimal_table,
    )

    d = str(tmp_path / "ice_eq")
    df = spark.range(6).select(
        F.col("id").alias("k"), (F.col("id") * 1.0).alias("v")
    )
    create_minimal_table(spark, d, df.coalesce(1))  # data at sequence 0
    add_equality_deletes(spark, d, [(1,), (4,)], ["k"], sequence=1)
    t = IcebergTableReader(spark, d)
    assert {r.k for r in t.read().collect()} == {0, 2, 3, 5}

    # re-insert k=4 at sequence 2: the seq-1 delete must NOT touch it
    append_data_snapshot(
        spark, d,
        spark.createDataFrame([(4, 40.0)], "k long, v double"),
        sequence=2,
    )
    assert {(r.k, r.v) for r in IcebergTableReader(spark, d).read().collect()} \
        == {(0, 0.0), (2, 2.0), (3, 3.0), (5, 5.0), (4, 40.0)}

    # a second delete at sequence 3 kills the re-inserted row too
    add_equality_deletes(spark, d, [(4,)], ["k"], sequence=3)
    assert {r.k for r in IcebergTableReader(spark, d).read().collect()} \
        == {0, 2, 3, 5}


def test_equality_deletes_multi_column(spark, tmp_path):
    """Multi-column equality_ids: BOTH columns must match (null-safe)."""
    from pyspark.sql import functions as F

    from introduction_in_big_data_spark.sources.iceberg import (
        add_equality_deletes,
        create_minimal_table,
    )

    d = str(tmp_path / "ice_eq2")
    df = spark.createDataFrame(
        [(1, 1.0), (1, 2.0), (2, 1.0)], "k long, v double"
    )
    create_minimal_table(spark, d, df.coalesce(1))
    add_equality_deletes(spark, d, [(1, 1.0)], ["k", "v"], sequence=1)
    out = {(r.k, r.v) for r in IcebergTableReader(spark, d).read().collect()}
    assert out == {(1, 2.0), (2, 1.0)}

def test_iceberg_compact_zorder_prunes(spark, tmp_path):
    from introduction_in_big_data_spark.sources.iceberg import (
        IcebergTableReader,
        create_minimal_table as ice_create,
    )

    path = str(tmp_path / "t")
    base = spark.range(0, 20000).select(
        (F.col("id") * 48271 % 1201).cast("int").alias("x"),
        (F.col("id") * 16807 % 1201).cast("int").alias("y"),
        (F.col("id") * 1.0).alias("v"),
    ).repartition(8)
    ice_create(spark, path, base, bounds=True)
    t = IcebergTableReader(spark, path)
    before = sorted((r.x, r.y, r.v) for r in t.read().collect())
    with pytest.raises(ValueError, match="not in the table"):
        t.compact(zorder_by=("zzz", "x"))
    t.compact(target_bytes=16 << 10, zorder_by=("x", "y"))
    t2 = IcebergTableReader(spark, path)
    assert sorted((r.x, r.y, r.v) for r in t2.read().collect()) == before
    # the z-order payoff is metadata-visible via manifest bounds
    t2.read(predicates=[("x", "<=", 150), ("y", "<=", 150)])
    assert t2.last_scan["skipped_files"] > 0
