"""Iceberg FORMAT-V3 DELETION VECTORS (table spec v3 + the Puffin
file format — functions/puffin.py): position deletes stored as
roaring-bitmap blobs in puffin containers, referenced from manifest
entries by (file_format=PUFFIN, referenced_data_file, content_offset,
content_size_in_bytes). Closes VERDICT r7 "What's missing" item 6 —
tables written by Spark 4 / Iceberg 1.8+ DV writers now read instead
of refusing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from introduction_in_big_data_spark.functions import puffin
from introduction_in_big_data_spark.sources.iceberg import (
    IcebergTableReader,
    add_deletion_vectors,
    create_minimal_table,
)


def _stage(spark, tmp_path, name, lo=0, hi=100):
    path = str(tmp_path / name)
    df = (
        spark.range(lo, hi)
        .select(F.col("id").alias("k"), (F.col("id") * 2.0).alias("v"))
        .coalesce(1)
        .sortWithinPartitions("k")
    )
    create_minimal_table(spark, path, df, bounds=True)
    return path


def _data_files(spark, path):
    r = IcebergTableReader(spark, path)
    return [p for p, _ in r._live_files(r.metadata()["snapshots"][-1])[0]]


def test_dv_blob_roundtrip_and_corruption():
    pos = [0, 5, 7, 100_000, 2**33 + 4]
    blob = puffin.encode_deletion_vector(pos)
    assert puffin.decode_deletion_vector(blob) == sorted(set(pos))
    # flipped payload byte -> CRC catches it
    bad = bytearray(blob)
    bad[9] ^= 0xFF
    with pytest.raises(puffin.PuffinError, match="CRC"):
        puffin.decode_deletion_vector(bytes(bad))
    with pytest.raises(puffin.PuffinError, match="magic"):
        puffin.decode_deletion_vector(b"\x00\x00\x00\x08XXXXYYYY\x00\x00\x00\x00")


def test_puffin_container_roundtrip(tmp_path):
    p = str(tmp_path / "t.puffin")
    b1 = puffin.encode_deletion_vector([1, 2, 3])
    b2 = puffin.encode_deletion_vector([7])
    spans = puffin.write_puffin(
        p,
        [
            {"type": "deletion-vector-v1", "payload": b1,
             "properties": {"referenced-data-file": "a.parquet"}},
            {"type": "deletion-vector-v1", "payload": b2,
             "snapshot-id": 9},
        ],
    )
    footer = puffin.read_footer(p)
    assert [b["type"] for b in footer["blobs"]] == [
        "deletion-vector-v1", "deletion-vector-v1",
    ]
    assert footer["blobs"][0]["offset"] == spans[0][0]
    assert footer["blobs"][1]["snapshot-id"] == 9
    got = puffin.read_blob(p, *spans[1])
    assert puffin.decode_deletion_vector(got) == [7]


def test_v3_dv_read_applies_vectors(spark, tmp_path):
    path = _stage(spark, tmp_path, "t")
    files = _data_files(spark, path)
    assert len(files) == 1
    add_deletion_vectors(spark, path, [(files[0], [0, 1, 2, 50])])
    r = IcebergTableReader(spark, path)
    assert r.metadata()["format-version"] == 3
    got = sorted(x.k for x in r.read().collect())
    assert got == [3] + list(range(4, 50)) + list(range(51, 100))
    # older snapshot still reads vector-free (time travel)
    first = r.metadata()["snapshots"][0]["snapshot-id"]
    assert r.read(snapshot_id=first).count() == 100


def test_v3_dv_two_files_and_stacking(spark, tmp_path):
    path = str(tmp_path / "t")
    df = (
        spark.range(0, 100)
        .select(F.col("id").alias("k"), (F.col("id") * 1.0).alias("v"))
        .repartitionByRange(2, "k")
        .sortWithinPartitions("k")
    )
    create_minimal_table(spark, path, df, bounds=True)
    files = sorted(_data_files(spark, path))
    assert len(files) == 2
    add_deletion_vectors(
        spark, path, [(files[0], [0]), (files[1], [0, 1])]
    )
    r = IcebergTableReader(spark, path)
    assert r.read().count() == 97
    # a SECOND DV snapshot stacks (both puffin files' vectors apply)
    add_deletion_vectors(spark, path, [(files[0], [3])])
    r = IcebergTableReader(spark, path)
    assert r.read().count() == 96


def test_v3_dv_changelog_renders_deletes(spark, tmp_path):
    path = _stage(spark, tmp_path, "t")
    r = IcebergTableReader(spark, path)
    v1 = r.metadata()["current-snapshot-id"]
    files = _data_files(spark, path)
    add_deletion_vectors(spark, path, [(files[0], [2, 4])])
    r = IcebergTableReader(spark, path)
    rows = {(x.k, x._change_type) for x in r.changelog(v1).collect()}
    assert rows == {(2, "delete"), (4, "delete")}


def test_v3_dv_compact_folds_vectors(spark, tmp_path):
    path = _stage(spark, tmp_path, "t")
    files = _data_files(spark, path)
    add_deletion_vectors(spark, path, [(files[0], [0, 99])])
    IcebergTableReader(spark, path).compact()
    r = IcebergTableReader(spark, path)
    got = sorted(x.k for x in r.read().collect())
    assert got == list(range(1, 99))
    # post-compaction: no delete files remain
    _d, pos, eq = r._live_files(
        next(
            s
            for s in r.metadata()["snapshots"]
            if s["snapshot-id"] == r.metadata()["current-snapshot-id"]
        )
    )
    assert pos == [] and eq == []


def test_delete_where_dv_writes_puffin(spark, tmp_path):
    """The v3 DV WRITE path: delete_where_dv serializes matched
    positions as puffin vectors — zero data files rewritten, one
    vector per hit file, previous vectors MERGED and their old
    entries retired (the spec's one-DV-per-file rule)."""
    import os

    path = _stage(spark, tmp_path, "t", 0, 1000)
    r = IcebergTableReader(spark, path)
    v = r.delete_where_dv([("k", ">=", 100), ("k", "<", 150)])
    assert v != r.metadata()["snapshots"][0]["snapshot-id"]
    meta_dir = os.path.join(path, "metadata")
    assert [f for f in os.listdir(meta_dir) if f.endswith(".puffin")]
    r = IcebergTableReader(spark, path)
    assert r.metadata()["format-version"] == 3
    got = sorted(x.k for x in r.read().collect())
    assert got == list(range(100)) + list(range(150, 1000))
    # overlapping second delete MERGES: exactly one DV applies per file
    r.delete_where_dv([("k", ">=", 120), ("k", "<", 200)])
    r = IcebergTableReader(spark, path)
    got = sorted(x.k for x in r.read().collect())
    assert got == list(range(100)) + list(range(200, 1000))
    snap = next(
        s
        for s in r.metadata()["snapshots"]
        if s["snapshot-id"] == r.metadata()["current-snapshot-id"]
    )
    _d, pos, _e = r._live_files(snap)
    assert len(pos) == 1 and pos[0][1] == "PUFFIN"
    # idempotence: re-running the same predicate commits nothing
    cur = r.metadata()["current-snapshot-id"]
    assert r.delete_where_dv([("k", ">=", 120), ("k", "<", 200)]) == cur


def test_delete_where_dv_prunes_and_changelogs(spark, tmp_path):
    path = str(tmp_path / "t")
    df = (
        spark.range(0, 1200)
        .select(F.col("id").alias("k"), (F.col("id") * 1.0).alias("v"))
        .repartitionByRange(6, "k")
        .sortWithinPartitions("k")
    )
    create_minimal_table(spark, path, df, bounds=True)
    r = IcebergTableReader(spark, path)
    v1 = r.metadata()["current-snapshot-id"]
    r.delete_where_dv([("k", ">=", 1000), ("k", "<", 1100)])
    r = IcebergTableReader(spark, path)
    # bounds pruned: only the hit file(s) got vectors
    snap = next(
        s
        for s in r.metadata()["snapshots"]
        if s["snapshot-id"] == r.metadata()["current-snapshot-id"]
    )
    _d, pos, _e = r._live_files(snap)
    assert 1 <= len(pos) <= 2
    assert r.read().count() == 1100
    rows = {(x.k, x._change_type) for x in r.changelog(v1).collect()}
    assert rows == {(k, "delete") for k in range(1000, 1100)}


def test_update_where_dv_vectors_plus_images(spark, tmp_path):
    """v3 merge-on-read UPDATE: one snapshot = puffin vectors on the
    matched rows + their updated images appended — zero existing data
    files rewritten; stacked updates merge vectors."""
    path = _stage(spark, tmp_path, "t", 0, 500)
    r = IcebergTableReader(spark, path)
    v = r.update_where_dv([("k", "<", 10)], {"v": "v + 1000"})
    assert v != r.metadata()["snapshots"][0]["snapshot-id"]
    r = IcebergTableReader(spark, path)
    assert r.metadata()["format-version"] == 3
    got = {x.k: x.v for x in r.read().collect()}
    assert len(got) == 500  # UPDATE never changes cardinality
    assert got[3] == 1006.0 and got[10] == 20.0
    # stacked: second update touches an overlapping range
    r.update_where_dv([("k", ">=", 5), ("k", "<", 15)], {"v": "v * 0"})
    r = IcebergTableReader(spark, path)
    got = {x.k: x.v for x in r.read().collect()}
    assert len(got) == 500
    assert got[3] == 1006.0 and got[7] == 0.0 and got[12] == 0.0
    assert got[20] == 40.0
    # assignments against UNKNOWN columns refuse
    with pytest.raises(ValueError, match="unknown columns"):
        r.update_where_dv([("k", "<", 2)], {"zzz": "1"})


def test_expire_snapshots_reclaims_orphaned_puffin(spark, tmp_path):
    """compact() folds the vectors in; expire_snapshots then reclaims
    the puffin file once no retained snapshot references it — the
    same reclamation lifecycle as data files."""
    import os

    path = _stage(spark, tmp_path, "t")
    r = IcebergTableReader(spark, path)
    r.delete_where_dv([("k", "<", 10)])
    meta_dir = os.path.join(path, "metadata")
    puffins = [f for f in os.listdir(meta_dir) if f.endswith(".puffin")]
    assert len(puffins) == 1
    r = IcebergTableReader(spark, path)
    r.compact()
    r = IcebergTableReader(spark, path)
    # still referenced by the pre-compaction snapshot: survives
    r.expire_snapshots(keep_last=2)
    assert os.path.exists(os.path.join(meta_dir, puffins[0]))
    # only the compacted snapshot retained: the puffin reclaims
    r = IcebergTableReader(spark, path)
    r.expire_snapshots(keep_last=1)
    assert not os.path.exists(os.path.join(meta_dir, puffins[0]))
    assert IcebergTableReader(spark, path).read().count() == 90


def test_changelog_across_stacked_dv_deletes(spark, tmp_path):
    """Two stacked delete_where_dv commits: the second RETIRES the
    first vector entry (one merged DV per file) — the changelog must
    treat that as a transition, not an un-delete, and emit exactly
    the per-commit diffs."""
    path = _stage(spark, tmp_path, "t", 0, 200)
    r = IcebergTableReader(spark, path)
    v0 = r.metadata()["current-snapshot-id"]
    r.delete_where_dv([("k", "<", 5)])
    r = IcebergTableReader(spark, path)
    v1 = r.metadata()["current-snapshot-id"]
    r.delete_where_dv([("k", ">=", 3), ("k", "<", 9)])  # overlap
    r = IcebergTableReader(spark, path)
    v2 = r.metadata()["current-snapshot-id"]
    by = {}
    for x in r.changelog(v0).collect():
        by.setdefault(x._commit_snapshot_id, []).append(
            (x.k, x._change_type)
        )
    assert sorted(by[v1]) == [(k, "delete") for k in range(5)]
    # overlap [3, 5) already dead at v1: only 5..8 newly delete
    assert sorted(by[v2]) == [(k, "delete") for k in range(5, 9)]


def test_changelog_renders_v3_dv_update(spark, tmp_path):
    """update_where_dv's commit (vector + image file) renders in the
    changelog as delete (old rows) + insert (updated images)."""
    path = _stage(spark, tmp_path, "t", 0, 50)
    r = IcebergTableReader(spark, path)
    v0 = r.metadata()["current-snapshot-id"]
    r.update_where_dv([("k", "<", 3)], {"v": "v + 100"})
    r = IcebergTableReader(spark, path)
    rows = {(x.k, x.v, x._change_type) for x in r.changelog(v0).collect()}
    assert rows == {
        (0, 0.0, "delete"),
        (1, 2.0, "delete"),
        (2, 4.0, "delete"),
        (0, 100.0, "insert"),
        (1, 102.0, "insert"),
        (2, 104.0, "insert"),
    }


def test_row_lineage_read(spark, tmp_path):
    """Format-v3 ROW LINEAGE: read(with_row_ids=True) derives _row_id
    = first_row_id + position; DV tombstones remove ids without
    renumbering survivors; untracked tables refuse."""
    from introduction_in_big_data_spark.sources.iceberg import (
        UnsupportedIcebergFeature,
        enable_row_lineage,
    )

    path = str(tmp_path / "t")
    df = (
        spark.range(0, 100)
        .select(F.col("id").alias("k"), (F.col("id") * 1.0).alias("v"))
        .repartitionByRange(2, "k")
        .sortWithinPartitions("k")
    )
    create_minimal_table(spark, path, df, bounds=True)
    r = IcebergTableReader(spark, path)
    with pytest.raises(UnsupportedIcebergFeature, match="first_row_id"):
        r.read(with_row_ids=True)
    enable_row_lineage(spark, path)
    r = IcebergTableReader(spark, path)
    assert r.metadata()["format-version"] == 3
    assert r.metadata()["next-row-id"] == 100
    got = r.read(with_row_ids=True)
    ids = sorted(x._row_id for x in got.collect())
    assert ids == list(range(100))
    # stable across reads, and plain reads unchanged
    again = sorted(
        x._row_id
        for x in IcebergTableReader(spark, path)
        .read(with_row_ids=True)
        .collect()
    )
    assert again == ids
    assert "_row_id" not in r.read().columns
    # a DV delete removes ids without renumbering the survivors
    r.delete_where_dv([("k", "<", 3)])
    r = IcebergTableReader(spark, path)
    left = {x.k: x._row_id for x in r.read(with_row_ids=True).collect()}
    assert sorted(left) == list(range(3, 100))
    # k-sorted staging: row id == k; survivors keep their ids
    assert left[50] == 50 and left[3] == 3
    assert 0 not in left.values()


def test_row_lineage_appends_assign_fresh_ids(spark, tmp_path):
    """Appends AFTER lineage enablement assign first_row_id from
    next-row-id and advance it atomically — new rows get fresh,
    disjoint ids."""
    from introduction_in_big_data_spark.sources.iceberg import (
        append_data_snapshot,
        enable_row_lineage,
    )

    path = str(tmp_path / "t")
    df = (
        spark.range(0, 40, 1, 1)
        .select(F.col("id").alias("k"), (F.col("id") * 1.0).alias("v"))
        .sortWithinPartitions("k")
    )
    create_minimal_table(spark, path, df, bounds=True)
    enable_row_lineage(spark, path)
    batch = spark.range(100, 125, 1, 1).select(
        F.col("id").alias("k"), (F.col("id") * 1.0).alias("v")
    )
    append_data_snapshot(spark, path, batch, sequence=1)
    r = IcebergTableReader(spark, path)
    assert r.metadata()["next-row-id"] == 65
    got = {x.k: x._row_id for x in r.read(with_row_ids=True).collect()}
    assert sorted(got.values()) == list(range(65))
    assert got[100] == 40  # first appended row gets the next id
    # a second append continues the sequence
    append_data_snapshot(
        spark,
        path,
        spark.range(200, 210, 1, 1).select(
            F.col("id").alias("k"), (F.col("id") * 1.0).alias("v")
        ),
        sequence=2,
    )
    r = IcebergTableReader(spark, path)
    assert r.metadata()["next-row-id"] == 75
    got = {x.k: x._row_id for x in r.read(with_row_ids=True).collect()}
    assert sorted(got.values()) == list(range(75))


def test_materialized_row_ids_override_per_file(spark, tmp_path):
    """ADVICE r8 + round 9: EVERY scanned file's footer is checked for
    a materialized _row_id column, and materialized values OVERRIDE
    the first_row_id + position derivation per row — on a partially
    rewritten table only the rewritten file's ids change, the rest
    still derive."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from introduction_in_big_data_spark.sources.iceberg import (
        enable_row_lineage,
    )

    path = str(tmp_path / "t")
    df = (
        spark.range(0, 50)
        .select(F.col("id").alias("k"), (F.col("id") * 1.0).alias("v"))
        .repartitionByRange(2, "k")
        .sortWithinPartitions("k")
    )
    create_minimal_table(spark, path, df, bounds=True)
    enable_row_lineage(spark, path)
    r = IcebergTableReader(spark, path)
    files = [
        p for p, _ in r._live_files(r.metadata()["snapshots"][-1])[0]
    ]
    assert len(files) >= 2
    before = {
        x.k: x._row_id for x in r.read(with_row_ids=True).collect()
    }
    # rewrite only the LAST file with a materialized _row_id column
    tbl = pq.read_table(files[-1])
    ks = tbl.column("k").to_pylist()
    tbl = tbl.append_column(
        "_row_id", pa.array(range(7000, 7000 + tbl.num_rows), pa.int64())
    )
    pq.write_table(tbl, files[-1])
    got = {
        x.k: x._row_id
        for x in IcebergTableReader(spark, path)
        .read(with_row_ids=True)
        .collect()
    }
    for i, k in enumerate(ks):
        assert got[k] == 7000 + i  # materialized wins
    for k, rid in before.items():
        if k not in set(ks):
            assert got[k] == rid  # others still derive


def test_compact_preserves_row_lineage(spark, tmp_path):
    """Round 9: compact() on a row-lineage table materializes every
    survivor's _row_id into the rewritten files (fresh first_row_id
    ranges in the manifest, materialized values override on read) and
    advances next-row-id atomically — ids stable through compaction,
    disjoint for later appends."""
    from introduction_in_big_data_spark.sources.iceberg import (
        append_data_snapshot,
        enable_row_lineage,
    )

    path = str(tmp_path / "t")
    df = (
        spark.range(0, 60, 1, 1)
        .select(F.col("id").alias("k"), (F.col("id") * 1.0).alias("v"))
        .sortWithinPartitions("k")
    )
    create_minimal_table(spark, path, df, bounds=True)
    enable_row_lineage(spark, path)
    append_data_snapshot(
        spark,
        path,
        spark.range(100, 120, 1, 1).select(
            F.col("id").alias("k"), (F.col("id") * 1.0).alias("v")
        ),
        sequence=1,
    )
    r = IcebergTableReader(spark, path)
    r.delete_where_dv([("k", "<", 5)])
    before = {
        x.k: x._row_id
        for x in IcebergTableReader(spark, path)
        .read(with_row_ids=True)
        .collect()
    }
    assert before[100] == 60 and before[10] == 10

    IcebergTableReader(spark, path).compact(target_bytes=1 << 30)
    t2 = IcebergTableReader(spark, path)
    after = {
        x.k: x._row_id for x in t2.read(with_row_ids=True).collect()
    }
    assert after == before, "ids stable through compaction"
    assert len(after) == 75
    # next-row-id advanced past the rewrite: appended rows disjoint
    nri = t2.metadata()["next-row-id"]
    assert nri >= 80 + 75
    append_data_snapshot(
        spark,
        path,
        spark.createDataFrame([(900, 9.0)], "k long, v double"),
        sequence=3,
    )
    got = {
        x.k: x._row_id
        for x in IcebergTableReader(spark, path)
        .read(with_row_ids=True)
        .collect()
    }
    assert got[900] == nri and got[900] not in set(before.values())


def test_update_where_dv_preserves_row_lineage(spark, tmp_path):
    """Round 9: the v3 DV UPDATE is a PRESERVED update on lineage
    tables — the image file materializes each row's OLD _row_id and
    gets a fresh first_row_id range; next-row-id advances atomically."""
    from introduction_in_big_data_spark.sources.iceberg import (
        enable_row_lineage,
    )

    path = str(tmp_path / "t")
    df = (
        spark.range(0, 40, 1, 1)
        .select(F.col("id").alias("k"), (F.col("id") * 1.0).alias("v"))
        .sortWithinPartitions("k")
    )
    create_minimal_table(spark, path, df, bounds=True)
    enable_row_lineage(spark, path)
    IcebergTableReader(spark, path).update_where_dv(
        [("k", "=", 7)], {"v": "777.0"}
    )
    t = IcebergTableReader(spark, path)
    got = {
        x.k: (x.v, x._row_id)
        for x in t.read(with_row_ids=True).collect()
    }
    assert got[7] == (777.0, 7), "updated row keeps its id"
    assert got[8] == (8.0, 8)
    assert len(got) == 40
    assert t.metadata()["next-row-id"] == 41  # image got a fresh slot
    # a second update of the SAME row rides the materialized id
    IcebergTableReader(spark, path).update_where_dv(
        [("k", "=", 7)], {"v": "7777.0"}
    )
    got2 = {
        x.k: (x.v, x._row_id)
        for x in IcebergTableReader(spark, path)
        .read(with_row_ids=True)
        .collect()
    }
    assert got2[7] == (7777.0, 7)


def test_materialized_lineage_columns_carry_reserved_field_ids(
    spark, tmp_path
):
    """ADVICE r10: files this engine materializes lineage into stamp
    the spec's reserved field ids (2147483540 / 2147483539) so
    reference readers resolve the columns BY ID, and read-side
    detection prefers the id so a user data column named `_row_id`
    (which carries its own schema field id) is never misread."""
    import os

    import pyarrow.parquet as pq

    from introduction_in_big_data_spark.sources.iceberg import (
        _footer_lineage_names,
        enable_row_lineage,
    )

    path = str(tmp_path / "t")
    df = (
        spark.range(0, 30, 1, 1)
        .select(F.col("id").alias("k"), (F.col("id") * 1.0).alias("v"))
        .sortWithinPartitions("k")
    )
    create_minimal_table(spark, path, df, bounds=True)
    enable_row_lineage(spark, path)
    IcebergTableReader(spark, path).update_where_dv(
        [("k", "<", 3)], {"v": "v + 100"}
    )
    data_dir = os.path.join(path, "data")
    stamped = []
    for f in sorted(os.listdir(data_dir)):
        sch = pq.read_schema(os.path.join(data_dir, f))
        if "_row_id" in sch.names:
            idx = sch.get_field_index("_row_id")
            fid = (sch.field(idx).metadata or {}).get(b"PARQUET:field_id")
            stamped.append(fid)
            # detection helper sees it as lineage
            assert "_row_id" in _footer_lineage_names(sch)
    assert stamped and all(int(x) == 2147483540 for x in stamped)
    # detection rejects a user column that merely shares the name: a
    # footer whose `_row_id` carries a NON-reserved schema field id
    import pyarrow as pa

    user = pa.schema(
        [
            pa.field(
                "_row_id",
                pa.int64(),
                metadata={b"PARQUET:field_id": b"17"},
            )
        ]
    )
    assert _footer_lineage_names(user) == set()
    # and the ids still read back through the normal lineage path
    got = {
        x.k: (x.v, x._row_id)
        for x in IcebergTableReader(spark, path)
        .read(with_row_ids=True)
        .collect()
    }
    assert got[1] == (101.0, 1) and got[5] == (5.0, 5)


def test_update_where_v2_preserves_row_lineage(spark, tmp_path):
    """The v2 position-delete UPDATE shape also preserves lineage on
    lineage-enabled tables."""
    from introduction_in_big_data_spark.sources.iceberg import (
        enable_row_lineage,
    )

    path = str(tmp_path / "t")
    df = (
        spark.range(0, 30, 1, 1)
        .select(F.col("id").alias("k"), (F.col("id") * 1.0).alias("v"))
        .sortWithinPartitions("k")
    )
    create_minimal_table(spark, path, df, bounds=True)
    enable_row_lineage(spark, path)
    IcebergTableReader(spark, path).update_where(
        [("k", "=", 3)], {"v": "333.0"}
    )
    t = IcebergTableReader(spark, path)
    got = {
        x.k: (x.v, x._row_id)
        for x in t.read(with_row_ids=True).collect()
    }
    assert got[3] == (333.0, 3) and got[4] == (4.0, 4)
    assert t.metadata()["next-row-id"] == 31


def test_materialized_row_ids_under_name_mapping_and_evolution(
    spark, tmp_path
):
    """Round 10 (VERDICT r9 item 4): the Hive-migrated shape — a
    name-mapped table of ID-LESS files, later touched by a
    lineage-MATERIALIZING writer and schema-evolved — must read
    with_row_ids: materialized `_row_id` columns ride the same
    per-file projection the data columns do (mapped id-less files
    pass the physical column through or read null into the
    first_row_id derivation; field-id image files name-match the
    id-less `_row_id` request under the fieldId reader)."""
    from introduction_in_big_data_spark.sources.iceberg import (
        enable_row_lineage,
        snapshot_parquet_dir,
    )

    src = str(tmp_path / "src")
    (
        spark.range(0, 80, 1, 1)
        .select(F.col("id").alias("k"), (F.col("id") * 1.0).alias("bal"))
        .sortWithinPartitions("k")
        .write.parquet(src)
    )
    path = str(tmp_path / "t")
    snapshot_parquet_dir(spark, src, path)
    r = IcebergTableReader(spark, path)
    assert r._name_mapping(r.metadata()), "staging must be name-mapped"
    enable_row_lineage(spark, path)

    # materializing DML: the image file carries ids + a physical
    # _row_id; the original mapped file is untouched
    IcebergTableReader(spark, path).update_where_dv(
        [("k", ">=", 10), ("k", "<", 20)], {"bal": "bal + 1000.0"}
    )
    # schema evolution on top: multi-schema + rename (field id kept)
    IcebergTableReader(spark, path).update_schema(
        renames={"bal": "balance"}
    )
    t2 = IcebergTableReader(spark, path)
    assert len(t2.metadata()["schemas"]) > 1
    got = {
        x.k: (x.balance, x._row_id)
        for x in t2.read(with_row_ids=True).collect()
    }
    assert len(got) == 80
    # ids: k-sorted single-file staging => _row_id == k everywhere,
    # INCLUDING the updated rows (preserved update materialized them)
    assert all(rid == k for k, (_b, rid) in got.items())
    assert got[15] == (1015.0, 15)
    assert got[5] == (5.0, 5)
    # second materializing pass rides the already-materialized ids
    IcebergTableReader(spark, path).update_where_dv(
        [("k", "=", 15)], {"balance": "balance + 1.0"}
    )
    got2 = {
        x.k: (x.balance, x._row_id)
        for x in IcebergTableReader(spark, path)
        .read(with_row_ids=True)
        .collect()
    }
    assert got2[15] == (1016.0, 15) and got2[16] == (1016.0, 16)


def test_last_updated_sequence_number_lifecycle(spark, tmp_path):
    """Round 10: the PAIRED v3 lineage column. Derivation: a row's
    _last_updated_sequence_number inherits its file's data sequence
    number; an UPDATE's image rows pick up the update commit's
    sequence (derived — an update IS a last-update); a COMPACTION
    materializes the original values into the rewrite (a compaction
    is NOT an update), exactly like _row_id."""
    from introduction_in_big_data_spark.sources.iceberg import (
        append_data_snapshot,
        enable_row_lineage,
    )

    path = str(tmp_path / "t")
    df = (
        spark.range(0, 60, 1, 1)
        .select(F.col("id").alias("k"), (F.col("id") * 1.0).alias("v"))
        .sortWithinPartitions("k")
    )
    create_minimal_table(spark, path, df, bounds=True)
    enable_row_lineage(spark, path)
    append_data_snapshot(
        spark,
        path,
        spark.range(100, 110, 1, 1).select(
            F.col("id").alias("k"), (F.col("id") * 1.0).alias("v")
        ),
        sequence=1,
    )
    got = {
        x.k: (x._row_id, x._last_updated_sequence_number)
        for x in IcebergTableReader(spark, path)
        .read(with_row_ids=True)
        .collect()
    }
    assert got[10] == (10, 0), "original file inherits its seq"
    assert got[100] == (60, 1), "appended file inherits its seq"

    IcebergTableReader(spark, path).update_where_dv(
        [("k", "=", 7)], {"v": "777.0"}
    )
    got2 = {
        x.k: (x.v, x._row_id, x._last_updated_sequence_number)
        for x in IcebergTableReader(spark, path)
        .read(with_row_ids=True)
        .collect()
    }
    assert got2[7][0] == 777.0 and got2[7][1] == 7
    assert got2[7][2] > 1, "updated row's last-update is the new commit"
    assert got2[8] == (8.0, 8, 0), "untouched rows keep theirs"
    before = {
        k: (rid, seq) for k, (_v, rid, seq) in got2.items()
    }

    IcebergTableReader(spark, path).compact(target_bytes=1 << 30)
    after = {
        x.k: (x._row_id, x._last_updated_sequence_number)
        for x in IcebergTableReader(spark, path)
        .read(with_row_ids=True)
        .collect()
    }
    assert after == before, (
        "compaction must materialize BOTH lineage columns — ids and "
        "last-updated sequences survive the rewrite"
    )
