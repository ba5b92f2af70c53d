"""ROW TRACKING on externally-written Delta tables. Reads (round 8):
`read(with_row_ids=True)` appends `_row_id` / `_row_commit_version` —
baseRowId + row_index for fresh rows, overridden by MATERIALIZED
values from the table's hidden physical columns. Writes (round 9):
every DML and maintenance path maintains lineage — DV deletes
preserve survivor ids in place, appends allocate from the
rowIdHighWaterMark domain, and every rewrite (DV update, COW
delete/update, MERGE, OPTIMIZE, RESTORE) carries ids and commit
versions through the materialized columns."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from introduction_in_big_data_spark.sources.deltalog import (
    DeltaLogReader,
    UnsupportedDeltaFeature,
    create_minimal_table,
)


def _forge_row_tracking(path, mat_id_col=None, mat_rcv_col=None):
    """Rewrite commit 0: rowTracking protocol + per-add baseRowId
    (cumulative row counts, the spec's fresh-id assignment) and
    defaultRowCommitVersion=0."""
    import pyarrow.parquet as pq

    c0 = os.path.join(path, "_delta_log", f"{0:020d}.json")
    acts = [json.loads(ln) for ln in open(c0) if ln.strip()]
    conf = {"delta.enableRowTracking": "true"}
    if mat_id_col:
        conf["delta.rowTracking.materializedRowIdColumnName"] = mat_id_col
    if mat_rcv_col:
        conf[
            "delta.rowTracking.materializedRowCommitVersionColumnName"
        ] = mat_rcv_col
    base = 0
    for a in acts:
        if "protocol" in a:
            a["protocol"] = {
                "minReaderVersion": 1,
                "minWriterVersion": 7,
                "writerFeatures": ["rowTracking", "domainMetadata"],
            }
        elif "metaData" in a:
            a["metaData"]["configuration"] = {
                **(a["metaData"].get("configuration") or {}),
                **conf,
            }
        elif "add" in a:
            a["add"]["baseRowId"] = base
            a["add"]["defaultRowCommitVersion"] = 0
            n = pq.ParquetFile(
                os.path.join(path, a["add"]["path"])
            ).metadata.num_rows
            base += n
    with open(c0, "w") as fh:
        for a in acts:
            fh.write(json.dumps(a) + "\n")


def test_row_ids_from_base_plus_index(spark, tmp_path):
    path = str(tmp_path / "t")
    df = (
        spark.range(0, 100)
        .select(F.col("id").alias("k"), (F.col("id") * 1.0).alias("v"))
        .repartitionByRange(4, "k")
        .sortWithinPartitions("k")
    )
    create_minimal_table(spark, path, df, stats=True)
    _forge_row_tracking(path)
    r = DeltaLogReader(spark, path)
    got = r.read(with_row_ids=True)
    assert "_row_id" in got.columns
    rows = got.collect()
    # ids are unique, dense [0, 100), and stable across reads
    ids = sorted(x._row_id for x in rows)
    assert ids == list(range(100))
    assert all(x._row_commit_version == 0 for x in rows)
    again = {
        x.k: x._row_id
        for x in DeltaLogReader(spark, path)
        .read(with_row_ids=True)
        .collect()
    }
    assert {x.k: x._row_id for x in rows} == again
    # plain reads are unchanged
    assert "_row_id" not in r.read().columns


def test_materialized_ids_override_base(spark, tmp_path):
    path = str(tmp_path / "t")
    # the data file carries a hidden physical column with materialized
    # ids for HALF the rows (the external-rewrite shape)
    df = spark.range(0, 10, 1, 1).select(
        F.col("id").alias("k"),
        F.when(F.col("id") < 5, F.col("id") + 7000).alias("_mat_rid"),
    )
    create_minimal_table(spark, path, df, stats=False)
    # drop the hidden column from the LOGICAL schema
    c0 = os.path.join(path, "_delta_log", f"{0:020d}.json")
    acts = [json.loads(ln) for ln in open(c0) if ln.strip()]
    for a in acts:
        if "metaData" in a:
            sch = json.loads(a["metaData"]["schemaString"])
            sch["fields"] = [
                f for f in sch["fields"] if f["name"] != "_mat_rid"
            ]
            a["metaData"]["schemaString"] = json.dumps(sch)
    with open(c0, "w") as fh:
        for a in acts:
            fh.write(json.dumps(a) + "\n")
    _forge_row_tracking(path, mat_id_col="_mat_rid")
    got = DeltaLogReader(spark, path).read(with_row_ids=True)
    assert got.columns == ["k", "_row_id", "_row_commit_version"]
    by_k = {x.k: x._row_id for x in got.collect()}
    # materialized values win; un-materialized rows fall back to
    # baseRowId + row_index
    assert by_k[3] == 7003
    assert by_k[8] == 8


def test_with_row_ids_refuses_untracked_tables(spark, tmp_path):
    path = str(tmp_path / "t")
    create_minimal_table(
        spark,
        path,
        spark.range(5).select(F.col("id").alias("k")),
    )
    with pytest.raises(UnsupportedDeltaFeature, match="baseRowId"):
        DeltaLogReader(spark, path).read(with_row_ids=True)


def test_cow_dml_preserves_lineage(spark, tmp_path):
    """Round 9 completion: the COPY-ON-WRITE delete and update also
    maintain lineage — rewritten survivors materialize id + commit
    version; a COW update bumps only the matched rows' versions."""
    path = str(tmp_path / "t")
    df = spark.range(0, 50, 1, 1).select(
        F.col("id").alias("k"), (F.col("id") * 1.0).alias("v")
    )
    create_minimal_table(spark, path, df.sortWithinPartitions("k"), stats=True)
    _forge_row_tracking(path)
    r = DeltaLogReader(spark, path)
    v1 = r.delete_where([("k", "<", 5)])
    got = {
        x.k: (x._row_id, x._row_commit_version)
        for x in DeltaLogReader(spark, path)
        .read(with_row_ids=True)
        .collect()
    }
    assert got == {k: (k, 0) for k in range(5, 50)}
    v2 = DeltaLogReader(spark, path).update_where(
        [("k", "=", 30)], {"v": "3030.0"}
    )
    got2 = {
        x.k: (x.v, x._row_id, x._row_commit_version)
        for x in DeltaLogReader(spark, path)
        .read(with_row_ids=True)
        .collect()
    }
    assert got2[30] == (3030.0, 30, v2)  # matched: id kept, version bumps
    assert got2[31] == (31.0, 31, 0)  # untouched survivor: both kept
    assert len(got2) == 45


def test_row_ids_survive_deletion_vectors(spark, tmp_path):
    """Vectors tombstone rows without renumbering survivors: ids are
    positional against the immutable file, so a DV delete just
    removes ids from the set."""
    path = str(tmp_path / "t")
    df = (
        spark.range(0, 100, 1, 1)
        .select(F.col("id").alias("k"), (F.col("id") * 1.0).alias("v"))
        .sortWithinPartitions("k")
    )
    create_minimal_table(spark, path, df, stats=True)
    _forge_row_tracking(path)
    r = DeltaLogReader(spark, path)
    before = {x.k: x._row_id for x in r.read(with_row_ids=True).collect()}
    assert before[50] == 50  # sorted single file: id == k
    # the ENGINE's own DV delete (round 9): id-maintaining DML
    r.delete_where_dv([("k", "in", [0, 1, 50])])
    after = {
        x.k: x._row_id
        for x in DeltaLogReader(spark, path)
        .read(with_row_ids=True)
        .collect()
    }
    assert sorted(after) == [k for k in range(2, 100) if k != 50]
    assert after[99] == 99 and after[2] == 2  # survivors keep ids


def test_append_allocates_fresh_disjoint_ids(spark, tmp_path):
    """commit_append on a rowTracking table allocates baseRowIds from
    the rowIdHighWaterMark domain atomically with the commit: new
    rows get fresh ids disjoint from every id ever assigned — even
    ids retired by an intervening delete are never reissued."""
    import json as _json
    import os as _os

    from introduction_in_big_data_spark.sources.deltalog import (
        commit_append,
    )

    path = str(tmp_path / "t")
    df = spark.range(0, 100, 1, 1).select(
        F.col("id").alias("k"), (F.col("id") * 1.0).alias("v")
    )
    create_minimal_table(spark, path, df.sortWithinPartitions("k"))
    _forge_row_tracking(path)
    # delete retires ids {0,1,2} — the high-water mark must not reuse
    DeltaLogReader(spark, path).delete_where_dv([("k", "<", 3)])
    commit_append(
        spark,
        path,
        spark.createDataFrame([(500, 5.0), (501, 5.1)], "k long, v double"),
    )
    got = {
        x.k: x._row_id
        for x in DeltaLogReader(spark, path)
        .read(with_row_ids=True)
        .collect()
    }
    survivors = {k: got[k] for k in range(3, 100)}
    assert survivors == {k: k for k in range(3, 100)}
    fresh = {got[500], got[501]}
    assert fresh == {100, 101}, "fresh ids continue past the watermark"
    # the domain metadata advanced atomically with the append
    log = _os.path.join(path, "_delta_log")
    last = sorted(
        f for f in _os.listdir(log) if f.endswith(".json")
    )[-1]
    doms = [
        _json.loads(ln)["domainMetadata"]
        for ln in open(_os.path.join(log, last))
        if ln.strip() and "domainMetadata" in _json.loads(ln)
    ]
    assert doms and _json.loads(doms[0]["configuration"]) == {
        "rowIdHighWaterMark": 101
    }
    # a second append continues from the new mark
    commit_append(
        spark, path, spark.createDataFrame([(502, 5.2)], "k long, v double")
    )
    got2 = {
        x.k: x._row_id
        for x in DeltaLogReader(spark, path)
        .read(with_row_ids=True)
        .collect()
    }
    assert got2[502] == 102 and got2[500] == 100


def test_update_where_dv_preserves_ids_via_materialization(spark, tmp_path):
    """A DV UPDATE is PRESERVED row tracking: the updated image keeps
    its OLD row id (materialized column), its commit version bumps to
    the update's version, untouched rows are unchanged."""
    path = str(tmp_path / "t")
    df = spark.range(0, 100, 1, 1).select(
        F.col("id").alias("k"), (F.col("id") * 1.0).alias("v")
    )
    create_minimal_table(spark, path, df.sortWithinPartitions("k"))
    _forge_row_tracking(path)
    ver = DeltaLogReader(spark, path).update_where_dv(
        [("k", "=", 7)], {"v": "777.0"}
    )
    r = DeltaLogReader(spark, path)
    rows = {
        x.k: (x.v, x._row_id, x._row_commit_version)
        for x in r.read(with_row_ids=True).collect()
    }
    assert rows[7] == (777.0, 7, ver), "id preserved, version bumped"
    assert rows[8] == (8.0, 8, 0)
    assert len(rows) == 100
    # the update's image file also carries a fresh baseRowId range:
    # the watermark advanced, so a later insert stays disjoint
    from introduction_in_big_data_spark.sources.deltalog import (
        commit_append,
    )

    commit_append(
        spark, path, spark.createDataFrame([(900, 9.0)], "k long, v double")
    )
    got = {
        x.k: x._row_id
        for x in DeltaLogReader(spark, path)
        .read(with_row_ids=True)
        .collect()
    }
    assert got[900] > 100 and got[900] != got[7]
    # a SECOND update of the same row preserves the materialized id
    DeltaLogReader(spark, path).update_where_dv(
        [("k", "=", 7)], {"v": "7777.0"}
    )
    rows3 = {
        x.k: (x.v, x._row_id)
        for x in DeltaLogReader(spark, path)
        .read(with_row_ids=True)
        .collect()
    }
    assert rows3[7] == (7777.0, 7)


def test_row_lineage_survives_checkpoint_and_vacuum(spark, tmp_path):
    """baseRowId / defaultRowCommitVersion on adds AND the
    rowIdHighWaterMark domain must survive write_checkpoint + vacuum
    of the JSON tail — dropping them would silently re-derive
    different ids and reissue retired ones."""
    import os as _os

    from introduction_in_big_data_spark.sources.deltalog import (
        commit_append,
    )

    path = str(tmp_path / "t")
    df = spark.range(0, 50, 1, 1).select(
        F.col("id").alias("k"), (F.col("id") * 1.0).alias("v")
    )
    create_minimal_table(spark, path, df.sortWithinPartitions("k"))
    _forge_row_tracking(path)
    DeltaLogReader(spark, path).delete_where_dv([("k", "<", 5)])
    t = DeltaLogReader(spark, path)
    cp = t.write_checkpoint()
    log = _os.path.join(path, "_delta_log")
    for v in range(cp + 1):
        _os.unlink(_os.path.join(log, f"{v:020d}.json"))
    got = {
        x.k: x._row_id
        for x in DeltaLogReader(spark, path)
        .read(with_row_ids=True)
        .collect()
    }
    assert got == {k: k for k in range(5, 50)}
    # watermark survived: a post-vacuum insert gets id 50, not 0
    commit_append(
        spark, path, spark.createDataFrame([(600, 6.0)], "k long, v double")
    )
    got2 = {
        x.k: x._row_id
        for x in DeltaLogReader(spark, path)
        .read(with_row_ids=True)
        .collect()
    }
    assert got2[600] == 50


def test_optimize_preserves_ids_and_commit_versions(spark, tmp_path):
    """Round 9: OPTIMIZE on a rowTracking table materializes every
    survivor's row id AND commit version into the rewritten files —
    compaction mixes rows of files with different baseRowIds and
    defaultRowCommitVersions, so both must ride the materialized
    columns. DV purge composes: tombstoned rows vanish, survivors
    keep lineage."""
    from introduction_in_big_data_spark.sources.deltalog import (
        commit_append,
    )

    path = str(tmp_path / "t")
    df = spark.range(0, 60, 1, 1).select(
        F.col("id").alias("k"), (F.col("id") * 1.0).alias("v")
    )
    create_minimal_table(spark, path, df.sortWithinPartitions("k"))
    _forge_row_tracking(path)
    # append at v1: ids 60..79, commit version 1
    commit_append(
        spark,
        path,
        spark.range(100, 120, 1, 1)
        .select(F.col("id").alias("k"), (F.col("id") * 1.0).alias("v"))
        .sortWithinPartitions("k"),
    )
    # DV delete at v2
    DeltaLogReader(spark, path).delete_where_dv([("k", "<", 5)])
    before = {
        x.k: (x._row_id, x._row_commit_version)
        for x in DeltaLogReader(spark, path)
        .read(with_row_ids=True)
        .collect()
    }
    assert before[100] == (60, 1) and before[10] == (10, 0)

    ver = DeltaLogReader(spark, path).optimize(target_bytes=1 << 30)
    after = {
        x.k: (x._row_id, x._row_commit_version)
        for x in DeltaLogReader(spark, path)
        .read(with_row_ids=True)
        .collect()
    }
    assert after == before, "ids and commit versions stable through OPTIMIZE"
    # the table now reads vector-free (purge) with intact lineage
    assert len(after) == 75  # 80 minus the 5 DV-deleted
    # watermark advanced past the rewrite's fresh file ranges: a new
    # append cannot collide with any id ever assigned
    commit_append(
        spark, path, spark.createDataFrame([(900, 9.0)], "k long, v double")
    )
    got = {
        x.k: x._row_id
        for x in DeltaLogReader(spark, path)
        .read(with_row_ids=True)
        .collect()
    }
    assert got[900] not in {rid for rid, _ in before.values()}
    # second optimize after zorder also keeps lineage (mat columns
    # in the input files now carry the ids)
    DeltaLogReader(spark, path).optimize(
        target_bytes=1 << 10, zorder_by=("k", "v")
    )
    final = {
        x.k: (x._row_id, x._row_commit_version)
        for x in DeltaLogReader(spark, path)
        .read(with_row_ids=True)
        .collect()
    }
    assert {k: rv for k, rv in final.items() if k != 900} == before


def test_merge_preserves_matched_ids_and_allocates_inserts(spark, tmp_path):
    """Round 9: MERGE on a rowTracking table — survivors keep id and
    commit version, matched rows keep the OLD row's id with the
    merge's commit version, inserts get fresh disjoint ids."""
    path = str(tmp_path / "t")
    df = spark.range(0, 50, 1, 1).select(
        F.col("id").alias("k"), (F.col("id") * 1.0).alias("v")
    )
    create_minimal_table(spark, path, df.sortWithinPartitions("k"), stats=True)
    _forge_row_tracking(path)
    ver = DeltaLogReader(spark, path).merge(
        spark.createDataFrame(
            [(10, 1010.0), (20, 1020.0), (500, 5.0)], "k long, v double"
        ),
        "k",
    )
    got = {
        x.k: (x.v, x._row_id, x._row_commit_version)
        for x in DeltaLogReader(spark, path)
        .read(with_row_ids=True)
        .collect()
    }
    assert len(got) == 51
    # survivors: untouched lineage
    assert got[5] == (5.0, 5, 0)
    assert got[49] == (49.0, 49, 0)
    # matched: OLD id, NEW commit version
    assert got[10] == (1010.0, 10, ver)
    assert got[20] == (1020.0, 20, ver)
    # insert: fresh id past the watermark, new commit version
    assert got[500][0] == 5.0 and got[500][1] >= 50
    assert got[500][2] == ver
    # a second merge composes (materialized columns now in the files)
    ver2 = DeltaLogReader(spark, path).merge(
        spark.createDataFrame([(10, 2010.0)], "k long, v double"), "k"
    )
    got2 = {
        x.k: (x.v, x._row_id, x._row_commit_version)
        for x in DeltaLogReader(spark, path)
        .read(with_row_ids=True)
        .collect()
    }
    assert got2[10] == (2010.0, 10, ver2)
    assert got2[5] == (5.0, 5, 0)
    assert got2[500] == got[500]


def test_streaming_sink_composes_with_lineage(spark, tmp_path):
    """delta_append_sink's exactly-once appends ride commit_append's
    id allocation: batches get disjoint id ranges, and a REPLAYED
    micro-batch neither re-appends nor re-allocates (the watermark
    and the SetTransaction gate commit atomically)."""
    from introduction_in_big_data_spark.sources.deltalog import (
        delta_append_sink,
    )

    path = str(tmp_path / "t")
    df = spark.range(0, 20, 1, 1).select(
        F.col("id").alias("k"), (F.col("id") * 1.0).alias("v")
    )
    create_minimal_table(spark, path, df.sortWithinPartitions("k"))
    _forge_row_tracking(path)
    sink = delta_append_sink(path, "app-rt")
    b1 = spark.createDataFrame([(100, 1.0), (101, 1.1)], "k long, v double")
    b2 = spark.createDataFrame([(200, 2.0)], "k long, v double")
    sink(b1, 0)
    sink(b2, 1)
    sink(b1, 0)  # replay: no-op
    got = {
        x.k: x._row_id
        for x in DeltaLogReader(spark, path)
        .read(with_row_ids=True)
        .collect()
    }
    assert len(got) == 23
    assert {got[100], got[101]} == {20, 21}
    assert got[200] == 22


def test_cdf_composes_with_row_tracking(spark, tmp_path):
    """changes() on a CDF + rowTracking table: the DV delete's feed
    renders exactly the deleted rows; the extra domainMetadata /
    metaData actions in lineage commits never leak into the feed."""
    path = str(tmp_path / "t")
    df = spark.range(0, 30, 1, 1).select(
        F.col("id").alias("k"), (F.col("id") * 1.0).alias("v")
    )
    create_minimal_table(spark, path, df.sortWithinPartitions("k"))
    # enable CDF in commit 0 config, then forge row tracking
    import json as _json
    import os as _os

    c0 = _os.path.join(path, "_delta_log", f"{0:020d}.json")
    acts = [_json.loads(ln) for ln in open(c0) if ln.strip()]
    for a in acts:
        if "metaData" in a:
            a["metaData"]["configuration"] = {
                "delta.enableChangeDataFeed": "true"
            }
    with open(c0, "w") as fh:
        for a in acts:
            fh.write(_json.dumps(a) + "\n")
    _forge_row_tracking(path)
    r = DeltaLogReader(spark, path)
    v = r.delete_where_dv([("k", "<", 3)])
    feed = DeltaLogReader(spark, path).changes(v - 1, v)
    rows = {(x.k, x._change_type) for x in feed.collect()}
    assert rows == {(0, "delete"), (1, "delete"), (2, "delete")}
    # an UPDATE's feed on this CDF table renders pre/postimages of the
    # matched row only (round 11, ADVICE r10: DV updates stage cdc on
    # CDF tables — same tagging as the rewriting update_where)
    v2 = DeltaLogReader(spark, path).update_where_dv(
        [("k", "=", 10)], {"v": "1010.0"}
    )
    feed2 = DeltaLogReader(spark, path).changes(v2 - 1, v2)
    rows2 = {(x.k, x.v, x._change_type) for x in feed2.collect()}
    assert rows2 == {
        (10, 10.0, "update_preimage"),
        (10, 1010.0, "update_postimage"),
    }
