"""Predicate-driven DELETE via DELETION VECTORS on externally-written
Delta tables (DeltaLogReader.delete_where_dv, round 7): row-level
deletes with ZERO data files rewritten — the protocol's reader-v3
fast path, plus CDF derivation of the deleted rows from the bitmap
diff (changes() needs no cdc actions for DV commits)."""

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


def _data_files(path):
    out = {}
    for root, _dirs, files in os.walk(path):
        if "_delta_log" in root:
            continue
        for f in files:
            if f.endswith(".parquet"):
                full = os.path.join(root, f)
                out[full] = (os.path.getsize(full), os.path.getmtime(full))
    return out


def test_dv_delete_rewrites_nothing_and_prunes(spark, tmp_path):
    path = str(tmp_path / "t")
    create_minimal_table(
        spark, path, _df(spark).repartitionByRange(6, "k"), stats=True
    )
    r = DeltaLogReader(spark, path)
    before = _data_files(path)
    v = r.delete_where_dv([("k", ">=", 1000), ("k", "<", 1100)])
    # every data file byte-identical: the delete wrote only a .bin
    assert _data_files(path) == before
    bins = [f for f in os.listdir(path) if f.endswith(".bin")]
    assert len(bins) == 1
    acts = _commit_actions(path, v)
    adds = [a["add"] for a in acts if "add" in a]
    # skipping drove the write side: only the file(s) covering
    # [1000, 1100) get a vector; provably-unaffected files need no
    # action at all (and there are no removes in a pure DV commit)
    assert 1 <= len(adds) <= 2
    assert not [a for a in acts if "remove" in a]
    assert all(a["deletionVector"]["storageType"] == "u" for a in adds)
    assert sum(a["deletionVector"]["cardinality"] for a in adds) == 100
    protos = [a["protocol"] for a in acts if "protocol" in a]
    assert protos and protos[0]["minReaderVersion"] == 3
    assert "deletionVectors" in protos[0]["readerFeatures"]
    got = sorted(x.k for x in r.read().collect())
    assert got == list(range(1000)) + list(range(1100, 1200))
    # no-op deletes publish no commit: provably (stats) and actually
    assert r.delete_where_dv([("k", ">=", 5000)]) == v
    assert r.delete_where_dv([("k", ">=", 1000), ("k", "<", 1100)]) == v


def test_dv_delete_merges_with_existing_vector(spark, tmp_path):
    path = str(tmp_path / "t")
    create_minimal_table(
        spark, path, _df(spark).repartition(1), stats=True
    )
    r = DeltaLogReader(spark, path)
    v1 = r.delete_where_dv([("k", "<", 10)])
    v2 = r.delete_where_dv([("k", ">=", 5), ("k", "<", 20)])
    assert v2 == v1 + 1
    adds = [a["add"] for a in _commit_actions(path, v2) if "add" in a]
    assert len(adds) == 1
    # merged bitmap: [0,10) ∪ [5,20) = 20 positions
    assert adds[0]["deletionVector"]["cardinality"] == 20
    assert sorted(x.k for x in r.read().collect()) == list(range(20, 1200))
    # time travel unwinds vectors version by version
    assert DeltaLogReader(spark, path).read(version=v1).count() == 1190
    assert DeltaLogReader(spark, path).read(version=0).count() == 1200


def test_dv_delete_partition_predicate_is_metadata_only(spark, tmp_path):
    path = str(tmp_path / "t")
    create_minimal_table(
        spark, path, _df(spark), partition_by=["p"], stats=True
    )
    r = DeltaLogReader(spark, path)
    v = r.delete_where_dv([("p", "=", 1)])
    acts = _commit_actions(path, v)
    assert not [a for a in acts if "add" in a]
    assert [a for a in acts if "remove" in a]  # whole-partition drop
    assert not [f for f in os.listdir(path) if f.endswith(".bin")]
    assert r.read().filter(F.col("p") == 1).count() == 0
    assert r.read().count() == 800
    # mixed predicate: partition conjunct prunes to p=2, data conjunct
    # writes vectors only there
    v2 = r.delete_where_dv([("p", "=", 2), ("k", "<", 30)])
    adds = [a["add"] for a in _commit_actions(path, v2) if "add" in a]
    assert adds and all(
        a["partitionValues"] == {"p": "2"} for a in adds
    )
    assert r.read().count() == 800 - 10  # k in {2,5,...,29}: 10 rows


def test_dv_delete_null_predicate_rows_survive(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.range(0, 100).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 10 == 0, None)
        .otherwise(F.col("id"))
        .alias("v"),
    )
    create_minimal_table(spark, path, df.repartition(1), stats=True)
    r = DeltaLogReader(spark, path)
    r.delete_where_dv([("v", "<", 50)])
    left = r.read()
    # v IS NULL rows evaluate the predicate to NULL and survive
    assert left.filter(F.col("v").isNull()).count() == 10
    assert left.count() == 10 + 45  # nulls + v in [50, 100) non-null


def test_changes_derives_deletes_from_dv_diff(spark, tmp_path):
    path = str(tmp_path / "t")
    create_minimal_table(
        spark, path, _df(spark).repartition(2), stats=True, cdf=True
    )
    r = DeltaLogReader(spark, path)
    acts_before = len(
        [f for f in os.listdir(path) if f.endswith(".bin")]
    )
    v1 = r.delete_where_dv([("k", "<", 7)])
    v2 = r.delete_where_dv([("k", ">=", 5), ("k", "<", 12)])
    # no cdc files were written: the feed derives from the bitmaps
    assert not os.path.isdir(os.path.join(path, "_change_data"))
    ch = r.changes(0, v2).collect()
    by_v = {}
    for row in ch:
        by_v.setdefault(row["_commit_version"], []).append(row)
    assert sorted(x.k for x in by_v[v1]) == list(range(7))
    assert all(x["_change_type"] == "delete" for x in by_v[v1])
    # the second delete emits ONLY the newly-tombstoned rows: the
    # overlap [5, 7) was already deleted and must not re-emit
    assert sorted(x.k for x in by_v[v2]) == list(range(7, 12))
    assert acts_before == 0


def test_changes_renders_born_with_dv_file(spark, tmp_path):
    """A NEW file added WITH a deletion vector (Databricks/photon
    MERGE shape) inserts only its live complement — the birth-
    tombstoned positions were never visible — and later vector growth
    diffs against the BIRTH bitmap, not an empty one (VERDICT r7
    item 2)."""
    from introduction_in_big_data_spark.sources.deltalog import (
        commit_add_with_dv,
    )

    path = str(tmp_path / "t")
    create_minimal_table(
        spark, path, _df(spark).repartition(1), stats=True
    )
    r = DeltaLogReader(spark, path)
    new_rows = spark.range(2000, 2020, 1, 1).select(
        F.col("id").alias("k"),
        (F.col("id") % 3).cast("int").alias("p"),
        F.lit(-1.0).alias("v"),
    )
    v1 = commit_add_with_dv(spark, path, new_rows, [0, 1, 2, 3, 4])
    # snapshot read applies the birth vector
    assert r.read().filter("k >= 2000").count() == 15
    # CDF: only the live complement renders, as inserts
    ch = r.changes(v1 - 1, v1).collect()
    assert all(x["_change_type"] == "insert" for x in ch)
    assert sorted(x.k for x in ch) == list(range(2005, 2020))
    # later growth on the same file diffs against the birth bitmap:
    # k in [2000, 2008) matches positions 0..7, of which 0..4 were
    # dead from birth — only 2005..2007 newly delete
    v2 = r.delete_where_dv([("k", ">=", 2000), ("k", "<", 2008)])
    ch2 = r.changes(v1, v2).collect()
    assert all(x["_change_type"] == "delete" for x in ch2)
    assert sorted(x.k for x in ch2) == [2005, 2006, 2007]


def test_dv_delete_on_column_mapped_tables_works(spark, tmp_path):
    """Round 8: deletion-vector DML threads the physical-name
    indirection — mapped tables vector-delete instead of refusing."""
    path = str(tmp_path / "t")
    create_column_mapped_table(
        spark, path, spark.range(5).select(F.col("id").alias("k")),
        stats=True,
    )
    r = DeltaLogReader(spark, path)
    r.delete_where_dv([("k", "<", 2)])
    assert sorted(x.k for x in r.read().collect()) == [2, 3, 4]


def test_update_where_dv_rewrites_nothing(spark, tmp_path):
    path = str(tmp_path / "t")
    create_minimal_table(
        spark, path, _df(spark).repartitionByRange(6, "k"), stats=True
    )
    r = DeltaLogReader(spark, path)
    before = _data_files(path)
    v = r.update_where_dv([("k", ">=", 1000), ("k", "<", 1010)], {"v": "v + 0.5"})
    # originals byte-identical; the commit wrote a bitmap + ONE new file
    for p, sig in before.items():
        assert _data_files(path)[p] == sig
    acts = _commit_actions(path, v)
    dv_adds = [a["add"] for a in acts if "add" in a and a["add"].get("deletionVector")]
    img_adds = [a["add"] for a in acts if "add" in a and not a["add"].get("deletionVector")]
    assert len(dv_adds) == 1 and len(img_adds) == 1
    assert dv_adds[0]["deletionVector"]["cardinality"] == 10
    assert "stats" in img_adds[0]
    got = r.read()
    assert got.count() == 1200
    updated = got.filter((F.col("k") >= 1000) & (F.col("k") < 1010))
    assert sorted(x.v for x in updated.collect()) == [
        k + 0.5 for k in range(1000, 1010)
    ]
    assert got.filter(F.col("v") == 999.0).count() == 1  # others untouched
    # provably-no-match publishes nothing
    assert r.update_where_dv([("k", ">=", 9000)], {"v": "0.0"}) == v


def test_update_where_dv_partitioned_and_stacked(spark, tmp_path):
    path = str(tmp_path / "t")
    create_minimal_table(
        spark, path, _df(spark), partition_by=["p"], stats=True
    )
    r = DeltaLogReader(spark, path)
    v = r.update_where_dv([("p", "=", 1), ("k", "<", 10)], {"v": "v * 10"})
    adds = [a["add"] for a in _commit_actions(path, v) if "add" in a]
    assert all(a["partitionValues"] == {"p": "1"} for a in adds)
    # k in {1,4,7}: three rows moved to v*10, partition preserved
    got = r.read().filter((F.col("p") == 1) & (F.col("k") < 10))
    assert sorted(x.v for x in got.collect()) == [10.0, 40.0, 70.0]
    assert r.read().count() == 1200
    # a DV DELETE stacked on the update tombstones the IMAGE file too
    r.delete_where_dv([("k", "=", 4)])
    assert r.read().count() == 1199
    assert r.read().filter(F.col("k") == 4).count() == 0


def test_update_where_dv_refuses_partition_assignment(spark, tmp_path):
    path = str(tmp_path / "t")
    create_minimal_table(spark, path, _df(spark), partition_by=["p"])
    with pytest.raises(ValueError, match="partition columns"):
        DeltaLogReader(spark, path).update_where_dv(
            [("k", "<", 5)], {"p": "2"}
        )


def test_changes_renders_dv_update_as_delete_plus_insert(spark, tmp_path):
    # CDF OFF: no cdc files to write — the feed derives delete (bitmap
    # diff) + insert (appended images), the signed-delta equivalent
    path = str(tmp_path / "t")
    create_minimal_table(
        spark, path, _df(spark).repartition(2), stats=True
    )
    r = DeltaLogReader(spark, path)
    v = r.update_where_dv([("k", "<", 5)], {"v": "v + 100"})
    ch = r.changes(v - 1, v).collect()
    dels = sorted((x.k, x.v) for x in ch if x["_change_type"] == "delete")
    ins = sorted((x.k, x.v) for x in ch if x["_change_type"] == "insert")
    assert dels == [(k, float(k)) for k in range(5)]
    assert ins == [(k, float(k) + 100) for k in range(5)]


def test_dv_update_on_cdf_table_stages_pre_postimages(spark, tmp_path):
    """CDF ON: update_where_dv stages update_preimage/update_postimage
    cdc files (the tagging delta-spark writes for DV updates), so the
    feed's change types do not depend on the table's physical state —
    and the auto-routed plain update_where emits the SAME tagging on a
    DV-carrying table (ADVICE r10)."""
    path = str(tmp_path / "t")
    create_minimal_table(
        spark, path, _df(spark).repartition(2), stats=True, cdf=True
    )
    r = DeltaLogReader(spark, path)
    v1 = r.update_where_dv([("k", "<", 5)], {"v": "v + 100"})
    acts = _commit_actions(path, v1)
    assert [a for a in acts if "cdc" in a], "DV update on CDF staged cdc"
    ch = r.changes(v1 - 1, v1).collect()
    pre = sorted((x.k, x.v) for x in ch if x["_change_type"] == "update_preimage")
    post = sorted((x.k, x.v) for x in ch if x["_change_type"] == "update_postimage")
    assert pre == [(k, float(k)) for k in range(5)]
    assert post == [(k, float(k) + 100) for k in range(5)]
    # nothing renders as delete/insert for this commit (cdc is the
    # complete change description)
    assert not [x for x in ch if x["_change_type"] in ("delete", "insert")]
    # the table now carries DVs: plain update_where auto-routes and
    # must keep the SAME CDF contract
    v2 = r.update_where([("k", ">=", 5), ("k", "<", 8)], {"v": "v * -1"})
    ch2 = r.changes(v1, v2).collect()
    pre2 = sorted(x.k for x in ch2 if x["_change_type"] == "update_preimage")
    post2 = sorted((x.k, x.v) for x in ch2 if x["_change_type"] == "update_postimage")
    assert pre2 == [5, 6, 7]
    assert post2 == [(k, -float(k)) for k in range(5, 8)]
    # snapshot correctness after both commits
    got = {x.k: x.v for x in r.read().filter(F.col("k") < 10).collect()}
    assert got == {
        **{k: float(k) + 100 for k in range(5)},
        **{k: -float(k) for k in range(5, 8)},
        **{k: float(k) for k in range(8, 10)},
    }


def test_merge_on_dv_table_never_resurrects(spark, tmp_path):
    path = str(tmp_path / "t")
    create_minimal_table(
        spark, path, _df(spark).repartitionByRange(4, "k"), stats=True
    )
    r = DeltaLogReader(spark, path)
    r.delete_where_dv([("k", ">=", 100), ("k", "<", 200)])
    # source hits the vectored file's range: upsert k=150 (tombstoned:
    # behaves as INSERT) and k=50 (live: whole-row update)
    src = spark.createDataFrame(
        [(150, 0, -1.0), (50, 2, -2.0)], "k long, p int, v double"
    )
    r.merge(src, "k")
    got = r.read()
    assert got.count() == 1200 - 100 + 1  # 100 deleted, 150 re-inserted
    assert [x.v for x in got.filter(F.col("k") == 150).collect()] == [-1.0]
    assert [x.v for x in got.filter(F.col("k") == 50).collect()] == [-2.0]
    # no other tombstoned row came back
    assert got.filter((F.col("k") >= 100) & (F.col("k") < 200)).count() == 1
    # rewriting the hit file retired its vector
    _m, live = r._replay(r.latest_version())
    cards = [
        a["deletionVector"]["cardinality"]
        for a in live.values()
        if a.get("deletionVector")
    ]
    assert cards == []  # the only vectored file was the hit file


def test_merge_on_dv_table_cdf_preimages_exclude_tombstones(
    spark, tmp_path
):
    path = str(tmp_path / "t")
    create_minimal_table(
        spark, path, _df(spark).repartition(1), stats=True, cdf=True
    )
    r = DeltaLogReader(spark, path)
    # rewriting update_where (CDF) first, then a DV delete, then merge
    v1 = r.delete_where_dv([("k", "<", 5)])
    src = spark.createDataFrame([(3, 0, -3.0)], "k long, p int, v double")
    v2 = r.merge(src, "k")
    ch = [x for x in r.changes(v1, v2).collect()]
    # k=3 was tombstoned: the merge sees NO matched row, so the feed
    # is a pure insert — no preimage for a row that logically did not
    # exist
    assert sorted(x["_change_type"] for x in ch if x.k == 3) == ["insert"]
    assert not [x for x in ch if x["_change_type"] == "update_preimage" and x.k < 5]


def test_optimize_purges_deletion_vectors(spark, tmp_path):
    path = str(tmp_path / "t")
    create_minimal_table(
        spark, path, _df(spark).repartitionByRange(4, "k"), stats=True
    )
    r = DeltaLogReader(spark, path)
    r.delete_where_dv([("k", ">=", 100), ("k", "<", 500)])
    v = r.optimize()
    acts = _commit_actions(path, v)
    adds = [a["add"] for a in acts if "add" in a]
    assert adds and all("deletionVector" not in a for a in adds)
    assert all(a["dataChange"] is False for a in adds)
    # post-purge snapshot: no DV adds left, same logical rows
    _m, live = r._replay(v)
    assert not any(a.get("deletionVector") for a in live.values())
    got = sorted(x.k for x in r.read().collect())
    assert got == list(range(100)) + list(range(500, 1200))
    # CDF sees nothing from the compaction itself
    ch = r.changes(v - 1, v)
    assert ch.count() == 0


def test_optimize_drops_fully_tombstoned_output(spark, tmp_path):
    path = str(tmp_path / "t")
    create_minimal_table(
        spark, path, _df(spark).repartitionByRange(4, "k"), stats=True
    )
    r = DeltaLogReader(spark, path)
    # tombstone EVERY row of the files covering [0, 600): their purge
    # output is empty and must not be referenced
    r.delete_where_dv([("k", "<", 600)])
    v = r.optimize()
    assert sorted(x.k for x in r.read().collect()) == list(
        range(600, 1200)
    )
    _m, live = r._replay(v)
    assert not any(a.get("deletionVector") for a in live.values())


def test_vacuum_reclaims_purged_dv_bin(spark, tmp_path):
    path = str(tmp_path / "t")
    create_minimal_table(
        spark, path, _df(spark).repartition(1), stats=True
    )
    r = DeltaLogReader(spark, path)
    r.delete_where_dv([("k", "<", 100)])
    bins = [f for f in os.listdir(path) if f.endswith(".bin")]
    assert len(bins) == 1
    r.optimize()
    # the purge snapshot is retained AND the pre-purge one: bin stays
    r.vacuum(keep_last=2)
    assert os.path.exists(os.path.join(path, bins[0]))
    # retain only the purged snapshot: the orphaned bin reclaims
    r.vacuum(keep_last=1)
    assert not os.path.exists(os.path.join(path, bins[0]))
    assert r.read().count() == 1100


def test_vacuum_keeps_referenced_dv_bin(spark, tmp_path):
    path = str(tmp_path / "t")
    create_minimal_table(
        spark, path, _df(spark).repartition(1), stats=True
    )
    r = DeltaLogReader(spark, path)
    r.delete_where_dv([("k", "<", 100)])
    bins = [f for f in os.listdir(path) if f.endswith(".bin")]
    assert len(bins) == 1
    r.vacuum(keep_last=1)
    assert os.path.exists(os.path.join(path, bins[0]))
    assert r.read().count() == 1100


def test_changes_removed_dv_file_emits_only_live_rows(spark, tmp_path):
    """A whole-file remove of a file that already carries a deletion
    vector renders ONLY the file's live rows as deletes: the
    tombstoned positions were emitted by the commit that grew the
    vector, and re-emitting them would double-count in the feed
    (ADVICE r7, high)."""
    path = str(tmp_path / "t")
    create_minimal_table(
        spark, path, _df(spark), partition_by=["p"], stats=True
    )
    r = DeltaLogReader(spark, path)
    # tombstone k < 30 within p=1 via a vector (10 rows: 1,4,...,28)
    v1 = r.delete_where_dv([("p", "=", 1), ("k", "<", 30)])
    # whole-partition drop: metadata-only removes of the SAME files,
    # which now carry vectors
    v2 = r.delete_where_dv([("p", "=", 1)])
    ch = r.changes(v1, v2).collect()
    assert all(x["_change_type"] == "delete" for x in ch)
    got = sorted(x.k for x in ch)
    expected = [k for k in range(1, 1200, 3) if k >= 30]
    assert got == expected
    # and the full feed from v0 emits every p=1 row exactly once
    full = r.changes(0, v2).collect()
    all_ks = sorted(x.k for x in full)
    assert all_ks == list(range(1, 1200, 3))


def test_changes_and_replay_survive_remove_after_add_dv_commit(
    spark, tmp_path
):
    """External DV writers pair add(path, newDV) with remove(path) in
    one commit; when the remove serializes AFTER the add, within-
    commit reconciliation still keeps the path live with the new
    vector (add supersedes remove) — in the snapshot replay AND the
    feed's live-set tracker (ADVICE r7, medium)."""
    path = str(tmp_path / "t")
    create_minimal_table(
        spark, path, _df(spark).repartition(1), stats=True
    )
    r = DeltaLogReader(spark, path)
    v1 = r.delete_where_dv([("k", "<", 5)])
    c1 = os.path.join(path, "_delta_log", f"{v1:020d}.json")
    acts = [json.loads(ln) for ln in open(c1) if ln.strip()]
    add = next(a["add"] for a in acts if "add" in a)
    acts.append(
        {
            "remove": {
                "path": add["path"],
                "deletionTimestamp": 0,
                "dataChange": True,
            }
        }
    )
    with open(c1, "w") as fh:
        for a in acts:
            fh.write(json.dumps(a) + "\n")
    # snapshot replay: the file stays live under its new vector
    assert sorted(x.k for x in r.read().collect()) == list(range(5, 1200))
    # a later DV commit on the same path still renders in the feed
    # (the old tracker popped the entry and raised spuriously here)
    v2 = r.delete_where_dv([("k", ">=", 5), ("k", "<", 9)])
    by_v: dict[int, list[int]] = {}
    for row in r.changes(0, v2).collect():
        by_v.setdefault(row["_commit_version"], []).append(row.k)
    assert sorted(by_v[v1]) == list(range(5))
    assert sorted(by_v[v2]) == list(range(5, 9))


def test_dv_protocol_upgrade_seeds_legacy_writer_features(spark, tmp_path):
    """Upgrading a legacy protocol to (3, 7) seeds writerFeatures with
    everything the old version NUMBER implied (spec upgrade rule) —
    dropping them would let a conformant external writer stop
    honoring e.g. delta.enableChangeDataFeed (ADVICE r7, medium)."""
    path = str(tmp_path / "t")
    create_minimal_table(
        spark, path, _df(spark).repartition(1), stats=True
    )
    c0 = os.path.join(path, "_delta_log", f"{0:020d}.json")
    acts = [json.loads(ln) for ln in open(c0) if ln.strip()]
    for a in acts:
        if "protocol" in a:
            a["protocol"] = {"minReaderVersion": 1, "minWriterVersion": 4}
    with open(c0, "w") as fh:
        for a in acts:
            fh.write(json.dumps(a) + "\n")
    r = DeltaLogReader(spark, path)
    v = r.delete_where_dv([("k", "<", 3)])
    proto = next(
        a["protocol"] for a in _commit_actions(path, v) if "protocol" in a
    )
    assert proto["minWriterVersion"] == 7
    assert {
        "appendOnly", "invariants", "checkConstraints",
        "changeDataFeed", "generatedColumns", "deletionVectors",
    } <= set(proto["writerFeatures"])
    # v6-only features do NOT leak into a v4 upgrade
    assert "identityColumns" not in proto["writerFeatures"]
    assert "columnMapping" not in proto["writerFeatures"]
    # the upgraded table still reads and accepts further DML
    assert r.read().count() == 1197
    r.delete_where_dv([("k", ">=", 3), ("k", "<", 6)])
    assert r.read().count() == 1194


def test_plain_dml_autoroutes_to_dv_variants(spark, tmp_path):
    """Round 10 (VERDICT r9 item 6): plain-named delete_where /
    update_where on a table whose live adds carry deletion vectors
    must succeed by routing to the merge-on-read variants — identical
    logical results to calling the _dv names, no data file rewritten —
    instead of refusing. Callers shouldn't need to know the table's
    physical state to spell DELETE."""
    pa = str(tmp_path / "a")
    pb = str(tmp_path / "b")
    for p in (pa, pb):
        create_minimal_table(
            spark, p, _df(spark).repartitionByRange(6, "k"), stats=True
        )
    ra, rb = DeltaLogReader(spark, pa), DeltaLogReader(spark, pb)
    # put both tables into DV land first
    for r in (ra, rb):
        r.delete_where_dv([("k", ">=", 1000), ("k", "<", 1050)])
    files_before = _data_files(pa)

    # plain names on table a, _dv names on table b: same results
    ra.delete_where([("k", "<", 100)])
    rb.delete_where_dv([("k", "<", 100)])
    ra.update_where([("k", ">=", 200), ("k", "<", 210)], {"v": "v + 1000.0"})
    rb.update_where_dv([("k", ">=", 200), ("k", "<", 210)], {"v": "v + 1000.0"})
    got_a = sorted((x.k, x.v) for x in ra.read().collect())
    got_b = sorted((x.k, x.v) for x in rb.read().collect())
    assert got_a == got_b
    assert len(got_a) == 1200 - 50 - 100
    assert [v for k, v in got_a if 200 <= k < 210] == [
        float(k) + 1000.0 for k in range(200, 210)
    ]
    # the routed delete stayed merge-on-read: the update appended new
    # image files, but no pre-existing data file was rewritten
    after = _data_files(pa)
    assert all(after[f] == files_before[f] for f in files_before)


def test_plain_dml_on_vectorless_table_still_rewrites(spark, tmp_path):
    """The auto-route only fires when live adds actually carry
    vectors: a plain table keeps copy-on-write delete_where (removes +
    survivor rewrites, no .bin files)."""
    path = str(tmp_path / "t")
    create_minimal_table(
        spark, path, _df(spark).repartitionByRange(6, "k"), stats=True
    )
    r = DeltaLogReader(spark, path)
    v = r.delete_where([("k", "<", 100)])
    acts = _commit_actions(path, v)
    assert [a for a in acts if "remove" in a], "COW delete must remove"
    assert not [f for f in os.listdir(path) if f.endswith(".bin")]
    assert sorted(x.k for x in r.read().collect()) == list(range(100, 1200))
