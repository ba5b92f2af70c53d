"""Delta transaction-log reader interop tests.

No delta-spark jar exists in this image, so these tests construct
tables that conform to the PUBLISHED protocol (delta-io PROTOCOL.md:
JSON commits of protocol/metaData/add/remove actions, string-encoded
partitionValues, classic parquet checkpoints + _last_checkpoint) and
assert the reader replays them exactly — log reconciliation order,
partition-column materialization, time travel, checkpoint handoff, and
unsupported-feature refusal.
"""

from __future__ import annotations

import json
import os
import uuid

import pytest
from pyspark.sql import functions as F

from introduction_in_big_data_spark.sources.deltalog import (
    DeltaLogReader,
    UnsupportedDeltaFeature,
)

SCHEMA_JSON = json.dumps(
    {
        "type": "struct",
        "fields": [
            {"name": "k", "type": "long", "nullable": True, "metadata": {}},
            {"name": "v", "type": "double", "nullable": True, "metadata": {}},
        ],
    }
)


def _meta(schema_json=SCHEMA_JSON, partition_cols=()):
    return {
        "metaData": {
            "id": str(uuid.uuid4()),
            "format": {"provider": "parquet", "options": {}},
            "schemaString": schema_json,
            "partitionColumns": list(partition_cols),
            "configuration": {},
            "createdTime": 0,
        }
    }


def _protocol(reader=1, writer=2):
    return {"protocol": {"minReaderVersion": reader, "minWriterVersion": writer}}


def _write_data(spark, table_dir, rows, schema="k long, v double", sub="part-0"):
    """Write one parquet data file; return its table-relative path."""
    tmp = os.path.join(table_dir, "__stage", uuid.uuid4().hex)
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(tmp)
    fname = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
    rel = f"{sub}-{uuid.uuid4().hex}.parquet"
    os.renames(os.path.join(tmp, fname), os.path.join(table_dir, rel))
    return rel


def _commit(table_dir, version, actions):
    log = os.path.join(table_dir, "_delta_log")
    os.makedirs(log, exist_ok=True)
    with open(os.path.join(log, f"{version:020d}.json"), "w") as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")


def _add(path, partition_values=None):
    return {
        "add": {
            "path": path,
            "partitionValues": partition_values or {},
            "size": 1,
            "modificationTime": 0,
            "dataChange": True,
        }
    }


def _remove(path):
    return {"remove": {"path": path, "deletionTimestamp": 0, "dataChange": True}}


def test_read_latest_and_time_travel(spark, tmp_path):
    d = str(tmp_path / "t1")
    os.makedirs(d)
    f0 = _write_data(spark, d, [(1, 1.0), (2, 2.0)])
    _commit(d, 0, [_protocol(), _meta(), _add(f0)])
    f1 = _write_data(spark, d, [(3, 3.0)])
    _commit(d, 1, [_add(f1)])
    # v2 rewrites f0 (e.g. a DELETE of k=1): remove + add survivor file
    f2 = _write_data(spark, d, [(2, 2.0)])
    _commit(d, 2, [_remove(f0), _add(f2)])

    t = DeltaLogReader(spark, d)
    assert t.latest_version() == 2
    assert {r.k for r in t.read().collect()} == {2, 3}
    assert {r.k for r in t.read(version=1).collect()} == {1, 2, 3}
    assert {r.k for r in t.read(version=0).collect()} == {1, 2}
    ops = t.history()
    assert [h["version"] for h in ops] == [0, 1, 2]
    assert ops[2]["n_remove"] == 1 and ops[2]["n_add"] == 1


def test_partition_columns_come_from_the_log(spark, tmp_path):
    """Delta data files do NOT contain partition columns — the reader
    must materialize them from partitionValues with schema types."""
    schema_json = json.dumps(
        {
            "type": "struct",
            "fields": [
                {"name": "k", "type": "long", "nullable": True, "metadata": {}},
                {"name": "v", "type": "double", "nullable": True, "metadata": {}},
                {"name": "p", "type": "integer", "nullable": True, "metadata": {}},
            ],
        }
    )
    d = str(tmp_path / "t2")
    os.makedirs(d)
    fa = _write_data(spark, d, [(1, 1.0)], sub="p=1/part")
    fb = _write_data(spark, d, [(2, 2.0)], sub="p=2/part")
    _commit(
        d,
        0,
        [
            _protocol(),
            _meta(schema_json, partition_cols=["p"]),
            _add(fa, {"p": "1"}),
            _add(fb, {"p": "2"}),
        ],
    )
    out = DeltaLogReader(spark, d).read()
    assert dict(out.dtypes)["p"] == "int"  # cast from the log's string
    assert {(r.k, r.p) for r in out.collect()} == {(1, 1), (2, 2)}


def test_checkpoint_replay_and_vacuumed_commits(spark, tmp_path):
    """A classic checkpoint parquet stands in for all commits <= N:
    reading must work even when those JSON commits are deleted."""
    d = str(tmp_path / "t3")
    os.makedirs(d)
    f0 = _write_data(spark, d, [(1, 1.0)])
    f1 = _write_data(spark, d, [(2, 2.0)])
    log = os.path.join(d, "_delta_log")
    os.makedirs(log)

    meta = _meta()["metaData"]
    cp_rows = [
        {"protocol": _protocol()["protocol"], "metaData": None, "add": None,
         "remove": None},
        {"protocol": None, "metaData": meta, "add": None, "remove": None},
        {"protocol": None, "metaData": None, "add": _add(f0)["add"],
         "remove": None},
        {"protocol": None, "metaData": None, "add": _add(f1)["add"],
         "remove": None},
    ]
    cp_schema = (
        "protocol struct<minReaderVersion:int,minWriterVersion:int>, "
        "metaData struct<id:string,schemaString:string,"
        "partitionColumns:array<string>>, "
        "add struct<path:string,partitionValues:map<string,string>,"
        "size:long,dataChange:boolean>, "
        "remove struct<path:string,dataChange:boolean>"
    )
    tmp_cp = os.path.join(d, "__cp")
    spark.createDataFrame(
        [tuple(
            None if r[c] is None else {
                k: v for k, v in r[c].items()
                if k in {"minReaderVersion", "minWriterVersion", "id",
                         "schemaString", "partitionColumns", "path",
                         "partitionValues", "size", "dataChange"}
            }
            for c in ("protocol", "metaData", "add", "remove")
        ) for r in cp_rows],
        cp_schema,
    ).coalesce(1).write.parquet(tmp_cp)
    cp_file = next(f for f in os.listdir(tmp_cp) if f.endswith(".parquet"))
    os.renames(
        os.path.join(tmp_cp, cp_file),
        os.path.join(log, f"{1:020d}.checkpoint.parquet"),
    )
    with open(os.path.join(log, "_last_checkpoint"), "w") as fh:
        json.dump({"version": 1, "size": len(cp_rows)}, fh)
    # commits 0 and 1 were vacuumed; commit 2 removes f0
    _commit(d, 2, [_remove(f0)])

    t = DeltaLogReader(spark, d)
    assert t.latest_version() == 2
    assert {r.k for r in t.read().collect()} == {2}
    # time travel INTO the checkpoint
    assert {r.k for r in t.read(version=1).collect()} == {1, 2}


def test_unsupported_reader_features_refused(spark, tmp_path):
    """The implemented v3 reader-feature set is closed; anything
    beyond it (catalogManaged, ...) must refuse."""
    d = str(tmp_path / "t4")
    os.makedirs(d)
    f0 = _write_data(spark, d, [(1, 1.0)])
    _commit(
        d, 0,
        [{"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                       "readerFeatures": ["deletionVectors",
                                          "catalogManaged"]}},
         _meta(), _add(f0)],
    )
    with pytest.raises(UnsupportedDeltaFeature):
        DeltaLogReader(spark, d).read()


def test_not_a_delta_table(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        DeltaLogReader(spark, str(tmp_path / "nope"))


def test_mixed_null_and_string_partition_values(spark, tmp_path):
    """ADVICE r4: a partition column with BOTH null and non-null values
    must not crash the None-vs-str group-key sort (protocol serializes
    NULL partitions as a missing key / JSON null)."""
    schema_json = json.dumps(
        {
            "type": "struct",
            "fields": [
                {"name": "k", "type": "long", "nullable": True, "metadata": {}},
                {"name": "v", "type": "double", "nullable": True, "metadata": {}},
                {"name": "p", "type": "string", "nullable": True, "metadata": {}},
            ],
        }
    )
    d = str(tmp_path / "t6")
    os.makedirs(d)
    fa = _write_data(spark, d, [(1, 1.0)], sub="p=a/part")
    fb = _write_data(spark, d, [(2, 2.0)], sub="p=null/part")
    fc = _write_data(spark, d, [(3, 3.0)], sub="p=b/part")
    _commit(
        d,
        0,
        [
            _protocol(),
            _meta(schema_json, partition_cols=["p"]),
            _add(fa, {"p": "a"}),
            _add(fb, {"p": None}),
            _add(fc, {"p": "b"}),
        ],
    )
    out = DeltaLogReader(spark, d).read()
    assert {(r.k, r.p) for r in out.collect()} == {
        (1, "a"), (2, None), (3, "b")
    }


def test_url_encoded_add_paths_resolve(spark, tmp_path):
    """ADVICE r4: add.path is URL-encoded per PROTOCOL.md — files whose
    names contain spaces / '=' / '%' / non-ASCII must resolve via
    unquote, or external tables fail with file-not-found."""
    from urllib.parse import quote

    d = str(tmp_path / "t7")
    os.makedirs(d)
    f0 = _write_data(spark, d, [(1, 1.0)])
    odd = "dir with space/part 100%=ok-é.parquet"
    os.renames(os.path.join(d, f0), os.path.join(d, odd))
    _commit(d, 0, [_protocol(), _meta(), _add(quote(odd))])
    out = DeltaLogReader(spark, d).read()
    assert [r.k for r in out.collect()] == [1]


def test_add_replaced_by_later_add_of_same_path(spark, tmp_path):
    """Protocol reconciliation: a later add of the same path replaces
    the earlier one (not a duplicate scan)."""
    d = str(tmp_path / "t5")
    os.makedirs(d)
    f0 = _write_data(spark, d, [(1, 1.0)])
    _commit(d, 0, [_protocol(), _meta(), _add(f0)])
    _commit(d, 1, [_add(f0)])  # metadata-only re-add (stats recompute)
    out = DeltaLogReader(spark, d).read()
    assert [r.k for r in out.collect()] == [1]


def test_column_mapping_name_mode_roundtrip(spark, tmp_path):
    """VERDICT r4 #2: minReaderVersion-2 tables with
    delta.columnMapping.mode = name (physical column names in the data
    files, logical names only in the schema metadata) must read with
    logical names and values intact."""
    from introduction_in_big_data_spark.sources.deltalog import (
        create_column_mapped_table,
    )

    d = str(tmp_path / "cm1")
    df = spark.createDataFrame(
        [(1, 1.5, "a"), (2, 2.5, "b")], "k long, v double, s string"
    )
    create_column_mapped_table(spark, d, df)
    # the staged data files really carry physical names
    raw = spark.read.parquet(
        *[os.path.join(d, f) for f in os.listdir(d) if f.endswith(".parquet")]
    )
    assert all(c.startswith("col_") for c in raw.columns)
    out = DeltaLogReader(spark, d).read()
    assert set(out.columns) == {"k", "v", "s"}
    assert {(r.k, r.v, r.s) for r in out.collect()} == {
        (1, 1.5, "a"), (2, 2.5, "b")
    }


def test_column_mapping_partitioned_and_nested(spark, tmp_path):
    """Column mapping renames at EVERY level: partitionValues keys use
    physical names, and struct fields inside data files are physically
    named too — the reader restores logical names throughout."""
    schema_json = json.dumps(
        {
            "type": "struct",
            "fields": [
                {
                    "name": "k", "type": "long", "nullable": True,
                    "metadata": {"delta.columnMapping.id": 1,
                                 "delta.columnMapping.physicalName": "c1"},
                },
                {
                    "name": "u",
                    "type": {
                        "type": "struct",
                        "fields": [
                            {"name": "x", "type": "long", "nullable": True,
                             "metadata": {
                                 "delta.columnMapping.id": 3,
                                 "delta.columnMapping.physicalName": "c3"}},
                        ],
                    },
                    "nullable": True,
                    "metadata": {"delta.columnMapping.id": 2,
                                 "delta.columnMapping.physicalName": "c2"},
                },
                {
                    "name": "p", "type": "integer", "nullable": True,
                    "metadata": {"delta.columnMapping.id": 4,
                                 "delta.columnMapping.physicalName": "c4"},
                },
            ],
        }
    )
    d = str(tmp_path / "cm2")
    os.makedirs(d)
    # data file with PHYSICAL names (c1, c2.c3), partition col absent
    tmp = os.path.join(d, "__stage")
    spark.createDataFrame(
        [(7, (70,))], "c1 long, c2 struct<c3: long>"
    ).coalesce(1).write.parquet(tmp)
    fname = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
    rel = "part-cm2.parquet"
    os.renames(os.path.join(tmp, fname), os.path.join(d, rel))
    meta = _meta(schema_json, partition_cols=["p"])
    meta["metaData"]["configuration"] = {"delta.columnMapping.mode": "name"}
    _commit(
        d, 0,
        [_protocol(reader=2, writer=5), meta,
         _add(rel, {"c4": "9"})],  # physical partition key
    )
    out = DeltaLogReader(spark, d).read()
    assert set(out.columns) == {"k", "u", "p"}
    r = out.collect()[0]
    assert (r.k, r.u.x, r.p) == (7, 70, 9)


def test_column_mapping_id_mode_reads_by_field_id(spark, tmp_path):
    """id-mode column mapping: data-file columns match by parquet
    field id (names in the files are arbitrary), via Spark's
    fieldId.read path — logical names come straight from the schema."""
    schema_json = json.dumps(
        {
            "type": "struct",
            "fields": [
                {"name": "k", "type": "long", "nullable": True,
                 "metadata": {"delta.columnMapping.id": 1,
                              "delta.columnMapping.physicalName": "c1"}},
                {"name": "s", "type": "string", "nullable": True,
                 "metadata": {"delta.columnMapping.id": 2,
                              "delta.columnMapping.physicalName": "c2"}},
            ],
        }
    )
    d = str(tmp_path / "cm3")
    os.makedirs(d)
    # physical parquet: arbitrary names, field ids 1/2
    tmp = os.path.join(d, "__stage")
    df = spark.createDataFrame([(1, "a"), (2, "b")], "k long, s string")
    df.select(
        F.col("k").alias("whatever_x", metadata={"parquet.field.id": 1}),
        F.col("s").alias("whatever_y", metadata={"parquet.field.id": 2}),
    ).coalesce(1).write.parquet(tmp)
    fname = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
    rel = "part-id-mode.parquet"
    os.renames(os.path.join(tmp, fname), os.path.join(d, rel))
    meta = _meta(schema_json)
    meta["metaData"]["configuration"] = {"delta.columnMapping.mode": "id"}
    _commit(d, 0, [_protocol(reader=2, writer=5), meta, _add(rel)])
    out = DeltaLogReader(spark, d).read()
    assert set(out.columns) == {"k", "s"}
    assert {(r.k, r.s) for r in out.collect()} == {(1, "a"), (2, "b")}


def test_column_mapping_id_mode_without_ids_refused(spark, tmp_path):
    """A mode=id table whose schema carries no columnMapping ids is
    malformed — refuse, don't guess."""
    d = str(tmp_path / "cm3b")
    os.makedirs(d)
    f0 = _write_data(spark, d, [(1, 1.0)])
    meta = _meta()
    meta["metaData"]["configuration"] = {"delta.columnMapping.mode": "id"}
    _commit(d, 0, [_protocol(reader=2, writer=5), meta, _add(f0)])
    with pytest.raises(UnsupportedDeltaFeature, match="columnMapping"):
        DeltaLogReader(spark, d).read()


def test_reader_v3_columnmapping_feature_allowed(spark, tmp_path):
    """A v3 protocol whose readerFeatures need nothing beyond
    columnMapping replays; anything more still refuses (covered by
    test_unsupported_reader_features_refused)."""
    d = str(tmp_path / "cm4")
    os.makedirs(d)
    f0 = _write_data(spark, d, [(1, 1.0)])
    _commit(
        d, 0,
        [{"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                       "readerFeatures": ["columnMapping"]}},
         _meta(), _add(f0)],
    )
    assert [r.k for r in DeltaLogReader(spark, d).read().collect()] == [1]


def test_export_acid_table_roundtrip(spark, tmp_path):
    """VERDICT r4 #5 (write-side interop): an AcidTable snapshot
    exported as a Delta log must read back identically through the
    independent protocol replay, carry per-file stats, and support a
    single-commit overwrite on re-export after table mutations."""
    from introduction_in_big_data_spark.sources.acidtable import AcidTable
    from introduction_in_big_data_spark.sources.deltalog import (
        export_acid_table,
    )

    d = str(tmp_path / "acid_exp")
    df = spark.createDataFrame(
        [(1, 1.5, "a"), (2, 2.5, "b"), (3, None, None)],
        "k long, v double, s string",
    )
    table = AcidTable.create(spark, d, df.repartition(2))
    assert export_acid_table(spark, d) == 0

    out = DeltaLogReader(spark, d).read()
    assert {(r.k, r.v, r.s) for r in out.collect()} == {
        (1, 1.5, "a"), (2, 2.5, "b"), (3, None, None)
    }

    # stats are protocol-shaped and sum to the row count
    log = os.path.join(d, "_delta_log", f"{0:020d}.json")
    stats = []
    with open(log) as fh:
        for line in fh:
            a = json.loads(line)
            if "add" in a:
                stats.append(json.loads(a["add"]["stats"]))
    assert sum(s["numRecords"] for s in stats) == 3
    assert min(s["minValues"]["k"] for s in stats if "k" in s["minValues"]) == 1
    assert sum(s["nullCount"]["s"] for s in stats) == 1

    # mutate the AcidTable, re-export: single-commit overwrite
    table.overwrite(df.filter("k <> 2"))
    assert export_acid_table(spark, d) == 1
    out2 = DeltaLogReader(spark, d).read()
    assert {r.k for r in out2.collect()} == {1, 3}
    # time travel to the first export still sees all rows
    assert {r.k for r in DeltaLogReader(spark, d).read(version=0).collect()} \
        == {1, 2, 3}


def test_deletion_vectors_uuid_storage(spark, tmp_path):
    """Reader v3 deletionVectors feature: a DV commit ('u' storage —
    uuid-named .bin, Z85 path encoding) tombstones exactly its row
    positions; the pre-DV version still reads in full."""
    from introduction_in_big_data_spark.sources.deltalog import (
        commit_deletion_vector,
        create_minimal_table,
    )

    d = str(tmp_path / "dv1")
    df = spark.range(10).select(
        F.col("id").alias("k"), (F.col("id") * 1.0).alias("v")
    )
    create_minimal_table(spark, d, df.coalesce(1))
    t = DeltaLogReader(spark, d)
    rel = next(iter(t._replay(0)[1]))
    # learn which k sits at each position in the single file
    order = [
        r.k
        for r in spark.read.parquet(os.path.join(d, rel))
        .select("k", F.col("_metadata.row_index").alias("pos"))
        .orderBy("pos")
        .collect()
    ]
    commit_deletion_vector(spark, d, rel, [0, 3, 7], storage="u")
    survivors = {r.k for r in DeltaLogReader(spark, d).read().collect()}
    assert survivors == set(order) - {order[0], order[3], order[7]}
    # time travel: version 0 unaffected
    assert {r.k for r in DeltaLogReader(spark, d).read(version=0).collect()} \
        == set(range(10))


def test_deletion_vectors_inline_and_partitioned(spark, tmp_path):
    """Inline ('i') DV storage, applied through the PARTITIONED read
    path (position columns must survive the partition-literal union
    until the anti-join)."""
    from introduction_in_big_data_spark.sources.deltalog import (
        commit_deletion_vector,
        create_minimal_table,
    )

    d = str(tmp_path / "dv2")
    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b"), (4, "b")], "k long, p string"
    )
    create_minimal_table(spark, d, df.coalesce(1), partition_by=["p"])
    t = DeltaLogReader(spark, d)
    live = t._replay(0)[1]
    rel_a = next(p for p, a in live.items() if a["partitionValues"]["p"] == "a")
    fa = os.path.join(d, rel_a)
    pos_of_k1 = next(
        r.pos
        for r in spark.read.parquet(fa)
        .select("k", F.col("_metadata.row_index").alias("pos"))
        .collect()
        if r.k == 1
    )
    commit_deletion_vector(spark, d, rel_a, [pos_of_k1], storage="i")
    out = {(r.k, r.p) for r in DeltaLogReader(spark, d).read().collect()}
    assert out == {(2, "a"), (3, "b"), (4, "b")}


def test_deletion_vectors_large_bitmap(spark, tmp_path):
    """>4096 positions forces a bitmap container through the full
    engine path (serialize -> .bin -> executor decode -> anti-join)."""
    from introduction_in_big_data_spark.sources.deltalog import (
        commit_deletion_vector,
        create_minimal_table,
    )

    d = str(tmp_path / "dv3")
    df = spark.range(6000).select(F.col("id").alias("k"))
    create_minimal_table(spark, d, df.coalesce(1))
    t = DeltaLogReader(spark, d)
    rel = next(iter(t._replay(0)[1]))
    # single-file range write preserves order: pos == k
    commit_deletion_vector(spark, d, rel, list(range(5000)), storage="u")
    out = DeltaLogReader(spark, d).read()
    assert out.count() == 1000
    assert out.agg(F.min("k")).collect()[0][0] == 5000


def test_write_checkpoint_and_vacuum(spark, tmp_path):
    """The checkpoint WRITER: after write_checkpoint(N), JSON commits
    <= N can be vacuumed and replay still reconstructs the snapshot —
    including deletion vectors, which must checkpoint losslessly."""
    from introduction_in_big_data_spark.sources.deltalog import (
        commit_deletion_vector,
        create_minimal_table,
    )

    d = str(tmp_path / "cpw")
    df = spark.range(8).select(F.col("id").alias("k"))
    create_minimal_table(spark, d, df.coalesce(1))
    rel = next(iter(DeltaLogReader(spark, d)._replay(0)[1]))
    commit_deletion_vector(spark, d, rel, [1, 4], storage="u")  # v1

    t = DeltaLogReader(spark, d)
    assert t.write_checkpoint() == 1
    # vacuum every JSON commit the checkpoint covers
    log = os.path.join(d, "_delta_log")
    for v in (0, 1):
        os.unlink(os.path.join(log, f"{v:020d}.json"))

    t2 = DeltaLogReader(spark, d)
    assert t2.latest_version() == 1
    # single-file range write preserves order: pos == k
    assert {r.k for r in t2.read().collect()} == {0, 2, 3, 5, 6, 7}
    # a later JSON commit on top of the checkpoint still replays
    tmp = os.path.join(d, "__stage2")
    spark.createDataFrame([(100,)], "k long").coalesce(1).write.parquet(tmp)
    fname = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
    rel2 = f"part-extra-{uuid.uuid4().hex}.parquet"
    os.renames(os.path.join(tmp, fname), os.path.join(d, rel2))
    _commit(d, 2, [_add(rel2)])
    assert {r.k for r in DeltaLogReader(spark, d).read().collect()} == {
        0, 2, 3, 5, 6, 7, 100
    }

# -- v2 (UUID + sidecar) checkpoints — round 7 --------------------------------


def _stage_v2_table(spark, tmp_path, name):
    """Three commits worth of history: create, append, delete-rewrite."""
    d = str(tmp_path / name)
    os.makedirs(d)
    f0 = _write_data(spark, d, [(1, 1.0), (2, 2.0)])
    _commit(d, 0, [_protocol(), _meta(), _add(f0)])
    f1 = _write_data(spark, d, [(3, 3.0), (4, 4.0)])
    _commit(d, 1, [_add(f1)])
    f2 = _write_data(spark, d, [(2, 2.0)])
    _commit(d, 2, [_remove(f0), _add(f2)])  # delete k=1
    return d


@pytest.mark.parametrize("fmt", ["parquet", "json"])
def test_v2_checkpoint_roundtrip_and_vacuumed_handoff(spark, tmp_path, fmt):
    """write_checkpoint(v2=True) produces the PROTOCOL.md v2 layout
    (UUID manifest + _sidecars/ file-action parquet); after deleting
    every JSON commit the checkpoint covers, the snapshot still
    replays from manifest + sidecar, and a later JSON commit stacks on
    top."""
    d = _stage_v2_table(spark, tmp_path, f"v2cp_{fmt}")
    t = DeltaLogReader(spark, d)
    assert t.write_checkpoint(v2=True, manifest_format=fmt) == 2
    log = os.path.join(d, "_delta_log")
    manifests = [
        f for f in os.listdir(log)
        if DeltaLogReader._classify_checkpoint_name(f) == (2, "v2")
    ]
    assert len(manifests) == 1 and manifests[0].endswith("." + fmt)
    assert os.listdir(os.path.join(log, "_sidecars"))
    for v in (0, 1, 2):
        os.unlink(os.path.join(log, f"{v:020d}.json"))

    t2 = DeltaLogReader(spark, d)
    assert t2.latest_version() == 2
    assert {r.k for r in t2.read().collect()} == {2, 3, 4}
    # protocol round-trips with the v2Checkpoint feature declared
    assert "v2Checkpoint" in t2._last_protocol["readerFeatures"]
    # a later JSON commit on top of the v2 checkpoint still replays
    f3 = _write_data(spark, d, [(9, 9.0)])
    _commit(d, 3, [_add(f3)])
    assert {r.k for r in DeltaLogReader(spark, d).read().collect()} == {
        2, 3, 4, 9,
    }
    # time travel to a vacuumed pre-checkpoint version refuses loudly
    with pytest.raises(FileNotFoundError):
        DeltaLogReader(spark, d).read(version=1)


def test_v2_manifest_with_inline_file_actions(spark, tmp_path):
    """A v2 manifest MAY carry its add/remove actions inline instead
    of sidecars (both layouts are legal); the reader replays either."""
    d = _stage_v2_table(spark, tmp_path, "v2inline")
    t = DeltaLogReader(spark, d)
    _meta_a, live = t._replay(2)
    log = os.path.join(d, "_delta_log")
    u = str(uuid.uuid4())
    with open(os.path.join(log, f"{2:020d}.checkpoint.{u}.json"), "w") as fh:
        fh.write(json.dumps({"checkpointMetadata": {"version": 2}}) + "\n")
        fh.write(
            json.dumps(
                {
                    "protocol": {
                        "minReaderVersion": 3,
                        "minWriterVersion": 7,
                        "readerFeatures": ["v2Checkpoint"],
                        "writerFeatures": ["v2Checkpoint"],
                    }
                }
            )
            + "\n"
        )
        with open(os.path.join(log, f"{0:020d}.json")) as src:
            for line in src:
                a = json.loads(line)
                if "metaData" in a:
                    fh.write(json.dumps(a) + "\n")
        for add in live.values():
            fh.write(json.dumps({"add": add}) + "\n")
    for v in (0, 1, 2):
        os.unlink(os.path.join(log, f"{v:020d}.json"))
    assert {r.k for r in DeltaLogReader(spark, d).read().collect()} == {
        2, 3, 4,
    }


def test_v2_checkpoint_classification_and_classic_preference(spark, tmp_path):
    """A v2 UUID manifest must never be parsed as a classic
    checkpoint; when one version has BOTH, the classic file (a
    complete one-read compaction) is chosen."""
    cls = DeltaLogReader._classify_checkpoint_name
    u = "0f8fad5b-d9cb-469f-a165-70867728950e"
    assert cls("00000000000000000002.checkpoint.parquet") == (2, "classic")
    assert cls(f"00000000000000000002.checkpoint.{u}.parquet") == (2, "v2")
    assert cls(f"00000000000000000002.checkpoint.{u}.json") == (2, "v2")
    assert cls("00000000000000000002.checkpoint.0000000001.0000000002.parquet") == (
        2, "multipart",
    )
    assert cls("00000000000000000002.checkpoint.weird.parquet") is None

    d = _stage_v2_table(spark, tmp_path, "v2both")
    t = DeltaLogReader(spark, d)
    t.write_checkpoint(v2=True)
    t.write_checkpoint()  # classic at the same version
    v, kind, files = DeltaLogReader(spark, d)._checkpoint_at_or_below(1 << 62)
    assert (v, kind) == (2, "classic") and len(files) == 1


def test_v2_checkpoint_missing_sidecar_refuses(spark, tmp_path):
    d = _stage_v2_table(spark, tmp_path, "v2miss")
    t = DeltaLogReader(spark, d)
    t.write_checkpoint(v2=True)
    log = os.path.join(d, "_delta_log")
    side_dir = os.path.join(log, "_sidecars")
    for f in os.listdir(side_dir):
        os.unlink(os.path.join(side_dir, f))
    for v in (0, 1, 2):
        os.unlink(os.path.join(log, f"{v:020d}.json"))
    with pytest.raises(FileNotFoundError, match="sidecar"):
        DeltaLogReader(spark, d).read()


def test_v2_checkpoint_unknown_reader_feature_still_refuses(spark, tmp_path):
    """v2Checkpoint is now replayable, but a manifest whose protocol
    needs MORE (e.g. catalogManaged) keeps refusing loudly."""
    d = _stage_v2_table(spark, tmp_path, "v2refuse")
    t = DeltaLogReader(spark, d)
    t.write_checkpoint(v2=True, manifest_format="json")
    log = os.path.join(d, "_delta_log")
    manifest = next(
        f for f in os.listdir(log)
        if DeltaLogReader._classify_checkpoint_name(f) == (2, "v2")
    )
    path = os.path.join(log, manifest)
    lines = [json.loads(line) for line in open(path)]
    for a in lines:
        if "protocol" in a:
            a["protocol"]["readerFeatures"].append("catalogManaged")
    with open(path, "w") as fh:
        for a in lines:
            fh.write(json.dumps(a) + "\n")
    with pytest.raises(UnsupportedDeltaFeature):
        DeltaLogReader(spark, d).read()
