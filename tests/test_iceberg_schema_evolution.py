"""Iceberg SCHEMA EVOLUTION on read (VERDICT r5 item 4 / r6 item 5).

The spec resolves columns by FIELD ID, not name: a rename keeps the
id (old data files still project), a drop retires the id forever
(last-column-id only grows), and an add allocates a fresh id (old
files read null — even when a dropped column of the same name is
physically still inside them). These tests stage two-schema tables
with `update_schema` and assert the reader's field-id projection
(`_scan_schema` + spark.sql.parquet.fieldId.read.enabled) implements
exactly those rules, including through row-level deletes and
incremental reads.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from introduction_in_big_data_spark.sources.iceberg import (
    IcebergTableReader,
    append_data_snapshot,
    create_minimal_table,
)


def _stage(spark, tmp_path, name, rows=((1, 10, "a"), (2, 20, "b"))):
    path = str(tmp_path / name)
    create_minimal_table(
        spark,
        path,
        spark.createDataFrame(
            list(rows), "k long, n_chars long, tag string"
        ).coalesce(1),
    )
    return path


def test_rename_projects_old_files_by_field_id(spark, tmp_path):
    path = _stage(spark, tmp_path, "ev_rename")
    t = IcebergTableReader(spark, path)
    t.update_schema(renames={"n_chars": "char_count"})

    out = IcebergTableReader(spark, path).read()
    assert out.columns == ["k", "char_count", "tag"]
    got = {(r.k, r.char_count) for r in out.collect()}
    assert got == {(1, 10), (2, 20)}


def test_added_column_is_null_for_old_files_and_real_for_new(spark, tmp_path):
    path = _stage(spark, tmp_path, "ev_add")
    t = IcebergTableReader(spark, path)
    t.update_schema(adds=[("source", "string")])
    append_data_snapshot(
        spark,
        path,
        spark.createDataFrame(
            [(3, 30, "c", "web")], "k long, n_chars long, tag string, source string"
        ),
        sequence=1,
    )
    got = {
        (r.k, r.n_chars, r.source)
        for r in IcebergTableReader(spark, path).read().collect()
    }
    assert got == {(1, 10, None), (2, 20, None), (3, 30, "web")}


def test_drop_then_readd_does_not_resurrect_old_values(spark, tmp_path):
    """The spec's sharpest evolution rule: after drop(tag) +
    add(tag string), the name is back but the ID is new — old files
    still physically contain a `tag` column, and it must NOT be
    read."""
    path = _stage(spark, tmp_path, "ev_readd")
    t = IcebergTableReader(spark, path)
    v = t.update_schema(drops=["tag"])
    t2 = IcebergTableReader(spark, path)
    assert t2.read().columns == ["k", "n_chars"]
    t2.update_schema(adds=[("tag", "string")])
    assert v >= 2

    out = IcebergTableReader(spark, path).read()
    got = {(r.k, r.tag) for r in out.collect()}
    assert got == {(1, None), (2, None)}
    meta = IcebergTableReader(spark, path).metadata()
    ids = {f["name"]: f["id"] for f in IcebergTableReader._schema_fields(meta)}
    assert ids["tag"] == meta["last-column-id"]  # fresh id, never reused


def test_update_schema_validates(spark, tmp_path):
    path = _stage(spark, tmp_path, "ev_valid")
    t = IcebergTableReader(spark, path)
    with pytest.raises(ValueError, match="rename: no column"):
        t.update_schema(renames={"nope": "x"})
    with pytest.raises(ValueError, match="already exists"):
        t.update_schema(renames={"n_chars": "tag"})
    with pytest.raises(ValueError, match="already exists"):
        t.update_schema(adds=[("tag", "string")])
    with pytest.raises(ValueError, match="drop: no column"):
        t.update_schema(drops=["nope"])


def test_predicates_prune_on_renamed_column(spark, tmp_path):
    """Manifest bounds are keyed by field id, so skipping keeps
    working across a rename: the predicate names the NEW column, the
    bounds were written under the old one."""
    path = str(tmp_path / "ev_prune")
    create_minimal_table(
        spark,
        path,
        spark.createDataFrame(
            [(1, 10, "a"), (2, 2000, "b")], "k long, n_chars long, tag string"
        ).repartitionByRange(2, "n_chars"),
        bounds=True,
    )
    t = IcebergTableReader(spark, path)
    t.update_schema(renames={"n_chars": "char_count"})
    t2 = IcebergTableReader(spark, path)
    out = t2.read(predicates=[("char_count", ">=", 1000)])
    assert [(r.k, r.char_count) for r in out.collect()] == [(2, 2000)]
    assert t2.last_scan["skipped_files"] == 1


def test_incremental_read_after_rename(spark, tmp_path):
    path = _stage(spark, tmp_path, "ev_incr")
    t = IcebergTableReader(spark, path)
    snap0 = t.metadata()["current-snapshot-id"]
    t.update_schema(renames={"n_chars": "char_count"})
    append_data_snapshot(
        spark,
        path,
        spark.createDataFrame([(3, 30, "c")], "k long, char_count long, tag string"),
        sequence=1,
    )
    t2 = IcebergTableReader(spark, path)
    snap1 = t2.metadata()["current-snapshot-id"]
    inc = t2.incremental(snap0, snap1)
    assert [(r.k, r.char_count) for r in inc.collect()] == [(3, 30)]


def test_added_column_initial_default(spark, tmp_path):
    """Spec v3 default values (round 9): a column added with an
    initial-default returns the DEFAULT from pre-add files; files
    written after the add keep their real values — including genuine
    NULLs, which must NOT be replaced."""
    path = _stage(spark, tmp_path, "ev_default")
    t = IcebergTableReader(spark, path)
    t.update_schema(adds=[("source", "string", "legacy")])
    append_data_snapshot(
        spark,
        path,
        spark.createDataFrame(
            [(3, 30, "c", "web"), (4, 40, "d", None)],
            "k long, n_chars long, tag string, source string",
        ),
        sequence=1,
    )
    got = {
        (r.k, r.source)
        for r in IcebergTableReader(spark, path).read().collect()
    }
    assert got == {(1, "legacy"), (2, "legacy"), (3, "web"), (4, None)}
    # predicate reads still work through the conditional fill
    sel = IcebergTableReader(spark, path).read(
        predicates=[("k", "<=", 2)]
    )
    assert {r.source for r in sel.collect()} == {"legacy"}


def test_dml_after_rename_projects_old_files_by_field_id(spark, tmp_path):
    """Round 10: DML hit-detection scans route through the same
    field-id projection as reads (_dml_scan). Before this, every DML
    path read candidate files NAME-matched — on a renamed table the
    old files' column silently read null, so predicates on it never
    matched and assignments wrote nulls. Pin: update/delete on the
    renamed column see the old files' real values."""
    path = _stage(spark, tmp_path, "ev_dml", rows=((1, 10, "a"), (2, 20, "b"), (3, 30, "c")))
    IcebergTableReader(spark, path).update_schema(
        renames={"n_chars": "char_count"}
    )
    # UPDATE keyed on the renamed column: must see 20, not null
    IcebergTableReader(spark, path).update_where(
        [("char_count", "=", 20)], {"char_count": "char_count + 1"}
    )
    got = {
        r.k: r.char_count
        for r in IcebergTableReader(spark, path).read().collect()
    }
    assert got == {1: 10, 2: 21, 3: 30}
    # DELETE keyed on the renamed column (DV path)
    IcebergTableReader(spark, path).delete_where_dv(
        [("char_count", ">=", 30)]
    )
    got2 = {
        r.k: r.char_count
        for r in IcebergTableReader(spark, path).read().collect()
    }
    assert got2 == {1: 10, 2: 21}
    # v2 position-delete path too
    IcebergTableReader(spark, path).delete_where(
        [("char_count", "=", 10)]
    )
    got3 = {
        r.k: r.char_count
        for r in IcebergTableReader(spark, path).read().collect()
    }
    assert got3 == {2: 21}


def test_added_nonprimitive_columns_with_defaults(spark, tmp_path):
    """Round 10 (VERDICT r9 item 5): spec-v3 initial-defaults on
    STRUCT / LIST / MAP columns — stored in the single-value JSON form
    (struct keyed by field id, map as keys/values arrays) and rendered
    by default_literal into the scan-stage conditional. Pre-add files
    return the full nested default; post-add files keep real values,
    genuine NULLs included."""
    path = _stage(spark, tmp_path, "ev_nonprim")
    struct_t = {
        "type": "struct",
        "fields": [
            {"id": 101, "name": "city", "type": "string"},
            {"id": 102, "name": "zip", "type": "int"},
        ],
    }
    list_t = {"type": "list", "element-id": 103, "element": "string"}
    map_t = {
        "type": "map",
        "key-id": 104,
        "value-id": 105,
        "key": "string",
        "value": "long",
    }
    IcebergTableReader(spark, path).update_schema(
        adds=[
            ("addr", struct_t, {"101": "nyc", "102": 10001}),
            ("tags", list_t, ["a", "b"]),
            ("scores", map_t, {"keys": ["x", "y"], "values": [7, 9]}),
        ]
    )
    t = IcebergTableReader(spark, path)
    assert t.metadata()["last-column-id"] >= 105
    append_data_snapshot(
        spark,
        path,
        spark.createDataFrame(
            [
                (3, 30, "c", ("sf", 94105), ["z"], {"q": 1}),
                (4, 40, "d", None, None, None),
            ],
            "k long, n_chars long, tag string, "
            "addr struct<city:string,zip:int>, tags array<string>, "
            "scores map<string,bigint>",
        ),
        sequence=1,
    )
    got = {
        r.k: (
            tuple(r.addr) if r.addr is not None else None,
            r.tags,
            dict(r.scores) if r.scores is not None else None,
        )
        for r in IcebergTableReader(spark, path).read().collect()
    }
    default = (("nyc", 10001), ["a", "b"], {"x": 7, "y": 9})
    assert got[1] == default and got[2] == default
    assert got[3] == (("sf", 94105), ["z"], {"q": 1})
    assert got[4] == (None, None, None), "real NULLs must not be filled"
    # partial struct default: absent field ids render null children
    IcebergTableReader(spark, path).update_schema(
        adds=[
            (
                "geo",
                {
                    "type": "struct",
                    "fields": [
                        {"id": 111, "name": "lat", "type": "double"},
                        {"id": 112, "name": "lon", "type": "double"},
                    ],
                },
                {"111": 1.5},
            )
        ]
    )
    got2 = {
        r.k: (tuple(r.geo) if r.geo is not None else None)
        for r in IcebergTableReader(spark, path).read().collect()
    }
    assert got2[1] == (1.5, None)
    # malformed default shapes refuse loudly at add time
    with pytest.raises(Exception, match="struct default"):
        IcebergTableReader(spark, path).update_schema(
            adds=[("bad", struct_t | {}, ["not", "an", "object"])]
        )
