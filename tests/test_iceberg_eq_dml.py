"""Engine DML on tables carrying EQUALITY DELETES (VERDICT r8 item 2):
the Flink-CDC staging shape — a v2 table whose upsert stream left
equality-delete files — must accept engine DELETE/UPDATE instead of
refusing. Hit detection applies the existing eq-deletes sequence-gated
via the read path's own `_eq_delete_join`, so DML only ever touches
the live set a reader sees, and updated images sequence past every
live eq-delete so the strictly-smaller gate never re-kills them."""

from __future__ import annotations

from pyspark.sql import functions as F

from introduction_in_big_data_spark.sources.iceberg import (
    IcebergTableReader,
    add_equality_deletes,
    create_minimal_table,
)


def _stage_cdc(spark, tmp_path, name):
    """A Flink-CDC-shaped table: base data at sequence 0, an upsert
    stream's equality deletes for k in {2,3} at sequence 1."""
    path = str(tmp_path / name)
    df = spark.range(0, 10).select(
        F.col("id").alias("k"), (F.col("id") * 2.0).alias("v")
    )
    create_minimal_table(spark, path, df.coalesce(1), bounds=True)
    add_equality_deletes(spark, path, [(2,), (3,)], ["k"], sequence=1)
    return path


def test_delete_where_dv_applies_eq_deletes_first(spark, tmp_path):
    """Engine DELETE (v3 DV form) on an eq-delete table: the puffin
    vector is written against the post-eq-delete live set — already
    eq-deleted keys are not re-tombstoned, and a re-run commits
    nothing (idempotence)."""
    path = _stage_cdc(spark, tmp_path, "cdc_dv")
    t = IcebergTableReader(spark, path)
    assert {r.k for r in t.read().collect()} == {0, 1, 4, 5, 6, 7, 8, 9}

    v = t.delete_where_dv([("k", "<", 5)])
    t2 = IcebergTableReader(spark, path)
    assert t2.metadata()["current-snapshot-id"] == v
    assert {r.k for r in t2.read().collect()} == {5, 6, 7, 8, 9}
    # the DV holds EXACTLY the live hits {0,1,4} — not the eq-dead 2,3
    _data, pos, _eq = t2._live_files(
        next(
            s
            for s in t2.metadata()["snapshots"]
            if s["snapshot-id"] == v
        )
    )
    dv_cards = sum(1 for e in pos if e[1] == "PUFFIN")
    assert dv_cards == 1
    from introduction_in_big_data_spark.functions import puffin

    e = next(e for e in pos if e[1] == "PUFFIN")
    assert len(puffin.decode_deletion_vector(puffin.read_blob(e[0], e[2], e[3]))) == 3

    # idempotent re-run: nothing left matching -> same snapshot id
    assert IcebergTableReader(spark, path).delete_where_dv([("k", "<", 5)]) == v


def test_delete_where_v2_applies_eq_deletes_first(spark, tmp_path):
    """Engine DELETE (v2 position-delete form) on an eq-delete table."""
    path = _stage_cdc(spark, tmp_path, "cdc_v2")
    t = IcebergTableReader(spark, path)
    v = t.delete_where([("k", "in", [1, 2, 6])])
    t2 = IcebergTableReader(spark, path)
    assert {r.k for r in t2.read().collect()} == {0, 4, 5, 7, 8, 9}
    # k=2 was already eq-dead: the position-delete file has 2 rows
    assert IcebergTableReader(spark, path).delete_where(
        [("k", "in", [1, 2, 6])]
    ) == v  # re-run: no live match, no commit


def test_update_where_dv_sequences_past_eq_gate(spark, tmp_path):
    """UPDATE on an eq-delete table: an eq-delete at a HIGH sequence
    (5) kills v=18.0 (k=9); updating k=6 to v=18.0 re-inserts a
    matching image — it must survive because the new data file
    sequences past EVERY eq-delete, not just past the data files."""
    path = _stage_cdc(spark, tmp_path, "cdc_upd")
    add_equality_deletes(spark, path, [(18.0,)], ["v"], sequence=5)
    t = IcebergTableReader(spark, path)
    assert {r.k for r in t.read().collect()} == {0, 1, 4, 5, 6, 7, 8}

    v = t.update_where_dv([("k", "=", 6)], {"v": "18.0"})
    t2 = IcebergTableReader(spark, path)
    assert t2.metadata()["current-snapshot-id"] == v
    got = {(r.k, r.v) for r in t2.read().collect()}
    assert (6, 18.0) in got, "updated image must survive the eq gate"
    assert {k for k, _v in got} == {0, 1, 4, 5, 6, 7, 8}

    # updating an eq-dead key touches nothing
    assert IcebergTableReader(spark, path).update_where_dv(
        [("k", "=", 2)], {"v": "99.0"}
    ) == v


def test_update_where_v2_sequences_past_eq_gate(spark, tmp_path):
    path = _stage_cdc(spark, tmp_path, "cdc_updv2")
    add_equality_deletes(spark, path, [(18.0,)], ["v"], sequence=5)
    t = IcebergTableReader(spark, path)
    v = t.update_where([("k", "=", 6)], {"v": "18.0"})
    t2 = IcebergTableReader(spark, path)
    assert t2.metadata()["current-snapshot-id"] == v
    got = {(r.k, r.v) for r in t2.read().collect()}
    assert (6, 18.0) in got
    assert {k for k, _v in got} == {0, 1, 4, 5, 6, 7, 8}
