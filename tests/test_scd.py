"""MERGE-upsert / SCD2 emulation tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from introduction_in_big_data_spark.operators import scd


def test_merge_upsert(spark):
    base = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k int, v string")
    updates = spark.createDataFrame([(2, "B"), (4, "d")], "k int, v string")
    out = {(r["k"], r["v"]) for r in scd.merge_upsert(base, updates, "k").collect()}
    assert out == {(1, "a"), (2, "B"), (3, "c"), (4, "d")}


def test_scd2_versioning(spark):
    base = spark.createDataFrame(
        [(1, "x", 100, None, True), (2, "y", 100, None, True)],
        "k int, attr string, valid_from long, valid_to long, is_current boolean",
    )
    updates = spark.createDataFrame([(1, "x2", 200)], "k int, attr string, ts long")
    out = scd.scd2_apply(base, updates, "k", "ts", ["attr"])
    rows = {(r["k"], r["attr"], r["valid_from"], r["valid_to"], r["is_current"])
            for r in out.collect()}
    assert rows == {
        (1, "x", 100, 200, False),   # old version closed
        (1, "x2", 200, None, True),  # new current version
        (2, "y", 100, None, True),   # untouched key unchanged
    }
    cur = out.filter("is_current").groupBy("k").count().filter("count > 1")
    assert cur.count() == 0  # exactly one current version per key
