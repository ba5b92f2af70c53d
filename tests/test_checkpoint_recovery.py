"""Checkpointed stream recovery: stop a stateful streaming query, add
new data, restart from the same checkpoint — state resumes (no
reprocessing from scratch, cumulative counts stay exact). The
exactly-once property the reference's in-memory dicts cannot have
(SURVEY.md §2.9 'Exactly-once / recovery: None')."""

from __future__ import annotations

import json

from pyspark.sql import functions as F
from pyspark.sql import types as T

SCHEMA = T.StructType(
    [T.StructField("k", T.StringType()), T.StructField("v", T.LongType())]
)


def _write_file(d, name, rows):
    with open(d / name, "w") as f:
        for k, v in rows:
            f.write(json.dumps({"k": k, "v": v}) + "\n")


def _run_round(spark, src, ckpt, out_name):
    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).json(str(src))
    )
    counts = stream.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("total")
    )
    q = (
        counts.writeStream.outputMode("complete")
        .format("memory")
        .queryName(out_name)
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return {r["k"]: (r["n"], r["total"]) for r in spark.table(out_name).collect()}


def test_stream_resumes_from_checkpoint(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    ckpt = tmp_path / "ckpt"

    _write_file(src, "a.json", [("x", 1), ("y", 2)])
    _write_file(src, "b.json", [("x", 10)])
    first = _run_round(spark, src, ckpt, "ckpt_round1")
    assert first == {"x": (2, 11), "y": (1, 2)}

    # new data arrives while the query is down
    _write_file(src, "c.json", [("x", 100), ("z", 5)])
    second = _run_round(spark, src, ckpt, "ckpt_round2")
    # state carried across the restart: old counts + only the new file
    assert second == {"x": (3, 111), "y": (1, 2), "z": (1, 5)}

    # the restarted run must NOT have reprocessed a.json/b.json — the
    # sources log in the checkpoint records them as committed
    committed = list((ckpt / "sources" / "0").glob("*"))
    assert committed, "file-source checkpoint log must exist"
