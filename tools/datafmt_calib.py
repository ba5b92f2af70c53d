#!/usr/bin/env python
"""Iceberg data-file format scan throughput: the SAME documents table
staged as PARQUET vs AVRO containers vs ORC, full-materialize read
through IcebergTableReader under the calibration-probed paired
protocol (VERDICT r11 item 3 — "record an Avro-scan throughput number
in SCALE.md so a user choosing whether to compact()-migrate knows the
cost"; the ORC arm prices the round-12 leg in the same table).

Reports per-arm seconds plus MB/s (uncompressed text bytes / best
surviving time) — the per-core figure divides by the task-parallel
width, which equals the file count here (one task per container
file).

Usage: python tools/datafmt_calib.py [rounds=4] [files=8]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from calib_paired import PairedSession  # noqa: E402

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    nfiles = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    from pyspark.sql import functions as F

    from introduction_in_big_data_spark.session import get_spark
    from introduction_in_big_data_spark.sources.iceberg import (
        IcebergTableReader,
        create_minimal_table,
    )
    from introduction_in_big_data_spark.sources.tables import load_table

    spark = get_spark("datafmt-calib")
    root = "/tmp/ibd_datafmt"
    docs = load_table(spark, BASE, "documents").select(
        "doc_id", "lang", "n_chars", "text"
    )
    payload_bytes = docs.agg(
        F.sum(F.octet_length("text") + 32).alias("b")
    ).collect()[0].b
    staged = docs.repartitionByRange(nfiles, "doc_id")
    tables = {}
    for fmt in ("PARQUET", "AVRO", "ORC"):
        path = f"{root}/{fmt.lower()}/t"
        if os.path.exists(path):
            shutil.rmtree(path)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        create_minimal_table(spark, path, staged, data_format=fmt)
        tables[fmt] = path

    def reader(fmt):
        def run():
            spark.catalog.clearCache()
            IcebergTableReader(spark, tables[fmt]).read().write.format(
                "noop"
            ).mode("overwrite").save()

        return run

    engines = {fmt.lower(): reader(fmt) for fmt in tables}
    for fn in engines.values():
        fn()

    s = PairedSession()
    for _ in range(rounds):
        s.run_round(engines)
    rep = s.report()
    rep["sf_base"] = BASE
    rep["n_files"] = nfiles
    rep["payload_mb"] = round(payload_bytes / 1e6, 1)
    if "best" in rep:
        rep["mb_per_sec_best"] = {
            k: round(payload_bytes / 1e6 / v, 1)
            for k, v in rep["best"].items()
        }
        rep["mb_per_sec_per_task_best"] = {
            k: round(payload_bytes / 1e6 / v / nfiles, 2)
            for k, v in rep["best"].items()
        }
    print(json.dumps(rep))
    spark.stop()


if __name__ == "__main__":
    main()
