#!/usr/bin/env python
"""text_char_lm_quality at xN bench scale under the calibration-probed
paired protocol (VERDICT r10 item 1 — settle the x20 claim with a
throttle-robust design; the round-10 x20 number rode a window where
DuckDB itself ran 3.5x degraded and is retracted in SCALE.md).

Stages an xN documents corpus under /tmp (N key-shifted copies of the
sf0.1 table — same doc-length distribution, N x the gram volume), then
runs calibration-bracketed paired rounds of:
  - spark_arrow : char_lm_scores, round-10 numpy/Arrow gram kernel
  - spark_sql   : char_lm_scores, pure-JVM sort+RLE gram kernel
  - duckdb_cold : the registered oracle SQL on a FRESH connection
each fully materialized (noop sink / fetchall). Reports the
PairedSession record (every probe and timing inline, discarded rounds
marked) as one JSON blob — paste-ready for SCALE.md.

Usage: python tools/charlm_calib.py [N=20] [rounds=5]
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from calib_paired import PairedSession  # noqa: E402

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SHIFT = 1_000_000_000


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    import duckdb
    from pyspark.sql import functions as F

    from introduction_in_big_data_spark import plans
    from introduction_in_big_data_spark.functions.partitioning import (
        spread_if_narrow,
    )
    from introduction_in_big_data_spark.operators import text as textops
    from introduction_in_big_data_spark.session import get_spark
    from introduction_in_big_data_spark.sources.tables import load_table

    spark = get_spark("charlm-calib")
    out_dir = f"/tmp/ibd_charlm/x{n}/documents.parquet"
    if not os.path.exists(out_dir):
        base = load_table(spark, BASE, "documents")
        df = None
        for i in range(n):
            part = base.select(
                (F.col("doc_id") + i * SHIFT).alias("doc_id"),
                *[c for c in base.columns if c != "doc_id"],
            )
            df = part if df is None else df.unionByName(part)
        df.repartition(32).write.mode("overwrite").parquet(out_dir)

    def spark_engine(kernel: str, materialize=None):
        def run():
            spark.catalog.clearCache()
            textops.char_lm_scores(
                spread_if_narrow(
                    spark.read.parquet(out_dir), multiplier=1
                ),
                "doc_id",
                "text",
                materialize_grams=materialize,
                gram_kernel=kernel,
            ).write.format("noop").mode("overwrite").save()

        return run

    oracle = plans.REGISTRY["text_char_lm_quality"].oracle

    def duck():
        con = duckdb.connect()  # cold: fresh engine every round
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{out_dir}/*.parquet')"
        )
        con.sql(oracle).fetchall()
        con.close()

    all_engines = {
        "spark_arrow": spark_engine("arrow"),
        "spark_sql": spark_engine("sql"),
        # diagnostic arm for the x20 dispatch question (VERDICT r11
        # item 1): arrow kernel but WITH the dg localCheckpoint, so a
        # win here vs plain arrow isolates the kernel-recompute cost
        "spark_arrow_ckpt": spark_engine("arrow", materialize=True),
        "duckdb_cold": duck,
    }
    sel = os.environ.get("CHARLM_ENGINES", "spark_arrow,spark_sql,duckdb_cold")
    engines = {k: all_engines[k] for k in sel.split(",")}
    # warmup: JVM codegen + Python worker pools + parquet footers, so
    # round 1 isn't structurally slower than round 5
    for fn in engines.values():
        fn()

    s = PairedSession()
    for _ in range(rounds):
        s.run_round(engines)
    rep = s.report()
    rep["x"] = n
    rep["sf_base"] = BASE
    if "best" in rep:
        d = rep["best"]["duckdb_cold"]
        rep["ratio_best"] = {
            k: round(v / d, 3)
            for k, v in rep["best"].items()
            if k != "duckdb_cold"
        }
        dm = rep["median"]["duckdb_cold"]
        rep["ratio_median"] = {
            k: round(v / dm, 3)
            for k, v in rep["median"].items()
            if k != "duckdb_cold"
        }
    print(json.dumps(rep))
    spark.stop()


if __name__ == "__main__":
    main()
