#!/usr/bin/env python
"""Headline-operator Spark-vs-DuckDB ratios under the calibration
protocol (tools/calib_paired.py; VERDICT r10 item 2 — every new
SCALE.md perf claim carries its weather record).

Each calibrated round runs, interleaved in ONE session: for every
selected registry query, the Spark plan (build + noop sink, cache
cleared) immediately followed by its DuckDB oracle on a FRESH
connection (the duck_bench cold shape). Rounds whose bracket probes
drift >1.5x the session minimum are discarded; best-of-surviving per
engine per query is the statistic.

Usage: python tools/headline_calib.py [rounds=4] [query ...]
Default query set: the heavy comparable operators judged against the
DuckDB-cold baseline round over round.
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from calib_paired import PairedSession  # noqa: E402

DEFAULT = [
    "cf_knn_pruned",
    "dedup_jaccard",
    "dedup_minhash_lsh",
    "doc_chunks",
    "text_char_lm_quality",
    "bpe_train_merges",
    "tfidf_top_terms",
]
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    names = sys.argv[2:] or DEFAULT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import duckdb

    from introduction_in_big_data_spark import plans
    from introduction_in_big_data_spark.session import get_spark

    spark = get_spark("headline-calib")
    specs = [plans.REGISTRY[n] for n in names]

    def spark_engine(spec):
        def run():
            spark.catalog.clearCache()
            spec.fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()

        return run

    def duck_engine(spec):
        def run():
            con = duckdb.connect()
            for t in TABLES:
                src = f"{sf_dir}/{t}.parquet"
                if os.path.isdir(src):
                    src = f"{src}/*.parquet"
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{src}')"
                )
            con.sql(spec.oracle).fetchall()
            con.close()

        return run

    engines: dict = {}
    for spec in specs:
        engines[f"spark:{spec.name}"] = spark_engine(spec)
        engines[f"duck:{spec.name}"] = duck_engine(spec)

    for fn in engines.values():  # warmup: codegen + workers + footers
        fn()

    s = PairedSession()
    for _ in range(rounds):
        s.run_round(engines)
    rep = s.report()
    rep["sf_dir"] = sf_dir
    if "best" in rep:
        rep["ratio_best"] = {
            spec.name: round(
                rep["best"][f"spark:{spec.name}"]
                / rep["best"][f"duck:{spec.name}"],
                3,
            )
            for spec in specs
        }
        rep["ratio_median"] = {
            spec.name: round(
                rep["median"][f"spark:{spec.name}"]
                / rep["median"][f"duck:{spec.name}"],
                3,
            )
            for spec in specs
        }
    print(json.dumps(rep))
    spark.stop()


if __name__ == "__main__":
    main()
