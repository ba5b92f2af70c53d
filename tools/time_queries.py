#!/usr/bin/env python
"""Probe-bracketed isolated timing of named registry queries (noop
sink, cache cleared, best of N runs) — the within-session A/B harness
for optimization round 12.

Usage: python tools/time_queries.py <runs> <name> [name ...]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

from calib_paired import calibrate  # noqa: E402

from introduction_in_big_data_spark import plans  # noqa: E402
from introduction_in_big_data_spark.session import get_spark  # noqa: E402


def main() -> None:
    runs = int(sys.argv[1])
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ibd-time-queries")
    specs = [plans.REGISTRY[n] for n in names]
    # warmup: JVM + codegen + parquet footers
    specs[0].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    out: dict = {"probe_before": round(calibrate(), 4), "queries": {}}
    for spec in specs:
        best = float("inf")
        best_build = float("inf")
        all_runs = []
        for _ in range(runs):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            df = spec.fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            all_runs.append(round(t2 - t0, 4))
            best = min(best, t2 - t0)
            best_build = min(best_build, t1 - t0)
        out["queries"][spec.name] = {
            "best": round(best, 4),
            "build": round(best_build, 4),
            "runs": all_runs,
        }
    out["probe_after"] = round(calibrate(), 4)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
