#!/usr/bin/env python
"""Print the query names of a verification SWEEP TIER (VERDICT r4 #7:
full-registry sf0.1 sweeps grew past ~15 min; tier the round-end
verification instead of shrinking it).

Tiers:
  core  — the queries whose sf0.1 behavior is worth paying for every
          round: every bench-flagged headline query, plus everything
          not yet driver-green (new/changed this round — these are
          exactly the rows the next CORRECTNESS file will check first).
  new   — only the not-yet-driver-green queries (the sample prefix).
  all   — every registered query (the sf0.01 both-TZ tier).

Usage (compose with the driver sim):
  python tools/sweep_tiers.py core | xargs \
      python /tmp/driver_sim.py UTC /root/testdata/sf0.1 /tmp/out.json

The round-end contract stays: FULL registry at sf0.01 under two
timezones (cheap, catches semantics/TZ bugs), core tier at sf0.1
(catches scale-sensitive regressions on the queries that carry the
headline and the new surface).
"""
from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from introduction_in_big_data_spark import plans  # noqa: E402
from introduction_in_big_data_spark.plans import registry  # noqa: E402


def names(tier: str) -> list[str]:
    specs = list(plans.REGISTRY.values())
    if tier == "all":
        return [s.name for s in specs]
    new = [s.name for s in specs if s.name not in registry._DRIVER_GREEN]
    if tier == "new":
        return new
    if tier == "core":
        bench = [s.name for s in specs if s.bench]
        return sorted(set(bench) | set(new))
    raise SystemExit(f"unknown tier {tier!r} (core|new|all)")


if __name__ == "__main__":
    print(" ".join(names(sys.argv[1] if len(sys.argv) > 1 else "core")))
