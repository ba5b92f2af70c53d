#!/usr/bin/env python
"""Calibration-probed paired measurement harness (VERDICT r10 items
1-2) — the throttle-robust protocol every new SCALE.md perf claim uses
from round 11 on.

Why: this host throttles from OUTSIDE the VM — identical work varies
4-9x between back-to-back runs (/proc/loadavg decays from 20+ while
vmstat shows 100% idle; SCALE.md round-10 evidence, independently
reproduced by the round-10 judge). A paired design protects against
UNIFORM noise but not ASYMMETRIC throttle (one engine's window
degraded more than the other's) — the failure mode that produced
round-10's non-reproducible x20 char-LM ratio, measured in a window
where DuckDB itself ran 3.5x degraded.

Protocol:
- every paired round is BRACKETED by a fixed ~1s single-thread numpy
  calibration probe; both probe times are recorded inline with the
  round's engine timings;
- a round SURVIVES only if max(probe_before, probe_after) <= DRIFT x
  the session's minimum probe time (default DRIFT = 1.5);
- the reported statistic is best-of-SURVIVING rounds per engine, with
  per-surviving-round medians as the check; discarded rounds stay in
  the record, marked, so the weather is auditable.

Library use (engines run interleaved in ONE round so they share the
same weather):

    from calib_paired import PairedSession
    s = PairedSession()
    for _ in range(5):
        s.run_round({"spark_arrow": fn_a, "spark_sql": fn_s,
                     "duckdb_cold": fn_d})
    print(json.dumps(s.report(), indent=2))

Each engine value is a zero-arg callable; it is timed around its call
and must fully materialize its work (noop sink / fetchall) before
returning.
"""

from __future__ import annotations

import statistics
import time

_CAL_ITERS = 1600  # sized so calibrate() reads ~1s on this host, quiet


def calibrate() -> float:
    """Fixed single-thread numpy workload: 1600 dots over a fixed-seed
    4M-double vector (~0.1s on this host quiet; it reads SECONDS when
    the external throttle is active — that spread IS the signal). The
    absolute value is host/process-dependent; the drift filter only
    ever compares probes WITHIN one session, against the session
    minimum."""
    import numpy as np

    a = np.random.default_rng(0).random(4_000_000)
    t0 = time.perf_counter()
    acc = 0.0
    for _ in range(_CAL_ITERS):
        acc += float(np.dot(a, a))
    dt = time.perf_counter() - t0
    assert acc > 0
    return dt


class PairedSession:
    def __init__(self, drift: float = 1.5):
        self.drift = drift
        self.rounds: list[dict] = []

    def run_round(self, engines: dict) -> dict:
        rec: dict = {"probe_before": round(calibrate(), 4), "times": {}}
        for name, fn in engines.items():
            t0 = time.perf_counter()
            fn()
            rec["times"][name] = round(time.perf_counter() - t0, 4)
        rec["probe_after"] = round(calibrate(), 4)
        self.rounds.append(rec)
        return rec

    def report(self) -> dict:
        if not self.rounds:
            return {"error": "no rounds"}
        pmin = min(
            min(r["probe_before"], r["probe_after"]) for r in self.rounds
        )
        cut = self.drift * pmin
        surviving = []
        for r in self.rounds:
            r["discarded"] = (
                max(r["probe_before"], r["probe_after"]) > cut
            )
            if not r["discarded"]:
                surviving.append(r)
        names: list[str] = list(self.rounds[0]["times"])
        out: dict = {
            "protocol": "calibration-bracketed paired rounds; a round "
            f"survives iff max(bracket probes) <= {self.drift} x "
            "session-min probe; statistic = best of surviving",
            "probe_min_sec": round(pmin, 4),
            "drift_cut_sec": round(cut, 4),
            "rounds_total": len(self.rounds),
            "rounds_surviving": len(surviving),
            "rounds": self.rounds,
        }
        if surviving:
            out["best"] = {
                n: min(r["times"][n] for r in surviving) for n in names
            }
            out["median"] = {
                n: round(
                    statistics.median(r["times"][n] for r in surviving), 4
                )
                for n in names
            }
        else:
            out["note"] = (
                "NO round survived the drift filter — the session was "
                "throttled throughout; do not report ratios from it"
            )
        return out


if __name__ == "__main__":
    # self-check: print 3 probe readings so the ~1s sizing is auditable
    import json

    print(json.dumps({"probes": [round(calibrate(), 4) for _ in range(3)]}))
