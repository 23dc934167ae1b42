#!/usr/bin/env python
"""Rewrite BENCH_BASELINE.json from fresh idle bench runs (VERDICT r6
#8: the previous baselines mixed three rounds of environments; a single
clean-room re-record with attribution resets the drift ledger).

Usage: python scripts/rebaseline.py RUN_A.json [RUN_B.json ...]
           [--note "..."]

Takes the LAST JSON line of each given file (bench.py's
machine-readable tail) and records the PER-QUERY MIN across runs: this
box has multi-minute host-contention windows that can slow one run's
neighborhood of queries 2-6x while an isolated re-run times clean
(measured r6/r7), so the baseline for "the engine's plan cost" is the
best observed idle time, never one window's draw.  The attribution
block inside the file documents the policy and the inputs so future
drift debates can check what environment set the bar.
"""

from __future__ import annotations

import argparse
import datetime
import json
import os


def _load(path: str) -> dict:
    with open(path, encoding="utf-8") as f:
        lines = [ln for ln in f.read().splitlines() if ln.startswith("{")]
    run = json.loads(lines[-1])
    if run.get("errors"):
        raise SystemExit(f"refusing to baseline {path}: run has errors "
                         f"{sorted(run['errors'])}")
    return run


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("runs", nargs="+")
    ap.add_argument("--note", default="idle clean-room re-record")
    args = ap.parse_args()

    runs = [_load(p) for p in args.runs]
    names = set().union(*(r["queries"] for r in runs))
    queries = {
        n: min(r["queries"][n] for r in runs if n in r["queries"])
        for n in sorted(names)
    }
    out = {
        "metric": runs[0]["metric"],
        "value": round(sum(queries.values()), 3),
        "unit": runs[0]["unit"],
        "sf": runs[0]["sf"],
        "queries": queries,
        "recorded": {
            "date": datetime.date.today().isoformat(),
            "note": args.note,
            "n_queries": len(queries),
            "n_runs_merged": len(runs),
            "policy": "per-query min across idle runs (host-contention "
                      "windows slow one run's neighborhood 2-6x; an "
                      "isolated re-run times clean — baseline = best "
                      "observed idle plan cost)",
            "load_avg_1m": [r.get("load_avg_1m") for r in runs],
        },
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_BASELINE.json")
    with open(path, "w", encoding="utf-8") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}: {len(queries)} queries, "
          f"total {out['value']}s at sf{out['sf']} "
          f"({len(runs)} runs merged)")


if __name__ == "__main__":
    main()
