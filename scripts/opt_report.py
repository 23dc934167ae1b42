#!/usr/bin/env python
"""Render the r9 optimization checklist table: per bench query, the r8
idle record, this round's final idle record, the delta, and the ratio vs
the committed baseline.  Markdown to stdout.

Usage: python scripts/opt_report.py BENCH_r08_local.json BENCH_r09_local.json
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    with open(sys.argv[1]) as f:
        r8 = json.load(f)
    with open(sys.argv[2]) as f:
        r9 = json.load(f)
    q8, q9 = r8["queries"], r9["queries"]
    ratios = r9.get("vs_baseline", {}).get("ratios", {})
    rows = sorted(q9.items(), key=lambda kv: -kv[1])
    print("| query | r8 idle s | r9 idle s | delta | vs baseline |")
    print("|---|---|---|---|---|")
    for name, t9 in rows:
        t8 = q8.get(name)
        d = f"{t9 - t8:+.2f}" if t8 is not None else "new"
        t8s = f"{t8:.2f}" if t8 is not None else "—"
        r = ratios.get(name)
        rs = f"{r:.2f}x" if r else "—"
        print(f"| {name} | {t8s} | {t9:.2f} | {d} | {rs} |")
    tot8 = sum(v for k, v in q8.items() if k in q9)
    tot9 = sum(v for k, v in q9.items() if k in q8)
    print(f"\ncommon-query total: r8 {tot8:.1f}s -> r9 {tot9:.1f}s "
          f"({tot9 - tot8:+.1f}s); r9 full total {r9.get('value')}s "
          f"over {len(q9)} queries")


if __name__ == "__main__":
    main()
