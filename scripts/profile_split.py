#!/usr/bin/env python
"""Decompose each bench query's wall into (function-body, count-action)
time.  The function body runs on the DRIVER (plan/expression construction,
py4j chatter) plus any eager jobs the query performs (store builds,
streaming runs); the count is the final timed action.  Queries whose body
dominates are driver-overhead-bound, not plan-cost-bound — the guide §7.3
signature ("nothing is running: the driver is doing something
single-threaded").

Usage: python scripts/profile_split.py [--sf DIR] [--only a,b] [--out F]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    import bench
    import __spark_entry__ as entry
    from hbase_indexer_spark.session import get_spark

    names = list(bench.BENCH_QUERIES)
    if "--only" in sys.argv:
        only = set(sys.argv[sys.argv.index("--only") + 1].split(","))
        names = [n for n in names if n in only]
    out_path = None
    if "--out" in sys.argv:
        out_path = sys.argv[sys.argv.index("--out") + 1]

    spark = get_spark("profile")
    qs = entry.queries()
    qs.update(entry.bench_only())
    spark.read.parquet(f"{SF_DIR}/region.parquet").count()

    rows = {}
    for name in names:
        try:
            # run twice, keep the min of each phase (bench methodology)
            builds, counts = [], []
            for _ in range(2):
                t0 = time.time()
                df = qs[name](spark, SF_DIR)
                t1 = time.time()
                df.count()
                t2 = time.time()
                builds.append(t1 - t0)
                counts.append(t2 - t1)
            rows[name] = {"build": round(min(builds), 3),
                          "count": round(min(counts), 3)}
            print(f"# {name}: build={rows[name]['build']}s "
                  f"count={rows[name]['count']}s", file=sys.stderr)
        except Exception as exc:  # noqa: BLE001
            rows[name] = {"error": str(exc).splitlines()[0][:200]}
            print(f"# {name}: ERROR {rows[name]['error']}", file=sys.stderr)
    doc = json.dumps(rows, indent=1, sort_keys=True)
    if out_path:
        with open(out_path, "w") as f:
            f.write(doc)
    else:
        print(doc)


if __name__ == "__main__":
    main()
