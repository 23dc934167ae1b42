#!/usr/bin/env python
"""Capture `.explain("formatted")` for named queries into files.

Usage: python scripts/capture_plans.py --outdir plans/r09 --suffix _after \
           [--sf DIR] q1 q2 ...
Writes <outdir>/<query><suffix>.txt.  Run from the repo root whose code
should be captured (sys.path[0] = cwd).
"""

from __future__ import annotations

import argparse
import contextlib
import io
import os
import sys

sys.path.insert(0, os.getcwd())


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--outdir", required=True)
    ap.add_argument("--suffix", default="")
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    import __spark_entry__ as entry
    from hbase_indexer_spark.session import get_spark

    spark = get_spark("capture-plans")
    qs = entry.queries()
    qs.update(entry.bench_only())
    os.makedirs(args.outdir, exist_ok=True)
    for name in args.queries:
        df = qs[name](spark, args.sf)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(args.outdir, f"{name}{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
