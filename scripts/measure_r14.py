"""Round-13 optimization measurement harness.

Times individual registry entries with the EXACT bench.py protocol
(count vs noop sink per bench.NOOP_SINK membership, best-of-N after a
warm-up) and captures .explain("formatted") to plans/r14/<name>_<tag>.txt.

Usage:
    python scripts/measure_r14.py [--tag before|after] [--runs N]
        [--no-plan] query [query ...]

Prints one JSON line {"tag":..., "queries": {name: best_sec}} so numbers
paste straight into OPTIMIZATION_r14.md.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
import __spark_entry__ as entrymod
from sakura_spark import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="before")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--no-plan", action="store_true")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    spark = get_spark("sakura-measure-r14")
    qs = entrymod.queries()
    plan_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r14")
    os.makedirs(plan_dir, exist_ok=True)

    # Warm-up: JVM, parquet footer caches, codegen paths (bench protocol).
    bench.run_query(qs["rel_equijoin"], spark, args.sf_dir)

    out: dict[str, float] = {}
    for name in args.queries:
        fn = qs[name]
        noop = name in bench.NOOP_SINK
        spark.sparkContext.setJobDescription(f"r14-measure:{name}")
        best = float("inf")
        for _ in range(args.runs):
            t0 = time.time()
            bench.run_query(fn, spark, args.sf_dir, noop=noop)
            best = min(best, time.time() - t0)
        out[name] = round(best, 3)
        if not args.no_plan:
            df = fn(spark, args.sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(plan_dir, f"{name}_{args.tag}.txt"), "w") as fh:
                fh.write(buf.getvalue())
        spark.sparkContext.setJobDescription(None)
        print(f"{name}: {out[name]:.3f}s ({'noop' if noop else 'count'})",
              file=sys.stderr)

    print(json.dumps({"tag": args.tag, "sf_dir": args.sf_dir,
                      "probe_md5_16mib": bench.probe_md5(16),
                      "queries": out}))


if __name__ == "__main__":
    main()
