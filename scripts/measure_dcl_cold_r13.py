"""Cold-path timing for the DCL fixture + the four dcl_* entries.

A fresh process pays the full fixture build (ancestor + two branches of
DML through the Database API) on the first entry — exactly what the
driver's correctness sweep pays once per process. Times each entry's
first call (count action, the bench's sink for these entries) after the
standard rel_equijoin warm-up. Usage:

    python scripts/measure_dcl_cold_r13.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
import __spark_entry__ as entrymod
from sakura_spark import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("dcl-cold-r13")
    qs = entrymod.queries()
    bench.run_query(qs["rel_equijoin"], spark, sf_dir)  # standard warm-up
    names = [
        "dcl_merge_prefer_left",
        "dcl_merge_revert",
        "dcl_time_travel",
        "dcl_merge_conflict",
    ]
    t00 = time.time()
    for name in names:
        spark.sparkContext.setJobDescription(f"dcl-cold:{name}")
        t0 = time.time()
        bench.run_query(qs[name], spark, sf_dir, noop=name in bench.NOOP_SINK)
        print(f"{name}: {time.time() - t0:.2f}s", flush=True)
    print(f"total (cold fixture + 4 entries): {time.time() - t00:.2f}s")
    print(f"probe_md5_16mib: {bench.probe_md5(16):.4f}")


if __name__ == "__main__":
    main()
