"""Round-13 session-3 probe: split DataFrame BUILD time (Python plan
construction, py4j traffic, driver-side jobs inside the builder) from
EXECUTION time (noop sink) for the heaviest batch extended entries.

A large build share means Catalyst/py4j/driver overhead, the Change-7
class of wins; a large exec share means the data path is the cost.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
from sakura_spark import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
import bench
ENTRIES = sys.argv[1:] or [
    n for n in bench.EXTENDED if not n.startswith("streaming_")
]

spark = get_spark()
qs = entry_mod.queries()
entry_mod.q_rel_equijoin(spark, SF_DIR).write.format("noop").mode(
    "overwrite"
).save()

print(f"{'entry':32s} {'build1':>7s} {'build2':>7s} {'exec1':>7s} {'exec2':>7s}")
for name in ENTRIES:
    fn = qs[name]
    builds, execs = [], []
    for _ in range(2):
        t0 = time.time()
        df = fn(spark, SF_DIR)
        t1 = time.time()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.time()
        builds.append(t1 - t0)
        execs.append(t2 - t1)
    print(
        f"{name:32s} {builds[0]:7.2f} {builds[1]:7.2f} "
        f"{execs[0]:7.2f} {execs[1]:7.2f}"
    )
