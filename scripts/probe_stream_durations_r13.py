"""Round-13 session-3 probe: where does streaming-entry wall time go?

Runs a few streaming_*_equiv entries under the bench protocol and dumps
each micro-batch's durationMs breakdown (addBatch, walCommit,
commitOffsets, getBatch, latestOffset, queryPlanning, triggerExecution)
plus stateOperator commit times, so we can see how much of the per-entry
cost is checkpoint/WAL I/O vs actual computation.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
from sakura_spark import get_spark
from sakura_spark.streaming import events as ev

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ENTRIES = [
    "streaming_timeout_equiv",
    "streaming_join_equiv",
    "streaming_kmv_equiv",
    "streaming_full_outer_join_equiv",
]

captured = []
_orig = ev.run_to_memory


def capturing_run_to_memory(df, name, **kw):
    q = _orig(df, name, **kw)
    progs = [p for p in (q.recentProgress or []) if p]
    captured.append((name, progs))
    return q


ev.run_to_memory = capturing_run_to_memory
# The entry module imports `events as ev` inside each function body, so the
# monkeypatch on the module attribute is seen by every entry.

spark = get_spark()
qs = entry_mod.queries()

# Warm-up
entry_mod.q_rel_equijoin(spark, SF_DIR).write.format("noop").mode("overwrite").save()

for name in ENTRIES:
    fn = qs[name]
    best = None
    for run in range(2):
        captured.clear()
        t0 = time.time()
        df = fn(spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        if best is None or dt < best[0]:
            best = (dt, list(captured))
    dt, caps = best
    print(f"\n=== {name}: best-of-2 {dt:.2f}s ===")
    for sink, progs in caps:
        tot = {}
        n_state_ms = 0
        for p in progs:
            for k, v in (p.get("durationMs") or {}).items():
                tot[k] = tot.get(k, 0) + v
            for so in p.get("stateOperators") or []:
                n_state_ms += so.get("allUpdatesTimeMs", 0) + so.get(
                    "commitTimeMs", 0
                )
                for k in ("allUpdatesTimeMs", "commitTimeMs",
                          "allRemovalsTimeMs", "numRowsTotal",
                          "numRowsUpdated"):
                    tot["so:" + k] = tot.get("so:" + k, 0) + so.get(k, 0)
        print(f"  {len(progs)} batches; durationMs totals: {json.dumps(tot)}")
        print(f"  state allUpdates+commit total: {n_state_ms} ms")
        trig = tot.get("triggerExecution", 0)
        add = tot.get("addBatch", 0)
        wal = tot.get("walCommit", 0) + tot.get("commitOffsets", 0)
        plan = tot.get("queryPlanning", 0)
        print(
            f"  trigger={trig}ms addBatch={add}ms wal+commit={wal}ms "
            f"planning={plan}ms other={trig-add-wal-plan}ms "
            f"outside-triggers={dt*1000 - trig:.0f}ms"
        )
