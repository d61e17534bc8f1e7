"""Spark-job-count evidence for the round-13 DML validation folds.

Counts the Spark jobs each DML statement launches (statusTracker over a
per-statement job group) — the delete_where and assign folds are
scheduler-overhead wins, so the job count IS the plan diff. Usage:

    python scripts/measure_dml_jobs_r13.py
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sakura_spark import get_spark
from sakura_spark.database import Database
from sakura_spark.management.store import SnapshotStore


def main() -> None:
    spark = get_spark("dml-jobs-r13")
    sc = spark.sparkContext
    store = SnapshotStore(tempfile.mkdtemp(prefix="dmljobs_"))
    db = Database(spark, "m", store=store, snapshot_on_mutation=False)
    db.create_relation("users", [("name", "string"), ("age", "natural")])
    db.insert_tuples("users", [{"name": f"u{i}", "age": i} for i in range(50)])

    def run(tag: str, fn) -> None:
        sc.setJobGroup(tag, tag)
        t0 = time.time()
        out = fn()
        dt = time.time() - t0
        sc.setJobGroup("__idle__", "idle")
        n = len(sc.statusTracker().getJobIdsForGroup(tag))
        print(f"{tag}: {n} Spark jobs, {dt:.2f}s, returned {out}")

    pred = spark.createDataFrame([(i,) for i in range(0, 50, 2)], "age long")
    run("delete_where", lambda: db.delete_where("users", pred))
    new = spark.createDataFrame(
        [(f"v{i}", i) for i in range(30)], "name string, age long"
    )
    run("assign", lambda: db.assign("users", new))
    miss = spark.createDataFrame([(999,)], "age long")
    run("delete_where_noop", lambda: db.delete_where("users", miss))


if __name__ == "__main__":
    main()
