"""Phase-level breakdown of the COLD DCL fixture build (round 14).

The round-13 ledger left "~25 s of per-statement ICL validation jobs"
as the largest measured remaining cost; this harness attributes the
cold fixture wall time to the actual API calls — per-statement job
groups over the exact _dcl_merge_fixture sequence plus the four
entries' merges — so the round-14 optimization targets the real
spenders instead of the suspected ones. Usage:

    python scripts/measure_dcl_phases_r14.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
import __spark_entry__ as entrymod
from pyspark.sql import functions as F
from sakura_spark import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("dcl-phases-r14")
    sc = spark.sparkContext
    qs = entrymod.queries()
    bench.run_query(qs["rel_equijoin"], spark, sf_dir)  # standard warm-up

    from sakura_spark.database import Database
    from sakura_spark.management.branches import BranchManager
    from sakura_spark.management.store import SnapshotStore

    phases: list[tuple[str, int, float]] = []

    def run(tag: str, fn):
        sc.setJobGroup(tag, tag)
        t0 = time.time()
        out = fn()
        dt = time.time() - t0
        sc.setJobGroup("__idle__", "idle")
        n = len(sc.statusTracker().getJobIdsForGroup(tag))
        phases.append((tag, n, dt))
        print(f"{tag}: {n} jobs, {dt:.2f}s", flush=True)
        return out

    _t = entrymod._t
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("long").alias("c_custkey"),
        F.col("c_nationkey").cast("long").alias("c_nationkey"),
        "c_mktsegment",
    )
    nation = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("long").alias("n_nationkey"), "n_name"
    )
    anc_cust = cust.filter(F.col("c_custkey") % 7 != 0)
    store = SnapshotStore()
    db = Database(spark, "dcl_merge", store=store, snapshot_on_mutation=False)
    db.create_relation(
        "cust",
        [("c_custkey", "integer"), ("c_nationkey", "integer"), ("c_mktsegment", "string")],
    )
    run("anc_insert_cust", lambda: db.insert_tuples("cust", anc_cust))
    db.create_relation("aux", [("n_nationkey", "integer"), ("n_name", "string")])
    run("anc_insert_aux", lambda: db.insert_tuples("aux", nation))
    anc_hash = run("anc_commit", db.commit)
    bm = BranchManager(store)
    bm.create_branch("left", anc_hash)
    bm.create_branch("right", anc_hash)

    ldb = run("left_checkout", lambda: bm.checkout(spark, "left"))
    ldb.snapshot_on_mutation = False
    run(
        "left_delete_where",
        lambda: ldb.delete_where(
            "cust", anc_cust.filter(F.col("c_custkey") % 5 == 1).select("c_custkey")
        ),
    )
    run(
        "left_insert",
        lambda: ldb.insert_tuples(
            "cust",
            cust.filter((F.col("c_custkey") % 7 == 0) & (F.col("c_custkey") % 2 == 0))
            .select("c_custkey", "c_nationkey", F.lit("LEFT").alias("c_mktsegment")),
        ),
    )
    ldb.retract_relation("aux")
    run("left_commit", lambda: bm.update_branch_tip("left", ldb.commit()))

    rdb = run("right_checkout", lambda: bm.checkout(spark, "right"))
    rdb.snapshot_on_mutation = False
    run(
        "right_delete_where",
        lambda: rdb.delete_where(
            "cust", anc_cust.filter(F.col("c_custkey") % 5 == 2).select("c_custkey")
        ),
    )
    run(
        "right_insert_cust",
        lambda: rdb.insert_tuples(
            "cust",
            cust.filter((F.col("c_custkey") % 7 == 0) & (F.col("c_custkey") % 2 == 1))
            .select("c_custkey", "c_nationkey", F.lit("RIGHT").alias("c_mktsegment")),
        ),
    )
    run(
        "right_insert_aux",
        lambda: rdb.insert_tuples(
            "aux",
            nation.select(
                (F.col("n_nationkey") + 100).alias("n_nationkey"),
                F.concat(F.col("n_name"), F.lit("_R")).alias("n_name"),
            ),
        ),
    )
    run("right_commit", lambda: bm.update_branch_tip("right", rdb.commit()))

    from sakura_spark.management.merge import PREFER_LEFT, PREFER_RIGHT, REVERT_TO_ANCESTOR

    lt, rt = ldb.hash, rdb.hash
    for tag, strat in (
        ("merge_prefer_left", PREFER_LEFT),
        ("merge_prefer_right", PREFER_RIGHT),
        ("merge_revert", REVERT_TO_ANCESTOR),
    ):
        bm.update_branch_tip("left", lt)
        bm.update_branch_tip("right", rt)
        merged, _conf = run(tag, lambda s=strat: bm.merge(spark, "left", "right", s))
        run(tag + "_read", lambda m=merged: m.relation("cust").count())

    total_jobs = sum(n for _, n, _ in phases)
    total_time = sum(t for _, _, t in phases)
    print(f"TOTAL: {total_jobs} jobs, {total_time:.2f}s")
    print(f"probe_md5_16mib: {bench.probe_md5(16):.4f}")


if __name__ == "__main__":
    main()
