"""Measure sf0.1 -> sfN scaling factors for the headline pipelines.

Runs each query at the small and big scale (best of BENCH_RUNS, after a
warm-up), then reports the per-row cost ratio

    ratio = t_big / (factor * t_small)

A perfectly linear pipeline has ratio <= 1 (fixed job-launch overhead is
amortized at the bigger scale); a superlinear term (quadratic pair
expansion, driver-side accumulation, skew collapse) shows up as
ratio >> 1. Usage:

    python scripts/scale_bench.py [small_dir] [big_dir] [factor] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from sakura_spark import get_spark

# Coverage: every distinct pipeline family with nontrivial scale behavior.
# (duplicate_clusters runs inside dedup_near; quota/sample inside
# pipeline_curate.)
DEFAULT_QUERIES = [
    "flagship_revenue",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q18_large_orders",
    "agg_pricing_summary",
    "window_topk_per_group",
    "events_sessionize",
    "events_hourly",
    "tuple_hash",
    "text_quality",
    "text_langid",
    "dedup_exact",
    "dedup_minhash_pairs",
    "dedup_near",
    "curation_contamination",
    "shard_pack",
    "pipeline_curate",
    "sim_cosine_topk",
    "sim_ann_lsh",
    "asof_join",
    # round-6 additions: histogram-agg, interval-join, PQ-encode families
    "text_repetition",
    "events_attribution",
    "sim_pq_encode_fixed",
]


def execute(df) -> None:
    """Force FULL plan execution via the noop sink.

    `.count()` (bench.py's frozen protocol) lets Catalyst prune map-only
    projections down to a parquet metadata count — fine for relative
    baseline comparisons, useless for scaling measurement (a 100x bigger
    hash projection would "run" in constant time). The noop datasource
    executes every operator and discards rows at the sink.
    """
    df.write.format("noop").mode("overwrite").save()


def best_time(fn, spark, sf_dir, runs: int) -> float:
    best = float("inf")
    for _ in range(runs):
        t0 = time.time()
        execute(fn(spark, sf_dir))
        best = min(best, time.time() - t0)
    return best


def main() -> None:
    small = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    big = sys.argv[2] if len(sys.argv) > 2 else ".scale_sf1"
    factor = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    names = sys.argv[4:] or DEFAULT_QUERIES
    runs = int(os.environ.get("BENCH_RUNS", "2"))

    spark = get_spark("sakura-scale-bench")
    qs = entrymod.queries()
    execute(qs["flagship_revenue"](spark, small))  # warm-up

    results = {}
    for name in names:
        t_small = best_time(qs[name], spark, small, runs)
        t_big = best_time(qs[name], spark, big, runs)
        ratio = t_big / (factor * t_small) if t_small > 0 else None
        results[name] = {
            "t_small_sec": round(t_small, 3),
            "t_big_sec": round(t_big, 3),
            "per_row_cost_ratio": round(ratio, 3) if ratio is not None else None,
        }
        print(
            f"{name}: {t_small:.2f}s -> {t_big:.2f}s  ratio={ratio:.2f}",
            file=sys.stderr,
            flush=True,
        )

    print(json.dumps({"factor": factor, "small": small, "big": big,
                      "queries": results}))


if __name__ == "__main__":
    main()
