"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Per-query time = best of BENCH_RUNS_HEADLINE / BENCH_RUNS_EXTENDED
executions (both default max(BENCH_RUNS, 3), i.e. best-of-3 — headline
since round 12, extended since round 13; the r12 best-of-2 reading is
still recorded per extended entry as `extended_best2`) of the full
pipeline including the action (count/collect-to-driver of the result),
after one warm-up query to absorb JVM/codegen startup.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from sakura_spark import get_spark

HEADLINE = [
    "flagship_revenue",
    "agg_pricing_summary",
    "rel_equijoin",
    "rel_semijoin",
    "rel_diff",
    "window_topk_per_group",
    "events_sessionize",
    "events_hourly",
    "text_quality",
    "dedup_exact",
    "dedup_minhash_pairs",
    "sim_cosine_topk",
    "tuple_hash",
    "asof_join",
    "range_join",
    "text_langid",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
]

# Measured and reported alongside, but NOT in the headline total — the
# headline set is frozen so `value` stays comparable to BASELINE.md across
# rounds. First-measurement values recorded in the BASELINE.md addendum.
EXTENDED = [
    "tpch_q10_returned_items",
    "tpch_q18_large_orders",
    "curation_sample",
    "curation_contamination",
    "shard_pack",
    "pipeline_curate",
    "text_pii_redact",
    "sim_embedding_quantize",
    # round 4 additions (first measurements recorded in BASELINE.md):
    "curation_split",
    "text_ttr",
    "multimodal_decode",
    "dedup_near",
    # round 5 additions (first measurements recorded in BASELINE.md):
    "tpch_q4_order_priority",
    "tpch_q22_idle_customers",
    "events_top_paths",
    "curation_mixture",
    "curation_quality_report",
    # round 6 additions (first measurements recorded in BASELINE.md):
    "events_attribution",
    "sim_pq_encode_fixed",
    "text_repetition",
    "text_lm_score",
    # round 7 additions (first measurements recorded in BASELINE.md):
    "dedup_span_removal",
    "dedup_line_dedup",
    "text_normalize",
    "curation_length_buckets",
    "sim_ann_ivfpq",
    "events_anomaly",
    "text_chunk",
    "sim_semantic_dedup",
    "text_tfidf_topk",
    "text_collocations",
    "text_inverted_index",
    "er_name_pairs",
    "sketch_hll_registers",
    "sketch_cms_estimate",
    "sketch_kmv",
    "sketch_hll_hourly_users",
    "sketch_kmv_overlap",
    "sketch_cms_hourly_users",
    "sketch_quantile_registers",
    "sketch_bloom_bits",
    "sketch_bloom_semijoin",
    "sketch_heavy_hitters",
    "sketch_bloom_hourly_users",
    "sketch_hll_cumulative_users",
    "curation_weighted_sample",
    # round 8 additions (first measurements recorded in BASELINE.md):
    "sketch_merge_law",
    "curation_gopher_filter",
    "multimodal_audio",
    "text_bm25_topk",
    "graph_pagerank",
    "graph_triangles",
    "text_readability",
    "curation_source_stats",
    "dedup_jaccard_selfjoin",
    "sim_random_projection",
    "graph_components",
    "multimodal_adpcm",
    "rel_salted_join",
    "dedup_minhash_portable",
    "curation_ppl_buckets",
    "dedup_simhash_portable",
    "sim_ivf_assign_fixed",
    # round 9 additions (first measurements recorded in BASELINE.md):
    # the streaming<->batch equivalence quartet (each runs a real
    # microbatched streaming job to a memory sink) and the newly
    # oracle-backed LSH entries. sim_ann_recall stays out — ~24 s of
    # deliberate training cost per run belongs in scale_results, not in
    # the per-round bench budget.
    "streaming_hll_equiv",
    "streaming_cms_equiv",
    "streaming_bloom_equiv",
    "streaming_kmv_equiv",
    "sim_ann_lsh",
    "sim_embedding_near_dup",
    # Round-9 session 3 additions (first measurements recorded in
    # BASELINE.md): corpus overlap, feature hashing, the PCA moment
    # table, the three fixed-codebook ANN end-to-end twins, and the
    # BPE portable row.
    "dedup_corpus_overlap",
    "text_hash_features",
    "sim_embedding_moments",
    "sim_ivf_topk_fixed",
    "sim_semdedup_fixed",
    "sim_ivfpq_topk_fixed",
    "text_bpe_portable",
    "sim_pq_topk_fixed",
    "text_hash_score",
    "streaming_dedup_equiv",
    "rel_group_checksum",
    # Round-9 session 4 additions (first measurements recorded in
    # BASELINE.md): the video codec leg, the stream-stream join
    # equivalence row, and MERGE/upsert.
    "multimodal_video",
    "multimodal_video_frames",
    "streaming_join_equiv",
    "rel_merge_upsert",
    "rel_scd2",
    "multimodal_av_demux",
    "text_hybrid_rrf",
    "curation_leakage_split",
    "multimodal_image_exact",
    "sketch_hll_cube",
    "rel_merge_delete",
    # Round-10 additions (first measurements recorded in BASELINE.md):
    # the GIF/LZW and baseline-JPEG hash-exact codec twins.
    "multimodal_gif_exact",
    "multimodal_jpeg_exact",
    # Round-10 session-2: layout / temporal / IVM quartet.
    "sort_zorder_layout",
    "rel_ivm_delta",
    "rel_scd2_pit",
    "window_sliding_range",
    "events_gapfill_locf",
    "agg_equidepth_hist",
    "curation_freshness_decay",
    "streaming_session_equiv",
    "rel_unpivot",
    "window_rank_funcs",
    "agg_mode",
    "graph_bfs_levels",
    "multimodal_resize_exact",
    "rel_snapshot_diff",
    "streaming_sliding_equiv",
    "agg_corr_exact",
    "sort_zorder_pruning",
    "agg_linear_fit",
    "events_transition_probs",
    # Round-11 additions (first measurements recorded in BASELINE.md):
    # the CDC round-trip law and the convergence-detected BFS.
    "rel_snapshot_roundtrip",
    "graph_bfs_converged",
    # Round-11 session-2 additions: the left-outer streaming join, the
    # bilinear join-IVM, and changelog compaction.
    "streaming_outer_join_equiv",
    "rel_ivm_join_delta",
    "rel_changelog_compact",
    # Round-11 session-3 additions: tolerance-asof, CBO join-size
    # profile, interval concurrency sweep.
    "asof_join_tolerance",
    "stats_join_cardinality",
    "events_concurrency",
    # Round-11 session-4 additions: update-mode stateful equivalence and
    # the retrieval-eval MRR row.
    "streaming_update_equiv",
    "text_mrr",
    # Round-11 session-5 additions: Hilbert layout + pruning.
    "sort_hilbert_layout",
    "sort_hilbert_pruning",
    # Round-11 session-6 addition: incremental SCD2 apply.
    "rel_scd2_apply",
    # Round-12 additions (first measurements recorded in BASELINE.md):
    # the late-data SCD2 rebuild, the CDC-to-SCD2 pipeline law, 3-D
    # Hilbert-vs-Morton, the full-outer and event-time-timeout streaming
    # equivalences, and ER clusters.
    "rel_scd2_late",
    "rel_cdc_to_scd2",
    "sort_hilbert_3d",
    "streaming_full_outer_join_equiv",
    "streaming_timeout_equiv",
    "er_clusters",
    # Round-13 additions (first measurements recorded in BASELINE.md):
    # the DCL merge pair, the fused CDC backfill, the production-LSH
    # superset law, and the k-core peel.
    "dcl_merge_prefer_left",
    "dcl_merge_conflict",
    "dcl_merge_revert",
    "dcl_time_travel",
    "rel_cdc_to_scd2_fused",
    "dedup_minhash_superset",
    "graph_kcore",
    "streaming_quantile_equiv",
]

# Entries whose implementation (or shared harness) changed in the CURRENT
# round, pinned into the compact extended line regardless of rank so the
# driver artifact always carries the numbers the round's work is judged
# on (VERDICT r10 item 2: BENCH_r10's tail capture lost the two entries
# round 10 specifically optimized).
WATCH = [
    # Round-13 new entries.
    "dcl_merge_prefer_left",
    "dcl_merge_conflict",
    "dcl_merge_revert",
    "dcl_time_travel",
    "rel_cdc_to_scd2_fused",
    "dedup_minhash_superset",
    "graph_kcore",
    "streaming_quantile_equiv",
    # Round-13 changed implementations: the stacked single-layout-pass
    # Hilbert entry, the adaptive-state full-outer join, the epoch-bound
    # min/max timeout fix, the 2^40 CDC commit seq, and the five
    # formerly rows-only entries whose spellings changed to carry
    # oracles (dims report unchanged-plan decode excepted).
    "sort_hilbert_3d",
    "streaming_full_outer_join_equiv",
    "streaming_timeout_equiv",
    "rel_cdc_to_scd2",
    "dedup_simhash",
    "sim_semantic_dedup",
    "sim_ann_ivf",
    "sim_ann_recall",
    "dedup_near",
    "multimodal_decode",
]

# Join-elimination-prone extended entries are forced through the noop
# sink instead of .count(): Catalyst prunes a count over a pure
# projection down to a parquet metadata read (round-4 lesson: ~0.12 s
# "baselines" for md5/tokenization work), and also ELIMINATES left joins
# on unique keys under count (round-6 lesson: ~0.4 s readings vs
# ~10-28 s of real work). The noop sink executes every operator and
# discards rows. Pre-noop numbers are annotated as metadata-count
# timings in BASELINE.md. The HEADLINE set stays on the frozen .count()
# protocol for cross-round comparability.
NOOP_SINK = {
    "curation_split",
    "text_ttr",
    "text_pii_redact",
    "sim_embedding_quantize",
    "sim_pq_encode_fixed",
    "text_repetition",
    "text_lm_score",
    # Round-7: both removal operators end in a 1:1 doc-keyed join or
    # groupBy whose output cardinality equals the base scan, so .count()
    # would join-eliminate them too.
    "dedup_span_removal",
    "dedup_line_dedup",
    # Pure map-only projection: .count() would be a parquet footer read.
    "text_normalize",
    # Map-only explode+substr: .count() keeps the explode (row count
    # depends on it) but prunes the substr chunk column away.
    "text_chunk",
    # Final report is a left join on a unique key: .count() would
    # join-eliminate the whole kept-side dedup computation.
    "sim_semantic_dedup",
    # groupBy whose output cardinality is the group-key count: .count()
    # would prune the collect_list postings aggregate entirely.
    "text_inverted_index",
    # Sketch registers/estimates: .count() would prune the aggregated
    # register columns (MAX rho / MIN cnt / hval) and with them most of
    # the sha256 hashing work.
    "sketch_hll_registers",
    "sketch_cms_estimate",
    "sketch_kmv",
    "sketch_hll_hourly_users",
    "sketch_kmv_overlap",
    "sketch_cms_hourly_users",
    "sketch_quantile_registers",
    # Round-8: merged registers are aggregate columns a .count() would
    # prune (same hazard as the register entries above).
    "sketch_merge_law",
    # Audio metadata rides mapInPandas (no pruning hazard), but the
    # synthesis repartition makes .count() safe yet the decode columns
    # prunable — keep the full decode honest via the sink.
    "multimodal_audio",
    "multimodal_adpcm",
    # Each iteration ends in a left join on the unique node key: .count()
    # would join-eliminate the whole rank recursion.
    "graph_pagerank",
    # The label column is the whole computation; a .count() of the final
    # groupBy could skip the min aggregates.
    "graph_components",
    # 16 signature mins are aggregate columns a .count() would prune.
    "dedup_minhash_portable",
    # The ntile bucket column would be pruned under .count().
    "curation_ppl_buckets",
    # The assembled signature is an aggregate-derived column .count() prunes.
    "dedup_simhash_portable",
    # Map-only projection: .count() would be a parquet footer read.
    "sim_ivf_assign_fixed",
    # Pure map-only metric projections / aggregate-column outputs a
    # .count() would prune entirely (same hazard as text_quality).
    "text_readability",
    "curation_source_stats",
    "sim_random_projection",
    # Round-9: a .count() over the ordered limit could let EliminateSorts
    # drop the cosine ranking work — force full execution.
    "sim_ann_lsh",
    # Round-9 session 3: the 64 signature mins / sum-columns /
    # moment sums are aggregate columns a .count() would prune.
    "dedup_corpus_overlap",
    "text_hash_features",
    "sim_embedding_moments",
    # Ordered-limit entries (the sim_ann_lsh hazard) and the anti-join
    # report whose cluster column a .count() could prune.
    "sim_ivf_topk_fixed",
    "sim_ivfpq_topk_fixed",
    "sim_semdedup_fixed",
    # Map-only pandas-UDF projection: .count() would prune the UDF
    # column and with it the whole encode loop.
    "text_bpe_portable",
    "sim_pq_topk_fixed",
    # Score/count are aggregate columns a .count() would prune.
    "text_hash_score",
    # The four word sums are aggregate columns a .count() would prune.
    "rel_group_checksum",
    # Round-13: the found_by_lsh flag rides a left join that .count()
    # could eliminate if the candidate side proves unique — which would
    # skip the entire LSH pipeline under measurement.
    "dedup_minhash_superset",
}

# Headline entries with the same .count()-collapse hazard (pure map-only
# projections: the frozen .count() reading is a parquet metadata scan,
# not the operator's work). They stay in the frozen total unchanged —
# but each run ALSO records their noop-sink time in `headline_noop`, so
# a regression in the actual md5/tokenization/langid work is visible
# instead of hiding behind the footer read (VERDICT r6 item 5).
HEADLINE_NOOP = ["text_quality", "tuple_hash", "text_langid"]


def environment() -> dict:
    """Machine snapshot recorded with every bench run.

    Round-3 lesson: the headline total moved 7.31 -> 11.33 s between rounds
    with identical plans — uniform machine drift, unprovable after the fact
    because the JSON carried no environment data. Now every run records
    load average, CPU model, core count, and a wall-clock timestamp so
    cross-round comparisons can be qualified.
    """
    env: dict = {"timestamp_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())}
    try:
        env["loadavg_1m_5m_15m"] = [round(x, 2) for x in os.getloadavg()]
    except OSError:
        env["loadavg_1m_5m_15m"] = None
    try:
        with open("/proc/cpuinfo") as fh:
            for line in fh:
                if line.lower().startswith("model name"):
                    env["cpu_model"] = line.split(":", 1)[1].strip()
                    break
    except OSError:
        env["cpu_model"] = None
    env["cpu_count"] = os.cpu_count()
    env["spark_cpus"] = os.environ.get("SPARK_GRAFT_CPUS", "32")
    # Deterministic single-thread CPU probe: md5 over 64 MiB of zeros
    # (pure C, no allocation churn, no BLAS threading). Round-6 lesson:
    # an uncontended run (loadavg 1.65) and the driver's contended run
    # (loadavg 3.85) both read 14.5 s — uniformly ~1.5x round 4 on
    # unchanged plans — so instantaneous loadavg does NOT explain
    # cross-round drift; this probe gives each artifact an absolute
    # machine-speed number to normalize against.
    import hashlib

    chunk = b"\x00" * (1 << 20)
    t0 = time.time()
    h = hashlib.md5()
    for _ in range(64):
        h.update(chunk)
    env["cpu_probe_md5_64mib_sec"] = round(time.time() - t0, 4)
    # Round-9 session-3 lesson: the single-thread probe read its FASTEST
    # value on record (0.104) while the headline ran 1.5x slow at both
    # the current AND the prior HEAD (A/B-proven machine drift, see
    # BASELINE.md) — co-tenant steal degrades MULTI-core throughput
    # without touching a one-core probe (/proc/stat showed 14.8% steal
    # bursts). This probe runs the same 64 MiB md5 on 8 concurrent
    # threads (hashlib releases the GIL for large updates): with free
    # cores its wall time ~= the single-thread probe; under co-tenant
    # pressure it inflates. The mt/st ratio is the parallel-degradation
    # signal the normalization was missing.
    import threading

    def worker():
        hh = hashlib.md5()
        for _ in range(64):
            hh.update(chunk)

    threads = [threading.Thread(target=worker) for _ in range(8)]
    t0 = time.time()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    env["cpu_probe_mt8_md5_64mib_sec"] = round(time.time() - t0, 4)
    # Steal time share since boot (co-tenant pressure is invisible to
    # loadavg inside the guest; steal is the kernel's direct record).
    try:
        with open("/proc/stat") as fh:
            parts = fh.readline().split()[1:]
        vals = [int(x) for x in parts[:8]]
        env["cpu_steal_pct_since_boot"] = round(100 * vals[7] / sum(vals), 2)
    except (OSError, IndexError, ValueError, ZeroDivisionError):
        env["cpu_steal_pct_since_boot"] = None
    return env


def wait_for_quiet(threshold: float, max_wait_sec: float) -> dict:
    """Bounded wait for machine quiet before measuring.

    Round-5 lesson: the driver's bench artifact recorded loadavg 3.85 and
    read 0.90x of baseline while an immediate re-run under falling load
    read 0.77x — the worst artifact ratio of any round, purely from
    contention. Poll loadavg_1m until it drops below ``threshold`` or
    ``max_wait_sec`` elapses; the returned dict (waited seconds, start
    loadavg, contended flag) goes into the environment block so a
    contended run is labeled as such instead of reading as a regression."""
    t0 = time.time()
    waited = 0.0
    while True:
        try:
            load = os.getloadavg()[0]
        except OSError:
            return {"wait_sec": 0.0, "loadavg_1m_at_start": None, "contended": None}
        waited = time.time() - t0
        if load < threshold or waited >= max_wait_sec:
            return {
                "wait_sec": round(waited, 1),
                "loadavg_1m_at_start": round(load, 2),
                "contended": load >= threshold,
            }
        time.sleep(5.0)


def probe_md5(mib: int) -> float:
    """Single-thread md5 over ``mib`` MiB of zeros — the same machine-speed
    probe as environment(), sized small enough (16 MiB ≈ 0.03 s on the
    record-fast state) to run PER HEADLINE QUERY: a mid-run co-tenant
    burst then shows up against the exact queries it inflated, instead of
    being adjudicated from one pre-run reading (round-12 item 8 — the
    r11 artifact landed on a drifted window the per-run probes could
    only explain in aggregate)."""
    import hashlib

    chunk = b"\x00" * (1 << 20)
    h = hashlib.md5()
    t0 = time.time()
    for _ in range(mib):
        h.update(chunk)
    return round(time.time() - t0, 4)


def probe_md5_mt8(mib: int) -> float:
    """8-thread md5 probe, ``mib`` MiB PER THREAD — the per-query twin of
    environment()'s cpu_probe_mt8 (hashlib releases the GIL, so with free
    cores the wall time ~= the single-thread probe over the same per-core
    bytes). Round-13 session-4 lesson: a headline window ran 6.5x slow
    (dedup_minhash_pairs 37 s vs 2.8 isolated minutes later) while every
    per-query SINGLE-thread probe read quiet (median 0.025) — co-tenant
    steal took most cores but always left one free, so the st-median
    retry trigger never fired and the contended window went unhealed.
    The mt8/st ratio per query is the signal that distinguishes the two:
    ~1.0-1.2 with free cores, >1.35 under multi-core steal, independent
    of absolute machine speed."""
    import hashlib
    import threading

    chunk = b"\x00" * (1 << 20)

    def worker():
        hh = hashlib.md5()
        for _ in range(mib):
            hh.update(chunk)

    threads = [threading.Thread(target=worker) for _ in range(8)]
    t0 = time.time()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    return round(time.time() - t0, 4)


# A deliberately parallelism-BOUND calibration entry (round-14, VERDICT
# r13 item 1): PERF_r13 flagged `suspect_cpus_ignored` because at sf0.1
# every headline query is 0.16-1.7 s — planning/scheduling-dominated, so
# the driver's c32-vs-c8 ratios all read ~1.0 and nothing in the artifact
# could REFUTE the suspicion that the bench ignores $SPARK_GRAFT_CPUS
# (it does not: get_spark builds master(local[$SPARK_GRAFT_CPUS])). This
# entry is fixed CPU work in 64 equal codegen tasks — sha2 chains over
# disjoint id ranges — so its wall time scales inversely with the
# session's core budget (2 task waves at 32 cores, 8 waves at 8): the
# driver's low-core twin run reads ~4x, making the core-count contract
# self-proving from the artifact alone. It is reported inside `queries`
# (the contract allows additions) but NEVER enters the headline total,
# which stays the frozen 18-query sum comparable to BASELINE.md.
SCALING_PROBE = "cpu_scaling_probe_64task"


def scaling_probe(spark) -> float:
    from pyspark.sql import functions as F

    # 64 partitions x 400k rows, 4 chained sha2 per row — one map-only
    # codegen stage, zero shuffle, agg forces every row.
    df = spark.range(0, 64 * 400_000, 1, 64)
    h = F.sha2(F.col("id").cast("string"), 256)
    for _ in range(3):
        h = F.sha2(h, 256)
    t0 = time.time()
    df.select(h.alias("h")).agg(F.max("h")).collect()
    return round(time.time() - t0, 3)


def run_query(fn, spark, sf_dir, noop: bool = False):
    df = fn(spark, sf_dir)
    if noop:
        # Full plan execution, rows discarded at the sink (map-only plans
        # would otherwise collapse to a parquet metadata count).
        df.write.format("noop").mode("overwrite").save()
        return None
    # Force full execution and result transfer without driver-side blowup.
    return df.count()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("BENCH_RUNS", "2"))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = get_spark("sakura-bench")
    qs = entrymod.queries()

    # Wait (bounded) for background load to clear, then snapshot the
    # environment BEFORE measuring — post-run loadavg mostly reflects the
    # bench's own 32-thread burst, not ambient contention.
    quiet = wait_for_quiet(
        threshold=float(os.environ.get("BENCH_LOAD_THRESHOLD", "3.0")),
        max_wait_sec=float(os.environ.get("BENCH_LOAD_MAX_WAIT", "120")),
    )
    env = environment()
    env.update(quiet)
    # The core-count contract, recorded where the driver can check it
    # (VERDICT r13 item 1): the session's actual master string and task
    # parallelism. Both also ride the compact tail line.
    env["spark_master"] = spark.sparkContext.master
    env["spark_default_parallelism"] = spark.sparkContext.defaultParallelism

    # Warm-up: JVM, parquet footer caches, codegen paths.
    run_query(qs["rel_equijoin"], spark, sf_dir)

    # Headline is best-of-3 by default (round-12 item 8; extended joined
    # at round 13 session 5 with the best-of-2 twin recorded) — one more
    # sample per frozen query buys drift immunity for the number
    # BASELINE.md is compared against.
    runs_headline = int(os.environ.get("BENCH_RUNS_HEADLINE", str(max(runs, 3))))

    def headline_window():
        w_times: dict[str, float] = {}
        w_load: list = []
        w_probe: list = []
        w_probe_mt: list = []
        for name in HEADLINE:
            fn = qs[name]
            try:
                w_load.append(round(os.getloadavg()[0], 2))
            except OSError:
                w_load.append(None)
            w_probe.append(probe_md5(16))
            w_probe_mt.append(probe_md5_mt8(16))
            best = float("inf")
            for _ in range(runs_headline):
                t0 = time.time()
                run_query(fn, spark, sf_dir)
                best = min(best, time.time() - t0)
            w_times[name] = round(best, 3)
        return w_times, w_load, w_probe, w_probe_mt

    times1, q_load, q_probe, q_probe_mt = headline_window()
    times = dict(times1)

    # SELF-HEALING window (round-13, VERDICT r12 item 5): the r11 and r12
    # driver artifacts both landed on contended windows that only the
    # probe arrays could explain after the fact. Detect it DURING the
    # run instead: the per-query 16 MiB probes sample machine speed
    # mid-headline; if their median is >15% slower than the pre-run
    # ambient probe (64 MiB reading scaled to 16), the window was
    # contended — take ONE more full headline window and keep the
    # per-query best across windows (the existing best-of-N spirit,
    # widened across time). Both windows' load/probe arrays are recorded
    # so the artifact shows exactly what happened.
    probe_pre = env.get("cpu_probe_md5_64mib_sec")
    ambient16 = probe_pre / 4 if probe_pre else None
    med_probe = sorted(q_probe)[len(q_probe) // 2] if q_probe else None
    # Round-13 session-4 addition: the mt8/st ratio per query catches
    # multi-core co-tenant steal that leaves one core free (st probes
    # all quiet, headline 6.5x slow — the exact shape the r12-item-5
    # trigger missed when it finally fired in anger). Ratio of medians,
    # so absolute machine speed cancels; quiet reads ~1.0-1.2.
    med_probe_mt = (
        sorted(q_probe_mt)[len(q_probe_mt) // 2] if q_probe_mt else None
    )
    mt_ratio = (
        round(med_probe_mt / med_probe, 3)
        if med_probe and med_probe_mt
        else None
    )
    headline_windows = 1
    window2: dict = {}
    retry_factor = float(os.environ.get("BENCH_RETRY_FACTOR", "1.15"))
    # 1.25 splits the observed distributions: quiet-window mt8/st medians
    # on record read 0.93-1.15, while the r12 contended artifact (headline
    # 1.55x inflated) ran at ~1.24 and session-4's burst at ~1.5. A false
    # positive merely buys one extra window (per-query best keeps the
    # faster reading), so the threshold errs toward firing.
    retry_mt_ratio = float(os.environ.get("BENCH_RETRY_MT_RATIO", "1.25"))
    st_contended = ambient16 and med_probe and med_probe > retry_factor * ambient16
    mt_contended = mt_ratio is not None and mt_ratio > retry_mt_ratio
    if st_contended or mt_contended:
        times2, q_load2, q_probe2, q_probe_mt2 = headline_window()
        for k in times:
            times[k] = min(times[k], times2[k])
        headline_windows = 2
        # Re-measure machine speed after the retry; normalization uses
        # the FASTER of the two readings — the per-query bests are
        # dominated by whichever window ran on the faster state.
        probe_post = probe_md5(64)
        env["cpu_probe_md5_64mib_sec_post_retry"] = probe_post
        if probe_post < probe_pre:
            env["cpu_probe_md5_64mib_sec"] = probe_post
        window2 = {
            "q_load_w2": q_load2,
            "q_probe16_w2": q_probe2,
            "q_probe_mt8_w2": q_probe_mt2,
            "headline_times_w1": times1,
            "headline_times_w2": times2,
            "retry_trigger": "st_median" if st_contended else "mt8_ratio",
        }

    # Frozen headline total: sum over the 18 HEADLINE entries ONLY (the
    # scaling probe added to `times` below never enters it).
    total = round(sum(times[n] for n in HEADLINE), 3)
    # Probe-normalized total (round-8 verdict item 9): scale the headline
    # by machine speed so cross-round artifacts compare directly instead
    # of via per-round prose adjudication in BASELINE.md. Reference probe
    # 0.109 s = the round-7 judge rerun's md5-64MiB reading, the fastest
    # well-documented machine state in the record; value_normalized =
    # value * (0.109 / probe). Normalization assumes CPU-bound plans
    # (true of this suite at sf0.1 — BASELINE.md rounds 3/6/8 all show
    # uniform per-query scaling with the probe).
    probe = env.get("cpu_probe_md5_64mib_sec")
    normalized = round(total * (0.109 / probe), 3) if probe else None

    headline_noop: dict[str, float] = {}
    for name in HEADLINE_NOOP:
        fn = qs[name]
        best = float("inf")
        for _ in range(runs):
            t0 = time.time()
            run_query(fn, spark, sf_dir, noop=True)
            best = min(best, time.time() - t0)
        headline_noop[name] = round(best, 3)

    # Parallelism-bound calibration entry (see SCALING_PROBE above):
    # best-of-2, rides `queries` but never the frozen headline total.
    times[SCALING_PROBE] = min(scaling_probe(spark), scaling_probe(spark))

    # Extended is best-of-3 as of round 13 session 5 (declared in
    # OPTIMIZATION_r13.md, mirroring the round-12 headline hardening):
    # per-run decay curves show C2 JIT warm-up still cutting entry
    # times 15-40% between run 2 and run 3 (text_lm_score isolated:
    # 11.6 -> 3.7 -> 3.1 -> 2.65 s), so best-of-2 timed the JVM's
    # compiler, not the query, on expression-heavy entries. The OLD
    # protocol's reading is still recorded per entry — extended_best2 =
    # min of the FIRST TWO runs, byte-for-byte the r12 methodology —
    # so cross-round comparisons stay apples-to-apples.
    runs_extended = int(os.environ.get("BENCH_RUNS_EXTENDED", str(max(runs, 3))))
    extended: dict[str, float] = {}
    extended_b2: dict[str, float] = {}
    # Extended-phase self-heal (round-13 session 5): the headline's
    # probe-and-retry discipline, applied per extended entry. Motivating
    # incident: a closing-bench run read dedup_jaccard_selfjoin 20.4 s in
    # ALL THREE runs (isolated re-measure minutes later: 7.15 s on
    # identical code) — a sustained co-tenant burst defeats per-entry
    # best-of-N because the runs are back-to-back, and the r11/r12
    # driver artifacts were contaminated in exactly this phase. The
    # 16 MiB st + mt8 probes (outside every timed region) mark entries
    # whose window was contended; after the full pass those entries get
    # ONE more run each (bounded, most-expensive-first) on what is by
    # then usually a recovered machine, and the per-entry best wins.
    # Same calibrated thresholds as the headline triggers; the b2 twin
    # stays first-two-of-the-main-pass (the r12 protocol had no reruns).
    # Boundary probes: one st/mt8 pair BETWEEN entries, shared — probe i
    # is entry i's PRE probe and entry i-1's POST probe (round-14, ADVICE
    # r13: a burst starting after an entry's pre-probe but during its
    # runs used to land its flag on the NEXT entry; flagging on either
    # boundary attributes a mid-entry burst to the entry it inflated, at
    # zero extra probe cost). One trailing probe closes the last entry.
    ext_probe: dict[str, float] = {}
    ext_mt_ratio: dict[str, float | None] = {}
    ext_probe_post: dict[str, float] = {}
    ext_mt_ratio_post: dict[str, float | None] = {}
    ext_flagged: list[str] = []

    def boundary_probe() -> tuple[float, float | None, bool]:
        st = probe_md5(16)
        mt = probe_md5_mt8(16)
        ratio = round(mt / st, 2) if st else None
        bad = bool(ambient16 and st > retry_factor * ambient16) or bool(
            st and (mt / st) > retry_mt_ratio
        )
        return st, ratio, bad

    st, ratio, bad = boundary_probe()
    for name in EXTENDED:
        fn = qs[name]
        ext_probe[name] = st
        ext_mt_ratio[name] = ratio
        pre_bad = bad
        rts: list[float] = []
        for _ in range(runs_extended):
            t0 = time.time()
            run_query(fn, spark, sf_dir, noop=name in NOOP_SINK)
            rts.append(time.time() - t0)
        extended[name] = round(min(rts), 3)
        if runs_extended >= 2:
            extended_b2[name] = round(min(rts[:2]), 3)
        st, ratio, bad = boundary_probe()
        ext_probe_post[name] = st
        ext_mt_ratio_post[name] = ratio
        if pre_bad or bad:
            ext_flagged.append(name)
    ext_reruns: dict[str, float] = {}
    # Each re-run window is itself probed (ADVICE r13): a re-run taken
    # under persisting contention is recorded WITH the machine state of
    # its window, so the artifact can adjudicate whether it was clean.
    ext_rerun_probe: dict[str, list] = {}
    rerun_max = int(os.environ.get("BENCH_EXT_RERUN_MAX", "24"))
    for name in sorted(ext_flagged, key=lambda n: extended[n], reverse=True)[
        :rerun_max
    ]:
        fn = qs[name]
        st, ratio, _bad = boundary_probe()
        ext_rerun_probe[name] = [st, ratio]
        t0 = time.time()
        run_query(fn, spark, sf_dir, noop=name in NOOP_SINK)
        ext_reruns[name] = round(time.time() - t0, 3)
        extended[name] = min(extended[name], ext_reruns[name])

    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "value_normalized": normalized,
                "unit": "sec",
                "queries": times,
                "headline_loadavg_per_query": q_load,
                "headline_probe16_per_query": q_probe,
                "headline_probe_mt8_per_query": q_probe_mt,
                "headline_mt8_st_ratio": mt_ratio,
                "headline_runs": runs_headline,
                "headline_windows": headline_windows,
                **window2,
                "headline_noop": headline_noop,
                "extended": extended,
                # null when runs_extended < 2: a single run cannot carry
                # the r12 best-of-2 twin's semantics (ADVICE r13).
                "extended_best2": extended_b2 if runs_extended >= 2 else None,
                "extended_runs": runs_extended,
                "extended_probe16": ext_probe,
                "extended_mt8_ratio": ext_mt_ratio,
                "extended_probe16_post": ext_probe_post,
                "extended_mt8_ratio_post": ext_mt_ratio_post,
                "extended_flagged": ext_flagged,
                "extended_reruns": ext_reruns,
                "extended_rerun_probe16": ext_rerun_probe,
                "sf": sf,
                "environment": {
                    **env,
                    "loadavg_1m_post_run": (
                        round(os.getloadavg()[0], 2)
                        if hasattr(os, "getloadavg")
                        else None
                    ),
                },
            }
        )
    )
    # The driver records only a fixed-size TAIL of stdout (~2000 chars);
    # the full line above has outgrown it (BENCH_r07 "parsed": null;
    # BENCH_r10 lost the extended dict's head, including the two entries
    # round 10 optimized). Emit TWO compact lines last, budgeted so both
    # always fit the capture window together: first the extended summary
    # (WATCH entries pinned + slowest-first fill), then the headline twin
    # LAST so the tail always ends with a complete parseable JSON line.
    compact = json.dumps(
        {
            "metric": "headline_queries_total_sec",
            "value": total,
            "value_normalized": normalized,
            "unit": "sec",
            "queries": times,
            "sf": sf,
            "cpu_probe_md5_64mib_sec": env.get("cpu_probe_md5_64mib_sec"),
            "cpu_probe_mt8_md5_64mib_sec": env.get("cpu_probe_mt8_md5_64mib_sec"),
            "cpu_steal_pct_since_boot": env.get("cpu_steal_pct_since_boot"),
            # Core-count contract, self-proving (VERDICT r13 item 1): the
            # session's master and parallelism, plus the fixed-work
            # 64-task probe inside `queries` whose low-core ratio ~= the
            # core-budget ratio.
            "spark_master": env.get("spark_master"),
            "spark_default_parallelism": env.get("spark_default_parallelism"),
            "loadavg_1m_at_start": env.get("loadavg_1m_at_start"),
            # Per-headline-query machine state, positionally aligned with
            # the queries dict (insertion order): a mid-run burst is
            # attributable to the exact queries it inflated.
            "q_load": q_load,
            "q_probe16": q_probe,
            # Per-query mt8/st probe ratio (8-thread twin of q_probe16,
            # 16 MiB/thread; raw array in the full line above): >> 1
            # means multi-core steal with a free core — the contention
            # shape the single-thread probe cannot see (session-4 case:
            # headline 6.5x slow, every q_probe16 quiet, ratio 1.5+).
            "q_mt8_ratio": [
                round(m / s, 2) if (m and s) else None
                for m, s in zip(q_probe_mt, q_probe)
            ],
            "mt8_st_ratio": mt_ratio,
            # 2 = the mid-run probes flagged contention and the headline
            # re-ran once, per-query best kept across both windows (the
            # second window's arrays are in the full line above).
            "headline_windows": headline_windows,
            "note": "compact twin of the full line above (driver tail-capture safety)",
        }
    )
    # Budget: tail window minus the headline twin and a safety margin.
    ext_budget = 2000 - len(compact) - 100
    pinned = [n for n in WATCH if n in extended]
    by_slowest = sorted(
        (n for n in extended if n not in pinned),
        key=lambda n: extended[n],
        reverse=True,
    )
    shown: dict[str, float] = {}
    base = {
        "metric": "extended_sec",
        "n_extended": len(extended),
        "total_extended_sec": round(sum(extended.values()), 3),
        # r12-protocol twin (best of the first two runs) for
        # cross-round comparison; see the full line's extended_best2.
        # null when runs_extended < 2 (a single run has no best-of-2).
        "total_extended_best2_sec": (
            round(sum(extended_b2.values()), 3) if runs_extended >= 2 else None
        ),
        "extended_runs": runs_extended,
        # Contended-entry self-heal (session 5): how many entries'
        # probe flagged their window, and how many got the bounded
        # one-shot re-run (details in the full line's extended_* keys).
        "ext_flagged": len(ext_flagged),
        "ext_reruns": len(ext_reruns),
        "note": "watch+slowest subset; full set in the big line above",
    }
    for n in pinned + by_slowest:
        trial = {**base, "queries": {**shown, n: extended[n]}}
        if len(json.dumps(trial)) > ext_budget:
            break
        shown[n] = extended[n]
    print(json.dumps({**base, "queries": shown}))
    print(compact)


if __name__ == "__main__":
    main()
