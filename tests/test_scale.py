"""Physical-plan assertions backing SCALE.md's claims: these tests fail if
a code change silently reintroduces a shuffle, loses filter pushdown, or
stops broadcasting dimension joins."""

import sys
from pathlib import Path

import pyspark.sql.functions as F
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_eliminates_shuffle(spark):
    """Two tables bucketed on the join key co-locate: the sort-merge join
    runs without any Exchange. The same join on plain tables shuffles both
    sides — bucketing at write time is how repeated 100 TB fact joins drop
    their shuffle."""
    from sakura_spark import sources

    left = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("lv")
    )
    right = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("rv")
    )
    spark.sql("DROP TABLE IF EXISTS bj_left")
    spark.sql("DROP TABLE IF EXISTS bj_right")
    sources.write_bucketed_table(left, "bj_left", ["k"], num_buckets=8)
    sources.write_bucketed_table(right, "bj_right", ["k"], num_buckets=8)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        bucketed = spark.table("bj_left").join(spark.table("bj_right"), on="k")
        plain = left.join(right.hint("merge"), on="k")
        assert "Exchange" not in _physical(bucketed)
        assert "Exchange" in _physical(plain)
        assert bucketed.count() == 1000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bj_left")
        spark.sql("DROP TABLE IF EXISTS bj_right")


def test_bucketed_flagship_join_has_no_fact_shuffle(spark):
    """SCALE.md's steady-state claim, proven on the FULL flagship shape:
    with orders and lineitem bucketed by orderkey at write time, the
    fact-fact sort-merge join runs with ZERO Exchange — the per-order
    aggregation too (join output keeps the bucket partitioning, and
    orderkey is in the grouping set). The complete flagship query then
    costs exactly ONE hash exchange: the custkey re-aggregation. The same
    plan on plain parquet shuffles both fact sides."""
    from sakura_spark import sources
    from sakura_spark.session import load_table

    sf = "/root/testdata/sf0.001"
    orders = load_table(spark, f"{sf}/orders.parquet")
    li = load_table(spark, f"{sf}/lineitem.parquet")
    # Drop catalog entries AND physical locations: with the in-memory
    # catalog, a table created by a previous (crashed) session is unknown
    # to DROP TABLE but its warehouse directory survives and fails
    # saveAsTable with "location already exists".
    import os
    import shutil
    from urllib.parse import urlparse

    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    for t in ("bf_orders", "bf_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(os.path.join(warehouse, t), ignore_errors=True)
    sources.write_bucketed_table(orders, "bf_orders", ["o_orderkey"], num_buckets=8)
    sources.write_bucketed_table(li, "bf_lineitem", ["l_orderkey"], num_buckets=8)
    bo, bl = spark.table("bf_orders"), spark.table("bf_lineitem")
    # Exact decimal arithmetic: double sums depend on partition/row order,
    # so the bucketed and plain layouts would differ in low bits and break
    # the row-for-row equality check below.
    revenue = F.sum(
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1.0) - F.col("l_discount")).cast("decimal(18,8)")
    ).alias("revenue")

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        # Fact-fact join + per-order aggregation: shuffle-free end to end.
        per_order = (
            bl.join(bo, bl.l_orderkey == bo.o_orderkey)
            .groupBy("o_orderkey", "o_custkey")
            .agg(revenue)
        )
        assert "Exchange" not in _physical(per_order)
        # Identical plan on plain parquet shuffles both sides.
        plain = (
            li.join(orders.hint("merge"), li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderkey", "o_custkey")
            .agg(revenue)
        )
        assert _physical(plain).count("Exchange hashpartitioning") == 2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    # Full flagship on the bucketed layout (customer broadcasts as usual):
    # the ONLY hash exchange left is the custkey re-aggregation.
    customer = load_table(spark, f"{sf}/customer.parquet")
    flagship = (
        bl.join(bo, bl.l_orderkey == bo.o_orderkey)
        .join(F.broadcast(customer), bo.o_custkey == customer.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(revenue)
        .orderBy(F.desc("revenue"), F.col("c_custkey"))
        .limit(10)
    )
    plan = _physical(flagship)
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Exchange rangepartitioning" not in plan  # top-k, not global sort
    # Same rows as the plain layout.
    plain_flagship = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(revenue)
        .orderBy(F.desc("revenue"), F.col("c_custkey"))
        .limit(10)
    )
    assert [r.asDict() for r in flagship.collect()] == [
        r.asDict() for r in plain_flagship.collect()
    ]
    for t in ("bf_orders", "bf_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_filter_and_projection_reach_parquet_scan(spark):
    """rel_select's predicate and column pruning must appear in the scan
    node (PushedFilters + ReadSchema) — I/O proportional to referenced
    rows/columns only."""
    import __spark_entry__ as e

    df = e.queries()["rel_select"](spark, "/root/testdata/sf0.001")
    plan = _physical(df)
    assert "PushedFilters: [" in plan
    assert "IsNotNull" in plan or "GreaterThan" in plan
    # only the three selected columns (plus filter columns) are read
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read_schema and "l_extendedprice" not in read_schema[0]


def test_flagship_broadcasts_dimensions(spark):
    """customer (dimension) must broadcast in the flagship 3-way join —
    the fact side never shuffles for it."""
    import __spark_entry__ as e

    df = e.queries()["flagship_revenue"](spark, "/root/testdata/sf0.001")
    assert "BroadcastHashJoin" in _physical(df)


def test_asof_join_is_single_key_shuffle(spark):
    """The union-and-window as-of join must cost exactly one hash exchange
    of the combined stream (plus in-partition sort) — never a range/theta
    join fallback. Probed on the bare operator; entry queries may add
    their own upstream shuffles."""
    from sakura_spark.operators import asof_join
    from sakura_spark.session import load_table

    ev = load_table(spark, "/root/testdata/sf0.001/events.parquet").select(
        "user_id", "event_id", "ts"
    )
    orders = load_table(spark, "/root/testdata/sf0.001/orders.parquet").select(
        F.col("o_custkey").alias("user_id"), "o_orderkey", "o_orderdate"
    )
    df = asof_join(
        ev, orders, on="user_id", left_time="ts", right_time="o_orderdate"
    )
    plan = _physical(df)
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_range_join_is_equi_join(spark):
    """Equi-bucketing must turn the interval predicate into a hash join:
    no nested-loop/cartesian node anywhere in the plan."""
    import __spark_entry__ as e

    df = e.queries()["range_join"](spark, "/root/testdata/sf0.001")
    plan = _physical(df)
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    assert "Join" in plan


def test_extract_metadata_has_no_python_in_plan(spark):
    """Metadata over binary payloads (length/md5) must be pure Column
    expressions — no MapInPandas/Python-UDF node; mapInPandas is reserved
    for genuine codec stages."""
    from sakura_spark.functions import multimodal
    from sakura_spark.session import load_table

    docs = load_table(spark, "/root/testdata/sf0.001/documents.parquet")
    meta = multimodal.extract_metadata(multimodal.with_binary_payload(docs))
    plan = _physical(meta)
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan
    assert "Exchange" not in plan  # map-only: scan -> project


def test_registry_contract():
    """Driver-registry invariants: every oracle key has a query, and the
    round-13 rotation holds — the four NEW round-13 entries, the six
    r12-outs re-entering per the two-round policy, the six
    newly-oracled former rows-only entries, and every
    changed-implementation entry all sit inside the first-50 window;
    the sixteen r11+r12-green sibling-covered entries rotated past the
    cap; and the window is 100% oracle-backed."""
    import __spark_entry__ as e

    qs, oracles = list(e.queries()), e.oracle_sql()
    assert len(qs) >= 50
    assert set(oracles) <= set(qs), "oracle without a registered query"
    round13_in = {
        # NEW round-13 oracle-backed entries (enter immediately)
        "dcl_merge_prefer_left", "dcl_merge_conflict",
        "rel_cdc_to_scd2_fused", "dedup_minhash_superset",
        # r12-outs re-entering within two rounds per the written policy
        "sort_zorder_layout", "rel_scd2_pit", "rel_snapshot_diff",
        "agg_mode", "window_rank_funcs", "graph_bfs_levels",
        # formerly rows-only — oracles created this round, first
        # driver hash exposure
        "multimodal_decode", "sim_semantic_dedup", "dedup_near",
        "dedup_simhash", "sim_ann_ivf", "sim_ann_recall",
        # changed implementations stay for driver re-verification
        "sort_hilbert_3d", "rel_cdc_to_scd2",
        "streaming_full_outer_join_equiv", "streaming_timeout_equiv",
        # session-2/3 NEW oracle-backed entries (enter immediately)
        "graph_kcore", "dcl_merge_revert", "dcl_time_travel",
        "streaming_quantile_equiv",
    }
    round13_out = {
        # each r11+r12 driver-green with in-window family rows; the
        # streaming harness did NOT change this round, so unchanged
        # equivalence entries rotate like any other green entry
        "streaming_hll_equiv", "streaming_cms_equiv",
        "streaming_bloom_equiv", "streaming_kmv_equiv",
        "streaming_dedup_equiv", "streaming_join_equiv",
        "streaming_session_equiv", "streaming_sliding_equiv",
        "streaming_update_equiv", "streaming_outer_join_equiv",
        "dedup_minhash_portable", "sim_ivfpq_topk_fixed",
        "multimodal_gif_exact", "rel_merge_delete", "rel_ivm_delta",
        "events_gapfill_locf",
        # session-2 outs: the SCD2 family keeps five window rows;
        # near-dup keeps sim_semantic_dedup + the ann rows; zorder
        # keeps layout + the Hilbert trio
        "rel_scd2", "sim_embedding_near_dup", "sort_zorder_pruning",
        # session-3 out: freshness_decay keeps curation's window row
        "curation_leakage_split",
    }
    window = set(qs[:50])
    assert round13_in <= window, sorted(round13_in - window)
    assert not (round13_out & window), sorted(round13_out & window)
    # window is 100% oracle-backed (the rows-only tail — four entries,
    # each with a documented rationale and a hash-gated family sibling
    # — lives past the cap).
    assert {q for q in qs[:50] if q not in oracles} == set()
    rows_only = {q for q in qs if q not in oracles}
    assert rows_only == {
        "dedup_minhash_pairs", "sim_pq_topk", "sim_ann_ivfpq",
        "text_bpe_segment",
    }, sorted(rows_only)

    # COVERAGE.md's prose counters must match the actual registry — asserted
    # here so a registry change without a doc sync fails the suite.
    import pathlib
    import re

    coverage = pathlib.Path(__file__).resolve().parents[1] / "COVERAGE.md"
    text = coverage.read_text()
    m = re.search(r"(\d+) registered queries", text)
    assert m and int(m.group(1)) == len(qs), (
        f"COVERAGE.md says {m and m.group(1)} registered queries, registry has {len(qs)}"
    )
    m = re.search(r"(\d+) with `oracle_sql\(\)` twins", text)
    assert m and int(m.group(1)) == len(oracles), (
        f"COVERAGE.md says {m and m.group(1)} oracle twins, registry has {len(oracles)}"
    )
    m = re.search(r"(\d+) rows-only", text)
    assert m and int(m.group(1)) == len(qs) - len(oracles)

    # README.md carries the same counters in its driver-contract section;
    # it drifted in round 7 (said 128/117 at a 129/118 registry) because
    # only COVERAGE.md was asserted. Enforce both documents.
    readme = pathlib.Path(__file__).resolve().parents[1] / "README.md"
    rtext = readme.read_text()
    m = re.search(r"\((\d+) registered queries, (\d+) DuckDB oracle\b", rtext)
    assert m, "README.md driver-contract counter line missing/reworded"
    assert int(m.group(1)) == len(qs), (
        f"README.md says {m.group(1)} registered queries, registry has {len(qs)}"
    )
    assert int(m.group(2)) == len(oracles), (
        f"README.md says {m.group(2)} oracle twins, registry has {len(oracles)}"
    )


def test_all_registered_query_plans_are_scale_clean(spark):
    """Plan lint over the ENTIRE driver registry: no cartesian/nested-loop
    join and no row-at-a-time Python anywhere (rel_cartesian exempt — the
    operator IS the cross product, reference lib/drl/executor.ml:59-63).
    Catches a silently regressed join condition or a UDF sneaking into a
    hot path, at planning cost only."""
    import __spark_entry__ as e

    from concurrent.futures import ThreadPoolExecutor

    # rel_cartesian IS the cross product; tpch_q22's and tpch_q11's nested
    # loops are scalar-subquery broadcasts — a ONE-row build side (global
    # avg / global total), so the "loop" is a constant-time probe per row
    # at any scale.
    # sketch_kmv_overlap's pair enumeration is a nested loop over the
    # DISTINCT GROUP LIST (event types) — |groups|^2 rows at sketch scale,
    # independent of corpus size; everything downstream is k-row register
    # tables (the same bounded-build-side class as the scalar subqueries).
    # dedup_corpus_overlap is the same class: the group_a < group_b pair
    # join runs over |sources| SIGNATURE rows (one per source, after the
    # corpus-sized work has already been reduced by the combinable
    # min-agg), broadcast build side, corpus-size-independent.
    # sort_zorder_layout and curation_freshness_decay broadcast a ONE-ROW
    # scalar aggregate (the min/max quantization bounds; the corpus max
    # timestamp) as the build side of a cross join — the same
    # constant-time-probe class as the tpch scalar subqueries above.
    # stats_join_cardinality broadcasts the ONE-ROW exact join-size total
    # against the <= top_k heaviest-key rows — the same class.
    allowed_nested_loop = {
        "rel_cartesian",
        "tpch_q22_idle_customers",
        "tpch_q11_important_parts",
        "sketch_kmv_overlap",
        "dedup_corpus_overlap",
        "sort_zorder_layout",
        "sort_zorder_pruning",
        "curation_freshness_decay",
        "stats_join_cardinality",
        # the Hilbert layout/pruning entries broadcast the same one-row
        # scalar aggregates (quantization bounds; the exact row total
        # for equal-count zoning); the 3-D entry adds one more of each
        # (6-column bounds row, per-curve totals), still one-row builds.
        "sort_hilbert_layout",
        "sort_hilbert_pruning",
        "sort_hilbert_3d",
    }
    flagged = {}

    def lint(item):
        name, fn = item
        # Planning is driver-side; py4j handles concurrent callers, so the
        # 70 analyze+optimize passes overlap instead of running serially.
        plan = _physical(fn(spark, "/root/testdata/sf0.001"))
        flags = [
            f
            for f, marker in (
                ("cartesian", "CartesianProduct"),
                ("nested-loop", "BroadcastNestedLoopJoin"),
                ("row-python", "BatchEvalPython"),
            )
            if marker in plan
        ]
        if name in allowed_nested_loop:
            flags = [f for f in flags if f not in ("cartesian", "nested-loop")]
        return name, flags

    with ThreadPoolExecutor(max_workers=8) as pool:
        for name, flags in pool.map(lint, e.queries().items()):
            if flags:
                flagged[name] = flags
    assert not flagged, f"scale-hazard plans: {flagged}"


def test_minhash_signature_pipeline_is_map_only(spark):
    """The minhash signature job must stay shuffle-free (no Exchange): the
    signature is array expressions over one projection, not an
    explode+groupBy."""
    from sakura_spark.functions import dedup
    from sakura_spark.session import load_table

    docs = load_table(spark, "/root/testdata/sf0.001/documents.parquet")
    sig = dedup.minhash_signatures(docs, "doc_id")
    assert "Exchange" not in _physical(sig)
    sim = dedup.simhash_signatures(docs, "doc_id")
    assert "Exchange" not in _physical(sim)


def test_partitioned_write_prunes_partitions(spark, tmp_path):
    """write_parquet(partition_by=...) must produce a layout where a
    partition-column filter reaches the scan as a PartitionFilter —
    directory-level pruning, zero data files read for excluded partitions.
    The other scale lever (alongside bucketing) for steady-state layouts."""
    from sakura_spark import sources
    from sakura_spark.session import load_table

    docs = load_table(spark, "/root/testdata/sf0.001/documents.parquet")
    out = str(tmp_path / "docs_by_source")
    sources.write_parquet(docs, out, partition_by=["source"])
    back = spark.read.parquet(out)
    q = back.filter(F.col("source") == "src2").select("doc_id")
    plan = _physical(q)
    seg = plan.split("PartitionFilters", 1)
    assert len(seg) == 2, "no PartitionFilters in scan"
    assert "src2" in seg[1][:300]  # the predicate prunes directories
    assert q.count() == docs.filter("source = 'src2'").count()


def test_lm_score_broadcasts_the_lm(spark):
    """text.lm_score's scoring joins must BROADCAST the pruned LM tables:
    a shuffle join keyed on grams would hot-spot on 'of the' at corpus
    scale, and the corpus side would pay a full shuffle for what is
    logically a dictionary lookup. The plan must contain only broadcast
    joins — no SortMergeJoin, no ShuffledHashJoin."""
    from sakura_spark.functions import text as textmod
    from sakura_spark.session import load_table

    docs = load_table(spark, "/root/testdata/sf0.001/documents.parquet")
    plan = _physical(textmod.lm_score(docs, top_v=1000))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_bench_lists_are_registered():
    """Every name in bench.py's HEADLINE / EXTENDED / NOOP_SINK /
    HEADLINE_NOOP lists must be a registered query — a typo there
    crashes the per-round bench run and loses the round's machine-
    readable perf record (the BENCH_r07-unparseable failure class)."""
    import __spark_entry__ as e
    import bench

    qs = set(e.queries())
    for listname in ("HEADLINE", "EXTENDED", "HEADLINE_NOOP"):
        missing = [n for n in getattr(bench, listname) if n not in qs]
        assert not missing, f"bench.{listname} names not registered: {missing}"
    missing = [n for n in bench.NOOP_SINK if n not in qs]
    assert not missing, f"bench.NOOP_SINK names not registered: {missing}"
    # noop-sink entries must also be benched somewhere, else they're dead
    benched = set(bench.HEADLINE) | set(bench.EXTENDED) | set(bench.HEADLINE_NOOP)
    dead = [n for n in bench.NOOP_SINK if n not in benched]
    assert not dead, f"bench.NOOP_SINK names never benched: {dead}"
