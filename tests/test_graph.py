"""Fixed-point PageRank: hand-computed exactness, the integer contract's
cross-engine differential (Spark vs DuckDB running pagerank_oracle_sql on
the same edges), float-reference accuracy, and plan shape."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from sakura_spark.functions import graph

SCALE = 10**9
BASE = SCALE * 15 // 100


def _edges(spark, rows, weighted=False):
    schema = "src long, dst long" + (", w long" if weighted else "")
    return spark.createDataFrame(rows, schema)


def test_cycle_is_fixed_point(spark):
    """A 3-cycle is PageRank's uniform fixed point: with scale 1e9 the
    damped quotient is exact (85e9 // 100 == 0.85e9), so every iteration
    reproduces rank == scale exactly."""
    e = _edges(spark, [(1, 2), (2, 3), (3, 1)])
    for iters in (1, 4):
        out = {r.node: r.rank_scaled for r in graph.pagerank(e, iters).collect()}
        assert out == {1: SCALE, 2: SCALE, 3: SCALE}


def test_star_hand_computed(spark):
    """Star A,C,D -> B, B -> A: two iterations by hand."""
    e = _edges(spark, [(1, 2), (3, 2), (4, 2), (2, 1)])
    q0 = SCALE * 85 // 100  # every node starts at scale, W=1 everywhere
    r1 = {1: BASE + q0, 2: BASE + 3 * q0, 3: BASE, 4: BASE}
    out1 = {r.node: r.rank_scaled for r in graph.pagerank(e, 1).collect()}
    assert out1 == r1
    r2 = {
        1: BASE + r1[2] * 85 // 100,
        2: BASE + sum(r1[n] * 85 // 100 for n in (1, 3, 4)),
        3: BASE,
        4: BASE,
    }
    out2 = {r.node: r.rank_scaled for r in graph.pagerank(e, 2).collect()}
    assert out2 == r2


def test_weighted_and_dangling(spark):
    """Weights split the damped quotient q*w (src 1 has W=4 split 3:1);
    node 4 is dangling (its mass drops — sink-drop variant documented)."""
    e = _edges(spark, [(1, 2, 3), (1, 3, 1), (2, 4, 1)], weighted=True)
    out = {r.node: r.rank_scaled
           for r in graph.pagerank(e, 1, weight="w").collect()}
    q1 = SCALE * 85 // (100 * 4)
    assert out[2] == BASE + q1 * 3
    assert out[3] == BASE + q1 * 1
    assert out[4] == BASE + SCALE * 85 // 100
    assert out[1] == BASE  # nothing points at 1; dangling 4 contributes 0


def test_differential_vs_duckdb_oracle(spark):
    """The two spellings of the integer contract agree bit-for-bit on a
    pseudo-random weighted multigraph."""
    rng = [(i * 7919 % 23, i * 104729 % 23, 1 + i % 5) for i in range(200)]
    rows = [(a, b, w) for a, b, w in rng if a != b]
    e = _edges(spark, rows, weighted=True)
    got = {r.node: r.rank_scaled
           for r in graph.pagerank(e, 4, weight="w").collect()}
    con = duckdb.connect()
    con.register("edges_t", pd.DataFrame(rows, columns=["src", "dst", "w"]))
    sql = graph.pagerank_oracle_sql("SELECT src, dst, w FROM edges_t", 4)
    want = dict(con.execute(sql).fetchall())
    assert got == want


def test_close_to_float_pagerank(spark):
    """Quantization error vs an exact float reference stays ~1e-4 relative
    at scale 1e9 on a small graph."""
    rows = [(i, (i * 3 + 1) % 17) for i in range(17)] + [
        (i, (i * 5 + 2) % 17) for i in range(17)
    ]
    rows = [r for r in rows if r[0] != r[1]]
    out = {r.node: r.rank_scaled for r in graph.pagerank(_edges(spark, rows), 5).collect()}
    # float reference, same sink-drop synchronous sweep
    nodes = sorted({n for r in rows for n in r})
    W = {}
    for s, _ in rows:
        W[s] = W.get(s, 0) + 1
    r = {n: 1.0 for n in nodes}
    for _ in range(5):
        nxt = {n: 0.15 for n in nodes}
        for s, d in rows:
            nxt[d] += 0.85 * r[s] / W[s]
        r = nxt
    for n in nodes:
        assert out[n] / SCALE == pytest.approx(r[n], rel=2e-4)


def _brute_triangles(rows):
    """Per-node triangle counts by itertools over the canonical simple
    graph — the definitional reference."""
    from itertools import combinations

    e = {(min(a, b), max(a, b)) for a, b in rows if a != b}
    nodes = sorted({n for p in e for n in p})
    out = {}
    for a, b, c in combinations(nodes, 3):
        if (a, b) in e and (a, c) in e and (b, c) in e:
            for n in (a, b, c):
                out[n] = out.get(n, 0) + 1
    return out


def test_triangles_k4_and_normalization(spark):
    """K4: every node sits in C(3,2)=3 triangles. Reversed duplicates,
    parallel edges and self-loops must not change the answer."""
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    noisy = k4 + [(b, a) for a, b in k4] + [(0, 1), (2, 2)]
    out = {r.node: r.n_triangles
           for r in graph.triangles(_edges(spark, noisy)).collect()}
    assert out == {0: 3, 1: 3, 2: 3, 3: 3}


def test_triangles_triangle_free_graph_is_empty(spark):
    """Bipartite graphs have no triangles; nodes in none are absent."""
    e = _edges(spark, [(i, 100 + (i * 3) % 7) for i in range(20)])
    assert graph.triangles(e).count() == 0


def test_triangles_vs_brute_force(spark):
    """Pseudo-random graph with skewed degrees (node 0 is a hub, so the
    degree orientation actually reorders edges) vs the itertools
    reference."""
    rows = [(i * 7919 % 29, i * 104729 % 29) for i in range(150)]
    rows += [(0, i) for i in range(1, 25)]  # hub
    rows = [r for r in rows if r[0] != r[1]]
    got = {r.node: r.n_triangles
           for r in graph.triangles(_edges(spark, rows)).collect()}
    assert got == _brute_triangles(rows)


def test_triangles_vs_oracle_sql(spark):
    """The Spark degree-oriented plan and the naive SQL three-way join
    agree row-for-row (triangle sets are orientation-independent)."""
    rows = [((i * 13) % 19, (i * i + 3) % 19) for i in range(120)]
    rows = [r for r in rows if r[0] != r[1]]
    got = {r.node: r.n_triangles
           for r in graph.triangles(_edges(spark, rows)).collect()}
    con = duckdb.connect()
    con.register("edges_t", pd.DataFrame(rows, columns=["src", "dst"]))
    sql = graph.triangles_oracle_sql("SELECT src, dst FROM edges_t")
    want = dict(con.execute(sql).fetchall())
    assert got == want


def test_triangles_plan(spark):
    rows = [(i % 11, (i * 3 + 1) % 11) for i in range(40) if i % 11 != (i * 3 + 1) % 11]
    plan = (
        graph.triangles(_edges(spark, rows))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan


def test_min_label_sweeps_converged_equals_components(spark):
    """With sweeps >= diameter, labels are exactly the connected
    components' min ids: two chains + an isolatedish pair, with noisy
    direction/duplicate/self-loop edges."""
    rows = [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (20, 21),
            (2, 1), (3, 3), (1, 2)]
    out = {r.node: r.label
           for r in graph.min_label_sweeps(_edges(spark, rows), 4).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10,
                   20: 20, 21: 20}


def test_min_label_sweeps_agrees_with_duplicate_clusters(spark):
    """On a pseudo-random graph, the converged fixed-sweep labels equal
    dedup.duplicate_clusters' output (both = component min id)."""
    from sakura_spark.functions import dedup

    rows = [(i * 7 % 37 + 1, i * 11 % 37 + 1) for i in range(30)]
    rows = [r for r in rows if r[0] != r[1]]
    got = {r.node: r.label
           for r in graph.min_label_sweeps(_edges(spark, rows), 12).collect()}
    pairs = spark.createDataFrame(rows, "id_a long, id_b long")
    want = {r.id: r.cluster for r in dedup.duplicate_clusters(pairs).collect()}
    assert got == want


def test_min_label_sweeps_vs_oracle_sql_preconvergence(spark):
    """At FEWER sweeps than the diameter the labels are not yet the
    components — but they must still match the unrolled SQL exactly
    (the fixed-sweep result is a deterministic function of the graph)."""
    chain = [(i, i + 1) for i in range(1, 15)]  # diameter 14
    got = {r.node: r.label
           for r in graph.min_label_sweeps(_edges(spark, chain), 2).collect()}
    con = duckdb.connect()
    con.register("edges_t", pd.DataFrame(chain, columns=["src", "dst"]))
    sql = graph.min_label_sweeps_oracle_sql("SELECT src, dst FROM edges_t", 2)
    want = dict(con.execute(sql).fetchall())
    assert got == want
    assert got[15] != 1  # genuinely pre-convergence


def test_min_label_sweeps_validation(spark):
    with pytest.raises(ValueError):
        graph.min_label_sweeps(_edges(spark, [(1, 2)]), 0)


def test_validation_and_plan(spark):
    e = _edges(spark, [(1, 2)])
    with pytest.raises(ValueError):
        graph.pagerank(e, 0)
    with pytest.raises(ValueError):
        graph.pagerank(e, 1, damping=(100, 100))
    plan = graph.pagerank(e, 2)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_bfs_level_sweeps_exact_distances(spark):
    """Path 1-2-3-4-5 plus isolated pair 8-9; seeds {1, 8}: after 3
    sweeps exactly the nodes within 3 hops appear, at true distance."""
    from sakura_spark.functions.graph import bfs_level_sweeps

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (8, 9)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(1,), (8,)], "node long")
    got = {
        r.node: r.dist
        for r in bfs_level_sweeps(edges, seeds, iterations=3).collect()
    }
    assert got == {1: 0, 2: 1, 3: 2, 4: 3, 8: 0, 9: 1}  # 5 unreached in 3 sweeps
    got4 = {
        r.node: r.dist
        for r in bfs_level_sweeps(edges, seeds, iterations=4).collect()
    }
    assert got4[5] == 4


def test_bfs_level_sweeps_validation(spark):
    from sakura_spark.functions.graph import bfs_level_sweeps

    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    seeds = spark.createDataFrame([(1,)], "node long")
    import pytest

    with pytest.raises(ValueError):
        bfs_level_sweeps(edges, seeds, iterations=0)


def test_bfs_converged_reaches_fixpoint(spark):
    """The convergence-detected loop stops at eccentricity+1 sweeps and
    returns exactly the full shortest-path table — equal to any
    fixed-sweep run with iterations >= eccentricity."""
    from sakura_spark.functions.graph import bfs_converged, bfs_level_sweeps

    # Path 1-2-3-4-5 (ecc 4 from seed 1) plus pair 8-9 (ecc 1 from 8).
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (8, 9)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(1,), (8,)], "node long")
    dist, sweeps = bfs_converged(edges, seeds)
    got = {r.node: r.dist for r in dist.collect()}
    assert got == {1: 0, 2: 1, 3: 2, 4: 3, 5: 4, 8: 0, 9: 1}
    assert sweeps == 5  # eccentricity 4 + the fixpoint-witness sweep
    fixed = {
        r.node: r.dist
        for r in bfs_level_sweeps(edges, seeds, iterations=6).collect()
    }
    assert got == fixed  # converged == any-unroll-past-diameter


def test_bfs_converged_unreachable_component_absent(spark):
    """Nodes in a component with no seed never appear, and the loop still
    converges (it does not wait for them)."""
    from sakura_spark.functions.graph import bfs_converged

    edges = spark.createDataFrame(
        [(1, 2), (8, 9)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(1,)], "node long")
    dist, sweeps = bfs_converged(edges, seeds)
    got = {r.node: r.dist for r in dist.collect()}
    assert got == {1: 0, 2: 1}
    assert sweeps == 2


def test_bfs_converged_iteration_guard(spark):
    """max_iterations hit raises instead of returning a half-converged
    table."""
    import pytest

    from sakura_spark.functions.graph import bfs_converged

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(1,)], "node long")
    with pytest.raises(RuntimeError, match="fixpoint"):
        bfs_converged(edges, seeds, max_iterations=2)


def test_kcore_peel_pendant_cascade(spark):
    """k=2 peel on a triangle with a pendant path: the path peels off
    over TWO rounds (5 first — degree 1 — then 4, whose degree drops to
    1 only after 5 is gone), the triangle survives with degree 2 —
    exactly the cascade the synchronous semantics prescribe."""
    from sakura_spark.functions.graph import kcore_peel

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)], "src long, dst long"
    )
    got = {r.node: r.degree for r in kcore_peel(edges, k=2, rounds=3).collect()}
    assert got == {1: 2, 2: 2, 3: 2}
    # one round is NOT enough: 4 still survives (its degree was 2 when
    # the round was measured) — the fixed-round result is deterministic
    # and distinguishable from the fixpoint.
    got1 = {r.node: r.degree for r in kcore_peel(edges, k=2, rounds=1).collect()}
    assert set(got1) == {1, 2, 3, 4}


def test_kcore_peel_whole_graph_survives(spark):
    """A clique is its own k-core for k < size: nothing peels and every
    degree is size-1."""
    from sakura_spark.functions.graph import kcore_peel

    edges = spark.createDataFrame(
        [(a, b) for a in range(4) for b in range(a + 1, 4)],
        "src long, dst long",
    )
    got = {r.node: r.degree for r in kcore_peel(edges, k=3, rounds=2).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}
