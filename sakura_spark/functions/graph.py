"""Graph analytics over edge tables: fixed-point PageRank, exact triangles.

Link-graph centrality is a standard corpus-quality signal in large-scale
training-data pipelines (CommonCrawl page ranking — Page et al. 1999;
harmonic-centrality curation in CCNet-adjacent stacks). The reference's
surface stops at relational algebra; this module layers the iterative
operator on top, Spark-first: each iteration is one join + one map-side-
combinable aggregation over the edge table, expressed entirely in
DataFrame ops so Catalyst plans the shuffles.

Determinism contract (the repo's integer-exact discipline): ranks are
SCALED INTEGERS and every step is integer arithmetic —

    base     = scale * (dampd - dampn) // dampd          (teleport mass)
    q(src)   = (r_src * dampn) div (dampd * W_src)       (one floor div)
    contrib  = q(src) * w(edge)
    r'(dst)  = base + sum(contrib over in-edges)

so two engines (or two cluster topologies) produce bit-identical rank
tables: int64 sums are order-free, and the single floor division is the
only rounding point. The q*w factoring bounds every intermediate by
r*dampn (no overflow for r < 2^63/dampn ≈ 1.08e17 — pick `scale`
accordingly; ANSI mode fails loudly if violated). The quantization error
vs float PageRank is ~W/(r*d) relative per edge — pytest-checked against
a numpy float reference on planted graphs.

Dangling nodes (out-weight 0) drop their damped mass — the "sink-drop"
variant, chosen because it is expressible as the same one-join iteration
in any engine (no global dangling-mass broadcast term); documented, and
identical on both sides of the oracle.

Scale shape (100 TB):
- Out-weights are computed ONCE (one groupBy over edges) and reused every
  iteration.
- Each iteration shuffles twice (join ranks on src, aggregate on dst) —
  the minimum for message passing without pre-partitioned storage. At
  cluster scale, bucketing edges by src makes the join co-located and
  halves that; AQE handles hub-key skew (or salt `dst` for extreme hubs).
- The lazy plan grows linearly in `iterations` (a chain of join+agg
  blocks). Past ~10 iterations, localCheckpoint() per iteration keeps
  lineage bounded; fixed small iteration counts (the common quality-
  signal regime) don't need it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _pin(df: DataFrame) -> DataFrame:
    """Materialize a relation once and truncate its lineage
    (localCheckpoint, EAGER — runs a Spark job at operator-call time,
    the duplicate_clusters/bloom-build convention, documented in each
    caller). Why: Spark plans are TREES — every reference to a DataFrame
    re-evaluates its whole subtree, so an edge table referenced once per
    message-passing iteration re-runs the corpus-scale edge DERIVATION
    per iteration (measured on the registered graph queries: 24-55
    exchanges in the un-pinned executed plans, ~5-10x redundant corpus
    scans; 4-7 after pinning). At 100 TB the pin is the difference
    between reading the corpus once and reading it per iteration.
    Production caveat: localCheckpoint blocks live on executors (lost
    executors lose blocks); on a long-running cluster job prefer a
    reliable checkpoint dir — the operators' iteration counts here are
    small and the repo's driver contract is single-session."""
    return df.localCheckpoint(eager=True)


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    damping: tuple[int, int] = (85, 100),
    scale: int = 10**9,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
) -> DataFrame:
    """(node, rank_scaled): fixed-point PageRank over a weighted edge
    table after ``iterations`` synchronous sweeps from a uniform start
    (rank = scale). See the module docstring for the exact integer
    contract. ``weight`` names an int64 edge-weight column (default: every
    edge weighs 1); parallel edges are legal and behave as summed weights.
    """
    if iterations < 1:
        raise ValueError("pagerank needs at least one iteration")
    dampn, dampd = damping
    if not (0 < dampn < dampd):
        raise ValueError("damping must satisfy 0 < dampn < dampd")
    base = scale * (dampd - dampn) // dampd

    w = F.col(weight).cast("long") if weight else F.lit(1).cast("long")
    # NB: internal names must differ case-insensitively — Spark resolves
    # identifiers case-insensitively by default, so e.g. __w vs __W is a
    # silent withColumn replacement, not a second column.
    e = edges.select(
        F.col(src).alias("__src"), F.col(dst).alias("__dst"), w.alias("__ew")
    )
    # Out-weights ride the edge rows via a window over __src instead of a
    # groupBy + self-join: one relation, no duplicated lineage (a
    # rejoin of an aggregate of e against e trips Spark's self-join
    # attribute dedup into ambiguous-name territory), and the per-
    # iteration ranks join then reuses the same __src hash partitioning.
    from pyspark.sql import Window as W

    # Pin the weighted edge table and the node set: both are referenced
    # once per sweep, and without the pin each reference re-runs the
    # caller's edge DERIVATION (see _pin — eager job at call time).
    ew = _pin(e.withColumn("__outw", F.sum("__ew").over(W.partitionBy("__src"))))
    nodes = _pin(
        ew.select(F.col("__src").alias("node"))
        .unionByName(ew.select(F.col("__dst").alias("node")))
        .distinct()
    )

    ranks = nodes.select("node", F.lit(scale).cast("long").alias("rank_scaled"))
    for _ in range(iterations):
        contrib = (
            ew.join(ranks.withColumnRenamed("node", "__src"), "__src")
            .select(
                F.col("__dst").alias("node"),
                # q*w factoring: the floor div happens before the weight
                # multiply, so no intermediate exceeds rank*dampn.
                (
                    F.expr(f"(rank_scaled * {dampn}L) div ({dampd}L * __outw)")
                    * F.col("__ew")
                ).alias("__c"),
            )
            .groupBy("node")
            .agg(F.sum("__c").alias("__in"))
        )
        ranks = nodes.join(contrib, "node", "left").select(
            "node",
            (F.lit(base).cast("long") + F.coalesce(F.col("__in"), F.lit(0)))
            .alias("rank_scaled"),
        )
    return ranks


def triangles(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """(node, n_triangles): exact per-node triangle counts of the
    UNDIRECTED simple graph induced by ``edges`` (direction, multiplicity
    and self-loops are normalized away). Nodes in no triangle are absent.

    Algorithm — degree-ordered orientation (Latapy's compact-forward /
    the node-iterator++ bound): orient every canonical edge {a, b} from
    the endpoint with lower (degree, id) to the higher one, enumerate
    directed wedges u->v, v->w, and close them against the oriented edge
    set u->w. Each triangle {a<b<c} in the (degree, id) total order is
    produced exactly once as the wedge a->b->c closed by a->c.

    Why this is THE 100 TB shape: after orientation the out-degree of
    every node is bounded by O(sqrt(m)) on any graph (a node of degree d
    keeps only edges toward higher-degree endpoints, and there are at
    most 2m/d of those), so the wedge join generates O(m^1.5) rows
    worst-case instead of the naive sum(d^2) — the difference between a
    hub with 10^7 followers producing 10^14 wedges and ~10^7. The plan is
    three shuffles (canonicalize, degree window, wedge join) plus one
    broadcast-or-shuffle semijoin closure and one final count aggregation;
    everything is DataFrame ops, AQE handles residual skew. The triangle
    SET is orientation-independent, so a naive SQL oracle (three-way
    self-join on id-ordered canonical edges) must agree row-for-row —
    counts are exact integers, no float anywhere.
    """
    # Canonical undirected simple edges: a < b by raw id, loops dropped.
    # Pinned: the canonical set is referenced twice building `half`, and
    # its lineage carries the caller's edge derivation (see _pin).
    a = F.least(F.col(src), F.col(dst)).alias("a")
    b = F.greatest(F.col(src), F.col(dst)).alias("b")
    e = _pin(
        edges.select(a, b)
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    # Undirected degree rides both endpoints via one explode + window
    # (one relation — same self-join-lineage rationale as pagerank's
    # out-weight window).
    from pyspark.sql import Window as W

    half = e.select(
        F.col("a").alias("x"), F.col("b").alias("y")
    ).unionByName(e.select(F.col("b").alias("x"), F.col("a").alias("y")))
    half = half.withColumn("__deg", F.count(F.lit(1)).over(W.partitionBy("x")))
    # Re-pair each edge's two degree-carrying halves with ONE groupBy on
    # the canonical key (no self-join — same lineage rationale as
    # pagerank's out-weight window), then orient a -> b when
    # (deg(a), a) < (deg(b), b) via struct comparison.
    paired = (
        half.groupBy(
            F.least("x", "y").alias("a"), F.greatest("x", "y").alias("b")
        )
        .agg(
            F.max(F.when(F.col("x") == F.least("x", "y"), F.col("__deg"))).alias(
                "__da"
            ),
            F.max(F.when(F.col("x") == F.greatest("x", "y"), F.col("__deg"))).alias(
                "__db"
            ),
        )
    )
    ka = F.struct(F.col("__da").alias("d"), F.col("a").alias("n"))
    kb = F.struct(F.col("__db").alias("d"), F.col("b").alias("n"))
    # Pinned: the oriented edge set feeds the wedge join twice AND the
    # semi-join closure — three references (see _pin).
    oriented = _pin(
        paired.select(
            F.when(ka < kb, F.col("a")).otherwise(F.col("b")).alias("u"),
            F.when(ka < kb, F.col("b")).otherwise(F.col("a")).alias("v"),
        )
    )
    # Wedges u->v->w closed by the oriented edge u->w.
    second = oriented.select(F.col("u").alias("v"), F.col("v").alias("w"))
    wedges = oriented.join(second, "v").select("u", "v", "w")
    closing = oriented.select(F.col("u"), F.col("v").alias("w"))
    tri = wedges.join(closing, ["u", "w"], "left_semi").select("u", "v", "w")
    corners = (
        tri.select(F.col("u").alias("node"))
        .unionByName(tri.select(F.col("v").alias("node")))
        .unionByName(tri.select(F.col("w").alias("node")))
    )
    return corners.groupBy("node").agg(
        F.count(F.lit(1)).alias("n_triangles")
    )


def triangles_oracle_sql(edges_sql: str) -> str:
    """ANSI-SQL twin of :func:`triangles`: id-ordered canonical edges and
    a naive three-way self-join a<b<c (the triangle set is orientation-
    independent, so the degree-oriented Spark plan must match exactly).
    ``edges_sql`` must yield (src, dst)."""
    return (
        f"WITH raw AS ({edges_sql}), "
        "e AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b "
        "FROM raw WHERE src <> dst), "
        "tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z "
        "FROM e e1 JOIN e e2 ON e2.a = e1.b JOIN e e3 "
        "ON e3.a = e1.a AND e3.b = e2.b), "
        "corners AS (SELECT x AS node FROM tri UNION ALL "
        "SELECT y FROM tri UNION ALL SELECT z FROM tri) "
        "SELECT node, count(*) AS n_triangles FROM corners GROUP BY node"
    )


def min_label_sweeps(
    edges: DataFrame,
    iterations: int = 4,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """(node, label) after ``iterations`` SYNCHRONOUS min-label sweeps
    over the undirected simple graph: every sweep, each node adopts the
    minimum label in its closed neighborhood (labels start as node ids).
    After >= diameter sweeps the labels are exactly the connected
    components' minimum ids; with fewer sweeps the result is still a
    deterministic, engine-independent function of (graph, iterations) —
    which is the point: unlike the convergence-detected
    dedup.duplicate_clusters (pointer doubling, ConvergenceError,
    driver-gated fast path), the fixed-sweep form is expressible as
    unrolled SQL, so a DuckDB oracle can hash-check the label table
    row-for-row (the pagerank discipline applied to components).

    Each sweep is one join + one map-side-combinable min aggregation +
    one left join back to the node set — no Python, no collect; min is
    order-free so the result is partitioning-independent. Use
    duplicate_clusters for production clustering (it detects
    convergence); use this where auditability of every sweep matters.
    """
    if iterations < 1:
        raise ValueError("min_label_sweeps needs at least one iteration")
    a = F.least(F.col(src), F.col(dst)).alias("a")
    b = F.greatest(F.col(src), F.col(dst)).alias("b")
    # Pinned: the canonical set is referenced twice (both directions) and
    # carries the caller's edge derivation (see _pin).
    e0 = _pin(edges.select(a, b).where(F.col("a") != F.col("b")).distinct())
    both = e0.select(
        F.col("a").alias("__s"), F.col("b").alias("__d")
    ).unionByName(e0.select(F.col("b").alias("__s"), F.col("a").alias("__d")))
    # Self-edges make the closed-neighborhood min ONE join + agg per sweep
    # (no left-join-back to carry the old label, and no join between
    # labels and a labels-derived aggregate — the pagerank lineage shape).
    nodes = both.select(F.col("__s").alias("node")).distinct()
    # Pinned: the self-edge-augmented table is referenced once per sweep.
    e = _pin(
        both.unionByName(
            nodes.select(F.col("node").alias("__s"), F.col("node").alias("__d"))
        )
    )
    labels = nodes.select("node", F.col("node").alias("label"))
    for _ in range(iterations):
        labels = (
            e.join(labels.withColumnRenamed("node", "__d"), "__d")
            .groupBy(F.col("__s").alias("node"))
            .agg(F.min("label").alias("label"))
        )
    return labels


def min_label_sweeps_oracle_sql(edges_sql: str, iterations: int = 4) -> str:
    """ANSI-SQL twin of :func:`min_label_sweeps`, unrolled to
    ``iterations`` CTE blocks; ``edges_sql`` must yield (src, dst)."""
    parts = [
        f"WITH raw AS ({edges_sql})",
        "e0 AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b "
        "FROM raw WHERE src <> dst)",
        "eb AS (SELECT a AS s, b AS d FROM e0 UNION ALL SELECT b, a FROM e0)",
        "nodes AS (SELECT DISTINCT s AS node FROM eb)",
        "e AS (SELECT s, d FROM eb UNION ALL SELECT node, node FROM nodes)",
        "l0 AS (SELECT node, node AS label FROM nodes)",
    ]
    for i in range(1, iterations + 1):
        parts.append(
            f"l{i} AS (SELECT e.s AS node, min(r.label) AS label FROM e "
            f"JOIN l{i-1} r ON e.d = r.node GROUP BY 1)"
        )
    head = ", ".join(parts)
    return f"{head} SELECT node, label FROM l{iterations}"


def kcore_peel(
    edges: DataFrame,
    k: int = 3,
    rounds: int = 4,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """(node, degree) after ``rounds`` SYNCHRONOUS peeling rounds toward
    the k-core (Seidman 1983; the standard graph-curation density
    filter — e.g. dropping weakly-connected near-dup documents whose
    cluster membership is circumstantial): each round computes every
    surviving node's degree in the CURRENT surviving subgraph and
    removes all nodes with degree < ``k`` together with their edges.
    After enough rounds this is exactly the k-core; with fewer it is a
    deterministic, engine-independent function of (graph, k, rounds) —
    the min_label_sweeps discipline, which is what makes the unrolled
    SQL twin (:func:`kcore_peel_oracle_sql`) an exact oracle. The
    returned degree is the node's degree INSIDE the surviving subgraph
    (so trailing rows can still carry degree < k if the peel has not
    converged — auditable, not hidden).

    Per round: ONE map-side-combinable degree aggregation + two
    semi-joins restricting the symmetric edge table to surviving
    endpoints, pinned per round (lineage stays one round deep; each
    round's cost is O(|surviving edges|) shuffled by node key, strictly
    non-increasing). No Python, no collect."""
    if k < 1 or rounds < 1:
        raise ValueError("kcore_peel needs k >= 1 and rounds >= 1")
    a = F.least(F.col(src), F.col(dst)).alias("a")
    b = F.greatest(F.col(src), F.col(dst)).alias("b")
    e0 = _pin(edges.select(a, b).where(F.col("a") != F.col("b")).distinct())
    both = e0.select(
        F.col("a").alias("__s"), F.col("b").alias("__d")
    ).unionByName(e0.select(F.col("b").alias("__s"), F.col("a").alias("__d")))
    for _ in range(rounds):
        deg = both.groupBy("__s").agg(F.count(F.lit(1)).alias("__deg"))
        keep = deg.filter(F.col("__deg") >= k).select("__s")
        both = _pin(
            both.join(keep, "__s", "left_semi").join(
                keep.withColumnRenamed("__s", "__d"), "__d", "left_semi"
            )
        )
    return (
        both.groupBy(F.col("__s").alias("node"))
        .agg(F.count(F.lit(1)).cast("long").alias("degree"))
    )


def kcore_peel_oracle_sql(edges_sql: str, k: int = 3, rounds: int = 4) -> str:
    """ANSI-SQL twin of :func:`kcore_peel`, unrolled to ``rounds`` CTE
    blocks; ``edges_sql`` must yield (src, dst)."""
    parts = [
        f"WITH raw AS ({edges_sql})",
        "e0 AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b "
        "FROM raw WHERE src <> dst)",
        "b0 AS (SELECT a AS s, b AS d FROM e0 UNION ALL SELECT b, a FROM e0)",
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f"k{i} AS (SELECT s FROM b{i-1} GROUP BY s "
            f"HAVING count(*) >= {k})"
        )
        parts.append(
            f"b{i} AS (SELECT b.s, b.d FROM b{i-1} b "
            f"JOIN k{i} x ON b.s = x.s JOIN k{i} y ON b.d = y.s)"
        )
    head = ", ".join(parts)
    return (
        f"{head} SELECT s AS node, CAST(count(*) AS BIGINT) AS degree "
        f"FROM b{rounds} GROUP BY 1"
    )


def pagerank_oracle_sql(
    edges_sql: str,
    iterations: int = 3,
    damping: tuple[int, int] = (85, 100),
    scale: int = 10**9,
) -> str:
    """The ANSI-SQL twin of :func:`pagerank`, unrolled to ``iterations``
    CTE blocks (recursive CTEs cannot re-aggregate per step in standard
    SQL). ``edges_sql`` must yield (src, dst, w). Kept next to the
    operator so the two spellings of the integer contract stay in sync."""
    dampn, dampd = damping
    base = scale * (dampd - dampn) // dampd
    parts = [
        f"WITH e AS ({edges_sql})",
        "deg AS (SELECT src AS n, sum(w) AS W FROM e GROUP BY 1)",
        "nodes AS (SELECT DISTINCT node FROM "
        "(SELECT src AS node FROM e UNION ALL SELECT dst FROM e))",
        f"r0 AS (SELECT node, CAST({scale} AS BIGINT) AS r FROM nodes)",
    ]
    for i in range(1, iterations + 1):
        # DuckDB's sum(BIGINT) yields HUGEINT, which pandas renders as
        # float64 — a representation-sensitive hash then sees 1.1e10 vs
        # Spark's int64 11188700000.  CAST the aggregate (and the final
        # column) back to BIGINT so both engines surface int64.
        parts.append(
            f"r{i} AS (SELECT n.node, CAST({base} AS BIGINT) + "
            "COALESCE(s.c, 0) AS r FROM nodes n LEFT JOIN ("
            f"SELECT e.dst AS node, CAST(sum(((r.r * {dampn}) // ({dampd} * d.W)) * e.w) AS BIGINT) AS c "
            f"FROM e JOIN deg d ON e.src = d.n JOIN r{i-1} r ON e.src = r.node "
            "GROUP BY 1) s ON n.node = s.node)"
        )
    head = ", ".join(parts)
    return f"{head} SELECT node, CAST(r AS BIGINT) AS rank_scaled FROM r{iterations}"


def bfs_level_sweeps(
    edges: DataFrame,
    seeds: DataFrame,
    iterations: int = 4,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """(node, dist) after ``iterations`` SYNCHRONOUS Bellman-Ford/BFS
    sweeps over the undirected simple graph: ``seeds`` (one ``node``
    column) start at distance 0 and every sweep each node adopts
    ``min(own dist, min over neighbors (their dist + 1))`` — after the
    k-th sweep the table holds EXACTLY the nodes within k hops of the
    seed set, at their true hop distance (unreached nodes are absent,
    not NULL). The fixed-sweep form of multi-source shortest paths: like
    min_label_sweeps, deliberately expressible as unrolled SQL so a
    DuckDB twin hash-checks every distance row-for-row; distances are
    exact integers and min is order-free, so the result is partitioning-
    and engine-independent by construction.

    Each sweep is one hash join (edges x current frontier table) + one
    map-side-combinable min aggregation — no Python, no collect, no
    driver state; the self-edge-with-weight-0 augmentation makes the
    'keep my old distance' case part of the SAME join instead of a
    second outer join per sweep. ``seeds`` must be nodes of the graph
    (edge endpoints): an isolated seed has no self-loop row and drops
    out after the first sweep. At 100 TB: frontier rows <= reached
    nodes, edge table bucketed by src keeps the per-sweep join
    co-located, and the sweep count is a compile-time constant (use an
    explicit convergence-detected loop for unbounded-diameter graphs —
    the duplicate_clusters pattern)."""
    if iterations < 1:
        raise ValueError("bfs_level_sweeps needs at least one iteration")
    a = F.least(F.col(src), F.col(dst)).alias("a")
    b = F.greatest(F.col(src), F.col(dst)).alias("b")
    e0 = _pin(edges.select(a, b).where(F.col("a") != F.col("b")).distinct())
    both = e0.select(
        F.col("a").alias("__s"), F.col("b").alias("__d")
    ).unionByName(e0.select(F.col("b").alias("__s"), F.col("a").alias("__d")))
    nodes = both.select(F.col("__s").alias("node")).distinct()
    # Pinned: referenced once per sweep. Edge weight 1, self-loop weight 0.
    e = _pin(
        both.withColumn("__w", F.lit(1).cast("long")).unionByName(
            nodes.select(
                F.col("node").alias("__s"),
                F.col("node").alias("__d"),
                F.lit(0).cast("long").alias("__w"),
            )
        )
    )
    dist = seeds.select("node", F.lit(0).cast("long").alias("dist"))
    for _ in range(iterations):
        dist = (
            e.join(dist.withColumnRenamed("node", "__d"), "__d")
            .groupBy(F.col("__s").alias("node"))
            .agg(F.min(F.col("dist") + F.col("__w")).alias("dist"))
        )
    return dist


def bfs_level_sweeps_oracle_sql(
    edges_sql: str, seeds_where: str, iterations: int = 4
) -> str:
    """ANSI-SQL twin of :func:`bfs_level_sweeps`, unrolled to
    ``iterations`` CTE blocks; ``edges_sql`` must yield (src, dst) and
    ``seeds_where`` is a predicate over ``node`` selecting the seeds."""
    parts = [
        f"WITH raw AS ({edges_sql})",
        "e0 AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b "
        "FROM raw WHERE src <> dst)",
        "eb AS (SELECT a AS s, b AS d FROM e0 UNION ALL SELECT b, a FROM e0)",
        "nodes AS (SELECT DISTINCT s AS node FROM eb)",
        "e AS (SELECT s, d, 1 AS w FROM eb "
        "UNION ALL SELECT node, node, 0 FROM nodes)",
        f"d0 AS (SELECT node, 0 AS dist FROM nodes WHERE {seeds_where})",
    ]
    for i in range(1, iterations + 1):
        parts.append(
            f"d{i} AS (SELECT e.s AS node, min(r.dist + e.w) AS dist FROM e "
            f"JOIN d{i-1} r ON e.d = r.node GROUP BY 1)"
        )
    head = ", ".join(parts)
    return (
        f"{head} SELECT node, CAST(dist AS BIGINT) AS dist "
        f"FROM d{iterations}"
    )


def bfs_converged(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 64,
) -> tuple[DataFrame, int]:
    """(node, dist) table plus the sweep count of a CONVERGENCE-DETECTED
    multi-source BFS — the unbounded-diameter companion of
    :func:`bfs_level_sweeps` (which documents exactly this loop as the
    production path when no hop bound is known). Identical per-sweep
    plan: one hash join against the pinned self-loop-augmented edge
    table + one map-side-combinable min aggregation; each sweep is
    localCheckpoint-pinned (the duplicate_clusters discipline) so the
    lineage stays one-sweep deep, and the stop test is ONE bounded
    driver-side aggregate per sweep: (row count, sum(dist)).

    That pair is a complete fixpoint witness because the sweep operator
    is monotone under min — the reached set only grows and a reached
    node's distance never increases — so an unchanged count means no
    node was added, and (given that) an unchanged sum means no distance
    decreased. The loop therefore runs eccentricity(seeds)+1 sweeps:
    every sweep past the true diameter reproduces the same table, which
    is also why the converged result equals ANY fixed-sweep run with
    iterations >= eccentricity — the property the oracle twin checks.
    ``max_iterations`` bounds a disconnected-pathology runaway; hitting
    it raises rather than returning a half-converged table.

    SEEDS CONTRACT (same as bfs_level_sweeps, restated because the
    convergence loop MASKS a violation as a normal fixpoint): ``seeds``
    must be nodes of the graph (edge endpoints). An isolated seed has
    no self-loop row in the augmented edge table, so it drops out after
    sweep 1 instead of reporting dist 0 — and the loop then converges
    on the remaining nodes as if nothing were lost. Union isolated ids
    into ``edges`` as explicit self-edges first if they must survive.

    At 100 TB: per-sweep cost is O(|edges within the reached frontier|)
    shuffled by node key; the convergence agg moves two longs to the
    driver per sweep. Real diameters of co-occurrence / similarity
    graphs are small (measured here: 2-4 hops at sf0.001-0.1), so the
    loop ends after a handful of sweeps — the explicit stop test is
    what makes that safe to RELY on rather than assume."""
    a = F.least(F.col(src), F.col(dst)).alias("a")
    b = F.greatest(F.col(src), F.col(dst)).alias("b")
    e0 = _pin(edges.select(a, b).where(F.col("a") != F.col("b")).distinct())
    both = e0.select(
        F.col("a").alias("__s"), F.col("b").alias("__d")
    ).unionByName(e0.select(F.col("b").alias("__s"), F.col("a").alias("__d")))
    nodes = both.select(F.col("__s").alias("node")).distinct()
    e = _pin(
        both.withColumn("__w", F.lit(1).cast("long")).unionByName(
            nodes.select(
                F.col("node").alias("__s"),
                F.col("node").alias("__d"),
                F.lit(0).cast("long").alias("__w"),
            )
        )
    )
    dist = _pin(seeds.select("node", F.lit(0).cast("long").alias("dist")))
    prev = tuple(dist.agg(F.count(F.lit(1)), F.sum("dist")).first())
    for sweep in range(1, max_iterations + 1):
        dist = _pin(
            e.join(dist.withColumnRenamed("node", "__d"), "__d")
            .groupBy(F.col("__s").alias("node"))
            .agg(F.min(F.col("dist") + F.col("__w")).alias("dist"))
        )
        cur = tuple(dist.agg(F.count(F.lit(1)), F.sum("dist")).first())
        if cur == prev:
            return dist, sweep
        prev = cur
    raise RuntimeError(
        f"bfs_converged did not reach a fixpoint in {max_iterations} sweeps"
    )
