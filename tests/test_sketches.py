"""Sketch family: HLL registers/estimate, count-min sketch, KMV bottom-k.

Each sketch's ORACLE surface (integer register tables, CMS MIN estimates)
is driver-hashed vs DuckDB; these tests cover the laws the oracle can't:
the published accuracy bounds of the float estimate layers, the
never-undercount CMS guarantee, and — the property that IS the 100 TB
story — mergeability: sketching two halves and combining registers must
equal sketching the whole.
"""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from sakura_spark.functions import sketches as sk


@pytest.fixture(scope="module")
def values(spark):
    # 2000 distinct ids, each appearing 1-3 times, two groups.
    rows = [
        (i % 2, f"v{i}", j)
        for i in range(2000)
        for j in range(1 + (i % 3))
    ]
    return spark.createDataFrame(rows, "grp int, val string, rep int")


def _py_word(value: str, salt: str, word: int = 0) -> int:
    """Driver-side replica of sketches.hash_word for differentials."""
    digest = hashlib.sha256(f"{salt}\x1f{value}".encode()).hexdigest()
    return int(digest[15 * word : 15 * word + 15], 16)


# ---------------------------------------------------------------------------
# HLL
# ---------------------------------------------------------------------------


def test_hll_registers_match_python_reference(spark, values):
    p = 4
    got = {
        (r["grp"], r["bucket"]): r["rho"]
        for r in sk.hll_registers(values, ["grp"], "val", p=p).collect()
    }
    want: dict[tuple[int, int], int] = {}
    for row in values.select("grp", "val").collect():
        bucket = _py_word(row["val"], "hll", 0) % (1 << p)
        v = _py_word(row["val"], "hll", 1)
        rho = 61 if v == 0 else 61 - v.bit_length()
        key = (row["grp"], bucket)
        want[key] = max(want.get(key, 0), rho)
    assert got == want


def test_hll_estimate_within_published_error(spark, values):
    p = 6  # m=64 -> relative error ~ 1.04/8 = 13%; allow 3 sigma.
    reg = sk.hll_registers(values, ["grp"], "val", p=p)
    est = {r["grp"]: r["estimate"] for r in sk.hll_estimate(reg, ["grp"], p=p).collect()}
    exact = {
        r["grp"]: r["n"]
        for r in values.groupBy("grp").agg(F.countDistinct("val").alias("n")).collect()
    }
    for g, n in exact.items():
        assert abs(est[g] - n) / n < 3 * 1.04 / math.sqrt(1 << p)


def test_hll_registers_merge_by_max(spark, values):
    """Sketch(A) merged with Sketch(B) by MAX == Sketch(A union B)."""
    a = values.filter(F.col("val") < "v5")
    b = values.filter(~(F.col("val") < "v5"))
    merged = (
        sk.hll_registers(a, ["grp"], "val", p=4)
        .union(sk.hll_registers(b, ["grp"], "val", p=4))
        .groupBy("grp", "bucket")
        .agg(F.max("rho").alias("rho"))
    )
    whole = sk.hll_registers(values, ["grp"], "val", p=4)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, whole.collect()))


def test_merge_functions_equal_whole_even_with_overlap(spark, values):
    """The named merge APIs (hll_merge / cms_merge / kmv_merge): merging
    per-part sketches equals sketching the whole input. HLL (MAX,
    idempotent) and KMV (distinct bottom-k) must tolerate OVERLAPPING
    parts; CMS (SUM) is multiset-union, checked on a disjoint split."""
    a = values.filter(F.col("val") < "v5")
    b = values.filter(~(F.col("val") < "v3"))  # overlaps a on v3..v4xx
    assert a.join(b, ["grp", "val", "rep"]).count() > 0  # genuine overlap

    hll = sk.hll_merge(
        sk.hll_registers(a, ["grp"], "val", p=4).unionByName(
            sk.hll_registers(b, ["grp"], "val", p=4)
        ),
        ["grp"],
    )
    hll_whole = sk.hll_registers(values, ["grp"], "val", p=4)
    assert sorted(map(tuple, hll.collect())) == sorted(
        map(tuple, hll_whole.collect())
    )

    kmv = sk.kmv_merge(
        sk.kmv_sketch(a, ["grp"], "val", k=16).unionByName(
            sk.kmv_sketch(b, ["grp"], "val", k=16)
        ),
        ["grp"],
        k=16,
    )
    kmv_whole = sk.kmv_sketch(values, ["grp"], "val", k=16)
    assert sorted(map(tuple, kmv.collect())) == sorted(
        map(tuple, kmv_whole.collect())
    )

    da = values.filter(F.col("val") < "v5")
    db = values.filter(~(F.col("val") < "v5"))
    cms = sk.cms_merge(
        sk.cms_sketch(da, "val", depth=3, width=32).unionByName(
            sk.cms_sketch(db, "val", depth=3, width=32)
        )
    )
    cms_whole = sk.cms_sketch(values, "val", depth=3, width=32)
    assert sorted(map(tuple, cms.collect())) == sorted(
        map(tuple, cms_whole.collect())
    )


def test_hll_estimate_insensitive_to_duplicates(spark, values):
    """Registers depend only on the distinct value set."""
    reg_all = sk.hll_registers(values, [], "val", p=5)
    reg_distinct = sk.hll_registers(values.select("val").distinct(), [], "val", p=5)
    assert sorted(map(tuple, reg_all.collect())) == sorted(
        map(tuple, reg_distinct.collect())
    )


# ---------------------------------------------------------------------------
# CMS
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def skewed(spark):
    # Zipf-ish: item k appears ~ 600/k times.
    rows = [(f"w{k}",) for k in range(1, 40) for _ in range(600 // k)]
    return spark.createDataFrame(rows, "w string")


def test_cms_never_undercounts_and_bounded_overcount(spark, skewed):
    depth, width = 4, 128
    sketch = sk.cms_sketch(skewed, "w", depth=depth, width=width)
    est = {
        r["item"]: r["est"]
        for r in sk.cms_lookup(
            sketch, skewed.distinct(), "w", depth=depth, width=width
        ).collect()
    }
    true = {
        r["w"]: r["t"]
        for r in skewed.groupBy("w").agg(F.count("*").alias("t")).collect()
    }
    total = sum(true.values())
    # Classic guarantee: true <= est <= true + (e/width) * total with
    # probability 1 - exp(-depth); assert the deterministic lower bound and
    # a loose multiple of the expected overcount for the upper.
    for w, t in true.items():
        assert est[w] >= t, f"{w}: undercount {est[w]} < {t}"
        assert est[w] <= t + 4 * math.e / width * total


def test_cms_weight_column_sums_weights(spark):
    rows = [(f"k{i % 5}", i % 3 + 1) for i in range(60)]
    sdf = spark.createDataFrame(rows, "w string, wt int")
    sketch = sk.cms_sketch(sdf, "w", depth=4, width=64, weight_col="wt")
    est = {
        r["item"]: r["est"]
        for r in sk.cms_lookup(sketch, sdf.distinct().select("w"), "w", 4, 64).collect()
    }
    true = {
        r["w"]: r["s"]
        for r in sdf.groupBy("w").agg(F.sum("wt").alias("s")).collect()
    }
    for w, s in true.items():
        assert est[w] >= s


def test_cms_merge_by_sum(spark, skewed):
    half_a = skewed.limit(1000)
    half_b = skewed.exceptAll(half_a)
    merged = (
        sk.cms_sketch(half_a, "w", depth=3, width=64)
        .union(sk.cms_sketch(half_b, "w", depth=3, width=64))
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    whole = sk.cms_sketch(skewed, "w", depth=3, width=64)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, whole.collect()))


# ---------------------------------------------------------------------------
# KMV
# ---------------------------------------------------------------------------


def test_kmv_sketch_is_bottom_k_of_python_reference(spark, values):
    k = 16
    got = sorted(
        (r["grp"], r["rank"], r["hval"])
        for r in sk.kmv_sketch(values, ["grp"], "val", k=k).collect()
    )
    by_grp: dict[int, set[int]] = {}
    for row in values.select("grp", "val").distinct().collect():
        by_grp.setdefault(row["grp"], set()).add(_py_word(row["val"], "kmv", 0))
    want = sorted(
        (g, i + 1, h)
        for g, hs in by_grp.items()
        for i, h in enumerate(sorted(hs)[:k])
    )
    assert got == want


def test_kmv_estimate_within_published_error(spark, values):
    k = 64  # error ~ 1/sqrt(k-2) ~ 12.7%; allow 3 sigma.
    sketch = sk.kmv_sketch(values, ["grp"], "val", k=k)
    est = {
        r["grp"]: r["estimate"]
        for r in sk.kmv_estimate(sketch, ["grp"], k=k).collect()
    }
    exact = {
        r["grp"]: r["n"]
        for r in values.groupBy("grp").agg(F.countDistinct("val").alias("n")).collect()
    }
    for g, n in exact.items():
        assert abs(est[g] - n) / n < 3 / math.sqrt(k - 2)


def test_kmv_estimate_exact_when_under_k(spark):
    sdf = spark.createDataFrame([(f"x{i}",) for i in range(7)], "val string")
    sketch = sk.kmv_sketch(sdf, [], "val", k=64)
    [row] = sk.kmv_estimate(sketch, [], k=64).collect()
    assert row["n_vals"] == 7 and row["estimate"] == 7.0


def test_kmv_jaccard_on_planted_overlap(spark):
    # |A|=600, |B|=600, |A∩B|=300 -> true J = 1/3; k=128 -> sigma ~ 4%.
    a = spark.createDataFrame([(f"s{i}",) for i in range(600)], "val string")
    b = spark.createDataFrame([(f"s{i}",) for i in range(300, 900)], "val string")
    k = 128
    ska = sk.kmv_sketch(a, [], "val", k=k)
    skb = sk.kmv_sketch(b, [], "val", k=k)
    [row] = sk.kmv_jaccard(ska, skb, k=k).collect()
    assert abs(row["jaccard"] - 1 / 3) < 0.15
    assert row["union_k"] == k


# ---------------------------------------------------------------------------
# Plans
# ---------------------------------------------------------------------------


def test_sketch_plans_stay_jvm_and_shuffle_registers_only(spark, values):
    """No Python in any sketch plan; the CMS lookup broadcasts the sketch."""
    for df in (
        sk.hll_registers(values, ["grp"], "val", p=5),
        sk.cms_sketch(values, "val", depth=4, width=64),
        sk.kmv_sketch(values, ["grp"], "val", k=16),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    sketch = sk.cms_sketch(values, "val", depth=4, width=64)
    lookup = sk.cms_lookup(sketch, values.select("val").distinct(), "val", 4, 64)
    plan = lookup._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_kmv_pairwise_overlap_matches_per_pair_jaccard(spark):
    """The all-pairs form must agree with kmv_jaccard run pair-by-pair,
    and recover the planted overlap structure."""
    sets = {
        "a": [f"u{i}" for i in range(0, 400)],
        "b": [f"u{i}" for i in range(200, 600)],  # J(a,b)=200/600=1/3
        "c": [f"x{i}" for i in range(300)],       # disjoint from a and b
    }
    rows = [(g, v) for g, vs in sets.items() for v in vs]
    df = spark.createDataFrame(rows, "grp string, val string")
    k = 96
    sketch = sk.kmv_sketch(df, ["grp"], "val", k=k)
    got = {
        (r["group_a"], r["group_b"]): (r["shared"], r["union_k"])
        for r in sk.kmv_pairwise_overlap(sketch, "grp", k=k).collect()
    }
    assert set(got) == {("a", "b"), ("a", "c"), ("b", "c")}
    for (ga, gb), (shared, union_k) in got.items():
        one = sk.kmv_jaccard(
            sketch.filter(F.col("grp") == ga),
            sketch.filter(F.col("grp") == gb),
            k=k,
        ).collect()[0]
        assert (one["shared"], one["union_k"]) == (shared, union_k)
    assert got[("a", "c")][0] == 0 and got[("b", "c")][0] == 0
    ab = got[("a", "b")]
    assert abs(ab[0] / ab[1] - 1 / 3) < 0.15


def test_kmv_pairwise_overlap_guards_group_cardinality(spark):
    """A high-cardinality group column (user_id-like) must hard-raise
    instead of silently enumerating |groups|^2 pairs; raising max_groups
    is the explicit opt-in."""
    import pytest

    rows = [(f"g{i}", f"v{i % 7}") for i in range(50)]
    df = spark.createDataFrame(rows, "grp string, val string")
    sketch = sk.kmv_sketch(df, ["grp"], "val", k=8)
    with pytest.raises(ValueError, match="max_groups"):
        sk.kmv_pairwise_overlap(sketch, "grp", k=8, max_groups=10)
    # Explicit opt-in past the guard still works.
    out = sk.kmv_pairwise_overlap(sketch, "grp", k=8, max_groups=2_000)
    assert out.count() == 50 * 49 // 2


# ---------------------------------------------------------------------------
# Dyadic quantiles
# ---------------------------------------------------------------------------


def test_dyadic_quantiles_track_exact_percentiles(spark):
    # Skewed integer distribution over [0, 2^14).
    rows = [(int((i * i) % 16000),) for i in range(4000)]
    df = spark.createDataFrame(rows, "x long")
    levels, depth, width = 14, 3, 128
    sketch = sk.dyadic_sketch(df, "x", levels=levels, depth=depth, width=width)
    got = sk.dyadic_quantiles(
        sketch, [0.25, 0.5, 0.75, 0.95], levels=levels, depth=depth, width=width
    )
    exact = df.selectExpr(
        "percentile(x, array(0.25, 0.5, 0.75, 0.95)) AS p"
    ).collect()[0]["p"]
    domain = 16384
    for (phi, est), ex in zip(sorted(got.items()), exact):
        # CMS noise adds at most ~levels * e/width * N to a rank, which
        # translates to a bounded value error on this smooth-enough
        # distribution; assert a generous 10%-of-domain band.
        assert abs(est - ex) < 0.1 * domain, (phi, est, ex)


def test_dyadic_rank_never_undercounts_and_is_monotone(spark):
    rows = [(i % 257,) for i in range(2000)]
    df = spark.createDataFrame(rows, "x long")
    levels, depth, width = 10, 3, 64
    sketch = sk.dyadic_sketch(df, "x", levels=levels, depth=depth, width=width)
    counters = {
        (r["level"], r["row"], r["bucket"]): r["cnt"]
        for r in sketch.collect()
    }
    true_sorted = sorted(r["x"] for r in df.collect())
    import bisect

    prev = 0
    for x in [0, 1, 17, 100, 256, 257, 300, 1023]:
        est = sk.dyadic_rank(counters, x, levels, depth, width)
        true = bisect.bisect_left(true_sorted, x)
        assert est >= true, f"rank({x}): undercount {est} < {true}"
        assert est >= prev, "rank must be monotone in x"
        prev = est


def test_dyadic_sketch_merge_by_sum(spark):
    rows = [(i % 500,) for i in range(3000)]
    df = spark.createDataFrame(rows, "x long")
    half_a = df.limit(1500)
    half_b = df.exceptAll(half_a)
    kw = dict(levels=10, depth=2, width=32)
    merged = (
        sk.dyadic_sketch(half_a, "x", **kw)
        .union(sk.dyadic_sketch(half_b, "x", **kw))
        .groupBy("level", "row", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    whole = sk.dyadic_sketch(df, "x", **kw)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )


# ---------------------------------------------------------------------------
# Bloom filter + CMS-pruned heavy hitters
# ---------------------------------------------------------------------------


def test_bloom_sketch_matches_python_reference(spark, values):
    m, k = 256, 3
    got = {
        (r["grp"], r["bit"])
        for r in sk.bloom_sketch(
            values, "val", m=m, k=k, group_cols=["grp"]
        ).collect()
    }
    want = {
        (grp, _py_word(val, f"bloom{i}") % m)
        for grp, val in {(r["grp"], r["val"]) for r in values.collect()}
        for i in range(k)
    }
    assert got == want


def test_bloom_merge_by_distinct_union(spark, values):
    """Mergeability: bloom(A) ∪ bloom(B) (distinct) == bloom(A ∪ B) —
    bitwise OR in the dense view."""
    whole = sk.bloom_sketch(values, "val", m=128, k=3, group_cols=["grp"])
    a = values.filter(F.col("rep") % 2 == 0)
    b = values.filter(F.col("rep") % 2 == 1)
    merged = (
        sk.bloom_sketch(a, "val", m=128, k=3, group_cols=["grp"])
        .union(sk.bloom_sketch(b, "val", m=128, k=3, group_cols=["grp"]))
        .distinct()
    )
    assert sorted(map(tuple, whole.collect())) == sorted(map(tuple, merged.collect()))


def test_bloom_member_no_false_negatives_and_bounded_fpr(spark):
    """Every inserted key passes; disjoint keys pass at ~fill^k, asserted
    with a generous margin over the expected rate."""
    m, k = 4096, 3
    members = [f"in{i}" for i in range(300)]
    df = spark.createDataFrame([(v,) for v in members], "val string")
    bits = {r["bit"] for r in sk.bloom_sketch(df, "val", m=m, k=k).collect()}
    probe = spark.createDataFrame(
        [(v, 1) for v in members] + [(f"out{i}", 0) for i in range(2000)],
        "val string, is_member int",
    )
    got = probe.withColumn(
        "hit", sk.bloom_member_expr(F.col("val"), bits, m=m, k=k)
    ).collect()
    assert all(r["hit"] for r in got if r["is_member"] == 1)
    fill = len(bits) / m
    fp = sum(1 for r in got if r["is_member"] == 0 and r["hit"]) / 2000
    assert fp <= max(0.02, 4 * fill**k), f"fp={fp}, fill={fill}"


def test_bloom_filtered_semijoin_equals_plain_semijoin(spark):
    """The headline law: the bloom-pruned two-phase plan returns EXACTLY
    the plain semi-join (no false negatives lose matches; the exact join
    kills false positives)."""
    left = spark.createDataFrame(
        [(i, f"n{i}") for i in range(500)], "id long, name string"
    )
    right = spark.createDataFrame(
        [(i * 3,) for i in range(100)], "rid long"
    )
    got = sk.bloom_filtered_semijoin(left, right, "id", "rid", m=1024, k=3)
    want = left.join(
        right.select(F.col("rid").alias("id")).distinct(), "id", "semi"
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_heavy_hitters_equals_group_by_having(spark):
    """CMS-pruned exact heavy hitters == plain GROUP BY/HAVING, including
    under a deliberately tiny sketch (width 8) where nearly everything
    is a false positive — the exact verify must kill them all."""
    rows = [(f"hot{i % 3}",) for i in range(300)] + [
        (f"tail{i}",) for i in range(400)
    ]
    df = spark.createDataFrame(rows, "val string")
    for width in (8, 1024):
        got = sorted(
            map(tuple, sk.heavy_hitters(df, "val", min_count=50, width=width).collect())
        )
        want = sorted(
            map(
                tuple,
                df.groupBy(F.col("val").alias("item"))
                .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
                .filter(F.col("cnt") >= 50)
                .collect(),
            )
        )
        assert got == want


def test_heavy_hitters_prefilter_prunes_the_tail(spark):
    """The scale property: with an adequate sketch the map-side prefilter
    drops long-tail rows BEFORE the exchange — candidate mass stays near
    the true heavy mass, not the corpus size."""
    rows = [(f"hot{i % 2}",) for i in range(400)] + [
        (f"tail{i}",) for i in range(500)
    ]
    df = spark.createDataFrame(rows, "val string")
    sketch = sk.cms_sketch(df.select(F.col("val").alias("item")), "item", depth=4, width=2048)
    dense = [[0] * 2048 for _ in range(4)]
    for r in sketch.collect():
        dense[r["row"]][r["bucket"]] = r["cnt"]
    est = F.least(
        *[
            F.element_at(
                F.lit(dense[i]),
                ((sk.hash_word(F.col("item"), f"cms{i}", word=0) % 2048) + 1).cast(
                    "int"
                ),
            )
            for i in range(4)
        ]
    )
    survivors = (
        df.select(F.col("val").alias("item")).filter(est >= 50).count()
    )
    # True heavy mass is 400 rows; allow a small false-positive margin.
    assert 400 <= survivors <= 450


def test_hll_cumulative_equals_prefix_union_registers(spark):
    """hll_cumulative at order key t must equal hll_registers over all
    rows with key <= t — the mergeability law applied along an ordering —
    and the per-key estimates must be monotone non-decreasing."""
    rows = [(t, f"u{(t * 31 + j) % 57}") for t in range(1, 6) for j in range(20)]
    df = spark.createDataFrame(rows, "t int, uid string")
    regs = sk.hll_registers(df, ["t"], "uid", p=4)
    cum = sk.hll_cumulative(regs, "t")
    got = {
        (r["t"], r["bucket"]): r["rho"] for r in cum.collect()
    }
    for t in range(1, 6):
        want = {
            (t, r["bucket"]): r["rho"]
            for r in sk.hll_registers(
                df.filter(F.col("t") <= t).withColumn("t", F.lit(t)), ["t"], "uid", p=4
            ).collect()
        }
        # A bucket may be absent at t in `got` only if absent in the
        # prefix union too; present buckets must match exactly.
        assert {k: v for k, v in got.items() if k[0] == t} == want, t
    # Estimates are NOT strictly monotone (the linear-counting correction
    # switch can dip); the guaranteed property is per-prefix accuracy:
    # each t's estimate tracks the exact prefix distinct count within a
    # generous multiple of the published 1.04/sqrt(16) error.
    est = {
        r["t"]: r["estimate"]
        for r in sk.hll_estimate(cum, ["t"], p=4).collect()
    }
    for t in range(1, 6):
        exact = len({u for tt, u in rows if tt <= t})
        assert abs(est[t] - exact) <= 3 * 1.04 / 4 * exact + 2, (t, est[t], exact)


def test_hll_cube_cells_match_per_cell_sketches(spark):
    """Every cube cell's registers must be BIT-IDENTICAL to sketching
    that cell's rows alone — the grouping-sets pass is a pure
    reorganization, not an approximation; and the grand-total cell must
    equal hll_merge over the per-type tables (the merge law)."""
    from sakura_spark.functions import sketches

    df = spark.createDataFrame(
        [(f"t{i % 3}", f"h{i % 2}", i % 40) for i in range(300)],
        "event_type string, hour string, user_id long",
    )
    cube = sketches.hll_cube(df, ["event_type", "hour"], "user_id", p=4)
    rows = {(r["event_type"], r["hour"], r["bucket"]): r["rho"] for r in cube.collect()}

    # per-(type, hour) cells == direct per-group sketch
    direct = sketches.hll_registers(df, ["event_type", "hour"], "user_id", p=4)
    for r in direct.collect():
        assert rows[(r["event_type"], r["hour"], r["bucket"])] == r["rho"]
    # per-type cells (hour rolled to 'ALL') == direct sketch by type
    by_type = sketches.hll_registers(df, ["event_type"], "user_id", p=4)
    for r in by_type.collect():
        assert rows[(r["event_type"], "ALL", r["bucket"])] == r["rho"]
    # grand total == hll_merge over the per-type tables (merge law)
    merged = sketches.hll_merge(by_type.drop("event_type"), [])
    for r in merged.collect():
        assert rows[("ALL", "ALL", r["bucket"])] == r["rho"]
    # estimate layer sanity on the grand total: 40 distinct users
    est = sketches.hll_estimate(merged, [], p=4).collect()[0]["estimate"]
    assert 25 <= est <= 55


def test_hll_cube_null_dim_distinct_from_rollup(spark):
    """A GENUINE NULL dim value must keep its NULL label — distinct from
    the rollup's 'ALL' cell (ADVICE r9: the old NULL-coalesce form made
    them collide, double-counting for label-keyed consumers). The NULL
    cell's registers equal sketching the NULL rows alone; the 'ALL'
    cell covers ALL rows (NULL ones included)."""
    from sakura_spark.functions import sketches

    rows = [(None if i % 3 == 0 else f"t{i % 2}", i % 20) for i in range(200)]
    df = spark.createDataFrame(rows, "event_type string, user_id long")
    cube = sketches.hll_cube(df, ["event_type"], "user_id", p=4)
    got = {(r["event_type"], r["bucket"]): r["rho"] for r in cube.collect()}

    labels = {k[0] for k in got}
    assert None in labels and "ALL" in labels

    null_only = sketches.hll_registers(
        df.filter(F.col("event_type").isNull()), [], "user_id", p=4
    )
    for r in null_only.collect():
        assert got[(None, r["bucket"])] == r["rho"]
    grand = sketches.hll_registers(df, [], "user_id", p=4)
    for r in grand.collect():
        assert got[("ALL", r["bucket"])] == r["rho"]
