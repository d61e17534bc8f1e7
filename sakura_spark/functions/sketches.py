"""Mergeable sketch summaries: HyperLogLog registers, count-min sketch,
and KMV (k-minimum-values) bottom-k sketches.

The reference's aggregate surface is exact (lib/algebra.ml folds); at
100 TB a curation pipeline also needs CONSTANT-SIZE mergeable summaries —
distinct-URL counts per source without a distinct shuffle of the full key
set, heavy-hitter term counts without materializing the long tail, and
corpus-overlap estimates without joining two corpora. Each sketch here is
a tiny table of integer registers produced by one map-side-combinable
aggregation, so partial sketches combine on the map side and only
register-sized state crosses the shuffle; merging two corpora's sketches
is the same aggregate over the union of their register tables.

Design rules (repo conventions):

- The ORACLE-CHECKED surface is integer-exact: register tables (bucket ->
  max rho, (row, bucket) -> count, rank -> hash value) and the count-min
  point estimates (a MIN of integer counters). The float estimate layers
  (harmonic-mean HLL cardinality, KMV cardinality/Jaccard) are separate
  functions pytest-checked against exact counts with the sketches'
  published error bounds (Flajolet et al. 2007; Cormode & Muthukrishnan
  2005; Bar-Yossef et al. 2002).
- The hash is engine-portable and deterministic: 60-bit words cut from
  sha256 hex (``conv(substr(h, ..), 16, 10)`` in Spark == ``('0x' ||
  substr(h, ..))::BIGINT`` in DuckDB — same parity trick as
  sakura_spark/hashing.py), so every register is reproducible by the SQL
  oracle and across engines/runs. No Python in any plan.

Scale shape (100 TB):
- hll_registers: groupBy (group, bucket) MAX — at most groups x 2^p rows
  survive the combiner per partition; the shuffle moves registers, not
  values.
- cms_sketch: groupBy (row, bucket) SUM — depth x width rows total; the
  sketch itself is broadcastable for lookups.
- kmv_sketch: per-group bottom-k over DISTINCT hashes; the window sees
  the distinct set, and only k rows per group survive.
- Register tables from disjoint corpora merge with the same aggregate
  (max / sum / bottom-k) — tested as the mergeability law in
  tests/test_sketches.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# 60-bit hash words (15 hex chars) — inside a signed long, same cut as
# hashing.py's relation_hash words.
WORD_BITS = 60
WORD_SPAN = 1 << WORD_BITS
_FS = "\x1f"


def hash_word(value: Column, salt: str, word: int = 0) -> Column:
    """A deterministic 60-bit integer hash word of ``value``.

    ``word`` selects a disjoint 15-hex-char slice of the sha256 digest
    (0..3), so one digest yields four independent words. The salt
    namespaces sketches so e.g. HLL buckets and CMS rows never share a
    hash function.
    """
    if not 0 <= word <= 3:
        raise ValueError(f"word must be 0..3, got {word}")
    digest = F.sha2(F.concat_ws(_FS, F.lit(salt), value.cast("string")), 256)
    return F.conv(F.substring(digest, 1 + 15 * word, 15), 16, 10).cast("long")


def _rho(v: Column) -> Column:
    """Position of the leftmost 1-bit of a 60-bit word (1-indexed), i.e.
    leading zeros + 1; 0 maps to WORD_BITS + 1 by HLL convention.

    Exact integer arithmetic in both engines: ``length(bin(v))`` is
    floor(log2 v) + 1 with no float in sight.
    """
    return F.when(v == 0, F.lit(WORD_BITS + 1)).otherwise(
        F.lit(WORD_BITS + 1) - F.length(F.bin(v))
    )


def hll_exprs(value: Column, p: int = 5, salt: str = "hll") -> tuple[Column, Column]:
    """The (bucket, rho) column pair for one value — the per-row HLL
    contribution before the MAX aggregation. Shared by the batch
    :func:`hll_registers` and the streaming windowed variant
    (sakura_spark/streaming/events.py) so both produce bit-identical
    registers."""
    if not 1 <= p <= 12:
        raise ValueError(f"p must be 1..12, got {p}")
    bucket = hash_word(value, salt, word=0) % (1 << p)
    rho = _rho(hash_word(value, salt, word=1))
    return bucket, rho


def hll_registers(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    p: int = 5,
    salt: str = "hll",
) -> DataFrame:
    """(group..., bucket, rho): HyperLogLog registers per group — for each
    of the 2^p buckets the maximum leading-zero rank observed among the
    hashed values routed to it (Flajolet et al. 2007). Integer-exact,
    oracle-checked; empty buckets are simply absent (the estimate layer
    accounts for them).

    Plan: one projection + one groupBy MAX on (group, bucket) — at most
    groups x 2^p rows leave each partition after the map-side combine,
    regardless of input size. Registers from disjoint inputs merge with
    the same MAX."""
    bucket, rho = hll_exprs(F.col(value_col), p=p, salt=salt)
    return (
        df.select(*group_cols, bucket.alias("bucket"), rho.alias("rho"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_merge(parts: DataFrame, group_cols: list[str]) -> DataFrame:
    """Merge HLL register tables (any number, stacked by union) into one:
    register-wise MAX. THE property that makes the family usable as a
    partial aggregate across 1000 executors / daily partitions — each
    shard sketches independently, merge cost is register-sized, and the
    merged table is BIT-IDENTICAL to sketching the whole input at once
    (MAX is associative/commutative/idempotent, so overlapping inputs
    are also fine). Driver-oracle-checked by `sketch_merge_law`."""
    return parts.groupBy(*group_cols, "bucket").agg(F.max("rho").alias("rho"))


# Bias-correction constants alpha_m for m >= 16 (Flajolet et al. 2007 §4).
def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_estimate(
    registers: DataFrame, group_cols: list[str], p: int = 5
) -> DataFrame:
    """(group..., estimate): harmonic-mean cardinality estimate from
    :func:`hll_registers` output, with the small-range linear-counting
    correction. Float layer — pytest-checked against exact distinct
    counts within the published ~1.04/sqrt(m) error, not oracle-hashed."""
    m = 1 << p
    agg = registers.groupBy(*group_cols).agg(
        F.sum(F.pow(F.lit(2.0), -F.col("rho"))).alias("present_sum"),
        F.count("bucket").alias("present"),
    )
    zeros = F.lit(m) - F.col("present")
    raw = F.lit(_alpha(m) * m * m) / (F.col("present_sum") + zeros)
    # Linear counting when the raw estimate is small and empty buckets exist.
    corrected = F.when(
        (raw <= 2.5 * m) & (zeros > 0), F.lit(float(m)) * F.log(F.lit(float(m)) / zeros)
    ).otherwise(raw)
    return agg.select(*group_cols, corrected.alias("estimate"))


def cms_exprs(
    value: Column, depth: int = 4, width: int = 256, salt: str = "cms"
) -> Column:
    """The array of (row, bucket) probe structs for one value — the
    per-row CMS contribution before the SUM aggregation. Shared by the
    batch :func:`cms_sketch` and the streaming windowed variant
    (sakura_spark/streaming/events.py) so both produce identical
    counters."""
    if depth < 1 or width < 1:
        raise ValueError("depth and width must be positive")
    return F.array(
        *[
            F.struct(
                F.lit(i).alias("row"),
                (hash_word(value, f"{salt}{i}", word=0) % width).alias("bucket"),
            )
            for i in range(depth)
        ]
    )


def cms_sketch(
    df: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 256,
    weight_col: str | None = None,
    salt: str = "cms",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """(group..., row, bucket, cnt): a count-min sketch of the value
    column (Cormode & Muthukrishnan 2005) — ``depth`` independent hash
    rows of ``width`` counters; each value increments one counter per
    row (by the optional integer weight). With ``group_cols`` one
    independent sketch per group (e.g. per event-time hour). Integer-
    exact, oracle-checked.

    Plan: each input row expands to exactly ``depth`` (row, bucket)
    pairs; the groupBy SUM combines map-side, so at most groups x depth
    x width counters leave each partition. Sketches of disjoint inputs
    merge by summing counters."""
    group_cols = list(group_cols or [])
    v = F.col(value_col)
    w = F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    rows = cms_exprs(v, depth=depth, width=width, salt=salt)
    return (
        df.select(*group_cols, F.explode(rows).alias("rb"), w.alias("w"))
        .groupBy(
            *group_cols,
            F.col("rb.row").alias("row"),
            F.col("rb.bucket").alias("bucket"),
        )
        .agg(F.sum("w").alias("cnt"))
    )


def cms_merge(parts: DataFrame, group_cols: list[str] | None = None) -> DataFrame:
    """Merge CMS counter tables (stacked by union) into one: counter-wise
    SUM. Exact multiset-union semantics — counts from disjoint shards
    add; the merged table is bit-identical to sketching the concatenated
    input. The partial-aggregate twin of :func:`hll_merge`; driver-
    oracle-checked by `sketch_merge_law`."""
    return parts.groupBy(*(group_cols or []), "row", "bucket").agg(
        F.sum("cnt").alias("cnt")
    )


def cms_lookup(
    sketch: DataFrame,
    items: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 256,
    salt: str = "cms",
) -> DataFrame:
    """(item, est): count-min point estimates for each item — the MIN
    over the item's ``depth`` counters. Never undercounts; overcounts by
    at most eps * total with probability 1 - delta (the classic CMS
    guarantee, asserted in tests). Integer-exact, oracle-checked.

    Plan: items expand to (row, bucket) probes and join the depth x
    width-sized sketch — the sketch side is broadcast, so lookups are
    map-only plus one item-keyed MIN."""
    v = F.col(item_col)
    probes = F.array(
        *[
            F.struct(
                F.lit(i).alias("row"),
                (hash_word(v, f"{salt}{i}", word=0) % width).alias("bucket"),
            )
            for i in range(depth)
        ]
    )
    probed = items.select(v.alias("item"), F.explode(probes).alias("rb")).select(
        "item", F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket")
    )
    return (
        probed.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy("item")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )


def dyadic_sketch(
    df: DataFrame,
    value_col: str,
    levels: int = 20,
    depth: int = 3,
    width: int = 128,
    group_cols: list[str] | None = None,
    salt: str = "qd",
    rebalance: bool = True,
) -> DataFrame:
    """(group..., level, row, bucket, cnt): a dyadic count-min structure
    for rank/quantile queries over a non-negative integer domain
    < 2^levels (Cormode & Muthukrishnan 2005 §4, range queries): one CMS
    per level l counting the dyadic prefixes ``value >> l``. rank(x) is
    then the sum of at most ``levels`` CMS point estimates (one per set
    bit of x), and quantiles are a binary search over ranks — see
    :func:`dyadic_quantiles`. Integer-exact, oracle-checked; sketches of
    disjoint inputs merge by summing counters, which is what makes
    percentile dashboards mergeable across executors/days without
    resorting the data.

    Plan: each input row expands to levels x depth probe structs (the
    amplification IS the structure's cost — practical systems sketch a
    sample when that matters); the groupBy SUM combines map-side, so at
    most groups x levels x depth x width counters leave a partition."""
    if not 1 <= levels <= 62:
        raise ValueError(f"levels must be 1..62, got {levels}")
    group_cols = list(group_cols or [])
    # Two explodes of PLAIN INT arrays, then ONE hash on the already-
    # exploded rows — not a levels*depth array of struct expressions: that
    # form is a single oversized projection that breaks whole-stage
    # codegen (0 codegen spans, fully interpreted, measured 4x slower at
    # sf0.1) and would hash inside an array constructor besides. Here
    # every stage is a small codegen-able expression and the sha256 runs
    # exactly once per (value, level, row) probe.
    v = F.col(value_col).cast("long")
    # The explode amplifies each input row levels*depth-fold, so the probe
    # work must be BALANCED across cores, not left on the scan's layout: a
    # single-row-group parquet file reads as one non-empty task no matter
    # how many splits the planner claims (split COUNT cannot detect this),
    # serializing the whole hash pipeline (measured 8 s -> 1 s at sf0.1).
    # The rebalance shuffles only the narrow (group, value) projection —
    # levels x depth times smaller than the probe stage it feeds — so its
    # cost is a bounded fraction at any scale; pass rebalance=False when
    # the input layout is known well-balanced (many row groups/splits).
    narrow = df.select(*group_cols, v.alias("__dy_x"))
    if rebalance:
        narrow = narrow.repartition(
            df.sparkSession.sparkContext.defaultParallelism
        )
    return (
        dyadic_probe_rows(
            narrow, "__dy_x", levels, depth, width, salt=salt,
            keep_cols=group_cols,
        )
        .groupBy(*group_cols, "level", "row", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def dyadic_probe_rows(
    df: DataFrame,
    value_col: str,
    levels: int,
    depth: int,
    width: int,
    salt: str = "qd",
    keep_cols: list[str] | tuple[str, ...] = (),
) -> DataFrame:
    """The exploded (keep..., level, row, bucket) probe rows of the
    dyadic structure BEFORE aggregation — shared by the batch
    :func:`dyadic_sketch` and the streaming windowed variant
    (sakura_spark/streaming/events.py) so both produce identical
    counters, the cms_exprs convention. Two explodes of plain INT
    arrays, then ONE hash on the already-exploded rows (see
    dyadic_sketch's codegen note)."""
    keep_cols = list(keep_cols)
    v = F.col(value_col).cast("long")
    lvl_arr = F.array(*[F.lit(l) for l in range(levels)])
    row_arr = F.array(*[F.lit(i) for i in range(depth)])
    salt_col = F.concat(
        F.lit(salt),
        F.col("level").cast("string"),
        F.lit("_"),
        F.col("row").cast("string"),
    )
    prefix = F.expr("shiftright(__dy_px, level)")
    digest = F.sha2(
        F.concat_ws(_FS, salt_col, prefix.cast("string")), 256
    )
    bucket = F.conv(F.substring(digest, 1, 15), 16, 10).cast("long") % width
    return (
        df.select(*keep_cols, v.alias("__dy_px"))
        .select(*keep_cols, "__dy_px", F.explode(lvl_arr).alias("level"))
        .select("*", F.explode(row_arr).alias("row"))
        .select(*keep_cols, "level", "row", bucket.alias("bucket"))
    )


def _py_bucket(prefix: int, salt: str, width: int) -> int:
    """Driver-side replica of the probe-bucket hash for lookups."""
    import hashlib as _hl

    digest = _hl.sha256(f"{salt}\x1f{prefix}".encode()).hexdigest()
    return int(digest[:15], 16) % width


def dyadic_rank(
    counters: dict[tuple[int, int, int], int],
    x: int,
    levels: int,
    depth: int,
    width: int,
    salt: str = "qd",
) -> int:
    """Estimated rank(x) = |{v : v < x}| from collected dyadic counters
    {(level, row, bucket): cnt}: decompose [0, x) into one dyadic cell
    per set bit of x and sum the cells' CMS estimates (MIN over rows).
    Never undercounts (CMS one-sided error per cell)."""
    rank = 0
    for l in range(levels):
        if (x >> l) & 1:
            prefix = 2 * (x >> (l + 1))
            rank += min(
                counters.get((l, i, _py_bucket(prefix, f"{salt}{l}_{i}", width)), 0)
                for i in range(depth)
            )
    return rank


def dyadic_quantiles(
    sketch: DataFrame,
    phis: list[float],
    levels: int = 20,
    depth: int = 3,
    width: int = 128,
    salt: str = "qd",
) -> dict[float, int]:
    """{phi: value}: quantile estimates from a single-group
    :func:`dyadic_sketch` — binary search for the smallest x whose
    estimated rank reaches phi * total. The ONLY driver transfer is the
    counter table itself (bounded at levels x depth x width rows,
    codebook-class); the search runs on that dict. Float-free output
    (domain values are integers); accuracy pytest-checked against exact
    percentiles."""
    rows = sketch.select("level", "row", "bucket", "cnt").collect()
    counters = {(r["level"], r["row"], r["bucket"]): r["cnt"] for r in rows}
    total = sum(
        cnt for (l, i, _b), cnt in counters.items() if l == 0 and i == 0
    )
    out: dict[float, int] = {}
    for phi in phis:
        target = max(1, int(phi * total))
        lo, hi = 0, 1 << levels
        while lo < hi:
            mid = (lo + hi) // 2
            if dyadic_rank(counters, mid, levels, depth, width, salt) >= target:
                hi = mid
            else:
                lo = mid + 1
        # lo is the smallest x with rank(x) >= target; the value itself
        # is lo - 1's cell, report lo - 1 clamped at 0 (rank counts
        # strictly-less values).
        out[phi] = max(0, lo - 1)
    return out


def _bottom_k(
    distinct: DataFrame, group_cols: list[str], k: int, salt_buckets: int
) -> DataFrame:
    """Bottom-k of a distinct (group..., hval) table WITHOUT an unbounded
    per-group window: pre-reduce bottom-k per (group, pmod(hval, P)) salt
    bucket — each bucket's sort sees ~1/P of the group's distinct set —
    then bottom-k of the union, whose input is at most P*k rows per
    group. Bit-identical to a single global window by the mergeability
    law (driver-proven as `sketch_merge_law`): every one of the k
    globally-smallest hashes lives in some bucket and is among that
    bucket's k smallest, so the union of per-bucket bottom-k contains
    the global bottom-k."""
    pre_w = Window.partitionBy(*group_cols, "__sb").orderBy(F.col("hval").asc())
    pre = (
        distinct.withColumn("__sb", F.pmod(F.col("hval"), F.lit(salt_buckets)))
        .withColumn("__r", F.row_number().over(pre_w))
        .filter(F.col("__r") <= k)
        .select(*group_cols, "hval")
    )
    w = Window.partitionBy(*group_cols).orderBy(F.col("hval").asc())
    return (
        pre.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(*group_cols, "rank", "hval")
    )


def kmv_sketch(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 64,
    salt: str = "kmv",
    salt_buckets: int = 64,
) -> DataFrame:
    """(group..., rank, hval): the k smallest DISTINCT 60-bit hash values
    per group (Bar-Yossef et al. 2002) — a bottom-k signature supporting
    cardinality, union (bottom-k of the union of sketches) and Jaccard /
    intersection estimates between groups. Integer-exact, oracle-checked.

    Plan: project to (group, hval), distinct (map-side-combined shuffle
    hashed on BOTH columns, so no group skew), then the two-level
    bottom-k of :func:`_bottom_k` — the per-group window that used to
    sort a group's ENTIRE distinct set on one reducer now sees at most
    ``salt_buckets * k`` pre-reduced rows; the pre-reduce windows each
    sort ~1/salt_buckets of a group. Raise ``salt_buckets`` for corpora
    whose hottest group has billions of distinct values."""
    if k < 1:
        raise ValueError("k must be positive")
    hval = hash_word(F.col(value_col), salt, word=0)
    distinct = df.select(*group_cols, hval.alias("hval")).distinct()
    return _bottom_k(distinct, group_cols, k, salt_buckets)


def kmv_estimate(sketch: DataFrame, group_cols: list[str], k: int = 64) -> DataFrame:
    """(group..., n_vals, estimate): KMV cardinality estimate per group —
    ``(k - 1) * SPAN / h_k`` when the sketch is full (h_k = k-th smallest
    hash), else the exact distinct count n_vals. Float layer —
    pytest-checked within the published ~1/sqrt(k-2) error."""
    agg = sketch.groupBy(*group_cols).agg(
        F.count("hval").alias("n_vals"), F.max("hval").alias("h_max")
    )
    est = F.when(
        F.col("n_vals") < k, F.col("n_vals").cast("double")
    ).otherwise(F.lit(float(k - 1)) * F.lit(float(WORD_SPAN)) / F.col("h_max"))
    return agg.select(*group_cols, "n_vals", est.alias("estimate"))


def kmv_merge(
    parts: DataFrame, group_cols: list[str], k: int = 64, salt_buckets: int = 64
) -> DataFrame:
    """Merge KMV bottom-k sketches (stacked by union) into one: DISTINCT
    hash values, re-ranked, bottom k. Correct because bottom-k(A u B) is
    a subset of bottom-k(A) u bottom-k(B) whenever each part kept >= k
    values — so the merged sketch is bit-identical to sketching the whole
    input (distinct absorbs values present in several parts). Driver-
    oracle-checked by `sketch_merge_law`. Uses the same salt-bucket
    two-level bottom-k as :func:`kmv_sketch`, so merging millions of
    part-sketches of one group never sorts them on a single reducer."""
    if k < 1:
        raise ValueError("k must be positive")
    distinct = parts.select(*group_cols, "hval").distinct()
    return _bottom_k(distinct, group_cols, k, salt_buckets)


def kmv_pairwise_overlap(
    sketch: DataFrame, group_col: str, k: int = 64, max_groups: int = 1_000
) -> DataFrame:
    """(group_a, group_b, shared, union_k): for every unordered pair of
    groups in a :func:`kmv_sketch`, the bottom-k union sketch's size and
    how many of those hashes occur in BOTH groups — the integer-exact
    inputs to the KMV set-resemblance estimate (jaccard ~ shared /
    union_k, and |A u B| ~ kmv_estimate over the union rows). The
    all-pairs form of :func:`kmv_jaccard`. Oracle-checked surface.

    Plan: everything downstream of the sketch is sketch-sized — the pair
    list is |groups|^2 rows and each pair carries at most 2k register
    rows, so the corpus is touched exactly once (by kmv_sketch) no
    matter how many group pairs are compared. That is the point: corpus
    overlap questions (shared users across event types, shared vocab
    across sources, contamination across corpora) answered without ever
    joining the corpora themselves.

    ``max_groups`` is a hard guard (the `er.blocked_name_pairs` /
    `dedup.jaccard_pairs` convention): the pair list is |groups|^2, which
    is fine for CATEGORY-like group columns (event types, sources) but a
    caller passing a high-cardinality key (user_id) would enumerate
    billions^2 pairs. Counting the distinct group list is one eager
    sketch-sized job at call time — cheap because the input is already a
    sketch, and the alternative (lazy detonation inside a shuffle) is
    unrecoverable."""
    groups = sketch.select(F.col(group_col).alias("g")).distinct()
    n_groups = groups.count()
    if n_groups > max_groups:
        raise ValueError(
            f"kmv_pairwise_overlap: {n_groups} distinct groups in "
            f"{group_col!r} (> max_groups={max_groups}) — the all-pairs "
            "comparison is quadratic in the group count; pass a "
            "category-like group column or raise max_groups explicitly"
        )
    pairs = (
        groups.select(F.col("g").alias("ga"))
        .join(groups.select(F.col("g").alias("gb")))
        .filter(F.col("ga") < F.col("gb"))
    )
    sk = sketch.select(F.col(group_col).alias("g"), "hval")
    rows_a = pairs.join(sk, sk.g == pairs.ga).select(
        "ga", "gb", "hval", F.lit(1).alias("in_a"), F.lit(0).alias("in_b")
    )
    rows_b = pairs.join(sk, sk.g == pairs.gb).select(
        "ga", "gb", "hval", F.lit(0).alias("in_a"), F.lit(1).alias("in_b")
    )
    merged = (
        rows_a.union(rows_b)
        .groupBy("ga", "gb", "hval")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    w = Window.partitionBy("ga", "gb").orderBy(F.col("hval").asc())
    bottom = merged.withColumn("__rk", F.row_number().over(w)).filter(
        F.col("__rk") <= k
    )
    return bottom.groupBy("ga", "gb").agg(
        F.sum(
            F.when((F.col("in_a") == 1) & (F.col("in_b") == 1), 1).otherwise(0)
        ).cast("long").alias("shared"),
        F.count("*").cast("long").alias("union_k"),
    ).select(
        F.col("ga").alias("group_a"),
        F.col("gb").alias("group_b"),
        "shared",
        "union_k",
    )


def kmv_jaccard(
    sketch_a: DataFrame, sketch_b: DataFrame, k: int = 64
) -> DataFrame:
    """(shared, union_k, jaccard): Jaccard similarity estimate between two
    single-group KMV sketches — the fraction of the union's bottom-k
    hashes present in both sketches (the standard KMV set-resemblance
    estimator). Float layer — pytest-checked on planted overlaps.

    Plan: both inputs are k-sized register tables; everything here is
    sketch-sized, nothing touches the original corpora."""
    a = sketch_a.select(F.col("hval").alias("hval"))
    b = sketch_b.select(F.col("hval").alias("hval"))
    union_bottom = (
        a.union(b)
        .distinct()
        .orderBy(F.col("hval").asc())
        .limit(k)
        .withColumn("in_a", F.lit(None).cast("int"))
        .drop("in_a")
    )
    both = a.intersect(b)
    shared = union_bottom.join(both, "hval", "semi").agg(
        F.count("*").alias("shared")
    )
    total = union_bottom.agg(F.count("*").alias("union_k"))
    return shared.crossJoin(total).select(
        "shared",
        "union_k",
        (F.col("shared") / F.col("union_k")).alias("jaccard"),
    )


# --- Bloom filter ------------------------------------------------------------


def bloom_exprs(
    value: Column, m: int = 8192, k: int = 3, salt: str = "bloom"
) -> list[Column]:
    """The ``k`` bit positions (each < ``m``) one value sets in a Bloom
    filter (Bloom 1970) — the per-row contribution before the distinct
    aggregation. Independent hash functions come from salted sha256
    words, so every position is engine-portable and reproducible by the
    SQL oracle (same hash contract as the other sketches here)."""
    if m < 1 or k < 1:
        raise ValueError("m and k must be positive")
    return [hash_word(value, f"{salt}{i}", word=0) % m for i in range(k)]


def bloom_sketch(
    df: DataFrame,
    value_col: str,
    m: int = 8192,
    k: int = 3,
    salt: str = "bloom",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """(group..., bit): the SET bit positions of a Bloom filter over the
    value column — the sparse register table IS the sketch. Integer-exact,
    oracle-checked. Sketches of disjoint inputs merge by the same
    distinct-union (bitwise OR in the dense view), the mergeability law
    asserted in tests/test_sketches.py.

    Plan: each row expands to exactly ``k`` bit rows; the distinct
    combines map-side, so at most groups x m rows leave any partition
    regardless of input size. The dense filter is m BITS (kilobytes for
    m = 64k), which is what makes it broadcastable where the key set
    itself is not — the entire point at 100 TB."""
    group_cols = list(group_cols or [])
    bits = F.array(*bloom_exprs(F.col(value_col), m=m, k=k, salt=salt))
    return (
        df.select(*group_cols, F.explode(bits).alias("bit"))
        .distinct()
    )


def bloom_member_expr(
    value: Column, set_bits: set[int], m: int = 8192, k: int = 3, salt: str = "bloom"
) -> Column:
    """Boolean Column: does ``value`` pass the Bloom filter given the
    driver-side set-bit collection (from :func:`bloom_sketch`)? All ``k``
    probe positions must be set. No false negatives ever; false positive
    probability ~ fill_ratio^k. The dense m-element boolean literal is
    the documented kilobyte-class driver transfer (same class as the
    IVF/PQ codebooks) and ships to executors as a plan literal — a
    hand-rolled runtime filter the way Spark's own
    InSubqueryExec/bloom-join pushdown would at cluster scale.

    The dense form is an array<long> literal packing 60 bits per word
    (the package's WORD_BITS convention keeps every value positive in a
    signed long), probed with O(1) element_at + bitwiseAND. The two
    rejected representations both hid per-row costs that SCALE WITH m:
    a '0'/'1' string literal probed via substr pays UTF8String's O(pos)
    code-point scan per probe (measured 0.69 s vs 0.22 s packed for 45k
    probes at m=64k), and an array<boolean> literal was slower still
    (1.49 s) besides serializing boxed at ~32 bytes/element. Packed
    words are 8 bytes per 60 bits — ~9 KB in the plan at m=64k — and
    probe cost is flat in m."""
    nwords = -(-m // WORD_BITS)
    words = [0] * nwords
    for b in set_bits:
        words[int(b) // WORD_BITS] |= 1 << (int(b) % WORD_BITS)
    wlit = F.lit(words)
    masks = F.lit([1 << i for i in range(WORD_BITS)])
    cond = None
    for pos in bloom_exprs(value, m=m, k=k, salt=salt):
        word = F.element_at(wlit, (F.floor(pos / WORD_BITS) + 1).cast("int"))
        mask = F.element_at(masks, ((pos % WORD_BITS) + 1).cast("int"))
        hit = word.bitwiseAND(mask) != 0
        cond = hit if cond is None else (cond & hit)
    return cond


def bloom_filtered_semijoin(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    m: int = 65536,
    k: int = 3,
    salt: str = "bloom",
) -> DataFrame:
    """EXACT semi-join (left rows with a match in right), computed as a
    Bloom-pruned two-phase plan whose result provably equals the plain
    semi-join: a Bloom filter of the right key set prunes left rows
    map-side (no false negatives, so no match is ever lost), and the
    surviving minority joins exactly (false positives die here). The
    oracle for this operator is therefore plain ANSI `IN (SELECT ...)`.

    Scale design: this is the runtime-filter / sideways-information-
    passing pattern (Spark's own spark.sql.optimizer.runtime.bloomFilter
    does it inside the engine; this is the explicit, engine-portable
    form). At 100 TB the win is that the m-BIT filter (kilobytes)
    broadcasts where the right key set (gigabytes) cannot, and the left
    corpus never shuffles rows that cannot match — with a selective
    right side the exchange shrinks by the true match rate. Two jobs:
    the right-side distinct (register-sized shuffle) and the pruned
    exact join.

    .. note:: CALL-TIME SPARK JOB — unlike most builder functions, this
       one is not fully lazy: the Bloom filter is collected EAGERLY when
       the function is called (the bits must become plan literals before
       the returned frame's plan can exist), so every call pays the
       right-side scan even if the result is never executed. Build once
       and reuse the returned frame rather than re-calling in a loop;
       the same applies to :func:`heavy_hitters`' sketch phase."""
    sketch = bloom_sketch(right.select(right_col), right_col, m=m, k=k, salt=salt)
    set_bits = {r["bit"] for r in sketch.collect()}
    member = bloom_member_expr(F.col(left_col), set_bits, m=m, k=k, salt=salt)
    pruned = left.filter(member)
    keys = right.select(F.col(right_col).alias(left_col)).distinct()
    return pruned.join(keys, left_col, "semi")


# --- CMS-pruned exact heavy hitters -----------------------------------------


def heavy_hitters(
    df: DataFrame,
    value_col: str,
    min_count: int,
    depth: int = 4,
    width: int = 8192,
    salt: str = "cms",
) -> DataFrame:
    """(item, cnt): EXACT counts of every value occurring at least
    ``min_count`` times, computed with a count-min prefilter whose
    result provably equals the plain GROUP BY ... HAVING: CMS estimates
    never undercount, so filtering rows to ``est >= min_count`` map-side
    keeps every true heavy hitter; the exact count over survivors then
    kills the (eps * N)-bounded false positives. The oracle for this
    operator is therefore plain ANSI GROUP BY / HAVING.

    Scale design: the standard two-pass heavy-hitter plan (Cormode &
    Muthukrishnan 2005 §3.1 applications). Pass 1 builds the sketch —
    the only full-cardinality-free aggregation: at most depth x width
    counters leave any partition, vs a full GROUP BY whose shuffle
    carries the entire long-tail key set (for web-corpus n-grams,
    billions of keys that are mostly singletons). Pass 2 re-hashes each
    row (depth sha256s), reads its counters from the depth dense
    width-arrays shipped as plan literals (codebook-class driver
    transfer), and drops the long tail BEFORE the exchange — the exact
    count's shuffle carries only rows of candidate keys, bounded by
    N/min_count true hitters plus the eps-bounded false-positive mass.
    Fused, map-only prefilter; no distinct, no window, no Python.

    The prefilter tests ``min_i cnt_i >= min_count``, which is
    ``AND_i (cnt_i >= min_count)`` — a BIT per (row, bucket), not a
    count. Each CMS row's pass/fail bits pack into 60-bit long words
    probed with O(1) element_at + bitwiseAND (the bloom_member_expr
    representation): probing literal COUNT arrays instead paid the
    boxed-array interpreted-eval tax per probe (measured 16.5 s -> 2.2 s
    at sf0.1 for 260k x 4 probes when the count tables were the
    width-sized array<long> literals).

    Hash family (round-13 optimization): the prefilter's correctness
    does NOT depend on the hash — ANY deterministic bucket function
    gives the never-undercount property, and the exact second pass
    kills the false positives regardless — so unlike the oracle-exact
    cms_sketch entries (whose DuckDB twin must recompute sha256), this
    operator hashes with JVM-codegen xxhash64 on both passes: 2*depth
    xxhash64 evaluations per row instead of 2*depth sha256+hex-conv
    (measured 4.8 s -> 2.9 s at sf0.1 on the 3-gram entry; the output
    is provably the plain GROUP BY/HAVING either way, which is the
    oracle)."""
    if min_count < 1:
        raise ValueError("min_count must be positive")

    def bucket_of(col: Column, i: int) -> Column:
        return F.pmod(F.xxhash64(F.lit(f"{salt}{i}"), col), F.lit(width))

    values = df.select(F.col(value_col).alias("item"))
    probe_rows = F.array(
        *[
            F.struct(
                F.lit(i).alias("row"),
                bucket_of(F.col("item"), i).alias("bucket"),
            )
            for i in range(depth)
        ]
    )
    sketch = (
        values.select(F.explode(probe_rows).alias("rb"))
        .groupBy(F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    nwords = -(-width // WORD_BITS)
    passes: list[list[int]] = [[0] * nwords for _ in range(depth)]
    for r in sketch.collect():
        if r["cnt"] >= min_count:
            b = r["bucket"]
            passes[r["row"]][b // WORD_BITS] |= 1 << (b % WORD_BITS)
    masks = F.lit([1 << i for i in range(WORD_BITS)])
    cond = None
    for i in range(depth):
        pos = bucket_of(F.col("item"), i)
        word = F.element_at(
            F.lit(passes[i]), (F.floor(pos / WORD_BITS) + 1).cast("int")
        )
        hit = word.bitwiseAND(
            F.element_at(masks, ((pos % WORD_BITS) + 1).cast("int"))
        ) != 0
        cond = hit if cond is None else (cond & hit)
    return (
        values.filter(cond)
        .groupBy("item")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .filter(F.col("cnt") >= min_count)
    )


def hll_cumulative(
    registers: DataFrame,
    order_col: str,
    p: int = 5,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """(group..., order, bucket, rho): running union of HLL register
    tables along an ordering — for each key of ``order_col`` (hour, day,
    shard) the COMPLETE registers of the union of all inputs up to and
    including it. Feeding one order-key's rows to :func:`hll_estimate`
    yields the "distinct users to date" curve every dashboard wants,
    without ever re-scanning history — the mergeability law applied
    along time. Integer-exact, oracle-checked.

    A bare running-max window over the sparse register table is NOT
    enough: a bucket hit at hour 1 but not hour 2 would have no hour-2
    row to carry its rho, so hour 2's registers would silently lose it
    (caught by the prefix-union differential in tests/test_sketches.py).
    The registers are therefore densified first over the full
    (order, bucket) grid — an EXPLODE of the literal 0..2^p-1 bucket
    list per order key, not a cross join — then the per-bucket running
    max forward-fills, and never-yet-hit buckets (null) drop out, which
    is exactly the absent-register convention hll_estimate expects.

    Plan: the corpus is touched once (by hll_registers); everything here
    is sketch-sized — periods x 2^p grid rows per group, one equi-join,
    one window. Lint-clean: no cartesian, no nested-loop join."""
    group_cols = list(group_cols or [])
    m = 1 << p
    grid = (
        registers.select(*group_cols, order_col)
        .distinct()
        .select(
            *group_cols,
            order_col,
            F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("bucket"),
        )
    )
    dense = grid.join(
        registers.withColumnRenamed("rho", "__rho"),
        [*group_cols, order_col, "bucket"],
        "left",
    )
    w = (
        Window.partitionBy(*group_cols, "bucket")
        .orderBy(F.col(order_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        dense.select(
            *group_cols,
            order_col,
            "bucket",
            F.max("__rho").over(w).alias("rho"),
        )
        .filter(F.col("rho").isNotNull())
    )


def hll_cube(
    df: DataFrame,
    dims: list[str],
    value_col: str,
    p: int = 5,
    salt: str = "hll",
) -> DataFrame:
    """HLL registers for EVERY cube cell over ``dims`` — all 2^|dims|
    grouping combinations (per-dim, per-pair, ..., grand total) sketched
    in ONE corpus pass via GROUPING SETS, with the register bucket always
    an exact grouping key. The OLAP drill-down primitive at 100 TB:
    "distinct users by (surface), by (hour), by (surface, hour), and
    overall" costs one map-side-combined MAX whose shuffle carries at
    most cells x 2^p register rows — the corpus is never re-scanned per
    cell, and every cell's registers merge downstream with hll_merge
    exactly like any other HLL table (same MAX algebra, driver-proven by
    sketch_merge_law). Rolled-up dims surface as 'ALL' (the
    agg_grouping_sets convention) — via F.grouping(), not a NULL
    coalesce, so a GENUINE NULL dim value keeps its NULL label and never
    collides with the rollup cell (ADVICE r9: the coalesce form
    double-counted for label-keyed consumers). A literal 'ALL' string
    value still collides with the rollup label; dims carrying that
    sentinel must be re-labeled upstream."""
    bucket, rho = hll_exprs(F.col(value_col), p=p, salt=salt)
    sel = df.select(
        *[F.col(d).cast("string").alias(d) for d in dims],
        bucket.alias("bucket"),
        rho.alias("rho"),
    )
    subsets = [[]]
    for d in dims:
        subsets += [s + [d] for s in subsets]
    sets = [s + ["bucket"] for s in subsets]
    out = sel.groupingSets(sets, *dims, "bucket").agg(
        F.max("rho").alias("rho"),
        *[F.grouping(d).alias(f"__g_{d}") for d in dims],
    )
    return out.select(
        *[
            F.when(F.col(f"__g_{d}") == 1, F.lit("ALL"))
            .otherwise(F.col(d))
            .alias(d)
            for d in dims
        ],
        "bucket",
        "rho",
    )
