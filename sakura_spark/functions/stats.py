"""Table statistics for planner/CBO-style consumers: exact equi-depth
histograms and freshness-decayed counts.

Equi-depth histograms are what a cost-based optimizer (and a data-quality
monitor) keeps per column: ``k`` buckets of near-equal row count with
min/max value boundaries. Exactness matters for the oracle proof, so the
bucket assignment uses the SQL-standard ``ntile`` size formula (the first
``n mod k`` tiles take one extra row over ``n div k``) computed from a
DISTRIBUTED two-pass rank — the same range-partition + broadcast
prefix-sum idiom as curation.perplexity_buckets (see that docstring for
the skew analysis): a per-group window would sort each group through one
reducer, the classic skewed-window scale-killer once a group holds a
meaningful fraction of 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def equidepth_histogram(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    id_col: str,
    k: int = 16,
) -> DataFrame:
    """Exact ``k``-bucket equi-depth histogram of ``value_col`` per group:
    one output row per (group, bucket) with the bucket's row count and
    inclusive [lo, hi] value range. Ties are broken by ``id_col`` so the
    total order — and therefore every boundary — is engine-independent;
    the result is bit-identical to ``ntile(k) OVER (PARTITION BY group
    ORDER BY value, id)`` without any per-group single-reducer sort.

    Pass 1 range-partitions on the full sort key (group, value, id) and
    pins the partition ids (eager localCheckpoint — both consumers must
    see one assignment; see curation.perplexity_buckets). Pass 2 ranks
    within (partition, group) — bounded by the ~equal range partition
    size — and adds a broadcast prefix-sum offset; the bucket follows
    from the rank via the exact ntile size formula, then one combinable
    aggregate per (group, bucket) emits the histogram.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    staged = df.select(*group_cols, value_col, id_col)
    parted = (
        staged.repartitionByRange(*group_cols, value_col, id_col)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    counts = parted.groupBy("__pid", *group_cols).agg(F.count(F.lit(1)).alias("__c"))
    w_prefix = (
        Window.partitionBy(*group_cols)
        .orderBy("__pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "__pid",
        *group_cols,
        F.coalesce(F.sum("__c").over(w_prefix), F.lit(0)).alias("__offset"),
        F.sum("__c").over(Window.partitionBy(*group_cols)).alias("__n"),
    )
    w_local = Window.partitionBy("__pid", *group_cols).orderBy(value_col, id_col)
    ranked = (
        parted.withColumn("__rn", F.row_number().over(w_local))
        .join(F.broadcast(offsets), ["__pid"] + list(group_cols))
        .withColumn("__rank", F.col("__offset") + F.col("__rn"))
    )
    # ntile(k): the first rem = n mod k tiles hold base+1 = n div k + 1
    # rows. Invert rank -> tile with integer arithmetic (float division
    # + floor is exact here: operands < 2**53).
    n, r = F.col("__n").cast("long"), F.col("__rank").cast("long")
    base = F.floor(n / F.lit(k)).cast("long")
    rem = n - base * F.lit(k)
    head = rem * (base + 1)  # rows living in the widened tiles
    bucket = F.when(
        base == 0, r  # fewer rows than tiles: row i IS tile i
    ).otherwise(
        F.when(
            r <= head,
            F.ceil(r / (base + F.lit(1))).cast("long"),
        ).otherwise(rem + F.ceil((r - head) / base).cast("long"))
    )
    return (
        ranked.withColumn("bucket", bucket)
        .groupBy(*group_cols, "bucket")
        .agg(
            F.count(F.lit(1)).alias("depth"),
            F.min(value_col).alias("lo"),
            F.max(value_col).alias("hi"),
        )
    )


def decayed_counts(
    df: DataFrame,
    group_cols: list[str],
    ts_col: str,
    halflife_buckets: int = 1,
    bucket_seconds: int = 86400,
    max_shift: int = 40,
    unit_weight: int = 1_000_000,
) -> DataFrame:
    """Freshness-decayed counts per group: each row contributes
    ``floor(unit_weight / 2**(age_buckets // halflife_buckets))`` where
    age is measured in ``bucket_seconds`` steps back from the corpus'
    newest timestamp — an exponential half-life decay kept EXACT (IEEE
    division by a power of two is exact, and the floor lands on the same
    integer in every engine; shift capped at ``max_shift``), so the sum
    is a plain BIGINT that commutes across any aggregation order. The
    recency-weighting step of a mixture/sampling policy ("prefer fresh
    documents") without float drift.

    Shape: one scalar max(ts) broadcast, a map-only weight expression,
    one combinable aggregate — the same cost as a plain count.
    """
    mx = df.agg(F.max(ts_col).alias("__mx"))
    sec = F.unix_timestamp(F.col(ts_col))
    mx_sec = F.unix_timestamp(F.col("__mx"))
    age = F.floor((mx_sec - sec) / F.lit(bucket_seconds)).cast("long")
    shift = F.least(
        F.floor(age / F.lit(halflife_buckets)).cast("long"),
        F.lit(max_shift).cast("long"),
    )
    weight = F.floor(
        F.lit(float(unit_weight)) / F.pow(F.lit(2.0), shift.cast("double"))
    ).cast("long")
    return (
        df.crossJoin(F.broadcast(mx))
        .groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(weight).alias("decayed_weight"),
        )
    )


def grouped_pearson(
    df: DataFrame,
    group_cols: list[str],
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Pearson correlation and sample covariance per group from ONE pass
    of integer moments: callers supply INTEGER-valued columns (fixed-
    point-encode floats upstream — cents, basis points; |value| < 10^18),
    the five moments (n, Σx, Σy, Σxy, Σx², Σy²) accumulate in exact
    decimal — inputs DECIMAL(18,0), products (37,0), sums (38,0), widths
    both Spark and ANSI engines accept — exact and
    commutative at any aggregation order or partitioning — and the
    covariance/correlation are computed from them in a FIXED expression
    tree of individually-correctly-rounded IEEE ops (casts, -, *, /,
    sqrt), so the resulting doubles are bit-identical in any IEEE-754
    engine (the bm25/cosine discipline applied to second-order
    statistics; never accumulate floats across rows — THAT is
    order-dependent). cov = (Σxy - Σx·Σy/n)/(n-1);
    corr = (n·Σxy - Σx·Σy) / (sqrt(n·Σx² - Σx²) · sqrt(n·Σy² - Σy²)).
    Groups with n < 2 or zero variance yield NULLs rather than
    divide-by-zero.

    Shape: one map-side-combinable aggregate — profiling cost equals a
    plain count at 100 TB; moments are mergeable so the same expression
    serves incremental refresh (incremental_agg_apply) and sketch-style
    rollups."""
    dec = "decimal(18,0)"
    x = F.col(x_col).cast(dec)
    y = F.col(y_col).cast(dec)
    m = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
    )
    nd = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx, syy = F.col("sxx").cast("double"), F.col("syy").cast("double")
    cov = F.when(
        F.col("n") >= 2, (sxy - sx * sy / nd) / (nd - F.lit(1.0))
    )
    vx = nd * sxx - sx * sx
    vy = nd * syy - sy * sy
    corr = F.when(
        (F.col("n") >= 2) & (vx > 0) & (vy > 0),
        (nd * sxy - sx * sy) / (F.sqrt(vx) * F.sqrt(vy)),
    )
    return m.select(
        *group_cols,
        "n",
        cov.alias("covariance"),
        corr.alias("correlation"),
    )


def grouped_linear_fit(
    df: DataFrame,
    group_cols: list[str],
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Ordinary-least-squares fit y ~ slope·x + intercept per group, from
    the same ONE-pass exact-decimal moments as :func:`grouped_pearson`
    (and under the same integer-input contract):
    slope = (n·Σxy − Σx·Σy) / (n·Σx² − Σx²),
    intercept = (Σy − slope·Σx) / n — each a fixed tree of
    individually-correctly-rounded IEEE ops over exactly-accumulated
    moments, bit-identical in any IEEE engine. Groups with n < 2 or zero
    x-variance yield NULLs. The trend-profiling / drift-detection
    statistic at plain-count cost; moments are mergeable, so the same
    fit serves incremental refresh."""
    dec = "decimal(18,0)"
    x = F.col(x_col).cast(dec)
    y = F.col(y_col).cast(dec)
    m = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
    )
    nd = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy, sxx = F.col("sxy").cast("double"), F.col("sxx").cast("double")
    vx = nd * sxx - sx * sx
    slope = F.when((F.col("n") >= 2) & (vx > 0), (nd * sxy - sx * sy) / vx)
    intercept = F.when(
        (F.col("n") >= 2) & (vx > 0), (sy - slope * sx) / nd
    )
    return m.select(
        *group_cols, "n", slope.alias("slope"), intercept.alias("intercept")
    )


def join_cardinality_profile(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    top_k: int = 10,
) -> DataFrame:
    """Exact join-size estimation WITHOUT executing the join — the CBO
    primitive behind join reordering and skew planning at 100 TB:
    |R ⋈ S| = Σ_key cnt_R(key) · cnt_S(key), computed by joining the two
    per-key COUNT tables (each bounded by distinct-key cardinality, not
    row count — the only shuffle this profile pays). Output: the
    ``top_k`` heaviest join keys by pair contribution, each with its
    per-side counts, pair count, and share of the total join size — the
    row a planner reads to decide "salt this key" or "broadcast that
    side" before burning a 100 TB shuffle on a join that would explode.
    Determinism: counts and pair products are exact longs; share is ONE
    IEEE division per emitted row; ties rank by key ascending."""
    lc = left.groupBy(F.col(left_key).alias("key")).agg(
        F.count(F.lit(1)).alias("n_left")
    )
    rc = right.groupBy(F.col(right_key).alias("key")).agg(
        F.count(F.lit(1)).alias("n_right")
    )
    pairs = lc.join(rc, "key").select(
        "key",
        "n_left",
        "n_right",
        (F.col("n_left") * F.col("n_right")).cast("long").alias("pairs"),
    )
    # One-row exact total, broadcast back (constant-size driver transfer).
    total = pairs.agg(F.sum("pairs").cast("long").alias("__total"))
    # Distributed top-k (TakeOrderedAndProject — per-partition pruning,
    # never a global sort over the distinct-key table, which at 100 TB
    # can itself be billions of rows); the rank window then runs over
    # the <= top_k surviving rows only.
    top = pairs.orderBy(F.col("pairs").desc(), F.col("key").asc()).limit(top_k)
    w = Window.orderBy(F.col("pairs").desc(), F.col("key").asc())
    top = top.withColumn("rank", F.row_number().over(w))
    return (
        top.crossJoin(F.broadcast(total))
        .select(
            "rank",
            "key",
            "n_left",
            "n_right",
            "pairs",
            (F.col("pairs").cast("double") / F.col("__total").cast("double")).alias(
                "share"
            ),
        )
    )
