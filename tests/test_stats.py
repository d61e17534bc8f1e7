"""equi-depth histogram, decayed counts, and gap-fill/LOCF semantics."""

import datetime as dt
import random

from pyspark.sql import Window
from pyspark.sql import functions as F

import pytest


def ts(m):
    return dt.datetime(2024, 1, 1, 0, m, 0)


def test_equidepth_matches_ntile_window(spark):
    """The distributed two-pass rank must reproduce the literal ntile
    window bit-for-bit — including groups whose size is not divisible by
    k (the widened-head-tiles rule) and duplicate values (id tiebreak)."""
    from sakura_spark.functions.stats import equidepth_histogram

    rng = random.Random(7)
    rows = [
        (g, float(rng.randint(0, 30)), i)
        for i, g in enumerate(
            ["a"] * 103 + ["b"] * 17 + ["c"] * 64
        )
    ]
    df = spark.createDataFrame(rows, "g string, v double, sid long")
    got = {
        (r.g, r.bucket): (r.depth, r.lo, r.hi)
        for r in equidepth_histogram(df, ["g"], "v", "sid", k=8).collect()
    }
    w = Window.partitionBy("g").orderBy("v", "sid")
    want = {
        (r.g, r.bucket): (r.depth, r.lo, r.hi)
        for r in df.withColumn("bucket", F.ntile(8).over(w))
        .groupBy("g", "bucket")
        .agg(
            F.count(F.lit(1)).alias("depth"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
        )
        .collect()
    }
    assert got == want


def test_equidepth_fewer_rows_than_buckets(spark):
    """n < k: every row is its own tile (the base == 0 branch)."""
    from sakura_spark.functions.stats import equidepth_histogram

    df = spark.createDataFrame(
        [("a", 5.0, 1), ("a", 1.0, 2), ("a", 3.0, 3)], "g string, v double, sid long"
    )
    out = sorted(
        (r.bucket, r.depth, r.lo)
        for r in equidepth_histogram(df, ["g"], "v", "sid", k=8).collect()
    )
    assert out == [(1, 1, 1.0), (2, 1, 3.0), (3, 1, 5.0)]


def test_equidepth_validation(spark):
    from sakura_spark.functions.stats import equidepth_histogram

    df = spark.createDataFrame([("a", 1.0, 1)], "g string, v double, sid long")
    with pytest.raises(ValueError):
        equidepth_histogram(df, ["g"], "v", "sid", k=0)


def test_decayed_counts_exact(spark):
    """Each row's weight is floor(1e6 / 2^age_days) from the corpus max;
    verify against a Python recomputation."""
    from sakura_spark.functions.stats import decayed_counts

    base = dt.datetime(2024, 3, 10, 12, 0, 0)
    rows = [
        ("x", base),
        ("x", base - dt.timedelta(days=1)),
        ("x", base - dt.timedelta(days=3, hours=2)),
        ("y", base - dt.timedelta(days=50)),  # beyond max_shift with cap 40
    ]
    df = spark.createDataFrame(rows, "k string, t timestamp")
    got = {
        r.k: (r.n, r.decayed_weight)
        for r in decayed_counts(df, ["k"], "t", max_shift=40).collect()
    }
    assert got["x"] == (3, 1_000_000 + 500_000 + 125_000)
    assert got["y"] == (1, 1_000_000 >> 40)  # capped, floor(1e6/2^40)=0


def test_gapfill_locf_semantics(spark):
    """Gaps between a key's first and last bucket are synthesized with
    zero-filled additive measures and carried (LOCF) values; nothing is
    emitted outside the observed span, and other keys are untouched."""
    from sakura_spark.operators import gapfill_locf

    obs = spark.createDataFrame(
        [
            (1, ts(0), 2, 100),
            (1, ts(3), 1, 70),   # minutes 1,2 missing
            (2, ts(5), 4, 9),    # single-bucket key: no gaps
        ],
        "k long, b timestamp, n long, v long",
    )
    out = gapfill_locf(
        obs, ["k"], "b", 60, carry_cols=["v"], zero_cols=["n"]
    ).collect()
    rows = {(r.k, r.b.minute): (r.v, r.n, r.is_gap) for r in out}
    assert rows[(1, 0)] == (100, 2, False)
    assert rows[(1, 1)] == (100, 0, True)   # carried + zero-filled + flagged
    assert rows[(1, 2)] == (100, 0, True)
    assert rows[(1, 3)] == (70, 1, False)   # fresh observation replaces carry
    assert rows[(2, 5)] == (9, 4, False)
    assert len(rows) == 5  # 4 buckets for key 1, 1 for key 2


def test_grouped_pearson_matches_numpy(spark):
    """Moment-form covariance/correlation equals numpy's within one ulp
    scale of rounding (values are small exact integers here, so equality
    is exact), and degenerate groups yield NULLs."""
    import numpy as np

    from sakura_spark.functions.stats import grouped_pearson

    xs = [1, 2, 3, 4, 7]
    ys = [2, 1, 4, 6, 9]
    rows = [("g", x, y) for x, y in zip(xs, ys)]
    rows += [("single", 5, 5)]          # n < 2 -> NULLs
    rows += [("flat", 3, 1), ("flat", 3, 9)]  # zero x-variance -> corr NULL
    df = spark.createDataFrame(rows, "g string, x long, y long")
    got = {r.g: r for r in grouped_pearson(df, ["g"], "x", "y").collect()}

    x, y = np.array(xs, float), np.array(ys, float)
    n = len(xs)
    want_cov = (x * y).sum() - x.sum() * y.sum() / n
    want_cov /= n - 1
    want_corr = (n * (x * y).sum() - x.sum() * y.sum()) / (
        np.sqrt(n * (x * x).sum() - x.sum() ** 2)
        * np.sqrt(n * (y * y).sum() - y.sum() ** 2)
    )
    assert got["g"].n == n
    assert got["g"].covariance == pytest.approx(want_cov, abs=0)
    assert got["g"].correlation == pytest.approx(want_corr, abs=0)
    assert got["single"].covariance is None and got["single"].correlation is None
    assert got["flat"].covariance is not None  # cov of zero-x-var is 0.0
    assert got["flat"].correlation is None


def test_grouped_linear_fit_matches_formula(spark):
    """Moment-form OLS equals the closed formula (here y = 3x + 2 exactly,
    so slope/intercept recover the generating line), and zero-x-variance
    groups yield NULLs."""
    from sakura_spark.functions.stats import grouped_linear_fit

    rows = [("g", x, 3 * x + 2) for x in (1, 2, 5, 9)]
    rows += [("flat", 4, 1), ("flat", 4, 9)]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    got = {r.g: r for r in grouped_linear_fit(df, ["g"], "x", "y").collect()}
    assert got["g"].slope == pytest.approx(3.0, abs=0)
    assert got["g"].intercept == pytest.approx(2.0, abs=0)
    assert got["flat"].slope is None and got["flat"].intercept is None
