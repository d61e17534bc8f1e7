"""Curation operators: deterministic sampling, quotas, contamination."""

import pytest
from pyspark.sql import functions as F

from sakura_spark.functions import curation


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, f"src{i % 3}", f"word{i} alpha beta gamma delta epsilon zeta") for i in range(200)]
    return spark.createDataFrame(rows, "doc_id long, source string, text string").cache()


def test_deterministic_sample_is_stable_and_maponly(docs):
    a = {r.doc_id for r in curation.deterministic_sample(docs, ["doc_id"], "4000").collect()}
    b = {r.doc_id for r in curation.deterministic_sample(docs, ["doc_id"], "4000").collect()}
    assert a == b  # no RNG: identical rows every run
    # ~25% of 200 with md5 uniformity; generous bounds
    assert 20 <= len(a) <= 90
    # map-only: no shuffle exchange in the plan
    plan = curation.deterministic_sample(docs, ["doc_id"], "4000")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_deterministic_sample_ranges_are_disjoint_splits(docs):
    train = curation.deterministic_sample(docs, ["doc_id"], "e000")
    rest = docs.filter(curation.sample_bucket(["doc_id"]) >= F.lit("e000"))
    assert train.count() + rest.count() == docs.count()
    assert train.join(rest, on="doc_id", how="inner").count() == 0


def test_deterministic_sample_validates_threshold(docs):
    with pytest.raises(ValueError):
        curation.deterministic_sample(docs, ["doc_id"], "40", prefix_len=4)


def test_quota_per_group_caps_and_is_deterministic(docs):
    out = curation.quota_per_group(docs, "source", 10, "doc_id")
    per = {r.source: r.n for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert per == {"src0": 10, "src1": 10, "src2": 10}
    again = curation.quota_per_group(docs, "source", 10, "doc_id")
    assert {r.doc_id for r in out.collect()} == {r.doc_id for r in again.collect()}
    # under-quota groups keep everything
    assert curation.quota_per_group(docs, "source", 1000, "doc_id").count() == docs.count()


def test_contamination_finds_planted_overlap(spark):
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "completely unrelated text about spark physical plans here"),
            (3, "the quick brown fox jumps over nothing in particular"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "bench_id long, text string",
    )
    out = curation.contamination(corpus, bench, threshold=0.5).collect()
    hits = {r.doc_id: r for r in out}
    assert 1 in hits  # full containment: every benchmark 3-gram appears
    assert hits[1].containment == 1.0
    assert 2 not in hits
    # doc 3 shares exactly 4 of the 7 benchmark trigrams
    assert hits[3].shared_ngrams == 4 and hits[3].bench_ngrams == 7
    assert curation.contamination(corpus, bench, threshold=0.6).filter(
        F.col("doc_id") == 3
    ).count() == 0


def test_contamination_broadcasts_benchmark(spark):
    corpus = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    bench = spark.createDataFrame([(9, "a b c")], "bench_id long, text string")
    plan = (
        curation.contamination(corpus, bench)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


def test_contamination_hashed_matches_exact(spark):
    """The 31-bit hashed fast path returns the same pairs and counts as the
    exact string-gram mode (collisions are the only possible divergence)."""
    corpus = spark.createDataFrame(
        [(i, f"tok{i} alpha beta gamma delta tok{i+1} epsilon zeta eta theta") for i in range(40)],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta"), (101, "epsilon zeta eta theta iota")],
        "bench_id long, text string",
    )
    exact = {
        (r.doc_id, r.bench_id): (r.shared_ngrams, r.bench_ngrams)
        for r in curation.contamination(corpus, bench, threshold=0.1).collect()
    }
    fast = {
        (r.doc_id, r.bench_id): (r.shared_ngrams, r.bench_ngrams)
        for r in curation.contamination(corpus, bench, threshold=0.1, hashed=True).collect()
    }
    assert exact == fast and exact


def test_train_val_test_split_fractions_and_stability(docs, spark):
    from sakura_spark.functions import curation

    out = curation.train_val_test_split(docs, ["doc_id"])
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    total = sum(counts.values())
    assert set(counts) <= {"train", "val", "test"}
    # md5 is uniform: train ~80% within generous tolerance at small n
    assert counts.get("train", 0) / total > 0.6
    assert counts.get("train", 0) / total < 0.95
    # Growth stability: the split of a row is a pure function of its key —
    # recomputing on a subset reassigns nothing.
    subset = curation.train_val_test_split(docs.limit(50), ["doc_id"])
    joined = subset.alias("s").join(out.alias("f"), on="doc_id").select(
        F.col("s.split").alias("a"), F.col("f.split").alias("b")
    )
    assert joined.filter("a <> b").count() == 0


def test_train_val_test_split_rejects_bad_boundaries(docs):
    import pytest as _pytest

    from sakura_spark.functions import curation

    with _pytest.raises(ValueError):
        curation.train_val_test_split(docs, ["doc_id"], boundaries=("e666", "cccc"))


def test_mixture_sample_rates_and_stability(docs):
    """Per-source keep rates: rate>=1 keeps the whole group, fractional
    rates keep ~rate of the group via the md5 bucket, and the decision is
    a pure function of the key (re-mixing a subset changes nothing)."""
    from sakura_spark.functions import curation

    kept = curation.mixture_sample(
        docs, ["doc_id"], {"src0": 1.0, "src1": 0.5}, default_rate=0.25
    )
    totals = {r["source"]: r["n"] for r in docs.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    counts = {r["source"]: r["n"] for r in kept.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts["src0"] == totals["src0"]  # rate 1.0 = keep all
    assert 0.25 < counts["src1"] / totals["src1"] < 0.75  # ~0.5
    assert 0.05 < counts.get("src2", 0) / totals["src2"] < 0.5  # default ~0.25
    # Map-only: no shuffle in the plan.
    assert "Exchange" not in kept._jdf.queryExecution().executedPlan().toString()
    # Growth stability: kept set on a subset == subset of kept set.
    sub = curation.mixture_sample(
        docs.limit(50), ["doc_id"], {"src0": 1.0, "src1": 0.5}, default_rate=0.25
    )
    sub_ids = {r["doc_id"] for r in sub.select("doc_id").collect()}
    full_ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    limit_ids = {r["doc_id"] for r in docs.limit(50).select("doc_id").collect()}
    assert sub_ids == full_ids & limit_ids


def test_mixture_sample_rejects_negative_rate(docs):
    from sakura_spark.functions import curation

    with pytest.raises(ValueError):
        curation.mixture_sample(docs, ["doc_id"], {"src0": -0.1})


def test_gopher_repetition_filter_gates(spark):
    """curation.gopher_repetition_filter: a clean long document passes;
    documents failing each gate (duplicate lines, top-word mass, top-bigram
    mass, minimum length) are dropped."""
    from sakura_spark.functions import curation

    filler = " ".join(f"w{i}" for i in range(60))  # 60 distinct words
    # Doc 4 isolates the BIGRAM gate: "xx yy" x19 + 62 distinct fillers
    # gives top-word mass 19/100 = 0.19 (under the 0.2 word gate) but
    # top-bigram mass 19/99 > 0.18 — only the 2-gram rule rejects it.
    filler62 = " ".join(f"v{i}" for i in range(62))
    rows = [
        (1, filler),                                   # passes all gates
        (2, "line\n" * 10 + filler),                   # 10 dup lines of 11 -> fails
        (3, ("spam " * 20) + filler),                  # top word 20/80 = 0.25 -> fails
        (4, ("xx yy " * 19) + filler62),               # bigram gate only -> fails
        (5, "too short to pass"),                      # < 50 words -> fails
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kept = {r.doc_id for r in curation.gopher_repetition_filter(df).collect()}
    assert kept == {1}


# ---------------------------------------------------------------------------
# Weighted sampling (Efraimidis-Spirakis A-ES)
# ---------------------------------------------------------------------------


def _aes_key(doc_id: int, weight: float, salt: str = "ws") -> float:
    import hashlib
    import math

    h = int(
        hashlib.sha256(f"{salt}\x1f{doc_id}".encode()).hexdigest()[:15], 16
    )
    u = (h + 1) / float(1 << 60)
    return -math.log(u) / weight


def test_weighted_sample_matches_python_reference(spark):
    """The selected set equals the k smallest exponential keys per group,
    computed independently in pure Python."""
    rows = [(i, f"g{i % 2}", 1 + (i % 7) * 10) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, grp string, w long")
    got = {
        (r["grp"], r["doc_id"])
        for r in curation.weighted_sample(
            df, k=15, weight_col="w", id_col="doc_id", group_cols=["grp"]
        ).collect()
    }
    want = set()
    for g in ("g0", "g1"):
        keyed = sorted(
            ((_aes_key(i, w), i) for i, gg, w in rows if gg == g),
        )
        want |= {(g, i) for _k, i in keyed[:15]}
    assert got == want


def test_weighted_sample_bias_and_exclusions(spark):
    """Heavy rows are selected far more often than light ones (weight 100
    vs 1 over many ids), rows with non-positive weight never appear, and
    the draw is stable across invocations."""
    rows = [(i, 100 if i % 2 == 0 else 1) for i in range(1000)] + [
        (2000, 0),
        (2001, -5),
    ]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    sel = [
        r["doc_id"]
        for r in curation.weighted_sample(
            df, k=100, weight_col="w", id_col="doc_id"
        ).collect()
    ]
    assert len(sel) == 100
    assert 2000 not in sel and 2001 not in sel
    heavy = sum(1 for i in sel if i % 2 == 0)
    # E[heavy] ~ 99%+ under 100:1 odds; even a loose bound separates it
    # decisively from the uniform 50%.
    assert heavy >= 85
    again = [
        r["doc_id"]
        for r in curation.weighted_sample(
            df, k=100, weight_col="w", id_col="doc_id"
        ).collect()
    ]
    assert sorted(sel) == sorted(again)


def test_weighted_sample_rejects_bad_k(spark):
    df = spark.createDataFrame([(1, 1)], "doc_id long, w long")
    with pytest.raises(ValueError):
        curation.weighted_sample(df, k=0, weight_col="w", id_col="doc_id")


def test_source_stats_hand_computed(spark):
    rows = [
        ("web", "en", 100), ("web", "en", 200), ("web", "de", 50),
        ("books", "fr", 10),
    ]
    df = spark.createDataFrame(rows, "source string, lang string, n_chars long")
    out = {r.source: r for r in curation.source_stats(df).collect()}
    w = out["web"]
    assert (w.n_docs, w.total_chars, w.n_langs) == (3, 350, 2)
    assert w.mean_chars == 350 / 3
    assert w.top_lang == "en" and w.top_lang_share == 2 / 3
    b = out["books"]
    assert (b.n_docs, b.top_lang, b.top_lang_share) == (1, "fr", 1.0)


def test_source_stats_tie_breaks_to_greater_lang(spark):
    rows = [("s", "aa", 1), ("s", "zz", 1)]
    df = spark.createDataFrame(rows, "source string, lang string, n_chars long")
    r = curation.source_stats(df).collect()[0]
    assert r.top_lang == "zz" and r.n_langs == 2


def test_source_stats_plan_is_two_aggs_no_join(spark):
    df = spark.createDataFrame(
        [("s", "en", 1)], "source string, lang string, n_chars long"
    )
    plan = (
        curation.source_stats(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan and "BatchEvalPython" not in plan


def test_perplexity_buckets_ordering_and_tiles(spark):
    """Docs with more out-of-LM bigrams land in worse buckets; ntile
    splits 5 docs per lang as 2/2/1; empty docs pin to ratio 1.0."""
    common = "the quick brown fox jumps over the lazy dog "
    rows = [
        (1, common * 8, "en"),                       # all common bigrams
        (2, common * 6 + "zxq one ", "en"),          # one rare bigram
        (3, common * 4 + "zxq wvu tsr qpo ", "en"),  # more rare
        (4, "zxq wvu tsr qpo nml kji hgf ", "en"),   # mostly rare
        (5, "", "en"),                               # empty -> worst
        (6, common * 3, "de"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {r.doc_id: r for r in curation.perplexity_buckets(df, top_v=50).collect()}
    assert out[5].unseen_ratio == 1.0 and out[5].n_bigrams == 0
    # en ntile(3) over 5 rows: sizes 2/2/1 in ratio order
    en = sorted(
        (out[i] for i in (1, 2, 3, 4, 5)),
        key=lambda r: (r.unseen_ratio, r.doc_id),
    )
    assert [r.ppl_bucket for r in en] == ["head", "head", "middle", "middle", "tail"]
    assert out[1].ppl_bucket == "head"
    assert out[6].ppl_bucket == "head"  # sole de doc: tile 1
    # ratios are monotone with planted rarity
    assert out[1].unseen_ratio <= out[3].unseen_ratio <= out[4].unseen_ratio


def test_leakage_safe_split_co_splits_duplicates(spark):
    """Exact copies must land in the SAME split (the leakage property),
    and with a cluster key, near-duplicates co-split too."""
    from sakura_spark.functions.curation import leakage_safe_split

    docs = spark.createDataFrame(
        [(i, f"unique text {i}") for i in range(40)]
        + [(100 + i, "  Shared   COPY text ") for i in range(6)]
        + [(200 + i, "shared copy text") for i in range(6)],
        "doc_id long, text string",
    )
    out = leakage_safe_split(docs)
    rows = out.collect()
    # canonicalization: the two planted groups share ONE fingerprint
    fps = {r["fp"] for r in rows if r["doc_id"] >= 100}
    assert len(fps) == 1
    splits = {r["split"] for r in rows if r["doc_id"] >= 100}
    assert len(splits) == 1          # all 12 copies in one split
    assert {r["split"] for r in rows} <= {"train", "val", "test"}
    # cluster-keyed variant: explicit group ids co-split
    clustered = docs.withColumn(
        "cluster", (F.col("doc_id") % 5).cast("string")
    )
    out2 = leakage_safe_split(clustered, group_col="cluster")
    per_cluster = (
        out2.groupBy("cluster").agg(F.countDistinct("split").alias("n")).collect()
    )
    assert all(r["n"] == 1 for r in per_cluster)


def test_leakage_safe_split_rejects_bad_boundaries(spark):
    from sakura_spark.functions.curation import leakage_safe_split

    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    import pytest as _pytest

    with _pytest.raises(ValueError):
        leakage_safe_split(docs, boundaries=("ffff", "0000"))
