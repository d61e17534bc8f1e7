"""Dataset-curation operators for training-data pipelines.

The reference engine has no sampling/curation surface (its ingest is
row-at-a-time DML — lib/listener.ml:156-172); these are the operations a
100 TB pretraining-corpus pipeline runs between ingestion and sharding:

* deterministic sampling — hold-out splits and down-sampling that are
  reproducible across runs and engines (no RNG state, no seed drift);
* per-source quotas — cap any one domain/crawl's contribution;
* benchmark contamination — flag corpus documents that contain a large
  fraction of an evaluation document's n-grams (the standard
  decontamination step before training).

Everything is pure Column expressions: the sampling/quota passes are
map-only or one-shuffle plans, and the contamination join is designed to
broadcast the (small) benchmark side so the corpus scan stays map-local
until the final per-pair aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from sakura_spark.functions.dedup import shingle_hashes, shingles

# --- deterministic sampling -------------------------------------------------


def sample_bucket(key_cols: list[Column | str], prefix_len: int = 4) -> Column:
    """Stable hex bucket of a row key: the first ``prefix_len`` hex chars of
    md5 over the key columns. Lexicographic comparison against a hex
    threshold gives an engine-portable Bernoulli sample (md5 of a string is
    identical everywhere; no RNG, no seed, no sampler state)."""
    cols = [F.col(c).cast("string") if isinstance(c, str) else c.cast("string") for c in key_cols]
    return F.substring(F.md5(F.concat_ws("\x1f", *cols)), 1, prefix_len)


def deterministic_sample(
    df: DataFrame,
    key_cols: list[str],
    keep_below: str = "4000",
    prefix_len: int = 4,
) -> DataFrame:
    """Keep rows whose :func:`sample_bucket` sorts below ``keep_below`` —
    a reproducible ~(int(keep_below,16) / 16**prefix_len) fraction.

    Map-only: the filter is a scan-side expression, so at 100 TB this is
    pure scan bandwidth with no shuffle, and the same rows are selected on
    every engine, cluster size, and run. Use disjoint bucket ranges for
    train/validation/test splits (a row's bucket never changes)."""
    if len(keep_below) != prefix_len:
        raise ValueError(f"keep_below must be {prefix_len} hex chars, got {keep_below!r}")
    return df.filter(sample_bucket(key_cols, prefix_len) < F.lit(keep_below.lower()))


def train_val_test_split(
    df: DataFrame,
    key_cols: list[str],
    boundaries: tuple[str, str] = ("cccc", "e666"),
    prefix_len: int = 4,
) -> DataFrame:
    """Assign each row a deterministic ``split`` label (train/val/test) by
    disjoint :func:`sample_bucket` ranges.

    The default boundaries give ~80/10/10 (0xcccc/0x10000 = .79999,
    0xe666 = .89999). Map-only and engine-portable like
    deterministic_sample: a row's split never changes across runs,
    clusters, or engines, and adding data never reassigns existing rows —
    the property a training pipeline needs so eval sets stay
    uncontaminated as the corpus grows."""
    lo, hi = (b.lower() for b in boundaries)
    if not (len(lo) == len(hi) == prefix_len and lo < hi):
        raise ValueError(f"boundaries must be {prefix_len} hex chars with lo < hi")
    bucket = sample_bucket(key_cols, prefix_len)
    return df.withColumn(
        "split",
        F.when(bucket < F.lit(lo), F.lit("train"))
        .when(bucket < F.lit(hi), F.lit("val"))
        .otherwise(F.lit("test")),
    )


def mixture_sample(
    df: DataFrame,
    key_cols: list[str],
    rates: dict[str, float],
    group_col: str = "source",
    default_rate: float = 1.0,
    prefix_len: int = 4,
) -> DataFrame:
    """Domain-reweighting mixture: keep each row with its group's target
    rate, via the same deterministic md5 bucket as
    :func:`deterministic_sample` — how a training pipeline dials per-domain
    proportions (e.g. upweight books, downsample crawl) without RNG.

    Map-only at any scale: the per-group threshold compiles to one CASE
    over literals inside codegen, the bucket is a scan-side expression, no
    shuffle. A row's keep/drop decision is stable across runs, engines and
    corpus growth, so re-mixing never perturbs previously selected data.
    Rates are quantized to 1/16**prefix_len steps; rate >= 1 keeps the
    whole group."""
    bucket = sample_bucket(key_cols, prefix_len)
    space = 16 ** prefix_len

    def threshold(rate: float) -> str | None:
        if rate >= 1.0:
            return None  # keep all — no 4-hex-digit string sorts >= "ffff"+1
        if rate < 0:
            raise ValueError(f"negative rate {rate}")
        return format(int(rate * space), f"0{prefix_len}x")

    keep = None
    for group, rate in sorted(rates.items()):
        t = threshold(rate)
        cond = F.lit(True) if t is None else bucket < F.lit(t)
        branch = F.when(F.col(group_col) == group, cond)
        keep = branch if keep is None else keep.when(F.col(group_col) == group, cond)
    dt = threshold(default_rate)
    default_cond = F.lit(True) if dt is None else bucket < F.lit(dt)
    keep = default_cond if keep is None else keep.otherwise(default_cond)
    return df.filter(keep)


# --- per-group quotas -------------------------------------------------------


def quota_per_group(
    df: DataFrame,
    group_col: str,
    per_group: int,
    id_col: str,
) -> DataFrame:
    """At most ``per_group`` rows from each group, chosen by a deterministic
    pseudo-random order (md5 of the id) so the kept subset is unbiased and
    stable across runs.

    Two-phase top-k, because group cardinality is typically tiny (sources,
    languages) and a single window over ``group_col`` would sort each
    group in ONE task — parallelism capped at n_groups and per-task sort
    growing with the data (measured: the round-5 sf10→sf100 sweep showed
    pipeline_curate at per-row-cost ratio 1.2 from exactly this). Phase 1
    ranks within (group, input-partition) — the shuffle spreads over
    n_groups × n_partitions reducers and each task sorts only its slice —
    keeping at most ``per_group`` per cell; any row outside its cell's
    top-k cannot be in the group's global top-k, so pruning is lossless
    and the result is identical (and still deterministic: partition
    layout only affects WHICH safely-prunable rows are pruned). Phase 2
    ranks the survivors — at most per_group × n_partitions rows per
    group — so its single-task-per-group sort is bounded by cluster
    width, not data size."""
    order = F.md5(F.col(id_col).cast("string"))
    w1 = Window.partitionBy(group_col, "__pid").orderBy(order, id_col)
    pruned = (
        df.withColumn("__pid", F.spark_partition_id())
        .withColumn("__rk", F.row_number().over(w1))
        .filter(F.col("__rk") <= per_group)
        .drop("__pid", "__rk")
    )
    w = Window.partitionBy(group_col).orderBy(order, id_col)
    return (
        pruned.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= per_group)
        .drop("__rk")
    )


# --- benchmark contamination ------------------------------------------------


def contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    corpus_id: str = "doc_id",
    bench_id: str = "bench_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    hashed: bool = False,
) -> DataFrame:
    """Corpus documents containing >= ``threshold`` of a benchmark
    document's word n-grams (containment score, the standard
    eval-decontamination metric).

    Returns (corpus_id, bench_id, shared_ngrams, bench_ngrams, containment)
    for every pair at or above the threshold.

    Scale shape: the benchmark (eval sets — thousands of documents) is
    exploded to distinct (gram, bench_id) pairs and BROADCAST; the corpus
    side explodes its grams map-side and probes the broadcast hash table,
    so the 100 TB scan never shuffles raw text — only the surviving
    (corpus_id, bench_id, gram-hit) triples reach the one aggregation
    exchange. Shingles are distinct per document (array_distinct), so
    count(*) per pair counts distinct shared grams.

    ``hashed=True`` is the 100 TB fast path: grams are compared by rolling
    31-bit token-hash combination (dedup.shingle_hashes) instead of built
    gram strings — the per-gram concat/slice that dominates the exact mode
    disappears (~4x at bench scale). Counts can differ from the exact mode
    only on a hash collision inside one (corpus doc, bench doc) pair
    (probability ~ grams^2 / 2^31 per pair); the default stays exact and
    oracle-checkable.
    """
    sh = shingle_hashes if hashed else shingles
    b_sh = benchmark.select(
        F.col(bench_id), sh(F.col(text_col), n).alias("__sh")
    ).filter(F.size("__sh") > 0)
    b = b_sh.select(
        bench_id,
        F.size("__sh").cast("long").alias("__bench_n"),
        F.explode("__sh").alias("__gram"),
    )
    c = corpus.select(
        F.col(corpus_id), F.explode(sh(F.col(text_col), n)).alias("__gram")
    )
    pairs = (
        c.join(F.broadcast(b), on="__gram")
        .groupBy(corpus_id, bench_id, "__bench_n")
        .agg(F.count(F.lit(1)).alias("shared_ngrams"))
    )
    score = F.col("shared_ngrams").cast("double") / F.col("__bench_n").cast("double")
    return pairs.select(
        corpus_id,
        bench_id,
        "shared_ngrams",
        F.col("__bench_n").alias("bench_ngrams"),
        score.alias("containment"),
    ).filter(F.col("containment") >= threshold)


def gopher_repetition_filter(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 50,
) -> DataFrame:
    """Gopher-style repetition quality GATE (Rae et al. 2021, Appendix A
    — the filter application of text.repetition_stats' measurements):
    keep documents where

    * duplicate-line fraction <= 0.3  (10*n_distinct_lines >= 7*n_lines),
    * top-word mass <= 0.2            (5*max_word_count <= n_words),
    * top-2-gram mass <= 0.18         (50*max_bigram_count <= 9*n_bigrams),
    * n_words >= min_words            (Gopher's minimum length gate).

    Every gate is an INTEGER inequality (the fraction thresholds cleared
    of division), so the output — the surviving docs with their stats —
    is hash-stable across engines; one filter over the repetition-stats
    plan, nothing new shuffles."""
    from sakura_spark.functions.text import repetition_stats

    s = repetition_stats(df, id_col=id_col, text_col=text_col)
    return s.where(
        (10 * F.col("n_distinct_lines") >= 7 * F.col("n_lines"))
        & (5 * F.col("max_word_count") <= F.col("n_words"))
        & (50 * F.col("max_bigram_count") <= 9 * F.col("n_bigrams"))
        & (F.col("n_words") >= min_words)
    )


def length_buckets(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    boundaries: tuple[int, ...] = (64, 128, 256, 512, 1024, 2048),
) -> DataFrame:
    """Sequence-length bucketing report for padded-batch training — the
    planning step before :func:`sakura_spark.functions.sharding.shard_pack`
    decides between padding short sequences and chunking long ones.

    Each document is assigned the smallest bucket (from ``boundaries``,
    ascending) that fits its whitespace token count; documents longer than
    the largest boundary land in bucket -1 (the "chunk me" overflow class).
    Per bucket the report carries::

        bucket        smallest fitting sequence length (-1 = overflow)
        n_docs        documents assigned
        total_tokens  real token mass
        pad_tokens    bucket * n_docs - total_tokens (0 for overflow)
        max_tokens    longest member (pad-efficiency tail diagnostic)

    All outputs are integers, so the report is hash-stable across engines.
    Plan: one map-side projection (token count + a literal CASE ladder —
    no log2/pow floats, so engines can't round differently) into a
    map-side-combinable groupBy on at most ``len(boundaries)+1`` keys —
    the aggregate state is a handful of rows regardless of corpus size,
    the exact shape that stays cheap at 100 TB."""
    from sakura_spark.functions.text import bind_once, token_count

    bounds = sorted(boundaries)
    n = token_count(F.col(text_col))

    def ladder(nv: Column) -> Column:
        # nv is a bound lambda variable: the token count evaluates once,
        # not once per CASE branch (the multi-reference re-tokenization
        # trap bind_once exists for).
        b: Column = F.lit(-1)
        for bnd in reversed(bounds):
            b = F.when(nv <= bnd, F.lit(bnd)).otherwise(b)
        return b

    per_doc = df.select(
        F.col(id_col), n.alias("__n"), bind_once(n, ladder).cast("long").alias("bucket")
    )
    return (
        per_doc.groupBy("bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("__n").alias("total_tokens"),
            F.max("__n").alias("max_tokens"),
        )
        .select(
            "bucket",
            "n_docs",
            "total_tokens",
            F.when(F.col("bucket") < 0, F.lit(0))
            .otherwise(F.col("bucket") * F.col("n_docs") - F.col("total_tokens"))
            .cast("long")
            .alias("pad_tokens"),
            "max_tokens",
        )
        .orderBy("bucket")
    )


# --- weighted sampling without replacement ----------------------------------


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str,
    group_cols: list[str] | None = None,
    salt: str = "ws",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement: ``k`` rows
    (per group, if ``group_cols``), where selection probability is
    proportional to the row's weight — the Efraimidis-Spirakis
    exponential-key method (A-ES, Inf. Proc. Letters 2006): each row gets
    key = -ln(u) / w with u uniform in (0, 1], and the k SMALLEST keys
    win. This is how a curation pipeline samples a fixed token budget
    biased toward quality scores or document length without RNG state: u
    comes from the engine-portable sha256 word of the id
    (sketches.hash_word), so the selected set is stable across runs and
    partitionings, and re-sampling after corpus growth perturbs only
    what the new rows displace.

    The float key exists only in the ORDERING; the output is the
    original rows, so driver hashes compare the exact source values
    (exact key TIES are impossible — distinct ids give distinct 60-bit
    hash words). Cross-ENGINE determinism is near- but not strictly
    guaranteed: both engines evaluate -ln(u)/w in IEEE double, but IEEE
    754 does not require correctly-rounded transcendentals, so java
    Math.log and libm log may differ in the last ulp; two rows whose
    keys straddle the rank-k boundary within ~1 ulp could in principle
    swap between Spark and a SQL oracle. With 60-bit u the probability
    is negligible (and no such flip has been observed across the driver
    sweeps), but it is a probabilistic, not structural, guarantee.

    Plan: the same lossless two-phase top-k as :func:`quota_per_group` —
    phase 1 ranks within (group, input-partition) so no single task
    sorts a whole group, phase 2 ranks the at-most k-per-partition
    survivors. Map-side key computation, two bounded window passes, no
    Python."""
    from sakura_spark.functions.sketches import WORD_SPAN, hash_word

    if k < 1:
        raise ValueError("k must be positive")
    group_cols = list(group_cols or [])
    w = F.col(weight_col).cast("double")
    u = (hash_word(F.col(id_col), salt, word=0) + 1).cast("double") / F.lit(
        float(WORD_SPAN)
    )
    key = -F.log(u) / w
    w1 = Window.partitionBy(*group_cols, "__pid").orderBy(
        F.col("__key").asc(), F.col(id_col).asc()
    )
    pruned = (
        # A-ES is defined for positive weights; non-positive-weight rows
        # have zero selection probability and are excluded up front (the
        # filter also keeps -ln(u)/w from producing NaN orderings).
        df.filter(w > 0)
        .withColumn("__key", key)
        .withColumn("__pid", F.spark_partition_id())
        .withColumn("__rk", F.row_number().over(w1))
        .filter(F.col("__rk") <= k)
        .drop("__pid", "__rk")
    )
    w2 = Window.partitionBy(*group_cols).orderBy(
        F.col("__key").asc(), F.col(id_col).asc()
    )
    return (
        pruned.withColumn("__rk", F.row_number().over(w2))
        .filter(F.col("__rk") <= k)
        .drop("__rk", "__key")
    )


def source_stats(
    df: DataFrame,
    source_col: str = "source",
    lang_col: str = "lang",
    size_col: str = "n_chars",
) -> DataFrame:
    """Per-source corpus profile: (source, n_docs, total_chars, mean_chars,
    n_langs, top_lang, top_lang_share) — the domain-level table a CCNet/
    RefinedWeb-style pipeline keeps to decide per-domain sampling rates and
    spot source-level anomalies (one domain flooding the corpus, a source
    whose language mix flipped).

    Exactness: counts and sums are exact int64; mean_chars and
    top_lang_share are each ONE correctly-rounded IEEE division of exact
    int64s, so results hash bit-identically vs a SQL oracle. top_lang ties
    break to the LEXICALLY GREATER language at equal count via max(struct)
    — spelled identically in the oracle, so ties agree.

    Plan shape (100 TB): two map-side-combinable aggregations — (source,
    lang) cells first, then source rolls up from the cell table, which is
    |sources| x |langs| rows, NOT corpus-sized. No collect_list, no window
    over raw rows, no join back to the corpus; a hot source never
    concentrates raw rows onto one reducer because the first combine
    happens map-side per (source, lang).
    """
    cells = df.groupBy(source_col, lang_col).agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(F.col(size_col).cast("long")).alias("__chars"),
    )
    rolled = cells.groupBy(source_col).agg(
        F.sum("__n").alias("n_docs"),
        F.sum("__chars").alias("total_chars"),
        F.count(F.lit(1)).alias("n_langs"),
        F.max(F.struct(F.col("__n").alias("n"), F.col(lang_col).alias("l"))).alias(
            "__top"
        ),
    )
    return rolled.select(
        source_col,
        "n_docs",
        "total_chars",
        (F.col("total_chars").cast("double") / F.col("n_docs").cast("double")).alias(
            "mean_chars"
        ),
        "n_langs",
        F.col("__top.l").alias("top_lang"),
        (F.col("__top.n").cast("double") / F.col("n_docs").cast("double")).alias(
            "top_lang_share"
        ),
    )


def perplexity_buckets(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    top_v: int = 5000,
) -> DataFrame:
    """CCNet's head/middle/tail split (Wenzek et al. 2020, public method):
    per language, rank documents by LM quality and cut the ranking into
    three equal buckets — 'head' feeds training first, 'tail' gets
    dropped or down-sampled. The quality key here is the UNSEEN-BIGRAM
    RATIO from text.lm_score (n_unseen / n_bigrams, ascending; empty
    documents pinned to 1.0 = worst), the integer-exact core of the
    perplexity signal: the ratio is ONE correctly-rounded IEEE division
    of exact int64s, so the ordering — and therefore every ntile bucket
    edge — is bit-identical in any IEEE engine (the float ln() layer of
    true perplexity is deliberately NOT in the ranking key; see
    text.lm_perplexity for why it cannot be hash-checked).

    Determinism: the bucket is defined by ntile(3) over ORDER BY
    (ratio, doc_id) — the id tiebreak makes the total order unique, so
    bucket assignment is engine-independent (the oracle keeps the ntile
    spelling).

    Plan (100 TB): lm_score's broadcast-LM scoring (corpus never
    shuffles), then a DISTRIBUTED two-pass rank instead of a
    lang-partitioned window: a per-language ntile window would put
    every English document through ONE reducer's sort — the classic
    skewed-window scale-killer.  Here the doc-stats table is
    range-partitioned on the full sort key (lang, ratio, doc_id), so a
    hot language is SPLIT across many range partitions; per-row rank =
    per-(partition, lang) row_number (bounded by the ~equal range
    partition size, not by language size) + a broadcast prefix-sum of
    the tiny (partition × lang) count table.  The rank — and therefore
    the bucket, computed from it with the exact ntile formula
    (base = n div 3, the first n mod 3 tiles get one extra row) — is
    bit-identical to the window spelling no matter where the sampled
    range boundaries fall, because range partitioning preserves the
    total key order and doc_id makes keys unique.
    """
    from sakura_spark.functions import text as T

    scored = T.lm_score(df, id_col=id_col, text_col=text_col, top_v=top_v)
    langs = df.select(id_col, lang_col)
    ratio = (
        F.when(F.col("n_bigrams") == 0, F.lit(1.0))
        .otherwise(
            F.col("n_unseen").cast("double") / F.col("n_bigrams").cast("double")
        )
        .alias("unseen_ratio")
    )
    staged = scored.join(langs, id_col).select(
        id_col, lang_col, "n_bigrams", "n_unseen", ratio
    )

    # Pass 1: range-partition on the sort key; partition ids are ordered
    # by key range, so per-lang prefix sums over __pid give global offsets.
    # PINNED (eager localCheckpoint, the graph._pin / duplicate_clusters
    # convention — runs a Spark job at call time): both consumers below
    # (the offset counts and the ranked rows) must see the SAME __pid
    # assignment. Unpinned, the plan tree evaluates this subtree twice
    # through two INDEPENDENT range exchanges — identical today only
    # because boundary sampling is deterministic over identical inputs,
    # and 2x the stats-table derivation cost; under AQE, REPARTITION_BY_COL
    # exchanges may also coalesce, and two exchanges coalescing
    # differently would silently mis-rank. The pin makes __pid a
    # materialized fact instead of a replayed computation.
    parted = (
        staged.repartitionByRange(lang_col, "unseen_ratio", id_col)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    counts = parted.groupBy("__pid", lang_col).agg(F.count(F.lit(1)).alias("__c"))
    w_prefix = (
        Window.partitionBy(lang_col)
        .orderBy("__pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "__pid",
        lang_col,
        F.coalesce(F.sum("__c").over(w_prefix), F.lit(0)).alias("__offset"),
        F.sum("__c").over(Window.partitionBy(lang_col)).alias("__n"),
    )

    # Pass 2: rank within (partition, lang) — bounded per task — then add
    # the broadcast offset and apply the ntile(3) size formula exactly.
    w_local = Window.partitionBy("__pid", lang_col).orderBy("unseen_ratio", id_col)
    ranked = (
        parted.withColumn("__rn", F.row_number().over(w_local))
        .join(F.broadcast(offsets), ["__pid", lang_col])
        .withColumn("__rank", F.col("__offset") + F.col("__rn"))
    )
    rem = F.col("__n") % F.lit(3)
    floor3 = ((F.col("__n") - rem) / F.lit(3)).cast("long")
    b1 = floor3 + F.when(rem >= 1, F.lit(1)).otherwise(F.lit(0))
    b2 = b1 + floor3 + F.when(rem >= 2, F.lit(1)).otherwise(F.lit(0))
    bucket = (
        F.when(F.col("__rank") <= b1, F.lit("head"))
        .when(F.col("__rank") <= b2, F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return ranked.withColumn("ppl_bucket", bucket).select(
        id_col, lang_col, "n_bigrams", "n_unseen", "unseen_ratio", "ppl_bucket"
    )


def leakage_safe_split(
    df: DataFrame,
    text_col: str = "text",
    boundaries: tuple[str, str] = ("cccc", "e666"),
    prefix_len: int = 4,
    group_col: str | None = None,
) -> DataFrame:
    """Train/val/test split keyed on CONTENT, not row identity: the split
    bucket hashes the canonical content fingerprint (or, when
    ``group_col`` is given, an upstream cluster id such as
    dedup.duplicate_clusters' representative), so every copy of a
    document — and with a cluster key, every NEAR-duplicate — lands in
    the SAME split. Splitting by row id (train_val_test_split) leaks:
    two copies of one document can straddle train and test, and the
    eval set silently overlaps training data; benchmark decontamination
    pipelines key their splits on content for exactly this reason.

    Same engine-portable md5-bucket discipline as deterministic_sample
    (no RNG, reproducible anywhere, adding data never reassigns existing
    rows). Map-only when keyed on the fingerprint — the fingerprint IS
    the leakage-coherence proof, no join or agg needed; with a cluster
    key the upstream clustering supplies its own shuffle."""
    from sakura_spark.functions.text import fingerprint_md5

    lo, hi = (b.lower() for b in boundaries)
    if not (len(lo) == len(hi) == prefix_len and lo < hi):
        raise ValueError(f"boundaries must be {prefix_len} hex chars with lo < hi")
    key = F.col(group_col) if group_col else fingerprint_md5(F.col(text_col))
    out = df.withColumn("fp", key)
    bucket = F.substring(F.md5(F.col("fp").cast("string")), 1, prefix_len)
    return out.withColumn(
        "split",
        F.when(bucket < F.lit(lo), F.lit("train"))
        .when(bucket < F.lit(hi), F.lit("val"))
        .otherwise(F.lit("test")),
    )
