"""Text analysis over document tables — pure Column expressions.

Every function here returns Column expressions built from
`pyspark.sql.functions`, so the whole text-quality pass runs inside
whole-stage codegen with zero Python in the hot path. At 100 TB this means
the document scan streams through one codegen'd stage: no shuffle, no UDF
serde, and column pruning reaches the parquet reader.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# --- tokenization -----------------------------------------------------------

_WS = r"\s+"


def bind_once(col: Column, fn) -> Column:
    """Evaluate ``col`` exactly once per row and hand it to ``fn`` as a
    BOUND lambda variable: ``element_at(transform(array(col), fn), 1)``.

    Higher-order functions evaluate their input array once, then bind
    each element as a NamedLambdaVariable — so every reference inside
    ``fn`` is a cheap variable read. Referencing a raw expression column
    from multiple places in one projection (slice + size + zip_with base,
    or worse, inside a per-element lambda) re-evaluates the whole subtree
    per reference — the repeated-re-tokenization failure measured at
    ~2-9x across this package's history (round-3 shingles, round-7 gram
    builders). Use this whenever an expensive array expression feeds a
    multi-reference expression and a separate projection is not
    available (Column-in/Column-out helpers)."""
    return F.element_at(F.transform(F.array(col), fn), 1)


def tokens(text: Column) -> Column:
    """Whitespace tokens of trimmed text; empty text -> empty array."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.array().cast("array<string>")).otherwise(
        F.split(t, _WS)
    )


def token_count(text: Column) -> Column:
    """Whitespace token count (0 for empty/blank text)."""
    return F.size(tokens(text)).cast("long")


def word_tokens(text: Column) -> Column:
    """Lowercased alphanumeric word tokens (splits on any non-alnum run;
    empty strings filtered). The normalization used by repetition metrics —
    deliberately the same contract DuckDB's regexp split gives, so the
    driver oracle matches byte-for-byte."""
    arr = F.split(F.lower(text), r"[^a-z0-9]+")
    return F.filter(arr, lambda x: x != "")


def type_token_ratio(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Lexical-diversity / repetition metric per document: distinct word
    count over total word count (type-token ratio). Low TTR flags
    boilerplate and template spam — a standard pre-training quality
    signal. Pure Column expressions, map-only, no shuffle."""
    toks = word_tokens(F.col(text_col))
    n = F.size(toks).cast("long")
    n_types = F.size(F.array_distinct(toks)).cast("long")
    return df.withColumns(
        {
            "n_words": n,
            "n_types": n_types,
            "ttr": F.when(n > 0, n_types.cast("double") / n.cast("double")),
        }
    )


def repetition_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition statistics per document (Rae et al. 2021,
    "Scaling Language Models: ... Gopher", Appendix A repetition filters —
    public algorithm): duplicate-line counts plus the word and 2-gram
    histogram peaks, from which the standard "fraction in duplicate
    lines / in the top n-gram" quality gates derive. Integer outputs only
    — engine-portable and hash-stable.

    Scale design: ONE corpus scan. Line stats are pure map-side array
    expressions; the word and 2-gram histograms train together — each
    document explodes once to tagged (order, gram) rows (explode_outer,
    so empty documents keep a null row instead of needing a join-back to
    the base scan), one map-side-combinable (doc, tag, gram) count
    aggregation builds both histograms, and a per-doc conditional
    aggregation takes the sums and peaks. The line stats ride along as
    group-constant columns (16 bytes per pair row — cheaper than the two
    doc_id join-backs + two extra corpus scans they replace). Sharded by
    document so no gram hot-key exists. No windows, no driver transfer."""
    t = F.col(text_col)
    lines = F.filter(
        F.transform(F.split(t, "\n"), lambda x: F.trim(x)), lambda x: x != ""
    )
    # Materialize the token array in its own projection BEFORE building
    # grams from it: _bigram_strings dereferences its input once per
    # element, and inlining the split+filter expression there makes Spark
    # re-tokenize the document per gram (the round-3 shingle lesson —
    # ~9x slower, measured). A multiply-referenced non-cheap alias is not
    # collapsed by CollapseProject, so __w evaluates once per document.
    base = df.select(
        id_col,
        word_tokens(t).alias("__w"),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(F.array_distinct(lines)).cast("long").alias("n_distinct_lines"),
    )
    w = F.col("__w")
    tagged = F.concat(
        F.transform(w, lambda x: F.struct(F.lit(0).alias("tag"), x.alias("g"))),
        F.transform(
            _bigram_strings(w),
            lambda g: F.struct(F.lit(1).alias("tag"), g.alias("g")),
        ),
    )
    occ = base.select(
        id_col,
        "n_lines",
        "n_distinct_lines",
        F.explode_outer(tagged).alias("p"),
    )
    pairs = occ.groupBy(
        id_col, F.col("p.tag").alias("__tag"), F.col("p.g").alias("__g")
    ).agg(
        F.count("*").alias("__c"),
        F.first("n_lines").alias("n_lines"),
        F.first("n_distinct_lines").alias("n_distinct_lines"),
    )
    return pairs.groupBy(id_col).agg(
        F.first("n_lines").alias("n_lines"),
        F.first("n_distinct_lines").alias("n_distinct_lines"),
        F.sum(F.when(F.col("__tag") == 0, F.col("__c")).otherwise(0))
        .cast("long")
        .alias("n_words"),
        F.coalesce(F.max(F.when(F.col("__tag") == 0, F.col("__c"))), F.lit(0))
        .cast("long")
        .alias("max_word_count"),
        F.sum(F.when(F.col("__tag") == 1, F.col("__c")).otherwise(0))
        .cast("long")
        .alias("n_bigrams"),
        F.coalesce(F.max(F.when(F.col("__tag") == 1, F.col("__c"))), F.lit(0))
        .cast("long")
        .alias("max_bigram_count"),
    )


def _bigram_strings(words: Column) -> Column:
    """Adjacent word pairs as 'w1 w2' strings; <2 words -> empty array."""
    return F.when(F.size(words) < 2, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.size(words) - 2),
            lambda i: F.concat_ws(
                " ", F.element_at(words, i + 1), F.element_at(words, i + 2)
            ),
        )
    )


def lm_tables(
    df: DataFrame, text_col: str = "text", top_v: int = 10000
) -> tuple[DataFrame, DataFrame]:
    """Corpus bigram/unigram count tables for n-gram LM filtering, pruned
    to the ``top_v`` most frequent grams per order (count desc, gram asc
    — a total order, so pruning is deterministic in any engine).

    Both orders train in ONE corpus pass: each document explodes to
    tagged (order, gram) rows, one map-side-combinable count aggregation
    covers both, and a per-order rank window applies the top-V cut. The
    pruned result — at most 2*top_v rows — is collected and re-created
    as local DataFrames (the documented vocabulary-sized driver
    transfer, same class as the IVF/PQ codebooks), so downstream scoring
    broadcasts a literal table instead of re-deriving the aggregation
    subtree. At 100 TB training is one scan, not two."""
    from pyspark.sql import Window as W

    w = F.col("__w")
    both = F.concat(
        F.transform(w, lambda x: F.struct(F.lit(0).alias("tag"), x.alias("g"))),
        F.transform(
            _bigram_strings(w),
            lambda g: F.struct(F.lit(1).alias("tag"), g.alias("g")),
        ),
    )
    ranked = (
        df.select(word_tokens(F.col(text_col)).alias("__w"))
        .select(F.explode(both).alias("p"))
        .select("p.tag", "p.g")
        .groupBy("tag", "g")
        .agg(F.count("*").alias("c"))
        .withColumn(
            "__rn",
            F.row_number().over(
                W.partitionBy("tag").orderBy(F.desc("c"), "g")
            ),
        )
        .filter(F.col("__rn") <= top_v)
        .collect()
    )
    spark = df.sparkSession
    uni = spark.createDataFrame(
        [(r["g"], r["c"]) for r in ranked if r["tag"] == 0], "w string, c1 long"
    )
    bi = spark.createDataFrame(
        [(r["g"], r["c"]) for r in ranked if r["tag"] == 1], "g string, c2 long"
    )
    return uni, bi


def lm_score(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_v: int = 10000,
) -> DataFrame:
    """N-gram LM hit statistics per document — the distributed-bigram
    analogue of CCNet's KenLM perplexity filtering (Wenzek et al. 2020,
    public method): score each document's bigrams against a corpus LM.
    Outputs are integer-exact (bigram totals, unseen counts, hit-mass
    sums), so the driver hash is stable; the float cross-entropy layer
    lives in :func:`lm_perplexity` (ln() differs in the last ulp across
    engines, so it is pytest-checked instead of SQL-hash-checked).

    Scale design: the LM tables are pruned to top_v grams and BROADCAST,
    so scoring is a map-side join — the corpus never shuffles and the
    hot-gram skew of a shuffle join on 'of the' never exists. The only
    corpus-sized jobs are the two training count aggs. Empty-bigram
    documents are kept by ``explode_outer`` (one null-gram row each) and
    zeroed by conditional aggregation — no join-back to the base scan, so
    the corpus is read once for scoring and the plan contains only the
    two broadcast joins (plan-asserted in tests/test_scale.py)."""
    uni, bi = lm_tables(df, text_col=text_col, top_v=top_v)
    # Token array materialized in its own projection (see repetition_stats:
    # inlining it into _bigram_strings re-tokenizes per gram).
    occ = (
        df.select(id_col, word_tokens(F.col(text_col)).alias("__w"))
        .select(id_col, F.explode_outer(_bigram_strings(F.col("__w"))).alias("g"))
        .withColumn("w1", F.split(F.col("g"), " ").getItem(0))
    )
    scored = occ.join(F.broadcast(bi), "g", "left").join(
        F.broadcast(uni.withColumnRenamed("w", "w1")), "w1", "left"
    )
    return scored.groupBy(id_col).agg(
        F.count("g").cast("long").alias("n_bigrams"),
        F.sum(F.when(F.col("g").isNotNull() & F.col("c2").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_unseen"),
        F.sum(F.coalesce(F.col("c2"), F.lit(0)))
        .cast("long")
        .alias("sum_bigram_count"),
        F.sum(F.coalesce(F.col("c1"), F.lit(0)))
        .cast("long")
        .alias("sum_context_count"),
    )


def lm_perplexity(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_v: int = 10000,
) -> DataFrame:
    """Per-document bigram cross-entropy and perplexity under an add-one
    smoothed corpus LM: logp(w2|w1) = ln((c2+1)/(c1'+V)) with V the pruned
    unigram vocabulary size, counts 0 for pruned/unseen grams, and
    c1' = max(c1, c2) — the context count clamped to at least the bigram
    count. The clamp matters only when the two tables prune incoherently
    (a bigram survives top-V while its context unigram is pruned, which
    real counts can't produce: c(w1) >= c(w1 w2) always); without it,
    (c2+1)/(0+V) can exceed 1 on skewed corpora, yielding positive logp
    and perplexity < 1. With it, probabilities stay <= 1 and perplexity
    >= 1 unconditionally. The float layer over :func:`lm_score`'s plan
    (same broadcast joins, same explode_outer no-join-back shape);
    exactness is pytest-checked against a pure-Python reference because
    ln() is not bit-identical across engines. Documents with no bigrams
    get NULLs."""
    uni, bi = lm_tables(df, text_col=text_col, top_v=top_v)
    vocab_v = uni.count()
    occ = (
        df.select(id_col, word_tokens(F.col(text_col)).alias("__w"))
        .select(id_col, F.explode_outer(_bigram_strings(F.col("__w"))).alias("g"))
        .withColumn("w1", F.split(F.col("g"), " ").getItem(0))
    )
    scored = occ.join(F.broadcast(bi), "g", "left").join(
        F.broadcast(uni.withColumnRenamed("w", "w1")), "w1", "left"
    )
    c2 = F.coalesce(F.col("c2"), F.lit(0))
    c1 = F.greatest(F.coalesce(F.col("c1"), F.lit(0)), c2)
    logp = F.log((c2 + F.lit(1.0)) / (c1 + F.lit(float(vocab_v))))
    per_doc = scored.groupBy(id_col).agg(
        F.count("g").cast("long").alias("n_bigrams"),
        F.avg(F.when(F.col("g").isNotNull(), logp)).alias("__mean_logp"),
    )
    return per_doc.select(
        id_col,
        "n_bigrams",
        (-F.col("__mean_logp")).alias("cross_entropy"),
        F.exp(-F.col("__mean_logp")).alias("perplexity"),
    )


def bpe_ish_token_count(text: Column) -> Column:
    """Sub-word-ish token estimate: split on whitespace AND punctuation
    boundaries (a cheap, deterministic stand-in for a BPE tokenizer).
    """
    t = F.trim(F.regexp_replace(text, r"([^\w\s])", r" $1 "))
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(F.size(F.split(t, _WS))).cast("long")


def char_count(text: Column) -> Column:
    return F.length(text).cast("long")


# --- quality scoring --------------------------------------------------------


def digit_ratio(text: Column) -> Column:
    """Fraction of characters that are digits (0.0 for empty text)."""
    n = F.length(text)
    d = n - F.length(F.regexp_replace(text, "[0-9]", ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(d.cast("double") / n.cast("double"))


def space_ratio(text: Column) -> Column:
    n = F.length(text)
    s = n - F.length(F.regexp_replace(text, " ", ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(s.cast("double") / n.cast("double"))


def mean_token_len(text: Column) -> Column:
    tc = token_count(text)
    nonspace = F.length(F.regexp_replace(F.trim(text), _WS, ""))
    return F.when(tc == 0, F.lit(0.0)).otherwise(nonspace.cast("double") / tc.cast("double"))


_EN_STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"]


def stopword_ratio(text: Column, stopwords: list[str] | None = None) -> Column:
    """Fraction of tokens that are (lowercase) stopwords."""
    sw = F.array(*[F.lit(w) for w in (stopwords or _EN_STOPWORDS)])
    toks = tokens(F.lower(text))
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(
        hits.cast("double") / F.size(toks).cast("double")
    )


def quality_flags(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the standard quality columns.

    The lowercased token array is computed ONCE per row (bind_once) and
    every token-derived metric (count, mean length, stopword ratio) reads
    the bound value — the independent per-metric expressions each
    re-tokenized the text, ~4 tokenizations per row. Character-class
    ratios work on the raw text. Two projections (compute the metric
    struct, then unpack it) keep the bound struct from being re-evaluated
    per extracted field."""
    t = F.col(text_col)
    sw = F.array(*[F.lit(w) for w in _EN_STOPWORDS])

    def metrics(toks: Column) -> Column:
        n = F.size(toks)
        nonspace = F.length(F.regexp_replace(F.trim(t), _WS, ""))
        hits = F.size(F.filter(toks, lambda x: F.array_contains(sw, x)))
        return F.struct(
            n.cast("long").alias("n_tokens"),
            F.when(n == 0, F.lit(0.0))
            .otherwise(nonspace.cast("double") / n.cast("double"))
            .alias("mean_token_len"),
            F.when(n == 0, F.lit(0.0))
            .otherwise(hits.cast("double") / n.cast("double"))
            .alias("stopword_ratio"),
        )

    staged = df.withColumn("__q", bind_once(tokens(F.lower(t)), metrics))
    return (
        staged.withColumn("n_tokens", F.col("__q.n_tokens"))
        .withColumn("n_chars_m", char_count(t))
        .withColumn("digit_ratio", digit_ratio(t))
        .withColumn("space_ratio", space_ratio(t))
        .withColumn("mean_token_len", F.col("__q.mean_token_len"))
        .withColumn("stopword_ratio", F.col("__q.stopword_ratio"))
        .withColumn(
            "quality_ok",
            (F.col("n_tokens") >= 5)
            & (F.col("digit_ratio") < 0.3)
            & (F.col("mean_token_len") > 1.0),
        )
        .drop("__q")
    )


# --- readability -------------------------------------------------------------


def readability(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach Flesch reading-ease and Flesch-Kincaid grade columns
    (n_words, n_sentences, n_syllables, flesch, fk_grade) — the standard
    cheap readability pair used as a corpus-quality signal (Flesch 1948;
    Kincaid et al. 1975).

    Counting is REGEX-EXACT so a SQL oracle reproduces it bit-for-bit:
    words = matches of [A-Za-z]+, sentence breaks = matches of [.!?]+
    (floored at 1 so headline-ish fragments count as one sentence),
    syllables = vowel-group matches [aeiouyAEIOUY]+ (the classic
    one-pass approximation: consecutive vowels = one nucleus; silent-e
    and diphthong corrections are deliberately out of scope — both
    engines run the SAME heuristic so the scores agree exactly).

    Float discipline (the sim_cosine_topk rule): each rate is ONE
    correctly-rounded IEEE division of exact int64 counts, and the score
    combines rates with left-associative literal multiply-adds —
    `206.835 - 1.015 * wps - 84.6 * spw` — so any two IEEE-754 engines
    parsing the same decimal literals produce bit-identical doubles.
    Empty documents (0 words) get 0.0 for both scores rather than NULL.

    Plan: three regexp_count expressions over the raw text, map-only —
    no shuffle, no Python; scales embarrassingly.
    """
    t = F.col(text_col)
    words = F.regexp_count(t, F.lit(r"[A-Za-z]+")).cast("long")
    sents = F.greatest(
        F.regexp_count(t, F.lit(r"[.!?]+")).cast("long"), F.lit(1).cast("long")
    )
    syls = F.regexp_count(t, F.lit(r"[aeiouyAEIOUY]+")).cast("long")
    wps = words.cast("double") / sents.cast("double")
    spw = syls.cast("double") / words.cast("double")
    flesch = F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw
    grade = F.lit(0.39) * wps + F.lit(11.8) * spw - F.lit(15.59)
    zero = F.lit(0.0)
    return (
        df.withColumn("n_words", words)
        .withColumn("n_sentences", sents)
        .withColumn("n_syllables", syls)
        .withColumn("flesch", F.when(words == 0, zero).otherwise(flesch))
        .withColumn("fk_grade", F.when(words == 0, zero).otherwise(grade))
    )


def readability_oracle_sql(table_sql: str, text_col: str = "text") -> str:
    """DuckDB twin of :func:`readability` — same regexes, same floored
    sentence count, same left-associative literal arithmetic; generated
    here so the two spellings cannot drift. ``table_sql`` must yield the
    text column (plus any pass-through columns the caller selects)."""
    w = f"len(regexp_extract_all({text_col}, '[A-Za-z]+'))"
    s = f"greatest(len(regexp_extract_all({text_col}, '[.!?]+')), 1)"
    y = f"len(regexp_extract_all({text_col}, '[aeiouyAEIOUY]+'))"
    return (
        f"WITH src AS ({table_sql}), c AS (SELECT *, "
        f"CAST({w} AS BIGINT) AS n_words, CAST({s} AS BIGINT) AS n_sentences, "
        f"CAST({y} AS BIGINT) AS n_syllables FROM src) "
        "SELECT * EXCLUDE (" + text_col + "), "
        "CASE WHEN n_words = 0 THEN 0.0 ELSE "
        "206.835 - 1.015 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE)) "
        "- 84.6 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE)) END AS flesch, "
        "CASE WHEN n_words = 0 THEN 0.0 ELSE "
        "0.39 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE)) "
        "+ 11.8 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE)) - 15.59 END "
        "AS fk_grade FROM c"
    )


# --- language identification ------------------------------------------------

# Tiny per-language marker lexicons. A real pipeline swaps in fastText/cld3;
# the Spark-side shape (pure expression scoring, argmax) is the point.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["und", "der", "die", "nicht", "ist"],
    "fr": ["le", "et", "les", "des", "est"],
    "es": ["el", "de", "los", "que", "es"],
}


def lang_scores(text: Column) -> dict[str, Column]:
    """Marker-hit count per language, via LIKE on space-padded lowercase text
    (expressible identically in any ANSI engine for oracle parity)."""
    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    out = {}
    for lang, words in LANG_MARKERS.items():
        score = None
        for w in words:
            hit = F.when(padded.like(f"% {w} %"), 1).otherwise(0)
            score = hit if score is None else score + hit
        out[lang] = score
    return out


def lang_id(text: Column) -> Column:
    """Argmax language with CJK regex override; 'und' when no marker hits.
    Deterministic tie-break: fixed priority list below (first max wins).
    The space-padded lowercase text is bound ONCE (bind_once) — the
    argmax fold references each language score twice and each score is
    five LIKEs, so the raw expression form lowercases+pads the document
    ~40 times per row."""
    has_cjk = F.length(F.regexp_replace(text, "[一-鿿]", "")) < F.length(text)

    def pick(padded: Column) -> Column:
        best = F.lit("und")
        best_score = F.lit(0)
        # Iterate in fixed priority; strict > keeps the earliest max.
        for lang, words in [(lg, LANG_MARKERS[lg]) for lg in ["en", "de", "fr", "es"]]:
            score = None
            for w in words:
                hit = F.when(padded.like(f"% {w} %"), 1).otherwise(0)
                score = hit if score is None else score + hit
            cond = score > best_score
            best = F.when(cond, F.lit(lang)).otherwise(best)
            best_score = F.when(cond, score).otherwise(best_score)
        return best

    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    return F.when(has_cjk, F.lit("zh")).otherwise(bind_once(padded, pick))


# --- fingerprinting ---------------------------------------------------------


def fingerprint_md5(text: Column) -> Column:
    """Canonical-text content fingerprint (lowercased, trimmed, whitespace
    collapsed) — the exact-dedup key."""
    canon = F.regexp_replace(F.lower(F.trim(text)), _WS, " ")
    return F.md5(canon)


def rolling_hashes(text: Column, window: int = 8) -> Column:
    """Per-document array of rolling window hashes over tokens (winnowing
    fingerprint precursor): xxhash64 of each `window`-token shingle.
    Token array bound once via :func:`bind_once` — slicing it inside the
    per-window lambda would otherwise re-tokenize the document per
    window."""

    def build(toks: Column) -> Column:
        n = F.size(toks)
        idx = F.sequence(F.lit(0), F.greatest(n - window, F.lit(0)))
        return F.when(n < window, F.array().cast("array<bigint>")).otherwise(
            F.transform(
                idx,
                lambda i: F.xxhash64(F.concat_ws(" ", F.slice(toks, i + 1, window))),
            )
        )

    return bind_once(tokens(F.lower(text)), build)


def winnowing_fingerprint(text: Column, window: int = 8, keep: int = 4) -> Column:
    """Keep the `keep` smallest rolling hashes — a compact, order-insensitive
    document signature robust to local edits (MOSS-style winnowing)."""
    return F.slice(F.array_sort(rolling_hashes(text, window)), 1, keep)


# --- PII redaction ----------------------------------------------------------

# Patterns restricted to syntax with identical semantics in Java regex
# (Spark) and RE2 (DuckDB oracle): no backrefs, no lookaround, plain
# character classes and bounded repetition.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE = r"\b\d{3}[- ]\d{3}[- ]\d{4}\b"


def pii_counts(text: Column) -> dict[str, Column]:
    """Match counts per PII class (email / ipv4 / phone), as long columns.

    Counted BEFORE redaction on the raw text; pure regexp_extract_all
    expressions, no Python in the plan."""
    return {
        "email_hits": F.size(F.regexp_extract_all(text, F.lit(PII_EMAIL), F.lit(0))).cast("long"),
        "ip_hits": F.size(F.regexp_extract_all(text, F.lit(PII_IPV4), F.lit(0))).cast("long"),
        "phone_hits": F.size(F.regexp_extract_all(text, F.lit(PII_PHONE), F.lit(0))).cast("long"),
    }


def redact_pii(text: Column) -> Column:
    """Replace emails/IPv4s/phone numbers with typed placeholder tokens —
    the standard scrub step before corpus text reaches training shards.

    Replacement order (email, then ip, then phone) is fixed so every
    engine produces byte-identical output; each pass is one
    regexp_replace, JVM-side, map-only at any scale."""
    out = F.regexp_replace(text, PII_EMAIL, "<EMAIL>")
    out = F.regexp_replace(out, PII_IPV4, "<IP>")
    return F.regexp_replace(out, PII_PHONE, "<PHONE>")


# --- whitespace / control normalization -------------------------------------

# Ordered (pattern, replacement) passes. Patterns restricted to syntax with
# identical semantics in Java regex (Spark) and RE2 (DuckDB oracle): literal
# \x{...} escapes, plain classes, bounded/greedy repetition, and ^/$ in their
# default non-multiline meaning. Order matters:
#   1. line endings unify first so later newline rules see only \n;
#   2. C0 controls (minus \t\n) and DEL are stripped — notably \x0B, the one
#      char where Java's \s and RE2's \s disagree, so no later pass may use
#      bare \s;
#   3. zero-width chars and soft hyphens vanish (they break tokenizers while
#      being invisible to humans — classic web-scrape noise);
#   4. exotic Unicode spaces become ASCII space BEFORE horizontal runs
#      collapse, so "a  b" ends as "a b" not "a  b";
#   5-7. horizontal runs collapse, spaces hugging newlines drop, 3+ blank
#      lines become one paragraph break;
#   8-9. outer trim. After pass 5 only ' ' and '\n' whitespace remain, so the
#      trim classes are exact.
NORMALIZE_STEPS: list[tuple[str, str]] = [
    (r"\r\n?", "\n"),
    (r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]", ""),
    (r"[\x{200B}-\x{200D}\x{FEFF}\x{00AD}]", ""),
    (r"[\x{00A0}\x{1680}\x{2000}-\x{200A}\x{202F}\x{205F}\x{3000}]", " "),
    (r"[ \t]+", " "),
    (r" ?\n ?", "\n"),
    (r"\n{3,}", "\n\n"),
    (r"^[ \n]+", ""),
    (r"[ \n]+$", ""),
]


def normalize_text(text: Column) -> Column:
    """Canonical whitespace/control cleanup — the first map of every
    web-corpus ingestion pipeline (C4 and Dolma both start here; cf.
    reference quality gates lib/algebra.ml:66 select over scalar exprs).

    Nine chained regexp_replace passes (NORMALIZE_STEPS), all JVM-side
    inside one whole-stage-codegen projection: CRLF unification, control
    stripping, zero-width/soft-hyphen removal, Unicode-space folding,
    run collapsing, paragraph-break limiting, outer trim. Map-only at any
    scale — at 100 TB this fuses with the parquet scan and whatever
    filter follows; no shuffle, no Python."""
    out = text
    for pat, rep in NORMALIZE_STEPS:
        out = F.regexp_replace(out, pat, rep)
    return out


def nfkc_normalize(df: DataFrame, text_col: str = "text", out_col: str = "nfkc_text") -> DataFrame:
    """Unicode NFKC compatibility normalization (ligatures, fullwidth forms,
    compatibility digits → canonical ASCII-ish forms) as an Arrow-batched
    pandas UDF — the one normalization step the JVM expression library
    cannot express. Python, but vectorized per Arrow batch and map-only;
    keep it AFTER cheap JVM-side filters so it only touches surviving rows."""
    import unicodedata

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _nfkc_fn(s):
        return s.map(lambda t: unicodedata.normalize("NFKC", t) if t is not None else None)

    # Annotations set as live objects (not strings): this module's
    # `from __future__ import annotations` would otherwise hand pyspark's
    # hint-inference unresolvable "pd.Series" strings.
    _nfkc_fn.__annotations__ = {"s": pd.Series, "return": pd.Series}
    _nfkc = pandas_udf(_nfkc_fn, "string")

    return df.withColumn(out_col, _nfkc(F.col(text_col)))


# --- context-window chunking ------------------------------------------------


def chunk_text(
    df: DataFrame,
    text_col: str = "text",
    size: int = 160,
    overlap: int = 32,
) -> DataFrame:
    """Split each document into fixed-width character windows with
    ``overlap`` characters of context shared between consecutive chunks —
    the standard context-window splitter in front of an embedding model or
    a fixed-sequence-length trainer (RAG chunking / long-doc truncation).

    Chunk ``i`` covers characters ``[i*step, i*step + size)`` where
    ``step = size - overlap``; the number of chunks is
    ``1 + ceil((n - size) / step)`` (one chunk when ``n <= size``, and an
    empty document still yields its one empty chunk so no row is silently
    dropped). All arithmetic is integer (`div`), so chunk boundaries are
    engine-exact and the DuckDB oracle reproduces them bit-for-bit.

    Plan: pure Column expressions — ``sequence`` + ``explode`` + dynamic
    ``substr`` — one map-only stage, no shuffle, no Python. At 100 TB the
    explode multiplies rows ~n/step per document but stays fused with the
    parquet scan; output size is input * (1 + overlap/step), the only
    amplification. Adds ``chunk_id``, ``n_chunks``, ``chunk``,
    ``chunk_len`` to every input row.
    """
    if overlap >= size:
        raise ValueError("overlap must be smaller than size")
    step = size - overlap
    n = F.length(F.col(text_col))
    n_chunks = F.when(n <= size, F.lit(1)).otherwise(
        F.lit(1) + F.expr(f"(length({text_col}) - {size} + {step - 1}) div {step}")
    )
    out = df.withColumn("n_chunks", n_chunks.cast("int"))
    out = out.withColumn(
        "chunk_id", F.explode(F.sequence(F.lit(0), F.col("n_chunks") - 1))
    )
    chunk = F.col(text_col).substr(
        F.col("chunk_id") * step + 1, F.lit(size)
    )
    return out.withColumn("chunk", chunk).withColumn(
        "chunk_len", F.length(F.col("chunk"))
    )


def hash_features(
    df: DataFrame,
    dim: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "fh",
) -> DataFrame:
    """Hashing-trick featurizer (Weinberger et al. 2009, ICML "Feature
    Hashing for Large Scale Multitask Learning"): token t contributes a
    +-1 sign to bucket h(t) mod dim, so every document becomes a
    fixed-width sparse vector with approximately-preserved inner
    products — the standard dictionary-free featurization for linear
    quality/classifier models over an unbounded vocabulary. No trained
    state, no vocabulary shuffle, no driver transfer.

    Output: sparse (id, bucket, val) triples; val sums the signs of the
    bucket's token OCCURRENCES (duplicates count, as the estimator
    requires). Bucket is the engine-portable 60-bit sha256 word mod dim
    and the sign comes from the word's disjoint second digest slice, so
    a DuckDB oracle reproduces every triple bit-for-bit.

    Plan: explode lowercased whitespace tokens, then ONE map-side-
    combinable groupBy on (id, bucket) — the shuffle carries (id,
    int bucket, +-1); output is at most min(dim, distinct buckets) rows
    per document at any corpus size.
    """
    from sakura_spark.functions.sketches import hash_word

    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("t"),
    )
    h = hash_word(F.col("t"), salt)
    s = hash_word(F.col("t"), salt, word=1)
    feat = toks.select(
        "id",
        (h % F.lit(dim)).cast("int").alias("bucket"),
        F.when(s % 2 == 0, F.lit(1)).otherwise(F.lit(-1)).alias("sgn"),
    )
    return feat.groupBy("id", "bucket").agg(
        F.sum("sgn").cast("long").alias("val")
    )


def hash_features_oracle_sql(
    docs_sql: str, dim: int = 256, salt: str = "fh"
) -> str:
    """DuckDB twin of :func:`hash_features`, same sha256-word spelling
    as the portable MinHash oracles (bucket = first 15 hex chars, sign =
    the second disjoint 15-char slice). ``docs_sql`` yields (id, text)."""
    b = f"('0x' || substr(sha256(concat_ws(chr(31), '{salt}', t)), 1, 15))::BIGINT"
    s = f"('0x' || substr(sha256(concat_ws(chr(31), '{salt}', t)), 16, 15))::BIGINT"
    return (
        f"WITH src AS ({docs_sql}), "
        "toks AS (SELECT id, unnest(regexp_split_to_array(trim(lower(text)), "
        "'\\s+')) AS t FROM src WHERE len(trim(text)) > 0), "
        f"h AS (SELECT id, CAST({b} % {dim} AS INT) AS bucket, "
        f"CASE WHEN {s} % 2 = 0 THEN 1 ELSE -1 END AS sgn FROM toks) "
        "SELECT id, bucket, CAST(sum(sgn) AS BIGINT) AS val "
        "FROM h GROUP BY id, bucket"
    )


def hash_score(
    df: DataFrame,
    weights: list[int],
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "fh",
) -> DataFrame:
    """Linear-model inference over hashed features — the serving path of
    a fastText/DCLM-style quality filter: score(doc) = sum over token
    OCCURRENCES of sign(t) * weights[bucket(t)], with bucket/sign drawn
    from the same disjoint sha256-word slices as :func:`hash_features`.
    INTEGER weights keep the distributed sum commutative, so the score
    is engine-exact (a float weight vector would make the result depend
    on shuffle order). Weights inline as a literal array — no weight
    table, no join, no state; one explode plus one map-side-combinable
    groupBy(id) at any corpus size. Output: (id, n_tokens, score); docs
    with no tokens are absent (same contract as the signature
    operators). Train the weights offline however you like — serving
    only needs this row of integers."""
    from sakura_spark.functions.sketches import hash_word

    dim = len(weights)
    if dim == 0:
        raise ValueError("hash_score: weights must be non-empty")
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("t"),
    )
    h = hash_word(F.col("t"), salt)
    s = hash_word(F.col("t"), salt, word=1)
    wlit = F.array(*[F.lit(int(w)) for w in weights])
    contrib = F.when(s % 2 == 0, F.lit(1)).otherwise(F.lit(-1)) * F.element_at(
        wlit, (h % F.lit(dim)).cast("int") + 1
    )
    return toks.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(contrib).cast("long").alias("score"),
    )


def hash_score_oracle_sql(
    docs_sql: str, weights: list[int], salt: str = "fh"
) -> str:
    """DuckDB twin of :func:`hash_score` — same sha256-word slices as
    the hash_features oracle, the weight vector as a literal list
    indexed by bucket. ``docs_sql`` yields (id, text)."""
    dim = len(weights)
    b = f"('0x' || substr(sha256(concat_ws(chr(31), '{salt}', t)), 1, 15))::BIGINT"
    s = f"('0x' || substr(sha256(concat_ws(chr(31), '{salt}', t)), 16, 15))::BIGINT"
    wlist = "[" + ", ".join(str(int(w)) for w in weights) + "]"
    return (
        f"WITH src AS ({docs_sql}), "
        "toks AS (SELECT id, unnest(regexp_split_to_array(trim(lower(text)), "
        "'\\s+')) AS t FROM src WHERE len(trim(text)) > 0), "
        f"h AS (SELECT id, (CASE WHEN {s} % 2 = 0 THEN 1 ELSE -1 END) * "
        f"({wlist}[CAST({b} % {dim} AS INT) + 1]) AS c FROM toks) "
        "SELECT id, CAST(count(*) AS BIGINT) AS n_tokens, "
        "CAST(sum(c) AS BIGINT) AS score FROM h GROUP BY id"
    )
