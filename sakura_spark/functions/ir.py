"""Information-retrieval operators over the documents corpus: TF-IDF,
bigram collocations (PMI), and a rare-term inverted index.

The reference's query surface stops at relational algebra + the curation
families; these are the standard IR statistics a training-data pipeline
layers on top (keyword extraction for topic quotas, collocation mining for
tokenizer merge seeding, a rare-term index for targeted decontamination
lookups). Design rules follow the repo conventions:

- The ORACLE-CHECKED surface is integer/string-exact (term counts, doc
  frequencies, joined posting strings). Float layers (tf-idf weight, PMI)
  are separate functions pytest-checked against driver-side math — ln()
  is not bit-stable across engines (same split as text.lm_score vs
  text.lm_perplexity).
- Tokenization is text.word_tokens: lower + split on non-alphanumeric
  runs, the contract DuckDB's regexp split reproduces byte-for-byte.

Scale shape (100 TB):
- (doc, term) / (w1, w2) counts are map-side-combinable groupBys — the
  combiner collapses each partition's repeats before the shuffle.
- Vocabulary-keyed tables (doc_freq, unigram counts) are vocab-sized;
  joins against them broadcast (plan-asserted in tests/test_scale.py).
- Per-doc top-k is one window over doc_id; global collocation top-k is a
  TakeOrderedAndProject (no full sort).
- The inverted index collects postings ONLY for terms at or below a doc-
  frequency cap: rare terms by construction, so no stopword hot key and
  every posting list is short. Common-term postings at corpus scale are
  compressed-bitmap territory, out of scope by contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sakura_spark.functions.text import word_tokens


def term_counts(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, term, tf): per-document term frequencies. One explode + one
    map-side-combinable groupBy; nothing else touches the corpus."""
    return (
        df.select(id_col, F.explode(word_tokens(F.col(text_col))).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
    )


def doc_freq(tc: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(term, df): number of documents containing each term. Input is
    term_counts (already one row per (doc, term)), so this is a plain
    count — vocab-sized output, broadcastable."""
    return tc.groupBy("term").agg(F.count(id_col).alias("df"))


def tfidf(
    df: DataFrame,
    n_docs: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, term, tf, df, tfidf): smoothed tf-idf weight per (doc, term):
    ``tf * ln((1 + n_docs) / (1 + df))``. Float layer — pytest-checked,
    not oracle-hashed (ln() bit-stability). ``n_docs`` is passed in so the
    plan stays action-free."""
    tc = term_counts(df, id_col, text_col)
    dfreq = doc_freq(tc, id_col)
    idf = F.log((1.0 + float(n_docs)) / (1.0 + F.col("df")))
    return tc.join(F.broadcast(dfreq), "term").select(
        id_col,
        "term",
        "tf",
        "df",
        (F.col("tf") * idf).alias("tfidf"),
    )


def tfidf_topk(
    df: DataFrame,
    k: int = 5,
    max_df: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, term, tf, df): the top-k characteristic terms per document —
    ranked by term frequency with a deterministic term-asc tiebreak,
    after dropping terms whose document frequency exceeds ``max_df``
    (the integer-exact spelling of idf down-weighting: corpus-wide terms
    carry no signal and are excluded outright; the float-weighted variant
    is :func:`tfidf`). Oracle-checked surface: all integers/strings.

    Plan: groupBy (doc, term) -> broadcast join against the vocab-sized
    df table -> one doc_id window for the top-k."""
    tc = term_counts(df, id_col, text_col)
    dfreq = doc_freq(tc, id_col)
    if max_df is not None:
        dfreq = dfreq.filter(F.col("df") <= max_df)
    joined = tc.join(F.broadcast(dfreq), "term")
    w = Window.partitionBy(id_col).orderBy(F.col("tf").desc(), F.col("term").asc())
    return (
        joined.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select(id_col, "term", "tf", "df")
    )


def bigram_counts(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(w1, w2, n_xy): corpus-wide adjacent-pair counts. The pair array
    is built per row (zip of the token array with its tail) and exploded
    once; the groupBy is map-side-combinable."""
    toks = word_tokens(F.col(text_col))
    pairs = F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    return (
        df.select(F.explode(pairs).alias("p"))
        .select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("n_xy"))
    )


def unigram_counts(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(w, n): corpus-wide token counts — vocab-sized, broadcastable."""
    return (
        df.select(F.explode(word_tokens(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("n"))
    )


def collocations_topk(
    df: DataFrame,
    k: int = 20,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(w1, w2, n_xy, n_x, n_y): the k most frequent adjacent word pairs
    with their pair and unigram counts — the integer-exact inputs to PMI
    (the float PMI layer is :func:`pmi`). Deterministic order: count
    desc, then (w1, w2) asc. Oracle-checked surface.

    Plan: one bigram groupBy + two broadcast joins against the vocab-
    sized unigram table; the top-k is a TakeOrderedAndProject."""
    bg = bigram_counts(df, id_col, text_col).filter(F.col("n_xy") >= min_count)
    uni = unigram_counts(df, id_col, text_col)
    joined = (
        bg.join(F.broadcast(uni.withColumnRenamed("w", "w1")), "w1")
        .withColumnRenamed("n", "n_x")
        .join(
            F.broadcast(
                uni.withColumnRenamed("w", "w2").withColumnRenamed("n", "n_y")
            ),
            "w2",
        )
    )
    return joined.select("w1", "w2", "n_xy", "n_x", "n_y").orderBy(
        F.col("n_xy").desc(), F.col("w1").asc(), F.col("w2").asc()
    ).limit(k)


def pmi(colloc: DataFrame, total_tokens: int) -> DataFrame:
    """Pointwise mutual information over :func:`collocations_topk`
    output: ``ln(n_xy * N / (n_x * n_y))``. Float layer — pytest-checked
    against driver-side math, not oracle-hashed."""
    n = F.lit(float(total_tokens))
    return colloc.withColumn(
        "pmi",
        F.log(F.col("n_xy").cast("double") * n / (F.col("n_x") * F.col("n_y"))),
    )


def bm25_saturation_topk(
    df: DataFrame,
    query_terms: list[str],
    k: int = 20,
    max_df: int | None = None,
    k1: tuple[int, int] = (6, 5),
    b: tuple[int, int] = (3, 4),
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k documents for a fixed query under BM25's tf-saturation
    scoring (Robertson et al., Okapi BM25) — hash-stable across engines.

    Each matched query term contributes the BM25 term weight

        s = tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))

    with k1, b as exact rationals (defaults 6/5, 3/4) and avgdl = L/N
    (corpus token total / doc count). Clearing denominators makes both
    sides of the division exact int64:

        num = tf * (k1n+k1d) * bd * L
        den = tf * k1d*bd*L  +  k1n*(bd-bn)*L  +  k1n*bn*dl*N

    so ``s`` is ONE correctly-rounded IEEE division of exactly-represented
    integers — bit-identical in any IEEE engine (the same discipline as
    sim_cosine_topk's fold). The per-document score sums each term's s in
    FIXED query order via conditional aggregation, so the addition order
    is part of the contract and the final double hashes exactly. The idf
    factor is applied in its integer-exact spelling — terms above
    ``max_df`` are dropped outright (same convention as tfidf_topk); the
    float ln() idf variant is :func:`bm25` (pytest-checked — ln is not
    bit-stable across engines).

    Scale shape: corpus totals (L, N) are ONE eager aggregate at call time
    (documented, like the sketch builders — the constants must become plan
    literals); scoring is then a single corpus pass: tokenize -> explode
    with the per-doc length riding each row -> map-side isin() prune to
    the query terms (a handful of grams — the filter reaches the explode,
    nothing else survives to the shuffle) -> one (doc,dl,term) count agg
    -> one conditional agg per doc -> TakeOrderedAndProject for the
    top-k. No join-back to the corpus, no vocabulary table needed."""
    if not query_terms:
        raise ValueError("bm25_saturation_topk needs at least one query term")
    # Dedupe while preserving order: a repeated term would otherwise be
    # silently double-counted in the score (two identical conditional
    # sums), and FIXED query order is part of the hash contract.
    seen: set[str] = set()
    query_terms = [t for t in query_terms if not (t in seen or seen.add(t))]
    k1n, k1d = k1
    bn, bd = b
    toks = word_tokens(F.col(text_col))
    totals = (
        df.select(F.sum(F.size(toks)).alias("L"), F.count("*").alias("N"))
        .first()
    )
    if int(totals["N"]) == 0:
        # sum() over zero rows is NULL — surface the real problem instead
        # of a TypeError on int(None).
        raise ValueError("bm25_saturation_topk: empty corpus")
    L, N = int(totals["L"]), int(totals["N"])

    matched = (
        df.select(id_col, F.size(toks).alias("dl"), F.explode(toks).alias("term"))
        .filter(F.col("term").isin(list(query_terms)))
        .groupBy(id_col, "dl", "term")
        .agg(F.count("*").alias("tf"))
    )
    if max_df is not None:
        dfreq = (
            matched.groupBy("term")
            .agg(F.count(id_col).alias("df"))
            .filter(F.col("df") <= max_df)
        )
        matched = matched.join(F.broadcast(dfreq.select("term")), "term")

    num = F.col("tf") * F.lit((k1n + k1d) * bd * L)
    den = (
        F.col("tf") * F.lit(k1d * bd * L)
        + F.lit(k1n * (bd - bn) * L)
        + F.col("dl") * F.lit(k1n * bn * N)
    )
    s = num.cast("double") / den.cast("double")
    per_term = [
        F.sum(F.when(F.col("term") == t, s)).alias(f"__s{i}")
        for i, t in enumerate(query_terms)
    ]
    agged = matched.groupBy(id_col, "dl").agg(
        F.count("*").cast("long").alias("n_matched"), *per_term
    )
    score = F.coalesce(F.col("__s0"), F.lit(0.0))
    for i in range(1, len(query_terms)):
        score = score + F.coalesce(F.col(f"__s{i}"), F.lit(0.0))
    return (
        agged.select(
            id_col,
            F.col("dl").cast("long").alias("dl"),
            "n_matched",
            score.alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )


def bm25(
    df: DataFrame,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Full Okapi BM25 with the Robertson/Sparck-Jones idf:

        score = sum_t ln(1 + (N - df_t + 0.5)/(df_t + 0.5))
                      * tf*(k1+1)/(tf + k1*(1 - b + b*dl/avgdl))

    Float layer — pytest-checked against driver-side math, not
    oracle-hashed (ln() bit-stability; the hash-exact ranking surface is
    :func:`bm25_saturation_topk`). Same single-pass plan shape."""
    if not query_terms:
        raise ValueError("bm25 needs at least one query term")
    seen: set[str] = set()
    query_terms = [t for t in query_terms if not (t in seen or seen.add(t))]
    toks = word_tokens(F.col(text_col))
    totals = (
        df.select(F.sum(F.size(toks)).alias("L"), F.count("*").alias("N")).first()
    )
    if int(totals["N"]) == 0:
        raise ValueError("bm25: empty corpus")
    L, N = float(totals["L"]), float(totals["N"])
    avgdl = L / N
    matched = (
        df.select(id_col, F.size(toks).alias("dl"), F.explode(toks).alias("term"))
        .filter(F.col("term").isin(list(query_terms)))
        .groupBy(id_col, "dl", "term")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = matched.groupBy("term").agg(F.count(id_col).alias("df"))
    idf = F.log(
        1.0 + (F.lit(N) - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    sat = (F.col("tf") * (k1 + 1.0)) / (
        F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.lit(avgdl))
    )
    return (
        matched.join(F.broadcast(dfreq), "term")
        .withColumn("__w", idf * sat)
        .groupBy(id_col)
        .agg(F.sum("__w").alias("bm25"))
    )


def inverted_index(
    df: DataFrame,
    max_df: int = 100,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(term, df, postings): rare-term inverted index — for every term
    appearing in at most ``max_df`` documents, the sorted doc-id posting
    list as a comma-joined string (string form so the oracle compare is
    canonical; a list column stringifies differently across engines).

    The df-cap filter runs BEFORE collect_list, so no posting list ever
    exceeds ``max_df`` entries: stopword hot keys never reach the
    collect. Lookup use case: targeted decontamination / provenance
    queries on rare identifiers."""
    tc = term_counts(df, id_col, text_col)
    dfreq = doc_freq(tc, id_col).filter(F.col("df") <= max_df)
    return (
        tc.join(F.broadcast(dfreq), "term")
        .groupBy("term", "df")
        .agg(
            F.array_join(F.sort_array(F.collect_list(F.col(id_col))), ",").alias(
                "postings"
            )
        )
    )


def rrf_fuse(
    rankings: list[tuple[DataFrame, str, str]],
    k: int = 60,
    topk: int = 10,
) -> DataFrame:
    """Reciprocal Rank Fusion (Cormack, Clarke & Buettcher, SIGIR 2009) —
    the standard hybrid-retrieval combiner: fused(d) = Σ_systems
    1 / (k + rank_system(d)), summed over the systems that returned d.
    ``rankings`` is a list of (df, id_col, score_col) retriever outputs
    (each already truncated to its own top-N); ranks are assigned by
    (score DESC, id ASC) so they are deterministic whenever the scores
    are engine-exact, and each reciprocal is ONE correctly-rounded IEEE
    division added in fixed system order — the fused double is
    hash-reproducible (the bm25/cosine discipline). Absent ranks
    contribute 0 and are reported as rank 0 (never NULL, so the rank
    columns stay integer-typed through Arrow).

    Scale shape: every input is a retriever's top-N — tens of rows — so
    the global rank window and the full outer fusion join run on
    bounded, data-size-independent frames; the heavy lifting happened
    inside the retrievers (BM25's single corpus pass, ANN's bucketed
    probe). This is the serving-side fusion step, not a corpus scan.
    """
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    fused = None
    for idx, (df, id_col, score_col) in enumerate(rankings):
        w = Window.orderBy(F.col(score_col).desc(), F.col(id_col).asc())
        r = df.select(
            F.col(id_col).cast("long").alias("item_id"),
            F.row_number().over(w).alias(f"__r{idx}"),
        )
        fused = r if fused is None else fused.join(r, "item_id", "full_outer")
    score = None
    for idx in range(len(rankings)):
        term = F.coalesce(
            F.lit(1.0) / (F.lit(float(k)) + F.col(f"__r{idx}")), F.lit(0.0)
        )
        score = term if score is None else (score + term)
    out = fused.select(
        "item_id",
        score.alias("rrf_score"),
        *[
            F.coalesce(F.col(f"__r{idx}"), F.lit(0)).cast("long").alias(name)
            for idx, name in zip(range(len(rankings)), _rrf_names(len(rankings)))
        ],
    )
    return out.orderBy(F.col("rrf_score").desc(), F.col("item_id").asc()).limit(topk)


def _rrf_names(n: int) -> list[str]:
    return [f"rank_{i}" for i in range(n)]


def mrr_at_k(
    df: DataFrame,
    terms: list[str],
    k: int = 25,
    k1: tuple[int, int] = (6, 5),
    b: tuple[int, int] = (3, 4),
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Retrieval-quality evaluation: per single-term query, the
    reciprocal rank of that query's RELEVANT document within the BM25
    tf-saturation top-``k`` — (term, rel_doc, rnk, rr) rows whose mean
    is MRR@k, the standard first-relevant-hit metric of a retrieval
    eval harness. The relevance labels are deterministic by
    construction (the smallest doc_id containing the term — derivable
    in plain SQL, which is what makes the metric oracle-hashable; swap
    in a labels table in production), and the score is the same
    integer-exact single-division ``sv`` as bm25_saturation_topk, so
    ranks are engine-independent: ties break by doc_id ascending, rr is
    ONE IEEE division (1/rank) or exactly 0.0 when the relevant doc
    misses the top-k. EVERY query term emits a row: a term absent from
    the corpus has no relevant document and scores (term, NULL, NULL,
    0.0) — silently dropping it would overstate the mean, the one
    mistake an eval metric must not make.

    Plan: one corpus pass (tokenize → explode → isin prune → tf agg),
    one per-term rank window (bounded by each term's document
    frequency — prune fat terms upstream via a max_df filter when a
    query term matches a meaningful fraction of 100 TB), one broadcast
    join of the |terms|-row relevance table against the ≤ |terms|·k
    rank rows."""
    if not terms:
        raise ValueError("mrr_at_k needs at least one query term")
    seen: set[str] = set()
    terms = [t for t in terms if not (t in seen or seen.add(t))]
    k1n, k1d = k1
    bn, bd = b
    toks = word_tokens(F.col(text_col))
    totals = df.select(F.sum(F.size(toks)).alias("L"), F.count("*").alias("N")).first()
    if int(totals["N"]) == 0:
        raise ValueError("mrr_at_k: empty corpus")
    L, N = int(totals["L"]), int(totals["N"])
    matched = (
        df.select(id_col, F.size(toks).alias("dl"), F.explode(toks).alias("term"))
        .filter(F.col("term").isin(list(terms)))
        .groupBy(id_col, "dl", "term")
        .agg(F.count("*").alias("tf"))
    )
    num = F.col("tf") * F.lit((k1n + k1d) * bd * L)
    den = (
        F.col("tf") * F.lit(k1d * bd * L)
        + F.lit(k1n * (bd - bn) * L)
        + F.col("dl") * F.lit(k1n * bn * N)
    )
    sv = (num.cast("double") / den.cast("double")).alias("sv")
    scored = matched.select("term", id_col, sv)
    w = Window.partitionBy("term").orderBy(F.col("sv").desc(), F.col(id_col).asc())
    ranked = (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select("term", F.col(id_col).alias("__rdoc"), "rnk")
    )
    # Literal values, not createDataFrame: a local-Python-rows plan pays
    # a Python-worker scan per job; the exploded lit array stays JVM-side.
    terms_df = df.sparkSession.range(1).select(
        F.explode(F.array(*[F.lit(t) for t in terms])).alias("term")
    )
    relevant = terms_df.join(
        matched.groupBy("term").agg(F.min(id_col).alias("rel_doc")),
        "term",
        "left",
    )
    out = relevant.join(
        ranked,
        (relevant["term"] == ranked["term"])
        & (F.col("rel_doc") == F.col("__rdoc")),
        "left",
    )
    return out.select(
        relevant["term"],
        "rel_doc",
        "rnk",
        F.when(
            F.col("rnk").isNotNull(),
            F.lit(1.0) / F.col("rnk").cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("rr"),
    )
