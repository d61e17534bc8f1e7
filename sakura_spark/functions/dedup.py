"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding near-dup.

Scale notes (the reason each operator is shaped the way it is):

* exact dedup      — one hash-aggregate on the canonical fingerprint; fully
                     map-side-combinable, one shuffle on a 16-byte key.
* MinHash + LSH    — the classic shingle→minhash→band→bucket-join pipeline.
                     Signatures are computed in ONE codegen'd projection
                     (array expressions over xxhash64 — no UDF, no explode
                     of shingles); candidate pairs come from a self-join on
                     (band_id, band_hash), i.e. a shuffle keyed on the
                     bucket, never an all-pairs product. At 100 TB the only
                     quadratic term is within-bucket, bounded by bucket size.
* SimHash          — 64-bit signature via per-bit majority vote, again pure
                     array expressions; near-dups = Hamming distance on
                     bucketed prefixes.
* n-gram Jaccard   — exact verification for candidate pairs (the re-rank
                     step after LSH recall).
* embedding cosine — see functions/similarity.py; near-dup = cosine > tau
                     on LSH-bucketed candidates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sakura_spark import errors
from sakura_spark.functions.text import bind_once, fingerprint_md5, tokens

# Mersenne prime 2^31-1: modulus for the universal hash family
# h_i(x) = (a_i * x + b_i) mod p. 31-bit values keep a*h < 2^62, safely
# inside a signed long under ANSI overflow checking. Parameters derive
# deterministically from the permutation index via splitmix64-style mixing
# (no RNG state needed — every executor computes the same family).
_P = (1 << 31) - 1


def _perm_params(i: int) -> tuple[int, int]:
    def mix(z: int) -> int:
        z = (z + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
        return z ^ (z >> 31)

    a = mix(2 * i) % (_P - 1) + 1
    b = mix(2 * i + 1) % _P
    return a, b


def shingles(text: Column, n: int = 3) -> Column:
    """Word n-gram shingles of lowercased text (distinct), as an array —
    built with zip_with over shifted slices, no explode. String form: used
    where the literal grams matter (exact Jaccard/containment vs the SQL
    oracle).

    Why zip_with instead of transform(sequence, i -> concat_ws(slice)):
    expressions captured inside a higher-order-function lambda are
    re-evaluated per element, so the transform form re-tokenizes the text
    once PER GRAM — measured ~3x the whole contamination query at bench
    scale. zip_with evaluates each argument array once — and the token
    array itself is bound ONCE per row via bind_once (it feeds the
    zip_with base plus a slice and a size per gram order, which as raw
    expressions would re-tokenize ~2(n-1) more times; measured 2x on the
    signature pipeline). Trailing windows short of n tokens become NULL
    (concat propagates the zip_with padding) and are filtered; docs with
    < n tokens yield an empty array."""

    def build(toks: Column) -> Column:
        g = toks
        for k in range(1, n):
            g = F.zip_with(
                g,
                F.slice(toks, k + 1, F.greatest(F.size(toks) - k, F.lit(0))),
                lambda acc, t: F.concat(acc, F.lit(" "), t),
            )
        return F.array_distinct(F.filter(g, lambda x: x.isNotNull()))

    return bind_once(tokens(F.lower(text)), build)


# Odd multiplier for the rolling gram-hash combine; with 31-bit operands the
# product stays under 2^62, inside a long even with ANSI overflow checking.
_A = 1_000_003


def shingle_hashes(text: Column, n: int = 3) -> Column:
    """Distinct 31-bit hashes of word n-gram shingles, as array<long>.

    The cheap numeric analogue of :func:`shingles` for signature pipelines
    (minhash/simhash), where only hash equality matters: each token is
    xxhash64'd ONCE, and gram hashes combine n consecutive token hashes
    with a rolling (acc*A + h) mod p — no per-gram string slicing/joining,
    which costs ~5x the whole signature pipeline at bench scale. Built
    from zip_with over shifted slices (each argument evaluated once — a
    transform-with-element_at nesting re-evaluates its input array per
    element), with the token-hash array bound ONCE per row via bind_once
    (as a raw expression it feeds ~2(n-1)+1 references — measured 2x the
    signature stage). Trailing windows short of n tokens become NULL via
    zip_with padding and are filtered; docs with < n tokens yield an
    empty array.
    """
    th = F.transform(
        tokens(F.lower(text)), lambda t: F.pmod(F.xxhash64(t), F.lit(_P))
    )

    def build(hs: Column) -> Column:
        g = hs
        for k in range(1, n):
            g = F.zip_with(
                g,
                F.slice(hs, k + 1, F.greatest(F.size(hs) - k, F.lit(0))),
                lambda acc, h: F.pmod(acc * F.lit(_A) + h, F.lit(_P)),
            )
        return F.array_distinct(F.filter(g, lambda x: x.isNotNull()))

    return bind_once(th, build)


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str = "text", num_hashes: int = 32, shingle_n: int = 3
) -> DataFrame:
    """Per-document minhash signature columns m0..m{n-1}.

    Shape chosen for scale: ZERO shuffles. Shingle hashes are one array
    projection (computed once per document); each permutation is an
    `array_min(transform(hs, h -> (a_i*h+b_i) mod p))` expression over that
    array. The two selects stay separate projections (CollapseProject
    declines to inline `hs` into 32 consumers), so the whole signature is
    a map-only pipeline — no exploded doc×shingle intermediate, which at
    100 TB is the difference between a full-corpus shuffle and none.
    Documents with fewer than `shingle_n` tokens get the sentinel
    signature p (matches only other empty docs, which exact-dedup already
    groups)."""
    sigs = minhash_signature_array(df, id_col, text_col, num_hashes, shingle_n)
    # Unpacking ms[i] into separate columns would tempt CollapseProject
    # into inlining the whole signature transform once PER consumer (a
    # num_hashes x recompute); the array stays the primary representation
    # (minhash_candidate_pairs consumes it directly) and this unpacked view
    # forces a materialization barrier via per-column element_at on an
    # aliased projection that Catalyst keeps separate (single reference in
    # each branch of one select).
    return sigs.select("id", *[F.col("ms")[i].alias(f"m{i}") for i in range(num_hashes)])


def minhash_signature_array(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    num_hashes: int = 32,
    shingle_n: int = 3,
    carry: list[str] | None = None,
) -> DataFrame:
    """Per-document minhash signature as ONE array column ``ms``.

    One nested transform over a LITERAL (a_i, b_i) parameter array: plan
    size stays O(1) in num_hashes and downstream consumers (band hashing)
    reference ``ms`` exactly once, so the transform is never recomputed.
    ``carry`` columns (e.g. an event-time column for streaming windows)
    pass through untouched.
    """
    carry = carry or []
    hashed = df.select(
        F.col(id_col).alias("id"),
        *carry,
        shingle_hashes(F.col(text_col), shingle_n).alias("hs"),
    )
    params = F.array(
        *[
            F.struct(F.lit(a).alias("a"), F.lit(b).alias("b"))
            for a, b in (_perm_params(i) for i in range(num_hashes))
        ]
    )
    # Single fold over the shingle hashes: aggregate() evaluates its input
    # expression exactly ONCE, so even when CollapseProject inlines the
    # shingle pipeline into this projection the expensive hashing is not
    # re-evaluated per permutation (a transform(params, ...hs...) nesting
    # re-evaluates hs per outer element — measured 20x slower). Zero value
    # [P]*n doubles as the empty-document sentinel.
    return hashed.select(
        "id",
        *carry,
        F.aggregate(
            F.col("hs"),
            F.array_repeat(F.lit(_P).cast("long"), num_hashes),
            lambda acc, h: F.zip_with(
                acc, params, lambda m, p: F.least(m, F.pmod(h * p["a"] + p["b"], F.lit(_P)))
            ),
        ).alias("ms"),
    )


def minhash_bands(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    carry: list[str] | None = None,
) -> DataFrame:
    """(id, band_id, band_hash [, carry...]) — the stateless map-only LSH
    bucketing stage shared by batch candidate pairs and the streaming
    near-dup path: band b hashes the comma-joined slice of the signature
    array. The ms column is referenced once, so the signature transform is
    never duplicated by projection collapsing."""
    rows = num_hashes // bands
    carry = carry or []
    sig = minhash_signature_array(df, id_col, text_col, num_hashes, shingle_n, carry=carry)
    band_structs = F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.struct(
            b.alias("band_id"),
            F.xxhash64(
                F.concat_ws(
                    ",",
                    F.transform(
                        F.slice(F.col("ms"), b * rows + 1, rows), lambda m: m.cast("string")
                    ),
                )
            ).alias("band_hash"),
        ),
    )
    return sig.select("id", *carry, F.explode(band_structs).alias("band")).select(
        "id", *carry, "band.band_id", "band.band_hash"
    )


def exact_duplicates(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """Groups of content-identical documents (canonical fingerprint match).
    Returns fp, representative doc id (min), and copy count."""
    return (
        df.select(F.col(id_col), fingerprint_md5(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("n_copies"))
        .select(id_col, "n_copies", "fp")
    )


def dedup_exact(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """Keep one representative (min id) per content fingerprint."""
    keep = exact_duplicates(df, id_col, text_col).select(id_col)
    return df.join(keep, on=id_col, how="left_semi")


def _bucket_pairs(bucketed: DataFrame, bucket_cols: list[str], max_bucket_size: int) -> DataFrame:
    """(id_a < id_b) pairs of ids sharing a bucket, WITHOUT a self-join:
    one groupBy collects each bucket's ids, pairs expand in-bucket via
    array expressions. Exactly one shuffle (keyed on the bucket), and the
    upstream pipeline is computed once — a self-join would recompute it for
    both sides. Buckets above `max_bucket_size` are dropped: they are
    low-information boilerplate clusters whose quadratic pair expansion
    dominates cost (standard LSH-at-scale guard; exact dedup catches their
    identical members anyway)."""
    grouped = (
        bucketed.groupBy(*bucket_cols)
        .agg(F.sort_array(F.collect_set("id")).alias("ids"))
        .filter((F.size("ids") > 1) & (F.size("ids") <= max_bucket_size))
    )
    pair_arr = F.flatten(
        F.transform(
            F.col("ids"),
            lambda x, i: F.transform(
                F.slice(F.col("ids"), i + 2, F.size(F.col("ids"))),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )
    return (
        grouped.select(F.explode(pair_arr).alias("p"))
        .select("p.id_a", "p.id_b")
        .dropDuplicates()
    )


def minhash_candidate_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    max_bucket_size: int = 1000,
) -> DataFrame:
    """LSH candidate near-duplicate pairs (id_a < id_b).

    Pipeline: signatures (one explode + one agg) -> band hashes -> bucket
    groupBy -> in-bucket pair expansion (see _bucket_pairs). The bucket key
    includes band_id so buckets from different bands never mix.
    """
    banded = minhash_bands(df, id_col, text_col, num_hashes, bands, shingle_n)
    return _bucket_pairs(banded, ["band_id", "band_hash"], max_bucket_size)


# Unblocked jaccard_pairs is quadratic; above this many rows it refuses to
# run without a group_col (or an explicit opt-out).
JACCARD_UNBLOCKED_MAX_ROWS = 10_000


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    group_col: str | None = None,
    shingle_n: int = 3,
    threshold: float = 0.1,
    allow_unblocked: bool = False,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for document pairs.

    With ``group_col`` the self-join is restricted to equal group values
    (the verification step after blocking); without it this is ALL-PAIRS
    (quadratic) — guarded: inputs over ``JACCARD_UNBLOCKED_MAX_ROWS`` rows
    raise unless ``allow_unblocked=True`` (the escape hatch for post-LSH
    candidate sets the caller knows are small-by-construction).
    """
    if group_col is None and not allow_unblocked:
        n = df.limit(JACCARD_UNBLOCKED_MAX_ROWS + 1).count()
        if n > JACCARD_UNBLOCKED_MAX_ROWS:
            raise ValueError(
                f"jaccard_pairs without group_col is an all-pairs crossJoin; "
                f"input exceeds {JACCARD_UNBLOCKED_MAX_ROWS} rows ({n}+). "
                "Pass group_col= for blocked verification, or "
                "allow_unblocked=True if the input is a known-small "
                "candidate set."
            )
    base = df.select(
        F.col(id_col).alias("id"),
        *( [F.col(group_col).alias("grp")] if group_col else [] ),
        shingles(F.col(text_col), shingle_n).alias("sh"),
    )
    a = base.select(
        F.col("id").alias("id_a"),
        *( [F.col("grp")] if group_col else [] ),
        F.col("sh").alias("sh_a"),
    )
    b = base.select(
        F.col("id").alias("id_b"),
        *( [F.col("grp")] if group_col else [] ),
        F.col("sh").alias("sh_b"),
    )
    joined = a.join(b, on=(["grp"] if group_col else None) or None, how="inner") if group_col else a.crossJoin(b)
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    uni = F.size(F.col("sh_a")) + F.size(F.col("sh_b")) - inter
    jac = F.when(uni == 0, F.lit(0.0)).otherwise(inter.cast("double") / uni.cast("double"))
    return (
        joined.filter(F.col("id_a") < F.col("id_b"))
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_signatures_portable(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    num_hashes: int = 16,
    salt: str = "mh",
) -> DataFrame:
    """ENGINE-PORTABLE MinHash signatures: (id, sig0..sig{k-1}) where
    sig_i = min over distinct 3-gram shingles of (a_i * h + b_i) mod P,
    h = the 60-bit sha256 word (sketches.hash_word) mod P, P = 2^31 - 1,
    and (a_i, b_i) from the same splitmix-derived universal family as the
    production pipeline (``_perm_params``).

    Relationship to :func:`minhash_signatures` (the production path):
    identical MATH, different base hash — production uses JVM xxhash64
    (fast, engine-specific, hence rows-only in the driver gate); this
    spelling uses the repo's engine-portable sha256 word so a DuckDB
    oracle recomputes every signature bit-for-bit — the MinHash family's
    hash-exact driver row. Use the xxhash path in anger; use this one to
    AUDIT the pipeline math across engines.

    Plan: explode distinct shingles, one map-side-combinable groupBy with
    k min aggregates — exactly one shuffle, carrying only (id, 8-byte
    hash); the k permutations are arithmetic on that one hash, not k
    hashes. Docs with no shingles are absent (no signature exists).
    """
    from sakura_spark.functions.sketches import hash_word

    grams = df.select(
        F.col(id_col).alias("id"),
        F.explode(shingles(F.col(text_col), 3)).alias("g"),
    )
    hw = hash_word(F.col("g"), salt) % F.lit(_P)
    hashed = grams.select("id", hw.alias("h"))
    aggs = []
    for i in range(num_hashes):
        a, b = _perm_params(i)
        aggs.append(
            F.min((F.col("h") * F.lit(a) + F.lit(b)) % F.lit(_P)).alias(f"sig{i}")
        )
    return hashed.groupBy("id").agg(*aggs)


def minhash_portable_oracle_sql(
    docs_sql: str,
    shingles_sql: str,
    num_hashes: int = 16,
    salt: str = "mh",
) -> str:
    """DuckDB twin of :func:`minhash_signatures_portable`, generated from
    the SAME ``_perm_params`` family so the two spellings cannot drift.
    ``docs_sql`` yields (doc_id, text); ``shingles_sql`` is the SQL
    spelling of the 3-gram shingle array over a column named ``text``."""
    hw = (
        f"('0x' || substr(sha256(concat_ws(chr(31), '{salt}', gram)), 1, 15))"
        f"::BIGINT % {_P}"
    )
    sigs = []
    for i in range(num_hashes):
        a, b = _perm_params(i)
        sigs.append(f"min((h * {a} + {b}) % {_P}) AS sig{i}")
    return (
        f"WITH src AS ({docs_sql}), "
        f"t AS (SELECT doc_id, {shingles_sql} AS sh FROM src), "
        "g AS (SELECT doc_id, unnest(sh) AS gram FROM t WHERE len(sh) > 0), "
        f"h AS (SELECT doc_id AS id, {hw} AS h FROM g) "
        f"SELECT id, {', '.join(sigs)} FROM h GROUP BY id"
    )


def corpus_minhash(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    num_hashes: int = 64,
    salt: str = "mh",
) -> DataFrame:
    """Corpus-level MinHash: ONE k-slot signature per GROUP (source,
    snapshot, shard) — sig_i = min over the shingles of EVERY document in
    the group of (a_i * h + b_i) mod P, the same engine-portable family
    as :func:`minhash_signatures_portable` (60-bit sha256 word mod P,
    ``_perm_params``), so a DuckDB oracle recomputes every slot
    bit-for-bit.

    Because min(union) = min of mins, the group signature is EXACTLY the
    MinHash of the union of the group's shingle sets — the Broder 1997
    resemblance estimator lifted from documents to corpora. Estimating
    cross-source/cross-snapshot overlap this way is the standard first
    question of a 100 TB ingestion run ("how much of crawl N+1 is
    already in crawl N?") and costs one aggregation, not a join.

    Plan: explode shingles, hash once, ONE map-side-combinable
    groupBy(group) with k min aggregates over arithmetic on that single
    8-byte hash. The shuffle carries (group, hash) pairs; the output is
    |groups| rows however large the corpus.
    """
    from sakura_spark.functions.sketches import hash_word

    grams = df.select(
        F.col(group_col).alias("grp"),
        F.explode(shingles(F.col(text_col), 3)).alias("g"),
    )
    hw = hash_word(F.col("g"), salt) % F.lit(_P)
    hashed = grams.select("grp", hw.alias("h"))
    aggs = []
    for i in range(num_hashes):
        a, b = _perm_params(i)
        aggs.append(
            F.min((F.col("h") * F.lit(a) + F.lit(b)) % F.lit(_P)).alias(f"sig{i}")
        )
    return hashed.groupBy("grp").agg(*aggs)


def corpus_overlap(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    num_hashes: int = 64,
    salt: str = "mh",
) -> DataFrame:
    """Pairwise corpus overlap: MinHash-estimated Jaccard resemblance
    between every pair of groups (sources, crawl snapshots, shards).
    Output: (group_a, group_b, matching_slots, num_hashes, jaccard_est)
    with group_a < group_b; jaccard_est = matching_slots / num_hashes is
    exactly dyadic for power-of-two k, so the doubles hash stably.

    Scale: the per-group signatures are one combinable aggregation over
    the corpus (see :func:`corpus_minhash`); the pair comparison runs
    over |groups| signature rows — sources, not documents — so the
    quadratic term is O(|G|^2 * k) slot compares on a broadcast join,
    independent of corpus size. Deterministic end to end (no RNG state):
    the DuckDB twin from :func:`corpus_overlap_oracle_sql` reproduces
    every slot, count, and estimate bit-for-bit.
    """
    sig = corpus_minhash(df, group_col, text_col, num_hashes, salt)
    a = sig.select(
        F.col("grp").alias("group_a"),
        *[F.col(f"sig{i}").alias(f"__a{i}") for i in range(num_hashes)],
    )
    b = sig.select(
        F.col("grp").alias("group_b"),
        *[F.col(f"sig{i}").alias(f"__b{i}") for i in range(num_hashes)],
    )
    matches = sum(
        (F.col(f"__a{i}") == F.col(f"__b{i}")).cast("int") for i in range(num_hashes)
    )
    return (
        a.join(b.hint("broadcast"), F.col("group_a") < F.col("group_b"))
        .select(
            "group_a",
            "group_b",
            bind_once(
                matches,
                lambda m: F.struct(
                    m.alias("matching_slots"),
                    (m.cast("double") / F.lit(float(num_hashes))).alias("est"),
                ),
            ).alias("__p"),
        )
        .select(
            "group_a",
            "group_b",
            F.col("__p.matching_slots").alias("matching_slots"),
            F.lit(num_hashes).alias("num_hashes"),
            F.col("__p.est").alias("jaccard_est"),
        )
    )


def corpus_overlap_oracle_sql(
    docs_sql: str,
    shingles_sql: str,
    num_hashes: int = 64,
    salt: str = "mh",
) -> str:
    """DuckDB twin of :func:`corpus_overlap`, generated from the SAME
    ``_perm_params`` family and hash-word spelling as
    :func:`minhash_portable_oracle_sql` so the two cannot drift.
    ``docs_sql`` yields (grp, text); ``shingles_sql`` is the SQL spelling
    of the 3-gram shingle array over a column named ``text``."""
    hw = (
        f"('0x' || substr(sha256(concat_ws(chr(31), '{salt}', gram)), 1, 15))"
        f"::BIGINT % {_P}"
    )
    sigs = []
    for i in range(num_hashes):
        a, b = _perm_params(i)
        sigs.append(f"min((h * {a} + {b}) % {_P}) AS sig{i}")
    matches = " + ".join(
        f"CASE WHEN a.sig{i} = b.sig{i} THEN 1 ELSE 0 END"
        for i in range(num_hashes)
    )
    return (
        f"WITH src AS ({docs_sql}), "
        f"t AS (SELECT grp, {shingles_sql} AS sh FROM src), "
        "g AS (SELECT grp, unnest(sh) AS gram FROM t WHERE len(sh) > 0), "
        f"h AS (SELECT grp, {hw} AS h FROM g), "
        f"s AS (SELECT grp, {', '.join(sigs)} FROM h GROUP BY grp), "
        f"m AS (SELECT a.grp AS group_a, b.grp AS group_b, "
        f"CAST({matches} AS INT) AS matching_slots "
        "FROM s a JOIN s b ON a.grp < b.grp) "
        "SELECT group_a, group_b, matching_slots, "
        f"CAST({num_hashes} AS INT) AS num_hashes, "
        f"CAST(matching_slots AS DOUBLE) / {float(num_hashes)!r} AS jaccard_est "
        "FROM m"
    )


def simhash_portable(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    bits: int = 60,
    shingle_n: int = 2,
    salt: str = "sh",
) -> DataFrame:
    """ENGINE-PORTABLE SimHash: (id, sim) where bit b of ``sim`` is set
    iff sum over distinct shingles of (2*bit_b(h) - 1) >= 0, with h the
    60-bit sha256 word (sketches.hash_word). Same majority-vote math as
    the production :func:`simhash_signatures` (Charikar 2002), different
    base hash: production folds JVM xxhash64 (fast, engine-specific,
    rows-only in the driver gate); this spelling is recomputable in SQL
    bit-for-bit — the SimHash family's hash-exact driver row, the
    companion of :func:`minhash_signatures_portable`. Ties (zero vote
    sum) set the bit, spelled identically in the twin.

    Plan: explode distinct shingles, ONE map-side-combinable groupBy with
    ``bits`` conditional-sum aggregates over the single 8-byte hash (the
    votes are arithmetic on one hash, not ``bits`` hashes), then one
    projection assembles the signature long. Docs with no shingles are
    absent.
    """
    if not 1 <= bits <= 60:
        raise ValueError("bits must be 1..60 (one sha256 word)")
    from sakura_spark.functions.sketches import hash_word

    grams = df.select(
        F.col(id_col).alias("id"),
        F.explode(shingles(F.col(text_col), shingle_n)).alias("g"),
    )
    h = hash_word(F.col("g"), salt)
    hashed = grams.select("id", h.alias("h"))
    votes = [
        F.sum(
            F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) * 2 - 1
        ).alias(f"__v{b}")
        for b in range(bits)
    ]
    agg = hashed.groupBy("id").agg(*votes)
    sig = None
    for b in range(bits):
        term = F.when(F.col(f"__v{b}") >= 0, F.lit(1 << b).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        sig = term if sig is None else sig + term
    return agg.select("id", sig.alias("sim"))


def simhash_portable_oracle_sql(
    docs_sql: str,
    shingles_sql: str,
    bits: int = 60,
    salt: str = "sh",
) -> str:
    """DuckDB twin of :func:`simhash_portable` — same hash word, same
    vote arithmetic, same tie rule; generated here so the two spellings
    cannot drift. ``shingles_sql`` spells the shingle array over a
    column named ``text``."""
    hw = f"('0x' || substr(sha256(concat_ws(chr(31), '{salt}', gram)), 1, 15))::BIGINT"
    vote = ", ".join(
        f"sum(((h >> {b}) & 1) * 2 - 1) AS v{b}" for b in range(bits)
    )
    asm = " + ".join(
        f"(CASE WHEN v{b} >= 0 THEN CAST({1 << b} AS BIGINT) ELSE 0 END)"
        for b in range(bits)
    )
    return (
        f"WITH src AS ({docs_sql}), "
        f"t AS (SELECT doc_id, {shingles_sql} AS sh FROM src), "
        "g AS (SELECT doc_id, unnest(sh) AS gram FROM t WHERE len(sh) > 0), "
        f"h AS (SELECT doc_id AS id, {hw} AS h FROM g), "
        f"v AS (SELECT id, {vote} FROM h GROUP BY id) "
        f"SELECT id, {asm} AS sim FROM v"
    )


def jaccard_selfjoin(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: tuple[int, int] = (1, 2),
    max_prefix_bucket: int = 10_000,
) -> DataFrame:
    """EXACT Jaccard-threshold self-join via prefix filtering:
    (id_a, id_b, jaccard) for every unordered document pair whose word
    n-gram shingle sets satisfy J(A, B) >= p/q — no LSH probability of a
    miss, no blocking key to choose. The AllPairs/SSJoin prefix principle
    (Bayardo et al. WWW'07; Chaudhuri et al. ICDE'06): order each set by
    GLOBAL document frequency ascending (rarest first, ties by gram);
    if J(A, B) >= t, A and B must share a gram within each one's first
    |S| - ceil(t * |S|) + 1 grams, so only prefix-gram buckets generate
    candidates — the rare-first order makes those buckets small.

    Exactness contract: ``threshold`` is a RATIONAL (p, q), so the prefix
    length (exact integer ceil), the length filter q*min >= p*max, and
    the final verify q*i >= p*(|A|+|B|-i) are all integer comparisons —
    boundary pairs cannot flip on float rounding, and the returned
    jaccard is one correctly-rounded IEEE division of exact int64s. A
    naive SQL oracle (gram-intersection self-join) must agree exactly.

    Scale shape (100 TB): one gram-df window + one per-doc rank window
    (shuffle by gram, then by id), per-prefix-gram pair generation
    BOUNDED by ``max_prefix_bucket`` — a hotter prefix bucket raises
    in-plan via raise_error BEFORE any collect_list materializes (exact
    operators must fail loudly, never drop candidates; raising the
    threshold shortens prefixes and cools buckets), then exactly two
    justified join-backs to fetch the shingle payloads for verification
    (the arrays cannot ride the gram shuffle x prefix_len). The
    candidate-pair count is the prefix principle's whole point: sum of
    C(bucket, 2) over RARE grams, not O(n^2).
    """
    p_t, q_t = threshold
    if not (0 < p_t <= q_t):
        raise ValueError("threshold must be a rational (p, q) with 0 < p <= q")
    from pyspark.sql import Window as W

    sh = df.select(
        F.col(id_col).alias("id"), shingles(F.col(text_col), shingle_n).alias("sh")
    ).withColumn("sz", F.size("sh"))
    sh = sh.where(F.col("sz") > 0)

    toks = sh.select("id", "sz", F.explode("sh").alias("g"))
    toks = toks.withColumn("__gdf", F.count(F.lit(1)).over(W.partitionBy("g")))
    ranked = toks.withColumn(
        "__rk", F.row_number().over(W.partitionBy("id").orderBy("__gdf", "g"))
    )
    # prefix_len = sz - ceil(p*sz/q) + 1, exact integer ceil
    prefix_len = F.col("sz") - F.expr(f"(sz * {p_t} + {q_t} - 1) div {q_t}") + F.lit(1)
    pre = ranked.where(F.col("__rk") <= prefix_len).select("g", "id", "sz")
    # In-plan hot-bucket guard: count per prefix gram rides one more
    # window over the SAME g partitioning; an oversized bucket poisons
    # the row (via the struct's sz field, NOT the g key — poisoning g
    # made the groupBy key a new expression and cost a second full
    # Exchange on top of the window's; keyed on the untouched g the
    # groupBy reuses the window's hashpartitioning, round-13 plan diff:
    # 4 data Exchanges -> 3), so execution fails before the bounded
    # collect below ever sees it.
    pre = pre.withColumn("__bc", F.count(F.lit(1)).over(W.partitionBy("g")))
    guarded_sz = F.when(F.col("__bc") <= max_prefix_bucket, F.col("sz")).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    f"jaccard_selfjoin: a prefix-gram bucket exceeds "
                    f"max_prefix_bucket={max_prefix_bucket} (gram '"
                ),
                F.col("g"),
                F.lit(
                    "'); raise the threshold (shorter prefixes) or "
                    "max_prefix_bucket"
                ),
            ).cast("string")
        ).cast("int")
    )
    buckets = (
        pre.select("g", F.struct("id", guarded_sz.alias("sz")).alias("x"))
        .groupBy("g")
        .agg(F.sort_array(F.collect_list("x")).alias("xs"))
        .where(F.size("xs") > 1)
    )
    cand = (
        buckets.select(
            F.explode(
                F.expr(
                    "flatten(transform(xs, (a, i) -> "
                    "transform(slice(xs, i + 2, size(xs)), "
                    "b -> struct(a.id AS id_a, a.sz AS sz_a, "
                    "b.id AS id_b, b.sz AS sz_b))))"
                )
            ).alias("c")
        )
        .select("c.*")
        # length filter: J >= p/q forces q*min(sz) >= p*max(sz)
        .where(
            (F.col("sz_a") * q_t >= F.col("sz_b") * p_t)
            & (F.col("sz_b") * q_t >= F.col("sz_a") * p_t)
        )
        .select("id_a", "id_b")
        .distinct()
    )
    # Verification payload fetch: ONE join against the shingle table
    # instead of two. Each candidate pair explodes into two legs keyed by
    # the member id; the join attaches that member's shingle array (the
    # shingle pipeline is computed ONCE here — the old two-join form
    # recomputed the full tokenize+gram scan for va AND vb, 3 scans
    # total counting the prefix pipeline; now 2), and the pair groupBy
    # shuffles only CANDIDATE rows' arrays (bounded by the prefix
    # principle), never the corpus. max() picks the single non-null
    # array per side — exactly one row per (pair, side) by construction.
    legs = cand.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("id_a").alias("id"),
                    F.col("id_a"),
                    F.col("id_b"),
                    F.lit(0).alias("side"),
                ),
                F.struct(
                    F.col("id_b").alias("id"),
                    F.col("id_a"),
                    F.col("id_b"),
                    F.lit(1).alias("side"),
                ),
            )
        ).alias("l")
    ).select("l.*")
    ver = (
        sh.select("id", "sh")
        .join(legs, "id")
        .groupBy("id_a", "id_b")
        .agg(
            F.max(F.when(F.col("side") == 0, F.col("sh"))).alias("sh_a"),
            F.max(F.when(F.col("side") == 1, F.col("sh"))).alias("sh_b"),
        )
    )
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    uni = F.size(F.col("sh_a")) + F.size(F.col("sh_b")) - inter
    return (
        ver.where(inter * q_t >= uni * p_t)
        .select(
            "id_a",
            "id_b",
            (inter.cast("double") / uni.cast("double")).alias("jaccard"),
        )
    )


def simhash_signatures(
    df: DataFrame, id_col: str, text_col: str = "text", shingle_n: int = 2
) -> DataFrame:
    """Per-document 64-bit SimHash (signed long column ``sim``).

    Per-bit majority vote over shingle xxhash64s, shaped for scale like
    minhash: ZERO shuffles. One projection computes the shingle-hash array
    per document; ONE ``aggregate`` fold with a 64-long array accumulator
    computes all bit sums in a single pass over the shingles (bit j
    contributes +1/-1) — 64 separate aggregate expressions each re-walk
    the array and swell the projection toward codegen limits (measured
    ~20% slower); the signature assembles from the bound sums array in a
    final expression. No exploded doc×shingle intermediate, no groupBy.
    Documents with no shingles get signature 0.
    """
    # Numeric grams (31-bit), re-widened to 64 bits with one fixed-width
    # xxhash64 so all 64 vote bits are meaningful — still no string ops.
    hashed = df.select(
        F.col(id_col).alias("id"),
        F.transform(
            shingle_hashes(F.col(text_col), shingle_n), lambda g: F.xxhash64(g)
        ).alias("hs"),
    )

    def bits(h):
        return F.array(
            *[
                F.when(F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, F.lit(1))
                .otherwise(F.lit(-1))
                .cast("long")
                for j in range(64)
            ]
        )

    sums_arr = F.aggregate(
        F.col("hs"),
        F.array_repeat(F.lit(0).cast("long"), 64),
        lambda acc, h: F.zip_with(acc, bits(h), lambda a, b: a + b),
    )

    def assemble(s):
        # bit j of the signature = (sums[j] > 0); -2^63 is the j=63 bit.
        sig = F.lit(0).cast("long")
        for j in range(64):
            bit_val = F.lit(-(1 << 63) if j == 63 else (1 << j)).cast("long")
            sig = sig.bitwiseXOR(
                F.when(F.element_at(s, j + 1) > 0, bit_val).otherwise(
                    F.lit(0).cast("long")
                )
            )
        return sig

    return hashed.select("id", bind_once(sums_arr, assemble).alias("sim"))


def simhash_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    prefix_bits: int = 16,
    max_bucket_size: int = 1000,
    signatures: DataFrame | None = None,
) -> DataFrame:
    """Near-dup candidates: equal high `prefix_bits` of the simhash (one
    block of a rotate-and-block scheme), then exact Hamming distance.

    Same no-self-join shape as minhash: one groupBy on the block collects
    (id, sim) structs, pairs + Hamming expand in-bucket.

    ``signatures`` overrides the signature source: pass a precomputed
    (id, sim) DataFrame — e.g. :func:`simhash_portable`'s engine-portable
    signatures — to run the identical blocking/pair/Hamming stage over a
    different hash family (the driver gate does this so the WHOLE
    candidate semantics is SQL-recomputable; production omits it and gets
    the fast xxhash64 signatures).
    """
    sig = (
        signatures
        if signatures is not None
        else simhash_signatures(df, id_col, text_col)
    )
    blocked = sig.withColumn("blk", F.shiftrightunsigned(F.col("sim"), 64 - prefix_bits))
    grouped = (
        blocked.groupBy("blk")
        .agg(F.sort_array(F.collect_set(F.struct("id", "sim"))).alias("xs"))
        .filter((F.size("xs") > 1) & (F.size("xs") <= max_bucket_size))
    )
    pair_arr = F.flatten(
        F.transform(
            F.col("xs"),
            lambda x, i: F.transform(
                F.slice(F.col("xs"), i + 2, F.size(F.col("xs"))),
                lambda y: F.struct(
                    x["id"].alias("id_a"),
                    y["id"].alias("id_b"),
                    F.bit_count(x["sim"].bitwiseXOR(y["sim"])).alias("hamming"),
                ),
            ),
        )
    )
    return (
        grouped.select(F.explode(pair_arr).alias("p"))
        .select("p.id_a", "p.id_b", "p.hamming")
        .dropDuplicates(["id_a", "id_b"])
    )


def duplicate_clusters(
    pairs: DataFrame, max_iterations: int = 10, driver_max_pairs: int = 200_000
) -> DataFrame:
    """Connected components over (id_a, id_b) duplicate pairs -> (id,
    cluster) with cluster = the component's minimum id.

    Two paths, size-gated on one count of the (already bucket-bounded)
    pair set:

    * ``<= driver_max_pairs``: classic union-find on the driver. The
      transfer is two ids per pair — the same bounded-smalls class as the
      IVF/PQ codebooks — and it replaces ~5 scheduled jobs PER ITERATION
      with microseconds of local work; at bench scale this is the
      difference between 3 s of pure job scheduling and none. Candidate
      pairs after LSH + verification are a vanishing fraction of the
      corpus, so real runs usually take this path even at large scale.
    * above the gate: min-label propagation with pointer doubling — each
      pass every node adopts the minimum label in its closed
      neighborhood, then follows the adopted label one hop further
      (labels are themselves node ids), so the remaining label-chain
      roughly halves per pass: O(log diameter) convergence instead of
      O(diameter). Each pass is two hash joins plus a groupBy-min —
      partitioned on id, never collected, so billions of pairs shuffle
      but the driver holds nothing. Convergence is detected with a
      bounded count job per pass; exhausting ``max_iterations`` while
      labels are still moving raises ``ConvergenceError`` rather than
      silently returning a split clustering. Labels are checkpointed via
      localCheckpoint every pass to keep the plan from growing
      superlinearly with iterations.

    Both paths produce identical output (property-tested against each
    other); set ``driver_max_pairs=0`` to force the distributed path.
    """
    if driver_max_pairs > 0 and pairs.count() <= driver_max_pairs:
        id_type = pairs.schema["id_a"].dataType
        parent: dict = {}

        def find(x):
            root = x
            while parent.get(root, root) != root:
                root = parent[root]
            while parent.get(x, x) != x:  # path compression
                parent[x], x = root, parent[x]
            return root

        seen: set = set()
        for a, b in pairs.select("id_a", "id_b").toLocalIterator():
            seen.add(a)
            seen.add(b)
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        members: dict = {}
        for x in seen:
            members.setdefault(find(x), []).append(x)
        out = [
            (x, min(mem)) for mem in members.values() for x in mem
        ]
        from pyspark.sql import types as T

        schema = T.StructType(
            [T.StructField("id", id_type), T.StructField("cluster", id_type)]
        )
        return pairs.sparkSession.createDataFrame(out, schema)

    edges = pairs.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).union(pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
    labels = (
        edges.select(F.col("src").alias("id"))
        .dropDuplicates()
        .withColumn("cluster", F.col("id"))
        .localCheckpoint(eager=True)
    )
    changed = 0
    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.id, "inner")
            .select(edges.src.alias("id"), F.col("cluster"))
            .groupBy("id")
            .agg(F.min("cluster").alias("nbr_min"))
        )
        stepped = (
            labels.withColumnRenamed("cluster", "__old")
            .join(neighbor_min, on="id", how="left")
            .select(
                "id",
                "__old",
                F.least(F.col("__old"), F.coalesce("nbr_min", F.col("__old"))).alias(
                    "cluster"
                ),
            )
        )
        # Pointer doubling: a node whose new label is L jumps straight to
        # L's own (already-lowered) label, collapsing two chain hops into
        # one pass. Labels only decrease and stay inside the component, so
        # the fixpoint is still the per-component minimum id.
        parent = stepped.select(
            F.col("id").alias("__pid"), F.col("cluster").alias("__pcl")
        )
        doubled = F.least(F.col("cluster"), F.coalesce("__pcl", F.col("cluster")))
        updated = (
            stepped.join(parent, stepped.cluster == parent.__pid, "left")
            .select(
                "id",
                doubled.alias("cluster"),
                (doubled < F.col("__old")).alias("__changed"),
            )
            .localCheckpoint(eager=True)
        )
        changed = updated.filter(F.col("__changed")).limit(1).count()
        labels = updated.drop("__changed")
        if not changed:
            break
    if changed:
        raise errors.ConvergenceError(
            f"duplicate_clusters: labels still moving after {max_iterations} "
            "passes — a component's label chain is longer than the iteration "
            "cap; raise max_iterations (passes scale with log of the cluster "
            "diameter)."
        )
    return labels


def dedup_near(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    jaccard_threshold: float | None = 0.5,
    max_bucket_size: int = 1000,
) -> DataFrame:
    """End-to-end near-duplicate removal: MinHash+LSH candidates ->
    (optional) exact Jaccard verification -> connected components -> keep
    the minimum-id representative of each cluster. The full
    training-data-pipeline shape: every stage bucket-bounded (no all-pairs
    term), the verification join runs only on candidate pairs, and the
    survivor filter is one left-anti join against the non-representatives.
    """
    pairs = minhash_candidate_pairs(
        df, id_col, text_col, num_hashes, bands, shingle_n, max_bucket_size
    )
    # The candidate set (small: bucket-bounded) feeds four consumers —
    # the member-id semijoin, both verify sides, and the clustering edge
    # list — so materialize it once instead of re-deriving the LSH
    # pipeline per consumer.
    pairs = pairs.localCheckpoint(eager=True)
    if jaccard_threshold is not None:
        # Shingle only candidate-pair members: at corpus scale the LSH
        # survivors are a vanishing fraction of rows, so semi-joining
        # first turns the two verify-side shingle projections from
        # full-corpus scans into candidate-only work.
        cand_ids = (
            pairs.select(F.col("id_a").alias("id"))
            .union(pairs.select(F.col("id_b").alias("id")))
            .dropDuplicates()
        )
        texts = df.select(F.col(id_col).alias("id"), F.col(text_col)).join(
            cand_ids, on="id", how="left_semi"
        )
        sh = texts.select(
            "id", shingle_hashes(F.col(text_col), shingle_n).alias("sh")
        )
        a = sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
        b = sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
        inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
        uni = F.size("sh_a") + F.size("sh_b") - inter
        jac = F.when(uni == 0, F.lit(0.0)).otherwise(
            inter.cast("double") / uni.cast("double")
        )
        pairs = (
            pairs.join(a, on="id_a")
            .join(b, on="id_b")
            .filter(jac >= jaccard_threshold)
            .select("id_a", "id_b")
        )
    clusters = duplicate_clusters(pairs)
    doomed = clusters.filter(F.col("cluster") != F.col("id")).select(
        F.col("id").alias(id_col)
    )
    return df.join(doomed, on=id_col, how="left_anti")


def duplicated_span_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    hashed: bool = False,
) -> DataFrame:
    """Exact duplicated k-gram span statistics across the corpus — the
    counting core of ExactSubstr deduplication (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better" — public
    method; the full suffix-array span REMOVAL is a different machine,
    this measures where and how much exact overlap exists): for each
    document, how many of its word k-gram windows also occur in at least
    one OTHER document. Integer outputs (window totals, cross-document
    duplicated occurrences, distinct-gram counts), hash-stable.

    Scale design: one explode to (doc, gram) occurrence rows, reduced
    immediately by a map-side-combinable (doc, gram) pair aggregation;
    then a per-gram doc-count window and a per-doc conditional-sum
    aggregation — a single linear pipeline, each stage over the reduced
    pair set, no recomputation and no all-pairs term. Gram keys shard
    evenly (at k>=5 there are no 'of the'-style hot keys). With
    ``hashed=True`` the shuffle payload per row is an 8-byte xxhash64
    instead of the gram string (the contamination fast-path pattern —
    use at corpus scale; collisions at 64 bits are negligible). The
    DuckDB oracle covers the string path."""
    # Token array materialized in its own projection before the gram
    # build: slicing an INLINED split+filter expression re-tokenizes the
    # document once per gram (the round-3 shingle lesson).
    words = F.filter(
        F.split(F.lower(F.col(text_col)), r"[^a-z0-9]+"), lambda x: x != ""
    )
    w = F.col("__w")
    grams = F.when(F.size(w) < k, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.size(w) - k),
            lambda i: F.concat_ws(" ", F.slice(w, i + 1, k)),
        )
    )
    from pyspark.sql import Window as W

    occ = df.select(id_col, words.alias("__w")).select(
        id_col, F.explode_outer(grams).alias("g")
    )
    if hashed:
        # Keep the null marker row for gram-less docs: xxhash64(NULL)
        # returns the seed constant, which would alias every empty doc
        # onto one phantom "gram" — guard it back to NULL.
        occ = occ.select(
            id_col,
            F.when(F.col("g").isNotNull(), F.xxhash64("g")).alias("g"),
        )
    # ONE linear pipeline over the reduced (doc, gram) pair set:
    # pair-agg (map-side combinable) -> per-gram doc-count window ->
    # per-doc conditional sums. Docs with fewer than k words survive as
    # a single null-gram row (explode_outer) and are zeroed by the
    # conditional aggregation — no doc_id join-back to the base scan, so
    # the corpus is read exactly once. The window partitions null-gram
    # rows by doc_id (second key) so the empty docs of a 100 TB corpus
    # don't all hash to one window partition; their __n_docs value is
    # never used (guarded by g IS NOT NULL).
    pairs = occ.groupBy(id_col, "g").agg(F.count("*").alias("__occ"))
    tagged = pairs.withColumn(
        "__n_docs",
        F.count("*").over(
            W.partitionBy(F.col("g"), F.when(F.col("g").isNull(), F.col(id_col)))
        ),
    )
    dup = F.col("g").isNotNull() & (F.col("__n_docs") >= 2)
    return tagged.groupBy(id_col).agg(
        F.sum(F.when(F.col("g").isNotNull(), F.col("__occ")).otherwise(0))
        .cast("long")
        .alias("n_windows"),
        F.count("g").cast("long").alias("n_distinct_grams"),
        F.sum(F.when(dup, F.col("__occ")).otherwise(0))
        .cast("long")
        .alias("n_dup_windows"),
        F.sum(F.when(dup, 1).otherwise(0)).cast("long").alias("n_dup_distinct_grams"),
    )


def remove_duplicated_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
) -> DataFrame:
    """ExactSubstr-style duplicated-span REMOVAL (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better" — public
    method; token-level k-gram variant of their byte-level suffix-array
    dedup): every word k-gram window that also occurs in at least one
    OTHER document marks its k token positions as duplicated, and the
    cleaned document drops every marked token. Within-doc repetition
    alone does not trigger removal (>= 2 distinct docs required), exactly
    like :func:`duplicated_span_stats` counts it. Output per document:
    ``n_tokens``, ``n_removed``, ``cleaned_text`` (kept tokens joined by
    single spaces).

    Scale design: one corpus scan explodes to (doc, pos, gram) rows,
    reduced by a map-side-combinable (doc, gram) aggregation that carries
    the start positions; a per-gram doc-count window marks shared grams
    (null-gram rows from gram-less docs partition by doc_id so they never
    hot-key the window); a per-doc conditional flatten yields each doc's
    duplicated-window starts. Rebuilding the text then REQUIRES one
    doc_id join of those starts back to the token arrays — unlike the
    stats operator, the payload (the tokens) cannot ride the gram shuffle
    without multiplying it by k — so the corpus pays exactly one extra
    exchange; the reference method's suffix-array construction globally
    sorts every byte of the corpus, strictly more movement. Start lists
    are merged into disjoint intervals with one aggregate expression, so
    the per-token coverage test is O(merged intervals), not O(windows);
    everything is Column expressions — no Python in the plan."""
    words = F.filter(
        F.split(F.lower(F.col(text_col)), r"[^a-z0-9]+"), lambda x: x != ""
    )
    w = F.col("__w")
    grams = F.when(F.size(w) < k, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.size(w) - k),
            lambda i: F.concat_ws(" ", F.slice(w, i + 1, k)),
        )
    )
    from pyspark.sql import Window as W

    base = df.select(id_col, words.alias("__w"))
    occ = base.select(id_col, F.posexplode_outer(grams).alias("pos", "g"))
    pairs = occ.groupBy(id_col, "g").agg(F.collect_list("pos").alias("__ps"))
    tagged = pairs.withColumn(
        "__nd",
        F.count("*").over(
            W.partitionBy(F.col("g"), F.when(F.col("g").isNull(), F.col(id_col)))
        ),
    )
    dup = F.col("g").isNotNull() & (F.col("__nd") >= 2)
    starts = tagged.groupBy(id_col).agg(
        F.flatten(F.collect_list(F.when(dup, F.col("__ps")))).alias("__starts")
    )
    # Merge sorted starts into disjoint [s, e) intervals: one fold, each
    # step either extends the last interval or appends a new one.
    ss = F.array_sort(F.coalesce(F.col("__starts"), F.array().cast("array<int>")))
    merged = F.aggregate(
        ss,
        F.array().cast("array<struct<s:int,e:int>>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0) & (s <= F.element_at(acc, -1)["e"]),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(
                    F.struct(
                        F.element_at(acc, -1)["s"].alias("s"),
                        F.greatest(F.element_at(acc, -1)["e"], s + F.lit(k))
                        .cast("int")
                        .alias("e"),
                    )
                ),
            ),
        ).otherwise(
            F.concat(
                acc,
                F.array(
                    F.struct(s.alias("s"), (s + F.lit(k)).cast("int").alias("e"))
                ),
            )
        ),
    )
    iv = F.col("__iv")
    return (
        base.join(starts, id_col, "left")
        .select(id_col, "__w", merged.alias("__iv"))
        .select(
            F.col(id_col),
            F.size("__w").cast("long").alias("n_tokens"),
            F.aggregate(iv, F.lit(0), lambda a, x: a + x["e"] - x["s"])
            .cast("long")
            .alias("n_removed"),
            F.concat_ws(
                " ",
                F.filter(
                    "__w",
                    lambda x, i: ~F.exists(
                        iv, lambda r: (r["s"] <= i) & (i < r["e"])
                    ),
                ),
            ).alias("cleaned_text"),
        )
    )


def remove_duplicate_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """C4-style global line deduplication (Raffel et al. 2020, "Exploring
    the Limits of Transfer Learning..." §2.2 describes span-level corpus
    dedup; the line-granular variant here is the common production form):
    every non-blank trimmed line keeps ONLY its first occurrence in the
    whole corpus — first = smallest (doc_id, position) — and every later
    occurrence (in other documents or later in the same document) is
    dropped. Output per document: ``n_lines``, ``n_kept``, and
    ``cleaned_text`` (kept lines joined by newlines, original order).

    Scale design: lines explode once to (doc, idx, line); the global
    first occurrence per line is a ``min(struct(doc, idx))`` hash
    aggregation — map-side combinable, so corpus-hot lines ("Home",
    boilerplate headers) collapse in the combiner instead of hot-keying
    a rank window; occurrences then join that table on the line key
    (AQE's skew-join split covers the join side of the same hot lines),
    and each document reassembles order-locally from
    ``sort_array(collect_list(...))`` — the line text rides the shuffle
    it already paid, so unlike :func:`remove_duplicated_spans` there is
    no join-back to the base scan. Blank/whitespace lines are dropped by
    the same trim+filter normalization as
    :func:`sakura_spark.functions.text.repetition_stats` line stats."""
    lines = F.filter(
        F.transform(F.split(F.col(text_col), "\n"), lambda x: F.trim(x)),
        lambda x: x != "",
    )
    base = df.select(id_col, lines.alias("__l"))
    occ = base.select(id_col, F.posexplode_outer("__l").alias("idx", "line"))
    firsts = (
        occ.where(F.col("line").isNotNull())
        .groupBy("line")
        .agg(F.min(F.struct(F.col(id_col).alias("d"), F.col("idx").alias("i"))).alias("__first"))
    )
    keep = F.col("line").isNotNull() & (
        F.struct(F.col(id_col).alias("d"), F.col("idx").alias("i")) == F.col("__first")
    )
    return (
        occ.join(firsts, "line", "left")
        .groupBy(id_col)
        .agg(
            F.count("line").cast("long").alias("n_lines"),
            F.sum(F.when(keep, 1).otherwise(0)).cast("long").alias("n_kept"),
            F.concat_ws(
                "\n",
                F.transform(
                    F.sort_array(
                        F.collect_list(
                            F.when(keep, F.struct(F.col("idx"), F.col("line")))
                        )
                    ),
                    lambda x: x["line"],
                ),
            ).alias("cleaned_text"),
        )
    )
