"""Byte-pair-encoding tokenizer: distributed counting, driver-side merges.

The reference engine has no tokenizer surface; this module is
LLM-pipeline extension surface (like curation/sharding). The
architecture mirrors how BPE is actually trained over a 100 TB corpus:

- The DATA-sized work — word frequency counting — is ONE distributed,
  map-side-combinable aggregation (explode -> groupBy -> sum). Its
  output is the distinct-word vocabulary: bounded by the language
  (~10^6 entries, megabytes), independent of corpus size.
- The merge loop itself runs driver-side over that SMALL word-count
  dict, exactly like the canonical algorithm (Sennrich, Haddow & Birch
  2016, "Neural Machine Translation of Rare Words with Subword Units" —
  a public algorithm; no tokenizer library is imported). Looping over
  the corpus per merge would be a catastrophic 100 TB anti-pattern; the
  word-count fan-in makes each merge O(vocab), not O(corpus).
- Applying learned merges back to the corpus is map-only: an
  Arrow-batched pandas UDF with a per-batch word cache (natural-language
  batches repeat words heavily, so the merge loop runs once per DISTINCT
  word per batch).

Determinism everywhere: merge ties break lexicographically, so the same
corpus always yields the same tokenizer on any cluster layout.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Marks the end of a word so merges never cross word boundaries and
# decoding is lossless ("est</w>" != "est" mid-word).
END = "</w>"


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Distributed word-frequency table: (word, n) for lowercased
    alphanumeric words. Partial aggregation combines map-side, so the
    shuffle carries distinct-words-per-partition, not corpus tokens."""
    w = F.explode(
        F.filter(
            F.split(F.lower(F.col(text_col)), r"[^a-z0-9]+"),
            lambda x: x != F.lit(""),
        )
    ).alias("word")
    return df.select(w).groupBy("word").agg(F.count(F.lit(1)).alias("n"))


def _pair_stats(vocab: dict[tuple[str, ...], int]) -> dict[tuple[str, str], int]:
    stats: dict[tuple[str, str], int] = {}
    for symbols, freq in vocab.items():
        for a, b in zip(symbols, symbols[1:]):
            stats[(a, b)] = stats.get((a, b), 0) + freq
    return stats


def _merge_vocab(
    vocab: dict[tuple[str, ...], int], pair: tuple[str, str]
) -> dict[tuple[str, ...], int]:
    a, b = pair
    merged = a + b
    out: dict[tuple[str, ...], int] = {}
    for symbols, freq in vocab.items():
        new: list[str] = []
        i = 0
        while i < len(symbols):
            if i + 1 < len(symbols) and symbols[i] == a and symbols[i + 1] == b:
                new.append(merged)
                i += 2
            else:
                new.append(symbols[i])
                i += 1
        key = tuple(new)
        out[key] = out.get(key, 0) + freq
    return out


def train_bpe(
    counts: DataFrame | Iterable[tuple[str, int]], n_merges: int = 100
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from a word-count table.

    ``counts`` is the output of :func:`word_counts` (collected here — it
    is vocabulary-sized, the ONLY driver transfer in training) or any
    (word, n) iterable. Greedy most-frequent-pair loop with
    lexicographic tie-break for cross-run determinism. Stops early when
    no pair repeats."""
    if isinstance(counts, DataFrame):
        counts = [(r[0], r[1]) for r in counts.collect()]
    vocab: dict[tuple[str, ...], int] = {}
    for word, n in counts:
        key = tuple(word) + (END,)
        vocab[key] = vocab.get(key, 0) + int(n)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        stats = _pair_stats(vocab)
        if not stats:
            break
        best = max(stats.items(), key=lambda kv: (kv[1], (kv[0][0], kv[0][1])))
        # Deterministic: highest count, then lexicographically LAST pair
        # (any fixed order works; max() keys make it explicit).
        if best[1] < 2:
            break
        merges.append(best[0])
        vocab = _merge_vocab(vocab, best[0])
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply merges (lowest rank first) to one word — the canonical
    greedy BPE encoder."""
    symbols = list(word) + [END]
    while len(symbols) > 1:
        pairs = [(ranks.get((a, b)), i) for i, (a, b) in enumerate(zip(symbols, symbols[1:]))]
        ranked = [(r, i) for r, i in pairs if r is not None]
        if not ranked:
            break
        _, i = min(ranked)
        symbols[i : i + 2] = [symbols[i] + symbols[i + 1]]
    return symbols


def bpe_segment(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Map-only corpus tokenization with the learned merges: returns
    (id, n_words, n_bpe_tokens) per document via an Arrow-batched pandas
    UDF. The merge table ships inside the serialized UDF (kilobytes); a
    per-batch cache runs the merge loop once per DISTINCT word."""
    ranks = {pair: i for i, pair in enumerate(merges)}

    @F.pandas_udf("struct<n_words: long, n_bpe_tokens: long>")
    def seg(texts: pd.Series) -> pd.DataFrame:
        import re

        cache: dict[str, int] = {}
        n_words_out, n_tokens_out = [], []
        for t in texts:
            words = [w for w in re.split(r"[^a-z0-9]+", (t or "").lower()) if w]
            total = 0
            for w in words:
                if w not in cache:
                    cache[w] = len(encode_word(w, ranks))
                total += cache[w]
            n_words_out.append(len(words))
            n_tokens_out.append(total)
        return pd.DataFrame({"n_words": n_words_out, "n_bpe_tokens": n_tokens_out})

    out = df.select(F.col(id_col), seg(F.col(text_col)).alias("s"))
    return out.select(id_col, F.col("s.n_words").alias("n_words"), F.col("s.n_bpe_tokens").alias("n_bpe_tokens"))


def bpe_vocabulary(merges: list[tuple[str, str]], base: Iterable[str] = ()) -> list[str]:
    """The token vocabulary implied by a merge list (merged symbols in
    learn order, after any base alphabet)."""
    return list(base) + [a + b for a, b in merges]


def bpe_segment_oracle_sql(docs_sql: str, merges: list[tuple[str, str]]) -> str:
    """DuckDB twin of :func:`bpe_segment` for a FIXED merge list: the
    greedy encoder loop (:func:`encode_word` — merge the
    (lowest-rank, lowest-index) applicable pair, one pair per step) as a
    RECURSIVE CTE over symbol lists. The rank lookup compiles the merge
    table into a literal CASE chain; the (rank, index) tie rule becomes
    list_min over non-null ranks followed by list_position (first
    occurrence = lowest index). Each step shortens the list by one, so
    the recursion terminates in at most len(word) steps per distinct
    word; per-document totals join every word OCCURRENCE back to its
    encoded length — exactly the pandas-UDF per-batch word cache,
    spelled in SQL. A hash-green driver row therefore proves the
    Arrow-UDF encoder's arithmetic engine-exact, the one operator family
    whose production path runs in Python rather than Catalyst
    expressions. ``docs_sql`` yields (doc_id, text); symbols are
    alphanumeric so the generated literals never need escaping."""
    rank_case = " ".join(
        f"WHEN s[i] = '{a}' AND s[i + 1] = '{b}' THEN {r}"
        for r, (a, b) in enumerate(merges)
    )
    # An empty merge table (train_bpe found no repeating pair) must still
    # generate valid SQL: a never-true WHEN keeps every rank NULL, so no
    # word merges — exactly encode_word's behavior with empty ranks.
    if not merges:
        rank_case = "WHEN 1 = 0 THEN 0"
    rl = f"list_transform(range(1, len(s)), i -> CASE {rank_case} ELSE NULL END)"
    rs = "list_min(list_filter(rl, x -> x IS NOT NULL))"
    return (
        "WITH RECURSIVE "
        f"src AS ({docs_sql}), "
        "w AS (SELECT doc_id, unnest(list_filter(regexp_split_to_array("
        "lower(coalesce(text, '')), '[^a-z0-9]+'), x -> x != '')) AS word "
        "FROM src), "
        "dw AS (SELECT DISTINCT word FROM w), "
        "enc AS ("
        "SELECT word, list_append(list_transform(range(1, len(word) + 1), "
        "i -> word[i:i]), '</w>') AS s FROM dw "
        "UNION ALL "
        "SELECT word, list_concat(list_concat(list_slice(s, 1, bi - 1), "
        "[s[bi] || s[bi + 1]]), list_slice(s, bi + 2, len(s))) AS s "
        f"FROM (SELECT word, s, list_position(rl, {rs}) AS bi, {rs} AS ok "
        f"FROM (SELECT word, s, {rl} AS rl FROM enc)) WHERE ok IS NOT NULL"
        "), "
        f"fin AS (SELECT word, len(s) AS n_toks FROM "
        f"(SELECT word, s, {rl} AS rl FROM enc) WHERE {rs} IS NULL), "
        "agg AS (SELECT w.doc_id, CAST(count(*) AS BIGINT) AS n_words, "
        "CAST(sum(f.n_toks) AS BIGINT) AS n_bpe_tokens "
        "FROM w JOIN fin f USING (word) GROUP BY w.doc_id) "
        "SELECT s.doc_id, coalesce(a.n_words, 0) AS n_words, "
        "coalesce(a.n_bpe_tokens, 0) AS n_bpe_tokens "
        "FROM src s LEFT JOIN agg a USING (doc_id)"
    )
