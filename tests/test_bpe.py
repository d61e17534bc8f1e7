"""BPE tokenizer training/application — distributed-count + driver-merge
architecture, validated against the canonical algorithm on toy corpora."""

import collections
import re
import sys
from pathlib import Path

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from sakura_spark.functions import bpe


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, "low low low low low"),
        (1, "lower lower"),
        (2, "newest newest newest newest newest newest"),
        (3, "widest widest widest"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def test_word_counts_match_counter(spark, corpus):
    got = {r["word"]: r["n"] for r in bpe.word_counts(corpus).collect()}
    want = collections.Counter()
    for _, text in corpus.collect():
        want.update(w for w in re.split(r"[^a-z0-9]+", text.lower()) if w)
    assert got == dict(want)


def test_train_bpe_learns_canonical_merges(corpus):
    """The Sennrich toy corpus: the suffix 'est</w>' assembles into one
    token before 'low' finishes, because newest+widest (9) outweigh
    low+lower (7). The first merge is a frequency-9 pair (tie broken
    lexicographically — any fixed order is valid BPE)."""
    merges = bpe.train_bpe(bpe.word_counts(corpus), n_merges=6)
    vocab = bpe.bpe_vocabulary(merges)
    assert "est</w>" in vocab
    assert "low" in vocab
    assert vocab.index("est</w>") < vocab.index("low")
    # Deterministic across runs/layouts.
    again = bpe.train_bpe(bpe.word_counts(corpus), n_merges=6)
    assert merges == again


def test_encode_word_is_lossless_and_uses_merges(corpus):
    merges = bpe.train_bpe(bpe.word_counts(corpus), n_merges=10)
    ranks = {p: i for i, p in enumerate(merges)}
    for word in ("low", "lower", "newest", "widest", "lowest", "unseen"):
        toks = bpe.encode_word(word, ranks)
        assert "".join(toks) == word + bpe.END  # lossless
    # A fully-merged training word collapses to few symbols.
    assert len(bpe.encode_word("newest", ranks)) <= 3


def test_bpe_segment_matches_driver_side(corpus):
    merges = bpe.train_bpe(bpe.word_counts(corpus), n_merges=10)
    ranks = {p: i for i, p in enumerate(merges)}
    got = {r["doc_id"]: (r["n_words"], r["n_bpe_tokens"]) for r in bpe.bpe_segment(corpus, merges).collect()}
    for doc_id, text in corpus.collect():
        words = [w for w in re.split(r"[^a-z0-9]+", text.lower()) if w]
        want = (len(words), sum(len(bpe.encode_word(w, ranks)) for w in words))
        assert got[doc_id] == want


def test_bpe_plans_are_scale_shaped(spark, corpus):
    """word_counts = one partial-aggregated shuffle; segment = map-only
    Arrow-batched python, no Exchange, no row-at-a-time Python."""
    wc_plan = bpe.word_counts(corpus)._jdf.queryExecution().executedPlan().toString()
    assert wc_plan.count("Exchange") == 1
    merges = [("e", "s"), ("es", "t")]
    seg_plan = bpe.bpe_segment(corpus, merges)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in seg_plan
    assert "BatchEvalPython" not in seg_plan  # Arrow path, not row-at-a-time


def test_train_stops_when_no_pair_repeats():
    merges = bpe.train_bpe([("ab", 1)], n_merges=50)
    assert merges == []  # singleton frequencies never merge
    assert bpe.bpe_vocabulary([("a", "b"), ("ab", "c")]) == ["ab", "abc"]


def test_bpe_segment_oracle_twin_matches_encoder(spark):
    """The recursive-CTE oracle re-derives the Arrow-UDF encoder exactly:
    per-doc word and token counts agree with bpe_segment AND with a
    driver-side encode_word re-computation, including empty/null docs and
    out-of-vocabulary words."""
    import re

    import duckdb
    import pandas as pd

    counts = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3), ("the", 9)]
    merges = bpe.train_bpe(counts, n_merges=16)
    ranks = {p: i for i, p in enumerate(merges)}
    docs = [
        (1, "the newest lower bound"),
        (2, "widest the the low"),
        (3, ""),
        (4, "zebra 42 xylophone"),
        (5, None),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_words, r.n_bpe_tokens)
        for r in bpe.bpe_segment(df, merges).collect()
    }
    for i, t in docs:
        words = [w for w in re.split(r"[^a-z0-9]+", (t or "").lower()) if w]
        assert got[i] == (
            len(words),
            sum(len(bpe.encode_word(w, ranks)) for w in words),
        ), i

    con = duckdb.connect()
    con.register("docs_t", pd.DataFrame(docs, columns=["doc_id", "text"]))
    sql = bpe.bpe_segment_oracle_sql("SELECT doc_id, text FROM docs_t", merges)
    want = {r[0]: (r[1], r[2]) for r in con.execute(sql).fetchall()}
    assert got == want
