"""Differential testing of the round-6 text operators.

Pure-Python references for ``text.repetition_stats`` and
``text.lm_score`` (plain Counters over the same normalization), checked
over hypothesis-generated random corpora — whitespace runs, punctuation,
newlines, repeated fragments, empty documents. Same suite pattern as
test_icl_differential: the DataFrame pipelines (explode + histogram aggs,
broadcast-LM joins) must agree row-for-row with the naive evaluator.
"""

import re
from collections import Counter

from conftest import diff_examples
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from sakura_spark.functions import text

# Small alphabet with whitespace/newlines/punctuation so duplicates and
# blank lines actually occur; fragments repeat to exercise the histogram
# peaks.
_frag = st.sampled_from(
    ["the cat", "sat", "on the mat", "a1 b2", "", "  ", "\n", "dogs!", "the the"]
)
_doc = st.lists(_frag, min_size=0, max_size=8).map(" ".join)
_corpus = st.lists(_doc, min_size=1, max_size=6)


def _words(t: str) -> list[str]:
    return [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]


def _lines(t: str) -> list[str]:
    return [ln.strip() for ln in t.split("\n") if ln.strip() != ""]


def _bigrams(ws: list[str]) -> list[str]:
    return [f"{a} {b}" for a, b in zip(ws, ws[1:])]


@settings(
    max_examples=diff_examples(60, 10),
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(_corpus)
def test_repetition_stats_matches_python(spark, corpus):
    rows = list(enumerate(corpus))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: tuple(r)[1:] for r in text.repetition_stats(df).collect()}
    assert set(got) == set(range(len(corpus)))
    for i, t in rows:
        ws, lns, bgs = _words(t), _lines(t), _bigrams(_words(t))
        wc, bc = Counter(ws), Counter(bgs)
        expect = (
            len(lns),
            len(set(lns)),
            len(ws),
            max(wc.values()) if wc else 0,
            len(bgs),
            max(bc.values()) if bc else 0,
        )
        assert got[i] == expect, (i, t, got[i], expect)


@settings(
    max_examples=diff_examples(40, 8),
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(_corpus, st.sampled_from([2, 5, 1000]))
def test_lm_score_matches_python(spark, corpus, top_v):
    rows = list(enumerate(corpus))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    uni_all = Counter(w for _, t in rows for w in _words(t))
    bi_all = Counter(g for _, t in rows for g in _bigrams(_words(t)))
    # deterministic top-V pruning: count desc, gram asc
    uni = dict(sorted(uni_all.items(), key=lambda kv: (-kv[1], kv[0]))[:top_v])
    bi = dict(sorted(bi_all.items(), key=lambda kv: (-kv[1], kv[0]))[:top_v])
    got = {
        r.doc_id: tuple(r)[1:] for r in text.lm_score(df, top_v=top_v).collect()
    }
    assert set(got) == set(range(len(corpus)))
    for i, t in rows:
        gs = _bigrams(_words(t))
        expect = (
            len(gs),
            sum(1 for g in gs if g not in bi),
            sum(bi.get(g, 0) for g in gs),
            sum(uni.get(g.split(" ")[0], 0) for g in gs),
        )
        assert got[i] == expect, (i, t, top_v, got[i], expect)


def test_readability_hand_computed(spark):
    """'The cat sat. It ran away!' — 6 words, 2 sentences, 8 vowel groups
    (the/cat/sat have 1 each; it=1, ran=1, a-way: 'awa'+'y'? -> regex
    groups: 'e','a','a','I','a','away' -> recount below in python)."""
    import re
    txt = "The cat sat. It ran away!"
    words = len(re.findall(r"[A-Za-z]+", txt))
    sents = max(len(re.findall(r"[.!?]+", txt)), 1)
    syls = len(re.findall(r"[aeiouyAEIOUY]+", txt))
    from sakura_spark.functions import text as T
    df = spark.createDataFrame([(1, txt), (2, "")], "doc_id long, text string")
    out = {r.doc_id: r for r in T.readability(df).collect()}
    r = out[1]
    assert (r.n_words, r.n_sentences, r.n_syllables) == (words, sents, syls)
    wps, spw = words / sents, syls / words
    assert r.flesch == 206.835 - 1.015 * wps - 84.6 * spw
    assert r.fk_grade == 0.39 * wps + 11.8 * spw - 15.59
    assert out[2].flesch == 0.0 and out[2].fk_grade == 0.0
    assert out[2].n_sentences == 1  # floored


def test_readability_matches_duckdb_twin(spark):
    import duckdb
    import pandas as pd
    from sakura_spark.functions import text as T
    rows = [
        (1, "Simple words read easily. Yes!"),
        (2, "Unquestionably, the polysyllabic demonstration overcomplicates."),
        (3, "no terminators here just a fragment"),
        (4, "123 456 ?!"),
        (5, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = (
        T.readability(df).drop("text").toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("docs_t", pd.DataFrame(rows, columns=["doc_id", "text"]))
    want = (
        con.execute(T.readability_oracle_sql("SELECT doc_id, text FROM docs_t"))
        .df().sort_values("doc_id").reset_index(drop=True)
    )
    for c in ["n_words", "n_sentences", "n_syllables", "flesch", "fk_grade"]:
        assert list(got[c]) == list(want[c]), c
