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
