"""Differential testing of the IR and entity-resolution operators.

Pure-Python references (plain Counters / brute-force all-pairs Levenshtein)
checked over hypothesis-generated random corpora and name sets — the same
suite pattern as test_text_differential: the DataFrame pipelines (explode +
map-side-combined aggs, broadcast vocab joins, blocked pair joins) must
agree row-for-row with the naive evaluator.
"""

import re
from collections import Counter

from conftest import diff_examples
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from sakura_spark.functions import er, ir

_frag = st.sampled_from(
    ["the cat", "sat", "on the mat", "a1 b2", "", "  ", "dogs!", "the the", "zeta"]
)
_doc = st.lists(_frag, min_size=0, max_size=6).map(" ".join)
_corpus = st.lists(_doc, min_size=1, max_size=5)


def _words(t: str) -> list[str]:
    return [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]


def _py_tfidf_topk(docs: list[str], k: int, max_df: int):
    tf = Counter()
    for i, t in enumerate(docs):
        for w in _words(t):
            tf[(i, w)] += 1
    dfreq = Counter(w for (_, w) in tf)
    out = set()
    for i in range(len(docs)):
        terms = [
            (w, tf[(i, w)], dfreq[w])
            for (d, w) in tf
            if d == i and dfreq[w] <= max_df
        ]
        terms.sort(key=lambda x: (-x[1], x[0]))
        out.update((i, w, c, d) for w, c, d in terms[:k])
    return out


def _py_collocations(docs: list[str], k: int, min_count: int):
    bg, uni = Counter(), Counter()
    for t in docs:
        ws = _words(t)
        uni.update(ws)
        bg.update(zip(ws, ws[1:]))
    rows = [
        (w1, w2, n, uni[w1], uni[w2])
        for (w1, w2), n in bg.items()
        if n >= min_count
    ]
    rows.sort(key=lambda r: (-r[2], r[0], r[1]))
    return rows[:k]


def _py_inverted(docs: list[str], max_df: int):
    postings = {}
    for i, t in enumerate(docs):
        for w in set(_words(t)):
            postings.setdefault(w, []).append(i)
    return {
        w: (len(ids), ",".join(str(i) for i in sorted(ids)))
        for w, ids in postings.items()
        if len(ids) <= max_df
    }


@settings(
    max_examples=diff_examples(40, 8),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus=_corpus, k=st.integers(1, 3), max_df=st.integers(1, 4))
def test_tfidf_topk_matches_python(spark, corpus, k, max_df):
    df = spark.createDataFrame(list(enumerate(corpus)), "doc_id long, text string")
    got = {
        (r.doc_id, r.term, r.tf, r.df)
        for r in ir.tfidf_topk(df, k=k, max_df=max_df).collect()
    }
    assert got == _py_tfidf_topk(corpus, k, max_df)


@settings(
    max_examples=diff_examples(40, 8),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus=_corpus, k=st.integers(1, 5), min_count=st.integers(1, 3))
def test_collocations_matches_python(spark, corpus, k, min_count):
    df = spark.createDataFrame(list(enumerate(corpus)), "doc_id long, text string")
    got = [
        (r.w1, r.w2, r.n_xy, r.n_x, r.n_y)
        for r in ir.collocations_topk(df, k=k, min_count=min_count).collect()
    ]
    assert got == _py_collocations(corpus, k, min_count)


@settings(
    max_examples=diff_examples(40, 8),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus=_corpus, max_df=st.integers(1, 5))
def test_inverted_index_matches_python(spark, corpus, max_df):
    df = spark.createDataFrame(list(enumerate(corpus)), "doc_id long, text string")
    got = {
        r.term: (r.df, r.postings)
        for r in ir.inverted_index(df, max_df=max_df).collect()
    }
    assert got == _py_inverted(corpus, max_df)


# --- entity resolution -------------------------------------------------------


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


_name = st.tuples(
    st.sampled_from(["cold", "gold", "bold", "blue", "glue", "red"]),
    st.sampled_from(["widget", "rod", "bolt"]),
).map(" ".join)
_names = st.lists(_name, min_size=1, max_size=10)


@settings(
    max_examples=diff_examples(40, 8),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(names=_names, max_distance=st.integers(1, 4))
def test_blocked_pairs_match_brute_force(spark, names, max_distance):
    """Within-block pairs equal the brute-force all-pairs result
    restricted to equal block keys (the default key: last token). Counts
    equal each name's multiplicity."""
    df = spark.createDataFrame(list(enumerate(names)), "id long, name string")
    got = {
        (r.name_a, r.name_b): (r.distance, r.n_a, r.n_b)
        for r in er.blocked_name_pairs(df, "name", max_distance=max_distance).collect()
    }
    mult = Counter(names)
    expected = {}
    uniq = sorted(mult)
    for i, a in enumerate(uniq):
        for b in uniq[i + 1 :]:
            if a.split()[-1] != b.split()[-1]:
                continue
            d = _lev(a, b)
            if 1 <= d <= max_distance:
                expected[(a, b)] = (d, mult[a], mult[b])
    assert got == expected
