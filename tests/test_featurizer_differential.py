"""Differential testing of the round-9 session-3 operators.

Pure-Python references for ``text.hash_features`` (hashlib sha256 slices),
``dedup.corpus_overlap`` (minhash over the union shingle set, min-of-mins),
``similarity.embedding_moments`` (numpy integer sums on the quantized
grid), and the recursive-CTE BPE oracle (checked against
``bpe.encode_word`` on random corpora and random merge tables — DuckDB
only, no Spark, so the subtle SQL gets wide random coverage cheaply).
Same suite pattern as test_text_differential: the distributed pipelines
must agree value-for-value with the naive evaluator on
hypothesis-generated inputs.
"""

import hashlib
import math
import re
from collections import Counter

from conftest import diff_examples
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from sakura_spark.functions import bpe, dedup, similarity, text

_P = (1 << 31) - 1

_frag = st.sampled_from(
    ["the cat sat", "on the mat", "a1 b2 c3", "", "  ", "dogs run fast",
     "the the the", "x", "one two"]
)
_doc = st.lists(_frag, min_size=0, max_size=5).map(" ".join)
_corpus = st.lists(
    st.tuples(_doc, st.sampled_from(["a", "b", "c"])), min_size=1, max_size=8
)


def _hw(tok: str, salt: str, word: int) -> int:
    d = hashlib.sha256((salt + "\x1f" + tok).encode()).hexdigest()
    return int(d[15 * word : 15 * (word + 1)], 16)


def _tokens(t: str) -> list[str]:
    t = t.strip()
    return t.split() if t else []


def _shingles(t: str) -> set[str]:
    ws = _tokens(t.lower())
    if len(ws) < 3:
        return set()
    return {" ".join(ws[i : i + 3]) for i in range(len(ws) - 2)}


@settings(
    max_examples=diff_examples(40, 8),
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(_corpus)
def test_hash_features_matches_python(spark, corpus):
    rows = [(i, t) for i, (t, _) in enumerate(corpus)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.id, r.bucket): r.val
        for r in text.hash_features(df, dim=8).collect()
    }
    exp: dict = {}
    for i, t in rows:
        for tok in _tokens(t.lower()):
            b = _hw(tok, "fh", 0) % 8
            s = 1 if _hw(tok, "fh", 1) % 2 == 0 else -1
            exp[(i, b)] = exp.get((i, b), 0) + s
    assert got == exp


@settings(
    max_examples=diff_examples(25, 6),
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(_corpus)
def test_corpus_overlap_matches_python(spark, corpus):
    rows = [(i, t, s) for i, (t, s) in enumerate(corpus)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    k = 8
    got = {
        (r.group_a, r.group_b): (r.matching_slots, r.jaccard_est)
        for r in dedup.corpus_overlap(df, "source", num_hashes=k).collect()
    }

    # Reference: minhash of each group's UNION shingle set (min of mins).
    union: dict = {}
    for _, t, s in rows:
        union.setdefault(s, set()).update(_shingles(t))
    from sakura_spark.functions.dedup import _perm_params

    sigs = {}
    for s, grams in union.items():
        if not grams:
            continue  # groups with no shingles have no signature row
        hs = [_hw(g, "mh", 0) % _P for g in grams]
        sigs[s] = [
            min((a * h + b) % _P for h in hs)
            for a, b in (_perm_params(i) for i in range(k))
        ]
    exp = {}
    for a in sigs:
        for b in sigs:
            if a < b:
                m = sum(x == y for x, y in zip(sigs[a], sigs[b]))
                exp[(a, b)] = (m, m / k)
    assert got == exp


@settings(
    max_examples=diff_examples(30, 8),
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    st.lists(
        st.lists(
            st.floats(min_value=-2.0, max_value=2.0, allow_nan=False, width=32),
            min_size=3,
            max_size=3,
        ),
        min_size=1,
        max_size=6,
    )
)
def test_embedding_moments_matches_python(spark, vecs):
    import numpy as np

    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    got = {
        (r.i, r.j): (r.n, r.s_i, r.s_j, r.s_ij)
        for r in similarity.embedding_moments(df, dims=3, grid=4.0).collect()
    }
    # Mirror storage: float32 round-trip, then the floor-form grid.
    Q = np.floor(np.array(vecs, dtype=np.float32).astype(np.float64) * 4.0 + 0.5)
    n = len(vecs)
    for i in range(3):
        for j in range(i, 3):
            assert got[(i, j)] == (
                n,
                int(Q[:, i].sum()),
                int(Q[:, j].sum()),
                int((Q[:, i] * Q[:, j]).sum()),
            ), (i, j)


# --- BPE oracle CTE vs the reference encoder (DuckDB only, no Spark) --------

_word = st.text(alphabet="abc1", min_size=1, max_size=7)


@settings(max_examples=diff_examples(40, 10), deadline=None)
@given(
    st.lists(st.tuples(_word, st.integers(1, 9)), min_size=1, max_size=8),
    st.lists(st.lists(_word, min_size=0, max_size=5), min_size=1, max_size=4),
)
def test_bpe_oracle_cte_matches_encoder(train_counts, docs_words):
    """The recursive-CTE oracle equals encode_word for ARBITRARY merge
    tables (trained on random vocabularies) over arbitrary corpora —
    including out-of-vocabulary words, repeated words, and empty docs."""
    import duckdb
    import pandas as pd

    merges = bpe.train_bpe(train_counts, n_merges=12)
    ranks = {p: i for i, p in enumerate(merges)}
    docs = [(i, " ".join(ws)) for i, ws in enumerate(docs_words)]

    exp = {}
    for i, t in docs:
        ws = [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]
        exp[i] = (len(ws), sum(len(bpe.encode_word(w, ranks)) for w in ws))

    con = duckdb.connect()
    con.register("docs_t", pd.DataFrame(docs, columns=["doc_id", "text"]))
    sql = bpe.bpe_segment_oracle_sql("SELECT doc_id, text FROM docs_t", merges)
    got = {r[0]: (r[1], r[2]) for r in con.execute(sql).fetchall()}
    assert got == exp
