"""Differential testing of the round-9 de-skewed rank machinery.

Both round-9 de-skew rewrites replaced a single skewed window with a
distributed spelling that must be BIT-IDENTICAL to the original:

* ``curation.perplexity_buckets``: range-partitioned two-pass rank +
  explicit ntile(3) size formula vs the per-language ntile window. The
  reference here is a pure-Python ntile over the operator's own emitted
  (lang, unseen_ratio, doc_id) columns — ties on ratio (empty docs pin
  to 1.0) exercise the doc_id tiebreak, language sizes 0..9 exercise
  the n < 3 tile edges.
* ``sketches._bottom_k`` (via kmv_sketch at a small salt_buckets):
  two-level salt-bucketed bottom-k vs a pure-Python sort of the
  distinct hash set — hot groups, duplicate values, and groups smaller
  than k all occur under generation.

Same suite pattern as test_text_differential: hypothesis-generated
inputs, naive evaluator must agree row-for-row.
"""

from __future__ import annotations

from conftest import diff_examples
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from sakura_spark.functions import curation, sketches

_doc_text = st.sampled_from(
    ["", "a a a", "b c d e", "a b a b", "x", "the cat sat", "q r s t u v"]
)
_lang = st.sampled_from(["en", "de"])
_corpus = st.lists(st.tuples(_doc_text, _lang), min_size=1, max_size=9)


def _py_ntile3(ordered_ids: list) -> dict:
    n = len(ordered_ids)
    base, rem = divmod(n, 3)
    sizes = [base + (1 if i < rem else 0) for i in range(3)]
    labels = ["head", "middle", "tail"]
    out, pos = {}, 0
    for tile, size in enumerate(sizes):
        for _ in range(size):
            out[ordered_ids[pos]] = labels[tile]
            pos += 1
    return out


@settings(
    max_examples=diff_examples(40, 8),
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(_corpus)
def test_perplexity_buckets_matches_python_ntile(spark, corpus):
    rows = [(i, t, lang) for i, (t, lang) in enumerate(corpus)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = curation.perplexity_buckets(df, top_v=20).collect()
    assert len(got) == len(rows)
    by_lang: dict[str, list] = {}
    for r in got:
        by_lang.setdefault(r.lang, []).append(r)
    for lang, rs in by_lang.items():
        ordered = [
            r.doc_id for r in sorted(rs, key=lambda r: (r.unseen_ratio, r.doc_id))
        ]
        want = _py_ntile3(ordered)
        for r in rs:
            assert r.ppl_bucket == want[r.doc_id], (
                lang,
                r.doc_id,
                r.unseen_ratio,
                r.ppl_bucket,
                want[r.doc_id],
            )


_vals = st.lists(
    st.tuples(st.sampled_from(["g1", "g2", "hot"]), st.integers(0, 40)),
    min_size=1,
    max_size=60,
)


@settings(
    max_examples=diff_examples(40, 8),
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(_vals, st.integers(1, 6))
def test_bottom_k_matches_python_sort(spark, pairs, k):
    df = spark.createDataFrame(pairs, "g string, v long")
    got = {
        (r.g, r["rank"]): r.hval
        for r in sketches.kmv_sketch(df, ["g"], "v", k=k, salt_buckets=3).collect()
    }
    hashed = df.select(
        "g", sketches.hash_word(df.v, "kmv", word=0).alias("h")
    ).collect()
    per_group: dict[str, set] = {}
    for r in hashed:
        per_group.setdefault(r.g, set()).add(r.h)
    want = {}
    for g, hs in per_group.items():
        for rank, h in enumerate(sorted(hs)[:k], start=1):
            want[(g, rank)] = h
    assert got == want
