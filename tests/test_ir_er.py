"""IR operators (TF-IDF / collocations / inverted index) and blocked
entity resolution: exactness on planted corpora, float layers against
driver-side math, and plan-shape assertions for the scale-critical
properties (vocab tables broadcast, no Python nodes, no cartesian)."""

import math

import pytest

from pyspark.sql import functions as F

from sakura_spark.functions import er, ir


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "alpha beta gamma alpha"),
        (2, "alpha beta beta"),
        (3, "gamma delta epsilon"),
        (4, "zeta zeta zeta alpha beta"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_term_counts_exact(corpus):
    tc = {
        (r.doc_id, r.term): r.tf
        for r in ir.term_counts(corpus).collect()
    }
    assert tc[(1, "alpha")] == 2
    assert tc[(2, "beta")] == 2
    assert tc[(4, "zeta")] == 3
    assert (3, "alpha") not in tc


def test_doc_freq_exact(corpus):
    dfreq = {r.term: r.df for r in ir.doc_freq(ir.term_counts(corpus)).collect()}
    assert dfreq == {
        "alpha": 3,
        "beta": 3,
        "gamma": 2,
        "delta": 1,
        "epsilon": 1,
        "zeta": 1,
    }


def test_tfidf_float_layer_matches_driver_math(corpus):
    """tfidf = tf * ln((1+N)/(1+df)), checked against math.log exactly —
    the expression is a single multiply of JVM-computed ln, bit-equal to
    CPython's libm double for these magnitudes."""
    n = corpus.count()
    rows = ir.tfidf(corpus, n_docs=n).collect()
    assert rows
    for r in rows:
        expected = r.tf * math.log((1 + n) / (1 + r.df))
        assert r.tfidf == pytest.approx(expected, abs=1e-12)


def test_tfidf_topk_rank_and_filter(corpus):
    """max_df drops corpus-wide terms; ranking is (tf desc, term asc)."""
    out = ir.tfidf_topk(corpus, k=2, max_df=2)
    by_doc = {}
    for r in out.collect():
        by_doc.setdefault(r.doc_id, []).append((r.term, r.tf, r.df))
    # alpha/beta (df=3) are filtered everywhere; doc 4's top term is zeta.
    assert all(term not in ("alpha", "beta") for terms in by_doc.values() for term, _, _ in terms)
    assert by_doc[4] == [("zeta", 3, 1)]
    # doc 3: delta/epsilon/gamma all tf=1 -> term-asc tiebreak, k=2.
    assert by_doc[3] == [("delta", 1, 1), ("epsilon", 1, 1)]


def test_bigram_counts_exact(corpus):
    bg = {(r.w1, r.w2): r.n_xy for r in ir.bigram_counts(corpus).collect()}
    assert bg[("alpha", "beta")] == 3  # docs 1, 2, 4
    assert bg[("zeta", "zeta")] == 2
    assert bg[("gamma", "alpha")] == 1


def test_collocations_topk_and_pmi(corpus):
    top = ir.collocations_topk(corpus, k=3, min_count=2)
    rows = top.collect()
    assert [(r.w1, r.w2, r.n_xy) for r in rows] == [
        ("alpha", "beta", 3),
        ("zeta", "zeta", 2),
    ]  # only pairs with n_xy >= 2; order count desc then lexical
    [ab] = [r for r in rows if r.w1 == "alpha"]
    assert (ab.n_x, ab.n_y) == (4, 4)
    total = 15  # corpus token count
    [p] = ir.pmi(top.filter("w1 = 'alpha'"), total_tokens=total).collect()
    assert p.pmi == pytest.approx(math.log(3 * 15 / (4 * 4)), abs=1e-12)


def test_inverted_index_postings_and_cap(corpus):
    out = {r.term: (r.df, r.postings) for r in ir.inverted_index(corpus, max_df=2).collect()}
    assert out["gamma"] == (2, "1,3")
    assert out["zeta"] == (1, "4")
    assert "alpha" not in out  # df=3 > cap


def test_ir_plans_broadcast_vocab_and_stay_jvm(corpus):
    """The df/unigram joins must broadcast (vocab-sized dictionary
    lookup, never a corpus shuffle on term), and nothing may fall out of
    the JVM."""
    for df in (
        ir.tfidf_topk(corpus, k=2, max_df=2),
        ir.collocations_topk(corpus, k=3),
        ir.inverted_index(corpus, max_df=2),
    ):
        plan = _physical(df)
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
        assert "BatchEvalPython" not in plan and "MapInPandas" not in plan
        assert "CartesianProduct" not in plan


@pytest.fixture(scope="module")
def listings(spark):
    rows = [
        (1, "cold widget"),
        (2, "cold widget"),
        (3, "gold widget"),
        (4, "blue rod"),
        (5, "glue rod"),
        (6, "large bolt"),
    ]
    return spark.createDataFrame(rows, "id long, name string")


def test_er_blocked_pairs_planted(listings):
    out = {(r.name_a, r.name_b): (r.distance, r.n_a, r.n_b)
           for r in er.blocked_name_pairs(listings, "name", max_distance=2).collect()}
    assert out[("cold widget", "gold widget")] == (1, 2, 1)
    assert out[("blue rod", "glue rod")] == (1, 1, 1)
    # cross-block pair never compared
    assert all("bolt" not in a and "bolt" not in b for a, b in out)


def test_er_distance_bound_respected(listings):
    """A tighter bound excludes pairs above it: 'cold'->'large' (distance
    > 1) never appears, the two distance-1 pairs survive."""
    out = er.blocked_name_pairs(listings, "name", max_distance=1).collect()
    assert sorted((r.name_a, r.name_b) for r in out) == [
        ("blue rod", "glue rod"),
        ("cold widget", "gold widget"),
    ]


def test_er_degenerate_block_guard(listings):
    """A block key that fails to discriminate trips the quadratic guard
    instead of silently exploding."""
    with pytest.raises(ValueError, match="largest block"):
        er.blocked_name_pairs(
            listings, "name", block_key=lambda n: F.lit("all"), max_block_size=3
        )


def test_er_plan_no_cartesian(listings):
    plan = _physical(er.blocked_name_pairs(listings, "name"))
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


# ------------------------------------------------------------------- BM25


def test_bm25_saturation_exact(corpus):
    """The hash-exact ranking surface: weights recomputed with driver-side
    exact integer arithmetic + one float division per term."""
    out = {r.doc_id: r for r in
           ir.bm25_saturation_topk(corpus, ["alpha", "zeta"], k=10).collect()}
    # corpus totals: L = 4+3+3+5 = 15 tokens, N = 4 docs
    L, N = 15, 4
    def s(tf, dl):
        return (tf * 44 * L) / (tf * 20 * L + 6 * L + dl * 18 * N)
    # doc 4: alpha tf=1 dl=5, zeta tf=3 dl=5 -> both terms matched
    assert out[4].n_matched == 2 and out[4].dl == 5
    assert out[4].score == s(1, 5) + s(3, 5)
    # doc 1: alpha tf=2 dl=4, no zeta
    assert out[1].n_matched == 1
    assert out[1].score == s(2, 4)
    # doc 3 matches neither term -> absent
    assert 3 not in out
    # ranking: doc 4 (two terms incl. tf=3) above docs 1 and 2
    ranked = sorted(out.values(), key=lambda r: (-r.score, r.doc_id))
    assert ranked[0].doc_id == 4


def test_bm25_saturation_max_df_cap(corpus):
    """The integer idf spelling: alpha (df=3) dropped by max_df=2, zeta
    (df=1) survives."""
    out = {r.doc_id: r for r in
           ir.bm25_saturation_topk(corpus, ["alpha", "zeta"], k=10, max_df=2).collect()}
    assert set(out) == {4}
    assert out[4].n_matched == 1


def test_bm25_float_layer_matches_numpy(corpus):
    """Full Okapi BM25 (RSJ ln idf) against driver-side math."""
    out = {r.doc_id: r.bm25 for r in ir.bm25(corpus, ["alpha", "beta"]).collect()}
    L, N, avgdl = 15, 4, 15 / 4
    k1, b = 1.2, 0.75
    dfreq = {"alpha": 3, "beta": 3}
    tf = {1: {"alpha": 2, "beta": 1}, 2: {"alpha": 1, "beta": 2},
          4: {"alpha": 1, "beta": 1}}
    dl = {1: 4, 2: 3, 4: 5}
    for doc, terms in tf.items():
        expect = sum(
            math.log(1 + (N - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
            * c * (k1 + 1) / (c + k1 * (1 - b + b * dl[doc] / avgdl))
            for t, c in terms.items()
        )
        assert out[doc] == pytest.approx(expect, rel=1e-12)
    assert 3 not in out


def test_bm25_empty_query_raises(corpus):
    with pytest.raises(ValueError):
        ir.bm25_saturation_topk(corpus, [])
    with pytest.raises(ValueError):
        ir.bm25(corpus, [])


def test_bm25_plan_single_pass(corpus):
    """One corpus scan: the isin() prune sits under the explode project,
    no join-back, no Python nodes, top-k is TakeOrderedAndProject."""
    plan = _physical(ir.bm25_saturation_topk(corpus, ["alpha", "zeta"], k=5))
    assert "TakeOrderedAndProject" in plan
    assert "BatchEvalPython" not in plan and "CartesianProduct" not in plan
    assert plan.count("Scan ExistingRDD") + plan.count("LocalTableScan") <= 1


def test_bm25_empty_corpus_and_duplicate_terms(spark):
    from sakura_spark.functions import ir

    empty = spark.createDataFrame([], "doc_id long, text string")
    with pytest.raises(ValueError, match="empty corpus"):
        ir.bm25_saturation_topk(empty, ["zebra"])
    with pytest.raises(ValueError, match="empty corpus"):
        ir.bm25(empty, ["zebra"])

    df = spark.createDataFrame(
        [(1, "zebra runs fast"), (2, "zebra zebra herd"), (3, "no match here")],
        "doc_id long, text string",
    )
    once = {r.doc_id: r for r in ir.bm25_saturation_topk(df, ["zebra", "fast"]).collect()}
    twice = {
        r.doc_id: r
        for r in ir.bm25_saturation_topk(df, ["zebra", "fast", "zebra"]).collect()
    }
    # A repeated query term must not double-count: identical scores/rows.
    assert set(once) == set(twice)
    for d in once:
        assert once[d].score == twice[d].score
        assert once[d].n_matched == twice[d].n_matched


# --- RRF hybrid fusion --------------------------------------------------------


def test_rrf_fuse_semantics(spark):
    """Items in both lists sum both reciprocals; single-list items get
    one; ranks are (score DESC, id) and absent ranks report 0."""
    from sakura_spark.functions.ir import rrf_fuse

    a = spark.createDataFrame([(1, 9.0), (2, 8.0), (3, 7.0)], "doc_id long, score double")
    b = spark.createDataFrame([(2, 0.9), (4, 0.8)], "vec_id long, sim double")
    rows = {r["item_id"]: r for r in rrf_fuse(
        [(a, "doc_id", "score"), (b, "vec_id", "sim")], k=60, topk=10
    ).collect()}
    assert rows[2]["rank_0"] == 2 and rows[2]["rank_1"] == 1
    assert rows[2]["rrf_score"] == 1.0 / 62 + 1.0 / 61
    assert rows[1]["rrf_score"] == 1.0 / 61 and rows[1]["rank_1"] == 0
    assert rows[4]["rrf_score"] == 1.0 / 62 and rows[4]["rank_0"] == 0
    # both-lists item outranks either single-list item
    order = [r["item_id"] for r in sorted(rows.values(), key=lambda r: (-r["rrf_score"], r["item_id"]))]
    assert order[0] == 2


def test_rrf_fuse_tie_break_and_topk(spark):
    from sakura_spark.functions.ir import rrf_fuse

    a = spark.createDataFrame([(i, 1.0) for i in range(5)], "doc_id long, score double")
    out = rrf_fuse([(a, "doc_id", "score")], k=60, topk=3).collect()
    # equal scores -> rank by id ascending; topk truncates deterministically
    assert [(r["item_id"], r["rank_0"]) for r in out] == [(0, 1), (1, 2), (2, 3)]


def test_rrf_fuse_rejects_empty_rankings():
    from sakura_spark.functions.ir import rrf_fuse

    with pytest.raises(ValueError):
        rrf_fuse([])


def test_er_clusters_transitive_closure_and_singletons(spark):
    """Match pairs close transitively into entities: a chain A-B-C takes
    the lexicographically smallest name as its representative even where
    A-C alone is out of match distance; unmatched names resolve to
    themselves; n carries input row multiplicity."""
    from sakura_spark.functions.er import er_clusters

    rows = (
        [("acme corp",)] * 3
        + [("acmex corp",)] * 2
        + [("acmexxx corp",)]         # chain: acme -1- acmex -2- acmexxx
        + [("zeta widgets",)]         # singleton (own block)
        + [("romeo corp",)]           # same block, distance 5 > 2: singleton
    )
    df = spark.createDataFrame(rows, "name string")
    out = {r.name: (r.entity, r.n) for r in
           er_clusters(df, "name", max_distance=2).collect()}
    # acme->acmexxx is distance 3 (out of range): only the chain links them.
    assert out == {
        "acme corp": ("acme corp", 3),
        "acmex corp": ("acme corp", 2),
        "acmexxx corp": ("acme corp", 1),
        "zeta widgets": ("zeta widgets", 1),
        "romeo corp": ("romeo corp", 1),
    }
