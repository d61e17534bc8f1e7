"""Differential testing of 3-way merge against a naive set model.

Random divergent branch pairs (adds from a fresh pool, deletes from the
ancestor extension, on each side independently) are merged with every
strategy and compared against a pure-Python set-semantics reference
implementing the documented algorithm (reference lib/management/merge.ml:
endpoint diffs vs the LCA, disjoint union of both sides' deltas). Tuple
add/remove conflicts are unreachable via endpoint diffs (see merge.py
docstring), so on these generated states all three strategies must agree
with the unconflicted 3-way apply — any divergence, or any spurious
conflict, is a bug.
"""

from hypothesis import HealthCheck, given, settings

from conftest import diff_examples
from hypothesis import strategies as st

from sakura_spark.database import Database
from sakura_spark.management.merge import (
    PREFER_LEFT,
    PREFER_RIGHT,
    REVERT_TO_ANCESTOR,
    merge_databases,
)

ANC = [0, 1, 2, 3]
POOL_L = [10, 11]
POOL_R = [20, 21]


@st.composite
def _scenario(draw):
    """Branch mutations; a side never annihilates to the empty extension
    (content-addressing would alias its tip to the pre-insert historical
    state, and the left-chain-first LCA fast-forwards — the documented
    divergence shared with the reference's hash-chain walk, exercised by
    test_merge_fast_forward_by_content_addressing instead)."""
    l_add = draw(st.sets(st.sampled_from(POOL_L)))
    l_del = draw(st.sets(st.sampled_from(ANC)))
    r_add = draw(st.sets(st.sampled_from(POOL_R)))
    r_del = draw(st.sets(st.sampled_from(ANC)))
    if l_del == set(ANC) and not l_add:
        l_del = l_del - {draw(st.sampled_from(ANC))}
    if r_del == set(ANC) and not r_add:
        r_del = r_del - {draw(st.sampled_from(ANC))}
    return l_add, l_del, r_add, r_del


@given(s=_scenario())
@settings(
    max_examples=diff_examples(6, 2),
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
def test_merge_matches_set_model(spark, tmp_path_factory, s):
    from sakura_spark.management.store import SnapshotStore

    l_add, l_del, r_add, r_del = s
    store = SnapshotStore(str(tmp_path_factory.mktemp("mstore")))
    db = Database(spark, "m", store=store)
    db.create_relation("items", [("v", "integer")])
    db.insert_tuples("items", [{"v": v} for v in ANC])
    anc_hash = db.hash

    left = Database.load(spark, anc_hash, store)
    if l_add:
        left.insert_tuples("items", [{"v": v} for v in sorted(l_add)])
    if l_del:
        left.delete_tuples("items", [{"v": v} for v in sorted(l_del)])

    right = Database.load(spark, anc_hash, store)
    if r_add:
        right.insert_tuples("items", [{"v": v} for v in sorted(r_add)])
    if r_del:
        right.delete_tuples("items", [{"v": v} for v in sorted(r_del)])

    expected = (set(ANC) - l_del - r_del) | l_add | r_add
    # Identical mutations on both sides (possible when neither adds and
    # the delete sets coincide) converge to the SAME content hash; the
    # chain walk then finds the shared tip first — the content-addressed
    # fast-forward documented in _scenario, with an empty diff. For
    # diverged tips the LCA must be the true fork point.
    expected_anc = left.hash if left.hash == right.hash else anc_hash
    for strategy in (PREFER_LEFT, PREFER_RIGHT, REVERT_TO_ANCESTOR):
        res = merge_databases(spark, store, left.hash, right.hash, strategy)
        assert res.ancestor == expected_anc
        assert res.conflicts == []
        got = {r.v for r in res.merged_relations["items"].collect()}
        assert got == expected, f"strategy={strategy}"


def test_right_branch_delete_all_propagates(spark, tmp_path):
    """Regression: when the RIGHT tip's content hash aliases an earlier
    historical state (delete every row -> pre-insert empty state), the
    store must not keep the aliased hash's original shallow history — the
    LCA search walking the left chain would then pick the empty state as
    ancestor and resurrect right's deletions. put_manifest merges
    histories on re-save, so the true ancestor wins and the merge result
    is empty."""
    from sakura_spark.management.store import SnapshotStore

    store = SnapshotStore(str(tmp_path / "store"))
    db = Database(spark, "m", store=store)
    db.create_relation("items", [("v", "integer")])
    db.insert_tuples("items", [{"v": v} for v in (1, 2)])
    anc_hash = db.hash

    left = Database.load(spark, anc_hash, store)  # untouched
    right = Database.load(spark, anc_hash, store)
    right.delete_tuples("items", [{"v": 1}, {"v": 2}])

    res = merge_databases(spark, store, left.hash, right.hash, PREFER_LEFT)
    assert res.ancestor == anc_hash
    assert res.merged_relations["items"].count() == 0
