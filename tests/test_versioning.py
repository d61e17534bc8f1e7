"""History, time travel, branches, diff, 3-way merge (reference
integration:/branching:/branch:/diff:/merge: test groups)."""

import pytest

from sakura_spark import errors
from sakura_spark.database import Database
from sakura_spark.management.branches import BranchManager
from sakura_spark.management.diff import diff_databases
from sakura_spark.management.merge import (
    PREFER_LEFT,
    PREFER_RIGHT,
    REVERT_TO_ANCESTOR,
    merge_databases,
)


@pytest.fixture()
def db(spark, store):
    d = Database(spark, "vdb", store=store)
    d.create_relation("items", [("v", "integer")])
    return d


def test_hash_changes_and_history(db):
    h0 = db.hash
    db.insert_tuples("items", [{"v": 10}])
    h1 = db.hash
    assert h0 != h1
    assert db.history[0] == h1 and h0 in db.history


def test_hash_deterministic_content_addressed(spark, store):
    """Same content -> same hash regardless of insertion order
    (merkle: root-hash determinism)."""
    a = Database(spark, "d1", store=store)
    a.create_relation("items", [("v", "integer")])
    a.insert_tuples("items", [{"v": 1}, {"v": 2}])
    b = Database(spark, "d1", store=store)
    b.create_relation("items", [("v", "integer")])
    b.insert_tuples("items", [{"v": 2}])
    b.insert_tuples("items", [{"v": 1}])
    assert a.state.relations["items"].hash == b.state.relations["items"].hash


def test_time_travel_load(db, spark, store):
    db.insert_tuples("items", [{"v": 10}])
    h1 = db.hash
    db.insert_tuples("items", [{"v": 20}])
    old = Database.load(spark, h1, store)
    assert [r.v for r in old.relation("items").collect()] == [10]
    assert old.hash == h1
    # loaded snapshot is fully functional: can diverge from history
    old.insert_tuples("items", [{"v": 99}])
    assert old.hash != h1


def test_diff_tuple_level(db, spark, store):
    db.insert_tuples("items", [{"v": 1}, {"v": 2}])
    h1 = db.hash
    db.insert_tuples("items", [{"v": 3}])
    db.delete_tuples("items", [{"v": 1}])
    h2 = db.hash
    d = diff_databases(spark, store, h1, h2)
    delta = d.deltas["items"]
    assert delta.kind == "modified"
    assert [r.v for r in delta.added.collect()] == [3]
    assert [r.v for r in delta.removed.collect()] == [1]


def test_diff_relation_level(db, spark, store):
    h1 = db.hash
    db.create_relation("extra", [("x", "string")])
    h2 = db.hash
    d = diff_databases(spark, store, h1, h2)
    assert d.deltas["extra"].kind == "added"
    assert diff_databases(spark, store, h1, h1).is_empty


def test_branches_and_checkout(db, spark, store):
    db.insert_tuples("items", [{"v": 1}])
    bm = BranchManager(store)
    bm.create_branch("main", db.hash)
    bm.create_branch("feature", db.hash)
    assert bm.get_head() == "main"
    feat = bm.checkout(spark, "feature")
    assert bm.get_head() == "feature"
    feat.insert_tuples("items", [{"v": 42}])
    bm.update_branch_tip("feature", feat.hash)
    assert bm.get_branch_tip("feature") == feat.hash
    assert bm.get_branch_tip("main") == db.hash
    # virtual relations
    vb = bm.virtual_frames(spark)["sakura:branch"]
    assert {r.name for r in vb.collect()} == {"main", "feature"}
    with pytest.raises(errors.UnknownBranch):
        bm.get_branch_tip("nope")


def test_three_way_merge_clean(db, spark, store):
    db.insert_tuples("items", [{"v": 1}])
    base_hash = db.hash
    left = Database.load(spark, base_hash, store)
    left.insert_tuples("items", [{"v": 2}])
    right = Database.load(spark, base_hash, store)
    right.insert_tuples("items", [{"v": 3}])
    right.delete_tuples("items", [{"v": 1}])
    res = merge_databases(spark, store, left.hash, right.hash)
    assert res.ancestor == base_hash
    assert res.conflicts == []
    merged = res.merged_relations["items"]
    assert sorted(r.v for r in merged.collect()) == [2, 3]


def test_merge_delete_propagates(db, spark, store):
    """Deletes propagate through merge when no intermediate state aliases a
    historical one (content-addressed LCA — see the fast-forward test)."""
    db.insert_tuples("items", [{"v": 1}, {"v": 2}])
    base_hash = db.hash
    right2 = Database.load(spark, base_hash, store)
    right2.insert_tuples("items", [{"v": 7}])
    left2 = Database.load(spark, base_hash, store)
    left2.delete_tuples("items", [{"v": 1}])  # {2} is a novel state
    res = merge_databases(spark, store, left2.hash, right2.hash)
    assert res.conflicts == []
    assert sorted(r.v for r in res.merged_relations["items"].collect()) == [2, 7]


def test_merge_fast_forward_by_content_addressing(db, spark, store):
    """If one tip's state hash appears in the other side's history, that tip
    IS the ancestor (content addressing collapses recurring states) and the
    merge fast-forwards — the git semantics, inherent to the reference's
    hash-chain LCA (lib/management/merge.ml:31-36)."""
    db.insert_tuples("items", [{"v": 1}])
    base_hash = db.hash
    right2 = Database.load(spark, base_hash, store)
    right2.insert_tuples("items", [{"v": 7}])
    left2 = Database.load(spark, base_hash, store)
    left2.delete_tuples("items", [{"v": 1}])  # state now == pre-insert state
    res = merge_databases(spark, store, left2.hash, right2.hash)
    assert res.ancestor == left2.hash  # left tip is itself the LCA
    assert sorted(r.v for r in res.merged_relations["items"].collect()) == [1, 7]


def test_merge_via_branch_manager(db, spark, store):
    db.insert_tuples("items", [{"v": 1}])
    bm = BranchManager(store)
    bm.create_branch("main", db.hash)
    feat = Database.load(spark, db.hash, store)
    feat.insert_tuples("items", [{"v": 5}])
    bm.create_branch("feature", feat.hash)
    merged, conflicts = bm.merge(spark, "main", "feature")
    assert conflicts == []
    assert sorted(r.v for r in merged.relation("items").collect()) == [1, 5]
    assert bm.get_branch_tip("main") == merged.hash


def test_schema_conflict_detected(db, spark, store):
    base_hash = db.hash
    left = Database.load(spark, base_hash, store)
    left.create_relation("t", [("a", "integer")])
    right = Database.load(spark, base_hash, store)
    right.create_relation("t", [("a", "string")])
    res = merge_databases(spark, store, left.hash, right.hash, PREFER_LEFT)
    assert any("schema_conflict" in c for c in res.conflicts)
    assert res.schemas["t"] == [["a", "integer"]] or res.schemas["t"] == [("a", "integer")]
