"""Reference conformance, core engine: one test per reference case name
from test/test_relational_engine.ml sections merkle/storage/database/
manipulation/schema/catalog/integration/branching.

Each test cites the reference case it mirrors. The mapping is semantic,
not structural: the reference's Merkle tree + content-addressed storage
become this engine's relation/database hashes (sakura_spark/hashing.py)
over a parquet SnapshotStore (management/store.py); `Manipulation.Make`
becomes the Database facade (database.py). Where the engines deliberately
diverge (e.g. the prelude registers 10 Spark-typed domains where the
reference seeds 4), the test asserts the reference's invariant on the
repo's documented surface and notes the divergence inline.
"""

import pytest

from sakura_spark import errors
from sakura_spark.database import Database
from sakura_spark.hashing import (
    database_hash,
    relation_hash,
    schema_signature,
    tuple_hash_expr,
    with_tuple_hash,
)
from sakura_spark.management.store import SnapshotStore


@pytest.fixture()
def db(spark, store):
    return Database(spark, "test_db", store=store, snapshot_on_mutation=False)


@pytest.fixture()
def vdb(spark, store):
    """Versioned database (per-mutation snapshots) for history/hash cases."""
    return Database(spark, "test_db", store=store, snapshot_on_mutation=True)


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


# --------------------------------------------------------------------------
# merkle: the reference's Merkle tree holds the set of tuple hashes and
# derives an order-independent root (test ml:7-65). The repo's analogue is
# database_hash over the relation-hash set (hashing.py:100): same identity
# laws, computed with a commutative reduction instead of a tree walk.
# --------------------------------------------------------------------------


def test_merkle_empty_tree():
    """merkle: empty tree (ml:7). Empty set has a stable, distinguished
    root."""
    assert database_hash({}) == database_hash({})
    assert database_hash({}) != database_hash({"r": "h1"})


def test_merkle_insert_single_element():
    """merkle: insert single element (ml:13). Root exists and membership
    is observable (the hash changes iff the set changes)."""
    root = database_hash({"users": "abc123"})
    assert root and root != database_hash({})
    assert database_hash({"users": "abc123"}) == root


def test_merkle_insert_multiple_elements():
    """merkle: insert multiple elements (ml:22). Each element contributes:
    dropping any one changes the root."""
    full = {"a": "hash1", "b": "hash2", "c": "hash3"}
    root = database_hash(full)
    for k in full:
        sub = {x: h for x, h in full.items() if x != k}
        assert database_hash(sub) != root


def test_merkle_delete_element():
    """merkle: delete element (ml:33). Removing an element restores the
    root of the set without it (pure function of the set)."""
    one = database_hash({"k2": "hash2"})
    two = database_hash({"k1": "hash1", "k2": "hash2"})
    assert two != one
    assert database_hash({"k2": "hash2"}) == one


def test_merkle_keys_returns_all_elements(vdb):
    """merkle: keys returns all elements (ml:43). The snapshot manifest
    enumerates every relation's content hash."""
    vdb.create_relation("c", [("x", "integer")])
    vdb.create_relation("a", [("x", "integer")])
    vdb.create_relation("b", [("x", "integer")])
    manifest = vdb.store.get_manifest(vdb.hash)
    assert set(manifest["relations"]) == {"a", "b", "c"}


def test_merkle_root_hash_changes_on_insert():
    """merkle: root hash changes on insert (ml:54)."""
    r1 = database_hash({"t": "hash1"})
    r2 = database_hash({"t": "hash1", "u": "hash2"})
    assert r1 != r2


def test_merkle_same_elements_same_root_hash():
    """merkle: same elements produce same root hash (ml:62). Insertion
    order cannot matter — dict identity and the commutative reduction in
    relation_hash both guarantee it."""
    assert database_hash({"a": "x", "b": "y"}) == database_hash({"b": "y", "a": "x"})


def test_merkle_relation_hash_order_independent(spark):
    """merkle root-law applied one level down: a relation's content hash
    ignores row order (hashing.py:57 reduces tuple hashes commutatively,
    mirroring ml:62 at tuple granularity)."""
    sig = schema_signature([("n", "integer")])
    d1 = _df(spark, [(1,), (2,), (3,)], "n int")
    d2 = _df(spark, [(3,), (1,), (2,)], "n int")
    assert relation_hash(d1, "t", sig) == relation_hash(d2, "t", sig)


# --------------------------------------------------------------------------
# storage: Management.Physical.Memory (ml:67-134) -> SnapshotStore, the
# content-addressed parquet + manifest store.
# --------------------------------------------------------------------------


def test_storage_create_and_close(tmp_path):
    """storage: create and close (ml:67)."""
    SnapshotStore(str(tmp_path / "s"))  # construction must not raise


def test_storage_store_and_load_attribute(spark, store):
    """storage: store and load attribute (ml:72). A stored value loads
    back equal (attribute-level in the reference; relation-level here —
    the store's smallest addressable content unit)."""
    df = _df(spark, [(42,)], "v int")
    h = relation_hash(df, "t", schema_signature([("v", "integer")]))
    store.put_relation(h, df)
    assert [r.v for r in store.get_relation(spark, h).collect()] == [42]


def test_storage_store_and_load_raw_bytes(store):
    """storage: store and load raw bytes (ml:86). The manifest store is
    the raw keyed-blob surface: arbitrary JSON-shaped payload by hash."""
    payload = {"name": "x", "relations": {}, "history": [], "hash": "test_hash"}
    store.put_manifest("test_hash", payload)
    assert store.get_manifest("test_hash") == payload


def test_storage_exists_check(spark, store):
    """storage: exists check (ml:101)."""
    df = _df(spark, [(1,)], "v int")
    assert not store.has_relation("exists_test")
    store.put_relation("exists_test", df)
    assert store.has_relation("exists_test")
    assert not store.has_manifest("no_such_manifest")


def test_storage_transaction_commit(spark, store):
    """storage: transaction commit (ml:118). Database.commit() is the
    transaction boundary: after it returns, the snapshot is durable and
    loadable from a fresh store handle on the same root."""
    db = Database(spark, "tx", store=store, snapshot_on_mutation=False)
    db.create_relation("t", [("v", "integer")])
    db.insert_tuples("t", [{"v": 1}])
    h = db.commit()
    reopened = SnapshotStore(store.root)
    assert reopened.has_manifest(h)


# --------------------------------------------------------------------------
# database: Management.Database (ml:136-223) -> the Database facade state.
# --------------------------------------------------------------------------


def test_database_create_empty(spark, store):
    """database: create empty (ml:136). Note: the reference's bare
    Database.empty has history=[]; this engine snapshots the initial empty
    state on construction, so history holds exactly that genesis hash."""
    d = Database(spark, "test_db", store=store, snapshot_on_mutation=True)
    assert d.name == "test_db"
    assert d.state.relations == {}
    assert d.history == [d.hash]


def test_database_add_relation(db):
    """database: add relation (ml:143)."""
    db.create_relation("users", [("name", "string")])
    assert "users" in db.state.relations
    assert "orders" not in db.state.relations


def test_database_remove_relation(db):
    """database: remove relation (ml:159)."""
    db.create_relation("users", [("name", "string")])
    db.retract_relation("users")
    assert "users" not in db.state.relations


def test_database_update_relation(vdb):
    """database: update relation (ml:174). A content change gives the
    relation a new hash, gives the database a new hash, and archives the
    old database hash in history."""
    vdb.create_relation("users", [("name", "string")])
    old_db_hash = vdb.hash
    old_manifest = vdb.store.get_manifest(old_db_hash)
    vdb.insert_tuples("users", [{"name": "Alice"}])
    new_manifest = vdb.store.get_manifest(vdb.hash)
    assert (
        new_manifest["relations"]["users"]["hash"]
        != old_manifest["relations"]["users"]["hash"]
    )
    assert vdb.hash != old_db_hash
    assert old_db_hash in vdb.history


def test_database_get_relation_names(db):
    """database: get relation names (ml:192)."""
    db.create_relation("users", [("name", "string")])
    db.create_relation("orders", [("id", "integer")])
    assert set(db.state.relations) == {"users", "orders"}


# --------------------------------------------------------------------------
# manipulation: Manipulation.Make(Memory) (ml:226-630) -> Database DML.
# --------------------------------------------------------------------------


def test_manipulation_create_database(spark, store):
    """manipulation: create database (ml:226)."""
    d = Database(spark, "my_db", store=store, snapshot_on_mutation=False)
    assert d.name == "my_db"


def test_manipulation_create_relation(db):
    """manipulation: create relation (ml:232): name + schema recorded."""
    db.create_relation("users", [("name", "string"), ("age", "integer")])
    rel = db.state.relations["users"]
    assert rel.name == "users"
    assert rel.schema_pairs == [("name", "string"), ("age", "integer")]


def test_manipulation_create_relation_already_exists(db):
    """manipulation: create relation already exists (ml:251) ->
    RelationAlreadyExists, spelled errors.RelationExists here."""
    db.create_relation("users", [])
    with pytest.raises(errors.RelationExists):
        db.create_relation("users", [])


def test_manipulation_retract_relation(db):
    """manipulation: retract relation (ml:270)."""
    db.create_relation("users", [])
    db.retract_relation("users")
    with pytest.raises(errors.UnknownRelation):
        db.relation("users")


def test_manipulation_create_tuple_with_storage(db):
    """manipulation: create tuple with storage (ml:290)."""
    db.create_relation("users", [("name", "string")])
    db.insert_tuples("users", [{"name": "Alice"}])
    assert db.relation("users").count() == 1


def test_manipulation_create_and_load_tuple(db):
    """manipulation: create and load tuple (ml:316): the stored value
    reads back exactly."""
    db.create_relation("numbers", [("value", "integer")])
    db.insert_tuples("numbers", [{"value": 42}])
    assert [r.value for r in db.relation("numbers").collect()] == [42]


def test_manipulation_create_multiple_tuples(db):
    """manipulation: create multiple tuples with storage (ml:350)."""
    db.create_relation("items", [("id", "integer")])
    n = db.insert_tuples("items", [{"id": 1}, {"id": 2}, {"id": 3}])
    assert n == 3
    assert db.relation("items").count() == 3


def test_manipulation_load_multiple_tuples(db):
    """manipulation: load multiple tuples (ml:380)."""
    db.create_relation("test", [("n", "integer")])
    db.insert_tuples("test", [{"n": 10}, {"n": 20}])
    values = {r.n for r in db.relation("test").collect()}
    assert values == {10, 20}


def test_manipulation_retract_tuple_append_only(vdb):
    """manipulation: retract tuple (ml:423): the live extension shrinks,
    but the store is append-only — loading the pre-delete snapshot still
    shows the tuple."""
    vdb.create_relation("numbers", [("value", "integer")])
    vdb.insert_tuples("numbers", [{"value": 42}])
    before = vdb.hash
    vdb.delete_tuples("numbers", [{"value": 42}])
    assert vdb.relation("numbers").count() == 0
    old = Database.load(vdb.spark, before, vdb.store)
    assert [r.value for r in old.relation("numbers").collect()] == [42]


def test_manipulation_tuple_hashes(spark):
    """manipulation: tuple hashes (ml:460): every tuple carries a content
    hash; two tuples -> two distinct hashes."""
    df = with_tuple_hash(_df(spark, [(1,), (2,)], "n int"), "test")
    hashes = [r["__tuple_hash"] for r in df.collect()]
    assert len(hashes) == 2 and len(set(hashes)) == 2


def test_manipulation_clear_relation(db):
    """manipulation: clear relation (ml:490)."""
    db.create_relation("test", [("n", "integer")])
    db.insert_tuples("test", [{"n": 1}, {"n": 2}, {"n": 3}])
    db.clear_relation("test")
    assert db.relation("test").count() == 0


def test_manipulation_duplicate_tuple_rejected(db):
    """manipulation: duplicate tuple rejected (ml:523) -> DuplicateTuple."""
    db.create_relation("test", [("x", "integer")])
    db.insert_tuples("test", [{"x": 1}])
    with pytest.raises(errors.DuplicateTuple):
        db.insert_tuples("test", [{"x": 1}])


def test_manipulation_tuple_exists_check(spark, db):
    """manipulation: tuple_exists check (ml:553): membership by content
    hash flips false -> true across the insert, and the stored hash equals
    the hash computed from the candidate tuple alone."""
    db.create_relation("test", [("v", "integer")])
    candidate = with_tuple_hash(_df(spark, [(99,)], "v int"), "test")
    [expected] = [r["__tuple_hash"] for r in candidate.collect()]

    def live_hashes():
        return {
            r["__tuple_hash"]
            for r in with_tuple_hash(db.relation("test"), "test").collect()
        }

    assert expected not in live_hashes()
    db.insert_tuples("test", [{"v": 99}])
    assert expected in live_hashes()


def test_manipulation_hash_tuple_deterministic(spark):
    """manipulation: hash_tuple deterministic (ml:581)."""
    df = _df(spark, [(1, 2)], "a int, b int")
    h1 = [r[0] for r in df.select(tuple_hash_expr(["a", "b"], "test")).collect()]
    h2 = [r[0] for r in df.select(tuple_hash_expr(["a", "b"], "test")).collect()]
    assert h1 == h2


def test_manipulation_different_tuples_different_hashes(spark):
    """manipulation: different tuples different hashes (ml:592)."""
    df = with_tuple_hash(_df(spark, [(1,), (2,)], "x int"), "test")
    a, b = [r["__tuple_hash"] for r in df.collect()]
    assert a != b


def test_manipulation_get_relation_from_database(db):
    """manipulation: get_relation from database (ml:611)."""
    db.create_relation("items", [("id", "integer")])
    rel = db.state.relations["items"]
    assert rel.name == "items"
    assert rel.schema_pairs == [("id", "integer")]


def test_schema_persisted_and_loaded(vdb):
    """schema: persisted and loaded correctly (ml:631): reloading the
    snapshot restores the full attribute->domain schema."""
    pairs = [("id", "integer"), ("name", "string"), ("email", "string")]
    vdb.create_relation("users", pairs)
    loaded = Database.load(vdb.spark, vdb.hash, vdb.store)
    assert loaded.state.relations["users"].schema_pairs == pairs


# --------------------------------------------------------------------------
# catalog (ml:662-835): the six self-describing sakura:* relations.
# --------------------------------------------------------------------------

CATALOG_NAMES = [
    "sakura:relation",
    "sakura:domain",
    "sakura:attribute",
    "sakura:constraint",
    "sakura:on",
    "sakura:timing",
]


def test_catalog_create_database_seeds_six(db):
    """catalog: create_database seeds 6 catalog relations (ml:662,
    lib/prelude/catalog.ml:21-29): all six resolve by name on a fresh
    database."""
    for name in CATALOG_NAMES:
        assert db.relation(name) is not None


def test_catalog_relation_lists_relations(db):
    """catalog: sakura:relation contains all 6 catalog names (ml:672).
    Divergence, documented: this engine's sakura:relation lists USER
    relations (catalog frames are virtual, database.py:336); the six
    catalog relations are all queryable but not self-listed. A fresh
    database therefore lists zero rows, and each created relation adds
    one."""
    assert db.relation("sakura:relation").count() == 0


def test_catalog_on_contains_three_events(db):
    """catalog: sakura:on contains insert, update, delete (ml:686)."""
    rows = {r.event for r in db.relation("sakura:on").collect()}
    assert rows == {"insert", "update", "delete"}


def test_catalog_timing_contains_two(db):
    """catalog: sakura:timing contains immediate, deferred (ml:698)."""
    rows = {r.timing for r in db.relation("sakura:timing").collect()}
    assert rows == {"immediate", "deferred"}


def test_catalog_domain_seeded_with_prelude_domains(db):
    """catalog: sakura:domain seeded with 4 prelude domains (ml:710).
    This engine's prelude registers 10 Spark-typed domains (domains.py) —
    a documented superset; the reference's core four are all present."""
    names = {r.name for r in db.relation("sakura:domain").collect()}
    assert {"natural", "integer", "rational", "string"} <= names
    assert len(names) == len(db.registry.names())


def test_catalog_create_relation_updates_relation(db):
    """catalog: create_relation updates sakura:relation (ml:722)."""
    before = db.relation("sakura:relation").count()
    db.create_relation("employees", [("id", "natural")])
    after = [r.name for r in db.relation("sakura:relation").collect()]
    assert len(after) == before + 1 and "employees" in after


def test_catalog_create_relation_updates_attribute(db):
    """catalog: create_relation updates sakura:attribute (ml:746): one
    row per attribute with its domain."""
    db.create_relation("employees", [("id", "natural"), ("dept", "string")])
    rows = [
        (r.attr_name, r.domain_name)
        for r in db.relation("sakura:attribute")
        .filter("relation_name = 'employees'")
        .collect()
    ]
    assert sorted(rows) == [("dept", "string"), ("id", "natural")]


def test_catalog_retract_relation_removes_from_relation(db):
    """catalog: retract_relation removes from sakura:relation (ml:773)."""
    db.create_relation("employees", [("id", "natural")])
    db.retract_relation("employees")
    names = [r.name for r in db.relation("sakura:relation").collect()]
    assert "employees" not in names


def test_catalog_register_constraint_inserts(db):
    """catalog: register_constraint inserts into sakura:constraint
    (ml:804)."""
    from sakura_spark.icl import ast as icl

    db.create_relation("orders", [("id", "natural")])
    db.register_constraint(
        "orders_id_positive",
        "orders",
        icl.Cmp("gte", icl.Var("id"), icl.ConstVal(0)),
    )
    rows = [(r.name, r.relation_name) for r in db.relation("sakura:constraint").collect()]
    assert rows == [("orders_id_positive", "orders")]


# --------------------------------------------------------------------------
# integration + branching (ml:836-1283).
# --------------------------------------------------------------------------


def test_integration_full_workflow_with_storage(vdb):
    """integration: full workflow with storage (ml:836): create, insert,
    query, delete, snapshot — every state loadable from its hash."""
    vdb.create_relation("users", [("name", "string"), ("age", "natural")])
    vdb.insert_tuples("users", [{"name": "Alice", "age": 30}, {"name": "Bob", "age": 25}])
    assert vdb.relation("users").filter("age > 26").count() == 1
    vdb.delete_tuples("users", [{"name": "Bob", "age": 25}])
    final = Database.load(vdb.spark, vdb.hash, vdb.store)
    assert [r.name for r in final.relation("users").collect()] == ["Alice"]


def test_integration_database_history_tracking(vdb):
    """integration: database history tracking (ml:921): each mutation
    prepends the prior hash; history is most-recent-first and acyclic."""
    vdb.create_relation("t", [("v", "integer")])
    h1 = vdb.hash
    vdb.insert_tuples("t", [{"v": 1}])
    h2 = vdb.hash
    vdb.insert_tuples("t", [{"v": 2}])
    assert vdb.history[0] == vdb.hash
    assert vdb.history.index(h2) < vdb.history.index(h1)
    assert len(set(vdb.history)) == len(vdb.history)


def test_integration_hash_bubbles_up(vdb):
    """integration: hash bubbles up correctly (ml:956): a tuple change
    alters the relation hash, which alters the database hash."""
    vdb.create_relation("t", [("v", "integer")])
    m0 = vdb.store.get_manifest(vdb.hash)
    vdb.insert_tuples("t", [{"v": 7}])
    m1 = vdb.store.get_manifest(vdb.hash)
    assert m0["relations"]["t"]["hash"] != m1["relations"]["t"]["hash"]
    assert m0["hash"] != m1["hash"]


def test_branching_load_from_historical_hash(vdb):
    """branching: load database from historical hash (ml:1005)."""
    vdb.create_relation("t", [("v", "integer")])
    vdb.insert_tuples("t", [{"v": 1}])
    old = vdb.hash
    vdb.insert_tuples("t", [{"v": 2}])
    historical = Database.load(vdb.spark, old, vdb.store)
    assert historical.relation("t").count() == 1
    assert vdb.relation("t").count() == 2


def test_branching_branch_from_historical_state(vdb):
    """branching: branch from historical state (ml:1079): a branch pinned
    at an old hash evolves independently of the original line."""
    from sakura_spark.management.branches import BranchManager

    vdb.create_relation("t", [("v", "integer")])
    vdb.insert_tuples("t", [{"v": 1}])
    fork_point = vdb.hash
    vdb.insert_tuples("t", [{"v": 2}])  # main line moves on

    mgr = BranchManager(vdb.store)
    mgr.create_branch("alt", fork_point)
    alt = mgr.checkout(vdb.spark, "alt")
    alt.insert_tuples("t", [{"v": 99}])
    assert {r.v for r in alt.relation("t").collect()} == {1, 99}
    assert {r.v for r in vdb.relation("t").collect()} == {1, 2}


def test_branching_full_reconstruction_from_hash(vdb):
    """branching: full reconstruction from hash (ml:1177): relations,
    schemas and registered constraints all come back from the manifest."""
    from sakura_spark.icl import ast as icl

    vdb.create_relation("users", [("id", "natural")])
    vdb.create_relation("posts", [("user_id", "natural")])
    vdb.register_constraint(
        "fk_user",
        "posts",
        icl.MemberOf("users", (("id", icl.Var("user_id")),)),
    )
    vdb.insert_tuples("users", [{"id": 1}])
    vdb.insert_tuples("posts", [{"user_id": 1}])
    loaded = Database.load(vdb.spark, vdb.hash, vdb.store)
    assert set(loaded.state.relations) == {"users", "posts"}
    assert "fk_user" in loaded.state.constraints
    # The reconstructed constraint still enforces.
    with pytest.raises(errors.ConstraintViolation):
        loaded.insert_tuples("posts", [{"user_id": 999}])
