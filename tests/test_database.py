"""Database DDL/DML/catalog behaviour (reference manipulation:/catalog:/
ddl:/dml: test groups, FIXTURES.md §1)."""

import pytest

from sakura_spark import errors
from sakura_spark.database import Database


@pytest.fixture()
def db(spark, store):
    d = Database(spark, "test_db", store=store, snapshot_on_mutation=False)
    d.create_relation("users", [("name", "string"), ("age", "natural")])
    return d


def test_create_and_insert(db):
    assert db.insert_tuples("users", [{"name": "Alice", "age": 30}, {"name": "Bob", "age": 25}]) == 2
    assert db.relation("users").count() == 2


def test_duplicate_tuple_rejected(db):
    db.insert_tuples("users", [{"name": "Alice", "age": 30}])
    with pytest.raises(errors.DuplicateTuple):
        db.insert_tuples("users", [{"name": "Alice", "age": 30}])
    with pytest.raises(errors.DuplicateTuple):
        db.insert_tuples("users", [{"name": "X", "age": 1}, {"name": "X", "age": 1}])


def test_natural_domain_check(db):
    with pytest.raises(errors.DomainViolation):
        db.insert_tuples("users", [{"name": "Neg", "age": -5}])


def test_unknown_relation(db):
    with pytest.raises(errors.UnknownRelation):
        db.insert_tuples("ghost", [{"x": 1}])
    with pytest.raises(errors.UnknownDomain):
        db.create_relation("bad", [("x", "no_such_domain")])


def test_delete_tuples(db):
    db.insert_tuples("users", [{"name": "Alice", "age": 30}, {"name": "Bob", "age": 25}])
    assert db.delete_tuples("users", [{"name": "Alice", "age": 30}]) == 1
    assert [r.name for r in db.relation("users").collect()] == ["Bob"]
    with pytest.raises(errors.SakuraError):
        db.delete_tuples("users", [{"name": "Ghost", "age": 1}])


def test_clear_and_retract(db):
    db.insert_tuples("users", [{"name": "Alice", "age": 30}])
    db.clear_relation("users")
    assert db.relation("users").count() == 0
    db.retract_relation("users")
    with pytest.raises(errors.UnknownRelation):
        db.relation("users")


def test_assign_overwrites(db, spark):
    db.insert_tuples("users", [{"name": "Alice", "age": 30}])
    new = spark.createDataFrame([("Zed", 1)], "name string, age long")
    db.assign("users", new)
    assert [r.name for r in db.relation("users").collect()] == ["Zed"]


def test_insert_from_and_delete_where(db, spark):
    db.insert_tuples("users", [{"name": "Alice", "age": 30}, {"name": "Bob", "age": 25}])
    db.create_relation("adults", [("name", "string"), ("age", "natural")])
    db.insert_from("adults", db.relation("users").filter("age >= 30"))
    assert db.relation("adults").count() == 1
    pred = spark.createDataFrame([(30,)], "age long")
    assert db.delete_where("users", pred) == 1
    assert [r.name for r in db.relation("users").collect()] == ["Bob"]


def test_delete_where_multi_row_and_noop(db, spark):
    """Round-13 fold: delete_where runs ONE validation job (the semijoin
    count) instead of take(1) + delete_tuples' presence job — the doomed
    rows are present and duplicate-free by construction. Pins the
    observable contract around the fold: exact multi-row count, exact
    complement, zero on no match, and duplicate predicate rows counted
    once."""
    db.insert_tuples(
        "users",
        [{"name": "A", "age": 30}, {"name": "B", "age": 30}, {"name": "C", "age": 25}],
    )
    # Duplicate predicate rows must not double-count the deletions.
    pred = spark.createDataFrame([(30,), (30,)], "age long")
    assert db.delete_where("users", pred) == 2
    assert [r.name for r in db.relation("users").collect()] == ["C"]
    assert db.delete_where("users", spark.createDataFrame([(99,)], "age long")) == 0
    assert db.relation("users").count() == 1


def test_delete_where_cascade_rejection_is_atomic(spark, store):
    """The folded delete_where tail still cascades: removing the last
    Exists witness through a PREDICATE delete must raise and leave both
    relations untouched (same contract test_delete_last_witness_rejected
    pins for delete_tuples)."""
    from sakura_spark.icl import Cmp, Exists, Var

    db = Database(spark, "dw_cascade", store=store, snapshot_on_mutation=False)
    db.create_relation("Parent", [("pid", "integer"), ("grp", "integer")])
    db.create_relation("Child", [("cid", "integer"), ("grp", "integer")])
    db.insert_tuples("Parent", [{"pid": 1, "grp": 100}, {"pid": 2, "grp": 200}])
    db.register_constraint(
        "child_has_parent",
        "Child",
        Exists("p", "Parent", Cmp("eq", Var("p.grp"), Var("grp"))),
    )
    db.insert_tuples("Child", [{"cid": 10, "grp": 100}])
    with pytest.raises(errors.ConstraintViolation):
        db.delete_where("Parent", spark.createDataFrame([(100,)], "grp long"))
    assert db.relation("Parent").count() == 2
    assert db.relation("Child").count() == 1


def test_assign_returns_count_and_checks_domains(db, spark):
    """Round-13 fold: assign's domain check and returned count share one
    aggregation job. Pins the count (post-dropDuplicates) and the domain
    rejection with the relation left untouched."""
    db.insert_tuples("users", [{"name": "Alice", "age": 30}])
    new = spark.createDataFrame(
        [("X", 1), ("X", 1), ("Y", 2)], "name string, age long"
    )
    assert db.assign("users", new) == 2
    assert {r.name for r in db.relation("users").collect()} == {"X", "Y"}
    bad = spark.createDataFrame([("Neg", -5)], "name string, age long")
    with pytest.raises(errors.DomainViolation):
        db.assign("users", bad)
    assert {r.name for r in db.relation("users").collect()} == {"X", "Y"}


def test_catalog_relations(db):
    names = {r.name for r in db.relation("sakura:relation").collect()}
    assert names == {"users"}
    attrs = {
        (r.relation_name, r.attr_name, r.domain_name)
        for r in db.relation("sakura:attribute").collect()
    }
    assert attrs == {("users", "name", "string"), ("users", "age", "natural")}
    doms = {r.name for r in db.relation("sakura:domain").collect()}
    assert {"integer", "natural", "rational", "string"} <= doms
    events = {r.event for r in db.relation("sakura:on").collect()}
    assert events == {"insert", "update", "delete"}
    timings = {r.timing for r in db.relation("sakura:timing").collect()}
    assert timings == {"immediate", "deferred"}


def test_catalog_tracks_constraint(db):
    from sakura_spark.icl import Between, Var

    db.create_relation("results", [("student_id", "integer"), ("score", "integer")])
    db.register_constraint(
        "score_range", "results", Between(Var("score"), ConstOf(0), ConstOf(100))
    )
    rows = {(r.name, r.relation_name) for r in db.relation("sakura:constraint").collect()}
    assert rows == {("score_range", "results")}


def ConstOf(v):
    from sakura_spark.icl import ConstVal

    return ConstVal(v)


def test_drl_through_database(db):
    db.insert_tuples("users", [{"name": "Alice", "age": 30}, {"name": "Bob", "age": 25}])
    out = db.drl('(Select (Const (("age" (Int 30)))) (Base "users"))')
    rows = out.collect()
    assert len(rows) == 1 and rows[0].name == "Alice"


def test_bulk_insert_launches_few_jobs(spark, store):
    """The write path folds batch count + in-batch dup + cross-extension dup
    + domain checks into one aggregation: a 10k-row insert with
    snapshot_on_mutation=False launches at most 3 Spark jobs."""
    from sakura_spark.database import Database

    db = Database(spark, "bulk", store=store, snapshot_on_mutation=False)
    db.create_relation("t", [("v", "integer")])
    rows = [{"v": i} for i in range(10_000)]
    sc = spark.sparkContext
    # AQE legitimately splits one query into a job per materialized stage;
    # disable it here so the job count equals the action count.
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    sc.setJobGroup("bulk-insert", "bulk insert job count")
    try:
        assert db.insert_tuples("t", rows) == 10_000
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)
    job_ids = sc.statusTracker().getJobIdsForGroup("bulk-insert")
    assert len(job_ids) <= 3, f"insert launched {len(job_ids)} jobs"
    assert db.relation("t").count() == 10_000
