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
