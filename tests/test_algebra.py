"""Operator-level expectation tests mirroring the reference's algebra suite
(test/test_relational_engine.ml:1284-1583) plus algebra-law properties."""

import pytest
from pyspark.sql import functions as F

from sakura_spark import algebra


@pytest.fixture(scope="module")
def emp_dept(spark):
    emp = spark.createDataFrame(
        [(10, 1, "alice"), (11, 1, "bob"), (12, 2, "carol")],
        "emp_id long, dept_id long, name string",
    )
    dept = spark.createDataFrame([(1, "eng"), (2, "ops"), (3, "empty")], "dept_id long, dname string")
    return emp, dept


def test_select(emp_dept, spark):
    emp, _ = emp_dept
    out = algebra.select(emp, F.col("dept_id") == 1)
    assert sorted(r.emp_id for r in out.collect()) == [10, 11]


def test_project(emp_dept):
    emp, _ = emp_dept
    out = algebra.project(emp, ["name"])
    assert out.columns == ["name"]
    assert sorted(r.name for r in out.collect()) == ["alice", "bob", "carol"]


def test_rename(emp_dept):
    emp, _ = emp_dept
    out = algebra.rename(emp, {"name": "emp_name"})
    assert "emp_name" in out.columns and "name" not in out.columns
    with pytest.raises(KeyError):
        algebra.rename(emp, {"nope": "x"})


def test_equijoin_match(emp_dept):
    emp, dept = emp_dept
    out = algebra.equijoin(emp, dept, ["dept_id"])
    rows = out.collect()
    assert len(rows) == 3
    # merged schema: left + right-minus-join-attrs
    assert set(out.columns) == {"emp_id", "dept_id", "name", "dname"}


def test_equijoin_empty(emp_dept, spark):
    emp, dept = emp_dept
    nobody = spark.createDataFrame([], "dept_id long, dname string")
    assert algebra.equijoin(emp, nobody, ["dept_id"]).count() == 0


def test_equijoin_left_wins_on_collision(spark):
    l = spark.createDataFrame([(1, "L")], "k long, v string")
    r = spark.createDataFrame([(1, "R")], "k long, v string")
    out = algebra.equijoin(l, r, ["k"])
    assert out.collect()[0].v == "L"  # lib/algebra.ml:185-196


def test_cartesian(emp_dept):
    emp, dept = emp_dept
    out = algebra.cartesian(algebra.project(emp, ["name"]), dept)
    assert out.count() == 9


def test_semijoin(emp_dept):
    emp, dept = emp_dept
    f = dept.filter(F.col("dname") == "eng")
    out = algebra.semijoin(f, emp)
    assert set(out.columns) == set(emp.columns)  # schema unchanged
    assert sorted(r.emp_id for r in out.collect()) == [10, 11]


def test_union_bag_no_dedup(emp_dept):
    emp, _ = emp_dept
    out = algebra.union(emp, emp)
    assert out.count() == 6  # reference union does NOT dedup (lib/algebra.ml:248-262)
    assert algebra.union_set(emp, emp).count() == 3


def test_diff(emp_dept, spark):
    emp, _ = emp_dept
    sub = emp.filter(F.col("emp_id") == 10)
    out = algebra.diff(emp, sub)
    assert sorted(r.emp_id for r in out.collect()) == [11, 12]
    assert algebra.diff(emp, emp).count() == 0


def test_intersect(emp_dept):
    emp, _ = emp_dept
    sub = emp.filter(F.col("emp_id") >= 11)
    assert algebra.intersect(emp, sub).count() == 2


def test_take(emp_dept):
    emp, _ = emp_dept
    assert algebra.take(emp, 2).count() == 2
    top = algebra.take(emp, 1, order_by=[F.desc("emp_id")]).collect()
    assert top[0].emp_id == 12


def test_const_relation(spark):
    out = algebra.const_relation(spark, {"age": 18}, schema="age long")
    assert out.collect() == [out.collect()[0]]
    assert out.collect()[0].age == 18


def test_algebra_laws_select_project_commute(emp_dept):
    """σ/π commute when the predicate only uses surviving columns."""
    emp, _ = emp_dept
    a = algebra.project(algebra.select(emp, F.col("emp_id") > 10), ["emp_id"])
    b = algebra.select(algebra.project(emp, ["emp_id"]), F.col("emp_id") > 10)
    assert sorted(r.emp_id for r in a.collect()) == sorted(r.emp_id for r in b.collect())


def test_join_symmetric_on_keys(emp_dept):
    emp, dept = emp_dept
    a = algebra.equijoin(emp, dept, ["dept_id"]).select("emp_id", "dname")
    b = algebra.equijoin(dept, emp, ["dept_id"]).select("emp_id", "dname")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
