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


# --- constraint propagation (lib/algebra.ml:82,112-129,158-170 +
# lib/constraint.ml:65-119; reference tests "constraint propagation: ...") ---


def test_constraint_propagation_select_preserves():
    """Reference 'constraint propagation: select preserves constraints':
    σ passes the constraint list through untouched."""
    from sakura_spark import algebra
    from sakura_spark.icl import ast

    cs = [("c1", ast.MemberOf("some_rel", (("left", ast.Var("x")),)))]
    assert algebra.select_constraints(cs) == cs


def test_constraint_propagation_project_filters():
    """Reference 'constraint propagation: project filters constraints':
    π keeps a constraint iff its referenced attributes survive."""
    from sakura_spark import algebra
    from sakura_spark.icl import ast

    c_on_x = ("x_only", ast.MemberOf("some_rel", (("left", ast.Var("x")),)))
    c_on_y = ("y_only", ast.MemberOf("some_rel", (("left", ast.Var("y")),)))
    cs = [c_on_x, c_on_y]
    assert algebra.project_constraints(cs, ["x"]) == [c_on_x]
    assert algebra.project_constraints(cs, ["y"]) == [c_on_y]
    assert algebra.project_constraints(cs, ["x", "y"]) == cs
    assert algebra.project_constraints(cs, ["z"]) == []


def test_constraint_propagation_project_connectives():
    """filter_by_attrs branch rules (lib/constraint.ml:105-119): And keeps
    surviving branches, Or requires ALL branches (a pruned disjunct would
    strengthen the constraint), Exists binds its variable for the body."""
    from sakura_spark import algebra
    from sakura_spark.icl import ast

    on_x = ast.Cmp("gte", ast.Var("x"), ast.ConstVal(0))
    on_y = ast.Cmp("lte", ast.Var("y"), ast.ConstVal(9))
    both_and = [("range", ast.And(on_x, on_y))]
    # And: the x-branch survives a projection to x alone.
    assert algebra.project_constraints(both_and, ["x"]) == [("range", on_x)]
    # Or: losing a branch drops the whole constraint.
    both_or = [("either", ast.Or(on_x, on_y))]
    assert algebra.project_constraints(both_or, ["x"]) == []
    assert algebra.project_constraints(both_or, ["x", "y"]) == both_or
    # Exists: the bound variable (and its namespaced fields) is allowed.
    ex = [
        (
            "linked",
            ast.Exists(
                "r",
                "Room",
                ast.Cmp("eq", ast.Var("r.room_id"), ast.Var("room_id")),
            ),
        )
    ]
    assert algebra.project_constraints(ex, ["room_id"]) == ex
    assert algebra.project_constraints(ex, ["other"]) == []


def test_constraint_propagation_rename():
    """ρ renames Var references, binding keys, and quantifier variables
    (Constraint.rename_vars, lib/constraint.ml:65-93)."""
    from sakura_spark import algebra
    from sakura_spark.icl import ast

    cs = [
        ("fk", ast.MemberOf("dept", (("dept_id", ast.Var("dept_id")),))),
        (
            "q",
            ast.Exists(
                "r", "Room", ast.Cmp("eq", ast.Var("r.x"), ast.Var("x"))
            ),
        ),
    ]
    out = dict(algebra.rename_constraints(cs, {"dept_id": "d", "x": "x2", "r": "rr"}))
    assert out["fk"] == ast.MemberOf("dept", (("d", ast.Var("d")),))
    assert out["q"] == ast.Exists(
        "rr", "Room", ast.Cmp("eq", ast.Var("rr.x"), ast.Var("x2"))
    )


def test_constraint_propagation_equijoin_merges():
    """Reference ⋈ rule (lib/algebra.ml:237-241 +
    docs/constraints.org:291-309): constraints from BOTH inputs travel
    to the join; same-named entries conjoin via Constraint.merge."""
    from sakura_spark import algebra
    from sakura_spark.icl import ast

    cl = ("left_c", ast.Cmp("gte", ast.Var("x"), ast.ConstVal(0)))
    cr = ("right_c", ast.Cmp("lte", ast.Var("y"), ast.ConstVal(9)))
    assert algebra.equijoin_constraints([cl], [cr]) == [cl, cr]
    # duplicate name: the two bodies conjoin into one And entry
    cl2 = ("shared", ast.Cmp("gte", ast.Var("x"), ast.ConstVal(0)))
    cr2 = ("shared", ast.Cmp("lte", ast.Var("x"), ast.ConstVal(9)))
    merged = algebra.equijoin_constraints([cl2], [cr2])
    assert merged == [("shared", ast.And(cl2[1], cr2[1]))]


def test_constraint_propagation_union_drops():
    """Reference ∪ rule (lib/algebra.ml:261): conservative drop — a
    union row may come from either side, so nothing survives."""
    from sakura_spark import algebra
    from sakura_spark.icl import ast

    cs = [("c", ast.Cmp("gte", ast.Var("x"), ast.ConstVal(0)))]
    assert algebra.union_constraints(cs, cs) == []
    assert algebra.union_constraints(cs, []) == []


def test_constraint_propagation_diff_preserves_left():
    """Reference − rule (lib/algebra.ml:300-303): output rows all come
    from the left input, so the left's constraints survive and the
    right's never apply."""
    from sakura_spark import algebra
    from sakura_spark.icl import ast

    cl = [("lc", ast.Cmp("gte", ast.Var("x"), ast.ConstVal(0)))]
    cr = [("rc", ast.Cmp("lte", ast.Var("x"), ast.ConstVal(9)))]
    assert algebra.diff_constraints(cl, cr) == cl
    assert algebra.diff_constraints([], cr) == []


def test_constraint_propagation_take_preserves():
    """Reference τ rule (lib/algebra.ml:305-322): a row subset satisfies
    every row-level source constraint."""
    from sakura_spark import algebra
    from sakura_spark.icl import ast

    cs = [("c", ast.Cmp("gte", ast.Var("x"), ast.ConstVal(0)))]
    assert algebra.take_constraints(cs, 3) == cs
    assert algebra.take_constraints(cs) == cs
