"""Differential testing of DML + constraint cascade against a naive model.

Random mutation sequences over a Department/Employee FK pair run through
the engine (whose cascade uses polarity analysis, focused filters, trigger
constants, and transition substitution to narrow rechecks) and through a
naive Python model that re-validates the WHOLE constraint globally after
every candidate mutation. Outcome parity (accepted vs rejected, and the
exact error class) plus final-state parity must hold — any cascade
narrowing that skips a recheck it needed, or rejects a mutation it
shouldn't, diverges here.
"""

from hypothesis import HealthCheck, given, settings

from conftest import diff_examples
from hypothesis import strategies as st

from sakura_spark import errors
from sakura_spark.database import Database
from sakura_spark.icl import MemberOf, Var

DEPTS = [1, 2, 3]
EMPS = [(10, 1), (11, 1), (12, 2), (13, 3)]


def _op_strategy():
    ins_dept = st.sampled_from(DEPTS).map(lambda d: ("ins_dept", d))
    del_dept = st.sampled_from(DEPTS).map(lambda d: ("del_dept", d))
    ins_emp = st.sampled_from(EMPS).map(lambda e: ("ins_emp", e))
    del_emp = st.sampled_from(EMPS).map(lambda e: ("del_emp", e))
    return st.lists(st.one_of(ins_dept, del_dept, ins_emp, del_emp), min_size=3, max_size=7)


def _model_apply(state, op, arg):
    """Naive semantics: set-semantics DML + GLOBAL FK validation. Returns
    the error class the engine must raise, or None on success (mutating
    state in place only then)."""
    depts, emps = state
    if op == "ins_dept":
        if arg in depts:
            return errors.DuplicateTuple
        depts.add(arg)
        return None
    if op == "del_dept":
        if arg not in depts:
            return errors.UnknownTuple
        if any(d == arg for _, d in emps):  # global FK recheck
            return errors.ConstraintViolation
        depts.remove(arg)
        return None
    if op == "ins_emp":
        if arg in emps:
            return errors.DuplicateTuple
        if arg[1] not in depts:
            return errors.ConstraintViolation
        emps.add(arg)
        return None
    if arg not in emps:
        return errors.UnknownTuple
    emps.remove(arg)
    return None


@given(ops=_op_strategy())
@settings(
    # 5 examples x ~5 ops each keeps this under ~30s; inputs are random
    # per run, so coverage accumulates across CI rounds.
    max_examples=diff_examples(5, 2),
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
def test_cascade_matches_global_validation(spark, tmp_path_factory, ops):
    from sakura_spark.management.store import SnapshotStore

    store = SnapshotStore(str(tmp_path_factory.mktemp("cstore")))
    db = Database(spark, "c", store=store, snapshot_on_mutation=False)
    db.create_relation("Department", [("dept_id", "integer")])
    db.create_relation("Employee", [("emp_id", "integer"), ("dept_id", "integer")])
    db.insert_tuples("Department", [{"dept_id": 1}, {"dept_id": 2}])
    db.register_constraint(
        "fk_emp_dept", "Employee", MemberOf("Department", (("dept_id", Var("dept_id")),))
    )
    db.insert_tuples("Employee", [{"emp_id": 10, "dept_id": 1}])

    state = ({1, 2}, {(10, 1)})
    for op, arg in ops:
        expected_err = _model_apply(state, op, arg)
        try:
            if op == "ins_dept":
                db.insert_tuples("Department", [{"dept_id": arg}])
            elif op == "del_dept":
                db.delete_tuples("Department", [{"dept_id": arg}])
            elif op == "ins_emp":
                db.insert_tuples("Employee", [{"emp_id": arg[0], "dept_id": arg[1]}])
            else:
                db.delete_tuples("Employee", [{"emp_id": arg[0], "dept_id": arg[1]}])
            got_err = None
        except errors.SakuraError as e:
            got_err = type(e)
        assert got_err is expected_err, f"op={op} arg={arg}"

    assert {r.dept_id for r in db.relation("Department").collect()} == state[0]
    assert {(r.emp_id, r.dept_id) for r in db.relation("Employee").collect()} == state[1]


# --- Exists-quantifier delete semantics (ADVICE r2, high) -------------------
# Transition substitution is only sound for inserts: substituting a DELETED
# tuple into an Exists body checks whether the removed tuple matches each
# constrained row, not whether a surviving witness exists. These pin the
# sound delete behavior: unsubstituted recheck of the narrowed rows.

import pytest

from sakura_spark.icl import Cmp, Exists


@pytest.fixture()
def exists_db(spark, tmp_path):
    from sakura_spark.management.store import SnapshotStore

    db = Database(
        spark,
        "exists_db",
        store=SnapshotStore(str(tmp_path / "estore")),
        snapshot_on_mutation=False,
    )
    db.create_relation("Parent", [("pid", "integer"), ("grp", "integer")])
    db.create_relation("Child", [("cid", "integer"), ("grp", "integer")])
    db.insert_tuples(
        "Parent", [{"pid": 1, "grp": 100}, {"pid": 2, "grp": 100}, {"pid": 3, "grp": 200}]
    )
    db.register_constraint(
        "child_has_parent",
        "Child",
        Exists("p", "Parent", Cmp("eq", Var("p.grp"), Var("grp"))),
    )
    db.insert_tuples("Child", [{"cid": 10, "grp": 100}])
    return db


def test_delete_of_nonwitness_parent_accepted(exists_db):
    # (3, 200) witnesses no child; deleting it must NOT raise (the old
    # substituted recheck falsely rejected this).
    exists_db.delete_tuples("Parent", [{"pid": 3, "grp": 200}])
    assert exists_db.relation("Parent").count() == 2


def test_delete_witness_with_alternate_witness_accepted(exists_db):
    # (1,100) and (2,100) both witness child grp=100: removing one is fine.
    exists_db.delete_tuples("Parent", [{"pid": 1, "grp": 100}])
    assert exists_db.relation("Parent").count() == 2


def test_delete_last_witness_rejected(exists_db):
    # Removing BOTH grp=100 parents leaves the child witness-less — the old
    # substituted recheck falsely ACCEPTED the second delete.
    exists_db.delete_tuples("Parent", [{"pid": 1, "grp": 100}])
    with pytest.raises(errors.ConstraintViolation):
        exists_db.delete_tuples("Parent", [{"pid": 2, "grp": 100}])
    # Rejected delete must leave state untouched.
    assert {r.pid for r in exists_db.relation("Parent").collect()} == {2, 3}


PARENTS = [(1, 100), (2, 100), (3, 200)]
CHILDREN = [(10, 100), (11, 200)]


def _exists_op_strategy():
    ins_p = st.sampled_from(PARENTS).map(lambda p: ("ins_p", p))
    del_p = st.sampled_from(PARENTS).map(lambda p: ("del_p", p))
    ins_c = st.sampled_from(CHILDREN).map(lambda c: ("ins_c", c))
    del_c = st.sampled_from(CHILDREN).map(lambda c: ("del_c", c))
    return st.lists(st.one_of(ins_p, del_p, ins_c, del_c), min_size=3, max_size=7)


def _exists_model_apply(state, op, arg):
    """Naive global semantics for Exists p in Parent: p.grp == child.grp."""
    parents, children = state
    if op == "ins_p":
        if arg in parents:
            return errors.DuplicateTuple
        parents.add(arg)
        return None
    if op == "del_p":
        if arg not in parents:
            return errors.UnknownTuple
        remaining = parents - {arg}
        if any(all(g != cg for _, g in remaining) for _, cg in children):
            return errors.ConstraintViolation
        parents.remove(arg)
        return None
    if op == "ins_c":
        if arg in children:
            return errors.DuplicateTuple
        if all(g != arg[1] for _, g in parents):
            return errors.ConstraintViolation
        children.add(arg)
        return None
    if arg not in children:
        return errors.UnknownTuple
    children.remove(arg)
    return None


@given(ops=_exists_op_strategy())
@settings(
    max_examples=diff_examples(5, 2),
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
def test_exists_cascade_matches_global_validation(spark, tmp_path_factory, ops):
    from sakura_spark.management.store import SnapshotStore

    store = SnapshotStore(str(tmp_path_factory.mktemp("estore")))
    db = Database(spark, "e", store=store, snapshot_on_mutation=False)
    db.create_relation("Parent", [("pid", "integer"), ("grp", "integer")])
    db.create_relation("Child", [("cid", "integer"), ("grp", "integer")])
    db.insert_tuples("Parent", [{"pid": 1, "grp": 100}])
    db.register_constraint(
        "child_has_parent",
        "Child",
        Exists("p", "Parent", Cmp("eq", Var("p.grp"), Var("grp"))),
    )
    db.insert_tuples("Child", [{"cid": 10, "grp": 100}])

    state = ({(1, 100)}, {(10, 100)})
    for op, arg in ops:
        expected_err = _exists_model_apply(state, op, arg)
        try:
            if op == "ins_p":
                db.insert_tuples("Parent", [{"pid": arg[0], "grp": arg[1]}])
            elif op == "del_p":
                db.delete_tuples("Parent", [{"pid": arg[0], "grp": arg[1]}])
            elif op == "ins_c":
                db.insert_tuples("Child", [{"cid": arg[0], "grp": arg[1]}])
            else:
                db.delete_tuples("Child", [{"cid": arg[0], "grp": arg[1]}])
            got_err = None
        except errors.SakuraError as e:
            got_err = type(e)
        assert got_err is expected_err, f"op={op} arg={arg}"

    assert {(r.pid, r.grp) for r in db.relation("Parent").collect()} == state[0]
    assert {(r.cid, r.grp) for r in db.relation("Child").collect()} == state[1]
