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
    max_examples=8,
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
