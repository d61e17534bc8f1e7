"""Differential testing of the ICL violations compiler.

The reference evaluates constraint bodies per-tuple with nested scans
(lib/constraint.ml:166-251). This file re-implements those semantics as a
naive Python evaluator and checks, over hypothesis-generated random
constraint trees and tiny relations, that the DataFrame compiler's
``satisfied_rows`` partitions rows identically — the strongest guard we
have against subtle join/set-semantics drift (e.g. the multiset-vs-value
issues fixed in round 2).
"""

import pytest
from hypothesis import HealthCheck, given, settings

from conftest import diff_examples
from hypothesis import strategies as st

from sakura_spark.icl import ast
from sakura_spark.icl.compiler import satisfied_rows, violations

# --- naive reference evaluator (lib/constraint.ml:166-251 semantics) --------


def _binding_value(b, env):
    if isinstance(b, ast.Var):
        return env.get(b.name)
    return b.value


_CMP = {
    "lt": lambda a, b: a < b,
    "lte": lambda a, b: a <= b,
    "gt": lambda a, b: a > b,
    "gte": lambda a, b: a >= b,
    "eq": lambda a, b: a == b,
    "neq": lambda a, b: a != b,
}


def _eval(body, env, rels):
    if isinstance(body, ast.Cmp):
        return _CMP[body.op](_binding_value(body.left, env), _binding_value(body.right, env))
    if isinstance(body, ast.Between):
        v = _binding_value(body.value, env)
        return _binding_value(body.low, env) <= v <= _binding_value(body.high, env)
    if isinstance(body, ast.MemberOf):
        target = rels[body.target]
        return any(
            all(row[a] == _binding_value(b, env) for a, b in body.bindings)
            for row in target
        )
    if isinstance(body, ast.Not):
        return not _eval(body.body, env, rels)
    if isinstance(body, ast.And):
        return _eval(body.left, env, rels) and _eval(body.right, env, rels)
    if isinstance(body, ast.Or):
        return _eval(body.left, env, rels) or _eval(body.right, env, rels)
    if isinstance(body, (ast.Exists, ast.Forall)):
        q = rels[body.quantifier]
        extended = (
            {**env, **{f"{body.var}.{k}": v for k, v in qrow.items()}} for qrow in q
        )
        if isinstance(body, ast.Exists):
            return any(_eval(body.body, e, rels) for e in extended)
        return all(_eval(body.body, e, rels) for e in extended)
    raise AssertionError(body)


# --- random constraint trees over fixed schemas ------------------------------

# Constrained frame: (x, y); target relation R: (a, b); quantifier Q: (qa,)
_VALS = st.integers(0, 3)


def _bindings_for(attrs, var_names):
    return st.tuples(
        *[
            st.one_of(
                st.builds(ast.ConstVal, _VALS),
                st.sampled_from([ast.Var(v) for v in var_names]),
            )
            for _ in attrs
        ]
    ).map(lambda bs: tuple(zip(attrs, bs)))


def _body(var_names, depth):
    leaf = st.one_of(
        st.builds(lambda bs: ast.MemberOf("R", bs), _bindings_for(("a", "b"), var_names)),
        st.builds(
            ast.Cmp,
            st.sampled_from(list(_CMP)),
            st.sampled_from([ast.Var(v) for v in var_names]),
            st.one_of(st.builds(ast.ConstVal, _VALS), st.sampled_from([ast.Var(v) for v in var_names])),
        ),
    )
    if depth == 0:
        return leaf
    sub = _body(var_names, depth - 1)
    quantified = st.builds(
        lambda kind, inner: kind("q", "Q", inner),
        st.sampled_from([ast.Exists, ast.Forall]),
        _body(list(var_names) + ["q.qa"], depth - 1),
    )
    return st.one_of(
        leaf,
        st.builds(ast.Not, sub),
        st.builds(ast.And, sub, sub),
        st.builds(ast.Or, sub, sub),
        quantified,
    )


_ROWS_XY = st.lists(st.tuples(_VALS, _VALS), min_size=0, max_size=5, unique=True)
_ROWS_AB = st.lists(st.tuples(_VALS, _VALS), min_size=0, max_size=4, unique=True)
_ROWS_QA = st.lists(st.tuples(_VALS), min_size=0, max_size=3, unique=True)


@given(
    body=_body(["x", "y"], depth=2),
    xy=_ROWS_XY,
    ab=_ROWS_AB,
    qa=_ROWS_QA,
)
@settings(
    max_examples=diff_examples(12, 3),
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
def test_compiler_matches_naive_evaluator(spark, body, xy, ab, qa):
    df = spark.createDataFrame(xy or [], "x long, y long")
    rels = {
        "R": spark.createDataFrame(ab or [], "a long, b long"),
        "Q": spark.createDataFrame(qa or [], "qa long"),
    }
    py_rels = {
        "R": [{"a": a, "b": b} for a, b in ab],
        "Q": [{"qa": q} for (q,) in qa],
    }
    expected_sat = {
        (x, y) for x, y in xy if _eval(body, {"x": x, "y": y}, py_rels)
    }
    got_sat = {(r.x, r.y) for r in satisfied_rows(df, body, rels).collect()}
    got_bad = {(r.x, r.y) for r in violations(df, body, rels).collect()}
    assert got_sat == expected_sat
    assert got_bad == set(xy) - expected_sat


# --- explicit shadowed-quantifier regressions --------------------------------
#
# Nested quantifiers reusing a variable name must shadow inner-over-outer
# (the reference extends the environment with a map update,
# lib/constraint.ml:230-251). Round 4's compiler crashed with
# AMBIGUOUS_REFERENCE on these shapes; keep them pinned explicitly so the
# guarantee doesn't depend on the hypothesis example database surviving a
# fresh checkout.

_SHADOW_BODIES = [
    # Inner Exists shadows outer Exists over the same relation.
    ast.Exists("q", "Q", ast.Exists("q", "Q", ast.MemberOf("R", (("a", ast.Var("x")), ("b", ast.Var("q.qa")))))),
    # Forall-in-Forall shadowing.
    ast.Forall("q", "Q", ast.Forall("q", "Q", ast.Cmp("lte", ast.Var("q.qa"), ast.Var("y")))),
    # Mixed kinds: Forall around Exists, same name.
    ast.Forall("q", "Q", ast.Exists("q", "Q", ast.Cmp("eq", ast.Var("q.qa"), ast.Var("x")))),
    # Triple nesting — exercises placeholder uniqueness at depth 3.
    ast.Exists(
        "q", "Q",
        ast.Exists("q", "Q", ast.Exists("q", "Q", ast.Cmp("lt", ast.Var("q.qa"), ast.Var("y")))),
    ),
    # The outer binding is used BEFORE the inner quantifier shadows it:
    # And(outer q.qa == x, Exists(q, q.qa == y)) — both scopes live in one body.
    ast.Exists(
        "q", "Q",
        ast.And(
            ast.Cmp("eq", ast.Var("q.qa"), ast.Var("x")),
            ast.Exists("q", "Q", ast.Cmp("eq", ast.Var("q.qa"), ast.Var("y"))),
        ),
    ),
    # Shadowing inside a Not.
    ast.Exists("q", "Q", ast.Not(ast.Exists("q", "Q", ast.Cmp("gt", ast.Var("q.qa"), ast.Var("q.qa"))))),
]


@pytest.mark.parametrize("body", _SHADOW_BODIES, ids=lambda b: type(b).__name__ + str(_SHADOW_BODIES.index(b)))
def test_shadowed_quantifier_matches_naive_evaluator(spark, body):
    xy = [(0, 0), (0, 2), (1, 1), (2, 3), (3, 0)]
    ab = [(0, 1), (1, 2), (2, 2)]
    qa = [(1,), (2,), (3,)]
    df = spark.createDataFrame(xy, "x long, y long")
    rels = {
        "R": spark.createDataFrame(ab, "a long, b long"),
        "Q": spark.createDataFrame(qa, "qa long"),
    }
    py_rels = {
        "R": [{"a": a, "b": b} for a, b in ab],
        "Q": [{"qa": q} for (q,) in qa],
    }
    expected_sat = {(x, y) for x, y in xy if _eval(body, {"x": x, "y": y}, py_rels)}
    got_sat = {(r.x, r.y) for r in satisfied_rows(df, body, rels).collect()}
    got_bad = {(r.x, r.y) for r in violations(df, body, rels).collect()}
    assert got_sat == expected_sat
    assert got_bad == set(xy) - expected_sat
