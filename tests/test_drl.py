"""DRL front-end: parse round-trips (reference test/test_relational_engine.ml:
1585-1609) and execution (":1610-1687"), incl. intensional-relation rewrites."""

import pytest

from sakura_spark.drl import (
    Base,
    Const,
    GateError,
    Join,
    ParseError,
    Select,
    Take,
    compile_query,
    parse,
)


def test_parse_base():
    assert parse('(Base "users")') == Base("users")


def test_parse_const():
    q = parse('(Const (("age" (Int 18))))')
    assert q == Const((("age", 18),))


def test_parse_join():
    q = parse('(Join (id) (Base "L") (Base "R"))')
    assert q == Join(("id",), Base("L"), Base("R"))


def test_parse_select():
    q = parse('(Select (Const (("age" (Int 18)))) (Base "users"))')
    assert isinstance(q, Select) and q.source == Base("users")


def test_parse_take_nested():
    q = parse('(Take 5 (Project (name) (Base "users")))')
    assert isinstance(q, Take) and q.n == 5


def test_parse_errors():
    with pytest.raises(ParseError):
        parse('(Join (id) (Base "L")')
    with pytest.raises(ParseError):
        parse('(Frobnicate (Base "x"))')


@pytest.fixture(scope="module")
def users(spark):
    return {
        "users": spark.createDataFrame(
            [("Alice", 18), ("Bob", 25)], "name string, age long"
        )
    }


def test_execute_base(spark, users):
    out = compile_query(spark, parse('(Base "users")'), users)
    assert out.count() == 2


def test_execute_select_const(spark, users):
    """Select with a Const filter = the reference's point-lookup idiom."""
    out = compile_query(
        spark, parse('(Select (Const (("age" (Int 18)))) (Base "users"))'), users
    )
    rows = out.collect()
    assert len(rows) == 1 and rows[0].name == "Alice"


def test_execute_union_diff(spark, users):
    out = compile_query(spark, parse('(Union (Base "users") (Base "users"))'), users)
    assert out.count() == 4  # bag semantics
    out2 = compile_query(spark, parse('(Diff (Base "users") (Base "users"))'), users)
    assert out2.count() == 0


def test_gate_rejects_infinite(spark, users):
    q = parse('(Join (a b) (Rename ((age a) (age2 b)) (Base "users")) (Base "natural_plus"))')
    with pytest.raises(GateError):
        compile_query(spark, q, users)


def test_unbound_intensional_attr_rejected(spark, users):
    """Take passes the gate, but an intensional join whose unbound attrs
    have no functional completion is still not computable."""
    q = parse(
        '(Take 10 (Join (a b) (Rename ((age a)) (Project (age) (Base "users"))) '
        '(Base "natural_plus")))'
    )
    # only `a` is bound from users; `b` unbound and not derivable
    with pytest.raises(ValueError):
        compile_query(spark, q, users).collect()


def test_intensional_completion(spark, users):
    res = {
        "pairs": spark.createDataFrame([(1, 2), (10, 5)], "a long, b long"),
    }
    out = compile_query(
        spark, parse('(Take 10 (Join (a b) (Base "pairs") (Base "natural_plus")))'), res
    )
    got = {(r.a, r.b): r.sum for r in out.collect()}
    assert got == {(1, 2): 3, (10, 5): 15}


def test_intensional_membership_filter(spark):
    res = {"pairs": spark.createDataFrame([(1, 2), (5, 3)], "left long, right long")}
    out = compile_query(
        spark, parse('(Select (Base "less_than") (Base "pairs"))'), res
    )
    rows = out.collect()
    assert len(rows) == 1 and rows[0].left == 1


def test_intensional_divide_guard(spark):
    res = {"pairs": spark.createDataFrame([(7, 2), (9, 0)], "a long, b long")}
    out = compile_query(
        spark, parse('(Take 10 (Join (a b) (Base "pairs") (Base "natural_divide")))'), res
    )
    rows = {(r.a, r.b): (r.quotient, r.remainder) for r in out.collect()}
    # b=0 filtered by the domain guard (lib/prelude/standard.ml:281-330)
    assert rows == {(7, 2): (3, 1)}
