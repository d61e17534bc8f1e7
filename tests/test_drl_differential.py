"""Differential testing of the DRL -> DataFrame compiler.

Random well-formed DRL trees (schema tracked during generation) are
compiled to DataFrames and compared, as BAGS, against a naive Python
evaluator implementing the documented semantics (reference
lib/drl/executor.ml + lib/algebra.ml with the repo's two documented
choices: left-wins column collisions, set-semantics Diff). Catches
drift in the subtle corners — collision dropping, bag union multiplicity,
semijoin common-attr computation — that three fixed oracle queries
can't cover.
"""

from collections import Counter

from hypothesis import HealthCheck, given, settings

from conftest import diff_examples
from hypothesis import strategies as st

from sakura_spark.drl import ast
from sakura_spark.drl.compiler import compile_query

# Base tables: E(a, b), D(b, c) — small int domains so joins hit.
E_ROWS = [(0, 0), (0, 1), (1, 2), (2, 2)]
D_ROWS = [(0, 0), (1, 1), (2, 0), (2, 1)]
SCHEMAS = {"E": ("a", "b"), "D": ("b", "c")}
PY_RELS = {
    "E": [dict(zip(("a", "b"), r)) for r in E_ROWS],
    "D": [dict(zip(("b", "c"), r)) for r in D_ROWS],
}


# --- naive evaluator (rows = list of dicts, bag semantics) ------------------


def _eval(q):
    if isinstance(q, ast.Base):
        return [dict(r) for r in PY_RELS[q.name]]
    if isinstance(q, ast.Const):
        return [dict(q.pairs)]
    if isinstance(q, ast.Select):
        src, filt = _eval(q.source), _eval(q.filter)
        src_cols = _schema(q.source)
        filt_cols = set(_schema(q.filter))
        common = [c for c in src_cols if c in filt_cols]
        if not common:
            return list(src) if filt else []
        keys = {tuple(f[c] for c in common) for f in filt}
        return [r for r in src if tuple(r[c] for c in common) in keys]
    if isinstance(q, (ast.Join, ast.Cartesian)):
        attrs = list(q.attrs) if isinstance(q, ast.Join) else []
        left, right = _eval(q.left), _eval(q.right)
        lcols = set(_schema(q.left))
        rcols = _schema(q.right)
        if not attrs:  # cartesian: left wins on every collision
            keep = [c for c in rcols if c not in lcols]
            return [{**l, **{c: r[c] for c in keep}} for l in left for r in right]
        keep = [c for c in rcols if c not in attrs and c not in lcols]
        out = []
        for l in left:
            for r in right:
                if all(l[a] == r[a] for a in attrs):
                    out.append({**l, **{c: r[c] for c in keep}})
        return out
    if isinstance(q, ast.Project):
        return [{c: r[c] for c in q.attrs} for r in _eval(q.source)]
    if isinstance(q, ast.Rename):
        m = dict(q.pairs)
        return [{m.get(k, k): v for k, v in r.items()} for r in _eval(q.source)]
    if isinstance(q, ast.Union):  # bag union, left schema
        cols = _schema(q.left)
        return [{c: r[c] for c in cols} for r in _eval(q.left) + _eval(q.right)]
    if isinstance(q, ast.Diff):  # EXCEPT DISTINCT
        right_vals = {tuple(sorted(r.items())) for r in _eval(q.right)}
        seen = set()
        out = []
        for r in _eval(q.left):
            key = tuple(sorted(r.items()))
            if key not in right_vals and key not in seen:
                seen.add(key)
                out.append(r)
        return out
    raise AssertionError(q)


def _schema(q) -> tuple[str, ...]:
    if isinstance(q, ast.Base):
        return SCHEMAS[q.name]
    if isinstance(q, ast.Const):
        return tuple(a for a, _ in q.pairs)
    if isinstance(q, ast.Select):
        return _schema(q.source)
    if isinstance(q, (ast.Join, ast.Cartesian)):
        attrs = list(q.attrs) if isinstance(q, ast.Join) else []
        l, r = _schema(q.left), _schema(q.right)
        if not attrs:
            return l + tuple(c for c in r if c not in l)
        return l + tuple(c for c in r if c not in attrs and c not in l)
    if isinstance(q, ast.Project):
        return q.attrs
    if isinstance(q, ast.Rename):
        m = dict(q.pairs)
        return tuple(m.get(c, c) for c in _schema(q.source))
    if isinstance(q, (ast.Union, ast.Diff)):
        return _schema(q.left)
    raise AssertionError(q)


# --- random well-formed trees ------------------------------------------------

_VALS = st.integers(0, 2)


@st.composite
def _tree(draw, depth: int):
    if depth == 0:
        kind = draw(st.sampled_from(["E", "D", "const"]))
        if kind == "const":
            attrs = draw(
                st.lists(st.sampled_from(["a", "b", "c"]), min_size=1, max_size=2, unique=True)
            )
            return ast.Const(tuple((a, draw(_VALS)) for a in attrs))
        return ast.Base(kind)
    op = draw(
        st.sampled_from(["project", "rename", "join", "cartesian", "select", "union", "diff"])
    )
    sub = draw(_tree(depth - 1))
    cols = _schema(sub)
    if op == "project":
        keep = draw(st.lists(st.sampled_from(cols), min_size=1, unique=True))
        return ast.Project(tuple(keep), sub)
    if op == "rename":
        old = draw(st.sampled_from(cols))
        return ast.Rename(((old, f"r_{old}"),), sub)
    if op in ("join", "cartesian"):
        sub2 = draw(_tree(depth - 1))
        if op == "cartesian":
            return ast.Cartesian(sub, sub2)
        common = [c for c in cols if c in set(_schema(sub2))]
        attrs = draw(st.lists(st.sampled_from(common), unique=True)) if common else []
        return ast.Join(tuple(attrs), sub, sub2)
    if op == "select":
        return ast.Select(draw(_tree(depth - 1)), sub)
    # union/diff: second side filters the SAME subtree through a Const
    # semijoin, so schemas agree and overlaps/duplicates actually occur.
    probe_attr = draw(st.sampled_from(cols))
    probe = ast.Select(ast.Const(((probe_attr, draw(_VALS)),)), sub)
    return ast.Union(sub, probe) if op == "union" else ast.Diff(sub, probe)


@given(q=_tree(depth=3))
@settings(
    max_examples=diff_examples(15, 2),
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
def test_drl_compiler_matches_naive_evaluator(spark, q):
    rels = {
        "E": spark.createDataFrame(E_ROWS, "a long, b long"),
        "D": spark.createDataFrame(D_ROWS, "b long, c long"),
    }
    got = Counter(
        tuple(sorted(r.asDict().items()))
        for r in compile_query(spark, q, rels, gate=True).collect()
    )
    expected = Counter(tuple(sorted(r.items())) for r in _eval(q))
    assert got == expected
