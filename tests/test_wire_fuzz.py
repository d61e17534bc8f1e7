"""Fuzzing the sexp wire layer: serialize -> parse round trips.

Random strings (quotes, backslashes, parens, unicode, control chars)
travel the full wire text path: a DML insert rendered as an S-expression,
executed via Server.execute, then read back through execute_sexp and
re-parsed with read_sexp — the value that comes out must equal the value
that went in. Catches escaping bugs the handwritten protocol tests miss.
"""

from hypothesis import HealthCheck, given, settings

from conftest import diff_examples
from hypothesis import strategies as st

from sakura_spark.drl.parser import read_sexp
from sakura_spark.wire import Server, _sexp_atom

# Strings mixing sexp metacharacters with regular text (no surrogates —
# they can't travel through Spark's UTF-8 columns).
_NASTY = st.text(
    alphabet=st.one_of(
        st.sampled_from(list('\\"() \t\n') + ["α", "中", "🙂"]),
        st.characters(min_codepoint=32, max_codepoint=126),
    ),
    min_size=0,
    max_size=12,
)


@given(s=_NASTY)
@settings(max_examples=diff_examples(40, 15), deadline=None)
def test_atom_roundtrip(s):
    tok = read_sexp(_sexp_atom(s))
    assert isinstance(tok, str) and tok.startswith('"')
    assert tok[1:] == s


@given(vals=st.lists(_NASTY, min_size=1, max_size=3, unique=True))
@settings(
    max_examples=diff_examples(8, 4),
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
def test_wire_value_roundtrip(spark, tmp_path_factory, vals):
    from sakura_spark.management.store import SnapshotStore

    store = SnapshotStore(str(tmp_path_factory.mktemp("wstore")))
    srv = Server(spark, "fuzz", store=store, snapshot_on_mutation=False)
    srv.execute('(ddl (CreateRelation (name "t") (schema (("s" "string")))))')
    tuples = " ".join(f'(("s" (Str {_sexp_atom(v)})))' for v in vals)
    srv.execute(f'(dml (InsertTuples (relation "t") (tuples ({tuples}))))')

    rendered = srv.execute_sexp('(drl (Base "t"))')
    parsed = read_sexp(rendered)
    # Listener shape: (relation (name ..) .. (rows (((s v) ...) ...)) ..)
    assert parsed[0] == "relation"
    fields = {item[0]: item[1] for item in parsed[1:]}
    got = {cell[1:] if isinstance(cell, str) and cell.startswith('"') else cell
           for row in fields["rows"] for (_attr, cell) in row}
    assert got == set(vals)
