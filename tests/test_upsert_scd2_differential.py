"""Hypothesis differentials for the session-4 relational operators:
merge_upsert vs a pure-Python MERGE reference, scd2_intervalize vs a
pure-Python regime builder. Arbitrary keys/values (including duplicate
event times and NULL attributes) — the distributed plans must agree with
the sequential semantics on every generated input."""

from conftest import diff_examples
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from sakura_spark.operators import merge_upsert, scd2_intervalize


def _merge_reference(target, source):
    """MERGE reference: dict overlay, source wins per key, inserts appended."""
    out = {k: (k, tag, v) for k, tag, v in target}
    for k, tag, v in source:
        out[k] = (k, tag, v)
    return set(out.values())


@given(
    target=st.lists(
        st.tuples(st.integers(0, 9), st.one_of(st.none(), st.text("ab", max_size=2)), st.integers(-5, 5)),
        max_size=10,
        unique_by=lambda r: r[0],
    ),
    source=st.lists(
        st.tuples(st.integers(0, 12), st.one_of(st.none(), st.text("ab", max_size=2)), st.integers(-5, 5)),
        max_size=10,
        unique_by=lambda r: r[0],
    ),
)
@settings(
    max_examples=diff_examples(15, 5),
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
def test_merge_upsert_matches_reference(spark, target, source):
    tdf = spark.createDataFrame(target, "k long, tag string, v long") if target else \
        spark.createDataFrame([], "k long, tag string, v long")
    sdf = spark.createDataFrame(source, "k long, tag string, v long") if source else \
        spark.createDataFrame([], "k long, tag string, v long")
    got = {(r["k"], r["tag"], r["v"]) for r in merge_upsert(tdf, sdf, ["k"]).collect()}
    assert got == _merge_reference(target, source)


def _scd2_reference(rows):
    """Regime builder: per key, sort by (t, seq), compress equal-attr runs
    (null-safe), chain intervals, last regime open."""
    out = set()
    keys = {r[0] for r in rows}
    for k in keys:
        hist = sorted((t, seq, a) for kk, t, seq, a in rows if kk == k)
        regimes = []
        prev = object()
        for t, seq, a in hist:
            if a != prev or (a is None) != (prev is None):
                regimes.append((t, seq, a))
            prev = a
        for i, (t, seq, a) in enumerate(regimes):
            nxt = regimes[i + 1][0] if i + 1 < len(regimes) else None
            out.add((k, a, t, nxt, nxt is None))
    return out


@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 3),                     # key
            st.integers(0, 6),                     # event time (ties likely)
            st.integers(0, 99),                    # seq (tie-break)
            st.one_of(st.none(), st.sampled_from(["A", "B"])),  # attr incl. NULL
        ),
        max_size=14,
        unique_by=lambda r: (r[0], r[1], r[2]),
    )
)
@settings(
    max_examples=diff_examples(15, 5),
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
def test_scd2_matches_reference(spark, rows):
    df = spark.createDataFrame(rows, "k long, t long, seq long, status string") if rows else \
        spark.createDataFrame([], "k long, t long, seq long, status string")
    # integer event time: cast the high sentinel comparison away by using
    # a numeric domain twin — valid_to NULL-equivalent is the sentinel year
    out = scd2_intervalize(
        df.withColumn("t", df["t"].cast("timestamp")),
        ["k"], "t", ["status"], seq_col="seq",
    )
    got = {
        (
            r["k"],
            r["status"],
            int(r["valid_from"].timestamp()),
            None if r["is_current"] else int(r["valid_to"].timestamp()),
            r["is_current"],
        )
        for r in out.collect()
    }
    assert got == _scd2_reference(rows)


# --- round-10 MERGE contract hardening (VERDICT r9 item 8 + ADVICE) ---------


def test_merge_upsert_null_source_key_inserts(spark):
    """A source row with a NULL key is UNMATCHED (NULL never equi-joins)
    and must INSERT like a real MERGE — existence markers, not key
    NULL-ness, carry match state (ADVICE r9: the old plan decayed it
    into a mostly-NULL pass-through)."""
    target = spark.createDataFrame([(1, "t", 10)], "k long, tag string, v long")
    source = spark.createDataFrame(
        [(None, "s", 99), (1, "u", 11)], "k long, tag string, v long"
    )
    got = {(r["k"], r["tag"], r["v"]) for r in merge_upsert(target, source, ["k"]).collect()}
    assert got == {(1, "u", 11), (None, "s", 99)}


def test_merge_upsert_validate_raises_on_duplicate_source_keys(spark):
    """validate=True is the Delta/Iceberg parity mode: duplicate source
    keys fail the job in-plan instead of silently multiplying rows."""
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    target = spark.createDataFrame([(1, "t", 10)], "k long, tag string, v long")
    source = spark.createDataFrame(
        [(1, "a", 1), (1, "b", 2)], "k long, tag string, v long"
    )
    with pytest.raises((Py4JJavaError, SparkRuntimeException), match="duplicate source key"):
        merge_upsert(target, source, ["k"], validate=True).collect()


def test_merge_upsert_validate_raises_on_null_source_key(spark):
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    target = spark.createDataFrame([(1, "t", 10)], "k long, tag string, v long")
    source = spark.createDataFrame([(None, "s", 1)], "k long, tag string, v long")
    with pytest.raises((Py4JJavaError, SparkRuntimeException), match="NULL source key"):
        merge_upsert(target, source, ["k"], validate=True).collect()


@given(
    target=st.lists(
        st.tuples(st.integers(0, 9), st.one_of(st.none(), st.text("ab", max_size=2)), st.integers(-5, 5)),
        max_size=8,
        unique_by=lambda r: r[0],
    ),
    source=st.lists(
        st.tuples(st.integers(0, 12), st.one_of(st.none(), st.text("ab", max_size=2)), st.integers(-5, 5)),
        max_size=8,
        unique_by=lambda r: r[0],
    ),
)
@settings(
    max_examples=diff_examples(8, 3),
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
def test_merge_upsert_validate_transparent_on_clean_source(spark, target, source):
    """On a key-unique NULL-free source, validate=True must be a pure
    assertion — byte-identical output to the unvalidated plan."""
    tdf = spark.createDataFrame(target, "k long, tag string, v long") if target else \
        spark.createDataFrame([], "k long, tag string, v long")
    sdf = spark.createDataFrame(source, "k long, tag string, v long") if source else \
        spark.createDataFrame([], "k long, tag string, v long")
    plain = {(r["k"], r["tag"], r["v"]) for r in merge_upsert(tdf, sdf, ["k"]).collect()}
    checked = {
        (r["k"], r["tag"], r["v"])
        for r in merge_upsert(tdf, sdf, ["k"], validate=True).collect()
    }
    assert checked == plain == _merge_reference(target, source)
