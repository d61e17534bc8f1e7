"""SCL cursor semantics (reference lib/scl/, lib/session.ml)."""

import pytest
from conftest import diff_examples

from sakura_spark import errors
from sakura_spark.scl import SessionRegistry


@pytest.fixture(scope="module")
def nums(spark):
    return spark.range(0, 120).toDF("n")


def test_begin_fetch_close(nums):
    reg = SessionRegistry()
    cid, first = reg.begin(nums.orderBy("n"), query="(Base nums)", limit=50)
    assert len(first) == 50 and first[0].n == 0
    batch2 = reg.fetch(cid, 50)
    assert len(batch2) == 50 and batch2[0].n == 50
    batch3 = reg.fetch(cid, 50)
    assert len(batch3) == 20  # exhausted -> auto-closed
    with pytest.raises(errors.CursorError):
        reg.fetch(cid, 1)


def test_default_batch_is_50(nums):
    reg = SessionRegistry()
    cid, first = reg.begin(nums.orderBy("n"))
    assert len(first) == 50  # lib/scl/executor.ml:1


def test_close_and_registry(nums):
    reg = SessionRegistry(max_cursors=2)
    c1, _ = reg.begin(nums.limit(5))
    c2, _ = reg.begin(nums.limit(5))
    assert len(reg.open_cursors()) <= 2
    reg.close(c2)
    assert c2 not in reg.open_cursors()


def test_lru_eviction(nums):
    reg = SessionRegistry(max_cursors=2)
    c1, _ = reg.begin(nums.orderBy("n"), limit=10)
    c2, _ = reg.begin(nums.orderBy("n"), limit=10)
    c3, _ = reg.begin(nums.orderBy("n"), limit=10)  # evicts c1
    with pytest.raises(errors.CursorError):
        reg.fetch(c1, 1)
    assert len(reg.fetch(c2, 5)) == 5


def test_gc_expires_old_cursors(nums):
    """Registry GC (lib/session.ml:71-79): cursors past max_age close;
    fresh ones survive."""
    import time as _time

    reg = SessionRegistry()
    c_old, _ = reg.begin(nums.orderBy("n"), limit=10)
    reg._cursors[c_old].created_at -= 100.0  # age it artificially
    c_new, _ = reg.begin(nums.orderBy("n"), limit=10)
    expired = reg.gc(max_age_seconds=50.0)
    assert expired == [c_old]
    with pytest.raises(errors.CursorError):
        reg.fetch(c_old, 1)
    assert len(reg.fetch(c_new, 5)) == 5
    assert _time.time() - reg._cursors[c_new].created_at < 50


def test_cursor_snapshot_isolation(spark, store):
    """Cursor pins the db state at Begin (lib/session.ml:11)."""
    from sakura_spark.database import Database

    db = Database(spark, "curdb", store=store, snapshot_on_mutation=False)
    db.create_relation("t", [("v", "integer")])
    db.insert_tuples("t", [{"v": 1}, {"v": 2}, {"v": 3}])
    reg = SessionRegistry()
    snapshot_df = db.relation("t").orderBy("v")
    cid, first = reg.begin(snapshot_df, limit=1)
    db.insert_tuples("t", [{"v": 99}])
    rest = [r.v for r in reg.fetch(cid, 10)]
    assert 99 not in rest  # iterator walks the pinned plan, not the new state


def test_random_batch_paging_equals_collect(nums):
    """Property: any sequence of fetch sizes drains exactly the full
    ordered result, each row once, regardless of batch boundaries."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @given(sizes=st.lists(st.integers(1, 70), min_size=1, max_size=8))
    @settings(
        max_examples=diff_examples(10, 4),
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
    )
    def run(sizes):
        reg = SessionRegistry()
        cid, first = reg.begin(nums.orderBy("n"), limit=sizes[0])
        got = [r.n for r in first]
        for s in sizes[1:]:
            if len(got) >= 120:
                break
            got.extend(r.n for r in reg.fetch(cid, s))
        while len(got) < 120:
            got.extend(r.n for r in reg.fetch(cid, 50))
        assert got == list(range(120))

    run()
