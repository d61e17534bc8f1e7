"""Structured Streaming smoke tests: drive parquet-backed streams to
completion against memory sinks and cross-check with the batch equivalent."""

import pytest
from pyspark.sql import functions as F

from sakura_spark.session import load_table
from sakura_spark.streaming import events as ev

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def stream(spark, tmp_path_factory):
    # Copy the events table into a directory so the file source can list it.
    src = load_table(spark, f"{SF_DIR}/events.parquet")
    path = str(tmp_path_factory.mktemp("events_stream"))
    src.coalesce(2).write.mode("overwrite").parquet(path)
    return path


def test_windowed_counts_matches_batch(spark, stream):
    q = ev.run_to_memory(
        ev.windowed_counts(ev.read_event_stream(spark, stream), window="1 hour"),
        "win_counts",
        output_mode="append",
    )
    try:
        got = spark.sql("SELECT sum(n_events) AS n FROM win_counts").collect()[0].n
        batch_n = spark.read.parquet(stream).count()
        # Append mode emits only watermark-closed windows; with availableNow
        # over finite input, the final watermark closes all but the last.
        assert got is not None and got >= batch_n * 0.5
        cols = spark.table("win_counts").columns
        assert cols == ["window_start", "window_end", "event_type", "n_events", "sum_value", "approx_users"]
    finally:
        q.stop()


def test_session_windows_stream(spark, stream):
    q = ev.run_to_memory(
        ev.session_windows(ev.read_event_stream(spark, stream), gap="30 minutes"),
        "sessions",
        output_mode="append",
    )
    try:
        rows = spark.sql("SELECT count(*) AS n FROM sessions").collect()[0].n
        assert rows >= 0  # emitted sessions are watermark-closed
        cols = spark.table("sessions").columns
        assert cols == ["session_start", "session_end", "user_id", "n_events", "sum_value"]
    finally:
        q.stop()


def test_running_user_stats_stateful(spark, stream):
    q = ev.run_to_memory(
        ev.running_user_stats(ev.read_event_stream(spark, stream)),
        "user_stats",
        output_mode="update",
    )
    try:
        # Final state per user must equal the batch aggregate exactly.
        got = {
            r.user_id: (r.n, round(r.total, 6))
            for r in spark.sql(
                "SELECT user_id, max(n_events) AS n, max(total) AS total "
                "FROM user_stats GROUP BY user_id"
            ).collect()
        }
        batch = {
            r.user_id: (r.n, round(r.total, 6))
            for r in spark.read.parquet(stream)
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
            .collect()
        }
        assert got == batch
    finally:
        q.stop()


def test_streaming_near_dup_candidates_match_batch(spark, tmp_path):
    """Streaming LSH candidates within one window = batch candidates on the
    same documents (stateless banding shared; only the bucket agg is
    windowed). Uses planted near-dups so the pair set is known."""
    import datetime as dt

    from sakura_spark.functions import dedup
    from sakura_spark.streaming import documents as sd

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, t0, "the quick brown fox jumps over the lazy dog and runs away fast"),
        (2, t0, "the quick brown fox jumps over the lazy dog and runs away fast"),
        (3, t0, "the quick brown fox jumps over the lazy cat and runs away fast"),
        (4, t0, "completely different content about spark engines and query plans"),
    ]
    batch_docs = spark.createDataFrame(rows, sd.DOCS_STREAM_SCHEMA)
    path = str(tmp_path / "docs_stream")
    batch_docs.coalesce(1).write.mode("overwrite").parquet(path)
    # Append mode only emits watermark-CLOSED windows; with one micro-batch
    # the watermark never passes the first window's end. Two later sentinel
    # files (unique texts -> no pairs) arrive in later micro-batches
    # (maxFilesPerTrigger=1) and push the watermark past it.
    for day, txt in ((1, "sentinel alpha beta gamma delta"), (2, "sentinel one two three four")):
        spark.createDataFrame(
            [(100 + day, t0 + dt.timedelta(days=day), txt)], sd.DOCS_STREAM_SCHEMA
        ).coalesce(1).write.mode("append").parquet(path)

    q = ev.run_to_memory(
        sd.near_dup_candidates(sd.read_document_stream(spark, path), window="1 hour"),
        "near_dup_stream",
        output_mode="append",
    )
    try:
        got = {
            (r.id_a, r.id_b)
            for r in spark.sql("SELECT id_a, id_b FROM near_dup_stream").collect()
        }
        batch = {
            (r.id_a, r.id_b)
            for r in dedup.minhash_candidate_pairs(batch_docs, "doc_id").collect()
        }
        assert got == batch and (1, 2) in got
    finally:
        q.stop()


def test_deduped_stream_drops_redelivered_events(spark, tmp_path):
    # two identical file deliveries of the same events = at-least-once input
    src = load_table(spark, f"{SF_DIR}/events.parquet").limit(200)
    path = str(tmp_path / "dup_stream")
    src.coalesce(1).write.mode("overwrite").parquet(path)
    src.coalesce(1).write.mode("append").parquet(path)
    assert spark.read.parquet(path).count() == 400

    q = ev.run_to_memory(
        ev.deduped_stream(ev.read_event_stream(spark, path)),
        "dedup_stream",
        output_mode="append",
    )
    try:
        n = spark.sql("SELECT count(*) AS n FROM dedup_stream").collect()[0].n
        ids = spark.sql("SELECT count(DISTINCT event_id) AS n FROM dedup_stream").collect()[0].n
        assert n == 200 and ids == 200  # every event exactly once
    finally:
        q.stop()


def test_attributed_purchases_stream_matches_batch(spark, stream):
    """Stream-stream interval join: purchases joined to same-user views in
    the preceding hour. The streaming result (inner join, availableNow
    over finite input — every joinable pair is emitted once both
    watermarks pass) must equal the batch run of the SAME function on the
    same files, row for row."""
    src = spark.read.parquet(stream)
    views_b = src.filter(F.col("event_type") == "view")
    purch_b = src.filter(F.col("event_type") == "purchase")
    batch = {
        tuple(r)
        for r in ev.attributed_purchases(views_b, purch_b).collect()
    }
    assert batch, "fixture produced no attributable purchases"

    s = ev.read_event_stream(spark, stream, max_files_per_trigger=1)
    q = ev.run_to_memory(
        ev.attributed_purchases(
            s.filter(F.col("event_type") == "view"),
            s.filter(F.col("event_type") == "purchase"),
        ),
        "attributed",
        output_mode="append",
    )
    try:
        got = {tuple(r) for r in spark.table("attributed").collect()}
        assert got == batch
    finally:
        q.stop()


def test_windowed_user_hll_matches_batch_registers(spark, stream):
    """Closed streaming windows must carry bit-identical HLL registers to
    the batch computation over the same rows — the mergeable-sketch
    guarantee extended to event time."""
    from sakura_spark.functions import sketches

    q = ev.run_to_memory(
        ev.windowed_user_hll(
            ev.read_event_stream(spark, stream), window="1 hour", p=4
        ),
        "user_hll",
        output_mode="append",
    )
    try:
        got = {
            (r["window_start"], r["bucket"]): r["rho"]
            for r in spark.table("user_hll").collect()
        }
        assert got, "no watermark-closed windows emitted"
        batch = spark.read.parquet(stream).select(
            F.date_trunc("hour", "ts").alias("window_start"), "user_id"
        )
        want = {
            (r["window_start"], r["bucket"]): r["rho"]
            for r in sketches.hll_registers(
                batch, ["window_start"], "user_id", p=4
            ).collect()
        }
        # Append mode emits only closed windows: every emitted register
        # must equal its batch twin exactly.
        for key, rho in got.items():
            assert want.get(key) == rho, f"register mismatch at {key}"
        # The estimate layer applies unchanged to the emitted registers.
        est = sketches.hll_estimate(
            spark.table("user_hll"), ["window_start"], p=4
        ).collect()
        assert all(r["estimate"] > 0 for r in est)
    finally:
        q.stop()


def test_windowed_user_cms_matches_batch_counters(spark, stream):
    """Closed streaming windows must carry identical CMS counters to the
    batch grouped sketch over the same rows."""
    from sakura_spark.functions import sketches

    q = ev.run_to_memory(
        ev.windowed_user_cms(
            ev.read_event_stream(spark, stream), window="1 hour", depth=3, width=32
        ),
        "user_cms",
        output_mode="append",
    )
    try:
        got = {
            (r["window_start"], r["row"], r["bucket"]): r["cnt"]
            for r in spark.table("user_cms").collect()
        }
        assert got, "no watermark-closed windows emitted"
        batch = spark.read.parquet(stream).select(
            F.date_trunc("hour", "ts").alias("window_start"), "user_id"
        )
        want = {
            (r["window_start"], r["row"], r["bucket"]): r["cnt"]
            for r in sketches.cms_sketch(
                batch, "user_id", depth=3, width=32, group_cols=["window_start"]
            ).collect()
        }
        for key, cnt in got.items():
            assert want.get(key) == cnt, f"counter mismatch at {key}"
    finally:
        q.stop()


def test_windowed_user_bloom_matches_batch_bits(spark, stream):
    """Closed streaming windows must carry exactly the batch Bloom set
    bits over the same rows — the membership twin of the HLL/CMS laws."""
    from sakura_spark.functions import sketches

    q = ev.run_to_memory(
        ev.windowed_user_bloom(
            ev.read_event_stream(spark, stream), window="1 hour", m=256, k=3
        ),
        "user_bloom",
        output_mode="append",
    )
    try:
        got = {
            (r["window_start"], r["bit"])
            for r in spark.table("user_bloom").collect()
        }
        assert got, "no watermark-closed windows emitted"
        batch = spark.read.parquet(stream).select(
            F.date_trunc("hour", "ts").alias("window_start"), "user_id"
        )
        want = {
            (r["window_start"], r["bit"])
            for r in sketches.bloom_sketch(
                batch, "user_id", m=256, k=3, group_cols=["window_start"]
            ).collect()
        }
        emitted_windows = {w for w, _ in got}
        # Append mode emits only closed windows; within those windows the
        # bit sets must match exactly (both directions).
        assert got == {(w, b) for w, b in want if w in emitted_windows}
    finally:
        q.stop()


def test_windowed_user_kmv_matches_batch_sketch(spark, stream):
    """Closed streaming windows must carry bit-identical KMV bottom-k
    rows to batch kmv_sketch over the same rows — the set-resemblance
    twin completing the HLL/CMS/Bloom symmetry. Exercises the
    applyInPandasWithState path: bounded k-value state + event-time
    timeout emission."""
    from sakura_spark.functions import sketches

    kk = 16
    q = ev.run_to_memory(
        ev.windowed_user_kmv(
            ev.read_event_stream(spark, stream), window="1 hour", k=kk
        ),
        "user_kmv",
        output_mode="append",
    )
    try:
        got = {
            (r["window_start"], r["rank"]): r["hval"]
            for r in spark.table("user_kmv").collect()
        }
        assert got, "no watermark-closed windows emitted"
        batch = spark.read.parquet(stream).select(
            F.date_trunc("hour", "ts").alias("window_start"), "user_id"
        )
        want = {
            (r["window_start"], r["rank"]): r["hval"]
            for r in sketches.kmv_sketch(
                batch, ["window_start"], "user_id", k=kk
            ).collect()
        }
        emitted_windows = {w for w, _ in got}
        # Exactly-once per closed window, and within an emitted window the
        # full (rank, hval) bottom-k must match batch bit-for-bit.
        assert got == {
            (w, rk): h for (w, rk), h in want.items() if w in emitted_windows
        }
        # The merge/estimate layers accept the emitted rows unchanged.
        est = sketches.kmv_estimate(
            spark.table("user_kmv").withColumnRenamed("window_start", "ws"),
            ["ws"],
            k=kk,
        ).collect()
        assert all(r["n_vals"] <= kk for r in est)
    finally:
        q.stop()


def test_session_window_gap_boundary(spark, tmp_path):
    """The session_window merge rule is INCLUSIVE at the gap: an event
    exactly `gap` after the previous one EXTENDS the session (a new
    session needs a STRICTLY larger gap) — the boundary the
    streaming_session_equiv oracle encodes with `>`."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, base, 7, "view", 0.0, "{}"),
        (2, base + dt.timedelta(minutes=30), 7, "view", 0.0, "{}"),       # == gap: merges
        (3, base + dt.timedelta(minutes=59), 7, "view", 0.0, "{}"),       # < gap: merges
        (4, base + dt.timedelta(minutes=89, seconds=0, microseconds=1), 7,
         "view", 0.0, "{}"),                                              # > gap: new session
    ]
    src = str(tmp_path / "sessboundary")
    spark.createDataFrame(rows, ev.EVENTS_SCHEMA).coalesce(1).write.parquet(src)
    q = ev.run_to_memory(
        ev.session_windows(ev.read_event_stream(spark, src), gap="30 minutes",
                           watermark="1 second"),
        "sess_boundary",
        output_mode="complete",
    )
    try:
        got = sorted(
            (r.session_start, r.n_events)
            for r in spark.table("sess_boundary").collect()
        )
        # events 1-3 chain into one session (each step <= gap); event 4
        # is 30m + 1us after event 3 -> strictly past the gap, new session.
        assert got == [
            (base, 3),
            (base + dt.timedelta(minutes=89, seconds=0, microseconds=1), 1),
        ]
    finally:
        q.stop()


def test_attributed_purchases_left_outer_batch_twin(spark):
    """how='left_outer' keeps unattributed views with NULL purchase
    columns and takes user_id from the VIEW side; bad how raises."""
    import datetime

    import pytest

    from sakura_spark.streaming import events as ev

    t0 = datetime.datetime(2024, 1, 1)

    def row(eid, minutes, uid, typ, val):
        return (eid, t0 + datetime.timedelta(minutes=minutes), uid, typ, val, "{}")

    df = spark.createDataFrame(
        [
            row(1, 0, 7, "view", 0.0),       # matched by purchase 30 min later
            row(2, 30, 7, "purchase", 9.0),
            row(3, 0, 8, "view", 0.0),       # unmatched: purchase 2h later
            row(4, 120, 8, "purchase", 5.0),
            row(5, 10, 9, "view", 0.0),      # unmatched: no purchase at all
        ],
        ev.EVENTS_SCHEMA,
    )
    out = ev.attributed_purchases(
        df.filter(df.event_type == "view"),
        df.filter(df.event_type == "purchase"),
        attribution_window="1 hour",
        how="left_outer",
    )
    rows = {r.view_id: (r.user_id, r.purchase_id) for r in out.collect()}
    assert rows == {1: (7, 2), 3: (8, None), 5: (9, None)}
    with pytest.raises(ValueError):
        ev.attributed_purchases(df, df, how="full")


def test_attributed_purchases_full_outer_batch_twin(spark):
    """how='full_outer' keeps unmatched rows from BOTH sides — an
    unattributed view null-pads the purchase columns, an unattributed
    purchase null-pads the view columns — and user_id is COALESCE of
    the two sides (exactly one is non-NULL on every outer row)."""
    import datetime

    from sakura_spark.streaming import events as ev

    t0 = datetime.datetime(2024, 1, 1)

    def row(eid, minutes, uid, typ, val):
        return (eid, t0 + datetime.timedelta(minutes=minutes), uid, typ, val, "{}")

    df = spark.createDataFrame(
        [
            row(1, 0, 7, "view", 0.0),       # matched pair
            row(2, 30, 7, "purchase", 9.0),
            row(3, 0, 8, "view", 0.0),       # unmatched view: purchase 2h later
            row(4, 120, 8, "purchase", 5.0),  # unmatched purchase (view too old)
            row(5, 10, 9, "view", 0.0),      # unmatched view: no purchase at all
            row(6, 40, 10, "purchase", 3.0),  # unmatched purchase: no view at all
        ],
        ev.EVENTS_SCHEMA,
    )
    out = ev.attributed_purchases(
        df.filter(df.event_type == "view"),
        df.filter(df.event_type == "purchase"),
        attribution_window="1 hour",
        how="full_outer",
    )
    rows = {(r.view_id, r.purchase_id): r.user_id for r in out.collect()}
    assert rows == {
        (1, 2): 7,
        (3, None): 8,
        (None, 4): 8,
        (5, None): 9,
        (None, 6): 10,
    }


def test_run_to_memory_concurrent_conf_restore(spark, stream):
    """Regression (round-13 session 2): concurrent run_to_memory callers
    raced the shared-session conf save/restore — a thread captured
    another's in-flight shuffle/no-data values as its restore state and
    wrote them back last, leaving noDataMicroBatches=false pinned
    session-wide. Every later append-mode stream then emitted NOTHING
    (no final watermark tick), failing six downstream tests whenever
    the registry plan lint (8-thread pool over all entry builders) ran
    earlier in the suite. run_to_memory now serializes the
    set → run → restore section; this drives four concurrent runs with
    conflicting knobs and asserts the session conf comes back exactly."""
    from concurrent.futures import ThreadPoolExecutor

    before = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.shuffle.partitions",
            "spark.sql.streaming.noDataMicroBatches.enabled",
        )
    }

    def one(i):
        q = ev.run_to_memory(
            ev.windowed_counts(ev.read_event_stream(spark, stream), window="1 hour"),
            f"conc_sink_{i}",
            output_mode="append",
            state_partitions=3 + i,
            no_data_batch=bool(i % 2),
        )
        try:
            return spark.table(f"conc_sink_{i}").count()
        finally:
            q.stop()

    with ThreadPoolExecutor(max_workers=4) as pool:
        counts = list(pool.map(one, range(4)))
    after = {k: spark.conf.get(k) for k in before}
    assert after == before, f"conf leaked: {after} != {before}"
    # no_data_batch=True runs must have closed windows (nonempty sinks).
    assert counts[1] > 0 and counts[3] > 0


def test_windowed_value_quantile_matches_batch_counters(spark, stream):
    """Closed streaming windows must carry identical dyadic-quantile
    counters to the batch dyadic_sketch over the same rows — the
    rank/percentile twin of the HLL/CMS/Bloom laws (round 13)."""
    from sakura_spark.functions import sketches

    q = ev.run_to_memory(
        ev.windowed_value_quantile(
            ev.read_event_stream(spark, stream),
            window="1 hour", levels=10, depth=2, width=16,
        ),
        "value_quantile",
        output_mode="append",
    )
    try:
        got = {
            (r["window_start"], r["level"], r["row"], r["bucket"]): r["cnt"]
            for r in spark.table("value_quantile").collect()
        }
        assert got, "no watermark-closed windows emitted"
        batch = spark.read.parquet(stream).select(
            F.date_trunc("hour", "ts").alias("window_start"),
            F.floor(F.col("value") * 100).cast("long").alias("cents"),
        )
        want = {
            (r["window_start"], r["level"], r["row"], r["bucket"]): r["cnt"]
            for r in sketches.dyadic_sketch(
                batch, "cents", levels=10, depth=2, width=16,
                group_cols=["window_start"],
            ).collect()
        }
        for key, cnt in got.items():
            assert want.get(key) == cnt, f"counter mismatch at {key}"
        # The rank layer applies unchanged to one window's counters.
        some_win = next(iter(got))[0]
        counters = {
            (lv, rw, b): c
            for (w, lv, rw, b), c in got.items() if w == some_win
        }
        n = sum(c for (lv, rw, b), c in counters.items() if lv == 0 and rw == 0)
        top_rank = sketches.dyadic_rank(counters, (1 << 10) - 1, 10, 2, 16)
        assert top_rank == n  # every value ranks below the domain max
    finally:
        q.stop()
