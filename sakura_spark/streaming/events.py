"""Streaming transformations for the events schema
(event_id, ts, user_id, event_type, value, props).

Each builder takes a streaming (or batch — the transformations are
identical, which is how the batch oracle queries validate them) DataFrame
and returns the transformed DataFrame; callers attach the sink. Watermarks
bound state so a 100 TB/day stream holds only the late-data horizon in the
state store; aggregations are keyed on (window, event_type)-style compound
keys that hash-partition evenly.
"""

from __future__ import annotations

import os
import threading
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_event_stream(spark, path: str, max_files_per_trigger: int = 1) -> DataFrame:
    """File-source stream over a parquet directory (swap for Kafka in prod:
    same downstream plan)."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def windowed_counts(
    events: DataFrame,
    window: str = "5 minutes",
    slide: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked tumbling/sliding window aggregation per event_type."""
    w = F.window("ts", window, slide) if slide else F.window("ts", window)
    return (
        events.withWatermark("ts", watermark)
        .groupBy(w.alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
            F.approx_count_distinct("user_id").alias("approx_users"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
            "approx_users",
        )
    )


def session_windows(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """Native session windows per user (gap-based), the streaming twin of
    the batch sessionize query."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sess"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )


def deduped_stream(
    events: DataFrame,
    watermark: str = "10 minutes",
    keys: tuple[str, ...] = ("event_id",),
) -> DataFrame:
    """Streaming exact dedup: emit each key once, dropping any duplicate
    that arrives within the watermark horizon (at-least-once upstream →
    effectively-once downstream). State holds one entry per key seen inside
    the horizon and is evicted by the watermark — bounded by arrival rate ×
    horizon, not by stream length. The streaming twin of dedup_exact."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )


def windowed_user_hll(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "30 minutes",
    p: int = 4,
) -> DataFrame:
    """Watermarked per-window distinct-user HLL registers: (window_start,
    window_end, bucket, rho) — the streaming twin of the batch
    sketch_hll_hourly_users entry, built from the SAME hll_exprs so a
    closed window's registers are bit-identical to the batch computation
    (asserted in tests/test_streaming.py).

    Scale shape: state per window is at most 2^p register rows (the MAX
    agg keeps one value per (window, bucket)), evicted by the watermark —
    the streaming state store holds registers, never user ids, so a
    100 TB/day stream carries kilobytes of distinct-count state per
    window. The float estimate layer (sketches.hll_estimate, grouped by
    window_start) applies unchanged to the emitted rows."""
    from sakura_spark.functions.sketches import hll_exprs

    bucket, rho = hll_exprs(F.col("user_id"), p=p)
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), bucket.alias("bucket"))
        .agg(F.max(rho).alias("rho"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "bucket",
            "rho",
        )
    )


def windowed_user_cms(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "30 minutes",
    depth: int = 4,
    width: int = 64,
) -> DataFrame:
    """Watermarked per-window count-min sketch of user activity:
    (window_start, window_end, row, bucket, cnt) — the streaming twin of
    the batch sketch_cms_hourly_users entry, built from the SAME
    cms_exprs so a closed window's counters are identical to the batch
    computation (asserted in tests/test_streaming.py). Downstream,
    sketches.cms_lookup answers "how active was user X in hour H"
    without the stream ever storing per-user counters.

    Scale shape: state per window is at most depth x width counter rows
    regardless of user cardinality — heavy-hitter state for an abuse
    monitor stays kilobytes per window at any stream volume."""
    from sakura_spark.functions.sketches import cms_exprs

    rows = cms_exprs(F.col("user_id"), depth=depth, width=width)
    return (
        events.withWatermark("ts", watermark)
        .select("ts", F.explode(rows).alias("rb"))
        .groupBy(
            F.window("ts", window).alias("win"),
            F.col("rb.row").alias("row"),
            F.col("rb.bucket").alias("bucket"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "row",
            "bucket",
            "cnt",
        )
    )


def windowed_value_quantile(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "30 minutes",
    levels: int = 16,
    depth: int = 2,
    width: int = 64,
) -> DataFrame:
    """Watermarked per-window DYADIC QUANTILE counters of the event value
    (cents-scaled): (window_start, window_end, level, row, bucket, cnt)
    — the streaming twin of the batch sketch_quantile_registers entry,
    completing the streaming sketch matrix (HLL/CMS/Bloom/KMV had
    windowed twins; rank/percentile state did not). Built from the SAME
    probe spelling (sketches.dyadic_probe_rows), so a closed window's
    counters are identical to a batch dyadic_sketch over that hour —
    sketches.dyadic_quantiles then answers "p95 purchase value in hour
    H" from kilobytes of counters without the stream ever storing raw
    values. Mergeability by SUM is the operational point: executor
    partials, late re-opens, and day-level rollups all combine without
    resorting.

    Scale shape: state per window is at most levels x depth x width
    counter rows regardless of value cardinality; the levels x depth
    row amplification happens BEFORE the window aggregation and
    combines map-side. Domain contract (dyadic_sketch's): the scaled
    value must be a non-negative integer < 2**levels."""
    from sakura_spark.functions.sketches import dyadic_probe_rows

    src = events.withWatermark("ts", watermark).select(
        "ts", F.floor(F.col("value") * 100).cast("long").alias("cents")
    )
    probes = dyadic_probe_rows(
        src, "cents", levels, depth, width, keep_cols=("ts",)
    )
    return (
        probes.groupBy(
            F.window("ts", window).alias("win"), "level", "row", "bucket"
        )
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "level",
            "row",
            "bucket",
            "cnt",
        )
    )


def windowed_user_bloom(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "30 minutes",
    m: int = 1024,
    k: int = 3,
) -> DataFrame:
    """Watermarked per-window Bloom filter of the active user set:
    (window_start, window_end, bit) — the streaming twin of the batch
    sketch_bloom_hourly_users entry, built from the SAME bloom_exprs so
    a closed window's set bits are identical to the batch computation
    (asserted in tests/test_streaming.py). Downstream,
    sketches.bloom_member_expr answers "was user X active in hour H"
    (no false negatives) from kilobytes of state — the membership
    counterpart of the HLL (cardinality) and CMS (frequency) twins.

    Scale shape: the dedup-to-bits aggregation keeps at most m rows of
    state per window regardless of user cardinality, evicted by the
    watermark; merging two streams' windows is the same distinct-union
    (bitwise OR)."""
    from sakura_spark.functions.sketches import bloom_exprs

    bits = F.array(*bloom_exprs(F.col("user_id"), m=m, k=k))
    return (
        events.withWatermark("ts", watermark)
        .select("ts", F.explode(bits).alias("bit"))
        .groupBy(F.window("ts", window).alias("win"), "bit")
        .agg(F.count(F.lit(1)).alias("__n"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "bit",
        )
    )


_KMV_STATE_SCHEMA = "hvals array<long>"
_KMV_OUT_SCHEMA = (
    "window_start timestamp, window_end timestamp, rank int, hval long"
)


def windowed_user_kmv(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "30 minutes",
    k: int = 32,
) -> DataFrame:
    """Watermarked per-window KMV bottom-k sketch of the distinct user
    set: (window_start, window_end, rank, hval) — the streaming twin of
    the batch sketches.kmv_sketch, completing the windowed-sketch
    symmetry (HLL = cardinality, CMS = frequency, Bloom = membership,
    KMV = cardinality + set resemblance: the emitted rows feed
    kmv_estimate / kmv_jaccard / kmv_merge unchanged).

    Unlike the other three twins, bottom-k is not expressible as a
    built-in streaming aggregate with BOUNDED state (collect_set would
    hold every distinct hash per window), so this is the custom stateful
    operator path: applyInPandasWithState keeps AT MOST k hash values
    per open window — new arrivals merge-and-trim against the stored
    bottom-k — and the window's final rows are emitted exactly once,
    when the event-time timeout fires as the watermark passes
    window_end (append semantics, matching the closed-window contract
    of the agg-based twins). The hash is the SAME JVM-side
    sketches.hash_word expression the batch sketch uses, applied BEFORE
    the Python boundary, so a closed window's (rank, hval) rows are
    bit-identical to kmv_sketch over the same rows (asserted in
    tests/test_streaming.py).

    Scale shape: state per window is k longs regardless of user
    cardinality; late rows are dropped by the watermark before the
    operator, and a timed-out window can never be resurrected (any
    surviving row's window_end exceeds the watermark that fired the
    timeout), so the once-per-window emission is exact."""
    from sakura_spark.functions.sketches import hash_word

    hv = hash_word(F.col("user_id"), "kmv", word=0)
    # `ts` rides along untouched: the event-time watermark tag lives on
    # it, and EventTimeTimeout requires a watermarked column to reach the
    # stateful operator (projecting only the window-struct fields strips
    # the tag and fails analysis).
    prepped = (
        events.withWatermark("ts", watermark)
        .select(F.window("ts", window).alias("win"), hv.alias("hval"), "ts")
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "hval",
            "ts",
        )
    )

    def update(key, pdf_iter: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        ws, we = key
        if state.hasTimedOut:
            (hvals,) = state.get
            state.remove()
            vals = sorted(hvals)
            yield pd.DataFrame(
                {
                    "window_start": [ws] * len(vals),
                    "window_end": [we] * len(vals),
                    "rank": list(range(1, len(vals) + 1)),
                    "hval": vals,
                }
            )
            return
        vals = set(state.get[0]) if state.exists else set()
        for pdf in pdf_iter:
            vals.update(int(h) for h in pdf["hval"])
            if len(vals) > k:
                vals = set(sorted(vals)[:k])
        state.update((sorted(vals),))
        # Fire once the watermark passes the window end. window_end is
        # always > any admitted row's ts >= the current watermark, but
        # guard anyway (setTimeoutTimestamp requires a future timestamp).
        we_ms = int(we.timestamp() * 1000)
        state.setTimeoutTimestamp(max(we_ms, state.getCurrentWatermarkMs() + 1))
        return

    return prepped.groupBy("window_start", "window_end").applyInPandasWithState(
        update,
        outputStructType=_KMV_OUT_SCHEMA,
        stateStructType=_KMV_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="EventTimeTimeout",
    )


def attributed_purchases(
    views: DataFrame,
    purchases: DataFrame,
    attribution_window: str = "1 hour",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream join with an event-time bound: each purchase joins
    the views by the same user within the preceding
    ``attribution_window`` — the candidate set for touch attribution.

    Both inputs are watermarked and the join condition carries the time
    range, so Spark derives state-eviction bounds for BOTH sides: each
    stream's join state holds only watermark + window horizons of rows
    (the unbounded-state trap of an unconstrained stream-stream join is
    structurally avoided). The join keys hash-partition by user, so a
    100 TB/day stream spreads evenly; per-user state is a handful of rows.
    The same function applied to batch DataFrames produces the identical
    plan modulo state — which is how the pytest batch-equivalence oracle
    validates it.

    ``how='left_outer'`` keeps unattributed views: the hard streaming
    case, because a null-padded row can only be emitted once the view's
    state EVICTS (the watermark must pass view_ts + window + delay before
    Spark can prove no matching purchase will ever arrive) — so outer
    results are inherently delayed by the horizon, and a harness that
    wants them all must push the final watermark past every view's bound
    (the sentinel-file discipline of q_streaming_kmv_equiv). The output
    user_id comes from the VIEW side under left_outer (the purchase side
    is NULL on exactly the rows the outer join exists to keep).

    ``how='full_outer'`` additionally keeps unmatched PURCHASES (a
    purchase with no same-user view in the preceding hour — the
    bidirectional-attribution case): BOTH sides' unmatched rows emit at
    their own side's state eviction, so the two horizons run
    independently — an unmatched view null-pads once the watermark
    passes view_ts + window + delay, an unmatched purchase once it
    passes purchase_ts + delay (the purchase side's range condition
    derives the earlier bound). The output user_id is
    COALESCE(view, purchase) — exactly one side is non-NULL on every
    outer row."""
    if how not in ("inner", "left_outer", "full_outer"):
        raise ValueError("how must be 'inner', 'left_outer' or 'full_outer'")
    v = views.select(
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("view_ts"),
        F.col("event_id").alias("view_id"),
    )
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
        F.col("value"),
    )
    if views.isStreaming:
        v = v.withWatermark("view_ts", watermark)
    if purchases.isStreaming:
        p = p.withWatermark("purchase_ts", watermark)
    user = {
        "inner": F.col("p_user"),
        "left_outer": F.col("v_user"),
        "full_outer": F.coalesce(F.col("v_user"), F.col("p_user")),
    }[how]
    return v.join(
        p,
        (F.col("v_user") == F.col("p_user"))
        & (F.col("view_ts") <= F.col("purchase_ts"))
        & (
            F.col("view_ts")
            >= F.col("purchase_ts") - F.expr(f"INTERVAL {attribution_window}")
        ),
        how,
    ).select(
        user.alias("user_id"),
        "purchase_id",
        "purchase_ts",
        "view_id",
        "view_ts",
        "value",
    )


# --- custom stateful operator ----------------------------------------------

_STATE_SCHEMA = "count long, total double"
_OUT_SCHEMA = "user_id long, n_events long, total double, mean double"


def _running_stats(key, pdf_iter: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
    """Per-user running count/sum/mean with explicit state — the
    applyInPandasWithState template for operators Spark lacks natively."""
    (user_id,) = key
    if state.exists:
        count, total = state.get
    else:
        count, total = 0, 0.0
    for pdf in pdf_iter:
        count += len(pdf)
        total += float(pdf["value"].sum())
    state.update((count, total))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [count], "total": [total], "mean": [total / count if count else 0.0]}
    )


def running_user_stats(events: DataFrame) -> DataFrame:
    """Custom stateful aggregation: exact running stats per user across
    micro-batches (update mode)."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _running_stats,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf="NoTimeout",
        )
    )


_EPOCH_STATE_SCHEMA = "start_us long, last_us long, n long, cents long"
_EPOCH_OUT_SCHEMA = (
    "user_id long, epoch_start timestamp, epoch_end timestamp, "
    "n_events long, total_cents long"
)


def user_epochs_with_timeout(
    events: DataFrame,
    horizon: str = "1 hour",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Per-user activity EPOCHS with event-time-timeout state GC — the
    stateful template completed: unlike running_user_stats (NoTimeout —
    state lives forever, the canonical stateful-pipeline leak at
    100 TB), every user's state here is evicted when the watermark
    passes last-seen + ``horizon``, and eviction IS the emission: a
    completed epoch (user_id, epoch_start, epoch_end, n_events,
    total_cents) appends exactly once, either when an in-batch gap
    > ``horizon`` splits the run or when the event-time timeout fires.

    The two split paths agree by construction: a timeout fires only
    when watermark > last_seen + horizon, and any later row for that
    user has ts >= watermark + delay > last_seen + horizon — i.e. the
    timeout only ever splits where the data-gap rule would have split
    anyway — so over a time-ordered stream the emitted epochs are
    exactly the batch gap-sessionization with the same (inclusive)
    horizon, which is what the streaming_timeout_equiv oracle hashes.
    The timeout is set to last+horizon+1ms so an exact-horizon gap
    (which MERGES under the inclusive rule) can never be pre-split by
    an equal watermark.

    CONTRACT — time-ordered stream per user across micro-batches: rows
    within one micro-batch are sorted here, but a row arriving in a
    LATER micro-batch with an event time earlier than state already
    carried cannot retroactively move a split decision (gap breaks are
    scanned against the carried last_us). The carried epoch's BOUNDS
    are still correct for such stragglers (min/max merge below), but
    split positions assume per-user cross-batch time order — the same
    assumption the batch gap-sessionization oracle makes.

    Scale shape: state per user is four longs (no row buffer — values
    are cents-scaled JVM-side before the Python boundary, so sums are
    exact integers); the state store holds only users active within the
    horizon, the bound NoTimeout lacks. Emission is append-mode and
    watermark-final: a GC'd epoch can never be resurrected."""
    hz_us = int(pd.Timedelta(horizon).value // 1000)
    prepped = events.withWatermark("ts", watermark).select(
        "user_id",
        "ts",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )

    def update(key, pdf_iter: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        (user,) = key

        def epoch_row(start_us, last_us, n, cents):
            return pd.DataFrame(
                {
                    "user_id": [user],
                    "epoch_start": [pd.to_datetime(start_us * 1000)],
                    "epoch_end": [pd.to_datetime(last_us * 1000)],
                    "n_events": [n],
                    "total_cents": [cents],
                }
            )

        if state.hasTimedOut:
            start_us, last_us, n, cents = state.get
            state.remove()
            yield epoch_row(start_us, last_us, n, cents)
            return
        cur = list(state.get) if state.exists else None
        # One group's batch rows may arrive as several Arrow chunks, and
        # only per-chunk order is meaningful — concat and sort ONCE so
        # the gap scan sees the group's true event-time order.
        pdfs = [p for p in pdf_iter if len(p)]
        if pdfs:
            pdf = pd.concat(pdfs).sort_values("ts") if len(pdfs) > 1 else pdfs[0].sort_values("ts")
            ts = (pdf["ts"].astype("int64") // 1000).to_numpy()
            cents = pdf["cents"].to_numpy()
            # Vectorized gap split: a row opens a new epoch when its gap
            # from the previous row (or from the carried state's last_ts
            # for the first row) exceeds the horizon; every epoch but the
            # last is final. Per-epoch aggregates come from the break
            # indices (counts by diff, sums by prefix-sum differences).
            brk = np.empty(len(ts), dtype=bool)
            brk[0] = cur is None or ts[0] - cur[1] > hz_us
            if len(ts) > 1:
                brk[1:] = (ts[1:] - ts[:-1]) > hz_us
            starts = np.flatnonzero(brk)
            if not brk[0]:
                starts = np.concatenate(([0], starts))
            ep_start = ts[starts]
            ep_last = np.append(ts[starts[1:] - 1], ts[-1])
            ep_n = np.append(np.diff(starts), len(ts) - starts[-1]).astype("int64")
            csum = np.concatenate(([0], np.cumsum(cents, dtype="int64")))
            ends = np.append(starts[1:], len(ts))
            ep_cents = csum[ends] - csum[starts]
            if not brk[0]:
                # First run continues the carried epoch. min/max (not
                # plain carry-over) keep the bounds correct even when a
                # watermark-admitted straggler precedes the carried
                # epoch_start or trails behind the carried last_us —
                # over a time-ordered stream (the contract the SPLIT
                # POSITIONS assume; see docstring) they reduce to the
                # plain assignment.
                ep_start[0] = min(cur[0], ep_start[0])
                ep_last[0] = max(cur[1], ep_last[0])
                ep_n[0] += cur[2]
                ep_cents[0] += cur[3]
            elif cur is not None:
                yield epoch_row(*cur)
            # Emit every completed epoch in one frame; carry the last.
            if len(ep_start) > 1:
                yield pd.DataFrame(
                    {
                        "user_id": user,
                        "epoch_start": pd.to_datetime(ep_start[:-1] * 1000),
                        "epoch_end": pd.to_datetime(ep_last[:-1] * 1000),
                        "n_events": ep_n[:-1],
                        "total_cents": ep_cents[:-1],
                    }
                )
            cur = [int(ep_start[-1]), int(ep_last[-1]), int(ep_n[-1]), int(ep_cents[-1])]
        if cur is None:
            return
        state.update(tuple(cur))
        # Fire strictly after last+horizon (the +1ms keeps an
        # exact-horizon gap mergeable); must exceed the current
        # watermark for setTimeoutTimestamp to accept it.
        fire_ms = (cur[1] + hz_us) // 1000 + 1
        state.setTimeoutTimestamp(max(fire_ms, state.getCurrentWatermarkMs() + 1))
        return

    return prepped.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=_EPOCH_OUT_SCHEMA,
        stateStructType=_EPOCH_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="EventTimeTimeout",
    )


# run_to_memory mutates SHARED SparkSession conf (shuffle partitions /
# no-data-batch) around each run with a save-then-restore. Session conf
# is one mutable object across every thread, so CONCURRENT callers race
# the capture: thread B reads thread A's in-flight values as its
# "restore" state and writes them back last, leaving the session with
# no_data_batch=False + state_partitions pinned AFTER both calls
# finished. Measured in the full pytest suite (the registry-wide plan
# lint runs 13 streaming entry builders on an 8-thread pool): the
# leaked pair silently emptied every later append-mode memory sink —
# windows never closed without the final watermark tick — failing six
# streaming tests two modules downstream. One lock around the
# conf-set → run → restore critical section makes the capture atomic;
# sequential callers (driver, bench, sweep) never contend.
_RUN_TO_MEMORY_LOCK = threading.Lock()


def run_to_memory(
    df: DataFrame,
    name: str,
    output_mode: str = "update",
    state_partitions: int | None = None,
    no_data_batch: bool = True,
):
    """Drive a streaming frame to completion against a memory sink (local
    smoke harness): returns the StreamingQuery after processing all
    available input.

    ``state_partitions`` and ``no_data_batch`` are HARNESS knobs, not
    operator semantics: each state-store partition pays a fixed
    setup/commit cost per micro-batch, so a bench-scale run with a
    handful of windows wants far fewer than the session-wide shuffle
    partition count (production keeps the cluster default — state
    partitioning is baked into the checkpoint at first batch, and these
    runs use fresh temp checkpoints). ``no_data_batch=False`` skips the
    trailing empty micro-batch availableNow otherwise runs; callers must
    only pass it when their emission logic provably doesn't rely on that
    final watermark tick (the sentinel-file harnesses — see
    q_streaming_kmv_equiv's watermark walk — are designed exactly so).
    Both confs are set before start() (query planning reads them there)
    and restored after the run so the shared session is untouched; the
    whole set → run → restore section holds _RUN_TO_MEMORY_LOCK so
    concurrent callers cannot interleave captures and restores (see the
    lock's comment for the measured six-test flake this fixes)."""
    with _RUN_TO_MEMORY_LOCK:
        return _run_to_memory_locked(
            df, name, output_mode, state_partitions, no_data_batch
        )


def _run_to_memory_locked(
    df: DataFrame,
    name: str,
    output_mode: str,
    state_partitions: int | None,
    no_data_batch: bool,
):
    spark = df.sparkSession
    restore: dict[str, str] = {}
    if state_partitions is not None:
        restore["spark.sql.shuffle.partitions"] = spark.conf.get(
            "spark.sql.shuffle.partitions"
        )
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    if not no_data_batch:
        restore["spark.sql.streaming.noDataMicroBatches.enabled"] = spark.conf.get(
            "spark.sql.streaming.noDataMicroBatches.enabled", "true"
        )
        spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    try:
        q = (
            df.writeStream.outputMode(output_mode)
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        q.processAllAvailable()
        # Emission barrier: processAllAvailable() returns once every batch
        # AVAILABLE AT CALL TIME is processed, but an availableNow query may
        # still owe its trailing no-data micro-batch (the final watermark
        # tick that closes append-mode windows) when it returns — reading
        # the memory sink in that gap sees watermark-closed output as
        # EMPTY on a loaded JVM. availableNow queries self-terminate after
        # that final batch commits, so awaiting termination is the
        # deterministic "all output is in the sink" signal.
        if not q.awaitTermination(300):
            raise RuntimeError(
                f"availableNow query '{name}' still active after 300s; "
                f"lastProgress={q.lastProgress}"
            )
        if os.environ.get("SAKURA_STREAM_DEBUG"):
            # Post-mortem line per run (diagnosing the empty-memory-sink
            # full-suite flake): batch count, final watermark, input rows
            # and the effective no-data-batch conf tell apart "no final
            # watermark tick" from "source listed nothing" from "sink
            # table lost".
            import sys as _sys

            progs = [p for p in (q.recentProgress or []) if p]
            last = progs[-1] if progs else {}
            try:
                sink_rows = spark.table(name).count()
            except Exception as exc:  # pragma: no cover - diagnostic only
                sink_rows = f"ERR:{exc}"
            total_in = sum(int(p.get("numInputRows") or 0) for p in progs)
            print(
                f"[stream-debug] {name}: sink_rows={sink_rows} "
                f"batches={len(progs)} last_batch={last.get('batchId')} "
                f"watermark={(last.get('eventTime') or {}).get('watermark')} "
                f"total_input_rows={total_in} "
                f"noData={spark.conf.get('spark.sql.streaming.noDataMicroBatches.enabled')} "
                f"shuffle={spark.conf.get('spark.sql.shuffle.partitions')}",
                file=_sys.stderr,
                flush=True,
            )
    finally:
        for k, v in restore.items():
            spark.conf.set(k, v)
    return q
