"""Structured Streaming over the ``events`` stream table.

The reference has no streaming surface (SURVEY.md §2.8) — this is the
driver-mandated net-new layer: file-source streams, watermarked windowed
aggregations, and a stateful sessionization operator via
``applyInPandasWithState``.

Scale notes: file-source streaming scales by partition discovery
(``maxFilesPerTrigger`` bounds batch size); the windowed aggregate is the
canonical watermark + tumbling-window shuffle; state store size is bounded
by the watermark horizon.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: physical schema of an events parquet (ts is TIMESTAMP(MICROS,
#: isAdjustedToUTC=false) → Spark TIMESTAMP_NTZ — see tanker_spark/testdata.py)
EVENTS_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.TimestampNTZType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("props", T.StringType()),
])


def ns_to_ts(col):
    """epoch-nanos long → timestamp (exact integer µs, no double rounding)."""
    return F.timestamp_micros(
        F.floor(col.cast("decimal(38,0)") / F.lit(1000)).cast("long")
    )


def with_event_ts(df, col="ts", as_instant=False):
    """Add ``event_ts`` from ``col``, adapting to the column's actual
    dtype: timestamp(-NTZ) passes through; a long is treated as
    epoch-nanos (the shape older testdata generations used).

    ``as_instant=True`` yields TimestampType (required by watermarks,
    which reject NTZ) — the NTZ wall-clock is interpreted in the session
    timezone (UTC per get_spark), preserving the instant."""
    dtype = df.schema[col].dataType
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        ts = F.col(col)
    else:
        ts = ns_to_ts(F.col(col))
    if as_instant:
        ts = ts.cast(T.TimestampType())
    return df.withColumn("event_ts", ts)


def read_events_stream(spark, path, max_files_per_trigger=None):
    """File-source stream over a directory of events parquet files."""
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.parquet(path)
    return with_event_ts(df, as_instant=True)


def windowed_counts(stream_df, window="1 hour", slide=None,
                    watermark="2 hours"):
    """Watermarked tumbling (or sliding) window counts per event_type.

    Late rows beyond the watermark are dropped; state is bounded by the
    watermark horizon — the standard Spark streaming agg shape."""
    w = (F.window("event_ts", window, slide) if slide
         else F.window("event_ts", window))
    return (
        stream_df.withWatermark("event_ts", watermark)
        .groupBy(w.alias("win"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("total"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type", "n", "total",
        )
    )


# ---------------------------------------------------------------------------
# custom stateful operator: sessionization
# ---------------------------------------------------------------------------

SESSION_OUTPUT = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("session_start", T.TimestampType()),
    T.StructField("session_end", T.TimestampType()),
    T.StructField("n_events", T.LongType()),
])

SESSION_STATE = T.StructType([
    T.StructField("start_us", T.LongType()),
    T.StructField("last_us", T.LongType()),
    T.StructField("n", T.LongType()),
])

SESSION_GAP_S = 30 * 60


def _sessionize(key, pdfs, state: GroupState):
    """Emit closed sessions (gap > SESSION_GAP_S) per user.

    Runs as an Arrow-batched stateful UDF (applyInPandasWithState) — the
    one place Python is required, since Spark lacks a built-in
    session-window *with custom emission*; built-in
    ``F.session_window`` covers the plain case."""
    import pandas as pd

    (user_id,) = key
    rows = []
    if state.hasTimedOut:
        if state.exists:
            start_us, last_us, n = state.get
            rows.append((user_id, start_us, last_us, n))
            state.remove()
    else:
        ts_list = []
        for pdf in pdfs:
            ts_list.extend(
                int(v.value) // 1000 for v in pd.to_datetime(pdf["event_ts"])
            )
        ts_list.sort()
        if state.exists:
            start_us, last_us, n = state.get
        else:
            start_us = last_us = None
            n = 0
        for us in ts_list:
            if last_us is not None and us - last_us > SESSION_GAP_S * 1e6:
                rows.append((user_id, start_us, last_us, n))
                start_us, last_us, n = us, None, 0
            if start_us is None:
                start_us = us
            else:
                # a LATE event (within the watermark) may predate the
                # open session's bounds: extend backwards instead of
                # regressing last_us (which inverted start/end and
                # split sessions on the next on-time event)
                start_us = min(start_us, us)
            last_us = us if last_us is None else max(last_us, us)
            n += 1
        state.update((start_us, last_us, n))
        state.setTimeoutDuration(SESSION_GAP_S * 1000)
    out = pd.DataFrame(
        rows, columns=["user_id", "start_us", "last_us", "n"]
    )
    if len(out):
        out["session_start"] = pd.to_datetime(out.pop("start_us"), unit="us")
        out["session_end"] = pd.to_datetime(out.pop("last_us"), unit="us")
        out = out.rename(columns={"n": "n_events"})[
            ["user_id", "session_start", "session_end", "n_events"]
        ]
    else:
        out = pd.DataFrame(
            columns=["user_id", "session_start", "session_end", "n_events"]
        )
    yield out


def sessionize(stream_df):
    """Custom stateful sessionization: 30-min-gap sessions per user."""
    return (
        stream_df.withWatermark("event_ts", "2 hours")
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize,
            outputStructType=SESSION_OUTPUT,
            stateStructType=SESSION_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


def session_windows_batch(df, gap="30 minutes"):
    """Batch twin using the built-in session_window (for oracle checks)."""
    return (
        df.groupBy(
            F.session_window("event_ts", gap).alias("win"), F.col("user_id")
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "n_events",
        )
    )


def run_to_memory(stream_query_df, name="events_agg", timeout=120,
                  output_mode="append"):
    """Run a streaming DataFrame to completion (availableNow) into an
    in-memory sink; returns the result as a batch DataFrame.

    ``append`` only emits watermark-finalized windows; use ``complete``
    to see every window of a bounded replay."""
    spark = stream_query_df.sparkSession
    q = (
        stream_query_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout)
    return spark.table(name)


def enrich_stream(stream_df, dim_df, on, how="left"):
    """Stream-static enrichment join: every micro-batch joins against
    the static dimension frame. With a broadcast hint the dim ships to
    executors once per batch and the stream side never shuffles — the
    standard shape for attaching user/account attributes to an event
    stream. ``dim_df`` is a plain batch DataFrame (re-read per batch if
    backed by a mutable table, so slowly-changing dims stay current)."""
    return stream_df.join(F.broadcast(dim_df), on, how)


def interval_join(left, right, key="user_id", ts_col="event_ts",
                  within="30 minutes", watermark="2 hours"):
    """Watermarked stream-stream interval join: pair each left event
    with right events of the same ``key`` whose timestamp falls in
    ``[left.ts, left.ts + within]`` — the clicks-after-views /
    conversion-attribution shape.

    Both sides carry watermarks and the join condition is time-bounded
    in BOTH directions, so Spark can evict state: each side buffers at
    most ``watermark + within`` of history per key. Without the time
    bound the state store would grow forever — that is the scale
    constraint this wrapper enforces."""
    lw = left.withWatermark(ts_col, watermark)
    rw = right.withWatermark(ts_col, watermark)
    lcols = [F.col(c).alias("l_" + c) for c in lw.columns]
    rcols = [F.col(c).alias("r_" + c) for c in rw.columns]
    lw, rw = lw.select(*lcols), rw.select(*rcols)
    cond = (
        (F.col("l_" + key) == F.col("r_" + key))
        & (F.col("r_" + ts_col) >= F.col("l_" + ts_col))
        & (
            F.col("r_" + ts_col)
            <= F.col("l_" + ts_col) + F.expr("INTERVAL " + within)
        )
    )
    return lw.join(rw, cond, "inner")


def funnel_batch(df, first_type, then_type, within="30 minutes",
                 key="user_id", ts_col="event_ts",
                 type_col="event_type", event_id_col="event_id"):
    """Batch twin of the streaming interval join, shaped as a funnel:
    per ``key``, how many ``first_type`` events were followed by a
    ``then_type`` event within ``within``. One equi-join on the key
    (the range predicate rides along as a post-join filter on the
    matched pairs), one aggregate — both shuffles on ``key``."""
    a = df.filter(F.col(type_col) == first_type).select(
        F.col(key).alias("__k"), F.col(ts_col).alias("__ta"),
        F.col(event_id_col).alias("__ida"),
    )
    b = df.filter(F.col(type_col) == then_type).select(
        F.col(key).alias("__k"), F.col(ts_col).alias("__tb"),
    )
    pairs = a.join(b, "__k").filter(
        (F.col("__tb") >= F.col("__ta"))
        & (F.col("__tb") <= F.col("__ta") + F.expr("INTERVAL " + within))
    )
    # a first-event converts if ANY then-event landed in its window
    conv = pairs.select("__k", "__ida").distinct()
    return (
        a.groupBy("__k").agg(F.count(F.lit(1)).alias("n_first"))
        .join(
            conv.groupBy("__k").agg(
                F.count(F.lit(1)).alias("n_converted")
            ),
            "__k", "left",
        )
        .select(
            F.col("__k").alias(key),
            "n_first",
            F.coalesce("n_converted", F.lit(0)).alias("n_converted"),
        )
    )


_INTERVAL_UNITS = {
    "second": 1, "seconds": 1, "minute": 60, "minutes": 60,
    "hour": 3600, "hours": 3600, "day": 86400, "days": 86400,
}


def _interval_seconds(text):
    """'30 minutes' → 1800 (the simple '<n> <unit>' grammar the
    streaming wrappers accept)."""
    n, unit = text.strip().split()
    return int(n) * _INTERVAL_UNITS[unit.lower()]


FUNNEL_STATE = T.StructType([
    T.StructField("firsts", T.ArrayType(T.LongType())),
    T.StructField("thens", T.ArrayType(T.LongType())),
])


def _funnel_resolver(within_ms, ts_col, type_col, first_type,
                     then_type, key_col, idle_pad_ms):
    """Stateful per-key resolver for :func:`funnel_stream`."""
    import pandas as pd

    def resolve(key, pdfs, state: GroupState):
        (k,) = key
        wm = state.getCurrentWatermarkMs()
        if state.exists:
            firsts, thens = [list(x) for x in state.get]
        else:
            firsts, thens = [], []
        if not state.hasTimedOut:
            for pdf in pdfs:
                ms = (pd.to_datetime(pdf[ts_col]).astype("int64")
                      // 10 ** 6)
                types = pdf[type_col]
                for t, ty in zip(ms, types):
                    t = int(t)
                    if ty == first_type:
                        # late firsts (window already closed) dropped:
                        # the same effectively-once choice the other
                        # twins make
                        if t >= wm:
                            firsts.append(t)
                    elif ty == then_type:
                        # a then at t converts firsts in [t-within, t];
                        # pending firsts all satisfy f + within > wm,
                        # so only thens ≥ wm - within can still matter
                        if t >= wm - within_ms:
                            thens.append(t)
        rows = []
        still = []
        for f in sorted(firsts):
            if any(f <= t <= f + within_ms for t in thens):
                rows.append((k, f, True))
            elif wm > f + within_ms:
                rows.append((k, f, False))   # window closed unconverted
            else:
                still.append(f)
        thens = [t for t in thens if t >= wm - within_ms]
        if still:
            state.update((still, thens))
            state.setTimeoutTimestamp(
                max(min(f + within_ms for f in still) + 1, wm + 1)
            )
        elif thens:
            # no pending firsts; keep recent thens for late firsts
            # until the watermark ages them out
            state.update(([], thens))
            state.setTimeoutTimestamp(wm + within_ms + idle_pad_ms)
        elif state.exists:
            state.remove()
        out = pd.DataFrame(
            rows, columns=[key_col, "first_ts", "converted"])
        out["first_ts"] = pd.to_datetime(out["first_ts"], unit="ms")
        yield out

    return resolve


def funnel_stream(stream_df, first_type, then_type,
                  within="30 minutes", key="user_id",
                  ts_col="event_ts", type_col="event_type",
                  watermark="2 hours"):
    """Streaming twin of :func:`funnel_batch`: per ``key``, every
    ``first_type`` event resolves to ONE appended row
    ``(key, first_ts, converted)`` — ``converted=true`` as soon as a
    ``then_type`` event lands inside ``[first_ts, first_ts+within]``,
    ``converted=false`` once the event-time watermark passes the
    window's end (EventTimeTimeout). Aggregating the rows
    (count / count_if) reproduces ``funnel_batch``'s
    n_first/n_converted minus only the still-open tail — pinned by
    streaming_test with conversions spanning micro-batch boundaries.

    Lowering: the stream is filtered to the two event types BEFORE the
    shuffle, then ``applyInPandasWithState`` keyed by ``key``. State
    per key = pending first-timestamps (each lives ≤ ``within`` past
    the watermark) + then-timestamps ≥ watermark − ``within`` (older
    ones can no longer convert any admissible first) — bounded by the
    key's event rate × (watermark + within), independent of stream
    length. Late firsts for closed windows are dropped, the same
    effectively-once choice the other twins make."""
    within_ms = _interval_seconds(within) * 1000
    key_t = stream_df.schema[key].dataType
    out_schema = T.StructType([
        T.StructField(key, key_t),
        T.StructField("first_ts", T.TimestampNTZType()),
        T.StructField("converted", T.BooleanType()),
    ])
    return (
        stream_df.filter(
            F.col(type_col).isin([first_type, then_type])
        )
        .withWatermark(ts_col, watermark)
        .groupBy(key)
        .applyInPandasWithState(
            _funnel_resolver(within_ms, ts_col, type_col, first_type,
                             then_type, key, 60_000),
            outputStructType=out_schema,
            stateStructType=FUNNEL_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def dedup_stream(stream_df, key_cols=("event_id",), ts_col="event_ts",
                 watermark="2 hours"):
    """Streaming exact dedup: drop rows whose key was already seen
    within the watermark horizon (``dropDuplicatesWithinWatermark``),
    so the dedup state store stays bounded — the at-least-once →
    effectively-once ingest step in front of the windowed aggregates."""
    return stream_df.withWatermark(ts_col, watermark) \
        .dropDuplicatesWithinWatermark(list(key_cols))


def hourly_anomalies(df, ts_col="ts", type_col="event_type",
                     lookback=24, z_thresh=2.0, dense=False):
    """Volume-anomaly screen over an event table: hourly counts per
    type, rolling mean/stddev over the preceding ``lookback`` CLOCK
    hours (RANGE window on the epoch hour, current hour excluded), flag
    hours whose z-score exceeds ``z_thresh`` — the monitoring query
    every event pipeline runs.

    RANGE (not ROWS): a type active only a few hours per day would
    otherwise baseline against the last N *observed* hours — several
    days back — instead of the true trailing window. By default hours
    with zero events produce no row at all, so they neither enter the
    baseline nor can be flagged; ``dense=True`` fills each type's
    [first, last] activity span with zero-count hours (one sequence +
    explode over the per-type min/max hour — |types| driver-free
    rows → span-length grid), so drop-to-zero hours ARE flagged and
    quiet hours pull the baseline down.

    One aggregate shuffles on (type, hour) — partial agg map-side, so
    shuffle volume is bounded by the type×hour cardinality, not the
    event count; the window sort then runs per type on that tiny
    frame. Hours with fewer than 2 prior points or zero variance are
    skipped (no z-score exists)."""
    from pyspark.sql import Window

    hourly = df.groupBy(
        F.col(type_col).alias("event_type"),
        F.date_trunc("hour", F.col(ts_col)).alias("hour"),
    ).agg(F.count(F.lit(1)).alias("n"))
    hourly = hourly.withColumn(
        "__h", (F.unix_timestamp(
            F.col("hour").cast("timestamp")) / 3600).cast("long")
    )
    if dense:
        grid = (
            hourly.groupBy("event_type")
            .agg(F.min("__h").alias("__lo"), F.max("__h").alias("__hi"))
            .select(
                "event_type",
                F.explode(
                    F.sequence(F.col("__lo"), F.col("__hi"))
                ).alias("__h"),
            )
        )
        hourly = (
            grid.join(hourly, ["event_type", "__h"], "left")
            .select(
                "event_type",
                F.coalesce(
                    F.col("hour"),
                    F.timestamp_seconds(F.col("__h") * 3600)
                    .cast("timestamp_ntz"),
                ).alias("hour"),
                F.coalesce(F.col("n"), F.lit(0)).alias("n"),
                "__h",
            )
        )
    w = (
        Window.partitionBy("event_type").orderBy("__h")
        .rangeBetween(-lookback, -1)
    )
    scored = hourly.select(
        "event_type", "hour", "n",
        F.avg("n").over(w).alias("mu"),
        F.stddev("n").over(w).alias("sd"),
    )
    # threshold on the UNROUNDED z (rounding only in the projection):
    # thresholding the rounded value would flip rows whose true |z|
    # sits within half an ulp-of-rounding below the cutoff. A spike
    # over a PERFECTLY constant baseline has sd = 0 and no finite z —
    # still an anomaly (the worst kind); flagged with z = NULL.
    z_raw = (F.col("n") - F.col("mu")) / F.col("sd")
    flagged = (
        ((F.col("sd") > 0) & (F.abs(z_raw) >= z_thresh))
        | ((F.col("sd") == 0) & (F.col("n") != F.col("mu")))
    )
    return scored.filter(flagged).select(
        "event_type", "hour", "n",
        F.when(F.col("sd") > 0, F.round(z_raw, 4)).alias("z"),
    )


ANOMALY_OUTPUT = T.StructType([
    T.StructField("event_type", T.StringType()),
    T.StructField("hour", T.TimestampType()),
    T.StructField("n", T.LongType()),
    T.StructField("z", T.DoubleType()),
])

ANOMALY_STATE = T.StructType([
    T.StructField("frontier", T.LongType()),
    T.StructField("hours", T.ArrayType(T.LongType())),
    T.StructField("counts", T.ArrayType(T.LongType())),
    T.StructField("flushed", T.BooleanType()),
])


def _hourly_anomaly_scorer(lookback, z_thresh, ts_col,
                           idle_timeout_seconds):
    """Stateful per-type scorer for :func:`hourly_anomalies_stream` —
    replicates the batch flag rule exactly (sample stddev over the
    observed hours in the trailing ``lookback`` clock hours; sd>0 →
    |z| cut, sd=0 with a changed count → NULL-z flag, <2 baseline
    points → skip).

    Event-time timeouts close the FRONTIER hour once the watermark
    passes its end (a type that stops producing used to leave its last
    hour unscored forever — round-5 ADVICE), marking it ``flushed`` so
    the trailing baseline survives a later resume; a second timeout
    ``idle_timeout_seconds`` after the flush expires the key's state
    entirely."""
    import math

    import pandas as pd

    def score(key, pdfs, state: GroupState):
        (etype,) = key
        rows = []

        def score_hour(h, hc):
            base = [c for p, c in hc.items()
                    if h - lookback <= p <= h - 1]
            n = hc[h]
            if len(base) >= 2:
                mu = sum(base) / len(base)
                sd = math.sqrt(
                    sum((x - mu) ** 2 for x in base)
                    / (len(base) - 1)
                )
                if sd > 0:
                    z = (n - mu) / sd
                    if abs(z) >= z_thresh:
                        rows.append((etype, h, n, round(z, 4)))
                elif n != mu:
                    rows.append((etype, h, n, None))

        wm = state.getCurrentWatermarkMs()
        if state.hasTimedOut:
            frontier, hours, counts, flushed = state.get
            if flushed:
                state.remove()  # idle TTL expired: key went quiet
            else:
                score_hour(frontier, dict(zip(hours, counts)))
                state.update((frontier, hours, counts, True))
                state.setTimeoutTimestamp(
                    wm + idle_timeout_seconds * 1000)
        else:
            if state.exists:
                frontier, hours, counts, flushed = state.get
                hc = dict(zip(hours, counts))
            else:
                frontier, hc, flushed = None, {}, False
            for pdf in pdfs:
                hs = (pd.to_datetime(pdf[ts_col]).astype("int64")
                      // (3600 * 10 ** 9))
                for h, c in hs.value_counts().items():
                    h = int(h)
                    if frontier is not None and (
                            h < frontier
                            or (flushed and h == frontier)):
                        continue  # late past closure: dropped (the same
                        # effectively-once choice a watermark makes)
                    hc[h] = hc.get(h, 0) + int(c)
            if hc and max(hc) != frontier:
                mx = max(hc)
                if frontier is None:
                    lo = min(hc)
                elif flushed:
                    lo = frontier + 1  # frontier already scored
                else:
                    lo = frontier
                for h in sorted(x for x in hc if lo <= x < mx):
                    score_hour(h, hc)
                frontier, flushed = mx, False
                hc = {p: hc[p] for p in hc if p >= mx - lookback}
            if frontier is not None:
                keep = sorted(hc)
                counts = [hc[p] for p in keep]
                close_ms = (frontier + 1) * 3600 * 1000
                if not flushed and close_ms <= wm:
                    # the open hour is already unreachable by any
                    # non-late event (setTimeoutTimestamp rejects a
                    # timestamp <= watermark): flush it now
                    score_hour(frontier, hc)
                    flushed = True
                state.update((frontier, keep, counts, flushed))
                state.setTimeoutTimestamp(
                    wm + idle_timeout_seconds * 1000 if flushed
                    else close_ms)
        out = pd.DataFrame(
            rows, columns=["event_type", "hour", "n", "z"])
        if len(out):
            out["hour"] = pd.to_datetime(out["hour"] * 3600, unit="s")
        else:
            out["hour"] = pd.to_datetime(out["hour"])
        yield out

    return score


def hourly_anomalies_stream(stream_df, lookback=24, z_thresh=2.0,
                            watermark="2 hours", ts_col="event_ts",
                            type_col="event_type",
                            idle_timeout_seconds=24 * 3600):
    """Streaming twin of :func:`hourly_anomalies`: the same z-score
    gate, emitted continuously as hours CLOSE.

    Lowering: watermarked ``applyInPandasWithState`` keyed by event
    type. State per type is the (hour → count) map of the trailing
    ``lookback`` clock hours plus the still-open frontier hour —
    bounded at ``lookback + 1`` entries per type, the streaming
    equivalent of the batch RANGE window. An hour closes for a type
    when a LATER event of that type arrives OR when the event-time
    watermark passes its end (EventTimeTimeout — so a type that stops
    producing still gets its last hour scored; round-5 ADVICE). On
    close it is scored against the observed hours in its trailing
    window and emitted iff anomalous — so on an in-order replay the
    emitted set equals the batch operator's output minus any frontier
    hour the watermark never passed (pinned by streaming_test). Late
    events inside the open hour still count; late events for a closed
    hour are dropped, the same effectively-once choice
    ``dropDuplicatesWithinWatermark`` makes. State for a type idle
    ``idle_timeout_seconds`` of event time past its flush is expired.

    Scale: state is O(types × lookback) longs — independent of event
    volume and expired for dead keys; the only shuffle is the groupBy
    on type."""
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(type_col)
        .applyInPandasWithState(
            _hourly_anomaly_scorer(lookback, z_thresh, ts_col,
                                   idle_timeout_seconds),
            outputStructType=ANOMALY_OUTPUT,
            stateStructType=ANOMALY_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def event_transitions(df, ts_col="ts", user_col="user_id",
                      type_col="event_type", id_col="event_id"):
    """Per-user event-type transition counts (the Markov matrix of the
    event stream): for each user's time-ordered sequence, count
    (previous type → type) pairs — the input to funnel discovery and
    next-event models.

    One window (lag over the per-user order, ``id_col`` as the
    deterministic tie-break within equal timestamps) + one aggregate on
    the tiny type×type key space. The window sort shuffles once on
    user_id — same key as sessionize, so a pipeline computing both
    reuses the partitioning."""
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col), F.col(id_col)
    )
    seq = df.select(
        F.col(user_col),
        F.lag(type_col).over(w).alias("from_type"),
        F.col(type_col).alias("to_type"),
    ).filter(F.col("from_type").isNotNull())
    return seq.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n")
    )


TRANSITIONS_STATE = T.StructType([
    T.StructField("ts", T.ArrayType(T.LongType())),
    T.StructField("ids", T.ArrayType(T.LongType())),
    T.StructField("types", T.ArrayType(T.StringType())),
])


def _transitions_resolver(ts_col, type_col, id_col, key_col,
                          idle_expiry_ms):
    """Stateful per-key resolver for :func:`event_transitions_stream`."""
    import pandas as pd

    def resolve(key, pdfs, state: GroupState):
        (k,) = key
        wm = state.getCurrentWatermarkMs()
        if state.exists:
            buf = list(zip(*state.get))
        else:
            buf = []
        if not state.hasTimedOut:
            for pdf in pdfs:
                ms = (pd.to_datetime(pdf[ts_col]).astype("int64")
                      // 10 ** 6)
                for t, i, ty in zip(ms, pdf[id_col], pdf[type_col]):
                    buf.append((int(t), int(i), str(ty)))
        buf.sort()
        # a pair (e_{j-1}, e_j) is FINAL once ts_j < wm: Spark drops
        # only rows with ts < watermark, so a later arrival can still
        # tie at ts == wm and sort between an already-emitted pair —
        # strict < keeps those pairs pending until the watermark
        # passes them. buf[0] is the already-emitted frontier (final
        # under the PREVIOUS watermark), so pairs 1..f are exactly the
        # newly final ones — emitted once, never twice.
        f = -1
        for j, (t, _i, _ty) in enumerate(buf):
            if t < wm:
                f = j
        rows = [
            (k, buf[j - 1][2], buf[j][2], buf[j][0])
            for j in range(1, f + 1)
        ]
        buf = buf[max(f, 0):]
        if len(buf) > 1:
            # pending pairs: fire when the next one becomes final
            state.update(tuple(zip(*buf)))
            state.setTimeoutTimestamp(max(buf[1][0] + 1, wm + 1))
        elif buf and buf[0][0] + idle_expiry_ms > wm:
            # frontier only: keep it so the key's next event still
            # yields its edge, but expire idle keys eventually (the
            # documented trade: a key resuming after the expiry starts
            # a fresh chain and loses that one edge)
            state.update(tuple(zip(*buf)))
            state.setTimeoutTimestamp(buf[0][0] + idle_expiry_ms)
        elif state.exists:
            state.remove()
        out = pd.DataFrame(
            rows, columns=[key_col, "from_type", "to_type", "to_ts"]
        )
        out["to_ts"] = pd.to_datetime(out["to_ts"], unit="ms")
        yield out

    return resolve


def event_transitions_stream(stream_df, key="user_id",
                             ts_col="event_ts", type_col="event_type",
                             id_col="event_id", watermark="2 hours",
                             idle_expiry="7 days"):
    """Streaming twin of :func:`event_transitions`: appends one
    ``(key, from_type, to_type, to_ts)`` row per consecutive-event
    transition in each key's time-ordered sequence — aggregating with
    ``groupBy(from_type, to_type).count()`` reproduces the batch
    Markov matrix minus only the still-open tail (pairs whose later
    event the watermark hasn't passed yet).

    Ordering is exact WITHIN the watermark horizon, including events
    arriving out of order across micro-batches: a pair is emitted only
    once the watermark passes its later event, at which point no
    admissible arrival can land between them (same finality rule as
    the gapfill twin's frontier). State per key = the final frontier
    event plus events still above the watermark — bounded by the key's
    event rate × watermark, independent of stream length; idle keys'
    frontier state expires ``idle_expiry`` past their last event
    (EventTimeTimeout, the round-5 ADVICE rule) at the documented cost
    of one edge if the key later resumes."""
    key_t = stream_df.schema[key].dataType
    out_schema = T.StructType([
        T.StructField(key, key_t),
        T.StructField("from_type", T.StringType()),
        T.StructField("to_type", T.StringType()),
        T.StructField("to_ts", T.TimestampNTZType()),
    ])
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(key)
        .applyInPandasWithState(
            _transitions_resolver(
                ts_col, type_col, id_col, key,
                _interval_seconds(idle_expiry) * 1000,
            ),
            outputStructType=out_schema,
            stateStructType=TRANSITIONS_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def cohort_retention(df, ts_col="ts", user_col="user_id", max_offset=7):
    """Cohort retention matrix: users grouped by first-seen day, then
    for each day-offset 0..``max_offset`` the count of distinct users
    of that cohort active that day — the standard retention triangle.

    Shape: first-seen aggregate (shuffle on user), distinct active
    days (same key — co-partitioned join), final aggregate on the
    small (cohort, offset) key space. Nothing touches the driver."""
    firsts = df.groupBy(F.col(user_col).alias("user")).agg(
        F.min(F.to_date(F.col(ts_col))).alias("cohort_day")
    )
    active = df.select(
        F.col(user_col).alias("user"),
        F.to_date(F.col(ts_col)).alias("day"),
    ).distinct()
    return (
        active.join(firsts, "user")
        .withColumn("day_offset", F.datediff("day", "cohort_day"))
        .filter(F.col("day_offset") <= max_offset)
        .groupBy("cohort_day", "day_offset")
        .agg(F.count_distinct("user").alias("n_users"))
    )


def time_bucket_gapfill(df, ts_col="ts", group_col="event_type",
                        bucket_seconds=3600, fill=0,
                        value_agg=None):
    """Hypertable-style bucketed rollup with gap filling (the
    TimescaleDB ``time_bucket_gapfill`` shape): count (or aggregate)
    per (group, bucket), then fill every empty bucket between each
    group's first and last activity with ``fill`` — so downstream
    rolling windows see a DENSE regular series instead of silently
    skipping quiet periods.

    Lowering: one (group, bucket) aggregate (map-side combined, shuffle
    bounded by group×bucket cardinality, not event count), then a
    |groups|-row min/max aggregate exploded through ``sequence`` into
    the bucket grid — the grid is generated distributed, never on the
    driver — left-joined back. Same dense-grid trick as
    :func:`hourly_anomalies` ``dense=True``, exposed standalone.

    ``value_agg``: optional (colname, "sum"|"avg") aggregated alongside
    the count (gap rows get ``fill`` for it too)."""
    # floor, not cast-to-long: cast truncates toward zero, putting a
    # pre-1970 event one bucket too late (TimescaleDB time_bucket and
    # the DuckDB oracle both floor)
    b = F.floor(
        F.unix_timestamp(F.col(ts_col).cast("timestamp"))
        / bucket_seconds
    ).cast("long")
    aggs = [F.count(F.lit(1)).alias("n")]
    if value_agg is not None:
        vcol, how = value_agg
        fn = {"sum": F.sum, "avg": F.avg}[how]
        aggs.append(fn(F.col(vcol)).alias("v"))
    per = df.groupBy(
        F.col(group_col).alias("grp"), b.alias("__b")
    ).agg(*aggs)
    grid = (
        per.groupBy("grp")
        .agg(F.min("__b").alias("__lo"), F.max("__b").alias("__hi"))
        .select(
            "grp",
            F.explode(
                F.sequence(F.col("__lo"), F.col("__hi"))
            ).alias("__b"),
        )
    )
    out_cols = [
        F.col("grp").alias(group_col),
        F.timestamp_seconds(F.col("__b") * bucket_seconds)
        .cast("timestamp_ntz").alias("bucket"),
        F.coalesce(F.col("n"), F.lit(fill)).alias("n"),
    ]
    if value_agg is not None:
        out_cols.append(
            F.coalesce(F.col("v"), F.lit(fill)).alias("v"))
    return grid.join(per, ["grp", "__b"], "left").select(*out_cols)


GAPFILL_STATE = T.StructType([
    T.StructField("frontier", T.LongType()),
    T.StructField("n", T.LongType()),
    T.StructField("v", T.DoubleType()),
    T.StructField("flushed", T.BooleanType()),
])


def _gapfill_emitter(bucket_seconds, fill, ts_col, group_col, val_col,
                     how, idle_timeout_seconds):
    """Stateful per-group emitter for
    :func:`time_bucket_gapfill_stream` — replicates the batch
    fill/aggregate rule exactly for every CLOSED bucket.

    Event-time timeouts close the FRONTIER bucket once the watermark
    passes its end (a group that stops producing used to leave its last
    bucket unemitted forever — round-5 ADVICE). The flush keeps the
    frontier in state (``flushed`` marker) so a group that RESUMES
    still zero-fills the silent span, batch-identically; a second
    timeout ``idle_timeout_seconds`` after the flush expires the key's
    state entirely (a resume after THAT restarts the grid at the new
    first bucket, exactly like a fresh group)."""
    import pandas as pd

    bs_ms = bucket_seconds * 1000

    def emit(key, pdfs, state: GroupState):
        (grp,) = key
        rows = []

        def data_row(b, n, v):
            rows.append((grp, b, n, v if how == "sum" else v / n))

        wm = state.getCurrentWatermarkMs()
        if state.hasTimedOut:
            frontier, fn, fv, flushed = state.get
            if flushed:
                state.remove()  # idle TTL expired: group went quiet
            else:
                data_row(frontier, fn, fv)
                state.update((frontier, fn, fv, True))
                state.setTimeoutTimestamp(
                    wm + idle_timeout_seconds * 1000)
        else:
            if state.exists:
                frontier, fn, fv, flushed = state.get
            else:
                frontier, fn, fv, flushed = None, 0, 0.0, False
            acc = {}
            for pdf in pdfs:
                secs = (pd.to_datetime(pdf[ts_col]).astype("int64")
                        // 10 ** 9)
                sub = pd.DataFrame({"b": secs // bucket_seconds})
                sub["v"] = (pdf[val_col].astype(float).to_numpy()
                            if val_col else 0.0)
                for b, row in sub.groupby("b").agg(
                        n=("b", "size"), v=("v", "sum")).iterrows():
                    b = int(b)
                    if frontier is not None and (
                            b < frontier
                            or (flushed and b == frontier)):
                        continue  # late past closure: dropped, the same
                        # effectively-once choice the anomaly twin makes
                    e = acc.setdefault(b, [0, 0.0])
                    e[0] += int(row["n"])
                    e[1] += float(row["v"])
            if acc:
                mx = max(acc)
                if frontier is None:
                    frontier = min(acc)
                if flushed:
                    start = frontier + 1  # frontier already emitted
                else:
                    e = acc.setdefault(frontier, [0, 0.0])
                    e[0] += fn
                    e[1] += fv
                    start = frontier
                for b in range(start, mx):
                    n, v = acc.get(b, (0, 0.0))
                    if n:
                        data_row(b, n, v)
                    else:
                        rows.append((grp, b, fill, float(fill)))
                frontier, fn, fv, flushed = (
                    mx, acc[mx][0], acc[mx][1], False)
            if frontier is not None:
                close_ms = (frontier + 1) * bs_ms
                if not flushed and close_ms <= wm:
                    # the open bucket is already unreachable by any
                    # non-late event (setTimeoutTimestamp rejects a
                    # timestamp <= watermark): flush it now
                    data_row(frontier, fn, fv)
                    flushed = True
                state.update((frontier, fn, fv, flushed))
                state.setTimeoutTimestamp(
                    wm + idle_timeout_seconds * 1000 if flushed
                    else close_ms)
        cols = [group_col, "bucket", "n", "v"]
        out = pd.DataFrame(rows, columns=cols)
        if len(out):
            out["bucket"] = pd.to_datetime(
                out["bucket"] * bucket_seconds, unit="s")
        else:
            out["bucket"] = pd.to_datetime(out["bucket"])
        if val_col is None:
            out = out.drop(columns=["v"])
        yield out

    return emit


def time_bucket_gapfill_stream(stream_df, ts_col="event_ts",
                               group_col="event_type",
                               bucket_seconds=3600, fill=0,
                               value_agg=None, watermark="2 hours",
                               idle_timeout_seconds=24 * 3600):
    """Streaming twin of :func:`time_bucket_gapfill`: the dense
    gap-filled series, emitted continuously as buckets CLOSE.

    Lowering: watermarked ``applyInPandasWithState`` keyed by the
    group. State per group is (frontier bucket, its running
    count/value, flushed flag) — FOUR scalars, independent of event
    volume and of gap length. A bucket closes for a group when a LATER
    event of that group arrives OR when the event-time watermark
    passes its end (EventTimeTimeout — a group that stops producing
    used to leave its last bucket unemitted forever; round-5 ADVICE).
    On close the emitter writes the frontier's aggregate plus a
    ``fill`` row for every silent bucket in between — so on an
    in-order replay the emitted set equals the batch operator's output
    minus any frontier bucket the watermark never passed (pinned by
    streaming_test). A timed-out flush KEEPS the frontier in state, so
    a group that resumes still zero-fills the silent span
    batch-identically; state expires entirely after
    ``idle_timeout_seconds`` of further event-time silence. Late
    events inside the open bucket still count; late events for a
    closed bucket are dropped, the same effectively-once choice the
    anomaly twin makes.

    Scale: state is O(groups) scalars and expired for dead keys; the
    only shuffle is the groupBy on the group key. A group silent for a
    long span emits the same zero rows the batch grid would — gap
    length costs output rows, never state."""
    val_col, how = (None, None)
    if value_agg is not None:
        val_col, how = value_agg
        if how not in ("sum", "avg"):
            raise ValueError("value_agg must be (col, 'sum'|'avg')")
    grp_t = stream_df.schema[group_col].dataType
    out_fields = [
        T.StructField(group_col, grp_t),
        T.StructField("bucket", T.TimestampNTZType()),
        T.StructField("n", T.LongType()),
    ]
    if value_agg is not None:
        out_fields.append(T.StructField("v", T.DoubleType()))
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(group_col)
        .applyInPandasWithState(
            _gapfill_emitter(bucket_seconds, fill, ts_col, group_col,
                             val_col, how, idle_timeout_seconds),
            outputStructType=T.StructType(out_fields),
            stateStructType=GAPFILL_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
