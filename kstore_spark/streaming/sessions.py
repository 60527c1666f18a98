"""Custom stateful streaming operator: gap-based sessionization with
``applyInPandasWithState``.

The batch twin lives in plans/analytics.events_sessionize (window + lag);
this is the streaming formulation: per-user state carries the open
session (start, last-seen, count) across micro-batches, closing a session
when the 30-minute inactivity gap passes or the event-time timeout fires.

Scale properties:
- state is O(#active users), not O(#events): each user holds one open
  session tuple;
- the stream is hash-partitioned by user_id (groupBy) — adding executors
  scales state linearly;
- GroupStateTimeout.EventTimeTimeout + watermark bound both state size
  and late-data wait.
"""

from __future__ import annotations

import os
import uuid
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

GAP_SECONDS = 1800

SESSION_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("session_start", T.TimestampType()),
    T.StructField("session_end", T.TimestampType()),
    T.StructField("n_events", T.LongType()),
])

_STATE_SCHEMA = T.StructType([
    T.StructField("start_us", T.LongType()),
    T.StructField("last_us", T.LongType()),
    T.StructField("n", T.LongType()),
])


def _sessionize(key, pdf_iter: Iterator[pd.DataFrame], state: GroupState):
    """Fold this micro-batch's events (sorted by ts) into the open
    session; emit every session closed by a gap. On event-time timeout,
    emit the still-open session and clear."""
    user_id = key[0]
    if state.hasTimedOut:
        start_us, last_us, n = state.get
        state.remove()
        yield pd.DataFrame({
            "user_id": [user_id],
            "session_start": [pd.Timestamp(start_us, unit="us")],
            "session_end": [pd.Timestamp(last_us, unit="us")],
            "n_events": [n],
        })
        return

    ts_list: list[int] = []
    for pdf in pdf_iter:
        ts_list.extend(int(t.value // 1000) for t in pd.to_datetime(pdf["ts"]))
    ts_list.sort()

    start_us, last_us, n = state.get if state.exists else (None, None, 0)
    closed: list[tuple[int, int, int]] = []
    for t in ts_list:
        if start_us is None:
            start_us, last_us, n = t, t, 1
        elif t - last_us > GAP_SECONDS * 1_000_000:
            closed.append((start_us, last_us, n))
            start_us, last_us, n = t, t, 1
        else:
            last_us, n = t, n + 1
    state.update((start_us, last_us, n))
    state.setTimeoutTimestamp(last_us // 1000 + GAP_SECONDS * 1000)

    if closed:
        yield pd.DataFrame({
            "user_id": [user_id] * len(closed),
            "session_start": [pd.Timestamp(s, unit="us") for s, _, _ in closed],
            "session_end": [pd.Timestamp(e, unit="us") for _, e, _ in closed],
            "n_events": [c for _, _, c in closed],
        })


def stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the stateful sessionizer over the events table with an
    availableNow trigger; returns the *closed* sessions as a batch frame.
    (Sessions still open at end-of-stream stay in state — exactly the
    production semantics; the batch twin closes everything.)"""
    from kstore_spark.streaming.windows import _events_stream

    stream = _events_stream(spark, sf_dir)
    sessions = (
        stream.withWatermark("ts", "1 hour")
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
    name = f"stream_sessions_{uuid.uuid4().hex[:8]}"
    q = (
        sessions.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError(
            "streaming query did not finish within 300s — refusing to "
            "return a silently-partial result"
        )
    return spark.table(name)


# -- streaming last-touch attribution ----------------------------------

ATTR_OUT_SCHEMA = T.StructType([
    T.StructField("touch_type", T.StringType()),
    T.StructField("cents", T.LongType()),
])

_ATTR_STATE_SCHEMA = T.StructType([
    T.StructField("touch", T.StringType()),
])


def _attribute(key, pdf_iter: Iterator[pd.DataFrame], state: GroupState):
    """Per-user streaming last-touch fold: walk this micro-batch's
    events in (ts, event_id) order, carrying the latest click/view in
    state (ONE string per user — O(#users) state total); every purchase
    emits its credited touch and row-local cents immediately. With the
    ts-range-chunked replay, cross-batch order is event-time order, so
    the emitted multiset equals the batch window formulation exactly."""
    import math

    from kstore_spark.plans.analytics import ATTR_TOUCH_TYPES

    rows: list[tuple[int, int, str, float]] = []
    for pdf in pdf_iter:
        # ts_ms is pre-computed in the JVM (see stream_attribution) —
        # the per-group work here is a plain tuple walk, no datetime
        rows.extend(
            (int(t), int(e), str(k), float(v))
            for t, e, k, v in zip(pdf["ts_ms"], pdf["event_id"],
                                  pdf["event_type"], pdf["value"]))
    rows.sort(key=lambda r: (r[0], r[1]))  # total order: event_id unique
    touch = state.get[0] if state.exists else ""
    out_t: list[str] = []
    out_c: list[int] = []
    for _ts, _eid, etype, value in rows:
        if etype in ATTR_TOUCH_TYPES:
            touch = etype
        elif etype == "purchase":
            out_t.append(touch or "direct")
            # row-local cents truncation — the same IEEE multiply+floor
            # the batch twin and the DuckDB oracle apply
            out_c.append(int(math.floor(value * 100)))
    state.update((touch,))
    if out_t:
        yield pd.DataFrame({"touch_type": out_t, "cents": out_c})


ATTR_CHUNKS = 4  # micro-batches in the backfill replay (state crosses 3
                 # boundaries — the cross-batch carry is really exercised)


def stream_attribution(spark: SparkSession, sf_dir: str,
                       n_chunks: int = ATTR_CHUNKS) -> DataFrame:
    """Streaming twin of plans/analytics.events_attribution: per-user
    last-touch state (one string) folded over a ts-range-chunked
    replay, purchases credited AT ARRIVAL — the production shape where
    attribution rows feed a live dashboard rather than a nightly batch.
    Output aggregated to the same (touch_type, n_conversions,
    attributed_cents) table; the ts-ordered replay makes it equal to
    the batch window formulation row-for-row, so the oracle is
    EVENTS_ATTRIBUTION_SQL verbatim. State is O(#users) strings, hash-
    partitioned by the groupBy — executors scale it linearly."""
    from kstore_spark.plans.analytics import ATTR_TOUCH_TYPES
    from kstore_spark.streaming.windows import _events_stream_chunked

    stream = _events_stream_chunked(spark, sf_dir, n_chunks)
    # The fold is a no-op for every event that is neither a touch nor a
    # purchase, and reads only 4 of the 6 columns — so filter and
    # project in the JVM BEFORE the stateful exchange and the Arrow
    # boundary (guide §2.3 "project before the exchange", §4.1 "pass
    # only the columns the function needs": neither the shuffle nor the
    # per-group pandas frames carry no-op rows or the props blob). ts
    # is pre-converted to the fold's exact epoch-ms key in the JVM
    # (``unix_micros(ts) div 1000`` == pandas ``Timestamp.value //
    # 1000`` — both truncate positive µs to ms), so the per-group
    # Python work is a pure int/str walk with no pd.to_datetime.
    slim = (
        stream
        .where(F.col("event_type").isin(*ATTR_TOUCH_TYPES, "purchase"))
        .select(
            "user_id",
            F.expr("unix_micros(ts) div 1000").alias("ts_ms"),
            "event_id", "event_type", "value",
        )
    )
    credited = slim.groupBy("user_id").applyInPandasWithState(
        _attribute,
        outputStructType=ATTR_OUT_SCHEMA,
        stateStructType=_ATTR_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    name = f"stream_attr_{uuid.uuid4().hex[:8]}"
    q = (
        credited.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError(
            "streaming query did not finish within 300s — refusing to "
            "return a silently-partial result"
        )
    return (
        spark.table(name)
        .groupBy("touch_type")
        .agg(F.count(F.lit(1)).alias("n_conversions"),
             F.sum("cents").cast("long").alias("attributed_cents"))
    )


QUERIES = {
    "stream_attribution": stream_attribution,
}


def _oracles() -> dict[str, str]:
    from kstore_spark.plans.analytics import EVENTS_ATTRIBUTION_SQL

    # ts-ordered replay ⇒ stream == batch exactly; oracle shared verbatim
    return {"stream_attribution": EVENTS_ATTRIBUTION_SQL}


ORACLES = _oracles()
