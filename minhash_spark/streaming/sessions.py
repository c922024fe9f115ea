"""Structured Streaming: custom stateful sessionization via
``applyInPandasWithState``.

Streaming twin of ``plans.queries.q_event_sessions`` (same 30-min gap rule,
same output schema): per-user session state lives in the Spark state store,
closed sessions are APPENDED as they finalize — either because a later event
of the same user opens a new session, or because the event-time watermark
passes the open session's gap deadline (EventTimeTimeout), which is how idle
users' last sessions are flushed without ever seeing another event.

Scale shape: state is one tiny row per ACTIVE user (start/last/count/idx —
32 B), partitioned with the groupBy shuffle across executors; per-batch work
is one sorted pass over each user's new events. This is the canonical
stateful-operator plan and survives a 1000-executor deploy unchanged.

Ordering contract: events are sorted (epoch, event_id) WITHIN each
micro-batch; an event arriving in a later batch with a timestamp older than
a session already closed would start a spurious session. The watermark
bounds this the standard way — feed batches in watermark order (the file
source does) and late data beyond the watermark is dropped by Spark.
"""

from __future__ import annotations

from typing import Any, Iterable, Tuple

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from minhash_spark.streaming.windows import EVENTS_SCHEMA

from minhash_spark.functions.timeutil import SESSION_GAP_S  # noqa: E402
# how long a flushed user's session-counter sentinel survives with no new
# events before the state row is dropped entirely (bounds state size to
# users active within the retention window instead of every user ever seen;
# a user returning later restarts at session_idx 1, disclosed)
STATE_RETENTION_S = 30 * 24 * 3600

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_idx", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("start_epoch", T.LongType()),
        T.StructField("end_epoch", T.LongType()),
        T.StructField("duration_s", T.LongType()),
    ]
)

# (session_start, last_event_epoch, n_events, next_session_idx)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("start", T.LongType()),
        T.StructField("last", T.LongType()),
        T.StructField("cnt", T.LongType()),
        T.StructField("idx", T.LongType()),
    ]
)


def _close(user_id: int, idx: int, start: int, last: int, cnt: int) -> dict:
    return {
        "user_id": user_id,
        "session_idx": idx,
        "n_events": cnt,
        "start_epoch": start,
        "end_epoch": last,
        "duration_s": last - start,
    }


def _session_func(
    key: Tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        start, last, cnt, idx = state.get
        if start >= 0:
            # watermark passed last+gap with no new events: flush the open
            # session but KEEP the session counter as a sentinel — removing
            # the whole state would restart idx at 1 if this user's events
            # resume, re-emitting already-used (user_id, session_idx) keys.
            # The sentinel gets its own RETENTION timeout so it does not
            # live forever (two-phase expiry; without it the state store
            # grows one permanent row per user ever seen).
            state.update((-1, last, 0, idx + 1))
            state.setTimeoutTimestamp((last + STATE_RETENTION_S) * 1000)
            yield pd.DataFrame([_close(user_id, idx, start, last, cnt)])
        else:
            # sentinel expired: user inactive past retention — drop the row
            state.remove()
        return

    events = pd.concat(list(pdfs), ignore_index=True)
    events = events.sort_values(["epoch", "event_id"], kind="mergesort")
    if state.exists:
        start, last, cnt, idx = state.get
    else:
        start = last = -1
        cnt = 0
        idx = 1

    closed: list[dict] = []
    for epoch in events["epoch"].to_numpy():
        e = int(epoch)
        if start < 0:
            start, last, cnt = e, e, 1
        elif e - last > SESSION_GAP_S:
            closed.append(_close(user_id, idx, start, last, cnt))
            idx += 1
            start, last, cnt = e, e, 1
        else:
            last = e
            cnt += 1
    state.update((start, last, cnt, idx))
    if start >= 0:
        # event-time timeout: fire when the watermark passes the gap deadline
        state.setTimeoutTimestamp((last + SESSION_GAP_S) * 1000)
    if closed:
        yield pd.DataFrame(closed)


def sessionize_stream(spark: SparkSession, input_dir: str) -> DataFrame:
    """readStream(events) -> append stream of CLOSED sessions."""
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(input_dir)
    from minhash_spark.functions.timeutil import ntz_epoch

    withered = (
        stream.withColumn("epoch", ntz_epoch("ts"))
        .withColumn("ts_utc", F.timestamp_seconds(F.col("epoch")))
        .withWatermark("ts_utc", "0 seconds")
        .select("user_id", "event_id", "epoch", "ts_utc")
    )
    return withered.groupBy("user_id").applyInPandasWithState(
        _session_func,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def run_streaming_sessions(
    spark: SparkSession, input_dir: str, output_dir: str, checkpoint_dir: str
) -> None:
    """Drain the landing dir (availableNow) appending closed sessions to a
    parquet sink; restart-safe via the streaming checkpoint."""
    out = sessionize_stream(spark, input_dir)
    q = (
        out.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
