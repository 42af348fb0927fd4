"""Gap-based event sessionization — batch plan + custom stateful
streaming operator.

Batch: the classic two-window plan (lag -> new-session flag -> running
sum = session ordinal) — one shuffle on user_id, no Python.

Streaming: the same semantics as an ``applyInPandasWithState`` operator
(GroupState per user holds the open session; a new event either extends
it or closes it and emits the finished session).  This is the
Structured-Streaming tool for operators that windowed aggregation can't
express — session windows with per-key custom state.  Sessions still
open when the stream drains stay in state (that's streaming semantics:
they are not finished); the batch/stream equivalence test therefore
compares CLOSED sessions.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

SESSION_SCHEMA = (
    "user_id long, session_start_us long, session_end_us long, "
    "n_events long, sum_value double"
)

STATE_SCHEMA = "start_us long, last_us long, n long, s double"


def sessionize_batch(events: DataFrame, gap_sec: int = 1800) -> DataFrame:
    """-> one row per (user, session): start/end (epoch micros), event
    count, value sum.  Session breaks where the gap to the previous
    event of the same user exceeds ``gap_sec``."""
    # parquet timestamps may load as TIMESTAMP_NTZ; the session timezone
    # is pinned to UTC so the cast is identity
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = gap_sec * 1_000_000
    new_sess = F.when(
        F.lag(us).over(w).isNull() | ((us - F.lag(us).over(w)) > gap_us), 1
    ).otherwise(0)
    sess = events.withColumn("_us", us).withColumn(
        "_sid", F.sum(new_sess).over(w)
    )
    return (
        sess.groupBy("user_id", "_sid")
        .agg(
            F.min("_us").alias("session_start_us"),
            F.max("_us").alias("session_end_us"),
            F.count("*").cast("long").alias("n_events"),
            # exact decimal sum (2-decimal event values), surfaced as
            # double — engine-order-independent, so oracle-gateable
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .drop("_sid")
    )


_SESSION_COLS = ["user_id", "session_start_us", "session_end_us",
                 "n_events", "sum_value"]


def _session_state_fn(gap_sec: int, event_timeout: bool):
    gap_us = gap_sec * 1_000_000

    def fn(key: tuple, pdfs: Iterable[pd.DataFrame], state: Any) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if event_timeout and state.hasTimedOut:
            # watermark passed last_event + gap with no new data: the
            # open session is CLOSED by timeout and its state dropped —
            # per-key state stays bounded by activity, not corpus age
            start_us, last_us, n, s = state.get
            state.remove()
            yield pd.DataFrame([(user_id, start_us, last_us, n, s)],
                               columns=_SESSION_COLS)
            return
        if state.exists:
            start_us, last_us, n, s = state.get
        else:
            start_us = last_us = None
            n, s = 0, 0.0
        out: list[tuple] = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            for us, v in zip(
                (pdf["ts"].astype("int64") // 1000).tolist(), pdf["value"].tolist()
            ):
                # pandas datetime64[ns] -> micros
                if last_us is not None and us - last_us > gap_us:
                    out.append((user_id, start_us, last_us, n, s))
                    start_us, n, s = us, 0, 0.0
                if start_us is None:
                    start_us = us
                last_us = us
                n += 1
                s += float(v)
        state.update((start_us, last_us, n, s))
        if event_timeout:
            # fire when the EVENT-TIME watermark passes the session gap;
            # must stay above the current watermark or Spark rejects it
            to_ms = max(last_us // 1000 + gap_sec * 1000,
                        state.getCurrentWatermarkMs() + 1)
            state.setTimeoutTimestamp(to_ms)
        if out:
            yield pd.DataFrame(out, columns=_SESSION_COLS)

    return fn


def sessionize_stream(events_stream: DataFrame, gap_sec: int = 1800,
                      timeout: str = "none"):
    """Streaming sessionization over a stream with (event_id, ts,
    user_id, value): emits each session WHEN a later event of the same
    user closes it.

    ``timeout="event"``: the input stream must carry a watermark on
    ``ts`` (``events_stream.withWatermark("ts", ...)``); an open session
    whose last event falls ``gap_sec`` behind the watermark is emitted
    by EventTimeTimeout and its state removed.  Without a timeout an
    idle user's open session lives forever — at 100 TB that unbounded
    per-key state is a leak, so "event" is what production runs."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    if timeout not in ("none", "event"):
        raise ValueError(f"unknown timeout mode {timeout!r}")
    conf = (GroupStateTimeout.EventTimeTimeout if timeout == "event"
            else GroupStateTimeout.NoTimeout)
    return (
        events_stream.groupBy("user_id")
        .applyInPandasWithState(
            _session_state_fn(gap_sec, timeout == "event"),
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=conf,
        )
    )
