"""Stateful streaming sessionization (applyInPandasWithState).

The batch twin (suites/breadth2.py:user_sessionization) computes the
same 30-minute-gap sessions with window functions; this operator keeps
per-user open-session state across micro-batches and emits a session
row when the watermark passes its close time — the custom stateful
operator pattern the reference has no counterpart for (SURVEY §2.7).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_GAP_MIN = 30

SESSION_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", IntegerType()),
    ]
)

#: open-session state per user: (start_ms, last_ms, n_events)
SESSION_STATE_SCHEMA = StructType(
    [
        StructField("start_ms", LongType()),
        StructField("last_ms", LongType()),
        StructField("n_events", IntegerType()),
    ]
)

_GAP_MS = SESSION_GAP_MIN * 60 * 1000


def _sessionize(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold this micro-batch's events for one user into session state;
    emit every session closed by a >gap silence (or state timeout)."""
    (user_id,) = key

    if state.hasTimedOut:
        if state.exists:
            start_ms, last_ms, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(start_ms, unit="ms")],
                    "session_end": [pd.Timestamp(last_ms, unit="ms")],
                    "n_events": [n],
                }
            )
        return

    # null timestamps (pd.NaT) would otherwise fold in as int64-min
    # and fabricate a year-1677 session — drop them up front
    ts_ms: list[int] = []
    for pdf in pdfs:
        ts_ms.extend(
            int(t.value // 1_000_000) for t in pdf["ts"] if not pd.isna(t)
        )
    ts_ms.sort()
    if not ts_ms:
        return

    # Gap-merge the batch's events WITH the open-session interval in
    # EVENT-TIME order (review finding: the old fold compared each
    # event only against the open session's end, so a late event more
    # than one gap BEFORE the session's start was widened into it —
    # one session spanning a silence longer than the gap, diverging
    # from the batch twin whenever watermark > gap). Intervals sorted
    # by start merge iff separated by <= gap; everything but the most
    # recent interval is closed, the last becomes the new state.
    items: list[list[int]] = [[t, t, 1] for t in ts_ms]
    if state.exists:
        start_ms, last_ms, n = state.get
        items.append([start_ms, last_ms, n])
        items.sort(key=lambda iv: (iv[0], iv[1]))

    merged: list[list[int]] = []
    for s, e, c in items:
        if merged and s - merged[-1][1] <= _GAP_MS:
            merged[-1][1] = max(merged[-1][1], e)
            merged[-1][2] += c
        else:
            merged.append([s, e, c])

    closed = [tuple(iv) for iv in merged[:-1]]
    start_ms, last_ms, n = merged[-1]

    state.update((start_ms, last_ms, n))
    state.setTimeoutTimestamp(last_ms + _GAP_MS)

    if closed:
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(closed),
                "session_start": [pd.Timestamp(s, unit="ms") for s, _, _ in closed],
                "session_end": [pd.Timestamp(e, unit="ms") for _, e, _ in closed],
                "n_events": [c for _, _, c in closed],
            }
        )


def sessionize_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming sessionization over an events stream (must have
    ``user_id`` and ``ts`` columns).

    State is one tiny tuple per OPEN session; the event-time timeout
    closes idle sessions, so state is bounded by concurrent active
    users — not by stream history. That bound is what makes the
    operator viable on an unbounded stream.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize,
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
