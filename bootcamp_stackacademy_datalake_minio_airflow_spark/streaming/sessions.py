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

    if state.exists:
        start_ms, last_ms, n = state.get
    else:
        start_ms = last_ms = ts_ms[0]
        n = 0

    closed: list[tuple[int, int, int]] = []
    for t in ts_ms:
        if t - last_ms > _GAP_MS:
            closed.append((start_ms, last_ms, n))
            start_ms, last_ms, n = t, t, 0
        else:
            # a late (within-watermark) event may precede the open
            # session's bounds: widen, never regress — last_ms must
            # stay the session's true end or the next gap check and
            # the emitted session_end are wrong
            start_ms = min(start_ms, t)
            last_ms = max(last_ms, t)
        n += 1

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
