"""Stateful streaming sessionization (`applyInPandasWithState`).

The batch twin is ``operators.events.sessionize`` (lag + cumsum window);
on a stream the same gap-based semantics need per-user state: a session
stays open in the state store until either (a) a later event arrives
beyond the gap — the session closes and is emitted — or (b) the event-
time watermark passes ``last_ts + gap`` and the state times out, which
flushes the session without needing another event from that user.

Scale shape: state is one tiny tuple per ACTIVE user (not per event);
the watermark bounds it — users idle past the gap are flushed and
removed every micro-batch. The shuffle key is user_id, the same key the
batch window uses. Within-batch work is vectorized pandas per group.

Output rows match the batch operator's schema
(user_id, session_id, session_start, session_end, n_events), epoch
seconds, session_id numbering each user's sessions from 1 in
*arrival* order — so stream output == batch output on the same events
whenever each user's events arrive in time order across micro-batches
(tests/test_session_stream.py pins it, including sessions stitched
across micro-batches). Caveat: an out-of-order but within-watermark
session that arrives *after* a later session gets a higher session_id
than the batch twin's time-ordered numbering; consumers needing exact
batch equality under reordering should renumber by session_start at
read time (e.g. row_number over (user_id ORDER BY session_start)).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

__all__ = ["stream_sessionize", "SESSION_SCHEMA"]

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_id", LongType()),
        StructField("session_start", LongType()),
        StructField("session_end", LongType()),
        StructField("n_events", LongType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("session_id", LongType()),
        StructField("session_start", LongType()),
        StructField("last_ts", LongType()),
        StructField("n_events", LongType()),
    ]
)


def stream_sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "10 minutes",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming (user_id, session_id, session_start, session_end,
    n_events); sessions emit when closed by a later event or when the
    watermark times the open session out."""
    gap = gap_minutes * 60

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        user = key[0]

        def row(sid: int, start: int, last: int, n: int) -> dict:
            return {
                "user_id": user,
                "session_id": sid,
                "session_start": start,
                "session_end": last,
                "n_events": n,
            }

        if state.hasTimedOut:
            sid, start, last, n = state.get
            state.remove()
            yield pd.DataFrame([row(sid, start, last, n)])
            return

        secs: list[int] = []
        for pdf in pdfs:
            # pandas datetime64[ns] -> epoch seconds, truncating like
            # Spark's unix_timestamp
            secs.extend((pdf[ts_col].astype("int64") // 1_000_000_000).tolist())
        secs.sort()
        if state.exists:
            sid, start, last, n = state.get
        else:
            sid, start, last, n = 0, None, None, 0

        closed: list[dict] = []
        for t in secs:
            if last is None:
                sid, start, last, n = sid + 1, t, t, 1
            elif t - last >= gap:
                closed.append(row(sid, start, last, n))
                sid, start, last, n = sid + 1, t, t, 1
            else:
                last, n = max(last, t), n + 1
        state.update((sid, start, last, n))
        # flush the open session once the watermark passes last + gap
        state.setTimeoutTimestamp((last + gap) * 1000)
        if closed:
            yield pd.DataFrame(closed)

    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(user_col)
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
