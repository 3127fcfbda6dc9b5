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
across micro-batches). Out-of-order arrivals within the watermark are
handled with gap semantics, not absorbed: events within gap of the open
session extend it (backward if they predate its start — the extension
chains, so classification is against the FINAL extended start, and an
exact-gap spacing is a boundary exactly as in the batch twin); events
>= gap before the extended start gap-cluster into their own
already-closed past sessions, emitted immediately. Caveat: such past sessions get a HIGHER session_id
than the batch twin's time-ordered numbering (arrival order is the
stream's numbering), and an emitted past session cannot merge with a
yet-later-arriving within-gap neighbor (append-mode emission is final).
Consumers needing exact batch numbering under reordering should
renumber by session_start at read time (row_number over (user_id ORDER
BY session_start)).
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
        # highest session_id handed out so far for this user — distinct
        # from the OPEN session's id, because out-of-order past sessions
        # (emitted while an open session exists) take fresh ids without
        # renumbering the open one
        StructField("max_sid", LongType()),
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
            sid, start, last, n, _ = state.get
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
            sid, start, last, n, max_sid = state.get
        else:
            sid, start, last, n, max_sid = 0, None, None, 0, 0

        closed: list[dict] = []
        # Cross-batch out-of-order: events that predate the OPEN session
        # by >= gap can never belong to it — they gap-cluster into their
        # own ALREADY-CLOSED past sessions, emitted now (append-mode
        # emission is final: a later-arriving within-gap neighbor of a
        # past cluster would start a new session — the one true
        # streaming approximation here). Absorbing them into the open
        # session (the pre-round-4 behavior) corrupted its start/count.
        # Events within gap of the open start extend it BACKWARD, since
        # gap sessions partition the time axis order-independently.
        #
        # The past/keep split uses the FINAL backward-extended start:
        # below-start events are chained descending first (< gap spacing,
        # the same strict bound as the forward close and the batch twin's
        # `(sec - prev) >= gap` split — an exact-gap neighbor is a
        # boundary, not a member), THEN everything at or beyond gap
        # before the extended start gap-clusters into past sessions.
        # Classifying against the pre-extension start did two things
        # wrong (round-4 ADVICE): an exact-gap event merged backward
        # (>= / > off-by-one), and an event made within-gap only by a
        # same-batch backward extension was emitted as its own session.
        if last is not None:
            below = sorted(t for t in secs if t < start)
            secs = [t for t in secs if t >= start]
            joined = 0
            i = len(below) - 1
            while i >= 0 and start - below[i] < gap:
                start = below[i]
                joined += 1
                i -= 1
            n += joined
            past = below[: i + 1]
            ps = pl = pn = None
            for t in past:
                if pl is None:
                    ps, pl, pn = t, t, 1
                elif t - pl >= gap:
                    closed.append(row(max_sid + 1, ps, pl, pn))
                    max_sid, ps, pl, pn = max_sid + 1, t, t, 1
                else:
                    pl, pn = t, pn + 1
            if pl is not None:
                # the cluster's last event is still >= gap before the
                # open session's start, so it is genuinely closed; it
                # takes a fresh id without renumbering the open session
                closed.append(row(max_sid + 1, ps, pl, pn))
                max_sid += 1
        for t in secs:
            if last is None:
                sid, start, last, n = max_sid + 1, t, t, 1
                max_sid += 1
            elif t - last >= gap:
                closed.append(row(sid, start, last, n))
                sid, start, last, n = max_sid + 1, t, t, 1
                max_sid += 1
            else:
                # t >= start by construction (the prepass above consumed
                # every below-start event); t may still sit inside the
                # open interval, hence the max
                last, n = max(last, t), n + 1
        state.update((sid, start, last, n, max_sid))
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
