"""Watermarked tumbling-window aggregates over the event stream.

The standard late-data shape: events grouped into fixed windows with a
watermark bounding both state size and how late an event may arrive and
still be counted. Append mode emits each window exactly once — when the
watermark passes its end — so downstream sinks never see a window twice
(the idempotent-sink complement of the band-index job's per-batch dirs).

State per (window, event_type): one counter row; the watermark evicts
windows older than ``lateness`` behind the max observed event time, so
state is O(windows-in-flight × types) regardless of stream length.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

__all__ = ["stream_window_event_stats"]


def stream_window_event_stats(
    events: DataFrame,
    window_minutes: int = 5,
    lateness: str = "10 minutes",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Streaming (window_start, window_end, event_type, n_events,
    avg_value): tumbling windows + watermark; events later than
    ``lateness`` behind the watermark are dropped (bounded state)."""
    return (
        events.withWatermark(ts_col, lateness)
        .groupBy(
            F.window(F.col(ts_col), f"{window_minutes} minutes").alias("w"),
            F.col(type_col),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
        .select(
            F.unix_timestamp("w.start").alias("window_start"),
            F.unix_timestamp("w.end").alias("window_end"),
            type_col,
            "n_events",
            "avg_value",
        )
    )
