"""Event-log operators: sessionization and typed JSON stats.

Training-data pipelines carry interaction/event logs next to documents
(click streams, crawl telemetry); these are the standard shapes over the
driver ``events`` table (event_id, ts, user_id, event_type, value, props):

* ``sessionize`` — classic gap-based sessions per user: a new session
  starts after >= ``gap_minutes`` of inactivity. One window pass (lag +
  conditional cumsum) — no self-joins; the shuffle key is user_id.
* ``event_type_stats`` — per-type aggregates including a field extracted
  from the JSON ``props`` column (JVM-side ``get_json_object``).

Both have exact DuckDB oracle twins (__spark_entry__); timestamps cross
the engine boundary as epoch seconds.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

__all__ = ["sessionize", "event_type_stats"]


def sessionize(events: DataFrame, gap_minutes: int = 30,
               user_col: str = "user_id", ts_col: str = "ts") -> DataFrame:
    """(user_id, session_id, session_start, session_end, n_events).

    session_id numbers a user's sessions in time order from 1; session
    boundaries are inactivity gaps >= gap_minutes. Epoch-seconds output
    for cross-engine comparison.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col)
    sec = F.unix_timestamp(F.col(ts_col))
    prev = F.lag(sec).over(w)
    new_session = F.when(
        prev.isNull() | ((sec - prev) >= gap_minutes * 60), 1
    ).otherwise(0)
    w_rows = (
        Window.partitionBy(user_col)
        .orderBy(ts_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    marked = events.select(
        F.col(user_col),
        F.col(ts_col),
        sec.alias("ts_sec"),
        new_session.alias("is_new"),
    ).withColumn("session_id", F.sum("is_new").over(w_rows))
    return (
        marked.groupBy(user_col, "session_id")
        .agg(
            F.min("ts_sec").alias("session_start"),
            F.max("ts_sec").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


def event_type_stats(events: DataFrame) -> DataFrame:
    """(event_type, n_events, n_users, avg_value, avg_k): per-type stats
    with the JSON field ``props.k`` extracted JVM-side."""
    k = F.get_json_object(F.col("props"), "$.k").cast("double")
    return (
        events.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(F.avg("value"), 6).alias("avg_value"),
            F.round(F.avg(k), 6).alias("avg_k"),
        )
    )
