"""Watermarked windowed aggregation: in-watermark late events count,
too-late events are dropped, each window emits exactly once (append)."""

from __future__ import annotations

import datetime as dt

from fastcdc_rs_spark.streaming.window_stats_stream import stream_window_event_stats

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _ev(eid, minutes, etype="click", value=1.0):
    return (eid, T0 + dt.timedelta(minutes=minutes), 1, etype, value, "{}")

SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def test_windowed_agg_with_late_data(spark, tmp_path):
    # batch 1: window [0,5) gets 2 events, [5,10) gets 1; max ts = 40min
    # (watermark after batch 1 = 40 - 10 = 30min -> windows < 30 closed)
    batch1 = [
        _ev(1, 0), _ev(2, 4, value=3.0), _ev(3, 6),
        _ev(4, 40),  # advances event time (and later the watermark)
    ]
    # batch 2: a LATE event for [0,5) — its window end (5m) is already
    # behind the 30min watermark -> dropped; plus one for [40,45).
    batch2 = [_ev(5, 1, value=99.0), _ev(6, 41)]

    # Two separate availableNow runs over a shared checkpoint: run 1 sees
    # only batch1 (watermark persists at 40m - 10m = 30m), run 2 sees only
    # batch2 — deterministic batch boundaries AND a resume of streaming
    # aggregation state from the checkpoint.
    src = str(tmp_path / "ev_src")
    out = str(tmp_path / "win_out")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        stream = spark.readStream.schema(SCHEMA).parquet(src)
        q = (
            stream_window_event_stats(
                stream, window_minutes=5, lateness="10 minutes"
            )
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    spark.createDataFrame(batch1, SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)
    run_once()
    spark.createDataFrame(batch2, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    run_once()

    rows = {
        (r.window_start, r.event_type): (r.n_events, r.avg_value)
        for r in spark.read.parquet(out).collect()
    }
    t0s = int(T0.timestamp())
    # [0,5) emitted once with the ORIGINAL 2 events — the late event 5
    # (value 99) arrived behind the watermark and was dropped
    assert rows[(t0s, "click")] == (2, 2.0)
    # [5,10) closed and emitted
    assert rows[(t0s + 300, "click")] == (1, 1.0)
    # [40,45) still open at stream end (watermark never passed 45m):
    # append mode must NOT have emitted it yet
    assert (t0s + 2400, "click") not in rows
