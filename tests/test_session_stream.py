"""Streaming sessionization == batch sessionize on closed sessions,
including sessions stitched across micro-batches (state carry)."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F

from fastcdc_rs_spark.operators.events import sessionize
from fastcdc_rs_spark.streaming.session_stream import stream_sessionize

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _ev(eid, user, minutes):
    return (eid, user, T0 + dt.timedelta(minutes=minutes))


def test_stream_sessionize_matches_batch(spark, tmp_path):
    # user 1: session A (0, 5, 10), session B (60, 61) — split so A's
    # tail and B land in file 2 (stitching + closing across batches).
    # user 2: one long session crossing the file boundary (25, 28, 31).
    # user 3: session (0, 1) then a far-future event that closes it and
    #         advances the watermark far enough to fire pending timeouts.
    batch1 = [
        _ev(1, 1, 0), _ev(2, 1, 5),
        _ev(3, 2, 25), _ev(4, 2, 28),
        _ev(5, 3, 0), _ev(6, 3, 1),
    ]
    batch2 = [
        _ev(7, 1, 10), _ev(8, 1, 60), _ev(9, 1, 61),
        _ev(10, 2, 31),
        _ev(11, 3, 600),  # closes user 3's first session, pushes watermark
    ]
    schema = "event_id long, user_id long, ts timestamp"
    src = str(tmp_path / "events_src")
    out_dir = str(tmp_path / "sessions_out")
    ckpt = str(tmp_path / "ckpt")

    # two availableNow runs over one checkpoint: deterministic micro-batch
    # boundaries (file listing order is not) + state resume across runs
    def run_once():
        stream = spark.readStream.schema(schema).parquet(src)
        # lateness 45m: run 1 ends with watermark max(28m) - 45m < 0, so
        # batch 2's minute-10 continuation event is NOT late-dropped (the
        # drop behavior itself is pinned in test_window_stats_stream)
        q = (
            stream_sessionize(stream, gap_minutes=30, watermark="45 minutes")
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    spark.createDataFrame(batch1, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)
    run_once()
    spark.createDataFrame(batch2, schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    run_once()

    got = {
        (r.user_id, r.session_id, r.session_start, r.session_end, r.n_events)
        for r in spark.read.parquet(out_dir).collect()
    }

    all_events = spark.createDataFrame(batch1 + batch2, schema)
    batch_rows = {
        (r.user_id, r.session_id, r.session_start, r.session_end, r.n_events)
        for r in sessionize(all_events, gap_minutes=30).collect()
    }
    # every emitted stream session is a true batch session
    assert got <= batch_rows, got - batch_rows
    # sessions CLOSED by a later event must all have been emitted:
    # user 1 session 1 (0-10, 3 events: stitched across the two files!)
    t0s = int(T0.timestamp())
    assert (1, 1, t0s + 0, t0s + 10 * 60, 3) in got
    # user 3 session 1 (closed by the far-future event)
    assert (3, 1, t0s + 0, t0s + 60, 2) in got
    # nothing split user 2's boundary-crossing session into two
    u2 = [g for g in got if g[0] == 2]
    for s in u2:
        assert s[4] == 3, f"user 2 session split: {u2}"


def test_stream_out_of_order_past_session(spark, tmp_path):
    # Cross-batch out-of-order (round-4 pin): a session-worth of events
    # arriving AFTER a much later session, still inside the watermark,
    # must form its own closed session with gap semantics — not be
    # absorbed into the open session (which corrupted start/n_events).
    # Numbering is arrival order (documented); renumbering by
    # session_start restores batch equality.
    batch1 = [_ev(1, 1, 100), _ev(2, 1, 101)]        # open session at 100-101
    batch2 = [_ev(3, 1, 0), _ev(4, 1, 5),            # far-past pair: own session
              _ev(5, 1, 99)]                          # within gap: extends backward
    batch3 = [_ev(6, 1, 600)]                         # closes the open session
    schema = "event_id long, user_id long, ts timestamp"
    src = str(tmp_path / "ooo_src")
    out_dir = str(tmp_path / "ooo_out")
    ckpt = str(tmp_path / "ooo_ckpt")

    def run_once():
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            stream_sessionize(stream, gap_minutes=30, watermark="1000 minutes")
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    for i, b in enumerate((batch1, batch2, batch3)):
        spark.createDataFrame(b, schema).coalesce(1).write.mode(
            "overwrite" if i == 0 else "append"
        ).parquet(src)
        run_once()

    t0s = int(T0.timestamp())
    got = {
        (r.session_id, r.session_start, r.session_end, r.n_events)
        for r in spark.read.parquet(out_dir).collect()
    }
    # past pair (0, 5) -> one gap-clustered closed session (sid 2: arrival
    # order); open session extended backward by the minute-99 event and
    # closed by batch3 as (99..101, 3 events) keeping sid 1
    assert (2, t0s, t0s + 5 * 60, 2) in got
    assert (1, t0s + 99 * 60, t0s + 101 * 60, 3) in got
    # renumbering by session_start recovers the batch twin exactly
    all_events = spark.createDataFrame(batch1 + batch2 + batch3, schema)
    batch_rows = {
        (r.session_id, r.session_start, r.session_end, r.n_events)
        for r in sessionize(all_events, gap_minutes=30).collect()
    }
    import pyspark.sql.functions as _F
    from pyspark.sql import Window as _W

    renum = {
        (r.sid, r.session_start, r.session_end, r.n_events)
        for r in spark.read.parquet(out_dir)
        .withColumn("sid", _F.row_number().over(
            _W.partitionBy("user_id").orderBy("session_start")))
        .collect()
    }
    assert renum <= batch_rows


def test_stream_out_of_order_gap_boundary_and_chained_extension(
    spark, tmp_path
):
    # Round-5 ADVICE pins. User 1: an out-of-order event EXACTLY gap
    # before the open session's start is a boundary (batch splits on
    # `delta >= gap`), so it must become its own past session, never
    # merge backward. User 2: the past/keep split must classify against
    # the FINAL backward-extended start — minute 50 is >= gap before the
    # pre-extension start (100) but chains through the same batch's
    # minute-75 extension (both spacings < gap), so all four events are
    # ONE session, matching the batch twin.
    gap_min = 30
    batch1 = [_ev(1, 1, 100), _ev(2, 1, 101),
              _ev(3, 2, 100), _ev(4, 2, 101)]
    batch2 = [_ev(5, 1, 70),            # exact-gap: 100-70 == gap
              _ev(6, 2, 75), _ev(7, 2, 50)]
    batch3 = [_ev(8, 1, 600), _ev(9, 2, 600)]  # close the open sessions
    schema = "event_id long, user_id long, ts timestamp"
    src = str(tmp_path / "gb_src")
    out_dir = str(tmp_path / "gb_out")
    ckpt = str(tmp_path / "gb_ckpt")

    def run_once():
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            stream_sessionize(stream, gap_minutes=gap_min,
                              watermark="1000 minutes")
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    for i, b in enumerate((batch1, batch2, batch3)):
        spark.createDataFrame(b, schema).coalesce(1).write.mode(
            "overwrite" if i == 0 else "append"
        ).parquet(src)
        run_once()

    t0s = int(T0.timestamp())
    rows = spark.read.parquet(out_dir).collect()
    got1 = {(r.session_id, r.session_start, r.session_end, r.n_events)
            for r in rows if r.user_id == 1}
    got2 = {(r.session_id, r.session_start, r.session_end, r.n_events)
            for r in rows if r.user_id == 2}
    # user 1: exact-gap event = closed past session; open session intact
    assert got1 == {
        (2, t0s + 70 * 60, t0s + 70 * 60, 1),
        (1, t0s + 100 * 60, t0s + 101 * 60, 2),
    }, got1
    # user 2: one merged session 50..101 (4 events), nothing emitted as
    # a spurious past session from the pre-extension classification
    assert got2 == {(1, t0s + 50 * 60, t0s + 101 * 60, 4)}, got2

    # both users: renumbering by session_start == batch twin subset
    all_events = spark.createDataFrame(batch1 + batch2 + batch3, schema)
    batch_rows = {
        (r.user_id, r.session_id, r.session_start, r.session_end,
         r.n_events)
        for r in sessionize(all_events, gap_minutes=gap_min).collect()
    }
    from pyspark.sql import Window as _W

    renum = {
        (r.user_id, r.sid, r.session_start, r.session_end, r.n_events)
        for r in spark.read.parquet(out_dir)
        .withColumn("sid", F.row_number().over(
            _W.partitionBy("user_id").orderBy("session_start")))
        .collect()
    }
    assert renum <= batch_rows, renum - batch_rows
