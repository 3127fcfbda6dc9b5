"""Checkpoint/resume (B13) and Structured Streaming chunking tests."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from fastcdc_rs_spark.kernel import ChunkerConfig
from fastcdc_rs_spark.operators.chunk import chunk_documents
from fastcdc_rs_spark.sources.checkpoint import CheckpointedRun
from fastcdc_rs_spark.streaming.chunk_stream import start_chunk_stream

CFG = ChunkerConfig(64, 256, 1024)


def test_checkpoint_resume(spark, tmp_path):
    docs = spark.createDataFrame(
        [(i, f"doc number {i} " * 40) for i in range(20)], "doc_id long, text string"
    )
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return chunk_documents(docs, CFG)

    run1 = CheckpointedRun(spark, tmp_path / "ckpt", "cfg-v1")
    out1 = run1.stage("chunks", build)
    n1 = out1.count()
    assert calls["n"] == 1
    assert run1.events[-1]["action"] == "computed"

    # per-partition lineage recorded in the manifest
    import json

    manifest = json.loads((tmp_path / "ckpt" / "chunks" / "_MANIFEST.json").read_text())
    assert manifest["complete"] and manifest["rows"] == n1
    assert sum(manifest["partitions"].values()) == n1
    assert all(f.endswith(".parquet") for f in manifest["partitions"])

    # resume: same fingerprint → stage reused, build not called
    run2 = CheckpointedRun(spark, tmp_path / "ckpt", "cfg-v1")
    out2 = run2.stage("chunks", build)
    assert calls["n"] == 1
    assert run2.events[-1]["action"] == "resumed"
    assert out2.count() == n1

    # config change → recompute
    run3 = CheckpointedRun(spark, tmp_path / "ckpt", "cfg-v2")
    run3.stage("chunks", build)
    assert calls["n"] == 2
    assert run3.events[-1]["action"] == "computed"


def test_streaming_chunks_match_batch(spark, tmp_path):
    docs = spark.createDataFrame(
        [(i, f"streaming document {i} content " * 30) for i in range(10)],
        "doc_id long, text string",
    )
    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    docs.write.parquet(src)

    q = start_chunk_stream(
        spark, src, sink, ckpt, docs.schema, CFG
    )
    q.awaitTermination(120)

    got = spark.read.parquet(sink)
    expected = chunk_documents(docs, CFG)
    key = ["doc_id", "chunk_idx", "hash", "offset", "length"]
    assert sorted(map(tuple, got.select(*key).collect())) == sorted(
        map(tuple, expected.select(*key).collect())
    )


def test_streaming_exact_dedup_state_across_restarts(spark, tmp_path):
    """Wave 2 duplicates of wave-1 texts are suppressed by checkpoint state
    even though the query restarted between waves."""
    import pyspark.sql.functions as F

    from fastcdc_rs_spark.streaming.dedup_stream import start_exact_dedup_stream

    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    wave1 = spark.createDataFrame(
        [(0, "alpha text"), (1, "beta text"), (2, "alpha text")],
        "doc_id long, text string",
    )
    wave1.write.mode("append").parquet(src)
    schema = wave1.schema
    q = start_exact_dedup_stream(spark, src, sink, ckpt, schema)
    q.awaitTermination()

    out1 = spark.read.parquet(sink)
    assert out1.count() == 2  # one of the two alphas survives

    wave2 = spark.createDataFrame(
        [(3, "alpha text"), (4, "gamma text")], "doc_id long, text string"
    )
    wave2.write.mode("append").parquet(src)
    q = start_exact_dedup_stream(spark, src, sink, ckpt, schema)
    q.awaitTermination()

    out2 = spark.read.parquet(sink).orderBy("doc_id").collect()
    ids = [r.doc_id for r in out2]
    assert 4 in ids, "new unique text must pass"
    assert 3 not in ids, "cross-restart duplicate must be suppressed by state"
    assert len(out2) == 3


def test_streaming_band_keys_match_batch(spark, tmp_path):
    """Streaming band keys == batch band keys for the same docs."""
    from fastcdc_rs_spark.pipeline import DedupConfig, unit_hashes
    from fastcdc_rs_spark.operators.minhash import minhash_signatures
    from fastcdc_rs_spark.streaming.dedup_stream import stream_band_keys
    import pyspark.sql.functions as F

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(50)
    src = str(tmp_path / "src2")
    docs.select("doc_id", "text").write.parquet(src)
    cfg = DedupConfig()

    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    sink = str(tmp_path / "bands")
    q = (
        stream_band_keys(stream, cfg)
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = {
        (r.doc_id, r.band_id, r.band_hash)
        for r in spark.read.parquet(sink).collect()
    }
    signed = minhash_signatures(
        unit_hashes(docs.select("doc_id", "text"), cfg),
        k=cfg.shingle_k, n_perms=cfg.n_perms, bands=cfg.bands,
        rows=cfg.rows, seed=cfg.minhash_seed,
    )
    want = {
        (r.doc_id, r.band_id, r.band_hash)
        for r in signed.select(
            "doc_id", F.posexplode("bands").alias("band_id", "band_hash")
        ).collect()
    }
    assert got == want and len(got) == 50 * cfg.bands


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """Within-horizon duplicates are suppressed; the operator runs as a
    real streaming query with watermark-evicted state."""
    import datetime as dt

    from fastcdc_rs_spark.streaming.dedup_stream import (
        stream_exact_dedup_within_watermark,
    )

    src = str(tmp_path / "wsrc")
    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    rows = [
        (0, t0, "alpha"),
        (1, t0 + dt.timedelta(minutes=5), "alpha"),   # dup within horizon
        (2, t0 + dt.timedelta(minutes=10), "beta"),
    ]
    spark.createDataFrame(
        rows, "doc_id long, warc_ts timestamp, text string"
    ).write.parquet(src)

    stream = spark.readStream.schema(
        "doc_id long, warc_ts timestamp, text string"
    ).parquet(src)
    sink = str(tmp_path / "wsink")
    q = (
        stream_exact_dedup_within_watermark(stream, horizon="1 hour")
        .select("doc_id", "text_hash")
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "wckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = sorted(r.doc_id for r in spark.read.parquet(sink).collect())
    # one survivor per text within the horizon (which of the two "alpha"
    # docs survives is not defined within a micro-batch), plus "beta"
    assert len(out) == 2 and 2 in out and (0 in out) != (1 in out), (
        f"exactly one alpha + beta expected: {out}"
    )


def test_incremental_dedup_job_cross_era_pairs(spark, tmp_path):
    """Wave-2 near-dup of a wave-1 doc is found by joining new band keys
    against the accumulated index; re-running with no new files adds
    nothing (checkpoint + idempotent index)."""
    import sys

    sys.path.insert(0, "/root/repo/jobs")
    from incremental_dedup_job import run_incremental_candidates

    from fastcdc_rs_spark.corpus import corpus_pandas

    src = str(tmp_path / "isrc")
    work = str(tmp_path / "iwork")

    pdf = corpus_pandas(n_docs=10, seed=21, mean_words=120)
    pdf = pdf.reset_index(drop=True)
    pdf["doc_id"] = pdf.index.astype("int64")
    texts = list(pdf["text"])
    w1 = spark.createDataFrame(
        list(zip(range(10), texts)), "doc_id long, text string"
    )
    w1.write.mode("append").parquet(src)
    run_incremental_candidates(spark, src, work)

    # wave 2: doc 100 is an exact near-dup of doc 3 (same text → same bands)
    w2 = spark.createDataFrame([(100, texts[3])], "doc_id long, text string")
    w2.write.mode("append").parquet(src)
    run_incremental_candidates(spark, src, work)

    pairs = {
        (r.a, r.b)
        for r in spark.read.parquet(f"{work}/pairs").dropDuplicates().collect()
    }
    assert (3, 100) in pairs, f"cross-era pair missing: {pairs}"

    # no-op rerun: nothing new appended
    n_before = spark.read.parquet(f"{work}/pairs").count()
    run_incremental_candidates(spark, src, work)
    assert spark.read.parquet(f"{work}/pairs").count() == n_before


def test_streaming_contamination_matches_batch(spark, tmp_path):
    # Streaming decontamination (round-5): stateless broadcast-gram map,
    # emitted append-mode across micro-batches, must equal the batch
    # operator row-for-row — including zero-hit docs, short docs (the
    # whole-sequence n-gram rule), and docs arriving in a later batch.
    from fastcdc_rs_spark.operators.dedup import contamination_flags
    from fastcdc_rs_spark.streaming.dedup_stream import (
        stream_contamination_flags,
    )

    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta"), (101, "epsilon zeta eta")],
        "doc_id long, text string",
    )
    batch1 = [
        (1, "alpha beta gamma delta rest of page text here"),  # hit
        (2, "totally clean document with no overlap at all"),  # clean
        (3, "eta"),  # short doc: whole sequence as one gram, no hit
    ]
    batch2 = [
        (4, "zz alpha beta gamma delta yy epsilon zeta eta xx"),  # 2 hits
        (5, "epsilon zeta eta"),  # short benchmark doc, exact match
    ]
    n = 4  # 4-gram rule at test scale
    schema = "doc_id long, text string"
    src = str(tmp_path / "cont_src")
    sink = str(tmp_path / "cont_sink")
    ckpt = str(tmp_path / "cont_ckpt")

    def run_once():
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            stream_contamination_flags(stream, bench, n=n)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    for i, b in enumerate((batch1, batch2)):
        spark.createDataFrame(b, schema).coalesce(1).write.mode(
            "overwrite" if i == 0 else "append"
        ).parquet(src)
        run_once()

    got = {
        (r.doc_id, r.n_hits, r.contaminated)
        for r in spark.read.parquet(sink).collect()
    }
    all_docs = spark.createDataFrame(batch1 + batch2, schema)
    want = {
        (r.doc_id, r.n_hits, r.contaminated)
        for r in contamination_flags(all_docs, bench, n=n).collect()
    }
    assert got == want, (got, want)
    assert (5, 1, True) in got and (2, 0, False) in got


def _line_stream_once(spark, src, out_dir, ckpt, **kw):
    from fastcdc_rs_spark.streaming.line_dedup_stream import stream_kept_lines

    stream = spark.readStream.schema(
        "doc_id long, warc_ts timestamp, text string"
    ).parquet(src)
    q = (
        stream_kept_lines(stream, watermark="10 minutes", **kw)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)


def test_streaming_line_dedup_matches_batch_single_window(spark, tmp_path):
    """C6's streaming twin: on data sharing one micro-batch the stream's
    kept-lines sink, rebuilt into documents, equals the batch operator
    exactly (canonical = global min (doc_id, pos) in both)."""
    import datetime as dt

    from fastcdc_rs_spark.operators.dedup import remove_duplicate_lines
    from fastcdc_rs_spark.streaming.line_dedup_stream import rebuild_cleaned_docs

    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    rows = [
        # doc 1: within-doc repeat ("dup") + shared boilerplate
        (1, t0, "header\nbody one\ndup\ndup"),
        # doc 2: shares "header" (dropped — doc 1 pos 0 wins) + unique
        (2, t0, "header\nbody two"),
        # doc 3: all lines already seen -> cleaned_text empty
        (3, t0, "header\ndup"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, warc_ts timestamp, text string")
    src, out_dir, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
    docs.coalesce(1).write.parquet(src)
    _line_stream_once(spark, src, out_dir, ckpt)

    kept = spark.read.parquet(out_dir)
    got = {
        tuple(r)
        for r in rebuild_cleaned_docs(docs, kept).collect()
    }
    want = {
        tuple(r)
        for r in remove_duplicate_lines(docs.select("doc_id", "text")).collect()
    }
    assert got == want, (got, want)
    # and the batch semantics themselves: doc 3 fully deduplicated
    by_id = {r[0]: r for r in got}
    assert by_id[3][3] == "" and by_id[3][1:3] == (2, 0)
    assert by_id[1][3] == "header\nbody one\ndup"


def test_streaming_line_dedup_ttl_state(spark, tmp_path):
    """Cross-batch suppression inside the TTL horizon, the documented
    first-batch-wins approximation, and state expiry: a line re-arriving
    after the watermark passes canonical_ts + ttl is a fresh first
    occurrence."""
    import datetime as dt

    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    m = dt.timedelta(minutes=1)
    schema = "doc_id long, warc_ts timestamp, text string"
    src, out_dir, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))

    waves = [
        [(10, t0, "shared\nu1")],
        # within TTL: "shared" suppressed even though doc 5 < doc 10 —
        # append emission is final (the one streaming approximation)
        [(5, t0 + 5 * m, "shared\nu2")],
        [(98, t0 + 100 * m, "pusher1")],   # watermark -> t0+90m > ttl end
        [(99, t0 + 101 * m, "pusher2")],   # timeout fires (no "shared" data)
        [(30, t0 + 96 * m, "shared")],     # state expired -> fresh emit
    ]
    for wave in waves:
        spark.createDataFrame(wave, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        _line_stream_once(spark, src, out_dir, ckpt, ttl_minutes=60)

    kept = spark.read.parquet(out_dir).collect()
    by_line = {}
    for r in kept:
        by_line.setdefault(r.line, []).append(r.doc_id)
    assert by_line["u1"] == [10] and by_line["u2"] == [5]
    assert sorted(by_line["shared"]) == [10, 30], by_line
    assert by_line["pusher1"] == [98] and by_line["pusher2"] == [99]
