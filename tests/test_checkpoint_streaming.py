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
