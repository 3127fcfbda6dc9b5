"""Incremental near-duplicate candidate generation over streaming ingestion.

The continuous-ingestion counterpart of jobs/dedup_job.py: each arriving
micro-batch of documents is signed with the same MinHash/LSH kernel as the
batch pipeline, its band keys are joined against the ACCUMULATED band
index (history never rescanned — only 8-byte keys per doc band), and the
resulting candidate pairs are appended for downstream verification/CC.

Plan shape per micro-batch (foreachBatch):
  new bands  ⋈  index on (band_id, band_hash)   -> cross-era candidates
  new bands self-⋈                              -> within-batch candidates
  index      <- append new bands

foreachBatch is at-least-once under retries; BOTH sinks (band index and
pairs) are therefore idempotent per batch id via overwrite-by-batch
subdirectories — a retried micro-batch replaces its own output. Readers
load the parent dir (Spark partition discovery exposes `batch`).

Two drivers share the per-batch machinery (``_process_bands_batch``):
``run_incremental_candidates`` (Structured Streaming file arrival) and
``run_incremental_from_catalog`` (snapshot-diff reads via
``catalog.read_changes`` — the Iceberg incremental-scan pattern).

Env / args:
  INCDEDUP_SOURCE   streaming source dir (parquet docs, schema doc_id/text)
  INCDEDUP_WORK     work dir (band_index/, pairs/, checkpoint/)
"""

from __future__ import annotations

# runnable both via spark-submit --py-files and as a plain script
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from fastcdc_rs_spark.pipeline import DedupConfig
from fastcdc_rs_spark.session import spark_session
from fastcdc_rs_spark.streaming.dedup_stream import stream_band_keys

__all__ = ["run_incremental_candidates", "run_incremental_from_catalog"]


def _process_bands_batch(
    batch_df: DataFrame, tag: str, index_path: str, pairs_path: str
) -> None:
    """One incremental unit of work, idempotent per ``tag``: append the
    batch's band keys to the index (overwrite-by-tag subdir), emit
    cross-era pairs (new docs ⋈ prior index keys) + within-batch pairs.
    Shared by the streaming (tag = micro-batch id) and catalog-snapshot
    (tag = snapshot range) drivers."""
    batch_dir = os.path.join(index_path, f"batch={tag}")
    batch_df.write.mode("overwrite").parquet(batch_dir)

    new = batch_df.select(F.col("doc_id").alias("b"), "band_id", "band_hash")
    prior_dirs = [
        os.path.join(index_path, d)
        for d in os.listdir(index_path)
        if d.startswith("batch=") and d != f"batch={tag}"
    ]
    pair_frames = []
    if prior_dirs:
        idx = batch_df.sparkSession.read.parquet(*prior_dirs).select(
            F.col("doc_id").alias("a"), "band_id", "band_hash"
        )
        pair_frames.append(
            idx.join(new, ["band_id", "band_hash"])
            .where(F.col("a") != F.col("b"))
            .select(
                F.least("a", "b").alias("a"),
                F.greatest("a", "b").alias("b"),
            )
        )
    left = batch_df.select(F.col("doc_id").alias("a"), "band_id", "band_hash")
    pair_frames.append(
        left.join(new, ["band_id", "band_hash"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
    )
    pairs = pair_frames[0]
    for f in pair_frames[1:]:
        pairs = pairs.unionByName(f)
    # idempotent under retries: overwrite-by-tag subdir mirrors the index
    pairs.distinct().write.mode("overwrite").parquet(
        os.path.join(pairs_path, f"batch={tag}")
    )


def run_incremental_candidates(
    spark: SparkSession,
    source_dir: str,
    work_dir: str,
    schema: str = "doc_id long, text string",
    cfg: DedupConfig | None = None,
) -> None:
    """Process all currently-available source files (availableNow), then
    return. Re-invoking resumes from the streaming checkpoint."""
    cfg = cfg or DedupConfig()
    index_path = os.path.join(work_dir, "band_index")
    pairs_path = os.path.join(work_dir, "pairs")
    ckpt = os.path.join(work_dir, "checkpoint")

    stream = spark.readStream.schema(schema).parquet(source_dir)
    bands = stream_band_keys(stream, cfg)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        batch_df = batch_df.persist()
        try:
            _process_bands_batch(batch_df, str(batch_id), index_path, pairs_path)
        finally:
            batch_df.unpersist()

    q = (
        bands.writeStream.foreachBatch(process)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_incremental_from_catalog(
    spark: SparkSession,
    catalog,
    table: str,
    work_dir: str,
    cfg: DedupConfig | None = None,
) -> dict:
    """Catalog-snapshot-driven incremental ingestion: process only the
    rows added since the last processed snapshot (``catalog.read_changes``
    — under COW overwrites that is exactly the rewritten/new partitions)
    through the same band-index machinery as the streaming path.

    State (``_snapshot_state.json`` in ``work_dir``) is a two-phase
    record: before processing, the target snapshot is written as
    ``pending`` (write-ahead intent, atomic); after the idempotent
    overwrite-by-tag outputs land, the state flips to
    ``{"snapshot_id": cur}``. A crash anywhere between intent and flip
    re-runs the SAME pinned range into the SAME tag on retry — even if
    newer snapshots were committed meanwhile — so outputs are
    exactly-once. Reads are pinned to the captured snapshot id
    (``catalog.read(table, cur)``), never "latest", so a concurrent
    commit between ``snapshots()`` and the Spark action cannot smuggle
    unrecorded rows into the batch. This is the Iceberg
    incremental-scan consumption pattern at cluster scale.
    """
    import json

    cfg = cfg or DedupConfig()
    os.makedirs(work_dir, exist_ok=True)
    index_path = os.path.join(work_dir, "band_index")
    pairs_path = os.path.join(work_dir, "pairs")
    state_path = os.path.join(work_dir, "_snapshot_state.json")

    def _write_state(payload: dict) -> None:
        tmp = state_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(payload, f)
        os.replace(tmp, state_path)

    last, pending = None, None
    if os.path.exists(state_path):
        state = json.load(open(state_path))
        last, pending = state.get("snapshot_id"), state.get("pending")
    if pending is not None:
        cur = pending  # crashed mid-run: finish the pinned range first
    else:
        snaps = catalog.snapshots(table)
        if not snaps:
            return {"processed_snapshots": 0, "docs": 0}
        cur = snaps[-1]["snapshot_id"]
        if last == cur:
            return {"processed_snapshots": 0, "docs": 0, "snapshot_id": cur}
        _write_state({"snapshot_id": last, "pending": cur})
    docs = (
        catalog.read(table, cur)
        if last is None
        else catalog.read_changes(table, last, cur)
    )
    bands = stream_band_keys(docs, cfg).persist()
    try:
        n_docs = bands.select("doc_id").distinct().count()
        _process_bands_batch(
            bands, f"snap_{cur}", index_path, pairs_path
        )
    finally:
        bands.unpersist()
    _write_state({"snapshot_id": cur})
    return {"processed_snapshots": 1, "docs": n_docs, "snapshot_id": cur}


def main() -> int:
    src = os.environ.get("INCDEDUP_SOURCE", "/tmp/incdedup_src")
    work = os.environ.get("INCDEDUP_WORK", "/tmp/incdedup_work")
    spark = spark_session(app="fastcdc-incremental-dedup")
    run_incremental_candidates(spark, src, work)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
