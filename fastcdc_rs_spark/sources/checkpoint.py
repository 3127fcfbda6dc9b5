"""Per-stage checkpoint/resume (SURVEY.md §2.B B13).

Every pipeline stage can materialize its output to parquet with a manifest
recording (stage name, config fingerprint, row count, completion marker).
A re-run with the same config fingerprint reuses the completed stage
instead of recomputing — so a killed pipeline resumes idempotently from
the last completed stage, and a config change invalidates exactly the
stages whose inputs changed.

On a cluster the same layout maps to an Iceberg table per stage with
snapshot metadata as the manifest; the parquet+JSON form keeps the sandbox
dependency-free while exercising identical semantics (atomic completion
marker written after the data, resume by fingerprint match).
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

__all__ = ["StageCheckpoint", "CheckpointedRun"]


@dataclass
class StageCheckpoint:
    root: Path
    stage: str
    fingerprint: str

    @property
    def data_path(self) -> Path:
        return self.root / self.stage / "data"

    @property
    def manifest_path(self) -> Path:
        return self.root / self.stage / "_MANIFEST.json"

    def is_complete(self) -> bool:
        if not self.manifest_path.exists():
            return False
        try:
            manifest = json.loads(self.manifest_path.read_text())
        except (OSError, json.JSONDecodeError):
            return False
        return manifest.get("complete") and manifest.get("fingerprint") == self.fingerprint

    def write(self, df: DataFrame, partition_by: list[str] | None = None) -> dict:
        """Materialize the stage; the manifest (with the completion marker)
        is written only after the parquet commit succeeds — a crash mid-write
        leaves an incomplete stage that re-runs."""
        self.data_path.parent.mkdir(parents=True, exist_ok=True)
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(str(self.data_path))
        # per-partition lineage: row count of every written part file, so a
        # resumed/audited run can verify the stage file-by-file (and a
        # cluster deployment maps this 1:1 onto Iceberg manifest entries)
        import pyspark.sql.functions as F

        written = df.sparkSession.read.parquet(str(self.data_path))
        per_file = {
            r["file"].rsplit("/", 1)[-1]: r["rows"]
            for r in written.groupBy(
                F.input_file_name().alias("file")
            ).agg(F.count(F.lit(1)).alias("rows")).collect()
        }
        manifest = {
            "stage": self.stage,
            "fingerprint": self.fingerprint,
            "rows": sum(per_file.values()),
            "partitions": per_file,
            "completed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            "complete": True,
        }
        self.manifest_path.write_text(json.dumps(manifest, indent=2))
        return manifest

    def read(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(str(self.data_path))


class CheckpointedRun:
    """Orchestrates a multi-stage run with resume.

    >>> run = CheckpointedRun(spark, "/tmp/ckpt", config_fingerprint)
    >>> chunks = run.stage("chunks", lambda: chunk_documents(docs, cfg))
    """

    def __init__(self, spark: SparkSession, root: str | Path, fingerprint: str):
        self.spark = spark
        self.root = Path(root)
        self.fingerprint = fingerprint
        self.events: list[dict] = []

    def stage(self, name: str, build, partition_by: list[str] | None = None) -> DataFrame:
        ckpt = StageCheckpoint(self.root, name, self.fingerprint)
        if ckpt.is_complete():
            self.events.append({"stage": name, "action": "resumed"})
            return ckpt.read(self.spark)
        df = build()
        manifest = ckpt.write(df, partition_by)
        self.events.append({"stage": name, "action": "computed", "rows": manifest["rows"]})
        return ckpt.read(self.spark)
