"""SparkSession factory with scale-oriented defaults.

Local-mode testing stands in for a multi-executor cluster; every config here
is one that also holds on a 1000-executor deployment:

* AQE on (runtime coalescing + skew-join splitting — SURVEY.md §2.B B12);
* Arrow-batched Python UDFs with a bounded batch size so the chunking
  kernel's stacked-window working set stays cache-sized per worker;
* shuffle partitions sized to cores locally (cluster deployments override
  via ``spark.sql.shuffle.partitions`` / AQE coalescing);
* glibc malloc tuned in Python workers to retain large numpy arenas —
  first-touch page faults are catastrophically slow in virtualized
  environments, so workers must not munmap/re-fault their buffers on
  every Arrow batch.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = ["spark_session", "default_parallelism"]

# Keep numpy worker arenas resident (see module docstring).
_WORKER_ENV = {
    "MALLOC_MMAP_THRESHOLD_": "1073741824",
    "MALLOC_TRIM_THRESHOLD_": "1073741824",
}


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))


def spark_session(
    app: str = "fastcdc-rs-spark",
    cores: int | str | None = None,
    shuffle_partitions: int | None = None,
    arrow_batch: int = 2048,
    extra: dict[str, str] | None = None,
) -> SparkSession:
    cores = cores if cores is not None else default_parallelism()
    n = default_parallelism() if cores == "*" else int(cores)
    for k, v in _WORKER_ENV.items():
        os.environ.setdefault(k, v)

    builder = (
        SparkSession.builder.appName(app)
        .master(f"local[{cores}]")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or max(2 * n, 8)))
        # Broadcast-join threshold raised from the 10 MB default: the
        # pipeline's narrow size tables (~16 B/doc) and shingle-set
        # tables (~80 B/doc) sit in the 10-100 MB band at bench scales,
        # where a broadcast beats two sort-merge exchanges — measured
        # round 7 at 800k docs: full pipeline 17.5-20.2 s (10 MB) vs
        # 15.9-17.6 s (128 MB). Scale-adaptive by construction: the
        # threshold only fires when the built relation actually is
        # < 128 MB (cluster-sane per the optimization guide — "a few
        # hundred MB is usually fine"); at 100 TB these tables blow past
        # it and the planner falls back to sort-merge exactly as before.
        # Override via env for clusters with tight driver memory.
        .config(
            "spark.sql.autoBroadcastJoinThreshold",
            os.environ.get("SPARK_GRAFT_BCAST_THRESHOLD", "128m"),
        )
        .config("spark.default.parallelism", str(n))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(arrow_batch))
        .config("spark.python.worker.reuse", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.driver.maxResultSize", "4g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in _WORKER_ENV.items():
        builder = builder.config(f"spark.executorEnv.{k}", v)
    if extra:
        for k, v in extra.items():
            builder = builder.config(k, v)
    return builder.getOrCreate()
