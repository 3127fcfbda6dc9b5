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
