"""Bucketed tables for co-located joins (the persistent-index pattern).

At CC scale the chunk-fingerprint index and the band-key index are
long-lived tables that every incremental batch joins against. Writing
them BUCKETED on the join key (``bucketBy`` + ``sortBy``) pre-partitions
the data on disk, so the repeated join needs NO exchange of the big
side — Spark matches bucket files directly (a co-located sort-merge
join). That turns the dominant recurring shuffle of an incremental
dedup deployment into a scan; tests/test_bucketed_join.py pins the
zero-Exchange plan.

The same tables map to Iceberg ``bucket(N, col)`` partition transforms
on a cluster (sources/table.py holds the catalog abstraction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_bucketed", "read_table"]


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 64,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed+sorted managed table on ``bucket_col``.

    ``n_buckets`` must match between tables that will be joined (equal
    bucketing is what removes both exchanges).
    """
    (
        df.write.mode(mode)
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
        .saveAsTable(table)
    )


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
