"""Bucketed chunk-index join must plan with NO exchange on either side
(co-located join — the recurring-join pattern for a persistent dedup
index at CC scale)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from fastcdc_rs_spark.sources.bucketing import read_table, write_bucketed


def test_bucketed_join_no_exchange(spark):
    index = spark.range(0, 5000).select(
        F.col("id").alias("hash"), (F.col("id") % 97).alias("doc_id")
    )
    incoming = spark.range(2500, 7500).select(
        F.col("id").alias("hash"), (F.col("id") % 89).alias("new_doc")
    )
    for t in ("chunk_index_b", "incoming_chunks_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    # at test size the planner would broadcast (and skip bucketing); at
    # index scale both sides are huge and the join is shuffle-bound —
    # disable broadcast to plan the scale shape
    bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        write_bucketed(index, "chunk_index_b", "hash", n_buckets=8)
        write_bucketed(incoming, "incoming_chunks_b", "hash", n_buckets=8)
        joined = read_table(spark, "chunk_index_b").join(
            read_table(spark, "incoming_chunks_b"), "hash"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan  # co-located: no shuffle at all
        assert "Bucketed: true" in plan, plan
        assert joined.count() == 2500
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
        for t in ("chunk_index_b", "incoming_chunks_b"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
