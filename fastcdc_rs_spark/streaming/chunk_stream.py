"""Structured Streaming chunking (reference StreamCDC/AsyncStreamCDC analog).

The reference's streaming entry points (fastcdc-rs src/v2020/mod.rs:741-915,
src/v2020/async_stream_cdc.rs) pull *bytes* incrementally because a single
input can exceed memory. In the Spark engine the unit of arrival is a
*document* (web pages ≪ executor memory), so streaming is incremental
document arrival: ``readStream`` over a parquet/file source directory,
the identical chunking UDF per micro-batch, ``writeStream`` to the chunks
sink. The buffer/drain machinery of StreamCDC has no analog — chunk state
never crosses documents, so micro-batches need no cross-batch state.

For blobs larger than memory the batch path is ``spark.read.format
("binaryFile")`` + per-file kernel over partitioned byte ranges — not
needed for the web-page data model (documented limitation).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType

from ..kernel import ChunkerConfig
from ..operators.chunk import chunks_udf

__all__ = ["stream_chunk_documents", "start_chunk_stream"]


def stream_chunk_documents(
    stream_df: DataFrame,
    cfg: ChunkerConfig,
    content_col: str = "text",
    id_cols: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """Chunk a streaming documents DataFrame → streaming chunks rows."""
    from ..functions.plan_safe import posexplode_once

    return (
        posexplode_once(
            stream_df.select(
                *id_cols, chunks_udf(cfg)(F.col(content_col)).alias("chunks")
            ),
            "chunks", "chunk_idx", "c", keep=list(id_cols),
        )
        .select(
            *id_cols,
            "chunk_idx",
            F.col("c.hash").alias("hash"),
            F.col("c.offset").alias("offset"),
            F.col("c.length").alias("length"),
        )
    )


def start_chunk_stream(
    spark: SparkSession,
    source_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
    schema: StructType,
    cfg: ChunkerConfig,
    content_col: str = "text",
    id_cols: tuple[str, ...] = ("doc_id",),
) -> StreamingQuery:
    """File-arrival streaming: new parquet files in ``source_dir`` are
    chunked and appended to ``sink_dir`` exactly-once (checkpointed)."""
    stream = (
        spark.readStream.schema(schema).parquet(source_dir)
    )
    chunks = stream_chunk_documents(stream, cfg, content_col, id_cols)
    return (
        chunks.writeStream.format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
