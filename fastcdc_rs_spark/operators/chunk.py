"""Chunking stage: documents DataFrame → per-document FastCDC chunks.

Spark mapping of the reference's three entry points (SURVEY.md §3): the
in-memory chunker (fastcdc-rs src/v2020/mod.rs:522-663) becomes a vectorized
Arrow/pandas UDF over a string/binary column; streaming variants
(StreamCDC/AsyncStreamCDC, src/v2020/mod.rs:741-915) need no buffer
machinery because a web page fits in one row — incremental arrival is
handled at the *document* level by Structured Streaming (streaming/).

Config is computed once per executor (broadcast via UDF closure), the
analog of ``rechunk``'s amortization (src/v2020/mod.rs:627-632); the
per-batch work is one ``chunk_batch`` call (kernel/batch.py).

Hashes are u64 bit patterns stored in Spark ``LongType`` via signed
reinterpretation (documented here, reversed by ``unsigned_hash_expr``).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from ..kernel import ChunkerConfig
from ..kernel.batch import chunk_batch, chunk_batch_columnar

__all__ = [
    "CHUNK_SCHEMA",
    "chunk_documents",
    "chunks_udf",
    "chunk_hashes_udf",
    "unsigned_hash_expr",
]

CHUNK_SCHEMA = ArrayType(
    StructType(
        [
            StructField("hash", LongType(), False),
            StructField("offset", LongType(), False),
            StructField("length", IntegerType(), False),
        ]
    )
)

_U64_MOD = 1 << 64
_I64_MAX = (1 << 63) - 1


def _to_signed(h: int) -> int:
    return h - _U64_MOD if h > _I64_MAX else h


def unsigned_hash_expr(col: str | Column) -> Column:
    """Recover the u64 bit pattern of a chunk hash as a DecimalType(20,0)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c < 0, c.cast("decimal(20,0)") + F.lit(18446744073709551616).cast("decimal(20,0)")).otherwise(
        c.cast("decimal(20,0)")
    )


def chunks_udf(cfg: ChunkerConfig):
    """Pandas UDF: text/binary column → array<struct<hash,offset,length>>.

    The per-batch path is fully vectorized: bytes are stacked and chunked by
    ``chunk_batch`` (no per-row Python in the scan loop); only the small
    per-chunk result tuples are materialized row-side.
    """

    @F.pandas_udf(CHUNK_SCHEMA)
    def _chunk(data: pd.Series) -> pd.Series:
        bufs = []
        for v in data:
            if v is None:
                bufs.append(np.array([], dtype=np.uint8))
            elif isinstance(v, (bytes, bytearray)):
                bufs.append(np.frombuffer(v, dtype=np.uint8))
            else:
                bufs.append(np.frombuffer(str(v).encode("utf-8"), dtype=np.uint8))
        results = chunk_batch(bufs, cfg)
        return pd.Series(
            [
                [
                    {"hash": _to_signed(h), "offset": o, "length": ln}
                    for h, o, ln in doc_chunks
                ]
                for doc_chunks in results
            ]
        )

    return _chunk


def _to_bufs(data: pd.Series) -> list[np.ndarray]:
    bufs = []
    for v in data:
        if v is None:
            bufs.append(np.array([], dtype=np.uint8))
        elif isinstance(v, (bytes, bytearray)):
            bufs.append(np.frombuffer(v, dtype=np.uint8))
        else:
            bufs.append(np.frombuffer(str(v).encode("utf-8"), dtype=np.uint8))
    return bufs


def chunk_hashes_udf(cfg: ChunkerConfig):
    """Pandas UDF: text/binary column → array<long> of chunk gear hashes.

    The pipeline hot path (unit_hashes → shingles → MinHash) needs only the
    hash sequence, so this skips the per-chunk struct materialization of
    ``chunks_udf`` entirely: the columnar kernel result is viewed as signed
    int64 and split per doc — zero per-chunk Python objects end-to-end.
    """

    @F.pandas_udf(ArrayType(LongType()))
    def _hashes(data: pd.Series) -> pd.Series:
        bufs = _to_bufs(data)
        if not bufs:
            return pd.Series([], dtype=object)
        counts, hashes, _, _ = chunk_batch_columnar(bufs, cfg)
        signed = hashes.view(np.int64)
        return pd.Series(np.split(signed, np.cumsum(counts)[:-1]))

    return _hashes


def chunk_documents(
    docs: DataFrame,
    cfg: ChunkerConfig,
    content_col: str = "text",
    id_cols: tuple[str, ...] = ("doc_id",),
    exploded: bool = True,
) -> DataFrame:
    """Chunk ``content_col``; return either a per-doc array column
    (``chunks``) or the exploded chunks table
    ``(id..., chunk_idx, hash, offset, length)``.
    """
    with_arr = docs.select(*id_cols, chunks_udf(cfg)(F.col(content_col)).alias("chunks"))
    if not exploded:
        return with_arr
    return with_arr.select(
        *id_cols, F.posexplode("chunks").alias("chunk_idx", "c")
    ).select(
        *id_cols,
        "chunk_idx",
        F.col("c.hash").alias("hash"),
        F.col("c.offset").alias("offset"),
        F.col("c.length").alias("length"),
    )
