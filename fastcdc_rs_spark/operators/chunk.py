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
from ..kernel.batch import chunk_batch_columnar

__all__ = [
    "CHUNK_SCHEMA",
    "CHUNK_ARRAYS_SCHEMA",
    "cdc_dedup_stats",
    "chunk_documents",
    "chunk_arrays_udf",
    "chunks_expr",
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

def unsigned_hash_expr(col: str | Column) -> Column:
    """Recover the u64 bit pattern of a chunk hash as a DecimalType(20,0)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c < 0, c.cast("decimal(20,0)") + F.lit(18446744073709551616).cast("decimal(20,0)")).otherwise(
        c.cast("decimal(20,0)")
    )


CHUNK_ARRAYS_SCHEMA = StructType(
    [
        StructField("hashes", ArrayType(LongType()), False),
        StructField("offsets", ArrayType(LongType()), False),
        StructField("lengths", ArrayType(IntegerType()), False),
    ]
)


def chunk_arrays_udf(cfg: ChunkerConfig):
    """Pandas UDF: text/binary column → struct-of-arrays
    ``(hashes array<long>, offsets array<long>, lengths array<int>)``.

    Fully columnar: the kernel result arrays are viewed/split with numpy
    and handed to Arrow as ndarray cells — no per-chunk Python objects
    anywhere. The array-of-structs view (``CHUNK_SCHEMA``) is rebuilt
    JVM-side by ``chunks_expr``/``chunk_documents`` via ``arrays_zip``.
    """

    @F.pandas_udf(CHUNK_ARRAYS_SCHEMA)
    def _chunk(data: pd.Series) -> pd.DataFrame:
        bufs = _to_bufs(data)
        if not bufs:
            return pd.DataFrame({"hashes": [], "offsets": [], "lengths": []})
        counts, hashes, offs, lns = chunk_batch_columnar(bufs, cfg)
        splits = np.cumsum(counts)[:-1]
        return pd.DataFrame(
            {
                "hashes": pd.Series(np.split(hashes.view(np.int64), splits)),
                "offsets": pd.Series(np.split(offs, splits)),
                "lengths": pd.Series(np.split(lns.astype(np.int32), splits)),
            }
        )

    return _chunk


def chunks_expr(ca: Column) -> Column:
    """JVM: struct-of-arrays column → array<struct<hash,offset,length>>."""
    return F.arrays_zip(
        ca["hashes"].alias("hash"),
        ca["offsets"].alias("offset"),
        ca["lengths"].alias("length"),
    )


def chunks_udf(cfg: ChunkerConfig):
    """text/binary column → array<struct<hash,offset,length>> (CHUNK_SCHEMA).

    Composition of ``chunk_arrays_udf`` (Arrow-columnar Python) and the
    JVM ``arrays_zip`` — same public contract as before, zero per-chunk
    Python object materialization.
    """
    inner = chunk_arrays_udf(cfg)

    def apply(col: str | Column) -> Column:
        return chunks_expr(inner(col))

    return apply


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
    # one UDF evaluation (aliased column), array-of-structs built JVM-side
    with_sa = docs.select(
        *id_cols, chunk_arrays_udf(cfg)(F.col(content_col)).alias("ca")
    )
    with_arr = with_sa.select(
        *id_cols, chunks_expr(F.col("ca")).alias("chunks")
    )
    if not exploded:
        return with_arr
    # posexplode_outer + post-filter instead of posexplode: the plain
    # generator makes Catalyst infer a `size(chunks) > 0` filter and push
    # it BELOW the projection, duplicating the kernel UDF evaluation
    # (two ArrowEvalPython nodes = 2x the chunking work). The outer form
    # needs no such filter; empty docs yield one null row dropped by the
    # cheap post-generate filter. Plan pinned by tests (1 ArrowEvalPython).
    return with_arr.select(
        *id_cols, F.posexplode_outer("chunks").alias("chunk_idx", "c")
    ).where(F.col("chunk_idx").isNotNull()).select(
        *id_cols,
        "chunk_idx",
        F.col("c.hash").alias("hash"),
        F.col("c.offset").alias("offset"),
        F.col("c.length").alias("length"),
    )


def cdc_dedup_stats(
    docs: DataFrame,
    cfg: ChunkerConfig,
    content_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """One-row CDC storage-dedup summary — the measure the reference
    chunker exists for (fastcdc-rs README: content-defined chunking for
    data deduplication): if every repeated chunk were stored once in a
    hash-addressed store, how many bytes survive?

    Columns: (n_docs, total_bytes, n_chunks, n_unique_chunks,
    unique_bytes, dedup_ratio) with dedup_ratio = 1 - unique/total
    (0 = nothing shared). Chunks are identified by (hash, length) —
    the content-addressed-store model. Rounded to 6 for comparisons.

    Scale shape: one groupBy on the chunk hash (map-side combined) and
    one global aggregate; no joins, no row-level Python beyond the
    Arrow chunk kernel.
    """
    chunks = chunk_documents(docs, cfg, content_col=content_col, id_cols=(id_col,))
    per_chunk = chunks.groupBy("hash", "length").agg(
        F.count(F.lit(1)).alias("copies")
    )
    uniq = per_chunk.agg(
        F.count(F.lit(1)).alias("n_unique_chunks"),
        F.sum("length").alias("unique_bytes"),
        F.sum(F.col("length") * F.col("copies")).alias("total_bytes"),
        F.sum("copies").alias("n_chunks"),
    )
    n_docs = docs.select(F.count(F.lit(1)).alias("n_docs"))
    return n_docs.crossJoin(uniq).select(
        "n_docs",
        "total_bytes",
        "n_chunks",
        "n_unique_chunks",
        "unique_bytes",
        F.round(
            F.lit(1.0)
            - F.col("unique_bytes").cast("double") / F.col("total_bytes").cast("double"),
            6,
        ).alias("dedup_ratio"),
    )
