"""Shingling stage (SURVEY.md §2.B B4): documents/chunks → shingle-hash sets.

Three config-selected modes:

* ``chunk``  — k-grams of consecutive FastCDC chunk hashes (the CDC-native
  mode: robust to insertions because chunk boundaries resynchronize);
* ``token`` — k-grams of whitespace tokens of ``text``;
* ``char``  — k-grams of characters of ``text``.

All are pure Spark built-ins (``transform`` + ``slice`` over arrays,
``xxhash64`` for shingle hashing) — JVM-side, no Python. ``xxhash64`` here
feeds the *production* MinHash kernel; the oracle-checked SQL variants in
__spark_entry__ use the portable md5-based hash instead (functions/).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

__all__ = ["shingles_from_chunks", "shingles_from_text", "shingle_sets"]


def _kgram_hashes(arr: Column, k: int) -> Column:
    """Distinct xxhash64 values of all k-gram slices of an array column."""
    n = F.size(arr)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(n - F.lit(k - 1), F.lit(0))),
            lambda i: F.xxhash64(F.concat_ws("\x1f", F.slice(arr, i, k))),
        )
    )


def shingles_from_chunks(chunks_arr: DataFrame, k: int = 3,
                         chunks_col: str = "chunks") -> DataFrame:
    """Per-doc chunk-hash k-shingles from the array form of the chunk stage.

    A doc with fewer than k chunks contributes its full hash sequence as a
    single shingle (so tiny docs still dedup exactly).
    """
    hashes = F.transform(F.col(chunks_col), lambda c: c["hash"])
    short = F.array(F.xxhash64(F.concat_ws("\x1f", hashes)))
    return chunks_arr.withColumn(
        "shingles",
        F.when(F.size(hashes) < k, short).otherwise(_kgram_hashes(hashes, k)),
    ).drop(chunks_col)


def shingles_from_text(docs: DataFrame, k: int = 5, mode: str = "token",
                       text_col: str = "text") -> DataFrame:
    """Token or character k-gram shingles of a text column."""
    if mode == "token":
        arr = F.split(F.trim(F.col(text_col)), r"\s+")
    elif mode == "char":
        arr = F.split(F.col(text_col), "")
    else:
        raise ValueError(f"unknown shingle mode {mode!r}")
    short = F.array(F.xxhash64(F.col(text_col)))
    return docs.withColumn(
        "shingles",
        F.when(F.size(arr) < k, short).otherwise(_kgram_hashes(arr, k)),
    )


def shingle_sets(docs: DataFrame, chunks_arr: DataFrame | None, mode: str, k: int,
                 id_col: str = "doc_id") -> DataFrame:
    """Dispatch: (doc_id, shingles array<long>) under the configured mode."""
    if mode == "chunk":
        if chunks_arr is None:
            raise ValueError("chunk mode needs the chunk-array DataFrame")
        return shingles_from_chunks(chunks_arr, k).select(id_col, "shingles")
    return shingles_from_text(docs, k, mode).select(id_col, "shingles")
