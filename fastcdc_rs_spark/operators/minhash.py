"""MinHash signature stage (SURVEY.md §2.B B4/B5/B6 fused).

One vectorized pandas UDF turns each doc's unit-hash sequence (FastCDC
chunk hashes, or token/char unit hashes) into:

* ``shingles``: the deduplicated k-gram shingle-hash set (used again by
  exact-Jaccard verification), and
* ``bands``: the LSH band keys of the MinHash signature.

All three steps run in one Arrow pass (kernel/signatures.signature_batch)
— the same code the single-node recall oracle calls, so Spark and oracle
agree bit-for-bit under a given config. Values are u64 bit patterns stored
as LongType via signed reinterpretation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import ArrayType, LongType, StructField, StructType

from ..kernel.signatures import signature_batch

__all__ = [
    "minhash_signatures",
    "chunk_minhash_signatures",
    "SIGNATURE_SCHEMA",
    "CHUNK_SIGNATURE_SCHEMA",
]

SIGNATURE_SCHEMA = StructType(
    [
        StructField("shingles", ArrayType(LongType(), False), False),
        StructField("bands", ArrayType(LongType(), False), False),
    ]
)

CHUNK_SIGNATURE_SCHEMA = StructType(
    [
        StructField("shingles", ArrayType(LongType(), False), False),
        StructField("bands", ArrayType(LongType(), False), False),
        StructField("n_units", LongType(), False),
    ]
)


def minhash_signatures(
    units: DataFrame,
    k: int = 3,
    n_perms: int = 128,
    bands: int = 16,
    rows: int = 8,
    seed: int = 1,
    units_col: str = "unit_hashes",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, shingles array<long>, bands array<long>)."""

    @F.pandas_udf(SIGNATURE_SCHEMA)
    def _sig(unit_hashes: pd.Series) -> pd.DataFrame:
        lists = [
            np.asarray(v if v is not None else [], dtype=np.int64).view(np.uint64)
            for v in unit_hashes
        ]
        shingles, band_keys = signature_batch(
            lists, k=k, n_perms=n_perms, bands=bands, rows=rows, seed=seed
        )
        return pd.DataFrame(
            {
                "shingles": [s.view(np.int64) for s in shingles],
                "bands": list(band_keys.view(np.int64)),
            }
        )

    return units.select(
        id_col, _sig(F.col(units_col)).alias("_sig")
    ).select(
        id_col,
        F.col("_sig.shingles").alias("shingles"),
        F.col("_sig.bands").alias("bands"),
    )


def chunk_minhash_signatures(
    docs: DataFrame,
    chunker_cfg,
    k: int = 3,
    n_perms: int = 128,
    bands: int = 16,
    rows: int = 8,
    seed: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, shingles, bands, n_units): FastCDC chunk hashes → shingles
    → MinHash band keys in ONE Arrow pass.

    The unfused pipeline shape (``unit_hashes`` then ``minhash_signatures``)
    crosses the JVM↔Python boundary twice per document: the chunk-hash
    arrays are serialized out of the chunk UDF and straight back into the
    signature UDF with nothing JVM-side in between. Fusing hands the
    columnar chunk-kernel output (uint64 hash arrays) directly to
    ``signature_batch`` inside one worker (guide §4.1/§4.2) — bit-exact
    same values, one Arrow round-trip of the text column only. ``n_units``
    carries the per-doc chunk count so pipeline metrics (units_total) need
    no separate units frame.
    """
    from ..kernel.batch import chunk_batch_columnar
    from .chunk import _to_bufs

    @F.pandas_udf(CHUNK_SIGNATURE_SCHEMA)
    def _chunk_sig(texts: pd.Series) -> pd.DataFrame:
        bufs = _to_bufs(texts)
        if not bufs:
            return pd.DataFrame({"shingles": [], "bands": [], "n_units": []})
        counts, hashes, _, _ = chunk_batch_columnar(bufs, chunker_cfg)
        lists = np.split(hashes, np.cumsum(counts)[:-1])
        shingles, band_keys = signature_batch(
            lists, k=k, n_perms=n_perms, bands=bands, rows=rows, seed=seed
        )
        return pd.DataFrame(
            {
                "shingles": [s.view(np.int64) for s in shingles],
                "bands": list(band_keys.view(np.int64)),
                "n_units": counts,
            }
        )

    return docs.select(
        id_col, _chunk_sig(F.col(text_col)).alias("_sig")
    ).select(
        id_col,
        F.col("_sig.shingles").alias("shingles"),
        F.col("_sig.bands").alias("bands"),
        F.col("_sig.n_units").alias("n_units"),
    )
