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

__all__ = ["minhash_signatures", "SIGNATURE_SCHEMA"]

SIGNATURE_SCHEMA = StructType(
    [
        StructField("shingles", ArrayType(LongType(), False), False),
        StructField("bands", ArrayType(LongType(), False), False),
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
