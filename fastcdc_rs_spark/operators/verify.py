"""Candidate-pair verification (SURVEY.md §2.B B9).

Exact Jaccard similarity over the shingle sets of each candidate pair:
join pairs back to the (broadcast-unfriendly, so shuffle-joined) shingle
sets on both sides, then JVM-side ``array_intersect``/``array_union``
cardinalities. Pairs at or above the threshold become edges for clustering.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

__all__ = ["verify_pairs"]


def verify_pairs(pairs: DataFrame, shingled: DataFrame, threshold: float = 0.8,
                 id_col: str = "doc_id", shingles_col: str = "shingles") -> DataFrame:
    """(a, b, jaccard) for pairs with exact Jaccard >= threshold."""
    sa = shingled.select(
        F.col(id_col).alias("a"), F.col(shingles_col).alias("_sh_a")
    )
    sb = shingled.select(
        F.col(id_col).alias("b"), F.col(shingles_col).alias("_sh_b")
    )
    joined = pairs.join(sa, "a").join(sb, "b")
    inter = F.size(F.array_intersect("_sh_a", "_sh_b"))
    union = F.size(F.array_union("_sh_a", "_sh_b"))
    return (
        joined.withColumn(
            "jaccard",
            F.when(union > 0, inter.cast("double") / union.cast("double")).otherwise(F.lit(1.0)),
        )
        .where(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )
