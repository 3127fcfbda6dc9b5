"""Skew utilities (SURVEY.md §2.B B12): salted repartitioning for hot keys.

``candidate_pairs`` already neutralizes quadratic bucket blow-up
structurally (star pairs, lsh.py); this module covers the *join-side* hot
keys that remain — e.g. a hub document that appears in millions of
verified pairs, joined against its shingle set, or any aggregation keyed
on a power-law column.

``salt_explode(df, key, n)`` replicates the *small/build* side n times
with a salt column; ``salt_assign(df, key, n)`` gives each *large/probe*
row a deterministic salt in [0, n). Joining on (key, salt) spreads each
hot key over n shuffle partitions while keeping the join exact. AQE's
skew-join splitting handles moderate skew automatically; explicit salting
is for the heavy tail AQE cannot split (single-key aggregations, or joins
whose skew appears only at runtime scale).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

__all__ = ["salt_assign", "salt_explode", "salted_join"]


def salt_assign(df: DataFrame, n_salts: int, salt_col: str = "_salt") -> DataFrame:
    """Deterministic salt per row (hash of all columns mod n) — probe side."""
    return df.withColumn(
        salt_col, F.pmod(F.xxhash64(*df.columns), F.lit(n_salts)).cast("int")
    )


def salt_explode(df: DataFrame, n_salts: int, salt_col: str = "_salt") -> DataFrame:
    """Replicate each row once per salt value — build side."""
    return df.withColumn(
        salt_col, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )


def salted_join(probe: DataFrame, build: DataFrame, on: list[str],
                n_salts: int = 16, how: str = "inner") -> DataFrame:
    """Exact equi-join with hot keys spread over ``n_salts`` partitions.

    ``build`` (the smaller side) is replicated n_salts times; ``probe``
    rows are salted deterministically; the join runs on (on + salt).
    Use when one join key dominates the shuffle (power-law fan-out) and
    AQE skew splitting is not enough.
    """
    p = salt_assign(probe, n_salts)
    b = salt_explode(build, n_salts)
    return p.join(b, on + ["_salt"], how).drop("_salt")
