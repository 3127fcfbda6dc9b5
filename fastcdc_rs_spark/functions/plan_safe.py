"""Plan-safe wrappers around optimizer footguns.

``explode_once`` / ``posexplode_once``: Catalyst's InferFiltersFromGenerate
rule turns ``explode(expr)`` into ``Filter(size(expr) > 0) → Generate``,
and the pushed-down filter re-evaluates ``expr`` — for an expensive array
expression (a pandas-UDF column, a transform() building thousands of
grams) that silently DOUBLES the work. The outer generator variants need
no inferred filter; a cheap null-check on the generated ordinal restores
the inner semantics. Use these whenever the exploded expression is not
already materialized (persisted/shuffled) below the explode.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

__all__ = ["explode_once", "posexplode_once"]


def explode_once(
    df: DataFrame,
    arr: Column | str,
    alias: str,
    keep: list[str] | None = None,
) -> DataFrame:
    """``df.select(*keep, explode(arr).alias(alias))`` without the
    inferred-filter double evaluation of ``arr``.

    True drop-in for inner ``explode`` including NULL *elements*: the
    empty/NULL-array guard filters on the posexplode ordinal (never null
    for a real element), not the element value, so arrays containing
    nulls still emit a row per null element exactly like plain explode.
    """
    keep = keep if keep is not None else []
    ord_col = f"__{alias}_ord"
    out = df.select(
        *keep, F.posexplode_outer(arr).alias(ord_col, alias)
    )
    return out.where(F.col(ord_col).isNotNull()).drop(ord_col)


def posexplode_once(
    df: DataFrame,
    arr: Column | str,
    pos_alias: str,
    val_alias: str,
    keep: list[str] | None = None,
) -> DataFrame:
    """``df.select(*keep, posexplode(arr).alias(pos, val))`` without the
    inferred-filter double evaluation of ``arr``."""
    keep = keep if keep is not None else []
    out = df.select(
        *keep, F.posexplode_outer(arr).alias(pos_alias, val_alias)
    )
    return out.where(F.col(pos_alias).isNotNull())
