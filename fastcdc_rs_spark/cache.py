"""Cache-ownership helpers.

Operators that ``persist()`` an intermediate frame attach it to their
result via ``_graft_caches``; whoever materializes the result calls
``release_caches`` so a long-lived session (bench runs 15+ queries
back-to-back) never accumulates dead cached blocks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["attach_caches", "release_caches", "register_cache", "release_all"]

# Session-level registry: operators whose results get wrapped by callers
# (orderBy etc. drops instance attributes) register persisted frames here;
# a harness (bench, a job) drains it between queries.
_REGISTRY: list[DataFrame] = []


def register_cache(df: DataFrame) -> DataFrame:
    _REGISTRY.append(df)
    return df


def release_all() -> None:
    """Unpersist every registered frame (idempotent; drains the registry)."""
    while _REGISTRY:
        df = _REGISTRY.pop()
        try:
            df.unpersist()
        except Exception:
            pass  # session already stopped


def attach_caches(df: DataFrame, caches: list[DataFrame]) -> DataFrame:
    df._graft_caches = list(caches)
    return df


def release_caches(*dfs: DataFrame) -> None:
    """Unpersist every cache attached to (or being) the given frames."""
    for df in dfs:
        for c in getattr(df, "_graft_caches", []):
            c.unpersist()
        if getattr(df, "_graft_caches", None) is not None:
            df._graft_caches = []
        if df.storageLevel.useMemory or df.storageLevel.useDisk:
            df.unpersist()
