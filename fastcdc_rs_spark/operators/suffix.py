"""Suffix-array exact-substring dedup (SURVEY.md §2.B B10).

Finds exact duplicated substrings of length >= L *across documents* inside
candidate groups (LSH clusters or any grouping), the way large-scale
training-data pipelines strip repeated boilerplate/quotations:

1. group docs (bounded group size — the caller salts/caps, see lsh.py);
2. per group, build a suffix array over the concatenation of the group's
   texts (prefix-doubling, O(n log n), pure numpy) inside
   ``applyInPandas``;
3. adjacent suffixes in SA order with LCP >= L that come from *different*
   docs witness a duplicated substring; emit maximal-ish matches
   (per (doc_a, doc_b) adjacent-pair maxima).

Output: (group_id, doc_a, doc_b, pos_a, pos_b, match_len).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
)

__all__ = [
    "suffix_array",
    "lcp_array",
    "duplicate_substrings",
    "substring_pairs_exact",
]


def suffix_array(data: np.ndarray) -> np.ndarray:
    """Suffix array by prefix doubling (numpy argsort ranks), O(n log n)."""
    n = data.size
    if n == 0:
        return np.array([], dtype=np.int64)
    rank = data.astype(np.int64)
    sa = np.argsort(rank, kind="stable")
    tmp = np.empty(n, dtype=np.int64)
    k = 1
    while k < n:
        key2 = np.full(n, -1, dtype=np.int64)
        key2[: n - k] = rank[k:]
        order = np.lexsort((key2, rank))
        sa = order
        tmp[sa[0]] = 0
        prev, cur = sa[:-1], sa[1:]
        newgroup = (rank[cur] != rank[prev]) | (key2[cur] != key2[prev])
        tmp[cur] = np.cumsum(newgroup)
        rank = tmp.copy()
        if rank[sa[-1]] == n - 1:
            break
        k <<= 1
    return sa.astype(np.int64)


def lcp_array(data: np.ndarray, sa: np.ndarray) -> np.ndarray:
    """Kasai LCP array: lcp[i] = LCP(suffix sa[i-1], suffix sa[i])."""
    n = data.size
    lcp = np.zeros(n, dtype=np.int64)
    if n == 0:
        return lcp
    rank = np.empty(n, dtype=np.int64)
    rank[sa] = np.arange(n)
    h = 0
    for i in range(n):
        r = rank[i]
        if r > 0:
            j = sa[r - 1]
            maxh = n - max(i, j)
            while h < maxh and data[i + h] == data[j + h]:
                h += 1
            lcp[r] = h
            if h > 0:
                h -= 1
        else:
            h = 0
    return lcp


_OUT_SCHEMA = StructType(
    [
        StructField("group_id", LongType(), False),
        StructField("doc_a", LongType(), False),
        StructField("doc_b", LongType(), False),
        StructField("pos_a", IntegerType(), False),
        StructField("pos_b", IntegerType(), False),
        StructField("match_len", IntegerType(), False),
    ]
)


def _group_matches(pdf: pd.DataFrame, min_len: int) -> pd.DataFrame:
    gid = int(pdf["group_id"].iloc[0])
    doc_ids = pdf["doc_id"].to_numpy()
    texts = [t.encode("utf-8") for t in pdf["text"]]
    # concatenate with per-doc unique separators (bytes > 0xF4 never occur
    # in UTF-8) — separators break spurious cross-boundary matches
    parts, owners, starts, tails = [], [], [], []
    offset = 0
    for i, t in enumerate(texts):
        parts.append(np.frombuffer(t, dtype=np.uint8))
        owners.append(np.full(len(t), i, dtype=np.int64))
        tails.append(np.arange(len(t), 0, -1, dtype=np.int64))
        starts.append(offset)
        offset += len(t)
        sep = np.array([0xF5 + (i % 8)], dtype=np.uint8)
        parts.append(sep)
        owners.append(np.array([-1], dtype=np.int64))
        tails.append(np.zeros(1, dtype=np.int64))
        offset += 1
    data = np.concatenate(parts)
    owner = np.concatenate(owners)
    tail = np.concatenate(tails)
    start_of = np.array(starts, dtype=np.int64)

    sa = suffix_array(data)
    lcp = lcp_array(data, sa)

    rows = []
    best: dict[tuple[int, int], tuple[int, int, int]] = {}
    for r in range(1, data.size):
        i, j = int(sa[r - 1]), int(sa[r])
        # clip the match at each doc's end so it never crosses a separator
        l = min(int(lcp[r]), int(tail[i]), int(tail[j]))
        if l < min_len:
            continue
        oi, oj = int(owner[i]), int(owner[j])
        if oi < 0 or oj < 0 or oi == oj:
            continue
        if oi > oj:
            i, j, oi, oj = j, i, oj, oi
        key = (oi, oj)
        if key not in best or l > best[key][2]:
            best[key] = (i - start_of[oi], j - start_of[oj], l)
    for (oi, oj), (pa, pb, l) in best.items():
        rows.append(
            (gid, int(doc_ids[oi]), int(doc_ids[oj]), int(pa), int(pb), int(l))
        )
    return pd.DataFrame(
        rows, columns=["group_id", "doc_a", "doc_b", "pos_a", "pos_b", "match_len"]
    )


_PAIR_SCHEMA = StructType(
    [
        StructField("group_id", LongType(), False),
        StructField("doc_a", LongType(), False),
        StructField("doc_b", LongType(), False),
    ]
)


def _group_pairs_exact(pdf: pd.DataFrame, min_len: int) -> pd.DataFrame:
    """COMPLETE set of doc pairs in one group sharing a substring >= min_len.

    Any two suffixes whose LCP >= min_len lie in one maximal SA interval
    where every adjacent LCP >= min_len (pairwise LCP = min of adjacent
    LCPs), so enumerating distinct-owner pairs per interval yields exactly
    the pairs sharing a >=min_len substring — the same set the char-n-gram
    inverted index (operators/dedup.py ``substring_pairs``) produces, which
    the tests assert.
    """
    gid = int(pdf["group_id"].iloc[0])
    doc_ids = pdf["doc_id"].to_numpy()
    texts = [t.encode("utf-8") for t in pdf["text"]]
    parts, owners, tails = [], [], []
    for i, t in enumerate(texts):
        parts.append(np.frombuffer(t, dtype=np.uint8))
        owners.append(np.full(len(t), i, dtype=np.int64))
        tails.append(np.arange(len(t), 0, -1, dtype=np.int64))
        parts.append(np.array([0xF5 + (i % 8)], dtype=np.uint8))
        owners.append(np.array([-1], dtype=np.int64))
        tails.append(np.zeros(1, dtype=np.int64))
    data = np.concatenate(parts)
    owner = np.concatenate(owners)
    tail = np.concatenate(tails)  # bytes remaining in the owning doc

    sa = suffix_array(data)
    lcp = lcp_array(data, sa)
    sa_owner = owner[sa]

    pairs: set[tuple[int, int]] = set()
    # Clamp each adjacent LCP to both suffixes' remaining-in-doc byte
    # counts: a shared prefix that crosses a separator is not a text
    # substring. Separator bytes (>=0xF5) never occur in UTF-8 text, so
    # after clamping, runs of adjacent clamped-LCP >= min_len contain
    # exactly the suffix pairs whose *text* LCP >= min_len.
    sa_tail = tail[sa]
    eff = np.minimum(lcp, np.minimum(sa_tail, np.roll(sa_tail, 1)))
    eff[0] = 0
    # maximal runs r..s where eff[r..s] >= min_len cover suffixes sa[r-1..s]
    ge = eff >= min_len
    r = 1
    n = data.size
    while r < n:
        if not ge[r]:
            r += 1
            continue
        s = r
        while s + 1 < n and ge[s + 1]:
            s += 1
        members = {int(o) for o in sa_owner[r - 1 : s + 1] if o >= 0}
        ms = sorted(members)
        for x in range(len(ms)):
            for y in range(x + 1, len(ms)):
                pairs.add((ms[x], ms[y]))
        r = s + 1
    rows = [
        (gid, int(doc_ids[a]), int(doc_ids[b]))
        if doc_ids[a] < doc_ids[b]
        else (gid, int(doc_ids[b]), int(doc_ids[a]))
        for a, b in pairs
    ]
    return pd.DataFrame(rows, columns=["group_id", "doc_a", "doc_b"])


def substring_pairs_exact(
    grouped_docs: DataFrame, min_len: int = 40,
    group_col: str = "group_id", id_col: str = "doc_id", text_col: str = "text",
) -> DataFrame:
    """Per-group complete (group_id, doc_a, doc_b) substring-duplicate pairs.

    Suffix-array twin of ``dedup.substring_pairs``: within each group the
    pair set is exact. Groups must be formed so that no cross-group pair
    can share a >=min_len substring (e.g. gram-bucket connected components)
    or accepted as the unit of comparison. Bound group sizes upstream.
    """
    docs = grouped_docs.select(
        F.col(group_col).alias("group_id"),
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("text"),
    )

    def apply_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        return _group_pairs_exact(pdf, min_len)

    return docs.groupBy("group_id").applyInPandas(apply_fn, _PAIR_SCHEMA)


def duplicate_substrings(
    grouped_docs: DataFrame, min_len: int = 50,
    group_col: str = "group_id", id_col: str = "doc_id", text_col: str = "text",
) -> DataFrame:
    """Per-group longest cross-doc exact substring matches >= min_len.

    ``grouped_docs``: (group_id, doc_id, text). Groups shuffle to one task
    each (``applyInPandas``); bound group sizes upstream (LSH bucket caps)
    exactly as the skew section of lsh.py does for pair generation.
    """
    docs = grouped_docs.select(
        F.col(group_col).alias("group_id"),
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("text"),
    )

    def apply_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        return _group_matches(pdf, min_len)

    return docs.groupBy("group_id").applyInPandas(apply_fn, _OUT_SCHEMA)
