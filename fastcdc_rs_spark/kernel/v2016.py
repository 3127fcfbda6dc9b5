"""FastCDC v2016 kernel — the reference's second variant, bit-exact.

Re-expression of fastcdc-rs ``v2016::cut`` (src/v2016/mod.rs:159-203):
one byte per iteration, ``hash = (hash << 1) + GEAR[b]``, strict mask
before ``center`` and lax mask after, scan starting at ``min_size``
(cut-point skipping), fallback to the clamped remaining length. Same GEAR
table as v2020 (identical MD5 recipe, src/v2016/mod.rs:84-153), same MASKS
(src/v2016/mod.rs:54-81), rounded ``logarithm2`` (src/v2016/mod.rs:208-210).
Produces the same cut points as v2020 but (sometimes) different hashes —
the reference's own cross-check (src/v2016/mod.rs:723-746 vs
src/v2020/mod.rs:996-1018).

Vectorization: the recurrence multiplies by 2 every byte, so 2**64
annihilation happens after 64 bytes — the same 6-step Hillis-Steele affine
scan as the batched v2020 kernel, with an all-ones first-step shift
pattern. v2020 remains the production kernel (20% faster in the reference,
src/v2020/mod.rs:12-15); this variant exists for reference parity and
cross-validation.
"""

from __future__ import annotations

import numpy as np

from .fastcdc import (
    AVERAGE_MAX,
    AVERAGE_MIN,
    MAXIMUM_MAX,
    MAXIMUM_MIN,
    MINIMUM_MAX,
    MINIMUM_MIN,
    logarithm2,
)
from .gear import GEAR, MASKS

__all__ = ["cut_v2016", "chunk_bytes_v2016"]

_U64 = np.uint64


def _masks(avg_size: int, level: int) -> tuple[int, int]:
    bits = logarithm2(avg_size)
    return int(MASKS[bits + level]), int(MASKS[bits - level])


def _validate(min_size: int, avg_size: int, max_size: int) -> None:
    if not (MINIMUM_MIN <= min_size <= MINIMUM_MAX):
        raise ValueError(f"min_size {min_size} out of range")
    if not (AVERAGE_MIN <= avg_size <= AVERAGE_MAX):
        raise ValueError(f"avg_size {avg_size} out of range")
    if not (MAXIMUM_MIN <= max_size <= MAXIMUM_MAX):
        raise ValueError(f"max_size {max_size} out of range")


def _hash_array_v2016(contrib: np.ndarray) -> np.ndarray:
    """Per-position hash for ``h = (h << 1) + c`` — affine scan, multiplier
    2 at every position (composed multiplier over span d is 2**d)."""
    h = contrib.copy()
    n = h.shape[0]
    for d in (1, 2, 4, 8, 16, 32):
        if d >= n:
            break
        h[d:] += h[:-d] << _U64(d)
    return h


def cut_v2016(window: np.ndarray, min_size: int, avg_size: int, max_size: int,
              level: int = 1) -> tuple[int, int]:
    """One cut decision — reference ``v2016::cut``, bit-exact."""
    mask_s, mask_l = _masks(avg_size, level)
    remaining = window.shape[0]
    if remaining <= min_size:
        return 0, remaining
    center = avg_size
    if remaining > max_size:
        remaining = max_size
    elif remaining < center:
        center = remaining
    s = window[min_size:remaining]
    h = _hash_array_v2016(GEAR[s])
    n1 = center - min_size
    masks = np.empty(s.shape[0], dtype=np.uint64)
    masks[:n1] = _U64(mask_s)
    masks[n1:] = _U64(mask_l)
    hit = (h & masks) == 0
    i = int(np.argmax(hit))
    if hit[i]:
        return int(h[i]), min_size + i
    return int(h[-1]) if h.size else 0, remaining


def chunk_bytes_v2016(data: bytes | np.ndarray, min_size: int, avg_size: int,
                      max_size: int, level: int = 1) -> list[tuple[int, int, int]]:
    """[(hash, offset, length)] — reference v2016 iterator semantics
    (src/v2016/mod.rs:296-403)."""
    _validate(min_size, avg_size, max_size)
    buf = data if isinstance(data, np.ndarray) else np.frombuffer(data, dtype=np.uint8)
    out: list[tuple[int, int, int]] = []
    processed, remaining = 0, buf.shape[0]
    while remaining > 0:
        h, cutpoint = cut_v2016(buf[processed:processed + remaining],
                                min_size, avg_size, max_size, level)
        if cutpoint == 0:
            break
        out.append((h, processed, cutpoint))
        processed += cutpoint
        remaining -= cutpoint
    return out
