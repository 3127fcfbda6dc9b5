"""Batched FastCDC v2020 kernel — the Arrow-UDF hot path.

``chunk_batch`` chunks MANY documents at once: each round stacks every
active document's current chunk window into one 2-D uint8 matrix and makes
all cut decisions with a handful of large numpy ops. Per-document results
are bit-identical to the sequential kernel (``fastcdc.chunk_bytes``), which
is itself golden-pinned against the reference (fastcdc-rs
src/v2020/mod.rs:350-409); parity is enforced by tests/test_kernel_batch.py.

Why this shape: a pandas/Arrow UDF receives a batch of documents per call.
Per-document numpy calls are overhead-bound (~60 small-array ops per cut);
batching across documents amortizes that overhead over the whole batch, so
throughput approaches uint64 memory bandwidth instead of Python call rate.
The number of rounds is max(chunks-per-doc) in the batch, and finished
documents drop out each round.

Two exactness tricks keep the numpy work linear:

* the gear recurrence ``h = (h << 2) + c`` at even scan steps annihilates
  history after 32 shifts (4**32 ≡ 0 mod 2**64), so the per-position hash
  array is an *affine scan* computable in 6 Hillis-Steele doubling steps
  with scalar shift multipliers (any even-length span holds exactly half
  shift steps);
* the same annihilation makes segmented evaluation exact: the scan runs in
  ``_SEG``-byte column segments with the previous segment's final hash as
  a carry column, and rows drop out as soon as their cut point is found —
  so the average bytes scanned per chunk is ~(cut - min_size), not the
  full ``max_size`` window (a 2-4x saving on typical data).
"""

from __future__ import annotations

import numpy as np

from .fastcdc import ChunkerConfig
from .gear import gear_with_seed

__all__ = ["chunk_batch"]

_U64 = np.uint64

# Target uint64 working set per vector group (rows x segment-width x 8B).
# Sized to stay L2-resident: the affine scan revisits its h/contrib
# temporaries ~10x, so cache-resident groups cut DRAM traffic ~8x — the
# difference between one core saturating memory bandwidth and eight cores
# scaling (measured 4-8x aggregate throughput at 8 workers vs huge groups).
_GROUP_WORK_BYTES = 384 << 10

# Column-segment width for the scan (even; bounds the u64 working set and
# the overshoot past early cut points).
_SEG = 8192


def _hash_matrix(contrib: np.ndarray, first_is_shift: bool) -> np.ndarray:
    """Per-position gear hash for each row of a (A, width) contribution
    matrix via the 6-step affine scan. ``first_is_shift`` tells whether the
    transition into column 1 is a shift step (column 0 may be a carry
    pseudo-column, whose own multiplier is never used)."""
    a, width = contrib.shape
    h = contrib.copy()
    if width > 1:
        pat = np.empty(width - 1, dtype=np.uint64)
        if first_is_shift:
            pat[0::2] = _U64(2)
            pat[1::2] = _U64(0)
        else:
            pat[0::2] = _U64(0)
            pat[1::2] = _U64(2)
        h[:, 1:] += h[:, :-1] << pat[None, :]
    for d in (2, 4, 8, 16, 32):
        if d >= width:
            break
        h[:, d:] += h[:, :-d] << _U64(d)
    return h


def _process_group(
    s: np.ndarray,
    lens: np.ndarray,
    n1s: np.ndarray,
    mask_lut: np.ndarray,
    gear: np.ndarray,
    gear_ls: np.ndarray,
) -> tuple[np.ndarray, np.ndarray]:
    """Scan a stacked window group; returns (cut_idx, hash) per row.

    ``s``: (A, width) uint8 scan bytes (row r valid to lens[r]);
    ``n1s``: strict-phase length per row. cut_idx = -1 for fallthrough rows
    (caller uses the clamped remaining); hash = hash at the cut, or at the
    last scanned byte for fallthrough.
    """
    a, width = s.shape
    cuts = np.full(a, -1, dtype=np.int64)
    hashes = np.zeros(a, dtype=np.uint64)
    carry = np.zeros(a, dtype=np.uint64)
    alive = np.arange(a)
    seg = 0
    while alive.size and seg < width:
        hi = min(seg + _SEG, width)
        w = hi - seg
        sub = s[alive, seg:hi]
        cols = np.arange(seg, hi)
        even = cols % 2 == 0  # scan positions start even at seg (seg is even)
        contrib = np.empty((alive.size, w + 1), dtype=np.uint64)
        contrib[:, 0] = carry[alive]
        np.copyto(
            contrib[:, 1:],
            np.where(even[None, :], gear_ls[sub], gear[sub]),
        )
        # transition into column 1 is scan position `seg` (even → shift)
        h = _hash_matrix(contrib, first_is_shift=True)[:, 1:]

        code = (even[None, :].astype(np.int8)
                + 2 * (cols[None, :] < n1s[alive, None]).astype(np.int8))
        masks = mask_lut[code]
        valid = cols[None, :] < lens[alive, None]
        hit = ((h & masks) == 0) & valid
        idx = np.argmax(hit, axis=1)
        rows = np.arange(alive.size)
        found = hit[rows, idx]

        cuts[alive[found]] = seg + idx[found]
        hashes[alive[found]] = h[rows[found], idx[found]]

        # rows whose scan region ends inside this segment fall through
        ended = (~found) & (lens[alive] <= hi)
        if ended.any():
            last = lens[alive[ended]] - 1 - seg
            hashes[alive[ended]] = h[rows[ended], last]

        cont = ~found & ~ended
        carry[alive[cont]] = h[cont, -1]
        alive = alive[cont]
        seg = hi
    return cuts, hashes


def chunk_batch(bufs: list[np.ndarray], cfg: ChunkerConfig) -> list[list[tuple[int, int, int]]]:
    """Chunk a batch of uint8 buffers; returns per-doc [(hash, offset, length)].

    Bit-identical to mapping ``fastcdc.chunk_bytes`` over ``bufs``.
    """
    gear, gear_ls = cfg.gear_tables()
    min_size, avg_size, max_size = cfg.min_size, cfg.avg_size, cfg.max_size
    start = 2 * (min_size // 2)
    mask_lut = np.array(
        # index bit0 = even column (shifted-table judgment), bit1 = strict phase
        [cfg.mask_l, cfg.mask_l_ls, cfg.mask_s, cfg.mask_s_ls], dtype=np.uint64
    )

    n_docs = len(bufs)
    results: list[list[tuple[int, int, int]]] = [[] for _ in range(n_docs)]
    lengths = np.array([b.shape[0] for b in bufs], dtype=np.int64)
    processed = np.zeros(n_docs, dtype=np.int64)
    active = [i for i in range(n_docs) if lengths[i] > 0]

    while active:
        nxt: list[int] = []
        stacked: list[int] = []
        # Resolve trivial rows (sub-min tail, empty scan) without stacking.
        scan_len: dict[int, tuple[int, int, int]] = {}
        for i in active:
            remaining = int(lengths[i] - processed[i])
            if remaining <= min_size:
                results[i].append((0, int(processed[i]), remaining))
                continue  # doc finished (tail consumed everything)
            center = avg_size if remaining >= avg_size else remaining
            rem_c = max_size if remaining > max_size else remaining
            end1 = 2 * (center // 2)
            end2 = 2 * (rem_c // 2)
            if end2 <= start:
                results[i].append((0, int(processed[i]), rem_c))
                processed[i] += rem_c
                if processed[i] < lengths[i]:
                    nxt.append(i)
                continue
            scan_len[i] = (end2 - start, end1 - start, rem_c)
            stacked.append(i)

        # Vector sub-rounds over the stacked windows, split so the scan
        # temporaries stay cache-resident (see _GROUP_WORK_BYTES).
        pos = 0
        while pos < len(stacked):
            width_any = scan_len[stacked[pos]][0]
            group_rows = max(4, _GROUP_WORK_BYTES // (min(max(width_any, 1), _SEG) * 8))
            group = stacked[pos:pos + group_rows]
            pos += len(group)

            a = len(group)
            gwidth = max(scan_len[i][0] for i in group)
            s = np.zeros((a, gwidth), dtype=np.uint8)
            lens = np.empty(a, dtype=np.int64)
            n1s = np.empty(a, dtype=np.int64)
            rems = np.empty(a, dtype=np.int64)
            for r, i in enumerate(group):
                ln, n1, rem_c = scan_len[i]
                lens[r], n1s[r], rems[r] = ln, n1, rem_c
                off = int(processed[i]) + start
                s[r, :ln] = bufs[i][off:off + ln]

            cuts, hashes = _process_group(s, lens, n1s, mask_lut, gear, gear_ls)
            cut_rel = np.where(cuts >= 0, start + cuts, rems)

            for r, i in enumerate(group):
                results[i].append((int(hashes[r]), int(processed[i]), int(cut_rel[r])))
                processed[i] += int(cut_rel[r])
                if processed[i] < lengths[i]:
                    nxt.append(i)

        active = nxt
    return results
