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
"""

from __future__ import annotations

import numpy as np

from .fastcdc import ChunkerConfig
from .gear import gear_with_seed

__all__ = ["chunk_batch"]

_U64 = np.uint64

# Cap on the stacked scan matrix (uint8 cells) per vector round; rounds are
# split into sub-rounds beyond this to bound the uint64 temporaries (~16x).
_STACK_BYTES_CAP = 16 << 20


def _hash_matrix(contrib: np.ndarray) -> np.ndarray:
    """Per-position gear hash for each row of a (A, width) contribution
    matrix. Rows are independent scan windows; position 0 is a shift step.

    The recurrence ``h[i] = m[i] * h[i-1] + c[i]`` (m = 4 at even scan
    positions — the ``<< 2`` — and 1 at odd) is a first-order affine scan,
    computed here Hillis-Steele style with doubling offsets 1..32. Six
    steps suffice for exactness: any multiplier product spanning >= 32 even
    positions contains 4**32 = 2**64 ≡ 0, so history older than 64 bytes
    annihilates itself mod 2**64 — the same property the reference kernel
    gets implicitly from its ``<<`` wraparound. All ops are contiguous
    full-matrix uint64 ops (no transposes, no strided walks), so throughput
    is memory-bandwidth-bound regardless of shape.
    """
    a, width = contrib.shape
    h = contrib.copy()
    # Step d=1: per-position multiplier m[i] = 4 at even i (the shift step),
    # 1 at odd — expressed as a broadcast left-shift pattern (2 then 0).
    if width > 1:
        pat = np.empty(width - 1, dtype=np.uint64)
        pat[0::2] = _U64(0)  # positions 1,3,5,... multiply by 1
        pat[1::2] = _U64(2)  # positions 2,4,6,... multiply by 4
        h[:, 1:] += h[:, :-1] << pat[None, :]
    # Steps d=2..32: a span of even length d always contains exactly d/2 even
    # positions, so the composed multiplier is the scalar 4**(d/2) — a shift.
    for d in (2, 4, 8, 16, 32):
        if d >= width:
            break
        h[:, d:] += h[:, :-d] << _U64(d)
    return h


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

        # Vector rounds over the stacked windows, split to bound memory.
        pos = 0
        while pos < len(stacked):
            width_max = max(scan_len[i][0] for i in stacked[pos:])
            width = ((width_max + 63) // 64) * 64
            group_rows = max(1, _STACK_BYTES_CAP // max(width, 1))
            group = stacked[pos:pos + group_rows]
            pos += len(group)

            a = len(group)
            gwidth = ((max(scan_len[i][0] for i in group) + 63) // 64) * 64
            s = np.zeros((a, gwidth), dtype=np.uint8)
            lens = np.empty(a, dtype=np.int64)
            n1s = np.empty(a, dtype=np.int64)
            rems = np.empty(a, dtype=np.int64)
            for r, i in enumerate(group):
                ln, n1, rem_c = scan_len[i]
                lens[r], n1s[r], rems[r] = ln, n1, rem_c
                off = int(processed[i]) + start
                s[r, :ln] = bufs[i][off:off + ln]

            cols = np.arange(gwidth)
            even_col = (cols % 2 == 0)
            contrib = np.where(even_col[None, :], gear_ls[s], gear[s])
            h = _hash_matrix(contrib)

            code = (even_col[None, :].astype(np.int8)
                    + 2 * (cols[None, :] < n1s[:, None]).astype(np.int8))
            masks = mask_lut[code]
            hit = ((h & masks) == 0) & (cols[None, :] < lens[:, None])
            idx = np.argmax(hit, axis=1)
            rows = np.arange(a)
            found = hit[rows, idx]
            cut_rel = np.where(found, start + idx, rems)
            hashes = np.where(found, h[rows, idx], h[rows, lens - 1])

            for r, i in enumerate(group):
                results[i].append((int(hashes[r]), int(processed[i]), int(cut_rel[r])))
                processed[i] += int(cut_rel[r])
                if processed[i] < lengths[i]:
                    nxt.append(i)

        active = nxt
    return results
