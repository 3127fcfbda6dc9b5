"""Batched MinHash and SimHash signature kernels (numpy, no per-row Python).

These are pipeline operators mandated by the north rule (SURVEY.md §2.B
B5/B7); the reference contains no signature code — the design is standard
MinHash (Broder) / SimHash (Charikar) re-expressed for Arrow batches.

Permutation family: splitmix64 finalizer seeded per permutation. It is a
bijection on u64, cheap (3 xorshift-multiply steps), and fully vectorizable
with uint64 wraparound. The single-node recall oracle in tests uses the
*same* family, satisfying the "same shingle/signature config" clause of the
baseline metric.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "band_hashes",
    "kgram_shingles",
    "minhash_batch",
    "perm_seeds",
    "signature_batch",
    "simhash_batch",
    "splitmix64",
]

_U64 = np.uint64
_GOLDEN = _U64(0x9E3779B97F4A7C15)
_MIX1 = _U64(0xBF58476D1CE4E5B9)
_MIX2 = _U64(0x94D049BB133111EB)
_EMPTY_SIG = _U64(0xFFFFFFFFFFFFFFFF)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer — a u64 bijection."""
    z = (x + _GOLDEN).astype(np.uint64, copy=False)
    z = (z ^ (z >> _U64(30))) * _MIX1
    z = (z ^ (z >> _U64(27))) * _MIX2
    return z ^ (z >> _U64(31))


def perm_seeds(n_perms: int, seed: int) -> np.ndarray:
    """Deterministic per-permutation seed constants."""
    base = np.arange(1, n_perms + 1, dtype=np.uint64) * _GOLDEN
    return splitmix64(base + _U64(seed & 0xFFFFFFFFFFFFFFFF))


def _concat(hash_lists: list[np.ndarray]) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    counts = np.array([len(h) for h in hash_lists], dtype=np.int64)
    flat = (
        np.concatenate([np.asarray(h, dtype=np.uint64) for h in hash_lists if len(h)])
        if counts.sum()
        else np.array([], dtype=np.uint64)
    )
    offsets = np.zeros(len(hash_lists), dtype=np.int64)
    np.cumsum(counts[:-1], out=offsets[1:])
    return flat, offsets, counts


def minhash_batch(
    hash_lists: list[np.ndarray], n_perms: int = 128, seed: int = 1, block: int = 16
) -> np.ndarray:
    """MinHash signatures for a batch of shingle-hash sets.

    Returns (n_docs, n_perms) uint64. Empty docs get all-0xFF signatures
    (they never collide with a real band). Work is blocked over permutations
    to bound the (total_shingles x block) temporary.
    """
    n_docs = len(hash_lists)
    sigs = np.full((n_docs, n_perms), _EMPTY_SIG, dtype=np.uint64)
    flat, offsets, counts = _concat(hash_lists)
    if flat.size == 0:
        return sigs
    seeds = perm_seeds(n_perms, seed)
    from . import native

    if native.available():  # production path; numpy below is the fallback
        native.minhash_batch_native(flat, offsets, counts, seeds, sigs)
        return sigs
    _minhash_numpy(flat, offsets, counts, seeds, sigs, block)
    return sigs


def _minhash_numpy(flat, offsets, counts, seeds, sigs, block=16) -> None:
    """Blocked numpy fallback (bit-identical to the C path; the native
    parity suite compares the two directly)."""
    nonempty = counts > 0
    red_offsets = offsets[nonempty]
    for p0 in range(0, seeds.size, block):
        s = seeds[p0:p0 + block]
        # (n_total, block): permuted hash values
        hp = splitmix64(flat[:, None] ^ s[None, :])
        mins = np.minimum.reduceat(hp, red_offsets, axis=0)
        sigs[nonempty, p0:p0 + s.size] = mins


def kgram_shingles(hash_lists: list[np.ndarray], k: int = 3) -> list[np.ndarray]:
    """k-gram shingle hashes over each doc's unit-hash sequence (B4).

    Each k-gram is folded with splitmix64 (``x <- splitmix64(x ^ h_j)``),
    vectorized over the concatenated batch with shifted slices; k-grams that
    would cross a document boundary are masked out. A doc with fewer than k
    units contributes one shingle folding its whole sequence, so tiny docs
    still participate in exact dedup. Outputs are deduplicated per doc
    (shingle *sets*).
    """
    flat, offsets, counts = _concat(hash_lists)
    n = flat.size
    n_docs = len(hash_lists)
    if n == 0:
        return [np.array([], dtype=np.uint64) for _ in hash_lists]
    from . import native

    if native.available():  # production path; numpy below is the fallback
        out_flat, out_counts = native.shingles_native(flat, offsets, counts, k)
        return np.split(out_flat, np.cumsum(out_counts[:-1]))
    m = n - k + 1
    if m > 0:
        acc = np.zeros(m, dtype=np.uint64)
        for j in range(k):
            acc = splitmix64(acc ^ flat[j:j + m])
    else:
        acc = np.array([], dtype=np.uint64)
    # Vectorized per-doc dedup: one lexsort over (doc_id, value) + a keep
    # mask replaces a per-doc ``np.unique`` Python loop (the loop costs
    # ~5 µs/doc — the dominant term at 100k docs/batch). Output values
    # per doc are sorted ascending, exactly like ``np.unique``.
    seg = np.where(counts >= k, counts - (k - 1), 0)
    total = int(seg.sum())
    doc_ids = np.repeat(np.arange(n_docs, dtype=np.int64), seg)
    starts = np.cumsum(seg) - seg
    pos = (
        np.arange(total, dtype=np.int64)
        - np.repeat(starts, seg)
        + np.repeat(offsets, seg)
    )
    vals = acc[pos]
    order = np.lexsort((vals, doc_ids))
    dv, vv = doc_ids[order], vals[order]
    keep = np.ones(dv.size, dtype=bool)
    keep[1:] = (dv[1:] != dv[:-1]) | (vv[1:] != vv[:-1])
    dv, vv = dv[keep], vv[keep]
    uniq_counts = np.bincount(dv, minlength=n_docs)
    out = np.split(vv, np.cumsum(uniq_counts[:-1]))
    # rare path: 0 < cnt < k docs fold their whole (short) sequence
    for d in np.nonzero((counts > 0) & (counts < k))[0]:
        off = offsets[d]
        x = np.zeros(1, dtype=np.uint64)
        for j in range(int(counts[d])):
            x = splitmix64(x ^ flat[off + j:off + j + 1])
        out[d] = x
    return out


def band_hashes(sigs: np.ndarray, bands: int = 16, rows: int = 8) -> np.ndarray:
    """(n_docs, bands) LSH band keys: splitmix64 fold of each band's rows,
    with the band index folded in so identical row-slices in different
    bands never collide (B6)."""
    n_docs = sigs.shape[0]
    assert sigs.shape[1] >= bands * rows
    out = np.empty((n_docs, bands), dtype=np.uint64)
    for b in range(bands):
        acc = np.full(n_docs, b + 1, dtype=np.uint64) * _GOLDEN
        for r in range(rows):
            acc = splitmix64(acc ^ sigs[:, b * rows + r])
        out[:, b] = acc
    return out


def signature_batch(
    hash_lists: list[np.ndarray],
    k: int = 3,
    n_perms: int = 128,
    bands: int = 16,
    rows: int = 8,
    seed: int = 1,
) -> tuple[list[np.ndarray], np.ndarray]:
    """One pass: unit hashes → (shingle sets, band keys).

    This is the exact computation the Spark signature UDF runs per Arrow
    batch AND the computation the single-node recall oracle runs — sharing
    it is what makes "same shingle/signature config" bit-exact.
    """
    shingles = kgram_shingles(hash_lists, k)
    sigs = minhash_batch(shingles, n_perms=n_perms, seed=seed)
    return shingles, band_hashes(sigs, bands, rows)


def simhash_batch(hash_lists: list[np.ndarray], seed: int = 1) -> np.ndarray:
    """64-bit SimHash per doc: bit-majority over splitmix64'd feature hashes.

    Ties (bit sum exactly half) resolve to 0. Empty docs hash to 0.
    """
    n_docs = len(hash_lists)
    out = np.zeros(n_docs, dtype=np.uint64)
    flat, offsets, counts = _concat(hash_lists)
    if flat.size == 0:
        return out
    from . import native

    if native.available():  # production path; numpy below is the fallback
        native.simhash_batch_native(flat, offsets, counts, seed, out)
        return out
    h = splitmix64(flat ^ _U64(seed & 0xFFFFFFFFFFFFFFFF))
    # (n_total, 64) bit matrix in int16 — reduceat sums per doc
    shifts = np.arange(64, dtype=np.uint64)
    bits = ((h[:, None] >> shifts[None, :]) & _U64(1)).astype(np.int16)
    nonempty = counts > 0
    sums = np.add.reduceat(bits, offsets[nonempty], axis=0)
    majority = (2 * sums) > counts[nonempty, None]
    vals = (majority.astype(np.uint64) << shifts[None, :]).sum(
        axis=1, dtype=np.uint64
    )
    out[nonempty] = vals
    return out
