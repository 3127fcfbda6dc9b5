"""Property-based kernel tests (hypothesis): the invariants of SURVEY.md
§1.1 must hold for arbitrary inputs and configs, and the batched kernel
must agree with the sequential one everywhere."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from fastcdc_rs_spark.kernel import ChunkerConfig, chunk_bytes
from fastcdc_rs_spark.kernel.batch import chunk_batch


def _buf(seed: int, n: int, alphabet: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.integers(0, alphabet, n, dtype=np.uint8)


configs = st.sampled_from(
    [
        ChunkerConfig(64, 256, 1024),
        ChunkerConfig(64, 256, 1024, level=0),
        ChunkerConfig(64, 256, 1024, level=3),
        ChunkerConfig(128, 512, 4096, seed=666),
        ChunkerConfig(256, 1024, 2048),
    ]
)


@settings(max_examples=40, deadline=None)
@given(
    seed=st.integers(0, 2**31),
    n=st.integers(0, 20_000),
    alphabet=st.sampled_from([2, 17, 256]),
    cfg=configs,
)
def test_coverage_determinism_bounds(seed, n, alphabet, cfg):
    data = _buf(seed, n, alphabet)
    chunks = chunk_bytes(data, cfg)
    # total coverage, no overlap, non-empty
    nxt = 0
    for h, off, ln in chunks:
        assert off == nxt and ln > 0
        nxt += ln
    assert nxt == n
    # bounded sizes: every non-final chunk in [min, max]; final <= max
    for h, off, ln in chunks[:-1]:
        assert cfg.min_size <= ln <= cfg.max_size
    if chunks:
        assert chunks[-1][2] <= cfg.max_size
        # sub-min tail carries hash 0
        if chunks[-1][2] <= cfg.min_size and len(chunks) > 1:
            assert chunks[-1][0] == 0
    # determinism
    assert chunk_bytes(data, cfg) == chunks


@settings(max_examples=25, deadline=None)
@given(
    seed=st.integers(0, 2**31),
    sizes=st.lists(st.integers(0, 8_000), min_size=1, max_size=12),
    cfg=configs,
)
def test_batch_equals_sequential(seed, sizes, cfg):
    rng = np.random.default_rng(seed)
    docs = [rng.integers(0, 256, n, dtype=np.uint8) for n in sizes]
    batched = chunk_batch(docs, cfg)
    for d, got in zip(docs, batched):
        assert got == chunk_bytes(d, cfg)


@settings(max_examples=15, deadline=None)
@given(seed=st.integers(0, 2**31), n=st.integers(1000, 30_000))
def test_edit_locality(seed, n):
    """CDC resynchronization: flipping one byte changes only a bounded
    window of chunks — the chunk sets before/after share most elements
    (on high-entropy data where cuts are mask-driven, not max-clamped)."""
    cfg = ChunkerConfig(64, 256, 1024)
    rng = np.random.default_rng(seed)
    data = rng.integers(0, 256, n, dtype=np.uint8)
    edited = data.copy()
    pos = int(rng.integers(0, n))
    edited[pos] ^= np.uint8(0xFF)
    a = chunk_bytes(data, cfg)
    b = chunk_bytes(edited, cfg)
    # Deterministic locality invariants (theorems of the kernel, unlike a
    # fixed shared-count bound — hypothesis kept finding legitimate long
    # resync cascades on that):
    # 1. every chunk ending strictly before the edit is bit-identical.
    #    Strict: the cut at offset+length is judged ON that byte (the
    #    reference hash includes the boundary byte the chunk excludes),
    #    so a chunk ending exactly at pos DOES see the flip.
    prefix_a = [c for c in a if c[1] + c[2] < pos]
    assert b[: len(prefix_a)] == prefix_a
    # 2. a single-byte FLIP preserves offsets, so from the first chunk
    #    boundary > pos common to both chunkings, the remainders are
    #    bit-identical (same start, same suffix bytes, same remaining).
    bounds_a = {off for _, off, _ in a if off > pos}
    bounds_b = {off for _, off, _ in b if off > pos}
    common = bounds_a & bounds_b
    if common:
        q = min(common)
        assert [c for c in a if c[1] >= q] == [c for c in b if c[1] >= q]
    # 3. the divergent window is where the edit actually lives: every
    #    non-shared chunk overlaps [first divergent boundary, q).
    if common:
        tail_a = {c for c in a if c[1] >= q}
        diff = (set(a) ^ set(b)) - tail_a
        for _, off, ln in diff:
            assert off + ln > pos - cfg.max_size and off < q


@settings(max_examples=30, deadline=None)
@given(
    seed=st.integers(0, 2**31),
    n_docs=st.integers(0, 12),
    k=st.integers(1, 6),
    n_perms=st.sampled_from([3, 32, 128]),
    mh_seed=st.integers(0, 2**31),
)
def test_native_signature_kernels_match_numpy(seed, n_docs, k, n_perms, mh_seed):
    # C fcdc_shingles / fcdc_minhash must agree with the numpy fallbacks
    # for arbitrary unit-hash sets (incl. empty docs, dups, cnt < k)
    from fastcdc_rs_spark.kernel import native
    from fastcdc_rs_spark.kernel import signatures as S

    if not native.available():
        return
    rng = np.random.default_rng(seed)
    hash_lists = []
    for _ in range(n_docs):
        cnt = int(rng.integers(0, 40))
        h = rng.integers(0, 2**63, cnt, dtype=np.uint64)
        if cnt > 2 and rng.random() < 0.5:
            h[: cnt // 2] = h[0]  # force duplicates
        hash_lists.append(h)

    got_sh = S.kgram_shingles(hash_lists, k)  # native
    flat, offsets, counts = S._concat(hash_lists)
    want_sh: list[np.ndarray] = []
    if flat.size:
        # numpy path re-derived via the module's own fallback logic
        saved = (native._lib, native._tried)
        try:
            native._lib, native._tried = None, True
            want_sh = S.kgram_shingles(hash_lists, k)
        finally:
            native._lib, native._tried = saved
    else:
        want_sh = [np.array([], dtype=np.uint64) for _ in hash_lists]
    assert len(got_sh) == len(want_sh)
    for g, w in zip(got_sh, want_sh):
        assert (np.asarray(g) == np.asarray(w)).all()

    got_mh = S.minhash_batch(hash_lists, n_perms=n_perms, seed=mh_seed)
    got_sim = S.simhash_batch(hash_lists, seed=mh_seed)
    saved = (native._lib, native._tried)
    try:
        native._lib, native._tried = None, True
        want_mh = S.minhash_batch(hash_lists, n_perms=n_perms, seed=mh_seed)
        want_sim = S.simhash_batch(hash_lists, seed=mh_seed)
    finally:
        native._lib, native._tried = saved
    assert (got_mh == want_mh).all()
    assert (got_sim == want_sim).all()
