/* FastCDC v2020 scan kernel, scalar C — the optional fast path behind
 * kernel/native.py (compiled on first use with the system cc; the numpy
 * kernel in kernel/batch.py is the always-available fallback).
 *
 * Semantics are a from-scratch port of this repo's own golden-pinned
 * Python kernel (kernel/fastcdc.py `cut`, itself bit-exact against
 * fastcdc-rs src/v2020/mod.rs:350-409): min-size skip, strict masks
 * before center, lax after, two bytes per pair (shifted table on even
 * positions judged against mask<<1, plain table on odd), sub-min tail
 * with hash 0, max-size fallback carrying the running hash. The golden
 * tests pin every cut point and hash for both implementations.
 */

#include <stddef.h>
#include <stdlib.h>
#include <stdint.h>

typedef struct {
    uint64_t mask_s, mask_l, mask_s_ls, mask_l_ls;
    int64_t min_size, avg_size, max_size;
} fcdc_cfg;

/* One cut decision over window[0..n): returns the chunk length and
 * writes the gear hash at the cut (0 for sub-min / degenerate). */
static size_t fcdc_cut(const uint8_t *w, size_t n, const fcdc_cfg *c,
                       const uint64_t *gear, const uint64_t *gear_ls,
                       uint64_t *out_hash)
{
    if (n <= (size_t)c->min_size) {
        *out_hash = 0;
        return n;
    }
    size_t remaining = n;
    size_t center = (size_t)c->avg_size;
    if (remaining > (size_t)c->max_size)
        remaining = (size_t)c->max_size;
    else if (remaining < center)
        center = remaining;
    size_t start = 2 * ((size_t)c->min_size / 2);
    size_t end1 = 2 * (center / 2);     /* strict phase end (exclusive) */
    size_t end2 = 2 * (remaining / 2);  /* scan end (exclusive) */
    if (end2 <= start) {
        *out_hash = 0;
        return remaining;
    }
    uint64_t hash = 0;
    size_t i = start;
    /* start/end1/end2 are all even, so pairs never straddle a boundary */
    while (i < end1) {
        hash = (hash << 2) + gear_ls[w[i]];
        if ((hash & c->mask_s_ls) == 0) { *out_hash = hash; return i; }
        hash += gear[w[i + 1]];
        if ((hash & c->mask_s) == 0) { *out_hash = hash; return i + 1; }
        i += 2;
    }
    while (i < end2) {
        hash = (hash << 2) + gear_ls[w[i]];
        if ((hash & c->mask_l_ls) == 0) { *out_hash = hash; return i; }
        hash += gear[w[i + 1]];
        if ((hash & c->mask_l) == 0) { *out_hash = hash; return i + 1; }
        i += 2;
    }
    *out_hash = hash;
    return remaining;
}

/* Chunk n_docs documents stored back-to-back in `data`; doc i spans
 * [offs[i], offs[i+1]).  Emits per-doc chunk counts plus flat
 * (hash, offset-within-doc, length) arrays ordered (doc, offset).
 * Returns the total chunk count, or -1 if `cap` would be exceeded
 * (callers size cap = sum(len_i / min_size) + n_docs, an upper bound). */
int64_t fcdc_chunk_batch(const uint8_t *data, const int64_t *offs,
                         int64_t n_docs,
                         uint64_t mask_s, uint64_t mask_l,
                         uint64_t mask_s_ls, uint64_t mask_l_ls,
                         int64_t min_size, int64_t avg_size, int64_t max_size,
                         const uint64_t *gear, const uint64_t *gear_ls,
                         int64_t *counts, uint64_t *out_hash,
                         int64_t *out_off, int64_t *out_len, int64_t cap)
{
    fcdc_cfg cfg;
    cfg.mask_s = mask_s;
    cfg.mask_l = mask_l;
    cfg.mask_s_ls = mask_s_ls;
    cfg.mask_l_ls = mask_l_ls;
    cfg.min_size = min_size;
    cfg.avg_size = avg_size;
    cfg.max_size = max_size;

    int64_t total = 0;
    for (int64_t d = 0; d < n_docs; d++) {
        const uint8_t *doc = data + offs[d];
        size_t len = (size_t)(offs[d + 1] - offs[d]);
        size_t processed = 0;
        int64_t n_chunks = 0;
        while (processed < len) {
            uint64_t h;
            size_t cutlen = fcdc_cut(doc + processed, len - processed,
                                     &cfg, gear, gear_ls, &h);
            if (cutlen == 0)
                break; /* unreachable: cut always consumes > 0 here */
            if (total >= cap)
                return -1;
            out_hash[total] = h;
            out_off[total] = (int64_t)processed;
            out_len[total] = (int64_t)cutlen;
            total++;
            n_chunks++;
            processed += cutlen;
        }
        counts[d] = n_chunks;
    }
    return total;
}

/* MinHash signature kernel — the hot inner loop of the signature stage
 * (kernel/signatures.py minhash_batch; same splitmix64-xor-seed family,
 * bit-identical to the numpy path, parity-pinned in
 * tests/test_kernel_native.py).  Doc d's shingle set is
 * flat[offs[d] .. offs[d]+counts[d]); sigs is n_docs x n_perms,
 * pre-filled by the caller with the empty-doc sentinel (0xFF..FF), and
 * sigs[d][p] = min over shingles x of splitmix64(x ^ seeds[p]). */
static inline uint64_t fcdc_sm64(uint64_t x)
{
    uint64_t z = x + 0x9E3779B97F4A7C15ULL;
    z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ULL;
    z = (z ^ (z >> 27)) * 0x94D049BB133111EBULL;
    return z ^ (z >> 31);
}

void fcdc_minhash(const uint64_t *flat, const int64_t *offs,
                  const int64_t *counts, int64_t n_docs,
                  const uint64_t *seeds, int64_t n_perms, uint64_t *sigs)
{
    for (int64_t d = 0; d < n_docs; d++) {
        int64_t cnt = counts[d];
        if (cnt == 0)
            continue; /* keep the caller's empty sentinel */
        const uint64_t *x = flat + offs[d];
        uint64_t *sig = sigs + d * n_perms;
        for (int64_t p = 0; p < n_perms; p++) {
            uint64_t s = seeds[p];
            uint64_t m = UINT64_MAX;
            for (int64_t i = 0; i < cnt; i++) {
                uint64_t z = fcdc_sm64(x[i] ^ s);
                if (z < m)
                    m = z;
            }
            sig[p] = m;
        }
    }
}

/* k-gram shingle kernel — the remaining numpy hot spot of the signature
 * stage (kernel/signatures.py kgram_shingles; bit-identical, parity-
 * pinned).  Doc d's unit hashes are flat[offs[d] .. offs[d]+counts[d]);
 * each k-gram folds as acc <- splitmix64(acc ^ h_j) over k consecutive
 * units; docs with 0 < cnt < k emit one shingle folding the whole
 * sequence.  Output per doc: ascending sorted UNIQUE shingles (matching
 * numpy's np.unique), written back-to-back into `out`; out_counts[d] is
 * the deduped count.  Caller sizes out with cap = sum(max(cnt-k+1, 1)).
 * Returns total shingles written, or -1 if cap would be exceeded. */
static int cmp_u64(const void *a, const void *b)
{
    uint64_t x = *(const uint64_t *)a, y = *(const uint64_t *)b;
    return x < y ? -1 : (x > y ? 1 : 0);
}

int64_t fcdc_shingles(const uint64_t *flat, const int64_t *offs,
                      const int64_t *counts, int64_t n_docs, int64_t k,
                      uint64_t *out, int64_t *out_counts, int64_t cap)
{
    int64_t total = 0;
    for (int64_t d = 0; d < n_docs; d++) {
        int64_t cnt = counts[d];
        const uint64_t *x = flat + offs[d];
        if (cnt == 0) {
            out_counts[d] = 0;
            continue;
        }
        int64_t m = cnt >= k ? cnt - k + 1 : 1;
        int64_t fold = cnt >= k ? k : cnt;
        if (total + m > cap)
            return -1;
        uint64_t *dst = out + total;
        for (int64_t i = 0; i < m; i++) {
            uint64_t acc = 0;
            for (int64_t j = 0; j < fold; j++)
                acc = fcdc_sm64(acc ^ x[i + j]);
            dst[i] = acc;
        }
        if (m > 1) {
            if (m <= 32) { /* typical chunk-mode sets are ~9 shingles */
                for (int64_t i = 1; i < m; i++) {
                    uint64_t v = dst[i];
                    int64_t j = i - 1;
                    while (j >= 0 && dst[j] > v) {
                        dst[j + 1] = dst[j];
                        j--;
                    }
                    dst[j + 1] = v;
                }
            } else {
                qsort(dst, (size_t)m, sizeof(uint64_t), cmp_u64);
            }
            int64_t w = 1;
            for (int64_t i = 1; i < m; i++)
                if (dst[i] != dst[w - 1])
                    dst[w++] = dst[i];
            m = w;
        }
        out_counts[d] = m;
        total += m;
    }
    return total;
}

/* SimHash kernel — 64-bit bit-majority over splitmix64'd feature hashes
 * (kernel/signatures.py simhash_batch; bit-identical, parity-pinned).
 * Ties (bit sum exactly half) resolve to 0; empty docs hash to 0. */
void fcdc_simhash(const uint64_t *flat, const int64_t *offs,
                  const int64_t *counts, int64_t n_docs, uint64_t seed,
                  uint64_t *out)
{
    for (int64_t d = 0; d < n_docs; d++) {
        int64_t cnt = counts[d];
        if (cnt == 0) {
            out[d] = 0;
            continue;
        }
        const uint64_t *x = flat + offs[d];
        int64_t sums[64] = {0};
        for (int64_t i = 0; i < cnt; i++) {
            uint64_t h = fcdc_sm64(x[i] ^ seed);
            for (int b = 0; b < 64; b++)
                sums[b] += (int64_t)((h >> b) & 1u);
        }
        uint64_t v = 0;
        for (int b = 0; b < 64; b++)
            if (2 * sums[b] > cnt)
                v |= (uint64_t)1 << b;
        out[d] = v;
    }
}
