"""Gear-hash lookup tables for the FastCDC v2020 kernel.

The reference (fastcdc-rs) bakes a 256-entry ``GEAR: [u64; 256]`` table into
the source: entry *i* is the first 8 bytes (big-endian) of ``MD5(bytes([i]*64))``
(reference: src/v2020/mod.rs:105-177; generator examples/table64.rs:16-36).
``GEAR_LS`` is the same table shifted left one bit (src/v2020/mod.rs:186-251,
examples/table64ls.rs:15-36).

We regenerate both tables from the MD5 recipe at import time (cheap, 256
digests) instead of vendoring 2 KiB of literals; a pinned-checksum test
(tests/test_gear_tables.py) guards against drift from the reference values.

Seeding (reference src/v2020/mod.rs:260-277): a non-zero seed is XOR'd into
every GEAR entry, and ``seed << 1`` into every GEAR_LS entry.
"""

from __future__ import annotations

import hashlib

import numpy as np

__all__ = ["GEAR", "GEAR_LS", "MASKS", "gear_with_seed"]


def _make_gear() -> np.ndarray:
    """First 8 bytes (big-endian) of MD5 of each byte value repeated 64x."""
    vals = [
        int.from_bytes(hashlib.md5(bytes([i]) * 64).digest()[:8], "big")
        for i in range(256)
    ]
    return np.array(vals, dtype=np.uint64)


GEAR: np.ndarray = _make_gear()
GEAR.setflags(write=False)

GEAR_LS: np.ndarray = GEAR << np.uint64(1)
GEAR_LS.setflags(write=False)

# Cut-point judgment masks per target-size power of two; indices 0-5 padding.
# Values from the destor C reference + restic-FastCDC, vendored verbatim by
# the reference at src/v2020/mod.rs:75-102 (identical at src/v2016/mod.rs:54-81).
MASKS: np.ndarray = np.array(
    [
        0,  # padding
        0,  # padding
        0,  # padding
        0,  # padding
        0,  # padding
        0x0000000001804110,  # unused except for NC 3
        0x0000000001803110,  # 64B
        0x0000000018035100,  # 128B
        0x0000001800035300,  # 256B
        0x0000019000353000,  # 512B
        0x0000590003530000,  # 1KB
        0x0000D90003530000,  # 2KB
        0x0000D90103530000,  # 4KB
        0x0000D90303530000,  # 8KB
        0x0000D90313530000,  # 16KB
        0x0000D90F03530000,  # 32KB
        0x0000D90303537000,  # 64KB
        0x0000D90703537000,  # 128KB
        0x0000D90707537000,  # 256KB
        0x0000D91707537000,  # 512KB
        0x0000D91747537000,  # 1MB
        0x0000D91767537000,  # 2MB
        0x0000D93767537000,  # 4MB
        0x0000D93777537000,  # 8MB
        0x0000D93777577000,  # 16MB
        0x0000DB3777577000,  # unused except for NC 3
    ],
    dtype=np.uint64,
)
MASKS.setflags(write=False)


def gear_with_seed(seed: int) -> tuple[np.ndarray, np.ndarray]:
    """Return (gear, gear_ls) tables XOR'd with the seed.

    Mirrors reference ``get_gear_with_seed`` (src/v2020/mod.rs:260-277):
    seed==0 returns the shared static tables (no copy); otherwise GEAR is
    XOR'd with ``seed`` and GEAR_LS with ``seed << 1`` (mod 2**64).
    """
    if seed == 0:
        return GEAR, GEAR_LS
    s = np.uint64(seed & 0xFFFFFFFFFFFFFFFF)
    s_ls = np.uint64((seed << 1) & 0xFFFFFFFFFFFFFFFF)
    return GEAR ^ s, GEAR_LS ^ s_ls
