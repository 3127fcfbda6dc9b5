"""Probe: raw chunk+signature scaling across process counts (no Spark).

Establishes this machine's parallel-numpy ceiling so the Spark scaling
numbers have a hardware baseline. Not part of the bench contract.
"""

from __future__ import annotations

import multiprocessing as mp
import os
import time

import numpy as np


def worker(n_docs: int) -> float:
    os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "1073741824")
    from fastcdc_rs_spark.kernel import ChunkerConfig
    from fastcdc_rs_spark.kernel.batch import chunk_batch
    from fastcdc_rs_spark.kernel.signatures import signature_batch

    rng = np.random.default_rng(os.getpid())
    docs = [rng.integers(0, 256, 2500, dtype=np.uint8) for _ in range(n_docs)]
    cfg = ChunkerConfig(64, 256, 1024)
    chunk_batch(docs[:200], cfg)  # warm
    t0 = time.perf_counter()
    res = chunk_batch(docs, cfg)
    units = [np.array([h for h, _, _ in r], dtype=np.uint64) for r in res]
    signature_batch(units, k=1, n_perms=128, bands=32, rows=4)
    return n_docs / (time.perf_counter() - t0)


def main() -> None:
    for procs in (1, 2, 8, 32):
        with mp.Pool(procs) as p:
            p.map(worker, [500] * procs)  # warm pool arenas
            rates = p.map(worker, [4000] * procs)
        total = sum(rates)
        print(f"{procs} procs: {total:.0f} docs/s aggregate ({total / procs:.0f}/proc)", flush=True)


if __name__ == "__main__":
    mp.set_start_method("fork")
    main()
