"""Scaling-efficiency evidence (north rule: throughput efficiency >= 0.8
between N and 4N parallelism).

A real multi-executor cluster is unavailable in this sandbox, so — per the
driver instructions — the same job runs at two local parallelism levels
(local[8] vs local[32]) on the same input, each in a fresh JVM, and the
ratio of throughputs stands in for the two cluster sizes. Results land in
BENCH.md.

Run: python scripts/scaling.py [n_docs]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def run_at(cores: int, n_docs: int) -> dict:
    env = dict(os.environ)
    env.update(
        {
            "SPARK_GRAFT_CPUS": str(cores),
            "SPARK_GRAFT_BENCH_ONLY": "pipeline",
            "SPARK_GRAFT_SYNTH_DOCS": str(n_docs),
            "MALLOC_MMAP_THRESHOLD_": "1073741824",
            "MALLOC_TRIM_THRESHOLD_": "1073741824",
        }
    )
    out = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        capture_output=True, text=True, env=env, cwd=str(REPO), timeout=3600,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 100000
    results = {}
    for cores in (8, 32):
        t0 = time.time()
        r = run_at(cores, n_docs)
        r["wall"] = round(time.time() - t0, 1)
        results[cores] = r
        print(f"local[{cores}]: chunk+signature {r['value']} docs/sec, "
              f"pipeline {r['queries']['pipeline_docs_per_sec']} docs/sec", flush=True)

    t8, t32 = results[8]["value"], results[32]["value"]
    eff = (t32 / t8) / 4
    p8 = results[8]["queries"]["pipeline_docs_per_sec"]
    p32 = results[32]["queries"]["pipeline_docs_per_sec"]
    peff = (p32 / p8) / 4
    print(f"chunk+signature scaling efficiency (8 -> 32 cores): {eff:.3f}")
    print(f"full-pipeline scaling efficiency  (8 -> 32 cores): {peff:.3f}")

    bench_md = REPO / "BENCH.md"
    mb = results[32]["queries"]["input_mb"]
    bench_md.write_text(f"""# BENCH — measured numbers (this repo)

## Scaling efficiency (north-rule evidence)

Same job, same input ({n_docs} synthetic CC-style docs, {mb} MB text,
corpus.py seed 42, parquet-staged), fresh JVM per run. Two local
parallelism levels stand in for the N / 4N executor cluster sizes
(sandbox has no real cluster — per driver instructions). The baseline
metric is docs/sec **chunk+signature** throughput (BASELINE.json); the
full pipeline (adds LSH pair joins + verification + iterative CC, which
have a fixed per-job floor that dominates at this tiny scale and
amortizes away at real scale) is reported alongside.

| parallelism | chunk+signature (s) | chunk+sig docs/sec | full pipeline (s) | pipeline docs/sec |
|---|---|---|---|---|
| local[8]  | {results[8]["queries"]["chunk_signature"]} | {t8} | {results[8]["queries"]["pipeline_synthetic"]} | {p8} |
| local[32] | {results[32]["queries"]["chunk_signature"]} | {t32} | {results[32]["queries"]["pipeline_synthetic"]} | {p32} |

**chunk+signature scaling efficiency 8 -> 32 cores: {eff:.3f}** (target >= 0.8)
full-pipeline scaling efficiency 8 -> 32 cores: {peff:.3f}

Throughput at 32 cores: {round(t32 * mb * 1048576 / n_docs / 1048576, 1)} MB/s of text through
chunk+signature; {round(p32 * mb * 1048576 / n_docs / 1048576, 1)} MB/s through the full pipeline.
""")
    print(f"wrote {bench_md}")


if __name__ == "__main__":
    main()
