"""Round-7 optimization harness (NOT the frozen driver bench).

Per-query isolation per the optimization guide §1: each target query is
timed with the noop sink (every column computed, nothing collected) and
its ``explain("formatted")`` plan is dumped to ``plans/r07/``. bench.py
stays untouched — this file exists so optimization evidence (before/after
seconds + plan shape) can be regenerated without editing the frozen
measurement.

Usage:
  python bench_extra.py plans [suffix]      # dump plans/r07/<q>_<suffix>.txt
  python bench_extra.py time q1 q2 ...      # time selected queries (reps=3)
  python bench_extra.py time all            # time every benched query

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS,
SPARK_GRAFT_EXTRA_REPS (default 3).
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
REPS = int(os.environ.get("SPARK_GRAFT_EXTRA_REPS", "3"))
PLAN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r07")

# the queries bench.py times (same names), minus the two non-entry ones
BENCH_QUERIES = [
    "chunks", "minhash_bands", "simhash", "token_stats", "bpe_token_stats",
    "quality_scores", "doc_fingerprint", "exact_dedup_flags",
    "ngram_jaccard", "ngram_jaccard_capped", "substring_pairs",
    "embedding_topk_ivf", "dedup_clusters", "dedup_clusters_sql",
]

# entry queries NOT on bench.py's timed list but restructured this round
# (report items 8/11/12) — plan evidence only, timed on request
EXTRA_PLAN_QUERIES = [
    "vocabulary_topk", "repetition_scores", "simhash_sql",
    "simhash_hamming_pairs",
]


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def _session():
    from fastcdc_rs_spark.session import spark_session

    spark = spark_session(app="fastcdc-rs-spark-bench-extra", cores=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _banded(spark, sf_dir):
    import pyspark.sql.functions as F  # noqa: F401
    from fastcdc_rs_spark.operators.knn import cosine_near_duplicates_banded

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    dim = len(emb.select("embedding").first()[0])
    return cosine_near_duplicates_banded(
        emb, threshold=0.8, dim=dim, bands=8, rows_per_band=10, bucket_cap=64
    )


def all_dfs(spark, extra: bool = False):
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    names = BENCH_QUERIES + (EXTRA_PLAN_QUERIES if extra else [])
    out = {name: (lambda name=name: qs[name](spark, SF_DIR)) for name in names}
    out["embedding_near_dups_banded"] = lambda: _banded(spark, SF_DIR)
    # optional comma-list filter, e.g. to regenerate one query's plan
    only = os.environ.get("SPARK_GRAFT_PLAN_QUERIES")
    if only:
        keep = {s.strip() for s in only.split(",") if s.strip()}
        out = {k: v for k, v in out.items() if k in keep}
    return out


def cmd_plans(suffix: str) -> None:
    os.makedirs(PLAN_DIR, exist_ok=True)
    spark = _session()
    from fastcdc_rs_spark.cache import release_all

    import contextlib
    import io

    for name, thunk in all_dfs(spark, extra=True).items():
        df = thunk()
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")  # DataFrame.explain prints from Python
        path = os.path.join(PLAN_DIR, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"{name}: {path}", flush=True)
        release_all()
    spark.stop()


def cmd_time(names: list[str]) -> None:
    spark = _session()
    from fastcdc_rs_spark.cache import release_all

    dfs = all_dfs(spark)
    if names == ["all"]:
        names = list(dfs)
    # warmup: spin up python workers / numpy arenas (mirrors bench.py)
    import __spark_entry__ as entrymod

    _noop(entrymod.q_chunks(spark, SF_DIR).limit(2000))
    release_all()
    results = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"bench_extra: {name}")
        ts = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            _noop(dfs[name]())
            ts.append(round(time.perf_counter() - t0, 3))
            release_all()
        results[name] = ts
        print(json.dumps({name: ts}), flush=True)
    print(json.dumps({"min": {k: min(v) for k, v in results.items()}}))
    spark.stop()


if __name__ == "__main__":
    if len(sys.argv) >= 2 and sys.argv[1] == "plans":
        cmd_plans(sys.argv[2] if len(sys.argv) > 2 else "before")
    elif len(sys.argv) >= 3 and sys.argv[1] == "time":
        cmd_time(sys.argv[2:])
    else:
        print(__doc__)
        sys.exit(2)
