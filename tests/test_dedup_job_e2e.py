"""Batch dedup job end-to-end: checkpointed run, idempotent resume
(every stage reused on re-run), catalog snapshot publishing."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo/jobs")


def test_dedup_job_runs_and_resumes(spark, tmp_path):
    from dedup_job import run_dedup_job

    from fastcdc_rs_spark.pipeline import DedupConfig
    from fastcdc_rs_spark.sources.table import ParquetSnapshotCatalog

    out = str(tmp_path / "out")
    cfg = DedupConfig()
    s1 = run_dedup_job(
        spark, "/root/testdata/sf0.001/documents.parquet", out, cfg
    )
    assert s1["docs"] == 500
    assert all(e["action"] == "computed" for e in s1["stages"])
    assert s1["clusters_snapshots"] == 1

    # re-run: every stage resumes from its checkpoint, results identical,
    # and the catalog gains a snapshot (append-only history)
    s2 = run_dedup_job(
        spark, "/root/testdata/sf0.001/documents.parquet", out, cfg
    )
    assert all(e["action"] == "resumed" for e in s2["stages"]), s2["stages"]
    assert s2["verified_pairs"] == s1["verified_pairs"]
    assert s2["docs_in_nontrivial_clusters"] == s1["docs_in_nontrivial_clusters"]
    assert s2["clusters_snapshots"] == 2

    cat = ParquetSnapshotCatalog(spark, f"{out}/lake")
    c1 = {(r.doc_id, r.cluster_id) for r in cat.read("clusters", 1).collect()}
    c2 = {(r.doc_id, r.cluster_id) for r in cat.read("clusters", 2).collect()}
    assert c1 == c2 and len(c1) == 500

    # a config change invalidates the fingerprint: stages recompute
    s3 = run_dedup_job(
        spark, "/root/testdata/sf0.001/documents.parquet", out,
        DedupConfig(threshold=0.7),
    )
    assert all(e["action"] == "computed" for e in s3["stages"])
