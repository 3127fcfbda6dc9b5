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


def test_incremental_from_catalog_snapshot_diff(spark, tmp_path):
    import numpy as np

    from incremental_dedup_job import run_incremental_from_catalog

    from fastcdc_rs_spark.sources.table import ParquetSnapshotCatalog

    rng = np.random.default_rng(31)

    def _text(seed):
        r = np.random.default_rng(seed)
        return " ".join(
            "".join(chr(97 + c) for c in r.integers(0, 26, 8)) for _ in range(120)
        )

    T, U = _text(1), _text(2)
    cat = ParquetSnapshotCatalog(spark, tmp_path / "lake")
    work = str(tmp_path / "work")
    era1 = spark.createDataFrame(
        [(1, T, 0), (2, T, 0), (3, U, 1)], "doc_id long, text string, shard int"
    )
    cat.write(era1, "docs", partition_by="shard")

    s1 = run_incremental_from_catalog(spark, cat, "docs", work)
    assert s1 == {"processed_snapshots": 1, "docs": 3, "snapshot_id": 1}
    pairs1 = {
        (r.a, r.b)
        for r in spark.read.parquet(f"{work}/pairs").select("a", "b").collect()
    }
    assert pairs1 == {(1, 2)}  # within-era duplicate

    # no new snapshot -> no-op
    assert run_incremental_from_catalog(spark, cat, "docs", work)[
        "processed_snapshots"
    ] == 0

    # era 2: shard 1 rewritten with a new near-dup of T -> only the
    # changed partition is processed; cross-era pairs hit the index
    era2 = spark.createDataFrame(
        [(4, T, 1)], "doc_id long, text string, shard int"
    )
    cat.overwrite_partitions(era2, "docs", "shard")
    s2 = run_incremental_from_catalog(spark, cat, "docs", work)
    assert s2 == {"processed_snapshots": 1, "docs": 1, "snapshot_id": 2}
    pairs2 = {
        (r.a, r.b)
        for r in spark.read.parquet(f"{work}/pairs").select("a", "b").collect()
    }
    assert pairs2 == {(1, 2), (1, 4), (2, 4)}


def test_incremental_catalog_pending_state_pins_crashed_range(spark, tmp_path):
    # a crash after the write-ahead intent must finish the PINNED range on
    # retry, even when newer snapshots were committed meanwhile
    import json

    from incremental_dedup_job import run_incremental_from_catalog

    from fastcdc_rs_spark.sources.table import ParquetSnapshotCatalog

    def _text(seed):
        import numpy as np

        r = np.random.default_rng(seed)
        return " ".join(
            "".join(chr(97 + c) for c in r.integers(0, 26, 8)) for _ in range(120)
        )

    cat = ParquetSnapshotCatalog(spark, tmp_path / "lake")
    work = tmp_path / "work"
    era1 = spark.createDataFrame(
        [(1, _text(1), 0)], "doc_id long, text string, shard int"
    )
    cat.write(era1, "docs", partition_by="shard")
    s1 = run_incremental_from_catalog(spark, cat, "docs", str(work))
    assert s1["snapshot_id"] == 1

    # snapshots 2 and 3 land; simulate a crash mid-way through processing 2
    cat.overwrite_partitions(
        spark.createDataFrame([(2, _text(2), 1)], "doc_id long, text string, shard int"),
        "docs", "shard",
    )
    cat.overwrite_partitions(
        spark.createDataFrame([(3, _text(3), 2)], "doc_id long, text string, shard int"),
        "docs", "shard",
    )
    state = work / "_snapshot_state.json"
    state.write_text(json.dumps({"snapshot_id": 1, "pending": 2}))

    s2 = run_incremental_from_catalog(spark, cat, "docs", str(work))
    assert s2 == {"processed_snapshots": 1, "docs": 1, "snapshot_id": 2}
    assert json.loads(state.read_text()) == {"snapshot_id": 2}
    # the next tick picks up snapshot 3's range separately
    s3 = run_incremental_from_catalog(spark, cat, "docs", str(work))
    assert s3 == {"processed_snapshots": 1, "docs": 1, "snapshot_id": 3}
