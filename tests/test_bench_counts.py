"""The BENCH.md verification-count line is generated, never hand-written
(it drifted twice across rounds); pin the updater's contract."""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "scripts"))
sys.path.insert(0, str(REPO))


def _realistic_bench_payload() -> dict:
    """A payload at round-4 shape (the one whose JSON line outgrew the
    driver's ~2 KB tail capture and landed as parsed:null)."""
    qnames = [
        "chunks", "minhash_bands", "simhash", "token_stats",
        "bpe_token_stats", "quality_scores", "doc_fingerprint",
        "exact_dedup_flags", "ngram_jaccard", "ngram_jaccard_capped",
        "substring_pairs", "embedding_topk_ivf", "dedup_clusters",
        "dedup_clusters_sql", "embedding_near_dups_banded",
        "pipeline_synthetic", "pipeline_synthetic_docs_per_sec",
    ]
    timings = {q: 12345.678 for q in qnames}
    samples = {q: [12345.678, 12345.678, 12345.678] for q in qnames}
    pm = {
        "docs": 100000, "units_total": 881327, "candidate_pairs": 37826,
        "verified_pairs": 32270, "buckets": 159278, "max_bucket": 5000,
        "capped_buckets": 64, "capped_docs": 192235, "cc_rounds": 0,
        "cc_sym_edges": 64540, "cc_loop_partitions": 0,
        "cc_mode": "driver", "units_per_doc": 8.813,
        "bucket_hist": '{"1": 67006, "2": 60685, "3": 31521, "13": 32}',
    }
    s2q = {q: 12345.678 for q in qnames if q not in
           ("ngram_jaccard", "dedup_clusters_sql")}
    return {
        "metric": "headline_queries_total",
        "value": 12345.678,
        "unit": "sec",
        "queries": timings,
        "samples": samples,
        "reps": 3,
        "burst": {"probe_s": [1.301, 2.602], "index": [1.0, 2.0]},
        "rep_spread_max": ["ngram_jaccard", 1.82],
        "pipeline_metrics": pm,
        "scale2": {"factor": 10, "docs": 500000, "pipeline_docs": 800000,
                   "queries": s2q, "samples": samples},
        "sf": 0.1,
    }


def test_bench_final_line_fits_driver_tail_capture():
    # BENCH_r04.json was parsed:null because the one-line JSON outgrew
    # the driver's ~2 KB stdout tail window. The final line is now a
    # compact projection with a hard bound; both scale points and the
    # pipeline metric counts must survive the compaction.
    import json

    import bench

    payload = _realistic_bench_payload()
    line = bench.final_line(payload)
    assert len(line) < bench.MAX_FINAL_LINE
    back = json.loads(line)
    assert back["queries"]["pipeline_synthetic"] == 12345.678
    assert back["scale2"]["queries"]["pipeline_synthetic"] == 12345.678
    assert back["pipeline_metrics"]["verified_pairs"] == 32270
    assert "samples" not in back and "samples" not in back["scale2"]
    assert "bucket_hist" not in back["pipeline_metrics"]
    # the burst attribution (round-5 verdict: hot windows must be
    # readable from the artifact alone) survives compaction
    assert back["burst"]["index"] == [1.0, 2.0]
    assert back["rep_spread_max"] == ["ngram_jaccard", 1.82]


def test_claude_md_carries_no_hardcoded_test_count():
    # Third count-drift instance (215 vs 217 in round 4): CLAUDE.md must
    # not embed a literal test count — BENCH.md's counts line is
    # generated; this one is simply banned.
    import re

    text = (REPO / "CLAUDE.md").read_text()
    assert not re.search(r"\b\d+\s+tests\b", text), (
        "CLAUDE.md hardcodes a test count — it drifts; remove the number"
    )


def test_bench_final_line_ladder_never_exceeds_bound():
    import json

    import bench

    payload = _realistic_bench_payload()
    # adversarial: a pathological metrics blob forces the drop ladder
    payload["pipeline_metrics"]["bucket_hist_big"] = "x" * 5000
    line = bench.final_line(payload)
    assert len(line) <= bench.MAX_FINAL_LINE
    back = json.loads(line)
    assert back["metric"] == "headline_queries_total"


def test_counts_line_regex_targets_generated_portion_only():
    from update_bench_counts import _LINE_RE

    line = ("- 39 of 45 driver queries have DuckDB oracle twins (the rest "
            "are kernel-backed, rows-only by declared design); latest "
            "driver artifact (CORRECTNESS_r02.json): 35/35 oracle-checked "
            "queries green (rows+schema+value-hash) — including seven "
            "TPC-H-shape relational queries")
    out = _LINE_RE.sub("NEW-COUNTS", line)
    assert out == "- NEW-COUNTS — including seven TPC-H-shape relational queries"


def test_bench_md_counts_line_matches_live_contract():
    # BENCH.md's committed line must agree with the live driver contract
    # (query/oracle counts — the exact drift the verdicts flagged in
    # rounds 2 and 3). Round-5 verdict added the staleness half: the
    # cited artifact must be the NEWEST CORRECTNESS_r*.json on disk, so
    # a new driver artifact landing turns this test into a one-line
    # instruction to run the updater instead of silently going stale
    # (the r5 verdict caught BENCH.md citing r04 after r05 landed).
    import re

    from scaling import _oracle_counts
    from update_bench_counts import _LINE_RE

    text = (REPO / "BENCH.md").read_text()
    m = _LINE_RE.search(text)
    assert m is not None, "counts line missing from BENCH.md"
    live = _oracle_counts()
    committed = m.group(0)
    prefix = re.match(r"\d+ of \d+ driver queries have DuckDB oracle twins",
                      live).group(0)
    assert committed.startswith(prefix), (
        "BENCH.md counts line is stale vs the live contract — run "
        "scripts/update_bench_counts.py"
    )
    arts = sorted(p.name for p in REPO.glob("CORRECTNESS_r*.json"))
    cited = re.search(r"\((CORRECTNESS_r\d+\.json)\)", committed)
    if arts:
        assert cited is not None, "counts line lost its artifact citation"
        assert cited.group(1) == arts[-1], (
            f"BENCH.md cites {cited.group(1)} but {arts[-1]} is newer — "
            "run scripts/update_bench_counts.py"
        )
