"""Rewrite BENCH.md's verification-count line from the live driver
contract + the NEWEST CORRECTNESS_r*.json artifact.

The count line drifted twice when it was hand-written (r2 verdict, then
again in r3: BENCH.md cited CORRECTNESS_r02 after r03 existed). The line
is now only ever EMITTED — by scripts/scaling.py when it regenerates the
whole file, or surgically by this script without re-running any
benchmark:

    python scripts/update_bench_counts.py

Run it whenever a driver query is added or a new correctness artifact
lands; it replaces the generated portion of the line and leaves the
curated trailer (" — including ...") untouched.
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

sys.path.insert(0, str(REPO / "scripts"))
from scaling import _oracle_counts  # noqa: E402  (shared single source)

_LINE_RE = re.compile(
    r"\d+ of \d+ driver queries have DuckDB oracle twins.*?(?= — including)"
)


def main() -> None:
    bench_md = REPO / "BENCH.md"
    text = bench_md.read_text()
    counts = _oracle_counts()
    new_text, n = _LINE_RE.subn(counts, text)
    if n != 1:
        raise SystemExit(
            f"expected exactly one counts line in BENCH.md, found {n} — "
            "regenerate via scripts/scaling.py instead"
        )
    if new_text != text:
        bench_md.write_text(new_text)
        print(f"BENCH.md counts line updated: {counts}")
    else:
        print("BENCH.md counts line already current")


if __name__ == "__main__":
    main()
