"""Replicates the driver's correctness gate locally: run every
__spark_entry__ query at sf0.01 next to its DuckDB oracle and compare
row counts + order-insensitive values (columns sorted by name).

Kernel-backed queries without an oracle get the rows-only check here too,
plus invariant assertions where cheap.
"""

from __future__ import annotations

import math
from decimal import Decimal

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def _normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, Decimal):
                v = float(v)
            if isinstance(v, float):
                v = round(v, 6)
                if math.isclose(v, 0.0, abs_tol=1e-9):
                    v = 0.0
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple(str(x) for x in t))
    return out


@pytest.mark.parametrize("name", sorted(entrymod.oracle_sql().keys()))
def test_query_matches_oracle(spark, ddb, name):
    q = entrymod.queries()[name]
    sdf = q(spark, SF_DIR)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    res = ddb.sql(entrymod.oracle_sql()[name])
    orows = res.fetchall()
    ocols = res.columns

    assert sorted(scols) == sorted(ocols), f"{name}: column mismatch {scols} vs {ocols}"
    assert len(srows) == len(orows), f"{name}: {len(srows)} vs {len(orows)} rows"
    sn, on = _normalize(srows, scols), _normalize(orows, ocols)
    mismatches = [(a, b) for a, b in zip(sn, on) if a != b]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"


def test_rows_only_queries(spark):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    for name in qs:
        if name in oracles:
            continue
        df = qs[name](spark, SF_DIR)
        assert df.count() > 0, f"{name}: empty result"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) == 500
    assert set(df.columns) == {"doc_id", "cluster_id"}
