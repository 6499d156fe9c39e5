"""Mini-driver: run every queries() entry at sf0.001 and compare with
its oracle_sql() via DuckDB — row count, column names, and an
order-insensitive value hash (mirrors the external correctness gate).
"""

from __future__ import annotations

import hashlib
import math

import duckdb
import pytest

import __spark_entry__ as entrymod

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def _norm_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.6f}"
    if isinstance(v, int):
        return str(v)
    return str(v)


def _value_hash(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted(
        "|".join(_norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode("utf-8"))
        h.update(b"\n")
    return h.hexdigest()


@pytest.fixture(scope="module")
def ducks(sf_small):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_small}/{t}.parquet'"
        )
    return con


ORACLES = entrymod.oracle_sql()
QUERIES = entrymod.queries()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_runs_and_matches_oracle(name, spark, sf_small, ducks):
    sdf = QUERIES[name](spark, sf_small)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    if name not in ORACLES:
        # rows-only contract: must run and have a stable schema
        assert scols, f"{name}: no columns"
        return
    orel = ducks.sql(ORACLES[name])
    ocols = list(orel.columns)
    orows = orel.fetchall()
    assert sorted(scols) == sorted(ocols), f"{name}: column mismatch {scols} vs {ocols}"
    assert len(srows) == len(orows), f"{name}: rowcount {len(srows)} vs {len(orows)}"
    sh = _value_hash(srows, scols)
    oh = _value_hash(orows, ocols)
    if sh != oh:
        # show a small diff for debugging
        sset = {tuple(_norm_cell(v) for v in r) for r in srows}
        oset = {tuple(_norm_cell(v) for v in r) for r in orows}
        only_s = list(sset - oset)[:5]
        only_o = list(oset - sset)[:5]
        pytest.fail(f"{name}: value hash mismatch\n spark-only={only_s}\n oracle-only={only_o}")
