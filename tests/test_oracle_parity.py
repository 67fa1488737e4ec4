"""Local mirror of the driver's t2 correctness gate: run every catalog
query on Spark AND its DuckDB oracle on the same parquet, compare
row-count + column names + order-insensitive values."""

import datetime as dt
import math
import os

import duckdb
import pytest

from outpost_spark import queries_catalog

TABLES = (
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
)


def _norm(v):
    if isinstance(v, dt.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(dt.timezone.utc).replace(tzinfo=None)
        return ("ts", v.isoformat())
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        return ("f", f"{v:.9g}")
    if v is None:
        return ("null",)
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return ("f", f"{float(v):.9g}")
    except Exception:
        pass
    return (type(v).__name__, str(v))


def _rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


@pytest.fixture(scope="module")
def ddb(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


ALL = sorted(queries_catalog.queries().keys())


@pytest.mark.parametrize("name", ALL)
def test_query_matches_oracle(spark, sf_dir, ddb, name):
    q = queries_catalog.queries()[name]
    oracles = queries_catalog.oracle_sql()
    sdf = q(spark, sf_dir)
    srows = sdf.collect()
    scols = sdf.columns
    if name not in oracles:
        assert len(srows) >= 0  # rows-only check for non-SQL-expressible ops
        return
    res = ddb.execute(oracles[name])
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    assert sorted(scols) == sorted(ocols), f"{name}: column names differ"
    assert len(srows) == len(orows), f"{name}: row count {len(srows)} != {len(orows)}"
    sset = _rowset(scols, [[r[c] for c in scols] for r in srows])
    oset = _rowset(ocols, orows)
    mismatches = [i for i, (a, b) in enumerate(zip(sset, oset)) if a != b]
    assert not mismatches, (
        f"{name}: {len(mismatches)} mismatched rows; first: "
        f"spark={sset[mismatches[0]]} oracle={oset[mismatches[0]]}"
    )
