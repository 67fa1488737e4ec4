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


def test_ntz_window_filter_pushes_to_scan(spark, tmp_path):
    """A ns_window range on a TIMESTAMP_NTZ parquet column must reach
    PushedFilters (the literal is cast to timestamp_ntz so the comparison
    is NTZ-vs-NTZ — a plain datetime literal is LTZ and forces a cast
    onto the column, losing pushdown), and naive bounds must be rejected
    (a naive datetime would be reinterpreted in the driver's local tz)."""
    import io
    import re
    from contextlib import redirect_stdout
    from datetime import datetime, timezone

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from outpost_spark.queries_catalog import _t

    ts = pd.date_range("2024-01-01", periods=1000, freq="h")
    pq.write_table(
        pa.table({"id": list(range(1000)), "ts": pa.array(ts, type=pa.timestamp("us"))}),
        str(tmp_path / "ntz.parquet"),
    )
    df = _t(
        spark,
        str(tmp_path),
        "ntz",
        ns_window={
            "ts": (
                datetime(2024, 1, 10, tzinfo=timezone.utc),
                datetime(2024, 1, 20, tzinfo=timezone.utc),
            )
        },
    )
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    m = re.search(r"PushedFilters: \[([^\]]*)\]", buf.getvalue())
    assert m and "GreaterThanOrEqual(ts" in m.group(1) and "LessThan(ts" in m.group(1)
    assert df.count() == 240

    with pytest.raises(ValueError, match="tz-aware"):
        _t(spark, str(tmp_path), "ntz", ns_window={"ts": (datetime(2024, 1, 10), None)})
