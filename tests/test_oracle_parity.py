"""Local twin of the driver's correctness gate: run every catalog query
on Spark AND its DuckDB oracle on the same parquet, compare row count,
column names, and order-insensitive values.

Comparison is strict (exact ints/strings/timestamps, bit-level doubles —
the catalog's determinism rules make that achievable); mismatches print
a diff sample.
"""

from __future__ import annotations

import datetime
import decimal
import math

import duckdb
import numpy as np
import pytest

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


def _duck(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, np.generic):
        v = v.item()
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else v
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, (datetime.datetime, datetime.date)) or hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple, np.ndarray)):
        return tuple(_norm_cell(x) for x in v)
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    return v


def _norm_rows(rows):
    return sorted((tuple(_norm_cell(v) for v in r) for r in rows), key=repr)


def _query_names():
    import __spark_entry__ as entry

    qs = entry.queries()
    oracles = entry.oracle_sql()
    return [(name, fn, oracles.get(name)) for name, fn in qs.items()]


@pytest.mark.parametrize(
    "name", [n for n, _, o in _query_names() if o is not None]
)
def test_oracle_parity(spark, sf_dir, name):
    specs = {n: (fn, o) for n, fn, o in _query_names()}
    fn, oracle = specs[name]

    sdf = fn(spark, sf_dir)
    spark_rows = sdf.collect()
    spark_cols = sdf.columns

    con = _duck(sf_dir)
    duck = con.sql(oracle)
    duck_cols = [d[0] for d in duck.description]
    duck_rows = duck.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch spark={spark_cols} duck={duck_cols}"
    )

    order = sorted(spark_cols)
    s_idx = [spark_cols.index(c) for c in order]
    d_idx = [duck_cols.index(c) for c in order]
    s_rows = _norm_rows(([r[i] for i in s_idx] for r in spark_rows))
    d_rows = _norm_rows(([r[i] for i in d_idx] for r in duck_rows))

    assert len(s_rows) == len(d_rows), (
        f"{name}: row count spark={len(s_rows)} duck={len(d_rows)}"
    )
    if s_rows != d_rows:
        diffs = [
            (a, b) for a, b in zip(s_rows, d_rows) if a != b
        ]
        raise AssertionError(
            f"{name}: {len(diffs)} mismatched rows of {len(s_rows)}; "
            f"first 3: {diffs[:3]}"
        )


def test_entry_smoke(spark):
    import __spark_entry__ as entry

    df = entry.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns
