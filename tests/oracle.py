"""Mirror of the driver's t2 compare: row-count + schema + value equality.

The driver sorts columns by name, then hashes the (order-insensitive)
multiset of row values.  This mirror is at least as strict: it
compares the sorted-row multisets for exact equality after a canonical
normalization, so anything passing here hashes equal under any
reasonable value-hash.
"""

from __future__ import annotations

import datetime as dt
import math
from decimal import Decimal

from pyspark.sql import DataFrame


def _norm_value(v):
    if v is None:
        return None
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # repr keeps the -0.0/0.0 distinction: the driver's value-hash
        # may too, so the mirror must be at least that strict
        return repr(round(v, 9))
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_value(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm_value(x)) for k, x in v.items()))
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    return v


def _sort_key(row):
    return tuple((x is None, str(type(x)), str(x)) for x in row)


def spark_rows(df: DataFrame) -> tuple[list[str], list[tuple]]:
    cols = sorted(df.columns)
    rows = [tuple(_norm_value(r[c]) for c in cols) for r in df.collect()]
    return cols, sorted(rows, key=_sort_key)


def duckdb_rows(con, sql: str) -> tuple[list[str], list[tuple]]:
    cur = con.execute(sql)
    names = [d[0] for d in cur.description]
    order = sorted(range(len(names)), key=lambda i: names[i])
    cols = [names[i] for i in order]
    rows = [tuple(_norm_value(r[i]) for i in order) for r in cur.fetchall()]
    return cols, sorted(rows, key=_sort_key)


def assert_oracle_match(df: DataFrame, con, sql: str, name: str = "?") -> None:
    s_cols, s_rows = spark_rows(df)
    d_cols, d_rows = duckdb_rows(con, sql)
    assert s_cols == d_cols, f"{name}: column names differ: spark={s_cols} duckdb={d_cols}"
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count differs: spark={len(s_rows)} duckdb={len(d_rows)}"
    )
    for i, (sr, dr) in enumerate(zip(s_rows, d_rows)):
        assert sr == dr, (
            f"{name}: row {i} differs (cols {s_cols}):\n  spark={sr}\n  duckdb={dr}"
        )
