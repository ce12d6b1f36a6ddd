"""Registry-wide oracle result-type guard.

The driver's pandas-path normalization (``fetchdf``) renders DuckDB
HUGEINT/UHUGEINT columns as float64, so an oracle that types a column
HUGEINT hash-mismatches a Spark BIGINT (``512.0`` vs ``512``) even
when the values are identical.  DuckDB types ``sum(BIGINT)`` as
HUGEINT, which makes this an easy trap to re-introduce with any new
running-sum oracle.  This test closes the bug class: every registered
oracle's relation is type-checked (lazily — DESCRIBE-level, no full
execution) and must contain no HUGEINT/UHUGEINT column.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry

_FORBIDDEN = {"HUGEINT", "UHUGEINT"}

_ORACLES = entry.oracle_sql()


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_oracle_no_hugeint(name, oracle_con):
    rel = oracle_con.sql(_ORACLES[name])
    bad = [
        f"{col}: {typ}"
        for col, typ in zip(rel.columns, [str(t).upper() for t in rel.types])
        if any(f in typ for f in _FORBIDDEN)
    ]
    assert not bad, (
        f"{name}: oracle emits driver-hostile integer types {bad}; "
        "CAST(... AS BIGINT) in the oracle SQL"
    )
