"""Run every registered tier-A/B query against its DuckDB oracle.

This is a local duplicate of the driver's t2 gate — mismatches are
caught here before the driver runs.  Tier-C queries get a rows-run
smoke check instead.
"""

from __future__ import annotations

import pytest

from pg_telemetry_spark.registry import all_queries
from tests.oracle import assert_oracle_match

_ALL = all_queries()
_ORACLE = sorted(n for n, q in _ALL.items() if q.oracle is not None)
_ROWS_ONLY = sorted(n for n, q in _ALL.items() if q.oracle is None)


@pytest.mark.parametrize("name", _ORACLE)
def test_oracle_parity(name, spark, sf_dir, oracle_con):
    q = _ALL[name]
    df = q.fn(spark, sf_dir)
    assert_oracle_match(df, oracle_con, q.oracle, name=name)


@pytest.mark.parametrize("name", _ROWS_ONLY)
def test_rows_only_runs(name, spark, sf_dir):
    q = _ALL[name]
    df = q.fn(spark, sf_dir)
    # must execute and produce a stable, non-crashing result
    assert df.count() >= 0
