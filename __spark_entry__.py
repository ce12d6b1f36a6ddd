"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

All three functions are thin projections of
:mod:`pg_telemetry_spark.registry`, the single source of truth where
every SURVEY.md §2 operator registers its Spark implementation and its
DuckDB oracle SQL together (so they cannot drift).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from pg_telemetry_spark import registry  # noqa: E402
from pg_telemetry_spark.session import prepare_session  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    prepare_session(spark)
    from pg_telemetry_spark.queries.flagship import flagship_hourly_top20

    return flagship_hourly_top20(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per tier-A/B query (tier C omitted by design)."""
    return registry.oracle_sql()
