"""Query registry — the single source of truth for the driver contract.

Every operator from SURVEY.md §2 registers here with a name, a Spark
callable ``(spark, sf_dir) -> DataFrame``, and (tier A/B) the
equivalent DuckDB oracle SQL.  ``__spark_entry__.queries()`` and
``oracle_sql()`` are thin projections of this registry, which makes it
impossible for the two dicts to drift apart.

Tiers (SURVEY.md §2):
  A — full DuckDB hash-match oracle.
  B — hash-match with forced determinism (tie-breaks, array_sort,
      double casts, round(…,6)).
  C — rows-only check (no oracle SQL): approx / randomized /
      streaming-only / plan-shape operators.
"""

from __future__ import annotations

import functools
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from pg_telemetry_spark.cache import release_pinned

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class RegisteredQuery:
    name: str
    fn: QueryFn
    oracle: str | None
    tier: str
    group: str
    doc: str = field(default="")


_REGISTRY: dict[str, RegisteredQuery] = {}


def query(name: str, *, oracle: str | None = None, tier: str = "A", group: str = "misc"):
    """Decorator registering an operator implementation.

    ``oracle`` is the DuckDB SQL string (None for tier C).  Column
    names MUST match between the Spark result and the oracle — the
    driver sorts columns by name before hashing.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        if (oracle is None) != (tier == "C"):
            raise ValueError(f"{name}: tier {tier} inconsistent with oracle presence")

        # Release the PREVIOUS query's pinned intermediates at build
        # time: by the time a consumer builds query N, query N-1's
        # result has been materialized, so its pins are dead weight.
        # This bounds cached storage to one query's pins in every
        # consumer (driver sweep, bench, pytest) without each having
        # to know the cache module exists.  The ORIGINAL fn is
        # returned (and used for intra-module composition) so a query
        # that reuses another query's builder doesn't release its own
        # pins mid-build.
        @functools.wraps(fn)
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            release_pinned()
            return fn(spark, sf_dir)

        _REGISTRY[name] = RegisteredQuery(
            name=name, fn=wrapped, oracle=oracle, tier=tier, group=group,
            doc=fn.__doc__ or "",
        )
        return fn

    return deco


def _load_all() -> None:
    """Import every query module (side effect: registration)."""
    import pg_telemetry_spark.queries  # noqa: F401


def all_queries() -> dict[str, RegisteredQuery]:
    _load_all()
    return dict(_REGISTRY)


def queries() -> dict[str, QueryFn]:
    return {name: rq.fn for name, rq in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: rq.oracle for name, rq in all_queries().items() if rq.oracle is not None
    }
