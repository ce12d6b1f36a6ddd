"""Skew mitigation: salted two-phase aggregation and salted joins.

AQE's skew-join splitting handles most skew at runtime, but two
patterns still need explicit salting at 100 TB:

- **hot-key aggregation**: one key owning 30% of a shuffle lands on
  one reducer.  ``salted_agg`` splits each key across ``n_salts``
  partial groups (map-side random-free salt from a hash of a unique
  column, so it stays deterministic), then re-aggregates — sums and
  counts compose, so the result is exactly the unsalted one.
- **hot-key join**: ``salted_join_small`` explodes the small side
  ``n_salts`` times and salts the big side's key, turning one hot
  partition into ``n_salts`` even ones.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def with_salt(df: DataFrame, unique_col: str, n_salts: int = 16) -> DataFrame:
    """Deterministic salt in [0, n_salts): a hash of a unique column
    (never rand() — results must be reproducible across retries)."""
    return df.withColumn("__salt", F.pmod(F.xxhash64(unique_col), F.lit(n_salts)))


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, Column],
    unique_col: str,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation for composable aggregates
    (sum/count/min/max).  ``aggs`` maps output name -> partial
    aggregate expression; the final phase re-aggregates partials:
    sum of sums, sum of counts, min of mins, max of maxes — pass the
    re-aggregation implicitly by using the same function name prefix
    (sum_/count_/min_/max_)."""
    partial = (
        with_salt(df, unique_col, n_salts)
        .groupBy(*keys, "__salt")
        .agg(*[expr.alias(name) for name, expr in aggs.items()])
    )
    finals = []
    for name in aggs:
        if name.startswith(("sum_", "count_")):
            finals.append(F.sum(name).alias(name))
        elif name.startswith("min_"):
            finals.append(F.min(name).alias(name))
        elif name.startswith("max_"):
            finals.append(F.max(name).alias(name))
        else:
            raise ValueError(f"non-composable aggregate name: {name}")
    return partial.groupBy(*keys).agg(*finals)


def salted_join_small(
    big: DataFrame,
    small: DataFrame,
    key: str,
    unique_col: str,
    n_salts: int = 16,
) -> DataFrame:
    """Equi-join where ``big`` has hot keys: salt the big side, explode
    the small side across all salts, join on (key, salt)."""
    b = with_salt(big, unique_col, n_salts)
    s = small.withColumn("__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)])))
    return b.join(s, [key, "__salt"]).drop("__salt")
