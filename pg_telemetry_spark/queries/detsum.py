"""Order-independent (deterministic) float aggregation helpers.

Round 8's decade-up oracle sweep (full 228-query registry at sf0.1,
`SPARK_GRAFT_SIM_SF`) exposed a bug class invisible at the sf0.01
gate: `round(sum(double), 6)` hash-matches DuckDB at 60k rows but
NOT always at 600k, because float summation is order-dependent and
Spark's partial-aggregate tree sums in a different order than
DuckDB's sequential scan — at 6 retained decimals on ~1e9 magnitudes
the accumulated ulp noise crosses rounding boundaries.

The fix is the discipline TPC-H itself specifies for money columns:
aggregate EXACT DECIMALS.  Per-row double arithmetic is
engine-deterministic (IEEE, same operand order both sides); casting
the per-row value to DECIMAL(18, 6) is a single deterministic
rounding; decimal addition is associative, so the sum is exact and
order-independent; the final cast back to double is one more
deterministic rounding of identical values.  Both engines must apply
the same recipe — use :func:`dsum` / :func:`davg` in Spark and
`round(CAST(sum(CAST(x AS DECIMAL(18,6))) AS DOUBLE), 6)` in the
oracle SQL.

At 100 TB this is also the RIGHT answer operationally: decimal sums
make re-runs, retries, and AQE re-plans bit-stable, so downstream
hash-partitioned writes and change detection don't see phantom
diffs.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

#: 18 digits / 6 decimals: covers |x| < 1e12 per row; Spark widens the
#: sum to DECIMAL(28, 6), DuckDB to DECIMAL(38, 6) — both exact.
_DEC = "decimal(18,6)"


def dsum(col, scale: int = 6) -> Column:
    """Order-independent sum of a double expression, rounded to
    ``scale`` decimals: exact DECIMAL(18,6) accumulation, cast back
    to double."""
    c = col if isinstance(col, Column) else F.col(col)
    return F.round(F.sum(c.cast(_DEC)).cast("double"), scale)


def davg(col, scale: int = 6) -> Column:
    """Order-independent mean: exact decimal sum divided by the
    count in double (identical operands on both engines ⇒ identical
    quotient), rounded to ``scale`` decimals."""
    c = col if isinstance(col, Column) else F.col(col)
    return F.round(
        F.sum(c.cast(_DEC)).cast("double") / F.count(c), scale
    )


#: Oracle-side templates for the same recipe.
DSUM_SQL = "round(CAST(sum(CAST({x} AS DECIMAL(18,6))) AS DOUBLE), 6)"
DAVG_SQL = (
    "round(CAST(sum(CAST({x} AS DECIMAL(18,6))) AS DOUBLE) / count({x}), 6)"
)
