"""Batch as-of join — the standard tsdb enrichment primitive.

Spark's batch DataFrame API has no native as-of join, and the naive
``left.ts >= right.ts`` non-equi formulation plans as a
BroadcastNestedLoopJoin — O(n·m), a non-starter at scale.  This
implements the window-union pattern:

1. tag both sides and union them on a common (key, ts) spine,
2. sort within key partitions (the same shuffle a groupBy(key) does),
3. carry the latest right-side value forward with
   ``last(value, ignorenulls=True)`` over rows-unbounded-preceding,
4. keep only left rows; each now holds the most recent right value
   with ``right.ts <= left.ts``.

Cost: one hash shuffle on the key + one partition-local sort —
O(n log n) within partitions, no quadratic blowup, no skew beyond
what the key distribution already implies.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """For each left row: latest right values with right_ts <= left_ts.

    Left columns are preserved; ``value_cols`` arrive as
    ``asof_<name>`` (null when no prior right row, or when the match
    is older than ``tolerance_seconds``).
    """
    lhs = left.select(
        F.col(key),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"asof_{c}") for c in value_cols],
        F.struct(*left.columns).alias("__row"),
    )
    rhs = right.select(
        F.col(key),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        *[F.col(c).alias(f"asof_{c}") for c in value_cols],
        F.lit(None)
        .cast(lhs.schema["__row"].dataType)
        .alias("__row"),
    )
    # right rows sort before left rows at identical ts (<= semantics)
    w = (
        Window.partitionBy(key)
        .orderBy("__ts", "__is_left")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = lhs.unionByName(rhs).select(
        "*",
        *[
            F.last(f"asof_{c}", ignorenulls=True).over(w).alias(f"__carry_{c}")
            for c in value_cols
        ],
        F.last(F.when(F.col("__is_left") == 0, F.col("__ts")), ignorenulls=True)
        .over(w)
        .alias("__match_ts"),
    )
    out = carried.filter(F.col("__is_left") == 1)
    if tolerance_seconds is not None:
        in_tol = (
            F.unix_micros(F.col("__ts").cast("timestamp"))
            - F.unix_micros(F.col("__match_ts").cast("timestamp"))
        ) <= int(tolerance_seconds * 1_000_000)
        carry = {c: F.when(in_tol, F.col(f"__carry_{c}")) for c in value_cols}
    else:
        carry = {c: F.col(f"__carry_{c}") for c in value_cols}
    return out.select(
        *[F.col("__row")[c].alias(c) for c in left.columns],
        *[carry[c].alias(f"asof_{c}") for c in value_cols],
    )
