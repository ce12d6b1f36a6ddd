"""Flagship query — the tsdb heart in one pipeline (SURVEY.md §7 M0).

events -> time-slice filter -> hourly bucket -> per (bucket, type)
count / sum / exact p95 -> top-20 by count with deterministic
tie-break.  Touches the nanos-timestamp fix, filter pushdown, bucket
aggregation, exact percentile, and TakeOrderedAndProject in a single
plan — the shape every telemetry dashboard query takes.

Scale notes: the filter and column pruning push to the Parquet scan;
the groupBy is a two-phase hash aggregate on (bucket, type) — low
cardinality (~3.6k groups/month) so the shuffle is tiny regardless of
input size; the top-20 is TakeOrderedAndProject (no global sort).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from pg_telemetry_spark.registry import query


@query(
    "flagship_hourly_top20",
    group="flagship",
    oracle="""
SELECT
  date_trunc('hour', CAST(ts AS TIMESTAMP)) AS bucket,
  event_type,
  count(*) AS n_events,
  round(sum(value), 6) AS sum_value,
  round(quantile_cont(value, 0.95), 6) AS p95_value
FROM events
WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-01'
  AND CAST(ts AS TIMESTAMP) <  TIMESTAMP '2024-02-01'
GROUP BY 1, 2
ORDER BY n_events DESC, bucket ASC, event_type ASC
LIMIT 20
""",
)
def flagship_hourly_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly event-type rollup with exact p95, top-20 busiest buckets."""
    from pg_telemetry_spark.tables import load_events_sliced

    events = load_events_sliced(spark, sf_dir, "2024-01-01", "2024-02-01")
    return (
        events
        .groupBy(
            F.date_trunc("hour", F.col("ts")).cast("timestamp_ntz").alias("bucket"),
            F.col("event_type"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
            F.round(F.percentile("value", F.lit(0.95)), 6).alias("p95_value"),
        )
        .orderBy(F.col("n_events").desc(), F.col("bucket").asc(), F.col("event_type").asc())
        .limit(20)
    )
