"""Batch time-series operators — SURVEY.md §2.9 (batch-checkable half).

The ClickHouse-side query surface of a telemetry warehouse:
``toStartOfInterval``-style tumbling buckets, sliding windows,
session windows (gaps-and-islands), dense-axis gap-fill with
forward-fill, and rollup re-aggregation (the materialized-view
downsampling analog).  The same logic later runs inside Structured
Streaming; batch formulations here are the oracle-checkable ground
truth the streaming tests compare against.

Scale notes: tumble/downsample are plain two-phase hash aggregates on
(bucket, series) — low cardinality, tiny shuffles.  Slide expands each
row to window_count = size/slide buckets *before* the partial agg, so
the shuffle still carries only (bucket, series) rows.  Session windows
sort within user partitions (the same shuffle a groupBy(user) needs).
Gap-fill generates the dense axis with ``sequence`` (distributed, no
driver loop) and forward-fills with last(ignorenulls) over a
partition-local frame.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from pg_telemetry_spark.queries.relational import EVENTS_V
from pg_telemetry_spark.registry import query
from pg_telemetry_spark.tables import load_table

SESSION_GAP_SECONDS = 1800


@query(
    "ts_tumble",
    group="timeseries",
    oracle=f"""
SELECT time_bucket(INTERVAL '1 hour', ts) AS bucket, event_type,
       count(*) AS n_events,
       round(sum(value), 6) AS sum_value,
       round(quantile_cont(value, 0.95), 6) AS p95_value
FROM {EVENTS_V} e
GROUP BY 1, 2
""",
)
def ts_tumble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window aggregation (toStartOfInterval analog)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.window("ts", "1 hour").start.cast("timestamp_ntz").alias("bucket"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
            F.round(F.percentile("value", F.lit(0.95)), 6).alias("p95_value"),
        )
    )


@query(
    "ts_slide",
    group="timeseries",
    oracle=f"""
SELECT time_bucket(INTERVAL '15 minutes', ts) - k.k * INTERVAL '15 minutes' AS win_start,
       count(*) AS n_events,
       round(sum(value), 6) AS sum_value
FROM {EVENTS_V} e
CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS k) k
GROUP BY 1
""",
)
def ts_slide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window 1 h every 15 min — each event lands in exactly 4
    overlapping windows (oracle mirrors the expansion explicitly)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "15 minutes").start.cast("timestamp_ntz").alias("win_start"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
    )


def sessionize(events: DataFrame, gap_seconds: int = SESSION_GAP_SECONDS) -> DataFrame:
    """Gaps-and-islands sessionization (batch ground truth).

    A new session starts when the gap since the previous event of the
    same user is STRICTLY greater than ``gap_seconds`` (matches
    Structured Streaming ``session_window`` semantics, which merges
    events within the gap).  Returns one row per (user_id, session_id)
    with start/end/duration/count.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    epoch = F.unix_micros(F.col("ts").cast("timestamp")) / F.lit(1_000_000.0)
    tagged = events.select("user_id", "event_id", "ts", "value", epoch.alias("epoch")).withColumn(
        "is_new",
        F.when(
            (F.col("epoch") - F.lag("epoch").over(w)) <= gap_seconds, F.lit(0)
        ).otherwise(F.lit(1)),
    )
    with_sid = tagged.withColumn(
        "session_id",
        F.sum("is_new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return with_sid.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").alias("n_events"),
        F.round(F.max("epoch") - F.min("epoch"), 6).alias("duration_seconds"),
        F.round(F.sum("value"), 6).alias("sum_value"),
    )


@query(
    "ts_session",
    group="timeseries",
    oracle=f"""
WITH tagged AS (
  SELECT user_id, event_id, ts, value, epoch(ts) AS ep,
         CASE WHEN epoch(ts) - lag(epoch(ts))
                OVER (PARTITION BY user_id ORDER BY ts, event_id) <= {SESSION_GAP_SECONDS}
              THEN 0 ELSE 1 END AS is_new
  FROM {EVENTS_V} e
), sid AS (
  SELECT *, CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS session_id
  FROM tagged
)
SELECT user_id, session_id,
       min(ts) AS session_start,
       max(ts) AS session_end,
       count(*) AS n_events,
       round(max(ep) - min(ep), 6) AS duration_seconds,
       round(sum(value), 6) AS sum_value
FROM sid
GROUP BY user_id, session_id
""",
)
def ts_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-min inactivity gap) via gaps-and-islands."""
    return sessionize(load_table(spark, sf_dir, "events"))


@query(
    "ts_gapfill",
    group="timeseries",
    oracle=f"""
WITH axis AS (
  SELECT t.bucket, ty.event_type
  FROM generate_series(TIMESTAMP '2024-01-01', TIMESTAMP '2024-01-30 23:00:00',
                       INTERVAL '1 hour') AS t(bucket)
  CROSS JOIN (SELECT DISTINCT event_type FROM events) ty
), actual AS (
  SELECT time_bucket(INTERVAL '1 hour', ts) AS bucket, event_type,
         round(sum(value), 6) AS sum_value
  FROM {EVENTS_V} e
  GROUP BY 1, 2
)
SELECT a.bucket, a.event_type,
       coalesce(x.sum_value IS NOT NULL, FALSE) AS has_data,
       round(last_value(x.sum_value IGNORE NULLS)
               OVER (PARTITION BY a.event_type ORDER BY a.bucket
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS filled_value
FROM axis a LEFT JOIN actual x
  ON a.bucket = x.bucket AND a.event_type = x.event_type
""",
)
def ts_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense hourly axis per event_type with forward-fill.

    ``sequence`` generates the axis distributed-side; the left join
    attaches actuals; last(ignorenulls) carries the previous
    observation across empty buckets."""
    e = load_table(spark, sf_dir, "events")
    axis = (
        e.sparkSession.range(1)
        .select(
            F.explode(
                F.sequence(
                    F.lit("2024-01-01 00:00:00").cast("timestamp_ntz"),
                    F.lit("2024-01-30 23:00:00").cast("timestamp_ntz"),
                    F.expr("INTERVAL 1 HOUR"),
                )
            ).alias("bucket")
        )
        .crossJoin(e.select("event_type").distinct())
    )
    actual = (
        e.groupBy(
            F.window("ts", "1 hour").start.cast("timestamp_ntz").alias("bucket"),
            "event_type",
        )
        .agg(F.round(F.sum("value"), 6).alias("sum_value"))
    )
    filled = axis.join(actual, ["bucket", "event_type"], "left")
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return filled.select(
        "bucket",
        "event_type",
        F.col("sum_value").isNotNull().alias("has_data"),
        F.round(F.last("sum_value", ignorenulls=True).over(w), 6).alias("filled_value"),
    )


@query(
    "ts_downsample",
    group="timeseries",
    oracle=f"""
SELECT time_bucket(INTERVAL '1 hour', ts) AS bucket, event_type,
       count(*) AS n_events,
       round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6) AS sum_value,
       round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6)
           AS avg_value
FROM {EVENTS_V} e
GROUP BY 1, 2
""",
)
def ts_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage rollup: raw -> 1-min pre-agg -> 1-h re-agg.

    Verifies re-aggregability (sum/count compose exactly; avg is
    derived as sum/count at the final stage) — the materialized-view
    rollup pattern that lets a 100 TB warehouse serve month-wide
    charts from pre-aggregated minutes instead of raw events.  The
    value sums carry EXACT DECIMALS through both stages
    (queries/detsum.py): decimal addition is associative, so the
    two-stage rollup equals the single-stage oracle bit-for-bit at
    any scale and partitioning — double sums only composed until the
    60k-row gate and broke one decade up."""
    e = load_table(spark, sf_dir, "events")
    minute = (
        e.groupBy(
            F.window("ts", "1 minute").start.cast("timestamp_ntz").alias("mbucket"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("s"),
        )
    )
    return (
        minute.groupBy(
            F.date_trunc("hour", F.col("mbucket")).cast("timestamp_ntz").alias("bucket"),
            "event_type",
        )
        .agg(
            F.sum("n").alias("n_events"),
            F.round(F.sum("s").cast("double"), 6).alias("sum_value"),
            F.round(F.sum("s").cast("double") / F.sum("n"), 6).alias("avg_value"),
        )
    )


@query(
    "ts_time_weighted_avg",
    group="timeseries",
    oracle=f"""
WITH seg AS (
  SELECT user_id, event_type, value,
         epoch(lead(ts) OVER (PARTITION BY user_id, event_type
                              ORDER BY ts, event_id)) - epoch(ts) AS dt
  FROM {EVENTS_V} e
)
SELECT user_id, event_type,
       round(sum(value * dt) / sum(dt), 6) AS tw_avg,
       round(sum(dt), 6) AS observed_seconds,
       count(*) AS n_segments
FROM seg WHERE dt IS NOT NULL
GROUP BY user_id, event_type
HAVING round(sum(dt), 6) > 0
""",
)
def ts_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average per series — the tsdb operator plain avg
    gets wrong under irregular sampling: each observation is weighted
    by how long it held (LOCF convention, weight = seconds until the
    next sample).  One window shuffle on the series key, then a hash
    agg; the last sample of each series has no holding interval and
    drops out, matching the closed-open integral."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    epoch = F.unix_micros(F.col("ts").cast("timestamp")) / F.lit(1_000_000.0)
    seg = e.select(
        "user_id",
        "event_type",
        "value",
        (F.lead(epoch).over(w) - epoch).alias("dt"),
    ).filter(F.col("dt").isNotNull())
    return (
        seg.groupBy("user_id", "event_type")
        .agg(
            F.round(F.sum(F.col("value") * F.col("dt")) / F.sum("dt"), 6).alias("tw_avg"),
            F.round(F.sum("dt"), 6).alias("observed_seconds"),
            F.count("*").alias("n_segments"),
        )
        .filter(F.col("observed_seconds") > 0)
    )


@query(
    "ts_gapfill_interp",
    group="timeseries",
    oracle=f"""
WITH axis AS (
  SELECT t.bucket, ty.event_type
  FROM generate_series(TIMESTAMP '2024-01-01', TIMESTAMP '2024-01-30 23:00:00',
                       INTERVAL '1 hour') AS t(bucket)
  CROSS JOIN (SELECT DISTINCT event_type FROM events) ty
), actual AS (
  SELECT time_bucket(INTERVAL '1 hour', ts) AS bucket, event_type,
         round(sum(value), 6) AS sum_value
  FROM {EVENTS_V} e
  GROUP BY 1, 2
), joined AS (
  SELECT a.bucket, a.event_type, x.sum_value,
         epoch(a.bucket) AS ep,
         last_value(x.sum_value IGNORE NULLS)
           OVER (PARTITION BY a.event_type ORDER BY a.bucket
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_v,
         last_value(CASE WHEN x.sum_value IS NOT NULL THEN epoch(a.bucket) END IGNORE NULLS)
           OVER (PARTITION BY a.event_type ORDER BY a.bucket
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_ep,
         first_value(x.sum_value IGNORE NULLS)
           OVER (PARTITION BY a.event_type ORDER BY a.bucket
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_v,
         first_value(CASE WHEN x.sum_value IS NOT NULL THEN epoch(a.bucket) END IGNORE NULLS)
           OVER (PARTITION BY a.event_type ORDER BY a.bucket
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_ep
  FROM axis a LEFT JOIN actual x
    ON a.bucket = x.bucket AND a.event_type = x.event_type
)
SELECT bucket, event_type,
       CAST(sum_value IS NOT NULL AS INTEGER) AS has_data,
       round(CASE
         WHEN sum_value IS NOT NULL THEN sum_value
         WHEN prev_v IS NULL OR next_v IS NULL THEN NULL
         ELSE prev_v + (next_v - prev_v) * (ep - prev_ep) / (next_ep - prev_ep)
       END, 6) + 0 AS interp_value
FROM joined
""",
)
def ts_gapfill_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-interpolation gap-fill: empty buckets take the value on
    the straight line between the nearest observed buckets either
    side (edges stay NULL — nothing to anchor to).  Same dense-axis
    left join as ts_gapfill plus one backward- and one forward-
    looking ignore-nulls window over the series — still a single
    shuffle on the series key."""
    e = load_table(spark, sf_dir, "events")
    axis = (
        e.sparkSession.range(1)
        .select(
            F.explode(
                F.sequence(
                    F.lit("2024-01-01 00:00:00").cast("timestamp_ntz"),
                    F.lit("2024-01-30 23:00:00").cast("timestamp_ntz"),
                    F.expr("INTERVAL 1 HOUR"),
                )
            ).alias("bucket")
        )
        .crossJoin(e.select("event_type").distinct())
    )
    actual = e.groupBy(
        F.window("ts", "1 hour").start.cast("timestamp_ntz").alias("bucket"),
        "event_type",
    ).agg(F.round(F.sum("value"), 6).alias("sum_value"))
    j = axis.join(actual, ["bucket", "event_type"], "left")
    ep = F.unix_micros(F.col("bucket").cast("timestamp")) / F.lit(1_000_000.0)
    ep_obs = F.when(F.col("sum_value").isNotNull(), ep)
    back = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    j = j.select(
        "bucket",
        "event_type",
        "sum_value",
        ep.alias("ep"),
        F.last("sum_value", ignorenulls=True).over(back).alias("prev_v"),
        F.last(ep_obs, ignorenulls=True).over(back).alias("prev_ep"),
        F.first("sum_value", ignorenulls=True).over(fwd).alias("next_v"),
        F.first(ep_obs, ignorenulls=True).over(fwd).alias("next_ep"),
    )
    interp = (
        F.when(F.col("sum_value").isNotNull(), F.col("sum_value"))
        .when(F.col("prev_v").isNull() | F.col("next_v").isNull(), F.lit(None))
        .otherwise(
            F.col("prev_v")
            + (F.col("next_v") - F.col("prev_v"))
            * (F.col("ep") - F.col("prev_ep"))
            / (F.col("next_ep") - F.col("prev_ep"))
        )
    )
    return j.select(
        "bucket",
        "event_type",
        F.col("sum_value").isNotNull().cast("int").alias("has_data"),
        (F.round(interp, 6) + 0.0).alias("interp_value"),
    )
