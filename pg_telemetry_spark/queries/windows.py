"""Window functions — SURVEY.md §2.5.

The defining tsdb operators live here: counter delta/rate via ``lag``
(cumulative Postgres counters only grow, so every dashboard chart is
Δvalue/Δts with a reset guard), running/moving aggregates, time-range
frames, and per-group top-N.

Scale notes: every window below partitions by a series key (user,
type, priority), so the sort happens *within* hash partitions — no
global sort, and the shuffle is the same one a groupBy on that key
would do.  Frames are ROWS or bounded RANGE; nothing materializes an
unbounded-following buffer.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from pg_telemetry_spark.queries.relational import EVENTS_V
from pg_telemetry_spark.registry import query
from pg_telemetry_spark.tables import load_table


@query(
    "win_rank",
    group="windows",
    oracle=f"""
SELECT event_id, event_type, value,
       rank()       OVER (PARTITION BY event_type ORDER BY floor(value / 50) DESC)
         AS value_band_rank,
       dense_rank() OVER (PARTITION BY event_type ORDER BY floor(value / 50) DESC)
         AS value_band_dense,
       row_number() OVER (PARTITION BY event_type ORDER BY value DESC, event_id ASC)
         AS rn
FROM {EVENTS_V} e
WHERE ts < TIMESTAMP '2024-01-05'
""",
)
def win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank/dense_rank over a banded key (real ties) + row_number with
    a deterministic tie-break."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("ts") < F.lit("2024-01-05").cast("timestamp_ntz")
    )
    band = Window.partitionBy("event_type").orderBy(F.floor(F.col("value") / 50).desc())
    exact = Window.partitionBy("event_type").orderBy(F.col("value").desc(), F.col("event_id"))
    return e.select(
        "event_id",
        "event_type",
        "value",
        F.rank().over(band).alias("value_band_rank"),
        F.dense_rank().over(band).alias("value_band_dense"),
        F.row_number().over(exact).alias("rn"),
    )


@query(
    "win_dist",
    group="windows",
    oracle="""
SELECT o_orderkey, o_orderpriority,
       ntile(4) OVER w AS quartile,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist() OVER w, 6) AS cume
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice ASC, o_orderkey ASC)
""",
)
def win_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution functions over order totals per priority."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").asc(), F.col("o_orderkey").asc()
    )
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


@query(
    "win_lag_delta",
    group="windows",
    oracle=f"""
WITH s AS (
  SELECT user_id, event_type, event_id, ts, value,
         lag(value) OVER w AS prev_value,
         lag(ts)    OVER w AS prev_ts
  FROM {EVENTS_V} e
  WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)
)
SELECT user_id, event_type, event_id,
       round(value - prev_value, 6) + 0 AS delta,
       round(greatest(value - prev_value, 0), 6) + 0 AS delta_nonneg,
       round((value - prev_value) / nullif(epoch(ts) - epoch(prev_ts), 0), 6) + 0 AS rate
FROM s
WHERE prev_value IS NOT NULL
""",
)
def win_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Counter delta/rate per series with reset guard — THE tsdb
    operator: cumulative counters reset on restart, so negative deltas
    clamp to 0 and rates divide by the elapsed wall-clock."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    epoch = F.unix_micros(F.col("ts").cast("timestamp")) / F.lit(1_000_000.0)
    s = e.select(
        "user_id",
        "event_type",
        "event_id",
        "value",
        epoch.alias("epoch"),
        F.lag("value").over(w).alias("prev_value"),
        F.lag(epoch).over(w).alias("prev_epoch"),
    ).filter(F.col("prev_value").isNotNull())
    delta = F.col("value") - F.col("prev_value")
    return s.select(
        "user_id",
        "event_type",
        "event_id",
        F.round(delta, 6).alias("delta"),
        F.round(F.greatest(delta, F.lit(0.0)), 6).alias("delta_nonneg"),
        F.round(delta / F.nullif(F.col("epoch") - F.col("prev_epoch"), F.lit(0.0)), 6).alias(
            "rate"
        ),
    )


@query(
    "win_running",
    group="windows",
    oracle=f"""
SELECT user_id, event_id,
       round(sum(value) OVER w, 6) AS running_sum,
       round(avg(value) OVER w, 6) AS running_avg,
       count(*) OVER w AS running_n
FROM {EVENTS_V} e
WHERE ts < TIMESTAMP '2024-01-08'
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
""",
)
def win_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum/avg/count per user (cumulative frame)."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("ts") < F.lit("2024-01-08").cast("timestamp_ntz")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "user_id",
        "event_id",
        F.round(F.sum("value").over(w), 6).alias("running_sum"),
        F.round(F.avg("value").over(w), 6).alias("running_avg"),
        F.count("*").over(w).alias("running_n"),
    )


@query(
    "win_moving_rows",
    group="windows",
    oracle=f"""
SELECT user_id, event_id,
       round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS ma3
FROM {EVENTS_V} e
WHERE ts < TIMESTAMP '2024-01-08'
""",
)
def win_moving_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-row moving average per user."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("ts") < F.lit("2024-01-08").cast("timestamp_ntz")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-2, 0)
    return e.select(
        "user_id", "event_id", F.round(F.avg("value").over(w), 6).alias("ma3")
    )


@query(
    "win_range_time",
    group="windows",
    oracle=f"""
SELECT user_id, event_id,
       round(sum(value) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                              RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW), 6)
         AS sum_1h,
       count(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                      RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS n_1h
FROM {EVENTS_V} e
""",
)
def win_range_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 1-hour time-RANGE frame per user (value-based bounds on
    the microsecond axis, not row counts)."""
    e = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(us)
        .rangeBetween(-3_600_000_000, 0)
    )
    return e.select(
        "user_id",
        "event_id",
        F.round(F.sum("value").over(w), 6).alias("sum_1h"),
        F.count("*").over(w).alias("n_1h"),
    )


@query(
    "win_first_last",
    group="windows",
    oracle=f"""
SELECT user_id, event_id, event_type,
       first_value(value) OVER w AS first_in_day,
       round(last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
               OVER w, 6) AS last_purchase_value
FROM {EVENTS_V} e
WHERE ts < TIMESTAMP '2024-01-04'
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
""",
)
def win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value + last_value(IGNORE NULLS) — the carry-forward
    idiom that gap-fill builds on."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("ts") < F.lit("2024-01-04").cast("timestamp_ntz")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    purchase_val = F.when(F.col("event_type") == "purchase", F.col("value"))
    return e.select(
        "user_id",
        "event_id",
        "event_type",
        F.first("value").over(w).alias("first_in_day"),
        F.round(F.last(purchase_val, ignorenulls=True).over(w), 6).alias(
            "last_purchase_value"
        ),
    )


@query(
    "win_topn_group",
    group="windows",
    oracle=f"""
SELECT event_type, event_id, value
FROM {EVENTS_V} e
QUALIFY row_number() OVER (PARTITION BY event_type ORDER BY value DESC, event_id ASC) <= 3
""",
)
def win_topn_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 events by value per type (QUALIFY shape: window + filter)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(F.col("value").desc(), F.col("event_id"))
    return (
        e.select("event_type", "event_id", "value", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
        .drop("rn")
    )


@query(
    "win_ignorenulls",
    group="windows",
    oracle=f"""
SELECT user_id, event_id,
       round(CASE WHEN value >= 10 THEN value END, 6) AS masked,
       round(lag(CASE WHEN value >= 10 THEN value END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id), 6) AS prev_valid,
       round(lead(CASE WHEN value >= 10 THEN value END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id), 6) AS next_valid
FROM {EVENTS_V} e
""",
)
def win_ignorenulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-aware lag/lead: the previous/next NON-NULL observation per
    series (sensor dropouts modeled as value<10 -> NULL).  Spark has
    no lag(IGNORE NULLS); last(ignorenulls) over a preceding frame and
    first(ignorenulls) over a following frame are the exact
    equivalents — the oracle pins that equivalence against DuckDB's
    native IGNORE NULLS lag/lead."""
    e = load_table(spark, sf_dir, "events")
    masked = F.when(F.col("value") >= 10, F.col("value"))
    base = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = base.rowsBetween(Window.unboundedPreceding, -1)
    nxt = base.rowsBetween(1, Window.unboundedFollowing)
    return e.select(
        "user_id",
        "event_id",
        F.round(masked, 6).alias("masked"),
        F.round(F.last(masked, ignorenulls=True).over(prev), 6).alias("prev_valid"),
        F.round(F.first(masked, ignorenulls=True).over(nxt), 6).alias("next_valid"),
    )
