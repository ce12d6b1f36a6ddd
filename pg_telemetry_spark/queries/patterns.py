"""Event-pattern matching, seasonal baselining, and deterministic
sampling.

`wl_pattern_regex` is the poor-engine's MATCH_RECOGNIZE: sessions
reduce to ordered type-initial paths ('v>c>p') and row-pattern
queries become regexes over the path string — a full-fidelity
translation for per-session patterns, because the sessionize+listagg
step preserves exact event order.  `agg_sample_bottomk` is the
k-minimum-values trick: hashing rows and keeping the k smallest
priorities IS a uniform sample, but — unlike rand()-based sampling —
it is deterministic, engine-portable, mergeable across partitions,
and stable under re-runs (the property distributed pipelines actually
need for reproducible eval sets)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from pg_telemetry_spark.queries.relational import EVENTS_V
from pg_telemetry_spark.registry import query
from pg_telemetry_spark.tables import load_table

#: shared sessionized-path SQL (mirrors wl_session_paths semantics:
#: 30-min gap sessionization, initials joined with '>')
_PATHS_SQL = f"""
WITH ordered AS (
  SELECT user_id, event_id, ts, substring(event_type, 1, 1) AS init,
         CASE WHEN epoch(ts) - lag(epoch(ts)) OVER
                (PARTITION BY user_id ORDER BY ts, event_id) <= 1800
              THEN 0 ELSE 1 END AS is_new
  FROM {EVENTS_V} e WHERE user_id < 300
), sessions AS (
  SELECT user_id, event_id, ts, init,
         sum(is_new) OVER (PARTITION BY user_id
                           ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS session_id
  FROM ordered
)
SELECT user_id, session_id,
       string_agg(init, '>' ORDER BY ts, event_id) AS path
FROM sessions GROUP BY user_id, session_id
"""


@query(
    "wl_pattern_regex",
    group="workload",
    oracle=f"""
WITH paths AS ({_PATHS_SQL})
SELECT CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(sum(CASE WHEN regexp_matches(path, 'v>c>p') THEN 1 ELSE 0 END)
            AS BIGINT) AS n_direct_funnel,
       CAST(sum(CASE WHEN regexp_matches(path, '(^|>)v(>.*)?>p') THEN 1 ELSE 0 END)
            AS BIGINT) AS n_eventual_convert,
       CAST(sum(CASE WHEN regexp_matches(path, '^[a-z]$') THEN 1 ELSE 0 END)
            AS BIGINT) AS n_bounce
FROM paths
""",
)
def wl_pattern_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-pattern matching over sessions (MATCH_RECOGNIZE-style):
    sessionize, reduce each session to its ordered type-initial path,
    then evaluate patterns as regexes — direct funnel (view
    immediately before click before purchase), eventual conversion
    (view then any path to purchase), and bounces (single-event
    sessions).  The expensive part is the sessionize shuffle the
    engine already does for any per-session metric; every pattern
    after that is a narrow map over one short string per session, so
    adding patterns is free at 100 TB (regexes kept to portable
    alternation/wildcard constructs shared by RE2 and Java)."""
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 300)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ep = F.unix_micros(F.col("ts").cast("timestamp")) / F.lit(1_000_000.0)
    tagged = e.select(
        "user_id",
        "event_id",
        "ts",
        F.substring("event_type", 1, 1).alias("init"),
        ep.alias("ep"),
    ).withColumn(
        "is_new",
        F.when((F.col("ep") - F.lag("ep").over(w)) <= 1800, F.lit(0)).otherwise(F.lit(1)),
    )
    sid = tagged.withColumn(
        "session_id",
        F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    paths = (
        sid.groupBy("user_id", "session_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("ts", "event_id", "init"))
                    ),
                    lambda s: s["init"],
                ),
                ">",
            ).alias("path")
        )
    )
    return paths.agg(
        F.count("*").alias("n_sessions"),
        F.sum(F.col("path").rlike("v>c>p").cast("bigint")).alias("n_direct_funnel"),
        F.sum(F.col("path").rlike("(^|>)v(>.*)?>p").cast("bigint")).alias(
            "n_eventual_convert"
        ),
        F.sum(F.col("path").rlike("^[a-z]$").cast("bigint")).alias("n_bounce"),
    )


@query(
    "ts_seasonal_baseline",
    group="timeseries",
    oracle=f"""
WITH hourly AS (
  SELECT event_type, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket,
         avg(value) AS hourly_avg
  FROM {EVENTS_V} e GROUP BY event_type, date_trunc('hour', ts)
), baseline AS (
  SELECT event_type, hour(bucket) AS hod, avg(hourly_avg) AS baseline_avg,
         count(*) AS n_days
  FROM hourly GROUP BY event_type, hour(bucket)
), scored AS (
  SELECT h.event_type, h.bucket,
         abs(h.hourly_avg / b.baseline_avg - 1) AS dev
  FROM hourly h
  JOIN baseline b ON h.event_type = b.event_type AND hour(h.bucket) = b.hod
)
SELECT event_type,
       round(max(dev), 6) AS max_deviation,
       CAST(sum(CASE WHEN dev > 0.5 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_anomalous_hours,
       CAST(count(*) AS BIGINT) AS n_hours
FROM scored
GROUP BY event_type
ORDER BY event_type
""",
)
def ts_seasonal_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal (hour-of-day) baseline + deviation scoring — the
    telemetry anomaly primitive that z-scores can't express: each
    hour compares against the SAME hour across days, so a nightly
    batch job's load spike isn't an anomaly at 3am but is at 3pm.
    Three aggregations, each smaller than the last (raw → hourly →
    24-row baseline per series); the baseline broadcast-joins back
    onto the hourly frame.  At 100 TB the raw→hourly rollup is the
    only full-data pass, and it's the same rollup the dashboards
    already materialize."""
    e = load_table(spark, sf_dir, "events")
    hourly = (
        e.groupBy(
            "event_type",
            F.date_trunc("hour", "ts").cast("timestamp_ntz").alias("bucket"),
        )
        .agg(F.avg("value").alias("hourly_avg"))
    )
    baseline = hourly.groupBy(
        F.col("event_type").alias("b_event_type"), F.hour("bucket").alias("hod")
    ).agg(F.avg("hourly_avg").alias("baseline_avg"))
    scored = hourly.join(
        F.broadcast(baseline),
        (hourly.event_type == F.col("b_event_type"))
        & (F.hour(hourly.bucket) == F.col("hod")),
    ).select(
        "event_type",
        F.abs(F.col("hourly_avg") / F.col("baseline_avg") - 1).alias("dev"),
    )
    return (
        scored.groupBy("event_type")
        .agg(
            F.round(F.max("dev"), 6).alias("max_deviation"),
            F.sum((F.col("dev") > 0.5).cast("bigint")).alias("n_anomalous_hours"),
            F.count("*").alias("n_hours"),
        )
        .orderBy("event_type")
    )


@query(
    "agg_sample_bottomk",
    group="aggs",
    oracle=f"""
SELECT event_id, user_id, event_type
FROM {EVENTS_V} e
ORDER BY md5(CAST(event_id AS VARCHAR)), event_id
LIMIT 100
""",
)
def agg_sample_bottomk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic uniform sampling via bottom-k priorities
    (k-minimum-values): priority = md5(row key), keep the 100
    smallest.  Statistically a uniform 100-row sample (the hash is
    uniform on keys), but unlike rand()/TABLESAMPLE it is
    reproducible across engines, runs, and cluster sizes, and
    mergeable: bottom-k of a union = bottom-k of each side's
    bottom-k, which is exactly how TakeOrdered executes it
    distributed — each partition contributes its local bottom-100,
    the driver merges ~partitions×100 candidates, the full table is
    never sorted."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.select(
            "event_id",
            "user_id",
            "event_type",
            F.md5(F.col("event_id").cast("string")).alias("__prio"),
        )
        .orderBy("__prio", "event_id")
        .limit(100)
        .drop("__prio")
    )
