"""Null-semantics operators.

The fixtures contain no NULLs, so every null code path would
otherwise go untested.  These queries MANUFACTURE nulls
deterministically (nullif on value bands) and then exercise the
null-sensitive surface: count(*) vs count(col), null-skipping
aggregates, coalesce chains, null-safe equality, and null ordering.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from pg_telemetry_spark.queries.relational import EVENTS_V
from pg_telemetry_spark.registry import query
from pg_telemetry_spark.tables import load_table

#: value > 250 -> NULL (deterministic null injection, both engines)
_NULLED = "CASE WHEN value > 250 THEN NULL ELSE value END"


@query(
    "null_agg_semantics",
    group="nulls",
    oracle=f"""
WITH n AS (SELECT event_type, {_NULLED} AS v FROM {EVENTS_V} e)
SELECT event_type,
       count(*) AS n_rows,
       count(v) AS n_nonnull,
       round(coalesce(sum(v), 0.0), 6) AS sum_skipnull,
       round(avg(v), 6) AS avg_skipnull,
       count(*) - count(v) AS n_nulls,
       round(coalesce(min(v), -1.0), 6) AS min_or_default
FROM n GROUP BY event_type
""",
)
def null_agg_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count(*) counts rows, count(col)/sum/avg/min skip nulls."""
    e = load_table(spark, sf_dir, "events")
    v = F.when(F.col("value") > 250, F.lit(None)).otherwise(F.col("value"))
    return e.select("event_type", v.alias("v")).groupBy("event_type").agg(
        F.count("*").alias("n_rows"),
        F.count("v").alias("n_nonnull"),
        F.round(F.coalesce(F.sum("v"), F.lit(0.0)), 6).alias("sum_skipnull"),
        F.round(F.avg("v"), 6).alias("avg_skipnull"),
        (F.count("*") - F.count("v")).alias("n_nulls"),
        F.round(F.coalesce(F.min("v"), F.lit(-1.0)), 6).alias("min_or_default"),
    )


@query(
    "null_safe_eq_join",
    group="nulls",
    oracle=f"""
WITH a AS (SELECT event_id, user_id,
                  CASE WHEN value > 250 THEN NULL
                       ELSE CAST(floor(value / 50) AS BIGINT) END AS band
           FROM {EVENTS_V} e WHERE event_type = 'click' AND ts < TIMESTAMP '2024-01-03'),
     b AS (SELECT event_id, user_id,
                  CASE WHEN value > 250 THEN NULL
                       ELSE CAST(floor(value / 50) AS BIGINT) END AS band
           FROM {EVENTS_V} e WHERE event_type = 'view' AND ts < TIMESTAMP '2024-01-03')
SELECT a.event_id AS id1, b.event_id AS id2, a.band
FROM a JOIN b
  ON a.user_id = b.user_id AND a.band IS NOT DISTINCT FROM b.band
""",
)
def null_safe_eq_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL
    matches NULL — plain equality would silently drop those pairs."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("ts") < F.lit("2024-01-03").cast("timestamp_ntz")
    )
    band = F.when(F.col("value") > 250, F.lit(None)).otherwise(
        F.floor(F.col("value") / 50).cast("long")
    )
    a = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("id1"), "user_id", band.alias("band")
    )
    b = e.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("id2"),
        F.col("user_id").alias("user_id_b"),
        band.alias("band_b"),
    )
    return a.join(
        b, (a.user_id == b.user_id_b) & a.band.eqNullSafe(b.band_b)
    ).select("id1", "id2", "band")


@query(
    "null_ordering",
    group="nulls",
    oracle=f"""
WITH n AS (SELECT event_id, {_NULLED} AS v FROM {EVENTS_V} e
           WHERE ts < TIMESTAMP '2024-01-02')
SELECT event_id, round(v, 6) AS v,
       row_number() OVER (ORDER BY v DESC NULLS LAST, event_id ASC) AS rn_nulls_last,
       row_number() OVER (ORDER BY v ASC NULLS FIRST, event_id ASC) AS rn_nulls_first
FROM n
""",
)
def null_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit NULLS FIRST/LAST ordering materialized as rank values
    (engines default differently — always spell it out)."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events").filter(
        F.col("ts") < F.lit("2024-01-02").cast("timestamp_ntz")
    )
    v = F.when(F.col("value") > 250, F.lit(None)).otherwise(F.col("value"))
    n = e.select("event_id", v.alias("v"))
    w_last = Window.orderBy(F.col("v").desc_nulls_last(), F.col("event_id").asc())
    w_first = Window.orderBy(F.col("v").asc_nulls_first(), F.col("event_id").asc())
    return n.select(
        "event_id",
        F.round("v", 6).alias("v"),
        F.row_number().over(w_last).alias("rn_nulls_last"),
        F.row_number().over(w_first).alias("rn_nulls_first"),
    )
