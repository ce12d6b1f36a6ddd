"""Per-relation stat-view analytics (§0.1's last undeclared views).

Rounds 10 proved the typed stat-view recipe on six server-level views
(pg_telemetry_spark/statviews.py + queries/collector_views.py); this
module closes the per-RELATION half — the first views a Postgres
operator charts after the database-level ones:

- pg_stat_user_tables -> table bloat board (dead-tuple ratio +
  autovacuum effectiveness) and the seq-vs-idx scan mix;
- pg_stat_user_indexes -> the unused-index report;
- pg_total_relation_size samples -> relation growth rate.

All tier A: each derivation is written twice (DataFrame in
statviews.py, ANSI SQL mirror) so every rollup hash-matches DuckDB at
sf0.01/0.1/1.  Scale: snapshots are tick-granular (rows = relations x
ticks, NOT raw events — the collector maintains the snapshot table),
and every op is one per-relname window plus one groupBy riding the
same relname hash partitioning; no collects, no cross-series state
beyond lag(1).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from pg_telemetry_spark.queries.relational import EVENTS_V
from pg_telemetry_spark.registry import query
from pg_telemetry_spark.statviews import (
    RELATION_SIZE_SQL,
    USER_INDEXES_SQL,
    USER_TABLES_SQL,
    derive_relation_size,
    derive_user_indexes,
    derive_user_tables,
)
from pg_telemetry_spark.tables import load_table

_UT = USER_TABLES_SQL.format(ev=EVENTS_V)
_UI = USER_INDEXES_SQL.format(ev=EVENTS_V)
_RS = RELATION_SIZE_SQL.format(ev=EVENTS_V)


@query(
    "pgw_table_bloat",
    group="collector",
    oracle=f"""
WITH snaps AS ({_UT}),
deltas AS (
  SELECT CAST(snap_ts AS DATE) AS day, relname, snap_ts,
         n_live_tup, n_dead_tup,
         n_tup_upd - lag(n_tup_upd) OVER w AS d_upd,
         n_tup_del - lag(n_tup_del) OVER w AS d_del,
         autovacuum_count - lag(autovacuum_count) OVER w AS d_vac
  FROM snaps
  WINDOW w AS (PARTITION BY relname ORDER BY snap_ts)
)
SELECT day, relname,
       CAST(max_by(n_live_tup, snap_ts) AS BIGINT) AS live_tup,
       CAST(max_by(n_dead_tup, snap_ts) AS BIGINT) AS dead_tup,
       round(CAST(max_by(n_dead_tup, snap_ts) AS DOUBLE)
             / (max_by(n_live_tup, snap_ts)
                + max_by(n_dead_tup, snap_ts)), 6) AS dead_ratio,
       CAST(sum(d_upd) AS BIGINT) AS upd_inc,
       CAST(sum(d_del) AS BIGINT) AS del_inc,
       CAST(sum(d_vac) AS BIGINT) AS autovac_runs
FROM deltas WHERE d_upd IS NOT NULL
GROUP BY day, relname
ORDER BY day, relname
""",
)
def pgw_table_bloat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table bloat board from pg_stat_user_tables: per (day, table)
    the END-OF-DAY live/dead tuple gauges (argmax by snap_ts — ticks
    are unique per table so max_by is deterministic), the dead-tuple
    ratio dead/(live+dead), and the day's increase() of the
    update/delete/autovacuum counters (§0.1 increase idiom; the
    counters are monotone by construction, so no reset branch is
    needed here).  The derivation's every-6th-tick autovacuum zeroes
    the dead gauge, so dead_ratio exhibits the sawtooth a DBA
    actually charts, and autovac_runs > 0 on most (day, table) rows.
    One per-relname lag window + one (day, relname) groupBy; at
    100 TB only the tick-granular snapshot table enters this plan."""
    snaps = derive_user_tables(load_table(spark, sf_dir, "events"))
    w = Window.partitionBy("relname").orderBy("snap_ts")
    deltas = snaps.select(
        F.col("snap_ts").cast("date").alias("day"),
        "relname",
        "snap_ts",
        "n_live_tup",
        "n_dead_tup",
        (F.col("n_tup_upd") - F.lag("n_tup_upd").over(w)).alias("d_upd"),
        (F.col("n_tup_del") - F.lag("n_tup_del").over(w)).alias("d_del"),
        (
            F.col("autovacuum_count") - F.lag("autovacuum_count").over(w)
        ).alias("d_vac"),
    ).filter(F.col("d_upd").isNotNull())
    return (
        deltas.groupBy("day", "relname")
        .agg(
            F.max_by("n_live_tup", "snap_ts").alias("live_tup"),
            F.max_by("n_dead_tup", "snap_ts").alias("dead_tup"),
            F.round(
                F.max_by("n_dead_tup", "snap_ts").cast("double")
                / (
                    F.max_by("n_live_tup", "snap_ts")
                    + F.max_by("n_dead_tup", "snap_ts")
                ),
                6,
            ).alias("dead_ratio"),
            F.sum("d_upd").cast("bigint").alias("upd_inc"),
            F.sum("d_del").cast("bigint").alias("del_inc"),
            F.sum("d_vac").cast("bigint").alias("autovac_runs"),
        )
        .select(
            "day",
            "relname",
            "live_tup",
            "dead_tup",
            "dead_ratio",
            "upd_inc",
            "del_inc",
            "autovac_runs",
        )
        .orderBy("day", "relname")
    )


@query(
    "pgw_seq_idx_mix",
    group="collector",
    oracle=f"""
WITH snaps AS ({_UT}),
deltas AS (
  SELECT CAST(snap_ts AS DATE) AS day, relname,
         seq_scan - lag(seq_scan) OVER w AS d_seq,
         idx_scan - lag(idx_scan) OVER w AS d_idx
  FROM snaps
  WINDOW w AS (PARTITION BY relname ORDER BY snap_ts)
)
SELECT day, relname,
       CAST(sum(d_seq) AS BIGINT) AS seq_inc,
       CAST(sum(d_idx) AS BIGINT) AS idx_inc,
       round(CAST(sum(d_seq) AS DOUBLE)
             / (sum(d_seq) + sum(d_idx)), 6) AS seq_share
FROM deltas
WHERE d_seq IS NOT NULL
GROUP BY day, relname
HAVING sum(d_seq) + sum(d_idx) > 0
ORDER BY day, relname
""",
)
def pgw_seq_idx_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential-vs-index scan mix from pg_stat_user_tables: per
    (day, table) the increase() of both scan counters and the
    seq-scan share — the chart that catches a dropped index or a
    planner regression (seq_share jumping on one table).  Days with
    zero scan activity are filtered on the SUMMED increase (not per
    tick) so the division is never 0/0.  Same single-window +
    single-groupBy shape as pgw_table_bloat."""
    snaps = derive_user_tables(load_table(spark, sf_dir, "events"))
    w = Window.partitionBy("relname").orderBy("snap_ts")
    deltas = snaps.select(
        F.col("snap_ts").cast("date").alias("day"),
        "relname",
        (F.col("seq_scan") - F.lag("seq_scan").over(w)).alias("d_seq"),
        (F.col("idx_scan") - F.lag("idx_scan").over(w)).alias("d_idx"),
    ).filter(F.col("d_seq").isNotNull())
    return (
        deltas.groupBy("day", "relname")
        .agg(
            F.sum("d_seq").cast("bigint").alias("seq_inc"),
            F.sum("d_idx").cast("bigint").alias("idx_inc"),
            F.round(
                F.sum("d_seq").cast("double")
                / (F.sum("d_seq") + F.sum("d_idx")),
                6,
            ).alias("seq_share"),
        )
        .filter(F.col("seq_inc") + F.col("idx_inc") > 0)
        .orderBy("day", "relname")
    )


@query(
    "pgw_unused_indexes",
    group="collector",
    oracle=f"""
WITH snaps AS ({_UI})
SELECT relname, indexrelname,
       CAST(max(idx_scan) - min(idx_scan) AS BIGINT) AS scan_inc,
       max(idx_scan) - min(idx_scan) = 0 AS is_unused
FROM snaps
GROUP BY relname, indexrelname
ORDER BY scan_inc, indexrelname
""",
)
def pgw_unused_indexes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unused-index report from pg_stat_user_indexes: per index the
    total observed increase of the cumulative idx_scan counter across
    the whole window (last minus first sample — max/min are exact on
    a monotone counter) and the is_unused flag.  The derivation
    plants truly-never-scanned indexes (idx_12..15), so the report
    has guaranteed true positives at every scale; rare-scan indexes
    (idx_8..11) surface as low-but-nonzero scan_inc, which is exactly
    the triage order a DBA wants (ORDER BY scan_inc).  One groupBy
    over the snapshot table, no window needed."""
    snaps = derive_user_indexes(load_table(spark, sf_dir, "events"))
    return (
        snaps.groupBy("relname", "indexrelname")
        .agg(
            (F.max("idx_scan") - F.min("idx_scan"))
            .cast("bigint")
            .alias("scan_inc")
        )
        .withColumn("is_unused", F.col("scan_inc") == 0)
        .orderBy("scan_inc", "indexrelname")
    )


@query(
    "pgw_relation_growth",
    group="collector",
    oracle=f"""
WITH snaps AS ({_RS})
SELECT relname,
       CAST(max_by(total_bytes, snap_ts) AS BIGINT) AS current_bytes,
       CAST(max_by(total_bytes, snap_ts)
            - min_by(total_bytes, snap_ts) AS BIGINT) AS growth_bytes,
       round(CAST(max_by(total_bytes, snap_ts)
                  - min_by(total_bytes, snap_ts) AS DOUBLE)
             / (CAST(date_diff('second', min(snap_ts), max(snap_ts))
                     AS DOUBLE) / 3600.0), 6) AS bytes_per_hour
FROM snaps
GROUP BY relname
ORDER BY relname
""",
)
def pgw_relation_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relation growth rate from sampled pg_total_relation_size: per
    table the current size (argmin/argmax by snap_ts — ticks unique
    per table), total growth across the observation window, and the
    bytes-per-hour rate over the first-to-last tick span.  Integer
    sizes stay exact until the single rounded division.  The shape —
    first/last point per series + elapsed-time rate — is the template
    for every capacity-planning panel; one groupBy, no window."""
    snaps = derive_relation_size(load_table(spark, sf_dir, "events"))
    return (
        snaps.groupBy("relname")
        .agg(
            F.max_by("total_bytes", "snap_ts").alias("current_bytes"),
            (
                F.max_by("total_bytes", "snap_ts")
                - F.min_by("total_bytes", "snap_ts")
            )
            .cast("bigint")
            .alias("growth_bytes"),
            F.round(
                (
                    F.max_by("total_bytes", "snap_ts")
                    - F.min_by("total_bytes", "snap_ts")
                ).cast("double")
                / (
                    (
                        F.unix_timestamp(F.max("snap_ts"))
                        - F.unix_timestamp(F.min("snap_ts"))
                    ).cast("double")
                    / 3600.0
                ),
                6,
            ).alias("bytes_per_hour"),
        )
        .orderBy("relname")
    )
