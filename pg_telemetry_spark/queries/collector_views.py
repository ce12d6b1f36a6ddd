"""Analytic rollups over the typed Postgres stat views (§0.1).

The six views declared in :mod:`pg_telemetry_spark.statviews`
(pg_stat_statements, pg_locks, pg_stat_bgwriter,
pg_stat_replication, pg_stat_database, pg_stat_activity) each get
the query shape the reference's users actually chart for it:

- statements → per-hour increase() + top-N hottest statements per day
  (cumulative counters, counter-reset rule, rank/limit);
- locks → per-hour contention summary (gauge view, no cumulation);
- bgwriter → per-tick buffer write RATES from cumulative counters
  (delta / elapsed seconds, reset-guarded);
- replication → per-standby health: last-point state + lag extremes
  (argmax-by-ts + exact-decimal mean);
- database → buffer-cache hit ratio per (day, db) from cumulative
  block counters;
- activity → connection-state / wait-event board (gauge view).

All tier A: the snapshot derivations are written twice (DataFrame in
statviews.py, ANSI SQL mirrors) so every rollup is hash-gated against
DuckDB at sf0.01/0.1/1.  Scale: each op is ONE window or groupBy over
(series, tick) — per-series hash partitioning, no collects, no
cross-tick state beyond lag(1).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from pg_telemetry_spark.queries.relational import EVENTS_V
from pg_telemetry_spark.registry import query
from pg_telemetry_spark.statviews import (
    BGWRITER_SQL,
    LOCKS_SQL,
    REPLICATION_SQL,
    STAT_STATEMENTS_SQL,
    derive_bgwriter,
    derive_locks,
    derive_replication,
    derive_stat_statements,
)
from pg_telemetry_spark.tables import load_table

_STMTS = STAT_STATEMENTS_SQL.format(ev=EVENTS_V)
_LOCKS = LOCKS_SQL.format(ev=EVENTS_V)
_BGW = BGWRITER_SQL.format(ev=EVENTS_V)
_REPL = REPLICATION_SQL.format(ev=EVENTS_V)


@query(
    "pgw_stmt_top_delta",
    group="collector",
    oracle=f"""
WITH snaps AS ({_STMTS}),
deltas AS (
  SELECT CAST(snap_ts AS DATE) AS day, queryid,
         calls - lag(calls) OVER w AS d_calls, calls,
         total_exec_time - lag(total_exec_time) OVER w AS d_time,
         total_exec_time
  FROM snaps
  WINDOW w AS (PARTITION BY queryid ORDER BY snap_ts)
),
incr AS (
  SELECT day, queryid,
         CAST(sum(CASE WHEN d_calls < 0 THEN calls ELSE d_calls END)
              AS BIGINT) AS calls_inc,
         round(CAST(sum(CAST(CASE WHEN d_time < 0 THEN total_exec_time
                                  ELSE d_time END AS DECIMAL(18,6)))
                    AS DOUBLE), 6) AS time_inc_ms
  FROM deltas WHERE d_time IS NOT NULL
  GROUP BY day, queryid
),
ranked AS (
  SELECT day, queryid, calls_inc, time_inc_ms,
         CAST(row_number() OVER (PARTITION BY day
                                 ORDER BY time_inc_ms DESC, queryid)
              AS INT) AS rnk
  FROM incr
)
SELECT day, rnk, queryid, calls_inc, time_inc_ms
FROM ranked WHERE rnk <= 5
ORDER BY day, rnk
""",
)
def pgw_stmt_top_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hottest statements per day from pg_stat_statements snapshots:
    per-hour increase() of the cumulative calls/total_exec_time
    counters (the §0.1 reset rule — a negative delta means restart,
    contribute the post-reset level), summed per day in exact
    decimals, top-5 by time ranked with a deterministic queryid
    tie-break.  Two window shuffles (per-queryid lag, per-day rank)
    over a snapshots frame that is already tick-granular — at 100 TB
    the raw events never reach this plan, only the hourly snapshot
    table the collector maintains."""
    snaps = derive_stat_statements(load_table(spark, sf_dir, "events"))
    w = Window.partitionBy("queryid").orderBy("snap_ts")
    deltas = snaps.select(
        F.col("snap_ts").cast("date").alias("day"),
        "queryid",
        (F.col("calls") - F.lag("calls").over(w)).alias("d_calls"),
        "calls",
        (F.col("total_exec_time") - F.lag("total_exec_time").over(w)).alias(
            "d_time"
        ),
        "total_exec_time",
    ).filter(F.col("d_time").isNotNull())
    incr = deltas.groupBy("day", "queryid").agg(
        F.sum(
            F.when(F.col("d_calls") < 0, F.col("calls")).otherwise(
                F.col("d_calls")
            )
        )
        .cast("bigint")
        .alias("calls_inc"),
        F.round(
            F.sum(
                F.when(F.col("d_time") < 0, F.col("total_exec_time"))
                .otherwise(F.col("d_time"))
                .cast("decimal(18,6)")
            ).cast("double"),
            6,
        ).alias("time_inc_ms"),
    )
    rw = Window.partitionBy("day").orderBy(
        F.col("time_inc_ms").desc(), "queryid"
    )
    return (
        incr.withColumn("rnk", F.row_number().over(rw).cast("int"))
        .filter(F.col("rnk") <= 5)
        .select("day", "rnk", "queryid", "calls_inc", "time_inc_ms")
        .orderBy("day", "rnk")
    )


@query(
    "pgw_locks_contention",
    group="collector",
    oracle=f"""
WITH locks AS ({_LOCKS})
SELECT snap_ts, mode,
       count(*) AS n_locks,
       CAST(sum(CASE WHEN granted THEN 0 ELSE 1 END) AS BIGINT)
         AS n_waiting,
       round(CAST(sum(CASE WHEN granted THEN 0 ELSE 1 END) AS DOUBLE)
             / count(*), 6) AS wait_ratio
FROM locks
GROUP BY snap_ts, mode
HAVING sum(CASE WHEN granted THEN 0 ELSE 1 END) > 0
ORDER BY snap_ts, mode
""",
)
def pgw_locks_contention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lock contention per (snapshot hour, lock mode) from the
    pg_locks gauge view: total locks, waiting count, wait ratio —
    the chart a DBA watches during a lock storm.  One groupBy over
    the projected gauge rows; gauge views have no cross-tick state,
    so this shape is embarrassingly parallel at any scale."""
    locks = derive_locks(load_table(spark, sf_dir, "events"))
    return (
        locks.groupBy("snap_ts", "mode")
        .agg(
            F.count("*").alias("n_locks"),
            F.sum((~F.col("granted")).cast("int")).cast("bigint").alias(
                "n_waiting"
            ),
            F.round(
                F.sum((~F.col("granted")).cast("int")).cast("double")
                / F.count("*"),
                6,
            ).alias("wait_ratio"),
        )
        .filter(F.col("n_waiting") > 0)
        .orderBy("snap_ts", "mode")
    )


@query(
    "pgw_bgwriter_rate",
    group="collector",
    oracle=f"""
WITH snaps AS ({_BGW}),
deltas AS (
  SELECT snap_ts,
         buffers_checkpoint - lag(buffers_checkpoint) OVER w AS d_ckpt,
         buffers_clean - lag(buffers_clean) OVER w AS d_clean,
         CAST(date_diff('second', lag(snap_ts) OVER w, snap_ts)
              AS DOUBLE) AS dt_s
  FROM snaps
  WINDOW w AS (ORDER BY snap_ts)
)
SELECT snap_ts,
       round(CAST(greatest(d_ckpt, 0) AS DOUBLE) / dt_s, 6)
         AS ckpt_buf_per_s,
       round(CAST(greatest(d_clean, 0) AS DOUBLE) / dt_s, 6)
         AS clean_buf_per_s
FROM deltas WHERE dt_s IS NOT NULL AND dt_s > 0
ORDER BY snap_ts
""",
)
def pgw_bgwriter_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Buffer write RATES from pg_stat_bgwriter's cumulative
    counters: per-tick delta / elapsed seconds, reset-guarded with
    greatest(delta, 0) (§0.1's simpler null-out variant — bgwriter
    restarts lose the partial tick, unlike the statements op which
    keeps the post-reset level; both idioms are in the survey).  The
    view is ONE global series (one row per tick in Postgres), so the
    single-partition window is the true shape, not a skew accident;
    rows entering it are already hour-granular."""
    snaps = derive_bgwriter(load_table(spark, sf_dir, "events"))
    w = Window.orderBy("snap_ts")
    deltas = snaps.select(
        "snap_ts",
        (
            F.col("buffers_checkpoint")
            - F.lag("buffers_checkpoint").over(w)
        ).alias("d_ckpt"),
        (F.col("buffers_clean") - F.lag("buffers_clean").over(w)).alias(
            "d_clean"
        ),
        (
            F.unix_timestamp("snap_ts")
            - F.unix_timestamp(F.lag("snap_ts").over(w))
        )
        .cast("double")
        .alias("dt_s"),
    ).filter(F.col("dt_s").isNotNull() & (F.col("dt_s") > 0))
    return deltas.select(
        "snap_ts",
        F.round(
            F.greatest(F.col("d_ckpt"), F.lit(0)).cast("double")
            / F.col("dt_s"),
            6,
        ).alias("ckpt_buf_per_s"),
        F.round(
            F.greatest(F.col("d_clean"), F.lit(0)).cast("double")
            / F.col("dt_s"),
            6,
        ).alias("clean_buf_per_s"),
    ).orderBy("snap_ts")


@query(
    "pgw_replication_health",
    group="collector",
    oracle=f"""
WITH repl AS ({_REPL}),
last_pt AS (
  SELECT client_addr, state AS last_state,
         row_number() OVER (PARTITION BY client_addr
                            ORDER BY snap_ts DESC) AS rn
  FROM repl
)
SELECT r.client_addr,
       (SELECT last_state FROM last_pt l
        WHERE l.client_addr = r.client_addr AND l.rn = 1) AS last_state,
       CAST(sum(CASE WHEN r.state = 'catchup' THEN 1 ELSE 0 END)
            AS BIGINT) AS catchup_ticks,
       round(max(r.replay_lag_ms), 6) AS max_lag_ms,
       round(CAST(sum(CAST(r.replay_lag_ms AS DECIMAL(18,6)))
                  AS DOUBLE) / count(*), 6) AS avg_lag_ms
FROM repl r
GROUP BY r.client_addr
ORDER BY r.client_addr
""",
)
def pgw_replication_health(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standby health board from pg_stat_replication: per standby the
    LAST-POINT state (argmax by snapshot ts — §0.1's current-state
    shape), catch-up tick count, max and exact-decimal mean replay
    lag.  Snapshot ts is unique per standby so max_by is
    deterministic.  One groupBy + one last-point window over 3 series
    — at 100 TB the replication view is still tiny (rows = standbys x
    ticks); the shape matters because it is the template every
    current-state dashboard panel uses."""
    repl = derive_replication(load_table(spark, sf_dir, "events"))
    return (
        repl.groupBy("client_addr")
        .agg(
            F.max_by("state", "snap_ts").alias("last_state"),
            F.sum((F.col("state") == "catchup").cast("int"))
            .cast("bigint")
            .alias("catchup_ticks"),
            F.round(F.max("replay_lag_ms"), 6).alias("max_lag_ms"),
            F.round(
                F.sum(F.col("replay_lag_ms").cast("decimal(18,6)")).cast(
                    "double"
                )
                / F.count("*"),
                6,
            ).alias("avg_lag_ms"),
        )
        .orderBy("client_addr")
    )


from pg_telemetry_spark.statviews import (  # noqa: E402
    STAT_ACTIVITY_SQL,
    STAT_DATABASE_SQL,
    derive_stat_activity,
    derive_stat_database,
)

_DB = STAT_DATABASE_SQL.format(ev=EVENTS_V)
_ACT = STAT_ACTIVITY_SQL.format(ev=EVENTS_V)


@query(
    "pgw_cache_hit_ratio",
    group="collector",
    oracle=f"""
WITH snaps AS ({_DB}),
deltas AS (
  SELECT CAST(snap_ts AS DATE) AS day, datname,
         blks_read - lag(blks_read) OVER w AS d_read, blks_read,
         blks_hit - lag(blks_hit) OVER w AS d_hit, blks_hit,
         xact_commit - lag(xact_commit) OVER w AS d_xact, xact_commit
  FROM snaps
  WINDOW w AS (PARTITION BY datname ORDER BY snap_ts)
)
SELECT day, datname,
       CAST(sum(CASE WHEN d_xact < 0 THEN xact_commit ELSE d_xact END)
            AS BIGINT) AS xacts,
       round(CAST(sum(CASE WHEN d_hit < 0 THEN blks_hit ELSE d_hit END)
                  AS DOUBLE)
             / (sum(CASE WHEN d_hit < 0 THEN blks_hit ELSE d_hit END)
                + sum(CASE WHEN d_read < 0 THEN blks_read ELSE d_read END)),
             6) AS hit_ratio
FROM deltas WHERE d_read IS NOT NULL
GROUP BY day, datname
ORDER BY day, datname
""",
)
def pgw_cache_hit_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Buffer-cache hit ratio per (day, database) from
    pg_stat_database's cumulative block counters — THE first-glance
    Postgres health chart: increase(blks_hit) / (increase(blks_hit) +
    increase(blks_read)) with the §0.1 reset rule on every counter.
    Integer increases sum exactly, so the single rounded division at
    the end is the only float op.  One per-db window + one day
    groupBy; partitioning rides the datname key end to end."""
    snaps = derive_stat_database(load_table(spark, sf_dir, "events"))
    w = Window.partitionBy("datname").orderBy("snap_ts")

    def inc(c: str):
        d = F.col(c) - F.lag(c).over(w)
        return F.when(d < 0, F.col(c)).otherwise(d)

    deltas = snaps.select(
        F.col("snap_ts").cast("date").alias("day"),
        "datname",
        inc("blks_read").alias("i_read"),
        inc("blks_hit").alias("i_hit"),
        inc("xact_commit").alias("i_xact"),
    ).filter(F.col("i_read").isNotNull())
    return (
        deltas.groupBy("day", "datname")
        .agg(
            F.sum("i_xact").cast("bigint").alias("xacts"),
            F.round(
                F.sum("i_hit").cast("double")
                / (F.sum("i_hit") + F.sum("i_read")),
                6,
            ).alias("hit_ratio"),
        )
        .orderBy("day", "datname")
    )


@query(
    "pgw_activity_waits",
    group="collector",
    oracle=f"""
WITH act AS ({_ACT})
SELECT snap_ts, state,
       count(*) AS n_backends,
       CAST(count(wait_event) AS BIGINT) AS n_waiting,
       CAST(sum(CASE WHEN wait_event = 'LWLock' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_lwlock
FROM act
GROUP BY snap_ts, state
ORDER BY snap_ts, state
""",
)
def pgw_activity_waits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connection-state / wait-event board from the pg_stat_activity
    gauge view: per (snapshot hour, backend state) the backend count,
    how many sit on any wait event (COUNT over the nullable column —
    NULL means running free, exactly like the view), and the LWLock
    subset.  Pure groupBy over gauge rows; NULL-counting semantics
    are identical in Spark and DuckDB by ANSI rules."""
    act = derive_stat_activity(load_table(spark, sf_dir, "events"))
    return (
        act.groupBy("snap_ts", "state")
        .agg(
            F.count("*").alias("n_backends"),
            F.count("wait_event").cast("bigint").alias("n_waiting"),
            # when() not ==: a NULL wait_event must contribute 0 like
            # the oracle's CASE, not a sum-skipped NULL
            F.sum(F.when(F.col("wait_event") == "LWLock", 1).otherwise(0))
            .cast("bigint")
            .alias("n_lwlock"),
        )
        .orderBy("snap_ts", "state")
    )
