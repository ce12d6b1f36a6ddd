"""Typed Postgres stat-view schemas + deterministic snapshot fixtures.

SURVEY.md §0.1 [K]: a ``pg_telemetry``-class collector snapshots a
fixed set of cumulative statistics views each tick.  This module
declares the **typed wire schema** of the six views the collector
ships beyond the generic events feed — ``pg_stat_statements``,
``pg_locks``, ``pg_stat_bgwriter``, ``pg_stat_replication``,
``pg_stat_database``, ``pg_stat_activity`` — trimmed
to their load-bearing columns, plus deterministic snapshot
derivations from the driver's ``events`` fixture so the analytic
surface over each view is fully DuckDB-oracle-checkable (tier A).

Why derive snapshots from ``events`` instead of shipping synthetic
parquet: the oracle contract (driver at sf0.01, local sweeps at
sf0.01/0.1/1) evaluates SQL against the PRE-REGISTERED fixture views
only — a derivation written twice (DataFrame + ANSI SQL) keeps every
rollup hash-gated at all three scales with zero out-of-band files,
and scales with the fixture automatically.

The derivations simulate the collector's raw feed faithfully:
- **cumulative counters** per series (window prefix sums — exactly
  what a stat view exposes between restarts),
- **restarts**: counters wrap modulo a fixed level, so every
  downstream delta/rate op must apply the §0.1 counter-reset rule
  (``greatest(delta, 0)`` keeping the post-reset level),
- **snapshot ticks**: one row per (series, hour) — the cron-tick
  granularity the reference collects at.

Scale: every derivation is one window over (series, tick) — the same
per-series hash partitioning all §2 TS operators ride; nothing here
collects or loops on the driver.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window
from pyspark.sql import types as T

# --------------------------------------------------------------------
# Typed wire schemas (fixed, explicit — §1.2: never inferred)
# --------------------------------------------------------------------

#: pg_stat_statements: per normalized statement, cumulative.
PG_STAT_STATEMENTS = T.StructType(
    [
        T.StructField("snap_ts", T.TimestampType()),
        T.StructField("queryid", T.LongType()),
        T.StructField("calls", T.LongType()),
        T.StructField("total_exec_time", T.DoubleType()),  # ms, cumulative
        T.StructField("rows", T.LongType()),
    ]
)

#: pg_locks: point-in-time lock table (NOT cumulative — a gauge view).
PG_LOCKS = T.StructType(
    [
        T.StructField("snap_ts", T.TimestampType()),
        T.StructField("pid", T.IntegerType()),
        T.StructField("locktype", T.StringType()),
        T.StructField("mode", T.StringType()),
        T.StructField("granted", T.BooleanType()),
    ]
)

#: pg_stat_bgwriter: one global row per snapshot, cumulative.
PG_STAT_BGWRITER = T.StructType(
    [
        T.StructField("snap_ts", T.TimestampType()),
        T.StructField("checkpoints_timed", T.LongType()),
        T.StructField("buffers_checkpoint", T.LongType()),
        T.StructField("buffers_clean", T.LongType()),
    ]
)

#: pg_stat_replication: one row per standby per snapshot (gauges).
PG_STAT_REPLICATION = T.StructType(
    [
        T.StructField("snap_ts", T.TimestampType()),
        T.StructField("client_addr", T.StringType()),
        T.StructField("state", T.StringType()),
        T.StructField("replay_lag_ms", T.DoubleType()),
    ]
)

#: pg_stat_database: per database, cumulative.
PG_STAT_DATABASE = T.StructType(
    [
        T.StructField("snap_ts", T.TimestampType()),
        T.StructField("datname", T.StringType()),
        T.StructField("xact_commit", T.LongType()),
        T.StructField("blks_read", T.LongType()),
        T.StructField("blks_hit", T.LongType()),
    ]
)

#: pg_stat_activity: point-in-time backend list (gauge view).
PG_STAT_ACTIVITY = T.StructType(
    [
        T.StructField("snap_ts", T.TimestampType()),
        T.StructField("pid", T.IntegerType()),
        T.StructField("state", T.StringType()),
        T.StructField("wait_event", T.StringType()),  # null = not waiting
    ]
)

SCHEMAS: dict[str, T.StructType] = {
    "pg_stat_statements": PG_STAT_STATEMENTS,
    "pg_locks": PG_LOCKS,
    "pg_stat_bgwriter": PG_STAT_BGWRITER,
    "pg_stat_replication": PG_STAT_REPLICATION,
    "pg_stat_database": PG_STAT_DATABASE,
    "pg_stat_activity": PG_STAT_ACTIVITY,
}

#: Counter wrap level for the synthetic restarts (statements view):
#: cumulative exec time wraps at this many ms, calls at /100 of it.
_STMT_WRAP_MS = 200_000

# SQL fragment shared by the Spark/DuckDB derivations below — both
# sides compute snapshots the same way so tier-A hashing is exact.


def derive_stat_statements(events: DataFrame) -> DataFrame:
    """pg_stat_statements snapshots from events: queryid = user_id %%
    40 (40 normalized statements), one snapshot per (queryid, hour).
    Cumulative counters are exact-decimal prefix sums over hourly
    activity, wrapped modulo ``_STMT_WRAP_MS`` to simulate restarts.
    calls/rows wrap with the same modulus pattern so resets line up
    across columns the way a real restart zeroes the whole row."""
    hourly = (
        events.select(
            (F.col("user_id") % 40).alias("queryid"),
            F.date_trunc("hour", "ts").alias("snap_ts"),
            F.col("value"),
        )
        .groupBy("queryid", "snap_ts")
        .agg(
            F.count("*").alias("d_calls"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("d_time"),
        )
    )
    w = Window.partitionBy("queryid").orderBy("snap_ts")
    wrap = F.lit(_STMT_WRAP_MS).cast("decimal(18,6)")
    return hourly.select(
        "snap_ts",
        "queryid",
        (F.sum("d_calls").over(w) % (_STMT_WRAP_MS // 100)).alias("calls"),
        (F.sum("d_time").over(w) % wrap).cast("double").alias(
            "total_exec_time"
        ),
        (F.sum(F.col("d_calls") * 3).over(w) % (_STMT_WRAP_MS // 100)).alias(
            "rows"
        ),
    )


#: DuckDB mirror of :func:`derive_stat_statements` (``{ev}`` = events
#: view with ts already cast to TIMESTAMP).
STAT_STATEMENTS_SQL = f"""
WITH hourly AS (
  SELECT user_id % 40 AS queryid,
         date_trunc('hour', ts) AS snap_ts,
         count(*) AS d_calls,
         sum(CAST(value AS DECIMAL(18,6))) AS d_time
  FROM {{ev}} GROUP BY 1, 2
)
SELECT snap_ts, queryid,
       CAST(sum(d_calls) OVER w % {_STMT_WRAP_MS // 100} AS BIGINT) AS calls,
       CAST(sum(d_time) OVER w % CAST({_STMT_WRAP_MS} AS DECIMAL(18,6))
            AS DOUBLE) AS total_exec_time,
       CAST(sum(d_calls * 3) OVER w % {_STMT_WRAP_MS // 100} AS BIGINT) AS rows
FROM hourly
WINDOW w AS (PARTITION BY queryid ORDER BY snap_ts)
"""


def derive_locks(events: DataFrame) -> DataFrame:
    """pg_locks snapshots from events: each event is a lock row in
    its hour's snapshot — pid = user_id %% 50, mode/locktype from the
    event_type, granted = (event_id %% 5 != 0) (a deterministic ~20%%
    wait rate).  A gauge view: no cumulation, pure projection."""
    return events.select(
        F.date_trunc("hour", "ts").alias("snap_ts"),
        (F.col("user_id") % 50).cast("int").alias("pid"),
        F.when(F.col("event_type") < "m", "relation")
        .otherwise("transactionid")
        .alias("locktype"),
        F.concat(
            F.when(F.col("event_id") % 3 == 0, F.lit("Access"))
            .when(F.col("event_id") % 3 == 1, F.lit("Row"))
            .otherwise(F.lit("Share")),
            F.lit("Lock"),
        ).alias("mode"),
        (F.col("event_id") % 5 != 0).alias("granted"),
    )


LOCKS_SQL = """
SELECT date_trunc('hour', ts) AS snap_ts,
       CAST(user_id % 50 AS INTEGER) AS pid,
       CASE WHEN event_type < 'm' THEN 'relation'
            ELSE 'transactionid' END AS locktype,
       (CASE WHEN event_id % 3 = 0 THEN 'Access'
             WHEN event_id % 3 = 1 THEN 'Row'
             ELSE 'Share' END) || 'Lock' AS mode,
       event_id % 5 <> 0 AS granted
FROM {ev}
"""


def derive_bgwriter(events: DataFrame) -> DataFrame:
    """pg_stat_bgwriter snapshots: ONE global cumulative series, one
    row per hour — checkpoints_timed counts hours, buffer counters
    are scaled exact-decimal prefix sums of event volume.  The single
    global series is the worst partitioning case (every row in one
    window partition); at fixture scale that is exactly the real
    view's shape (bgwriter IS one row per tick) so the single-series
    window is semantic, not an accident."""
    hourly = (
        events.select(
            F.date_trunc("hour", "ts").alias("snap_ts"), F.col("value")
        )
        .groupBy("snap_ts")
        .agg(
            F.count("*").alias("d_rows"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("d_val"),
        )
    )
    w = Window.orderBy("snap_ts")
    return hourly.select(
        "snap_ts",
        F.row_number().over(w).cast("long").alias("checkpoints_timed"),
        F.sum(F.floor(F.col("d_val") * 7).cast("long")).over(w).alias(
            "buffers_checkpoint"
        ),
        F.sum("d_rows").over(w).alias("buffers_clean"),
    )


BGWRITER_SQL = """
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS snap_ts,
         count(*) AS d_rows,
         sum(CAST(value AS DECIMAL(18,6))) AS d_val
  FROM {ev} GROUP BY 1
)
SELECT snap_ts,
       CAST(row_number() OVER w AS BIGINT) AS checkpoints_timed,
       CAST(sum(CAST(floor(d_val * 7) AS BIGINT)) OVER w AS BIGINT)
         AS buffers_checkpoint,
       CAST(sum(d_rows) OVER w AS BIGINT) AS buffers_clean
FROM hourly
WINDOW w AS (ORDER BY snap_ts)
"""


def derive_replication(events: DataFrame) -> DataFrame:
    """pg_stat_replication snapshots: 3 standbys (user_id %% 3), one
    row per (standby, hour); replay lag is the hour's exact-decimal
    mean event value scaled to ms — a gauge that moves smoothly but
    deterministically.  state flips to 'catchup' on high-lag hours."""
    per = (
        events.select(
            F.date_trunc("hour", "ts").alias("snap_ts"),
            F.concat(F.lit("10.0.0."), (F.col("user_id") % 3 + 1)).alias(
                "client_addr"
            ),
            F.col("value"),
        )
        .groupBy("snap_ts", "client_addr")
        .agg(
            F.round(
                F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
                / F.count("*")
                * 10,
                6,
            ).alias("replay_lag_ms")
        )
    )
    return per.select(
        "snap_ts",
        "client_addr",
        F.when(F.col("replay_lag_ms") > 5000, "catchup")
        .otherwise("streaming")
        .alias("state"),
        "replay_lag_ms",
    )


REPLICATION_SQL = """
WITH per AS (
  SELECT date_trunc('hour', ts) AS snap_ts,
         '10.0.0.' || CAST(user_id % 3 + 1 AS VARCHAR) AS client_addr,
         round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
               / count(*) * 10, 6) AS replay_lag_ms
  FROM {ev} GROUP BY 1, 2
)
SELECT snap_ts, client_addr,
       CASE WHEN replay_lag_ms > 5000 THEN 'catchup'
            ELSE 'streaming' END AS state,
       replay_lag_ms
FROM per
"""

def derive_stat_database(events: DataFrame) -> DataFrame:
    """pg_stat_database snapshots: 5 databases (user_id %% 5), one
    row per (db, hour); cumulative xact/block counters are exact
    prefix sums of hourly activity — blks_hit is scaled 17x over
    blks_read so the derived cache-hit ratio lands in the realistic
    ~0.94 band instead of a degenerate constant."""
    hourly = (
        events.select(
            F.date_trunc("hour", "ts").alias("snap_ts"),
            F.concat(F.lit("db_"), (F.col("user_id") % 5)).alias("datname"),
            F.col("value"),
        )
        .groupBy("snap_ts", "datname")
        .agg(
            F.count("*").alias("d_xact"),
            F.sum(
                F.floor(F.col("value").cast("decimal(18,6)") * 3).cast("long")
            ).alias("d_read"),
            F.sum(
                F.floor(F.col("value").cast("decimal(18,6)") * 51).cast("long")
            ).alias("d_hit"),
        )
    )
    w = Window.partitionBy("datname").orderBy("snap_ts")
    return hourly.select(
        "snap_ts",
        "datname",
        F.sum("d_xact").over(w).alias("xact_commit"),
        F.sum("d_read").over(w).alias("blks_read"),
        F.sum("d_hit").over(w).alias("blks_hit"),
    )


STAT_DATABASE_SQL = """
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS snap_ts,
         'db_' || CAST(user_id % 5 AS VARCHAR) AS datname,
         count(*) AS d_xact,
         sum(CAST(floor(CAST(value AS DECIMAL(18,6)) * 3) AS BIGINT)) AS d_read,
         sum(CAST(floor(CAST(value AS DECIMAL(18,6)) * 51) AS BIGINT)) AS d_hit
  FROM {ev} GROUP BY 1, 2
)
SELECT snap_ts, datname,
       CAST(sum(d_xact) OVER w AS BIGINT) AS xact_commit,
       CAST(sum(d_read) OVER w AS BIGINT) AS blks_read,
       CAST(sum(d_hit) OVER w AS BIGINT) AS blks_hit
FROM hourly
WINDOW w AS (PARTITION BY datname ORDER BY snap_ts)
"""


def derive_stat_activity(events: DataFrame) -> DataFrame:
    """pg_stat_activity snapshots: each event is a backend row in its
    hour's snapshot — pid = user_id %% 200, state from the event_id
    residue (~60%% active / 30%% idle / 10%% idle-in-txn), wait_event
    present on every 4th backend (NULL otherwise, like the view)."""
    return events.select(
        F.date_trunc("hour", "ts").alias("snap_ts"),
        (F.col("user_id") % 200).cast("int").alias("pid"),
        F.when(F.col("event_id") % 10 < 6, "active")
        .when(F.col("event_id") % 10 < 9, "idle")
        .otherwise("idle in transaction")
        .alias("state"),
        F.when(
            F.col("event_id") % 4 == 0,
            F.when(F.col("event_id") % 8 == 0, "LWLock").otherwise("IO"),
        ).alias("wait_event"),
    )


STAT_ACTIVITY_SQL = """
SELECT date_trunc('hour', ts) AS snap_ts,
       CAST(user_id % 200 AS INTEGER) AS pid,
       CASE WHEN event_id % 10 < 6 THEN 'active'
            WHEN event_id % 10 < 9 THEN 'idle'
            ELSE 'idle in transaction' END AS state,
       CASE WHEN event_id % 4 = 0 THEN
         CASE WHEN event_id % 8 = 0 THEN 'LWLock' ELSE 'IO' END
       END AS wait_event
FROM {ev}
"""


DERIVATIONS = {
    "pg_stat_statements": derive_stat_statements,
    "pg_locks": derive_locks,
    "pg_stat_bgwriter": derive_bgwriter,
    "pg_stat_replication": derive_replication,
    "pg_stat_database": derive_stat_database,
    "pg_stat_activity": derive_stat_activity,
}
