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

#: pg_stat_user_tables: per table — cumulative scan/tuple counters
#: plus the live/dead tuple GAUGES and the autovacuum counter (§0.1's
#: last undeclared per-relation view; previously only a JDBC
#: partition-column hint in sources/jdbc_pg.py).
PG_STAT_USER_TABLES = T.StructType(
    [
        T.StructField("snap_ts", T.TimestampType()),
        T.StructField("relname", T.StringType()),
        T.StructField("seq_scan", T.LongType()),
        T.StructField("idx_scan", T.LongType()),
        T.StructField("n_tup_ins", T.LongType()),
        T.StructField("n_tup_upd", T.LongType()),
        T.StructField("n_tup_del", T.LongType()),
        T.StructField("n_live_tup", T.LongType()),  # gauge
        T.StructField("n_dead_tup", T.LongType()),  # gauge
        T.StructField("autovacuum_count", T.LongType()),
    ]
)

#: pg_stat_user_indexes: per (table, index), cumulative scan counter.
PG_STAT_USER_INDEXES = T.StructType(
    [
        T.StructField("snap_ts", T.TimestampType()),
        T.StructField("relname", T.StringType()),
        T.StructField("indexrelname", T.StringType()),
        T.StructField("idx_scan", T.LongType()),
    ]
)

#: pg_total_relation_size sampled per tick: a monotone size gauge.
PG_RELATION_SIZE = T.StructType(
    [
        T.StructField("snap_ts", T.TimestampType()),
        T.StructField("relname", T.StringType()),
        T.StructField("total_bytes", T.LongType()),
    ]
)

#: pg_stat_io (PG16+): per (backend_type, io_context), cumulative
#: block I/O counters — the view that attributes physical I/O to the
#: backend class doing it (client vs autovacuum vs checkpointer).
PG_STAT_IO = T.StructType(
    [
        T.StructField("snap_ts", T.TimestampType()),
        T.StructField("backend_type", T.StringType()),
        T.StructField("io_context", T.StringType()),
        T.StructField("reads", T.LongType()),
        T.StructField("writes", T.LongType()),
        T.StructField("extends", T.LongType()),
    ]
)

#: pg_stat_wal (PG14+): ONE global cumulative series per snapshot.
PG_STAT_WAL = T.StructType(
    [
        T.StructField("snap_ts", T.TimestampType()),
        T.StructField("wal_records", T.LongType()),
        T.StructField("wal_bytes", T.LongType()),
        T.StructField("wal_buffers_full", T.LongType()),
    ]
)

#: pg_stat_archiver: one global cumulative row per snapshot.
PG_STAT_ARCHIVER = T.StructType(
    [
        T.StructField("snap_ts", T.TimestampType()),
        T.StructField("archived_count", T.LongType()),
        T.StructField("failed_count", T.LongType()),
    ]
)

#: pg_statio_user_tables: per table, cumulative block hit/read split
#: for heap and index fetches — the per-RELATION cache analysis
#: (pg_stat_database's blks_hit/read is the per-DB aggregate).
PG_STATIO_USER_TABLES = T.StructType(
    [
        T.StructField("snap_ts", T.TimestampType()),
        T.StructField("relname", T.StringType()),
        T.StructField("heap_blks_read", T.LongType()),
        T.StructField("heap_blks_hit", T.LongType()),
        T.StructField("idx_blks_read", T.LongType()),
        T.StructField("idx_blks_hit", T.LongType()),
    ]
)

SCHEMAS: dict[str, T.StructType] = {
    "pg_stat_statements": PG_STAT_STATEMENTS,
    "pg_locks": PG_LOCKS,
    "pg_stat_bgwriter": PG_STAT_BGWRITER,
    "pg_stat_replication": PG_STAT_REPLICATION,
    "pg_stat_database": PG_STAT_DATABASE,
    "pg_stat_activity": PG_STAT_ACTIVITY,
    "pg_stat_user_tables": PG_STAT_USER_TABLES,
    "pg_stat_user_indexes": PG_STAT_USER_INDEXES,
    "pg_relation_size": PG_RELATION_SIZE,
    "pg_stat_io": PG_STAT_IO,
    "pg_stat_wal": PG_STAT_WAL,
    "pg_stat_archiver": PG_STAT_ARCHIVER,
    "pg_statio_user_tables": PG_STATIO_USER_TABLES,
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


def derive_user_tables(events: DataFrame) -> DataFrame:
    """pg_stat_user_tables snapshots: 8 tables (user_id %% 8), one
    row per (relname, hour).  Every event is an insert; residues of
    event_id mark updates (1/3), deletes (1/7), and the seq-vs-idx
    scan split (1/5 seq).  Cumulative counters are integer prefix
    sums (exact — no float order anywhere); the live-tuple gauge is
    inserts-minus-deletes; the dead-tuple gauge accumulates
    upd+del and is zeroed by an autovacuum every 6th tick per table
    (vac_epoch = floor((tick-1)/6)), which also drives the cumulative
    autovacuum_count — so downstream bloat analytics see the
    sawtooth a real autovacuum produces."""
    hourly = (
        events.select(
            F.concat(F.lit("tbl_"), (F.col("user_id") % 8)).alias("relname"),
            F.date_trunc("hour", "ts").alias("snap_ts"),
            (F.col("event_id") % 3 == 0).cast("long").alias("is_upd"),
            (F.col("event_id") % 7 == 0).cast("long").alias("is_del"),
            (F.col("event_id") % 5 == 0).cast("long").alias("is_seq"),
        )
        .groupBy("relname", "snap_ts")
        .agg(
            F.count("*").alias("d_ins"),
            F.sum("is_upd").alias("d_upd"),
            F.sum("is_del").alias("d_del"),
            F.sum("is_seq").alias("d_seq"),
            (F.count("*") - F.sum("is_seq")).alias("d_idx"),
        )
    )
    w = Window.partitionBy("relname").orderBy("snap_ts")
    staged = hourly.select(
        "relname",
        "snap_ts",
        (F.col("d_upd") + F.col("d_del")).alias("d_dead"),
        F.sum("d_seq").over(w).alias("seq_scan"),
        F.sum("d_idx").over(w).alias("idx_scan"),
        F.sum("d_ins").over(w).alias("n_tup_ins"),
        F.sum("d_upd").over(w).alias("n_tup_upd"),
        F.sum("d_del").over(w).alias("n_tup_del"),
        (F.sum("d_ins").over(w) - F.sum("d_del").over(w)).alias("n_live_tup"),
        F.floor((F.row_number().over(w) - 1) / 6)
        .cast("long")
        .alias("vac_epoch"),
    )
    wv = Window.partitionBy("relname", "vac_epoch").orderBy("snap_ts")
    return staged.select(
        "snap_ts",
        "relname",
        "seq_scan",
        "idx_scan",
        "n_tup_ins",
        "n_tup_upd",
        "n_tup_del",
        "n_live_tup",
        F.sum("d_dead").over(wv).alias("n_dead_tup"),
        F.col("vac_epoch").alias("autovacuum_count"),
    )


USER_TABLES_SQL = """
WITH ut_hourly AS (
  SELECT 'tbl_' || CAST(user_id % 8 AS VARCHAR) AS relname,
         date_trunc('hour', ts) AS snap_ts,
         count(*) AS d_ins,
         sum(CASE WHEN event_id % 3 = 0 THEN 1 ELSE 0 END) AS d_upd,
         sum(CASE WHEN event_id % 7 = 0 THEN 1 ELSE 0 END) AS d_del,
         sum(CASE WHEN event_id % 5 = 0 THEN 1 ELSE 0 END) AS d_seq,
         count(*) - sum(CASE WHEN event_id % 5 = 0 THEN 1 ELSE 0 END) AS d_idx
  FROM {ev} GROUP BY 1, 2
),
ut_staged AS (
  SELECT relname, snap_ts, d_upd + d_del AS d_dead,
         CAST(sum(d_seq) OVER w AS BIGINT) AS seq_scan,
         CAST(sum(d_idx) OVER w AS BIGINT) AS idx_scan,
         CAST(sum(d_ins) OVER w AS BIGINT) AS n_tup_ins,
         CAST(sum(d_upd) OVER w AS BIGINT) AS n_tup_upd,
         CAST(sum(d_del) OVER w AS BIGINT) AS n_tup_del,
         CAST(sum(d_ins) OVER w - sum(d_del) OVER w AS BIGINT) AS n_live_tup,
         CAST(floor((row_number() OVER w - 1) / 6.0) AS BIGINT) AS vac_epoch
  FROM ut_hourly
  WINDOW w AS (PARTITION BY relname ORDER BY snap_ts)
)
SELECT snap_ts, relname, seq_scan, idx_scan, n_tup_ins, n_tup_upd,
       n_tup_del, n_live_tup,
       CAST(sum(d_dead) OVER (PARTITION BY relname, vac_epoch
                              ORDER BY snap_ts) AS BIGINT) AS n_dead_tup,
       vac_epoch AS autovacuum_count
FROM ut_staged
"""


def derive_user_indexes(events: DataFrame) -> DataFrame:
    """pg_stat_user_indexes snapshots: 16 indexes (user_id %% 16),
    two per table (idx %% 8 joins back to its relname), one row per
    (index, hour).  Scan traffic is tiered deterministically — busy
    (idx 0-7: every event scans), rare (idx 8-11: ~3%%, event_id %%
    29), and NEVER SCANNED (idx 12-15: flat counter) — so the
    unused-index report has true positives at every fixture scale.
    Cumulative idx_scan is an integer prefix sum per index."""
    hourly = (
        events.select(
            F.date_trunc("hour", "ts").alias("snap_ts"),
            F.concat(F.lit("idx_"), (F.col("user_id") % 16)).alias(
                "indexrelname"
            ),
            F.concat(F.lit("tbl_"), ((F.col("user_id") % 16) % 8)).alias(
                "relname"
            ),
            F.when(F.col("user_id") % 16 >= 12, F.lit(0))
            .when(
                F.col("user_id") % 16 >= 8,
                (F.col("event_id") % 29 == 0).cast("long"),
            )
            .otherwise(F.lit(1))
            .alias("is_scan"),
        )
        .groupBy("snap_ts", "indexrelname", "relname")
        .agg(F.sum("is_scan").alias("d_scan"))
    )
    w = Window.partitionBy("indexrelname").orderBy("snap_ts")
    return hourly.select(
        "snap_ts",
        "relname",
        "indexrelname",
        F.sum("d_scan").over(w).alias("idx_scan"),
    )


USER_INDEXES_SQL = """
WITH ui_hourly AS (
  SELECT date_trunc('hour', ts) AS snap_ts,
         'idx_' || CAST(user_id % 16 AS VARCHAR) AS indexrelname,
         'tbl_' || CAST((user_id % 16) % 8 AS VARCHAR) AS relname,
         sum(CASE WHEN user_id % 16 >= 12 THEN 0
                  WHEN user_id % 16 >= 8 THEN
                    CASE WHEN event_id % 29 = 0 THEN 1 ELSE 0 END
                  ELSE 1 END) AS d_scan
  FROM {ev} GROUP BY 1, 2, 3
)
SELECT snap_ts, relname, indexrelname,
       CAST(sum(d_scan) OVER (PARTITION BY indexrelname
                              ORDER BY snap_ts) AS BIGINT) AS idx_scan
FROM ui_hourly
"""


def derive_relation_size(events: DataFrame) -> DataFrame:
    """pg_total_relation_size sampled per tick: 8 tables, one row per
    (relname, hour); total_bytes = 8 KiB base + 128 B per inserted
    row + 64 B per floor(value*13) unit — a monotone integer gauge
    whose growth rate varies by table and hour, so growth-rate
    analytics have real signal.  All-integer prefix sums: exact."""
    hourly = (
        events.select(
            F.concat(F.lit("tbl_"), (F.col("user_id") % 8)).alias("relname"),
            F.date_trunc("hour", "ts").alias("snap_ts"),
            F.floor(F.col("value").cast("decimal(18,6)") * 13)
            .cast("long")
            .alias("v13"),
        )
        .groupBy("relname", "snap_ts")
        .agg(F.count("*").alias("d_rows"), F.sum("v13").alias("d_v"))
    )
    w = Window.partitionBy("relname").orderBy("snap_ts")
    return hourly.select(
        "snap_ts",
        "relname",
        (
            F.lit(8192)
            + F.lit(128) * F.sum("d_rows").over(w)
            + F.lit(64) * F.sum("d_v").over(w)
        )
        .cast("long")
        .alias("total_bytes"),
    )


RELATION_SIZE_SQL = """
WITH rs_hourly AS (
  SELECT 'tbl_' || CAST(user_id % 8 AS VARCHAR) AS relname,
         date_trunc('hour', ts) AS snap_ts,
         count(*) AS d_rows,
         sum(CAST(floor(CAST(value AS DECIMAL(18,6)) * 13) AS BIGINT)) AS d_v
  FROM {ev} GROUP BY 1, 2
)
SELECT snap_ts, relname,
       CAST(8192 + 128 * sum(d_rows) OVER w
                 + 64 * sum(d_v) OVER w AS BIGINT) AS total_bytes
FROM rs_hourly
WINDOW w AS (PARTITION BY relname ORDER BY snap_ts)
"""


#: WAL bytes wrap count — the counter wraps this many times over the
#: fixture's 720-hour span AT EVERY SCALE, because the wrap LEVEL is
#: derived from the data itself (total cumulative bytes / count + 1)
#: rather than fixed.  A fixed 5 MB level (rounds ≤11) wrapped ~6×
#: at sf0.01 but 8+ FULL times BETWEEN consecutive hourly snapshots
#: at sf10 (≈40 MB/hour there), producing positive-but-wrapped deltas
#: that silently bypassed the negative-delta reset guard in every
#: downstream rollup (ADVICE r11).  Deriving the level keeps the two
#: invariants the guard needs at any sf: (a) ~_WAL_WRAP_COUNT resets
#: over the span, (b) max inter-snapshot delta (≈ total/720) is two
#: orders of magnitude below the level (≈ total/6) — multi-wrap
#: between snapshots is impossible by construction.
_WAL_WRAP_COUNT = 6

_BACKEND_TYPES = (
    "client backend",
    "autovacuum worker",
    "checkpointer",
    "background writer",
)


def derive_stat_io(events: DataFrame) -> DataFrame:
    """pg_stat_io snapshots: series key = (backend_type, io_context) —
    4 backend classes (user_id %% 4) x 2 contexts (every 6th event is
    'vacuum' I/O).  Hourly deltas are all-integer (floor of the
    decimal value, event counts, an 1/11 extend residue); cumulative
    counters are integer prefix sums per series.  Mirrors the PG16
    view trimmed to its load-bearing counters."""
    bt = F.element_at(
        F.array(*[F.lit(b) for b in _BACKEND_TYPES]),
        (F.col("user_id") % 4 + 1).cast("int"),
    )
    hourly = (
        events.select(
            F.date_trunc("hour", "ts").alias("snap_ts"),
            bt.alias("backend_type"),
            F.when(F.col("event_id") % 6 == 0, "vacuum")
            .otherwise("normal")
            .alias("io_context"),
            F.floor(F.col("value").cast("decimal(18,6)") * 5)
            .cast("long")
            .alias("v5"),
            (F.col("event_id") % 11 == 0).cast("long").alias("is_ext"),
        )
        .groupBy("snap_ts", "backend_type", "io_context")
        .agg(
            F.sum("v5").alias("d_reads"),
            F.count("*").alias("d_writes"),
            F.sum("is_ext").alias("d_ext"),
        )
    )
    w = Window.partitionBy("backend_type", "io_context").orderBy("snap_ts")
    return hourly.select(
        "snap_ts",
        "backend_type",
        "io_context",
        F.sum("d_reads").over(w).alias("reads"),
        F.sum("d_writes").over(w).alias("writes"),
        F.sum("d_ext").over(w).alias("extends"),
    )


STAT_IO_SQL = """
WITH io_hourly AS (
  SELECT date_trunc('hour', ts) AS snap_ts,
         (['client backend', 'autovacuum worker', 'checkpointer',
           'background writer'])[CAST(user_id % 4 + 1 AS INTEGER)]
           AS backend_type,
         CASE WHEN event_id % 6 = 0 THEN 'vacuum' ELSE 'normal' END
           AS io_context,
         sum(CAST(floor(CAST(value AS DECIMAL(18,6)) * 5) AS BIGINT))
           AS d_reads,
         count(*) AS d_writes,
         sum(CASE WHEN event_id % 11 = 0 THEN 1 ELSE 0 END) AS d_ext
  FROM {ev} GROUP BY 1, 2, 3
)
SELECT snap_ts, backend_type, io_context,
       CAST(sum(d_reads) OVER w AS BIGINT) AS reads,
       CAST(sum(d_writes) OVER w AS BIGINT) AS writes,
       CAST(sum(d_ext) OVER w AS BIGINT) AS extends
FROM io_hourly
WINDOW w AS (PARTITION BY backend_type, io_context ORDER BY snap_ts)
"""


def derive_stat_wal(events: DataFrame) -> DataFrame:
    """pg_stat_wal snapshots: ONE global cumulative series, one row
    per hour.  wal_records counts events; wal_bytes models 128 B of
    record header plus 8 B per floor(value*7) unit and WRAPS modulo a
    DATA-DERIVED level — total cumulative bytes / ``_WAL_WRAP_COUNT``
    + 1, a full-frame window both engines compute identically — so
    synthetic restarts happen ~6 times over the span at every fixture
    scale and never more than once between consecutive snapshots
    (downstream rollups must apply the §0.1 counter-reset rule);
    wal_buffers_full accumulates a 1/13 residue.  Single-series
    window is the view's real shape (pg_stat_wal IS one row), same
    rationale as derive_bgwriter."""
    hourly = (
        events.select(
            F.date_trunc("hour", "ts").alias("snap_ts"),
            F.floor(F.col("value").cast("decimal(18,6)") * 7)
            .cast("long")
            .alias("v7"),
            (F.col("event_id") % 13 == 0).cast("long").alias("is_full"),
        )
        .groupBy("snap_ts")
        .agg(
            F.count("*").alias("d_recs"),
            F.sum("v7").alias("d_v7"),
            F.sum("is_full").alias("d_full"),
        )
    )
    w = Window.orderBy("snap_ts")
    wall = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum_bytes = (
        F.lit(128) * F.sum("d_recs").over(w) + F.lit(8) * F.sum("d_v7").over(w)
    )
    total_bytes = (
        F.lit(128) * F.sum("d_recs").over(wall)
        + F.lit(8) * F.sum("d_v7").over(wall)
    )
    wrap = F.floor(total_bytes / _WAL_WRAP_COUNT).cast("long") + F.lit(1)
    return hourly.select(
        "snap_ts",
        F.sum("d_recs").over(w).alias("wal_records"),
        (cum_bytes % wrap).alias("wal_bytes"),
        F.sum("d_full").over(w).alias("wal_buffers_full"),
    )


STAT_WAL_SQL = f"""
WITH wal_hourly AS (
  SELECT date_trunc('hour', ts) AS snap_ts,
         count(*) AS d_recs,
         sum(CAST(floor(CAST(value AS DECIMAL(18,6)) * 7) AS BIGINT)) AS d_v7,
         sum(CASE WHEN event_id % 13 = 0 THEN 1 ELSE 0 END) AS d_full
  FROM {{ev}} GROUP BY 1
)
SELECT snap_ts,
       CAST(sum(d_recs) OVER w AS BIGINT) AS wal_records,
       CAST((128 * sum(d_recs) OVER w + 8 * sum(d_v7) OVER w)
            % (CAST(floor((128 * sum(d_recs) OVER ()
                           + 8 * sum(d_v7) OVER ())
                          / {_WAL_WRAP_COUNT}) AS BIGINT) + 1)
            AS BIGINT) AS wal_bytes,
       CAST(sum(d_full) OVER w AS BIGINT) AS wal_buffers_full
FROM wal_hourly
WINDOW w AS (ORDER BY snap_ts)
"""


def derive_stat_archiver(events: DataFrame) -> DataFrame:
    """pg_stat_archiver snapshots: one global cumulative row per hour
    — archived_count counts every 2nd event's WAL segment, failed
    attempts every 17th (a deterministic ~6%% failure pressure so the
    success-ratio rollup never degenerates to a constant 1.0)."""
    hourly = (
        events.select(
            F.date_trunc("hour", "ts").alias("snap_ts"),
            (F.col("event_id") % 2 == 0).cast("long").alias("is_arch"),
            (F.col("event_id") % 17 == 0).cast("long").alias("is_fail"),
        )
        .groupBy("snap_ts")
        .agg(
            F.sum("is_arch").alias("d_arch"),
            F.sum("is_fail").alias("d_fail"),
        )
    )
    w = Window.orderBy("snap_ts")
    return hourly.select(
        "snap_ts",
        F.sum("d_arch").over(w).alias("archived_count"),
        F.sum("d_fail").over(w).alias("failed_count"),
    )


STAT_ARCHIVER_SQL = """
WITH arch_hourly AS (
  SELECT date_trunc('hour', ts) AS snap_ts,
         sum(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END) AS d_arch,
         sum(CASE WHEN event_id % 17 = 0 THEN 1 ELSE 0 END) AS d_fail
  FROM {ev} GROUP BY 1
)
SELECT snap_ts,
       CAST(sum(d_arch) OVER w AS BIGINT) AS archived_count,
       CAST(sum(d_fail) OVER w AS BIGINT) AS failed_count
FROM arch_hourly
WINDOW w AS (ORDER BY snap_ts)
"""


def derive_statio_user_tables(events: DataFrame) -> DataFrame:
    """pg_statio_user_tables snapshots: the same 8 tables as
    pg_stat_user_tables (user_id %% 8), one row per (relname, hour);
    heap/index block reads and hits are all-integer prefix sums with
    hit multipliers ~10x the read ones, so the derived per-table hit
    ratios land in the realistic ~0.9 band and VARY by table load
    instead of pinning to a constant."""
    hourly = (
        events.select(
            F.concat(F.lit("tbl_"), (F.col("user_id") % 8)).alias("relname"),
            F.date_trunc("hour", "ts").alias("snap_ts"),
            F.floor(F.col("value").cast("decimal(18,6)") * 3)
            .cast("long")
            .alias("hr"),
            F.floor(F.col("value").cast("decimal(18,6)") * 29)
            .cast("long")
            .alias("hh"),
            F.floor(F.col("value").cast("decimal(18,6)") * 2)
            .cast("long")
            .alias("ir"),
            F.floor(F.col("value").cast("decimal(18,6)") * 23)
            .cast("long")
            .alias("ih"),
        )
        .groupBy("relname", "snap_ts")
        .agg(
            F.sum("hr").alias("d_hr"),
            F.sum("hh").alias("d_hh"),
            F.sum("ir").alias("d_ir"),
            F.sum("ih").alias("d_ih"),
        )
    )
    w = Window.partitionBy("relname").orderBy("snap_ts")
    return hourly.select(
        "snap_ts",
        "relname",
        F.sum("d_hr").over(w).alias("heap_blks_read"),
        F.sum("d_hh").over(w).alias("heap_blks_hit"),
        F.sum("d_ir").over(w).alias("idx_blks_read"),
        F.sum("d_ih").over(w).alias("idx_blks_hit"),
    )


STATIO_USER_TABLES_SQL = """
WITH sio_hourly AS (
  SELECT 'tbl_' || CAST(user_id % 8 AS VARCHAR) AS relname,
         date_trunc('hour', ts) AS snap_ts,
         sum(CAST(floor(CAST(value AS DECIMAL(18,6)) * 3) AS BIGINT)) AS d_hr,
         sum(CAST(floor(CAST(value AS DECIMAL(18,6)) * 29) AS BIGINT)) AS d_hh,
         sum(CAST(floor(CAST(value AS DECIMAL(18,6)) * 2) AS BIGINT)) AS d_ir,
         sum(CAST(floor(CAST(value AS DECIMAL(18,6)) * 23) AS BIGINT)) AS d_ih
  FROM {ev} GROUP BY 1, 2
)
SELECT snap_ts, relname,
       CAST(sum(d_hr) OVER w AS BIGINT) AS heap_blks_read,
       CAST(sum(d_hh) OVER w AS BIGINT) AS heap_blks_hit,
       CAST(sum(d_ir) OVER w AS BIGINT) AS idx_blks_read,
       CAST(sum(d_ih) OVER w AS BIGINT) AS idx_blks_hit
FROM sio_hourly
WINDOW w AS (PARTITION BY relname ORDER BY snap_ts)
"""


DERIVATIONS = {
    "pg_stat_statements": derive_stat_statements,
    "pg_locks": derive_locks,
    "pg_stat_bgwriter": derive_bgwriter,
    "pg_stat_replication": derive_replication,
    "pg_stat_database": derive_stat_database,
    "pg_stat_activity": derive_stat_activity,
    "pg_stat_user_tables": derive_user_tables,
    "pg_stat_user_indexes": derive_user_indexes,
    "pg_relation_size": derive_relation_size,
    "pg_stat_io": derive_stat_io,
    "pg_stat_wal": derive_stat_wal,
    "pg_stat_archiver": derive_stat_archiver,
    "pg_statio_user_tables": derive_statio_user_tables,
}
