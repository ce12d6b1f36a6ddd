"""I/O- and WAL-side stat-view analytics (§0.1 server-health board).

Rounds 10-11 typed the statement/lock/bgwriter/replication/database/
activity and per-relation views; this module closes the remaining
server-level I/O surface a ``pg_telemetry``-class collector ships:

- pg_stat_io (PG16)      -> per-backend-class I/O attribution;
- pg_stat_wal (PG14)     -> WAL generation rate (reset-guarded: the
  synthetic wal_bytes counter WRAPS, so the §0.1 counter-reset rule
  is load-bearing here, not decorative);
- pg_stat_archiver       -> archive throughput + failure ratio;
- pg_statio_user_tables  -> per-TABLE buffer-cache hit split
  (pg_stat_database's blks_hit/read is only the per-DB aggregate).

All tier A: each derivation is written twice (DataFrame in
statviews.py, ANSI SQL mirror) so every rollup hash-matches DuckDB at
sf0.01/0.1/1.  Scale: snapshots are tick-granular (rows = series x
ticks, never raw events), and every op is one per-series lag window
plus one groupBy riding the same series hash partitioning; the two
single-series views (wal, archiver) put all ticks in one window
partition because that IS the view's shape — one row per snapshot.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from pg_telemetry_spark.queries.relational import EVENTS_V
from pg_telemetry_spark.registry import query
from pg_telemetry_spark.statviews import (
    STAT_ARCHIVER_SQL,
    STAT_IO_SQL,
    STAT_WAL_SQL,
    STATIO_USER_TABLES_SQL,
    derive_stat_archiver,
    derive_stat_io,
    derive_stat_wal,
    derive_statio_user_tables,
)
from pg_telemetry_spark.tables import load_table

_IO = STAT_IO_SQL.format(ev=EVENTS_V)
_WAL = STAT_WAL_SQL.format(ev=EVENTS_V)
_ARCH = STAT_ARCHIVER_SQL.format(ev=EVENTS_V)
_SIO = STATIO_USER_TABLES_SQL.format(ev=EVENTS_V)


@query(
    "pgw_io_by_backend",
    group="collector",
    oracle=f"""
WITH snaps AS ({_IO}),
deltas AS (
  SELECT CAST(snap_ts AS DATE) AS day, backend_type,
         reads - lag(reads) OVER w AS d_reads,
         writes - lag(writes) OVER w AS d_writes,
         extends - lag(extends) OVER w AS d_ext
  FROM snaps
  WINDOW w AS (PARTITION BY backend_type, io_context ORDER BY snap_ts)
)
SELECT day, backend_type,
       CAST(sum(d_reads) AS BIGINT) AS reads_inc,
       CAST(sum(d_writes) AS BIGINT) AS writes_inc,
       CAST(sum(d_ext) AS BIGINT) AS extends_inc,
       round(CAST(sum(d_reads) AS DOUBLE)
             / (sum(d_reads) + sum(d_writes)), 6) AS read_share
FROM deltas WHERE d_reads IS NOT NULL
GROUP BY day, backend_type
ORDER BY day, backend_type
""",
)
def pgw_io_by_backend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-backend-class I/O attribution from pg_stat_io: per (day,
    backend_type) the increase() of reads/writes/extends summed over
    both io_contexts, plus the read share — the chart that answers
    "is autovacuum or client traffic driving today's I/O".  Counters
    are monotone by construction so the plain-delta sum is exact; the
    lag window partitions on the FULL series key (backend_type,
    io_context) and the groupBy then folds contexts together.  One
    window + one groupBy over the tick-granular snapshot table."""
    snaps = derive_stat_io(load_table(spark, sf_dir, "events"))
    w = Window.partitionBy("backend_type", "io_context").orderBy("snap_ts")
    deltas = snaps.select(
        F.col("snap_ts").cast("date").alias("day"),
        "backend_type",
        (F.col("reads") - F.lag("reads").over(w)).alias("d_reads"),
        (F.col("writes") - F.lag("writes").over(w)).alias("d_writes"),
        (F.col("extends") - F.lag("extends").over(w)).alias("d_ext"),
    ).filter(F.col("d_reads").isNotNull())
    return (
        deltas.groupBy("day", "backend_type")
        .agg(
            F.sum("d_reads").cast("bigint").alias("reads_inc"),
            F.sum("d_writes").cast("bigint").alias("writes_inc"),
            F.sum("d_ext").cast("bigint").alias("extends_inc"),
            F.round(
                F.sum("d_reads").cast("double")
                / (F.sum("d_reads") + F.sum("d_writes")),
                6,
            ).alias("read_share"),
        )
        .orderBy("day", "backend_type")
    )


@query(
    "pgw_wal_rate",
    group="collector",
    oracle=f"""
WITH snaps AS ({_WAL}),
deltas AS (
  SELECT CAST(snap_ts AS DATE) AS day,
         wal_records - lag(wal_records) OVER w AS d_recs,
         wal_bytes - lag(wal_bytes) OVER w AS d_bytes, wal_bytes,
         wal_buffers_full - lag(wal_buffers_full) OVER w AS d_full
  FROM snaps
  WINDOW w AS (ORDER BY snap_ts)
)
SELECT day,
       CAST(sum(d_recs) AS BIGINT) AS records_inc,
       CAST(sum(CASE WHEN d_bytes < 0 THEN wal_bytes
                     ELSE d_bytes END) AS BIGINT) AS bytes_inc,
       CAST(sum(d_full) AS BIGINT) AS buffers_full_inc,
       round(CAST(sum(CASE WHEN d_bytes < 0 THEN wal_bytes
                           ELSE d_bytes END) AS DOUBLE)
             / sum(d_recs), 6) AS bytes_per_record
FROM deltas WHERE d_recs IS NOT NULL
GROUP BY day
ORDER BY day
""",
)
def pgw_wal_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WAL generation rate from pg_stat_wal: per day the increase()
    of records/bytes/buffers_full and the mean bytes-per-record.  The
    synthetic wal_bytes counter WRAPS ~6 times over the span at EVERY
    scale (statviews._WAL_WRAP_COUNT derives the wrap level from the
    data — total/6 — so the max inter-snapshot delta, ~total/720,
    can never multi-wrap between snapshots), so the bytes increase
    applies the §0.1 counter-reset rule — negative delta means
    restart, contribute the post-reset level — and a rollup that
    forgot the guard would hash-mismatch at every scale;
    tests/test_statviews_wal.py pins that the reset branch actually
    fires per fixture scale.
    Single-series lag window (the view IS one row per snapshot; ticks
    number in the hundreds, not the billions) + one day groupBy."""
    snaps = derive_stat_wal(load_table(spark, sf_dir, "events"))
    w = Window.orderBy("snap_ts")
    deltas = snaps.select(
        F.col("snap_ts").cast("date").alias("day"),
        (F.col("wal_records") - F.lag("wal_records").over(w)).alias("d_recs"),
        (F.col("wal_bytes") - F.lag("wal_bytes").over(w)).alias("d_bytes"),
        "wal_bytes",
        (
            F.col("wal_buffers_full") - F.lag("wal_buffers_full").over(w)
        ).alias("d_full"),
    ).filter(F.col("d_recs").isNotNull())
    bytes_inc = F.sum(
        F.when(F.col("d_bytes") < 0, F.col("wal_bytes")).otherwise(
            F.col("d_bytes")
        )
    )
    return (
        deltas.groupBy("day")
        .agg(
            F.sum("d_recs").cast("bigint").alias("records_inc"),
            bytes_inc.cast("bigint").alias("bytes_inc"),
            F.sum("d_full").cast("bigint").alias("buffers_full_inc"),
            F.round(
                bytes_inc.cast("double") / F.sum("d_recs"), 6
            ).alias("bytes_per_record"),
        )
        .orderBy("day")
    )


@query(
    "pgw_archiver_health",
    group="collector",
    oracle=f"""
WITH snaps AS ({_ARCH}),
deltas AS (
  SELECT CAST(snap_ts AS DATE) AS day,
         archived_count - lag(archived_count) OVER w AS d_arch,
         failed_count - lag(failed_count) OVER w AS d_fail
  FROM snaps
  WINDOW w AS (ORDER BY snap_ts)
)
SELECT day,
       CAST(sum(d_arch) AS BIGINT) AS archived_inc,
       CAST(sum(d_fail) AS BIGINT) AS failed_inc,
       round(CAST(sum(d_arch) AS DOUBLE)
             / (sum(d_arch) + sum(d_fail)), 6) AS success_ratio
FROM deltas WHERE d_arch IS NOT NULL
GROUP BY day
ORDER BY day
""",
)
def pgw_archiver_health(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Archiver health from pg_stat_archiver: per day the increase()
    of archived/failed counters and the archive success ratio — the
    panel that pages when WAL segments stop shipping.  The derivation
    plants a deterministic ~6% failure pressure so the ratio varies
    instead of pinning at 1.0.  Monotone counters, plain-delta sums;
    single-series lag window + one day groupBy."""
    snaps = derive_stat_archiver(load_table(spark, sf_dir, "events"))
    w = Window.orderBy("snap_ts")
    deltas = snaps.select(
        F.col("snap_ts").cast("date").alias("day"),
        (
            F.col("archived_count") - F.lag("archived_count").over(w)
        ).alias("d_arch"),
        (F.col("failed_count") - F.lag("failed_count").over(w)).alias(
            "d_fail"
        ),
    ).filter(F.col("d_arch").isNotNull())
    return (
        deltas.groupBy("day")
        .agg(
            F.sum("d_arch").cast("bigint").alias("archived_inc"),
            F.sum("d_fail").cast("bigint").alias("failed_inc"),
            F.round(
                F.sum("d_arch").cast("double")
                / (F.sum("d_arch") + F.sum("d_fail")),
                6,
            ).alias("success_ratio"),
        )
        .orderBy("day")
    )


@query(
    "pgw_statio_hit_by_table",
    group="collector",
    oracle=f"""
WITH snaps AS ({_SIO}),
deltas AS (
  SELECT CAST(snap_ts AS DATE) AS day, relname,
         heap_blks_read - lag(heap_blks_read) OVER w AS d_hr,
         heap_blks_hit - lag(heap_blks_hit) OVER w AS d_hh,
         idx_blks_read - lag(idx_blks_read) OVER w AS d_ir,
         idx_blks_hit - lag(idx_blks_hit) OVER w AS d_ih
  FROM snaps
  WINDOW w AS (PARTITION BY relname ORDER BY snap_ts)
)
SELECT day, relname,
       CAST(sum(d_hr) + sum(d_hh) AS BIGINT) AS heap_blks_inc,
       round(CAST(sum(d_hh) AS DOUBLE)
             / (sum(d_hr) + sum(d_hh)), 6) AS heap_hit_ratio,
       CAST(sum(d_ir) + sum(d_ih) AS BIGINT) AS idx_blks_inc,
       round(CAST(sum(d_ih) AS DOUBLE)
             / (sum(d_ir) + sum(d_ih)), 6) AS idx_hit_ratio
FROM deltas WHERE d_hr IS NOT NULL
GROUP BY day, relname
ORDER BY day, relname
""",
)
def pgw_statio_hit_by_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-table buffer-cache hit split from pg_statio_user_tables:
    per (day, table) the heap and index block increases and their hit
    ratios — the drill-down a DBA runs when pg_stat_database's per-DB
    hit ratio dips and the question becomes WHICH table is churning
    the cache.  Monotone counters, plain-delta sums; one per-relname
    lag window + one (day, relname) groupBy, the same shape as every
    per-relation rollup in relstat_views.py."""
    snaps = derive_statio_user_tables(load_table(spark, sf_dir, "events"))
    w = Window.partitionBy("relname").orderBy("snap_ts")
    deltas = snaps.select(
        F.col("snap_ts").cast("date").alias("day"),
        "relname",
        (
            F.col("heap_blks_read") - F.lag("heap_blks_read").over(w)
        ).alias("d_hr"),
        (F.col("heap_blks_hit") - F.lag("heap_blks_hit").over(w)).alias(
            "d_hh"
        ),
        (F.col("idx_blks_read") - F.lag("idx_blks_read").over(w)).alias(
            "d_ir"
        ),
        (F.col("idx_blks_hit") - F.lag("idx_blks_hit").over(w)).alias(
            "d_ih"
        ),
    ).filter(F.col("d_hr").isNotNull())
    return (
        deltas.groupBy("day", "relname")
        .agg(
            (F.sum("d_hr") + F.sum("d_hh"))
            .cast("bigint")
            .alias("heap_blks_inc"),
            F.round(
                F.sum("d_hh").cast("double")
                / (F.sum("d_hr") + F.sum("d_hh")),
                6,
            ).alias("heap_hit_ratio"),
            (F.sum("d_ir") + F.sum("d_ih"))
            .cast("bigint")
            .alias("idx_blks_inc"),
            F.round(
                F.sum("d_ih").cast("double")
                / (F.sum("d_ir") + F.sum("d_ih")),
                6,
            ).alias("idx_hit_ratio"),
        )
        .orderBy("day", "relname")
    )
