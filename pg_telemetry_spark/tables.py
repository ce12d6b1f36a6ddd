"""Fixture table loaders with explicit schemas.

Fixed, explicit ``StructType`` per table (schemas from FIXTURES.md —
the collector domain has fixed schemas per stat view, and explicit
schemas keep scans honest: ReadSchema in ``explain`` shows exactly the
pruned columns, and no inference job runs at 100 TB).

``events.ts`` is UNIT-AWARE: real-world parquet arrives as
TIMESTAMP(MICROS), TIMESTAMP(MILLIS), TIMESTAMP(NANOS), or INT96
depending on the writer, and the fixture generator has shipped both
NANOS (rounds 1-3) and MICROS (round 4+).  The loader inspects the
parquet footer once per path (driver-side, cached) and branches:

- MICROS / MILLIS / INT96 — Spark reads the logical type natively as
  ``timestamp_ntz``; no conversion, and timestamp predicates push all
  the way to row-group stats.
- NANOS — Spark 4 refuses the type by default; with
  ``spark.sql.legacy.parquet.nanosAsLong=true`` it arrives as a
  nanosecond ``long`` and is converted via ``timestamp_micros(ts div
  1000)`` — verified to equal DuckDB's native read of the same column.

Both paths land on ``timestamp_ntz`` so downstream queries are
unit-agnostic.  ``tests/test_fixture_ingest.py`` pins this seam
against DuckDB for every sf dir present AND for synthetically written
nanos/micros files, so a fixture-unit change can never silently skew
results again (round-4 postmortem: a hard-coded ÷1000 turned 30 days
of MICROS events into 43 minutes of 1970).
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from pg_telemetry_spark.session import app_id, default_parallelism, prepare_session

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

_NTZ = T.TimestampNTZType()

SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", _NTZ),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", _NTZ),
        ]
    ),
    # Logical schema — ts is timestamp_ntz after unit-aware loading.
    # (The NANOS physical variant is read with _EVENTS_RAW_NANOS below.)
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", _NTZ),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}


#: Session-lifetime table cache, keyed on (applicationId, sf_dir, name).
#:
#: The driver's correctness sweep runs 130+ registered queries against
#: the SAME ten small fixture tables in one session — re-reading and
#: re-decoding the same parquet per query dominates the sweep cost at
#: sf0.01.  Caching each base table once (persist MEMORY_AND_DISK,
#: materialized lazily on first use) amortizes that across the sweep.
#:
#: This is explicitly a FIXTURE-SWEEP amortization, not the 100 TB
#: posture: persisting a full table defeats parquet filter pushdown
#: and column pruning at the scan, which is the wrong trade the moment
#: a table no longer fits the cluster's storage memory and each query
#: touches a slice of it.  At warehouse scale the engine reads through
#: the catalog with pushdown (see ``load_events_sliced`` and
#: PLANS.md's pushed-scan audit, both of which bypass this cache).
#: Disable with PG_TELEMETRY_SPARK_NO_TABLE_CACHE=1 (plan-shape tests
#: and tools/gen_plans.py do, so the audited plans stay the cold-path
#: pushdown plans).
_TABLE_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def _cache_enabled() -> bool:
    return os.environ.get("PG_TELEMETRY_SPARK_NO_TABLE_CACHE", "") != "1"


#: Tables whose cached relation is round-robin-rebalanced to the
#: session's parallelism (see the comment at the rebalance site).
#: ONLY tables with no order-dependent double accumulation feeding a
#: hashed oracle result may be listed.  The hidden invariant that
#: makes everything else hash-match bit-exactly is that a single-row-
#: group file is summed in FILE ORDER by both engines (one loaded
#: Spark split == DuckDB's sequential scan); re-ordering a PLAIN
#: double sum/avg shifts low-order bits — measured: rebalancing
#: lineitem flipped agg_cube(*)/wl_q1_pricing_summary, and rebalancing
#: events flipped agg_cube (plain round(avg(value),6)) at sf0.001.
#: The events ``value`` sums that go through queries/detsum.py are
#: order-independent by design, but not all do, so events stays out.
#: documents/embeddings pipelines aggregate integers, hashes, exact
#: rationals and per-row scalars — verified across the full sweep.
_REBALANCE_ON_CACHE = frozenset({"documents", "embeddings"})


def _cache_rebalance_width(spark: SparkSession, path: str) -> int:
    """Width of the one-time cached-relation rebalance, derived from
    the table's on-disk parquet size (a driver-side ``stat`` — never a
    Spark job): one partition per ~64 MB of parquet, floored at the
    measured local optimum (8; the r16 width sweep showed 8 dominates
    both the CPU-heavy kernels and the sub-second consumers at fixture
    scale) and clamped to ``default_parallelism`` so a narrow session
    (e.g. local[2]) is never over-partitioned.  Non-posix paths (the
    fixture cache is local-disk only) fall back to the floor."""
    try:
        if os.path.isdir(path):
            nbytes = sum(
                os.path.getsize(os.path.join(r, f))
                for r, _dirs, fs in os.walk(path)
                for f in fs
            )
        else:
            nbytes = os.path.getsize(path)
    except OSError:
        nbytes = 0
    per_partition = 64 * 1024 * 1024
    return min(
        default_parallelism(spark), max(8, -(-nbytes // per_partition))
    )


def clear_table_cache() -> None:
    """Unpersist and forget every cached table (test hook)."""
    for df in _TABLE_CACHE.values():
        try:
            df.unpersist()
        except Exception:
            pass  # session already stopped
    _TABLE_CACHE.clear()
    # A fixture regenerated in-process at the same path may have a
    # different timestamp unit — forget the probed units too.
    _TS_UNIT_CACHE.clear()


#: Raw read schema for the TIMESTAMP(NANOS) physical variant: under
#: spark.sql.legacy.parquet.nanosAsLong the column arrives as int64.
_EVENTS_RAW_NANOS = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

#: path -> 'ns' | 'us' | 'ms' | 's' (footer inspected once per path).
_TS_UNIT_CACHE: dict[str, str] = {}


def events_ts_unit(path: str) -> str:
    """Timestamp unit of ``ts`` in the parquet file(s) at ``path``.

    One driver-side footer read (cached) — never a Spark job.  INT96
    columns (legacy Hive/Impala writers) decode through pyarrow as
    nanoseconds but Spark reads them natively as timestamps, so they
    are reported as 'us' (the native-read branch).  Directories are
    probed via their first data file — a mixed-unit directory is a
    writer bug upstream of us.
    """
    unit = _TS_UNIT_CACHE.get(path)
    if unit is not None:
        return unit
    import pyarrow.parquet as pq

    probe = path
    if os.path.isdir(path):
        probe = None
        for entry in sorted(os.listdir(path)):
            if entry.endswith(".parquet"):
                probe = os.path.join(path, entry)
                break
        if probe is None:
            raise FileNotFoundError(f"no .parquet data file under directory {path!r}")
    pf = pq.ParquetFile(probe)
    idx = pf.schema_arrow.get_field_index("ts")
    if idx < 0:
        raise ValueError(f"parquet file {probe!r} has no 'ts' column; cannot probe unit")
    # The physical (leaf) schema is a FLATTENED list that diverges from
    # the Arrow top-level field order once any nested column exists, so
    # resolve the leaf by path, never by reusing the Arrow index.
    leaf = next(
        (
            pf.schema.column(i)
            for i in range(len(pf.schema))
            if pf.schema.column(i).path == "ts"
        ),
        None,
    )
    if leaf is not None and leaf.physical_type == "INT96":
        unit = "us"  # Spark decodes INT96 natively
    else:
        unit = pf.schema_arrow.field(idx).type.unit
    _TS_UNIT_CACHE[path] = unit
    return unit


def _read_events_raw(spark: SparkSession, path: str) -> tuple[DataFrame, str]:
    """Events scan WITHOUT the ts conversion applied.

    Returns ``(df, unit)``: for 'ns' the ``ts`` column is still the
    raw int64 (filterable with pushdown in the nanos domain); for
    every other unit it is already a native ``timestamp_ntz``.
    """
    unit = events_ts_unit(path)
    if unit == "ns":
        return spark.read.schema(_EVENTS_RAW_NANOS).parquet(path), unit
    return spark.read.schema(SCHEMAS["events"]).parquet(path), unit


def _read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        df, unit = _read_events_raw(spark, f"{sf_dir}/events.parquet")
        if unit == "ns":
            df = df.withColumn(
                "ts",
                F.timestamp_micros(F.expr("ts div 1000")).cast(_NTZ),
            )
        return df
    return spark.read.schema(SCHEMAS[name]).parquet(f"{sf_dir}/{name}.parquet")


def load_table(
    spark: SparkSession, sf_dir: str, name: str, cache: bool | None = None
) -> DataFrame:
    """Load one fixture table with its explicit schema.

    ``cache=None`` (default) follows the env toggle; ``cache=False``
    forces the direct pushdown-friendly read (plan audits).
    """
    prepare_session(spark)
    if cache is None:
        cache = _cache_enabled()
    if not cache:
        return _read_table(spark, sf_dir, name)
    key = (app_id(spark), sf_dir, name)
    df = _TABLE_CACHE.get(key)
    if df is None:
        df = _read_table(spark, sf_dir, name)
        if name in _REBALANCE_ON_CACHE:
            # Rebalance BEFORE persist (optimization r16, guide §2.5
            # "one huge unsplittable file"): each fixture table is a
            # single parquet file with ONE row group, so however many
            # splits the scan plans, every row lands in the split
            # covering the row group's midpoint — measured: lineitem
            # sf0.1 scans as 3 planned / 1 loaded partition, and the
            # cache then serializes every downstream narrow op
            # (shingling, tokenizing, t-digest) onto one core.  A
            # one-time round-robin repartition to an 8-way-capped
            # width makes the cached relation evenly consumable
            # (measured solo at sf0.1: llm_dup_substrings 5.0→1.4 s,
            # llm_mmr_diversify 4.0→1.8 s).  The cap is measured, not
            # guessed: a full-parallelism (32) rebalance taxed every
            # sub-second consumer ~0.2-1.3 s of per-task overhead
            # (width sweep none/8/32: llm_lm_filter 1.6/1.5/2.8 s,
            # llm_zipf_heaps 0.7/0.7/1.2 s) while the CPU-heavy
            # kernels saturate by 8-way at fixture volume
            # (llm_dup_substrings 2.4/1.4/1.8 s).  Cache-on is the
            # fixture-sweep path only (see the _TABLE_CACHE note);
            # the cold path below stays byte-identical so pushdown
            # plans and their audits are untouched.  r17 (ADVICE r16
            # #2): the width is derived from the table's on-disk
            # size, so a warehouse-scale table cached through this
            # path spreads ~64 MB per partition up to the cluster
            # width instead of being squeezed into a constant 8; at
            # fixture scale (sub-MB files) the derived width IS the
            # measured-optimal 8.
            df = df.repartition(
                _cache_rebalance_width(spark, f"{sf_dir}/{name}.parquet")
            )
        df = df.persist()
        _TABLE_CACHE[key] = df
    return df


def load_events_sliced(
    spark: SparkSession, sf_dir: str, lo: str | None = None, hi: str | None = None
) -> DataFrame:
    """Events time-slice with REAL predicate pushdown.

    Bounds must be applied in the SAME domain as the stored column or
    Parquet row-group/page pruning never fires (and in the worst case
    — wrong unit — the filter silently selects nothing).  Unit-aware:

    - native timestamp units (us/ms): ``ts`` is a real timestamp
      column, so plain timestamp literals push down to row-group
      min/max stats directly;
    - NANOS (read as raw int64 under nanosAsLong): bounds are rewritten
      into nanosecond-long space and applied BEFORE the conversion, so
      they push down as long comparisons.

    Either way this is the difference between reading one hour and
    scanning everything at 100 TB.  (``lo``/``hi`` are
    'YYYY-MM-DD[ HH:MM:SS]' UTC strings, half-open interval.)
    """
    import datetime as dt

    prepare_session(spark)
    df, unit = _read_events_raw(spark, f"{sf_dir}/events.parquet")

    def parse(s: str) -> dt.datetime:
        fmt = "%Y-%m-%d %H:%M:%S" if " " in s else "%Y-%m-%d"
        return dt.datetime.strptime(s, fmt)

    if unit == "ns":

        def nanos(s: str) -> int:
            epoch = parse(s).replace(tzinfo=dt.timezone.utc).timestamp()
            return int(epoch) * 1_000_000_000

        if lo is not None:
            df = df.filter(F.col("ts") >= nanos(lo))
        if hi is not None:
            df = df.filter(F.col("ts") < nanos(hi))
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")).cast(_NTZ))

    # String -> timestamp_ntz cast parses the wall-clock text directly,
    # independent of driver OS timezone.  (F.lit(naive datetime) would
    # serialize via the driver tz and silently shift bounds off-UTC.)
    if lo is not None:
        parse(lo)  # validate format before it reaches the plan
        df = df.filter(F.col("ts") >= F.lit(lo).cast(_NTZ))
    if hi is not None:
        parse(hi)
        df = df.filter(F.col("ts") < F.lit(hi).cast(_NTZ))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load all fixture tables as a dict name -> DataFrame."""
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view (the SQL surface)."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
