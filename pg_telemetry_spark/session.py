"""SparkSession factory and session preparation.

Two entry points:

- :func:`get_session` — build a local session with the engine's
  required configuration (tests, bench).
- :func:`prepare_session` — apply the runtime-settable required confs
  to an EXISTING session (the driver owns the session for the
  ``__spark_entry__`` contract; these confs are all ``spark.sql.*``
  runtime confs, verified settable post-creation).

Required confs and why:

- ``spark.sql.legacy.parquet.nanosAsLong=true`` — the ``events``
  fixture stores ``ts`` as Parquet TIMESTAMP(NANOS), which Spark 4
  refuses by default ([PARQUET_TYPE_ILLEGAL]); with this conf it reads
  as nanosecond longs that :mod:`pg_telemetry_spark.tables` converts
  to microsecond timestamps (verified to match DuckDB exactly).
- ``spark.sql.session.timeZone=UTC`` — all fixture timestamps are
  timezone-less; UTC pins collect()-side rendering for oracle parity.
- AQE on (default in Spark 4, set explicitly) — runtime shuffle
  coalescing and skew-join splitting are the scale story for the
  100 TB target; local shuffle partitions stay modest and AQE
  coalesces further.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Runtime-settable confs applied to any session the engine uses.
RUNTIME_CONFS: dict[str, str] = {
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for every pandas_udf / applyInPandas / toPandas boundary.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # NOT set: spark.sql.optimizer.canChangeCachedPlanOutputPartitioning.
    # Measured r17 and reverted: letting AQE coalesce CACHE-
    # materialization plans cut near-empty map tasks 3-4x on pin-heavy
    # rows (wl_pagerank 756->198 tasks) but coalesces every fixture-
    # scale pinned intermediate to ~1 partition, SERIALIZING the
    # CPU-heavy consumers downstream of pins (paired bench legs:
    # llm_ann_lsh 1.49 -> 2.04/2.80 s while untouched reference rows
    # moved ~+20% box noise only); no row's seconds improved from the
    # task savings.  Guide §1.2: config only after algorithm — the
    # loop widths are sized structurally instead (loop_sizing).
}

#: Engine join/shuffle sizing for HOST sessions (the driver's plain
#: session otherwise runs Spark defaults): 32 MB broadcast threshold
#: keeps every fixture dim (and any real dim table of that order) on
#: the broadcast side — the plans audited in PLANS.md assume it — and
#: 200 default shuffle partitions launch near-empty tasks per shuffle
#: at fixture scale.  Applied ONLY while the session still carries the
#: Spark built-in default, so a deliberate site config (or a
#: ``sized_shuffle`` cap in effect when ``prepare_session`` re-runs
#: mid-operator) is never stomped.  At cluster scale the initial
#: partition count is sized to the cluster and AQE coalesces down.
SIZING_CONFS: dict[str, tuple[str, str]] = {
    # key: (spark built-in default, engine value)
    "spark.sql.autoBroadcastJoinThreshold": ("10485760b", str(32 * 1024 * 1024)),
    "spark.sql.shuffle.partitions": ("200", "32"),
}


#: app ids whose executors already received the package zip.
_SHIPPED: set[str] = set()


def ship_package(spark: SparkSession) -> None:
    """Ship the engine source to executor Python workers (idempotent).

    ``local[*]`` executors share the driver's interpreter and see its
    ``sys.path``, so every UDF the engine pickles BY REFERENCE
    (module-level functions in pandas_udf / applyInPandas /
    mapInPandas kernels) resolves for free — which is exactly why a
    single-JVM harness can never catch the failure a real cluster
    hits immediately: separate executor processes spawn their own
    Python workers, cloudpickle re-imports referenced modules there,
    and ``pg_telemetry_spark`` isn't on their path
    (ModuleNotFoundError; found by the round-13 local-cluster sweep —
    6 Arrow-kernel ops died and the standalone master removed the app
    after the executor-failure cascade).

    The fix is the standard cluster deployment move, owned by the
    ENGINE so any session it prepares is cluster-ready: zip the
    package once per process and ``addPyFile`` it, which distributes
    the archive to every current AND future executor and prepends it
    to the Python worker path.  On YARN/K8s the same zip rides the
    identical API; Spark Connect sessions (no sparkContext) ship via
    ``addArtifacts`` instead and are left alone here.
    """
    try:
        master = spark.sparkContext.master
    except Exception:
        return  # Spark Connect — no classic sparkContext
    if master.startswith("local[") or app_id(spark) in _SHIPPED:
        return
    import tempfile
    import zipfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zpath = os.path.join(tempfile.gettempdir(), "pg_telemetry_spark_pkg.zip")
    tmp = f"{zpath}.{os.getpid()}"
    with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg_dir):
            if "__pycache__" in root:
                continue
            for fn in sorted(files):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(root, fn)
                z.write(full, os.path.relpath(full, os.path.dirname(pkg_dir)))
    os.replace(tmp, zpath)
    spark.sparkContext.addPyFile(zpath)
    _SHIPPED.add(app_id(spark))


def prepare_session(spark: SparkSession) -> SparkSession:
    """Apply required runtime confs to an existing session (idempotent),
    and ship the package source to remote executors when the master
    runs them as separate processes (see :func:`ship_package`)."""
    ship_package(spark)
    for key, value in RUNTIME_CONFS.items():
        try:
            spark.conf.set(key, value)
        except Exception:
            # A conf locked by the host (static conf) — leave as-is;
            # every conf in RUNTIME_CONFS is runtime-settable on stock
            # Spark 4, so this is purely defensive.
            pass
    for key, (default, value) in SIZING_CONFS.items():
        try:
            if spark.conf.get(key) == default:
                spark.conf.set(key, value)
        except Exception:
            pass
    return spark


def app_id(spark: SparkSession) -> str:
    """Session identity for cache keys.

    ``sparkContext.applicationId`` on classic sessions; Spark Connect
    sessions have no ``sparkContext``, so fall back to the
    ``spark.app.id`` conf (same value on classic) and finally a
    constant — a Connect client talks to one app anyway.
    """
    try:
        return spark.sparkContext.applicationId
    except Exception:
        try:
            return spark.conf.get("spark.app.id")
        except Exception:
            return "spark-connect"


def default_parallelism(spark: SparkSession) -> int:
    """Cluster-width hint for explicit repartition spreads.

    ``sparkContext.defaultParallelism`` on classic sessions; on Spark
    Connect (no ``sparkContext``) the shuffle-partition conf is the
    closest runtime-readable stand-in.
    """
    try:
        return spark.sparkContext.defaultParallelism
    except Exception:
        try:
            return int(spark.conf.get("spark.sql.shuffle.partitions"))
        except Exception:
            return 200


import contextlib


def loop_shuffle_width(
    spark: SparkSession,
    n_rows: int,
    floor: int = 8,
    rows_per_partition: int = 250_000,
) -> int:
    """Shuffle width for a bounded iterative loop, derived from the
    MEASURED per-round state size instead of a constant (optimization
    r17, guide §2.2/§2.5; VERDICT r16 #1).

    Every iterative operator already counts its state (vertices,
    edges, labels) before the loop — this turns that count into the
    loop's shuffle width: ``clamp(ceil(n_rows / rows_per_partition),
    floor, default_parallelism)``.  The floor is the measured local
    optimum (8 at fixture scale, where per-partition fixed costs
    dominate); the ceiling is the cluster width, so a big graph's
    per-round aggregation can use every core instead of serializing
    on a local-mode constant.  250k state rows per partition keeps a
    reduce partition in the tens of MB — deliberately small, because
    loop rounds rebuild the reduce state every iteration and a round's
    wall-clock is its slowest partition."""
    import math

    hi = max(default_parallelism(spark), floor)
    want = max(floor, math.ceil(max(int(n_rows), 1) / rows_per_partition))
    return min(want, hi)


def loop_sizing(
    spark: SparkSession,
    n_rows: int,
    small_cap: int = 5_000_000,
    floor: int = 8,
    rows_per_partition: int = 250_000,
):
    """Shuffle context for a bounded iterative loop BODY, chosen from
    the measured state/edge row count (optimization r17; VERDICT r16
    #1 and ADVICE r16 #1).

    - ``n_rows <= small_cap`` (the regime where the loops' per-round
      joins are explicitly broadcast-gated and fixed-shape): cap the
      shuffle width at :func:`loop_shuffle_width` and disable AQE —
      its runtime re-planning contributes nothing to a pinned-shape
      round while every query stage it materializes is a blocking job
      (measured r16: wl_pagerank 29→19 jobs, 3.7→2.8 s).
    - larger graphs (the 100 TB fallback path, where the per-round
      joins fall back to sort-merge): leave the session conf and AQE
      UNTOUCHED — skew-join splitting and partition coalescing are
      the scale story there, and any fixed cap would serialize the
      cluster.

    Callers pass the same gate value that drives their broadcast
    hint (e.g. ``_BCAST_VERTEX_CAP``) so the AQE-off regime and the
    broadcast regime coincide."""
    if int(n_rows) <= small_cap:
        return sized_shuffle(
            spark,
            partitions=loop_shuffle_width(spark, n_rows, floor, rows_per_partition),
            adaptive=False,
        )
    return contextlib.nullcontext()


def respread_if_narrow(df, width: int | None = None):
    """Round-robin respread of a narrow projection whose scan loaded
    fewer splits than the session parallelism (optimization r17,
    VERDICT r16 #4; guide §2.5 'one huge unsplittable file →
    repartition immediately after the read'): every fixture table is
    one single-row-group parquet file, so however many splits the scan
    plans, all rows land in ONE, serializing all downstream narrow
    compute.  The respread is a no-op when the scan already loads at
    least cluster-width splits (the 100 TB case), so it never adds an
    exchange at scale.

    ONLY lawful upstream of order-independent consumers — integer or
    exact aggregations, min/max selections, mergeable sketches with a
    tolerance contract.  A respread upstream of a plain double sum
    changes accumulation order and breaks the bit-exact oracle hash
    (the measured _REBALANCE_ON_CACHE boundary in tables.py); callers
    own that proof, and the sf0.001 parity sweep is the cheap check.
    Round-robin is retry-safe (sortBeforeRepartition, SPARK-23207).
    """
    spark = df.sparkSession
    target = width or default_parallelism(spark)
    try:
        n = df.rdd.getNumPartitions()
    except Exception:
        return df
    return df.repartition(target) if n < target else df


@contextlib.contextmanager
def sized_shuffle(
    spark: SparkSession, partitions: int = 16, adaptive: bool | None = None
):
    """Temporarily cap ``spark.sql.shuffle.partitions`` (restored on
    exit).  For ITERATIVE operators whose per-round state is tiny by
    construction (component labels, k centroids): on a host session
    left at the 200-partition default, every round's join + checkpoint
    materializes 200 near-empty partitions and the fixed per-partition
    cost dwarfs the work.  AQE coalesces shuffle READS but the
    checkpoint still lands one block per partition — capping the
    partition count is what actually bounds the per-round overhead.
    At cluster scale the caller picks a cap matching its parallelism;
    this never touches non-iterative query plans.

    ``adaptive=False`` additionally disables AQE inside the block
    (optimization r16).  In a bounded iterative loop whose per-round
    join strategy is already pinned (explicit gated broadcast) and
    whose shuffle width this cap already sizes, AQE's runtime
    re-planning contributes nothing — its join re-selection is moot,
    its skew handling only applies to sort-merge/shuffled-hash JOINS
    (never to the loop's aggregations), and its read coalescing is
    subsumed by the cap — while every query stage it materializes is
    an extra blocking job: measured on wl_pagerank's 8 rounds at
    sf0.1, AQE on = 29 jobs / 3.7-6.2 s vs off = 19 jobs / 2.8-3.3 s,
    identical ranks.  Default ``None`` leaves the session setting
    untouched."""
    key = "spark.sql.shuffle.partitions"
    akey = "spark.sql.adaptive.enabled"
    old = spark.conf.get(key)
    old_adaptive = spark.conf.get(akey) if adaptive is not None else None
    try:
        if int(old) > partitions:
            spark.conf.set(key, str(partitions))
        if adaptive is not None:
            spark.conf.set(akey, str(adaptive).lower())
        yield
    finally:
        spark.conf.set(key, old)
        if old_adaptive is not None:
            spark.conf.set(akey, old_adaptive)


#: app id -> LAST-APPLIED checkpoint dir.  A dict (not a set of
#: (app, dir) pairs) because the comparison must be against what the
#: SparkContext currently has: with a set, an A->B->A revisit of
#: PG_TELEMETRY_SPARK_CHECKPOINT_DIR finds (app, A) already present,
#: skips setCheckpointDir, and silently routes checkpoints into B —
#: the exact misrouting the per-dir keying was meant to fix (ADVICE
#: r14).  setCheckpointDir is called whenever the requested dir
#: differs from the last one actually applied.
_CKPT_DIR_LAST: dict[str, str] = {}


def iter_checkpoint(df, eager: bool = True):
    """Lineage truncation for iterative operators (PageRank rounds,
    label propagation, BFS frontiers, BPE merges, CC star rounds,
    k-means centroids).

    Default: ``localCheckpoint`` — fast, blocks live on executors.
    That is the right local/bench trade, but those blocks are
    UNREPLICATED: losing the executor that holds a truncated round's
    blocks can fail the job (the round-13 executor-kill probe
    recovered, but only because retry landed before truncation was
    load-bearing).  With ``PG_TELEMETRY_SPARK_CHECKPOINT_DIR`` set,
    iterative ops switch to RELIABLE ``checkpoint()`` into that
    directory (HDFS/S3/NFS on a real cluster) — blocks survive any
    executor loss.  Set ``spark.cleaner.referenceTracking.cleanCheckpoints=true``
    (or manage the directory lifecycle) to reclaim space.
    """
    d = os.environ.get("PG_TELEMETRY_SPARK_CHECKPOINT_DIR")
    if not d:
        return df.localCheckpoint(eager=eager)
    spark = df.sparkSession
    app = app_id(spark)
    if _CKPT_DIR_LAST.get(app) != d:
        spark.sparkContext.setCheckpointDir(d)
        _CKPT_DIR_LAST[app] = d
    if eager:
        # Reliable checkpoint writes its files in a SEPARATE job after
        # the materializing action, so an unpersisted lineage is
        # computed twice per round.  Persist for the write, release
        # immediately after — the returned frame reads the checkpoint
        # files, not this cache.
        df.persist()
        try:
            return df.checkpoint(eager=True)
        finally:
            df.unpersist()
    # lazy: materialization happens at the caller's next action, so a
    # persist here could not be released deterministically (the cache
    # contract forbids open-ended pins); lazy callers accept the
    # double-compute on the reliable path.
    return df.checkpoint(eager=False)


def ckpt_eager(df):
    """`df.transform(ckpt_eager)` — chain-preserving iter_checkpoint."""
    return iter_checkpoint(df, eager=True)


def ckpt_lazy(df):
    """`df.transform(ckpt_lazy)` — lazy variant (materialized by the
    caller's next action, one job instead of two)."""
    return iter_checkpoint(df, eager=False)


def get_session(app_name: str = "pg_telemetry_spark") -> SparkSession:
    """Build (or fetch) a local session configured for the engine.

    ``SPARK_GRAFT_CPUS`` controls local parallelism (default: all).
    Shuffle partitions are sized for the local fixture scale; at
    cluster scale this is AQE-governed (initialPartitionNum high,
    coalesce down), so the literal number here is not a scale
    assumption.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    # SPARK_GRAFT_MASTER overrides the local master entirely (e.g.
    # 'local-cluster[4,8,8192]' for real multi-process executors, or a
    # standalone/YARN URL on a deployment) — prepare_session ships the
    # package source automatically for any non-local master.
    master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", "32")
        # 16g default (round 9): the single-JVM local harness now runs
        # 135-query legs up to sf10 in one session; 8g survived 67
        # queries (r8) but OOMed ~120 queries into the r9 sf10 leg.
        # On a real cluster this is per-executor sizing, not a scale
        # assumption — the box has 128 GiB.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
    )
    if not master.startswith("local["):
        # separate executor processes: size their heaps explicitly
        # (the 1g default OOM-cycles under the Arrow kernels — see
        # BASELINE.md round 13)
        builder = builder.config(
            "spark.executor.memory",
            os.environ.get("SPARK_GRAFT_EXECUTOR_MEM", "3g"),
        )
    for key, value in RUNTIME_CONFS.items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return prepare_session(spark)
