"""Global plan-shape sweep: scale red-flags must be absent from EVERY
registered query, not just the bench headline (SURVEY.md §4).

For each registered query we build the plan (no execution) and assert:

- no ``CartesianProduct`` anywhere — the one join shape with no scale
  story (BroadcastNestedLoopJoin appears only as documented deliberate
  tiny-broadcasts and is audited per-query in PLANS.md);
- no ``BatchEvalPython`` (row-at-a-time Python) outside the single
  SURVEY-mandated anti-pattern exhibit.

Queries that EXECUTE during construction (streaming micro-batch
drivers, iterative loops, sources that land files) are skipped here:
their plan properties are pinned by their own unit tests, and building
them would execute real jobs.
"""

from __future__ import annotations

import contextlib
import io
import os
from pathlib import Path

import pytest

from pg_telemetry_spark.cache import release_pinned
from pg_telemetry_spark.queries.llm import clear_shared_cache
from pg_telemetry_spark.registry import all_queries
from pg_telemetry_spark.tables import clear_table_cache

_ALL = all_queries()

#: execute-on-construction queries (streaming harness runs, iterative
#: loops with actions, file-landing sources) — excluded from the
#: explain-only sweep
_EXECUTES = {
    name for name, q in _ALL.items() if q.group == "streaming"
} | {
    "sql_recursive_hierarchy",  # frontier loop runs per-level jobs
    "llm_dedup_incr",  # materializes the base index eagerly
    "llm_bpe_train",  # merge-round driver loop collects per round
    "llm_bpe_apply",  # trains the merge table first (same loop)
    "src_binaryfile",  # lands files via foreachPartition
    "snk_parquet_part",  # writes a partitioned directory
    "src_jdbc_pg",  # JDBC seam
    "src_kafka_roundtrip",  # Kafka seam
}

#: the documented row-at-a-time exhibits (SURVEY §2.11): the scalar
#: anti-pattern demo, and the Python UDTF (UDTF evaluation is a
#: Python-eval node by construction — it exists to cover the API)
_ROW_PY_OK = {"udf_scalar_py", "udf_python_udtf"}

_SWEEP = sorted(n for n in _ALL if n not in _EXECUTES)


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module", autouse=True)
def _cold_caches(spark):
    """Run the sweep against an EMPTY CacheManager: disable the
    session table cache (plans become the audited cold pushdown
    plans) and drop whatever earlier test files cached, so the
    per-query no-leaked-cache assertion below is exact."""
    old = os.environ.get("PG_TELEMETRY_SPARK_NO_TABLE_CACHE")
    os.environ["PG_TELEMETRY_SPARK_NO_TABLE_CACHE"] = "1"
    clear_shared_cache()
    clear_table_cache()
    release_pinned()
    spark.catalog.clearCache()
    yield
    if old is None:
        os.environ.pop("PG_TELEMETRY_SPARK_NO_TABLE_CACHE", None)
    else:
        os.environ["PG_TELEMETRY_SPARK_NO_TABLE_CACHE"] = old


@pytest.mark.parametrize("name", _SWEEP)
def test_no_scale_red_flags_in_plan(name, spark, sf_dir):
    plan = _plan(_ALL[name].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan, f"{name}: cartesian product in plan"
    if name not in _ROW_PY_OK:
        assert "BatchEvalPython" not in plan, (
            f"{name}: row-at-a-time Python UDF in plan"
        )
    # No-leaked-cache contract (round 13): after releasing the pin
    # registry and the deliberate session-shared dedup cache, the SQL
    # CacheManager must be EMPTY — DataFrame.persist registers there
    # at call time (no action needed), so a bare un-released persist
    # anywhere in this query's build path fails here by name.
    release_pinned()
    clear_shared_cache()
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty(), (
        f"{name}: build left a cached DataFrame behind "
        "(use pg_telemetry_spark.cache.pin or a cleared session cache)"
    )


def test_no_bare_persist_in_query_sources():
    """Static leg of the cache contract: query modules must route
    every persist through ``cache.pin`` (released by the registry
    hook) or a documented session cache with a clear hook.  The two
    whitelisted files hold exactly those: llm.py's ``_shared``
    (cleared by ``clear_shared_cache``) and graph_ops.py's pagerank
    persist→collect→unpersist pair, balanced within its eager build
    (praised shape — releases storage immediately, r12 verdict)."""
    allowed = {"llm.py", "graph_ops.py"}
    qdir = Path(__file__).resolve().parent.parent / "pg_telemetry_spark" / "queries"
    offenders = []
    for p in sorted(qdir.glob("*.py")):
        if p.name in allowed:
            continue
        src = p.read_text()
        for i, line in enumerate(src.splitlines(), 1):
            code = line.split("#", 1)[0]
            if ".persist(" in code and "``.persist()``" not in line:
                offenders.append(f"{p.name}:{i}")
        # .cache() is persist() by another name: any file using it
        # must also unpersist (the corrupt-record reader releases in
        # a finally; the runtime isEmpty sweep checks the pairing
        # actually executes)
        if any(
            ".cache()" in line.split("#", 1)[0] for line in src.splitlines()
        ) and ".unpersist()" not in src:
            offenders.append(f"{p.name}: .cache() without unpersist")
    assert not offenders, f"bare .persist()/.cache() outside pin(): {offenders}"
