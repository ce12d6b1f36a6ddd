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

import pytest

from pg_telemetry_spark.registry import all_queries

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


@pytest.mark.parametrize("name", _SWEEP)
def test_no_scale_red_flags_in_plan(name, spark, sf_dir):
    plan = _plan(_ALL[name].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan, f"{name}: cartesian product in plan"
    if name not in _ROW_PY_OK:
        assert "BatchEvalPython" not in plan, (
            f"{name}: row-at-a-time Python UDF in plan"
        )
