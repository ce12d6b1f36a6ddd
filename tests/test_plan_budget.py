"""Shuffle-count budgets for flagship plan shapes.

Every Exchange is a full shuffle of its input; at 100 TB an extra one
is the difference between a plan that holds and one that doesn't.
PLANS.md records the audited counts descriptively — this test makes
the headline subset PRESCRIPTIVE: each query gets a budget equal to
its audited round-6 shuffle count, so a refactor that sneaks in an
extra repartition/groupBy/non-broadcast join fails the suite instead
of silently doubling shuffle volume at scale.

Budgets are exact-count ceilings on the COLD plan (table cache
disabled via the distinct logical plans — see test_plan_shapes.py for
why the CacheManager must be kept out of plan audits).  If an
optimizer change legitimately REMOVES a shuffle, lower the budget.
"""

from __future__ import annotations

import contextlib
import io
import re

import pytest

from pg_telemetry_spark.registry import all_queries
from pg_telemetry_spark.tables import clear_table_cache

_ALL = all_queries()

#: query -> max distinct Exchange nodes allowed in the physical plan.
#: Values are the audited round-6 counts (PLANS.md), not aspirations.
BUDGETS = {
    # single-shuffle aggregation / window backbone
    "flagship_hourly_top20": 1,
    "agg_group_hash": 1,
    "join_multiway": 1,  # dims broadcast; one fact shuffle for the agg
    "join_broadcast": 1,
    "ts_session": 1,
    "win_lag_delta": 1,
    "wl_q3_shipping_priority": 1,
    "join_asof": 1,
    # shuffle-free scans
    "topk_limit": 0,  # TakeOrderedAndProject
    "filt_ts_range": 0,  # pushed-down slice
    # multi-stage pipelines with their audited counts
    "wl_q1_pricing_summary": 2,
    "llm_containment": 2,
    "llm_jaccard_pairs": 3,
    "llm_tfidf": 5,
    "llm_langid": 5,
}


def _exchanges(df) -> int:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    # count distinct plan node ids — formatted output repeats each
    # node in the tree and detail sections
    return len(set(re.findall(r"^\((\d+)\) Exchange", buf.getvalue(), re.M)))


@pytest.mark.parametrize("name", sorted(BUDGETS))
def test_shuffle_budget(name, spark, sf_dir):
    # audit the canonical COLD plan: both the fixture-table cache and
    # the shared-intermediate cache substitute InMemoryRelations that
    # change the exchange count (a persisted subtree loses the reused
    # exchange the cold plan shares between its consumers)
    from pg_telemetry_spark.queries.llm import clear_shared_cache

    clear_table_cache()
    clear_shared_cache()
    n = _exchanges(_ALL[name].fn(spark, sf_dir))
    assert n <= BUDGETS[name], (
        f"{name}: {n} exchanges in plan, budget is {BUDGETS[name]} — "
        "a new shuffle appeared; check for a lost broadcast or a "
        "redundant repartition/groupBy"
    )
