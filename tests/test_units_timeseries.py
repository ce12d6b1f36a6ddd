"""Hand-computed goldens and cross-formulation checks (SURVEY.md §5).

Session gaps-and-islands edge cases, approx-distinct error bound, and
agreement between independent formulations of the same semantics.
"""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F
import pytest
from pyspark.sql import types as T

from pg_telemetry_spark.queries.timeseries import sessionize

_TS = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampNTZType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _mk(spark, rows):
    data = [
        (u, i, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s), v) for u, i, s, v in rows
    ]
    return spark.createDataFrame(data, _TS)


class TestSessionize:
    def test_single_event_is_one_session(self, spark):
        out = sessionize(_mk(spark, [(1, 1, 0, 5.0)]), 1800).collect()
        assert len(out) == 1
        assert out[0].n_events == 1 and out[0].duration_seconds == 0.0

    def test_gap_exactly_equal_threshold_merges(self, spark):
        # strictly-greater starts a session => gap == threshold merges
        out = sessionize(_mk(spark, [(1, 1, 0, 1.0), (1, 2, 1800, 1.0)]), 1800).collect()
        assert len(out) == 1 and out[0].n_events == 2

    def test_gap_just_over_threshold_splits(self, spark):
        out = sessionize(_mk(spark, [(1, 1, 0, 1.0), (1, 2, 1801, 1.0)]), 1800).collect()
        assert len(out) == 2

    def test_unsorted_input(self, spark):
        rows = [(1, 3, 4000, 1.0), (1, 1, 0, 1.0), (1, 2, 100, 1.0)]
        out = sorted(sessionize(_mk(spark, rows), 1800).collect(), key=lambda r: r.session_id)
        assert [r.n_events for r in out] == [2, 1]

    def test_users_independent(self, spark):
        rows = [(1, 1, 0, 1.0), (2, 2, 10, 1.0), (1, 3, 5000, 1.0)]
        out = sessionize(_mk(spark, rows), 1800)
        assert out.count() == 3


def test_approx_count_distinct_within_5pct(spark, sf_dir):
    from pg_telemetry_spark.queries.aggs import agg_approx_cd
    from pg_telemetry_spark.tables import load_table

    approx = {r.event_type: r.approx_users for r in agg_approx_cd(spark, sf_dir).collect()}
    e = load_table(spark, sf_dir, "events")
    exact = {
        r.event_type: r.n
        for r in e.groupBy("event_type").agg(F.countDistinct("user_id").alias("n")).collect()
    }
    for etype, n in exact.items():
        assert abs(approx[etype] - n) <= max(1, 0.05 * n), (etype, approx[etype], n)


def test_lag_delta_agrees_with_self_join(spark, sf_dir):
    """Same semantics, two formulations: window-lag vs numbered self-join."""
    from pg_telemetry_spark.queries.joins import join_self_consec
    from pg_telemetry_spark.tables import load_table

    w_pairs = join_self_consec(spark, sf_dir).count()
    e = load_table(spark, sf_dir, "events")
    n_events = e.count()
    n_users = e.select("user_id").distinct().count()
    # each user contributes (events_of_user - 1) consecutive pairs
    assert w_pairs == n_events - n_users


@pytest.mark.parametrize("sf", ["sf0.001"])
def test_scale_ladder_flagship(spark, sf):
    """Hashes must be stable across scale factors (nondeterminism catch)."""
    from pg_telemetry_spark.queries.flagship import flagship_hourly_top20

    a = flagship_hourly_top20(spark, f"/root/testdata/{sf}").collect()
    b = flagship_hourly_top20(spark, f"/root/testdata/{sf}").collect()
    assert a == b
