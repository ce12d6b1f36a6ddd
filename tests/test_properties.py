"""Property-based invariants over random small event sets (SURVEY §5).

One shared SparkSession, small generated inputs, and invariants that
must hold for ANY input — the complement to the fixture-pinned oracle
tests.
"""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from pg_telemetry_spark.operators.minhash import near_duplicates
from pg_telemetry_spark.queries.timeseries import sessionize

_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampNTZType()),
        T.StructField("value", T.DoubleType()),
    ]
)

_events = st.lists(
    st.tuples(
        st.integers(0, 3),  # user_id
        st.integers(0, 86_400 * 3),  # seconds offset
        st.floats(0.5, 1000, allow_nan=False),
    ),
    min_size=1,
    max_size=40,
    unique_by=lambda t: (t[0], t[1]),
)

_slow = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _df(spark, rows):
    data = [
        (u, i, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s), round(v, 2))
        for i, (u, s, v) in enumerate(rows)
    ]
    return spark.createDataFrame(data, _SCHEMA)


@_slow
@given(_events)
def test_sessions_partition_events(spark, rows):
    """Session event counts sum to the input count; every session has
    ≥1 event and non-negative duration ≤ its event span."""
    df = _df(spark, rows)
    sess = sessionize(df, 1800).collect()
    assert sum(r.n_events for r in sess) == len(rows)
    for r in sess:
        assert r.n_events >= 1
        assert r.duration_seconds >= 0
        assert r.session_start <= r.session_end


@_slow
@given(_events)
def test_tumbling_buckets_partition_rows(spark, rows):
    df = _df(spark, rows)
    bucketed = df.groupBy(F.window("ts", "1 hour").start.alias("b")).agg(
        F.count("*").alias("n")
    )
    assert bucketed.agg(F.sum("n")).head()[0] == len(rows)


@_slow
@given(_events)
def test_counter_delta_reset_guard_nonnegative(spark, rows):
    from pyspark.sql import Window

    df = _df(spark, rows)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    delta = df.select(
        (F.col("value") - F.lag("value").over(w)).alias("d")
    ).filter(F.col("d").isNotNull())
    guarded = delta.select(F.greatest("d", F.lit(0.0)).alias("g"))
    assert guarded.filter(F.col("g") < 0).count() == 0


@_slow
@given(_events)
def test_dedup_idempotent(spark, rows):
    df = _df(spark, rows)
    doubled = df.unionByName(df)
    once = doubled.dropDuplicates(["event_id"])
    twice = once.dropDuplicates(["event_id"])
    assert once.count() == df.count() == twice.count()


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    st.lists(
        st.text(alphabet="abcdef ", min_size=12, max_size=60),
        min_size=2,
        max_size=12,
        unique=True,
    )
)
def test_near_dup_self_pairs_always_found(spark, texts):
    """A corpus containing each doc twice must report every (i, i+N)
    self-pair at Jaccard 1.0."""
    n = len(texts)
    rows = [(i, t) for i, t in enumerate(texts)] + [
        (i + n, t) for i, t in enumerate(texts)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    found = {
        (r.id1, r.id2): r.jaccard
        for r in near_duplicates(df, threshold=0.99).collect()
    }
    for i in range(n):
        assert found.get((i, i + n)) == 1.0, f"exact self-pair {i} missed"
