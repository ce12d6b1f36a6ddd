"""t-digest accuracy and mergeability pins (operators/tdigest.py).

The sketch is tier C — these goldens are its correctness contract:
rank error vs exact quantiles <= 0.01 at delta=200 on planted
distributions, size bounded ~2*delta, merge associativity (split the
input any way, merge the partials: same accuracy), and the Spark
query's count column exact.
"""

from __future__ import annotations

import numpy as np
import pytest

from pg_telemetry_spark.operators.tdigest import (
    DELTA,
    merge_centroids,
    quantile,
)


def _rank_error(data, est, q):
    """|true rank of est - q|, the metric t-digest bounds."""
    data = np.sort(data)
    r = np.searchsorted(data, est, side="left") / len(data)
    return abs(r - q)


DISTS = {
    "uniform": lambda rng, n: rng.uniform(0, 1000, n),
    "normal": lambda rng, n: rng.standard_normal(n) * 50 + 100,
    "lognormal": lambda rng, n: rng.lognormal(3, 2, n),
    "bimodal": lambda rng, n: np.concatenate(
        [rng.standard_normal(n // 2), rng.standard_normal(n - n // 2) + 100]
    ),
}


@pytest.mark.parametrize("dist", sorted(DISTS))
def test_rank_error_bound(dist):
    rng = np.random.default_rng(17)
    data = DISTS[dist](rng, 200_000)
    m, w = merge_centroids(data, np.ones(len(data)))
    assert len(m) <= 2 * DELTA + 10
    for q in (0.01, 0.25, 0.5, 0.75, 0.95, 0.99):
        (est,) = quantile(m, w, [q])
        assert _rank_error(data, est, q) <= 0.01, (dist, q)


def test_merge_of_partials_matches_single_build():
    # associativity: 32 arbitrary splits, partial digests, one merge —
    # same rank-error contract as the single-pass build
    rng = np.random.default_rng(23)
    data = DISTS["lognormal"](rng, 150_000)
    parts = np.array_split(data, 32)
    ms, ws = [], []
    for p in parts:
        m, w = merge_centroids(p, np.ones(len(p)))
        ms.append(m)
        ws.append(w)
    mm, mw = merge_centroids(np.concatenate(ms), np.concatenate(ws))
    assert mw.sum() == pytest.approx(len(data))
    assert len(mm) <= 2 * DELTA + 10
    for q in (0.05, 0.5, 0.95, 0.99):
        (est,) = quantile(mm, mw, [q])
        assert _rank_error(data, est, q) <= 0.01, q


def test_small_inputs_exact():
    m, w = merge_centroids(np.array([5.0]), np.array([1.0]))
    assert quantile(m, w, [0.0, 0.5, 1.0]) == [5.0, 5.0, 5.0]
    m, w = merge_centroids(np.array([], dtype=float), np.array([], dtype=float))
    assert np.isnan(quantile(m, w, [0.5])[0])


def test_deterministic():
    rng = np.random.default_rng(3)
    data = rng.uniform(0, 1, 50_000)
    a = merge_centroids(data, np.ones(len(data)))
    b = merge_centroids(data.copy(), np.ones(len(data)))
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_array_equal(a[1], b[1])


def test_spark_tdigest_counts_exact_and_estimates_close(spark, sf_dir):
    import pyspark.sql.functions as F

    from pg_telemetry_spark.queries.dataeng import agg_tdigest
    from pg_telemetry_spark.tables import load_table

    got = {r["event_type"]: r for r in agg_tdigest(spark, sf_dir).collect()}
    e = load_table(spark, sf_dir, "events")
    exact = {
        r["event_type"]: r
        for r in e.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.percentile("value", F.lit(0.5)).alias("p50"),
            F.percentile("value", F.lit(0.99)).alias("p99"),
        )
        .collect()
    }
    assert set(got) == set(exact)
    for et, r in got.items():
        assert r["n_rows"] == exact[et]["n"]  # counts are exact
        vals = [
            x["value"]
            for x in e.filter(F.col("event_type") == et).select("value").collect()
        ]
        assert _rank_error(np.array(vals), r["p50_est"], 0.5) <= 0.015
        assert _rank_error(np.array(vals), r["p99_est"], 0.99) <= 0.015
