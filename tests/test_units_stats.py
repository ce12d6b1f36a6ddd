"""Goldens for the round-9 statistics batch (queries/stats_ext.py).

ts_dtw_pairs is tier C — its golden replays the identical banded-DTW
DP in pure Python on series pulled independently via DuckDB.  The
tier-A members get value-level pins on top of the oracle hash-match:
Gini vs a direct local formula and the weighted median vs a local
cumulative scan, so a future refactor can't silently change semantics
in a way the (also-refactored) oracle would follow.
"""

from __future__ import annotations

import math

import pytest

from pg_telemetry_spark.queries.stats_ext import (
    agg_weighted_median,
    ts_dtw_pairs,
    wl_gini_revenue,
)


def _hourly_series(oracle_con):
    rows = oracle_con.execute(
        """
        SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h,
               round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                     / count(value), 6) AS v
        FROM events GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).fetchall()
    series: dict[str, list[float]] = {}
    for et, _h, v in rows:
        series.setdefault(et, []).append(v)
    return series


def _dtw_local(x, y, band=24):
    def norm(s):
        m = sum(s) / len(s)
        sd = math.sqrt(sum((t - m) ** 2 for t in s) / len(s)) or 1.0
        return [(t - m) / sd for t in s]

    x, y = norm(x), norm(y)
    n, m = len(x), len(y)
    inf = float("inf")
    prev = [inf] * (m + 1)
    prev[0] = 0.0
    for i in range(1, n + 1):
        cur = [inf] * (m + 1)
        for j in range(max(1, i - band), min(m, i + band) + 1):
            c = (x[i - 1] - y[j - 1]) ** 2
            cur[j] = c + min(prev[j], cur[j - 1], prev[j - 1])
        prev = cur
    return round(math.sqrt(prev[m]), 4)


def test_dtw_pairs_match_local_replay(spark, sf_dir, oracle_con):
    series = _hourly_series(oracle_con)
    got = {
        (r["type_a"], r["type_b"]): (r["dtw_dist"], r["n_a"], r["n_b"])
        for r in ts_dtw_pairs(spark, sf_dir).collect()
    }
    types = sorted(series)
    expect_pairs = {
        (a, b) for i, a in enumerate(types) for b in types[i + 1 :]
    }
    assert set(got) == expect_pairs
    for (a, b), (dist, na, nb) in got.items():
        assert na == len(series[a]) and nb == len(series[b])
        assert dist == pytest.approx(
            _dtw_local(series[a], series[b]), abs=1e-9
        ), (a, b)


def test_dtw_is_zero_on_identical_series():
    s = [math.sin(i / 7.0) for i in range(100)]
    assert _dtw_local(s, list(s)) == 0.0


def test_gini_matches_direct_formula(spark, sf_dir, oracle_con):
    revs = [
        r[0]
        for r in oracle_con.execute(
            """
            SELECT round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6)))
                         AS DOUBLE), 6) AS rev
            FROM orders GROUP BY o_custkey ORDER BY rev
            """
        ).fetchall()
    ]
    n = len(revs)
    gini_local = (
        2 * sum((i + 1) * x for i, x in enumerate(revs)) / (n * sum(revs))
        - (n + 1) / n
    )
    row = wl_gini_revenue(spark, sf_dir).collect()[0]
    assert row["n_customers"] == n
    assert row["gini"] == pytest.approx(gini_local, abs=2e-6)
    assert 0.0 <= row["gini"] <= 1.0


def test_weighted_median_matches_local_scan(spark, sf_dir, oracle_con):
    rows = oracle_con.execute(
        """
        SELECT l_returnflag, l_extendedprice, l_quantity, l_orderkey,
               l_linenumber
        FROM lineitem
        ORDER BY l_returnflag, l_extendedprice, l_orderkey, l_linenumber
        """
    ).fetchall()
    by_flag: dict[str, list[tuple[float, float]]] = {}
    for fl, price, qty, _ok, _ln in rows:
        by_flag.setdefault(fl, []).append((price, qty))
    expect = {}
    for fl, items in by_flag.items():
        tot = sum(q for _, q in items)
        cum = 0.0
        for price, q in items:
            cum += q
            if 2 * cum >= tot:
                expect[fl] = price
                break
    got = {
        r["l_returnflag"]: r["weighted_median"]
        for r in agg_weighted_median(spark, sf_dir).collect()
    }
    assert got == expect
