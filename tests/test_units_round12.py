"""Value-level goldens for the round-12 batch (queries/round12_ext.py).

The oracle-parity sweep already hash-matches these five ops against
DuckDB; these tests add INDEPENDENT recomputation (pure Python /
numpy over collected fixture rows), so a bug shared by both engine
formulations — the one class of defect a twice-written SQL mirror
cannot catch — still fails loudly.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from datetime import datetime, timedelta

import numpy as np
import pyspark.sql.functions as F

from pg_telemetry_spark.tables import load_table

_CAL_LO = datetime(2024, 1, 1, 0)
_N_HOURS = 720  # 30 days


def _hourly_py(spark, sf_dir) -> dict[str, list[int]]:
    """Independent dense hourly counts: pure-Python bucketing over the
    collected events table (60k rows at the gate scale).  The type
    axis derives from the data itself (not a hard-coded list), so a
    regenerated fixture with a new event type flows through; a row
    outside the 720-hour calendar fails with its offending timestamp
    named — that is fixture DRIFT the hourly-spine ops assume away,
    and this assert is where it surfaces."""
    rows = (
        load_table(spark, sf_dir, "events")
        .select("ts", "event_type")
        .collect()
    )
    types = sorted({r.event_type for r in rows})
    counts: dict[str, list[int]] = {t: [0] * _N_HOURS for t in types}
    for r in rows:
        idx = int((r.ts.replace(tzinfo=None) - _CAL_LO).total_seconds() // 3600)
        assert 0 <= idx < _N_HOURS, (
            f"event ts {r.ts!r} falls outside the fixed fixture calendar "
            f"[{_CAL_LO}, +{_N_HOURS}h) the hourly-spine ops assume — "
            "fixture drift, regenerate or widen _CAL_LO/_N_HOURS"
        )
        counts[r.event_type][idx] += 1
    return counts


def test_spc_rules_mirror_pure_python(spark, sf_dir):
    from pg_telemetry_spark.queries.round12_ext import ts_spc_rules

    got = {
        (r.event_type, r.bucket): (r.cnt, r.z, r.rule1, r.rule2, r.rule3)
        for r in ts_spc_rules(spark, sf_dir).collect()
    }
    counts = _hourly_py(spark, sf_dir)
    want = {}
    for t, series in counts.items():
        n = len(series)
        mu = sum(series) / n
        var = sum((c - mu) ** 2 for c in series) / (n - 1)
        sigma = math.sqrt(var)
        sides = [1 if c > mu else (-1 if c < mu else 0) for c in series]
        dsign = [None] + [
            1 if series[i] > series[i - 1] else (-1 if series[i] < series[i - 1] else 0)
            for i in range(1, n)
        ]
        for i in range(n):
            z = (series[i] - mu) / sigma
            r1 = abs(z) > 3
            w9 = sides[max(0, i - 8) : i + 1]
            r2 = len(w9) == 9 and min(w9) == max(w9) != 0
            w5 = [d for d in dsign[max(0, i - 4) : i + 1] if d is not None]
            r3 = len(w5) == 5 and min(w5) == max(w5) != 0
            if r1 or r2 or r3:
                bucket = _CAL_LO + timedelta(hours=i)
                want[(t, bucket)] = (series[i], round(z, 6), r1, r2, r3)
    assert len(want) > 0, "fixture produced no SPC flags — test is vacuous"
    assert set(got) == set(want)
    for k in want:
        g, w = got[k], want[k]
        assert g[0] == w[0] and g[2:] == w[2:], (k, g, w)
        assert abs(g[1] - w[1]) < 1e-6, (k, g, w)


def test_mk_trend_mirror_pure_python(spark, sf_dir):
    from pg_telemetry_spark.queries.round12_ext import ts_mk_trend

    got = {r.event_type: r for r in ts_mk_trend(spark, sf_dir).collect()}
    counts = _hourly_py(spark, sf_dir)
    assert set(got) == set(counts)
    for t, series in counts.items():
        n = len(series)
        s = 0
        for i in range(n):
            for j in range(i + 1, n):
                s += (series[j] > series[i]) - (series[j] < series[i])
        tie_term = sum(
            c * (c - 1) * (2 * c + 5) for c in Counter(series).values()
        )
        var = (n * (n - 1) * (2 * n + 5) - tie_term) / 18.0
        s_cc = s - 1 if s > 0 else (s + 1 if s < 0 else 0)
        z = s_cc / math.sqrt(var)
        r = got[t]
        assert r.n == n and r.s_stat == s, (t, r, s)
        assert abs(r.var_s - var) < 1e-3
        assert abs(r.z - z) < 1e-6
        want_trend = (
            ("increasing" if s > 0 else "decreasing")
            if abs(z) > 1.96
            else "no trend"
        )
        assert r.trend == want_trend


def test_cross_corr_matches_numpy(spark, sf_dir):
    from pg_telemetry_spark.queries.round12_ext import ts_cross_corr

    got = {r.lag_h: r for r in ts_cross_corr(spark, sf_dir).collect()}
    counts = _hourly_py(spark, sf_dir)
    x = np.array(counts["click"], dtype=float)
    y = np.array(counts["purchase"], dtype=float)
    assert sorted(got) == list(range(7))
    for lag in range(7):
        xs = x[: _N_HOURS - lag] if lag else x
        ys = y[lag:]
        want = float(np.corrcoef(xs, ys)[0, 1])
        assert got[lag].n_pairs == _N_HOURS - lag
        assert abs(got[lag].xcorr - want) < 1e-6, (lag, got[lag].xcorr, want)


def test_fertility_reconciles_with_token_count(spark, sf_dir):
    """llm_fertility's per-lang sums must equal llm_token_count's
    per-doc counts folded by language — the two ops share one
    tokenizer definition and must reconcile exactly."""
    from pg_telemetry_spark.queries.llm_ext import llm_token_count
    from pg_telemetry_spark.queries.round12_ext import llm_fertility

    langs = {
        r.doc_id: r.lang
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", "lang")
        .collect()
    }
    per_lang = defaultdict(lambda: [0, 0, 0, 0])  # docs, ws, re, ch
    for r in llm_token_count(spark, sf_dir).collect():
        acc = per_lang[langs[r.doc_id]]
        acc[0] += 1
        acc[1] += r.ws_tokens
        acc[2] += r.re_tokens
        acc[3] += r.n_chars
    got = {r.lang: r for r in llm_fertility(spark, sf_dir).collect()}
    assert set(got) == set(per_lang)
    for lang, (docs, ws, re_, ch) in per_lang.items():
        r = got[lang]
        assert (r.n_docs, r.ws_tokens, r.re_tokens) == (docs, ws, re_)
        assert abs(r.fertility - round(re_ / ws, 6)) < 1e-9
        assert abs(r.chars_per_token - round(ch / re_, 6)) < 1e-9
        assert abs(r.tokens_per_doc - round(re_ / docs, 6)) < 1e-9


def test_fn_struct_matches_sorted_scan(spark, sf_dir):
    """Struct-min/max arg-min must equal a full Python sort of the
    collected fact rows under the same composite key."""
    from pg_telemetry_spark.queries.round12_ext import fn_struct

    rows = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_shipdate", "l_orderkey", "l_linenumber")
        .collect()
    )
    groups = defaultdict(list)
    for r in rows:
        groups[r.l_returnflag].append(
            (r.l_shipdate, r.l_orderkey, r.l_linenumber)
        )
    got = {r.l_returnflag: r for r in fn_struct(spark, sf_dir).collect()}
    assert set(got) == set(groups)
    for flag, keys in groups.items():
        keys.sort()
        r = got[flag]
        assert (r.first_ship_date, r.first_ship_order, r.first_ship_line) == keys[0]
        assert (r.last_ship_date, r.last_ship_order, r.last_ship_line) == keys[-1]
        assert r.n_lines == len(keys)


def test_rolling_median_matches_numpy(spark, sf_dir):
    from pg_telemetry_spark.queries.round12_ext import ts_rolling_median

    got = {
        (r.event_type, r.bucket): r
        for r in ts_rolling_median(spark, sf_dir).collect()
    }
    counts = _hourly_py(spark, sf_dir)
    n_checked = spikes = 0
    for t, series in counts.items():
        arr = np.array(series, dtype=float)
        for i in range(23, _N_HOURS):
            frame = arr[i - 23 : i + 1]
            key = (t, _CAL_LO + timedelta(hours=i))
            r = got.pop(key)
            med = float(np.quantile(frame, 0.5))
            assert r.cnt == series[i]
            assert abs(r.med_24h - med) < 1e-6
            assert abs(r.p90_24h - float(np.quantile(frame, 0.9))) < 1e-6
            assert r.spike == (series[i] > 2 * med)
            spikes += r.spike
            n_checked += 1
    assert not got, "op emitted rows outside the full-frame range"
    assert n_checked == len(counts) * (_N_HOURS - 23)
    assert spikes > 0, "fixture produced no spikes — flag is untested"


def test_link_prediction_scores_recompute(spark, sf_dir):
    """Recompute CN / Jaccard / Adamic-Adar from the collected month
    edge list and verify every returned row, non-adjacency, and that
    the top-20 cutoff is the true global cn-ordered cutoff."""
    from pg_telemetry_spark.queries.graph_ops import (
        _month_items,
        copurchase_edges,
    )
    from pg_telemetry_spark.queries.round12_ext import wl_link_prediction

    edges = {
        (r.u, r.v)
        for r in copurchase_edges(_month_items(spark, sf_dir)).collect()
    }
    nb: dict[int, set[int]] = defaultdict(set)
    for u, v in edges:
        nb[u].add(v)
        nb[v].add(u)

    scores = {}
    for x in nb:
        for z in nb[x] | set().union(*(nb[m] for m in nb[x])):
            if z <= x or (x, z) in edges:
                continue
            cn = len(nb[x] & nb[z])
            if cn == 0:
                continue
            aa = sum(1.0 / math.log(len(nb[m])) for m in nb[x] & nb[z])
            jac = cn / (len(nb[x]) + len(nb[z]) - cn)
            scores[(x, z)] = (cn, round(jac, 6), round(aa, 6))

    rows = wl_link_prediction(spark, sf_dir).collect()
    assert len(rows) == min(20, len(scores))
    want_order = sorted(scores.items(), key=lambda kv: (-kv[1][0], kv[0]))
    for r, (key, (cn, jac, aa)) in zip(rows, want_order):
        assert (r.x, r.z) == key
        assert r.cn == cn
        assert abs(r.jaccard - jac) < 1e-6
        assert abs(r.adamic_adar - aa) < 1e-6
        assert (r.x, r.z) not in edges
