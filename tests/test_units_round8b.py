"""Semantic goldens for the round-8 batch-2 operators.

Oracle parity hash-matches these against DuckDB at sf0.01/0.1/1; here
the semantics are pinned on planted inputs — Gopher rules must drop
exactly the planted violators, SoftDedup weights must be exactly 1/c
with exact-integer effective sizes, the ACF of a planted alternating
series must be negative at lag 1 and positive at lag 2, Benford
first-digits must count exactly, and the Markov matrix rows must sum
to 1 with the planted deterministic chain recovered.
"""

from __future__ import annotations

import datetime

from pg_telemetry_spark.queries.curation import llm_gopher_rules, llm_soft_dedup
from pg_telemetry_spark.queries.dataeng import dq_benford
from pg_telemetry_spark.queries.timeseries_ext import ts_acf
from pg_telemetry_spark.queries.workload import wl_markov_transition


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t, "en", f"src{i % 2}", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def _patch(monkeypatch, module, df):
    monkeypatch.setattr(module, "load_table", lambda _s, _d, _t: df)


def test_gopher_rules_drop_planted_violators(spark, monkeypatch):
    import pg_telemetry_spark.queries.curation as mod

    good = ("the cat sat on a mat and then ran to the hill " * 2).strip()
    too_short = "the a cat"  # < 10 words
    no_stopwords = "cat dog bird fish mouse horse cow sheep goat pig"
    long_words = " ".join(["supercalifragilistic"] * 12)  # mean len > 10
    docs = _docs(spark, [good, too_short, no_stopwords, long_words])
    _patch(monkeypatch, mod, docs)
    rows = {r.doc_id: r for r in llm_gopher_rules(spark, "x").collect()}
    assert rows[0].kept
    assert not rows[1].kept and rows[1].n_words == 3
    assert not rows[2].kept and rows[2].stop_distinct == 0
    assert not rows[3].kept and rows[3].mean_word_len > 10
    assert all(r.alpha_frac == 1.0 for r in rows.values())


def test_soft_dedup_weights_are_inverse_counts(spark, monkeypatch):
    import pg_telemetry_spark.queries.curation as mod

    # src0: doc 0,2,4 share text (c=3) + doc 6 unique -> effective 2/4
    # src1: docs 1,3 share (c=2) + doc 5 unique -> effective 2/3
    texts = ["dup a"] * 5 + ["solo b", "solo c"]
    texts[1] = texts[3] = "dup z"
    texts[5] = "solo b"
    docs = _docs(spark, texts)
    _patch(monkeypatch, mod, docs)
    rows = {r.doc_id: r for r in llm_soft_dedup(spark, "x").collect()}
    assert rows[0].dup_cnt == 3 and abs(rows[0].weight - 0.333333) < 1e-9
    assert rows[1].dup_cnt == 2 and rows[1].weight == 0.5
    assert rows[6].dup_cnt == 1 and rows[6].weight == 1.0
    # src0 = {0,2,4,6}: 3*(1/3)+1 = 2 of 4 docs
    assert abs(rows[0].src_effective_frac - 0.5) < 1e-6
    # sample_prob sums to 1 within each source
    for src in ("src0", "src1"):
        s = sum(r.sample_prob for r in rows.values() if r.source == src)
        assert abs(s - 1.0) < 1e-5


def test_acf_alternating_series_sign_pattern(spark, monkeypatch):
    import pg_telemetry_spark.queries.timeseries_ext as mod

    # one event per hour, alternating high/low -> acf1 < 0 < acf2
    t0 = datetime.datetime(2024, 1, 1)
    e = spark.createDataFrame(
        [
            (i, t0 + datetime.timedelta(hours=i), 1, "m",
             100.0 if i % 2 == 0 else 10.0, "{}")
            for i in range(48)
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    _patch(monkeypatch, mod, e)
    row = ts_acf(spark, "x").collect()[0]
    assert row.n_hours == 48 and row.mean_v == 55.0
    assert row.acf_lag1 < -0.9
    assert row.acf_lag2 > 0.9
    assert row.acf_lag3 < -0.9


def test_benford_digits_count_exactly(spark, monkeypatch):
    import pg_telemetry_spark.queries.dataeng as mod

    # first digits: 1 x4 (1.23, 19.99, 100.0, 1013.7), 5 x2, 9 x1
    prices = [1.23, 19.99, 100.0, 1013.7, 55.5, 5.0, 900.0]
    t0 = datetime.datetime(2024, 1, 1)
    o = spark.createDataFrame(
        [(i, i, "O", p, t0, "1-URGENT") for i, p in enumerate(prices)],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp,"
        " o_orderpriority string",
    )
    _patch(monkeypatch, mod, o)
    rows = {r.digit: r for r in dq_benford(spark, "x").collect()}
    assert rows[1].n == 4 and rows[5].n == 2 and rows[9].n == 1
    assert set(rows) == {1, 5, 9}
    assert abs(rows[1].exp_frac - 0.30103) < 1e-6
    assert all(r.chi2_term >= 0 for r in rows.values())


def test_markov_rows_sum_to_one_and_recover_chain(spark, monkeypatch):
    import pg_telemetry_spark.queries.workload as mod

    # user 1 cycles a->b->c; user 2 always a->a (self-loop)
    t0 = datetime.datetime(2024, 1, 1)
    evs = []
    for i in range(9):
        evs.append((i, t0 + datetime.timedelta(minutes=i), 1,
                    "abc"[i % 3], 1.0, "{}"))
    for i in range(4):
        evs.append((100 + i, t0 + datetime.timedelta(minutes=i), 2,
                    "a", 1.0, "{}"))
    e = spark.createDataFrame(
        evs,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    _patch(monkeypatch, mod, e)
    rows = wl_markov_transition(spark, "x").collect()
    probs = {(r.prev_type, r.next_type): r.prob for r in rows}
    ns = {(r.prev_type, r.next_type): r.n for r in rows}
    assert probs[("b", "c")] == 1.0 and probs[("c", "a")] == 1.0
    # a -> b (user 1, x3) and a -> a (user 2, x3)
    assert ns[("a", "b")] == 3 and ns[("a", "a")] == 3
    assert probs[("a", "b")] == 0.5 and probs[("a", "a")] == 0.5
    # every row of the transition matrix sums to 1
    by_prev = {}
    for (p, _n), pr in probs.items():
        by_prev[p] = by_prev.get(p, 0.0) + pr
    assert all(abs(s - 1.0) < 1e-5 for s in by_prev.values())
