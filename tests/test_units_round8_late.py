"""Semantic goldens for the round-8 late operators.

Oracle parity already hash-matches these against DuckDB at sf0.01,
sf0.1 and sf1; here the SEMANTICS are pinned on planted inputs —
a shared token run must be detected by both the exact-substring
coverage and the winnowing fingerprints, the LM filter's cut must be
a clean score threshold dropping at most a quartile, a planted far
vector must be the flagged embedding outlier, and the CUSUM closed
form must equal the textbook recursion evaluated in pure Python.
"""

from __future__ import annotations

import datetime

from pg_telemetry_spark.queries.curation import llm_dup_substrings, llm_lm_filter
from pg_telemetry_spark.queries.llm_ext import llm_embed_outlier, llm_winnowing
from pg_telemetry_spark.queries.timeseries_ext import ts_cusum_change


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t, "en", f"src{i % 2}", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def _patch(monkeypatch, module, df):
    monkeypatch.setattr(module, "load_table", lambda _s, _d, _t: df)


def test_dup_substrings_planted_shared_run(spark, monkeypatch):
    import pg_telemetry_spark.queries.curation as mod

    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = _docs(
        spark,
        [
            shared + " uniqA1 uniqA2 uniqA3",
            shared + " uniqB1 uniqB2 uniqB3",
            "one two three four five six seven eight nine ten",
        ],
    )
    _patch(monkeypatch, mod, docs)
    rows = {r.doc_id: r for r in llm_dup_substrings(spark, "x").collect()}
    # the 10 shared tokens are covered by duplicated 8-grams in both docs
    for d in (0, 1):
        assert rows[d].n_dup_grams == 3  # starts 1..3 of the shared run
        assert abs(rows[d].dup_coverage - 10 / 13) < 1e-6  # rounded to 6dp
    assert rows[2].n_dup_grams == 0 and rows[2].dup_coverage == 0.0


def test_winnowing_shared_run_yields_shared_fingerprints(spark, monkeypatch):
    import pg_telemetry_spark.queries.llm_ext as mod

    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu"
    docs = _docs(
        spark,
        [
            shared + " uniqueAAA uniqueBBB uniqueCCC",
            "zzz yyy xxx www " + shared,
            "p q r s t u v w x y z aa bb cc dd",  # unrelated control
        ],
    )
    _patch(monkeypatch, mod, docs)
    pairs = {
        (r.doc1, r.doc2): r.n_shared
        for r in llm_winnowing(spark, "x").collect()
    }
    # a 12-token shared run guarantees multiple shared selected
    # fingerprints (any >=7-token shared run shares at least one)
    assert pairs.get((0, 1), 0) >= 2
    assert (0, 2) not in pairs and (1, 2) not in pairs


def test_lm_filter_cut_is_clean_and_bounded(spark, monkeypatch):
    import pg_telemetry_spark.queries.curation as mod

    fluent = [("the cat sat on the mat and the cat sat again " * 2).strip()] * 6
    # two garbled docs with DISTINCT scores (identical scores would tie
    # at the cutoff and be kept — ties are kept by design): the second
    # borrows one corpus-frequent bigram so it scores strictly higher
    garbled = ["xq0 zv0 qq0 vx0 jj0 kk0", "xq1 zv1 qq1 vx1 the cat"]
    docs = _docs(spark, fluent + garbled)
    _patch(monkeypatch, mod, docs)
    rows = llm_lm_filter(spark, "x").collect()
    kept = [r.score for r in rows if r.kept]
    dropped = [r.score for r in rows if not r.kept]
    assert dropped, "bottom quartile must be dropped"
    # the cut is a pure score threshold...
    assert min(kept) >= max(dropped)
    # ...dropping at most ceil(n/4) documents (ties are kept)
    assert len(dropped) <= (len(rows) + 3) // 4
    # the pure-garbled doc (unique bigrams -> lowest add-1 logprob)
    # is the one dropped
    dropped_ids = {r.doc_id for r in rows if not r.kept}
    assert dropped_ids == {6}


def test_embed_outlier_flags_planted_far_vector(spark, monkeypatch):
    import pg_telemetry_spark.queries.llm_ext as mod

    base = [0.1, 0.2, 0.3, 0.4]
    rows = [
        (i, [x + 0.001 * (i % 3) for x in base], 0) for i in range(9)
    ] + [(9, [5.0, 5.0, 5.0, 5.0], 0)]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    _patch(monkeypatch, mod, emb)
    out = {r.vec_id: r for r in llm_embed_outlier(spark, "x").collect()}
    assert out[9].is_outlier and out[9].z > 2.0
    assert sum(1 for r in out.values() if r.is_outlier) == 1


def test_cusum_closed_form_equals_textbook_recursion(spark, monkeypatch):
    import pg_telemetry_spark.queries.timeseries_ext as mod

    # flat series with a planted sustained upward shift at the end
    vals = [50.0, 48.0, 52.0, 49.0, 51.0, 50.0, 90.0, 95.0, 92.0, 99.0]
    t0 = datetime.datetime(2024, 1, 1)
    e = spark.createDataFrame(
        [
            (i, t0 + datetime.timedelta(minutes=i), 1, "m", v, "{}")
            for i, v in enumerate(vals)
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    _patch(monkeypatch, mod, e)
    row = ts_cusum_change(spark, "x").collect()[0]

    # pure-Python textbook recursion with the SAME integer-cent mean
    cents = sum(round(v * 100) for v in vals)
    mu = (cents // len(vals)) / 100.0
    s, mx, alarms = 0.0, 0.0, 0
    for v in vals:
        s = max(0.0, s + (v - mu - 5.0))
        mx = max(mx, s)
        if s > 200.0:
            alarms += 1
    assert row.n_samples == len(vals)
    assert abs(row.max_cusum - mx) < 1e-6
    assert row.n_alarms == alarms
