"""Semantic goldens for the curation operators (round 7).

The oracle parity sweep already hash-matches all four against DuckDB;
these tests pin the SEMANTICS on planted inputs — a repeated-text
document must score high on every repetition feature, a copied chunk
must lose ownership to the earlier document, the mixture sampler must
saturate at keep-all for under-represented sources, and novelty must
be 1.0 for the first document scanned.
"""

from __future__ import annotations

from pg_telemetry_spark.queries.curation import (
    llm_chunk_dedup,
    llm_domain_mix,
    llm_ngram_novelty,
    llm_repetition,
)


def _planted_docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", f"src{i % 2}", len(t)) for i, t in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def _run_on(monkeypatch, fn, spark, df):
    """Run a registered curation query against a planted frame."""
    import pg_telemetry_spark.queries.curation as mod

    monkeypatch.setattr(mod, "load_table", lambda _s, _d, _t: df)
    return fn(spark, "unused")


def test_repetition_flags_planted_boilerplate(spark, monkeypatch):
    docs = _planted_docs(
        spark,
        [
            ("spam ham " * 16).strip(),  # one bigram repeated throughout
            "a b c d e f g h i j k l", # all-distinct control
        ],
    )
    rows = {
        r.doc_id: r
        for r in _run_on(monkeypatch, llm_repetition, spark, docs).collect()
    }
    rep, ctl = rows[0], rows[1]
    assert rep.dup_word_ratio > 0.9
    assert rep.top_bigram_frac > 0.45  # 'spam ham' is ~half of all bigrams
    assert rep.dup_trigram_frac > 0.9
    assert ctl.dup_word_ratio == 0.0
    assert ctl.dup_trigram_frac == 0.0
    # control max-bigram share = 1 / n_bigrams
    assert abs(ctl.top_bigram_frac - 1 / 11) < 1e-6


def test_novelty_first_doc_is_fully_novel_and_copy_is_zero(spark, monkeypatch):
    docs = _planted_docs(
        spark,
        [
            "w x y z q r s t",
            "w x y z q r s t",      # exact copy: zero novel grams
            "completely different words here now",
        ],
    )
    rows = {
        r.doc_id: r
        for r in _run_on(monkeypatch, llm_ngram_novelty, spark, docs).collect()
    }
    assert rows[0].novelty_rate == 1.0
    assert rows[1].novelty_rate == 0.0
    assert rows[2].novelty_rate == 1.0


def test_domain_mix_cuts_dominant_source_keeps_small_ones(spark, monkeypatch):
    # skewed corpus: 900 / 50 / 10 docs; uniform target = 320 per source
    sizes = {"big": 900, "small": 50, "tiny": 10}
    rows, i = [], 0
    for src, n in sizes.items():
        for _ in range(n):
            rows.append((i, f"doc {i} text", "en", src, 10))
            i += 1
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = {r.source: r for r in _run_on(monkeypatch, llm_domain_mix, spark, docs).collect()}
    total, k = sum(sizes.values()), len(sizes)
    target = total / k
    # under-represented sources saturate at keep-all (integer rate >= 1)
    assert out["small"].n_kept == sizes["small"]
    assert out["tiny"].n_kept == sizes["tiny"]
    assert out["small"].keep_rate == 1.0
    # the dominant source is cut toward the uniform target; hash
    # sampling is binomial around the exact rate (std ~14 here)
    big = out["big"]
    assert big.src_n == sizes["big"] and big.n_kept < big.src_n
    assert abs(big.n_kept - target) < 0.25 * target
    # determinism: same membership on a re-run
    out2 = {r.source: r.n_kept for r in _run_on(monkeypatch, llm_domain_mix, spark, docs).collect()}
    assert out2 == {s: r.n_kept for s, r in out.items()}


def test_chunk_dedup_copied_chunk_loses_to_earlier_doc(spark, monkeypatch):
    eight = "c1 c2 c3 c4 c5 c6 c7 c8"
    docs = _planted_docs(
        spark,
        [
            eight + " tail1 tail2",             # owns the chunk
            eight + " other trailing words",    # same first chunk: deduped
            "fresh text with no overlap at all",
        ],
    )
    rows = {
        r.doc_id: r
        for r in _run_on(monkeypatch, llm_chunk_dedup, spark, docs).collect()
    }
    assert rows[0].n_chunks == 2 and rows[0].n_kept == 2
    assert rows[1].n_chunks == 2 and rows[1].n_kept == 1  # lost the copied chunk
    assert rows[1].retained_frac == 0.5
    assert rows[2].retained_frac == 1.0


def test_zorder_buckets_confine_both_dims(spark, sf_dir):
    """Every 1024-z-value range fixes the top 3 bits of both
    interleaved dimensions, so min/max spans must stay inside a
    32x32 tile — the property that makes either-dimension predicates
    prune ~31/32 of file ranges after a z-order rewrite."""
    from pg_telemetry_spark.queries.asof_misc import layout_zorder

    rows = layout_zorder(spark, sf_dir).collect()
    assert rows, "no z buckets"
    for r in rows:
        assert r.max_user_bits - r.min_user_bits <= 31, r
        assert r.max_day - r.min_day <= 31, r
    total = sum(r.n_events for r in rows)
    from pg_telemetry_spark.tables import load_table

    assert total == load_table(spark, sf_dir, "events").count()


def test_cdc_chunking_survives_a_one_token_shift(spark):
    """The CDC value proposition: insert ONE token at the front of a
    copy and (a) a fixed 8-token grid loses every chunk alignment,
    (b) CDC boundaries re-synchronize, so every chunk after the first
    boundary is still an exact duplicate of the original's."""
    from pg_telemetry_spark.queries.curation import cdc_chunk_report

    words = [f"w{(i * 7) % 83}x{i % 11}" for i in range(240)]
    base = " ".join(words)
    shifted = "INSERTED " + base
    d = spark.createDataFrame(
        [(1, "orig", base), (2, "copy", shifted)],
        "doc_id LONG, source STRING, text STRING",
    )
    rep = {r["source"]: r for r in cdc_chunk_report(d).collect()}
    # the copy re-aligns: every chunk except (at most) the first is a
    # duplicate of an original chunk
    assert rep["copy"]["n_chunks"] >= 3, "fixture too short to make chunks"
    assert rep["copy"]["n_dup_chunks"] >= rep["copy"]["n_chunks"] - 1
    assert rep["orig"]["n_dup_chunks"] == 0
    # the fixed 8-token grid on the same pair: zero aligned chunks
    grid = lambda toks: {" ".join(toks[i : i + 8]) for i in range(0, len(toks), 8)}
    assert not (grid(words) & grid(["INSERTED"] + words))
