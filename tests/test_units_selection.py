"""Goldens for the data-selection family (queries/selection_ext.py):
the MMR greedy trajectory replayed in local python, and a structural
invariant for the DSIR mix shift.
"""

from __future__ import annotations

import hashlib

import pyspark.sql.functions as F

from pg_telemetry_spark.queries.selection_ext import (
    _MMR_K,
    _MMR_LAMBDA,
    _MMR_POOL,
    _MMR_SIGS,
    llm_dsir_resample,
    llm_mmr_diversify,
)
from pg_telemetry_spark.tables import load_table

SF_SMALL = "/root/testdata/sf0.001"


def _mh(i: int, w: str) -> int:
    return int(hashlib.md5(f"{i}:{w}".encode()).hexdigest()[:8], 16)


def test_mmr_matches_local_greedy(spark):
    """Golden for llm_mmr_diversify (tier C): recompute the md5
    minhash signatures and replay the greedy 0.7*rel - 0.3*max-sim
    trajectory locally; the selected doc sequence must be identical."""
    docs = {
        r["doc_id"]: set(w for w in r["text"].lower().split() if w)
        for r in load_table(spark, SF_SMALL, "documents")
        .select("doc_id", "text")
        .collect()
    }
    sigs = {
        d: [min(_mh(i, w) for w in ws) for i in range(_MMR_SIGS)]
        for d, ws in docs.items()
        if ws
    }
    vocab = {d: len(ws) for d, ws in docs.items() if ws}
    # pool-bounded MMR (round 9): the greedy re-ranks the top-_MMR_POOL
    # docs by (vocab desc, doc_id asc), mirroring the operator
    pool = sorted(vocab, key=lambda d: (-vocab[d], d))[:_MMR_POOL]
    sigs = {d: sigs[d] for d in pool}
    vocab = {d: vocab[d] for d in pool}
    max_vocab = max(vocab.values())
    picked: list[int] = []
    remaining = set(sigs)
    expect = []
    for rank in range(1, _MMR_K + 1):
        best = None
        for d in remaining:
            rel = vocab[d] / max_vocab
            sim = (
                max(
                    sum(a == b for a, b in zip(sigs[d], sigs[s])) / _MMR_SIGS
                    for s in picked
                )
                if picked
                else 0.0
            )
            score = round(_MMR_LAMBDA * rel - (1 - _MMR_LAMBDA) * sim, 9)
            if best is None or (score, -d) > (best[0], -best[1]):
                best = (score, d)
        picked.append(best[1])
        remaining.discard(best[1])
        expect.append((rank, best[1]))
    got = [
        (r["rank"], r["doc_id"]) for r in llm_mmr_diversify(spark, SF_SMALL).collect()
    ]
    assert got == expect


def test_dsir_shifts_mix_toward_target(spark, sf_dir):
    """DSIR's whole point: the selected subset must over-represent
    sources whose token distribution matches the English target
    relative to the raw mix — so the aggregate selected fraction of
    high-weight sources exceeds the uniform 20% and the global
    selected count equals floor(0.2 * n_docs)."""
    rows = llm_dsir_resample(spark, sf_dir).collect()
    n_docs = sum(r["n_docs"] for r in rows)
    n_sel = sum(r["n_selected"] for r in rows)
    assert n_sel == int(0.2 * n_docs)
    per_src = sorted(rows, key=lambda r: -(r["sum_weight"] / r["n_docs"]))
    top_half = per_src[: len(per_src) // 2]
    sel_frac_top = sum(r["n_selected"] for r in top_half) / sum(
        r["n_docs"] for r in top_half
    )
    assert sel_frac_top > 0.2, "selection did not tilt toward high-weight sources"
