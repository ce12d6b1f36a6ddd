"""Value-level goldens for the distributed BPE trainer (tier C).

The covering contract: the Spark merge table must equal, rank for
rank, a pure-Python reference BPE run on the same word-frequency
table — same counting convention (corpus-weighted, overlapping
adjacent pairs), same tie-break (count DESC, then (a, b) ASC), same
leftmost non-overlapping replace pass.
"""

from __future__ import annotations

from collections import Counter

import duckdb
import pytest

from pg_telemetry_spark.queries.bpe import bpe_train
from pg_telemetry_spark.tables import load_table


def _reference_bpe(word_counts: dict[str, int], n_merges: int):
    vocab = {w: list(w) for w in word_counts}
    merges = []
    for r in range(1, n_merges + 1):
        pc: Counter = Counter()
        for w, syms in vocab.items():
            wn = word_counts[w]
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += wn
        if not pc:
            break
        (a, b), n = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((r, a, b, a + b, n))
        for w, syms in vocab.items():
            out: list[str] = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            vocab[w] = out
    return merges


def test_bpe_train_matches_python_reference(spark, sf_dir):
    rows = [
        (r["w"], r["n"])
        for r in duckdb.sql(
            "SELECT tok AS w, count(*) AS n FROM (SELECT unnest(string_split(text,"
            f" ' ')) AS tok FROM read_parquet('{sf_dir}/documents.parquet'))"
            " WHERE length(tok) > 0 GROUP BY tok"
        ).df().to_dict("records")
    ]
    expected = _reference_bpe(dict(rows), n_merges=8)
    docs = load_table(spark, sf_dir, "documents")
    got = bpe_train(docs, n_merges=8)
    assert got == expected


def test_bpe_train_tiny_corpus_hand_checked(spark):
    # "low lower lowest" x3, "new newer" x2: first merge is the most
    # frequent weighted pair; hand-derivable.
    docs = spark.createDataFrame(
        [("low lower lowest",)] * 3 + [("new newer",)] * 2, "text STRING"
    )
    wc = {"low": 3, "lower": 3, "lowest": 3, "new": 2, "newer": 2}
    expected = _reference_bpe(wc, n_merges=4)
    got = bpe_train(docs, n_merges=4)
    assert got == expected
    # merge 1 must be (l, o): 9 weighted occurrences, the max
    assert got[0][1:3] == ("l", "o") and got[0][4] == 9


def test_bpe_merge_is_leftmost_nonoverlapping(spark):
    # 'aaaa' with merge (a, a) must become [aa, aa], not [aa, a, a]
    docs = spark.createDataFrame([("aaaa",)], "text STRING")
    got = bpe_train(docs, n_merges=2)
    # round 1: (a, a) counted 3x (overlapping); round 2: (aa, aa) once
    assert got[0][1:] == ("a", "a", "aa", 3)
    assert got[1][1:] == ("aa", "aa", "aaaa", 1)


def test_bpe_apply_matches_python_reference(spark, sf_dir):
    from pg_telemetry_spark.queries.bpe import bpe_apply_to_vocab
    import pyspark.sql.functions as F

    docs = load_table(spark, sf_dir, "documents")
    merges = bpe_train(docs, n_merges=8)
    vocab = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.length("w") > 0)
        .distinct()
        .select("w", F.expr("filter(split(w, ''), s -> s != '')").alias("syms"))
    )
    got = {
        r["w"]: list(r["syms"])
        for r in bpe_apply_to_vocab(vocab, merges).select("w", "syms").collect()
    }
    for w, syms in got.items():
        ref = list(w)
        for _rank, a, b, _m, _n in merges:
            out: list[str] = []
            for s in ref:
                if out and out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            ref = out
        assert syms == ref, (w, syms, ref)
