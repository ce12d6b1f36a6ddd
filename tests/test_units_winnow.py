"""Pin the vectorized winnowing kernel against its reference path.

The fast path in ``operators/winnow.py`` concatenates a whole Arrow
batch into one byte buffer and runs the tokenize -> gram-hash ->
window-min -> per-doc-dedupe pipeline as batch numpy ops; the slow
path is the per-document reference implementation the fast path must
be bit-identical to (and the fallback it takes on non-ASCII / NUL
text).  These tests hammer the boundary conditions the concatenation
trick could get wrong: empty tokens from double spaces, docs exactly
at the 7-token threshold, batch-edge docs, unicode fallback.
"""

from __future__ import annotations

import numpy as np
import pytest

from pg_telemetry_spark.operators.winnow import (
    MOD,
    _select_batch,
    _select_slow,
)


def _pairs(ids, fps):
    return sorted(zip((int(x) for x in ids), (int(x) for x in fps)))


CASES = [
    # below threshold: nothing
    ["one two three four five six"],
    # exactly at threshold: one window
    ["one two three four five six seven"],
    # double/leading/trailing spaces -> empty tokens (hash 0)
    ["a  b c d e f g h", " leading space doc with eight tokens x"],
    ["trailing space doc with eight tokens x "],
    # repeated words -> repeated gram hashes -> dedupe matters
    ["spam spam spam spam spam spam spam spam spam spam"],
    # a realistic mixed batch incl. sub-threshold docs interleaved
    [
        "the quick brown fox jumps over the lazy dog today",
        "short doc",
        "pack my box with five dozen liquor jugs now please",
        "",
        "singleword",
        "a b c d e f g",
    ],
]


@pytest.mark.parametrize("texts", CASES)
def test_fast_path_matches_reference(texts):
    ids = np.arange(len(texts), dtype=np.int64) + 100
    fast = _pairs(*_select_batch(ids, list(texts)))
    slow = _pairs(*_select_slow(ids, list(texts)))
    assert fast == slow
    # every emitted (doc, fp) is distinct and fp is in the hash range
    assert len(fast) == len(set(fast))
    assert all(0 <= fp < MOD for _, fp in fast)


def test_unicode_and_nul_take_the_fallback_and_agree():
    # multibyte chars break byte==char; NUL collides with the doc
    # separator — both must route to the reference path, and the
    # reference path must still produce the polynomial semantics
    texts = [
        "café au lait avec deux croissants chauds demain matin",
        "plain ascii control doc with eight tokens here",
        "nul\x00byte doc must not split neighbours one two three four",
    ]
    ids = np.arange(3, dtype=np.int64)
    fast = _pairs(*_select_batch(ids, texts))
    slow = _pairs(*_select_slow(ids, texts))
    assert fast == slow and len(fast) > 0
    # ord() of the multibyte first char is what Spark ascii() returns
    assert any(i == 0 for i, _ in fast)


def test_identical_docs_share_all_fingerprints():
    text = "zero one two three four five six seven eight nine"
    ids = np.array([7, 8], dtype=np.int64)
    out = _pairs(*_select_batch(ids, [text, text]))
    a = {fp for i, fp in out if i == 7}
    b = {fp for i, fp in out if i == 8}
    assert a == b and len(a) >= 1
